package graft.pipeline

import org.apache.spark.sql.DataFrame
import graft.operators.{DimBuild, MergeInsertOnly}

/** End-to-end orchestration (reference pipeline graph: Automated
  * Pipeline.DataPipeline/pipeline-content.json — ingest → bronze→silver →
  * silver→gold → publish), plus the incremental (merge) variant of the
  * gold build (Automated_Silver_to_Gold notebook-content.py:271-394).
  */
object Pipeline {

  /** Full batch rebuild: bronze → silver → gold. */
  def batch(bronze: DataFrame, population: DataFrame): SilverToGold.Gold =
    SilverToGold(BronzeToSilver(bronze), population)

  /** Incremental gold refresh: stage only-new dim rows (left-anti on the
    * natural key), re-key them continuing the existing sequence, then
    * insert-only-merge dims and fact. `existing` is the current gold star;
    * `bronzeDelta` the newly ingested window. Running this twice with the
    * same delta is a no-op (idempotency is property-tested). */
  def incremental(existing: SilverToGold.Gold, bronzeDelta: DataFrame,
                  population: DataFrame): SilverToGold.Gold = {
    val silver = BronzeToSilver(bronzeDelta)

    def mergeDim(current: DataFrame, fresh: DataFrame, naturalKey: Seq[String],
                 keyName: String): DataFrame = {
      val newRows = fresh.drop(keyName)
        .join(current.select(naturalKey.head, naturalKey.tail: _*),
          naturalKey, "left_anti")
      current.unionByName(
        DimBuild.continueKeys(current, newRows, naturalKey, keyName))
    }

    val dd = mergeDim(existing.dimDate, SilverToGold.dimDate(silver.measurement),
      Seq("date"), "date_key")
    val dp = mergeDim(existing.dimParameter, SilverToGold.dimParameter(silver.parameter),
      Seq("parameter_code"), "parameter_key")
    val dm = mergeDim(existing.dimMethod, SilverToGold.dimMethod(silver.method),
      Seq("method_code"), "method_key")
    val dl = mergeDim(existing.dimLocation,
      SilverToGold.dimLocation(silver.site, silver.adminArea, silver.cbsa, population),
      Seq("state_code", "county_code", "site_number"), "location_key")

    val freshFact = SilverToGold.fact(silver.measurement, dd, dl, dp, dm)
    val fact = MergeInsertOnly(existing.fact, freshFact,
      Seq("date_key", "location_key", "parameter_key", "poc"))
    SilverToGold.Gold(dd, dl, dp, dm, fact)
  }
}
