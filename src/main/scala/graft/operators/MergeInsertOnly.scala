package graft.operators

import org.apache.spark.sql.DataFrame

/** Insert-only MERGE: `target ∪ (source ∖ target)` on a natural key.
  *
  * Re-expresses the reference's Delta `whenNotMatchedInsertAll()` merges
  * (Notebooks/Automated_Silver_to_Gold.Notebook/notebook-content.py:271-349,
  * 390-394) without Delta: a left-anti join stages only-new rows, then a
  * union-by-name appends them. Semantically identical for insert-only
  * merges; idempotent (`merge(merge(t,s),s) == merge(t,s)`).
  *
  * Scale: the anti join shuffles both sides by the key (or broadcasts the
  * smaller), exactly what Delta's merge does internally; no global sort, no
  * driver collect. For the table-swap flavor (persisting the result
  * atomically) see [[graft.pipeline.Catalog.overwriteTable]].
  */
object MergeInsertOnly {
  def apply(target: DataFrame, source: DataFrame, key: Seq[String]): DataFrame = {
    val fresh = source.join(target.select(key.head, key.tail: _*), key, "left_anti")
    target.unionByName(fresh)
  }
}
