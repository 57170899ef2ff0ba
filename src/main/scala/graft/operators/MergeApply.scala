package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full CRUD MERGE: apply a typed changelog (insert + update + delete) to
  * a keyed table — the complement of [[MergeInsertOnly]] for sources that
  * emit a change feed rather than append-only rows (the CDC-apply half of
  * the `s18_snapshot_diff` round trip: diff(v1, v2) applied to v1 must
  * reproduce v2, which `s19_merge_full_apply` proves against the oracle).
  *
  * `changes` carries the key columns, the replacement payload (for
  * inserts/updates), and a `change_type` discriminator column with values
  * 'added' | 'changed' | 'removed'.
  *
  * Shape: rows whose key the changelog mentions AT ALL leave the target
  * via ONE left-anti join (updates re-enter with their new payload from
  * the changelog side, deletes don't), then inserts+updates append by
  * name — `(target ∖ keys(changes)) ∪ payload(added ∪ changed)`.
  *
  * Scale: one key-shuffle (or broadcast of the changelog, which is
  * delta-sized by construction) for the anti join + a union — the same
  * cost envelope as a Delta MERGE's file rewrite planning, with no global
  * sort and no driver state. Idempotent for a fixed changelog: re-applying
  * yields the same table (anti join removes the previously applied keys,
  * the same payloads re-enter).
  */
object MergeApply {
  val KnownTypes: Seq[String] = Seq("added", "changed", "removed")

  def apply(target: DataFrame, changes: DataFrame, key: Seq[String],
            typeCol: String = "change_type"): DataFrame = {
    // Fail loudly on unknown change types (a typo like 'add' would
    // otherwise silently DELETE its key: it leaves via the anti join but
    // never re-enters). The check rides the existing changelog scan as a
    // plan-level raise_error — no extra job, fails at first malformed row.
    val validated = changes.withColumn(typeCol,
      when(col(typeCol).isin(KnownTypes: _*), col(typeCol))
        .otherwise(raise_error(concat(
          lit(s"MergeApply: unknown $typeCol value '"),
          coalesce(col(typeCol), lit("NULL")),
          lit("' — expected one of " + KnownTypes.mkString(", "))))))
    val mentioned = validated.select(key.head, key.tail: _*)
    val upserts = validated
      .filter(col(typeCol) === "added" || col(typeCol) === "changed")
      .drop(typeCol)
    target.join(mentioned, key, "left_anti").unionByName(upserts)
  }
}
