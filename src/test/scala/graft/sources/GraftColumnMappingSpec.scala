package graft.sources

import graft.SparkSpec

/** RENAME/DROP COLUMN schema evolution with Iceberg-style FIELD IDS:
  * a rename is metadata-only (the id travels, so cross-schema-version
  * matching — the change data feed, stream projections — keeps serving
  * the column's values); a drop rebuilds rows positionally with
  * partition/bucket columns protected. */
class GraftColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    val fq = s"graft_cat.ns.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fq")
    fq
  }

  private def store(name: String): GraftTable =
    GraftTableStore.tables((Seq("ns"), name))

  test("RENAME COLUMN is metadata-only; the field id keeps the change " +
      "data feed whole across the rename") {
    val t = freshTable("t_ren")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(1).writeTo(t).create()                       // v1
    val table = store("t_ren")
    val fileBefore = table.dataFiles.head

    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO label")       // v2
    // data intact under the new name; files untouched by identity
    assert(spark.table(t).orderBy("id").select("id", "label")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    assert(table.dataFiles.head eq fileBefore,
      "rename must not rebuild data files")

    // the PRE-rename commit's CDC rows still carry the values — matched
    // through the field id, not the (changed) name
    val ch = spark.table(s"graft_cat.ns.`t_ren$$changes`")
      .filter($"_commit_version" === 1)
      .select("id", "label").as[(Long, String)].collect().toSeq.sorted
    assert(ch === Seq((1L, "a"), (2L, "b")),
      "field-id matching must survive the rename in the CDF")

    // time travel serves the pre-rename SCHEMA
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").columns.toSeq
      === Seq("id", "v"))

    // writes after the rename address the new name
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
    assert(spark.table(t).filter($"label" === "c").count() === 1)

    // guarded renames
    intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN id TO label"))
    val tp = freshTable("t_ren_part")
    spark.sql(s"CREATE TABLE $tp (id BIGINT, p INT) PARTITIONED BY (p)")
    intercept[Exception](
      spark.sql(s"ALTER TABLE $tp RENAME COLUMN p TO q"))
  }

  test("DROP COLUMN rebuilds rows positionally; partition and last " +
      "columns protected; delete vectors survive") {
    val t = freshTable("t_drop")
    spark.sql(s"CREATE TABLE $t (id BIGINT, junk STRING, v STRING) " +
      "TBLPROPERTIES ('write.rowlevel.mode'='merge-on-read')")
    Seq((1L, "x", "a"), (2L, "y", "b"), (3L, "z", "c"))
      .toDF("id", "junk", "v").repartition(1).writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE id = 2") // MOR: DV on position 1
    assert(store("t_drop").dvCensus.nonEmpty)

    spark.sql(s"ALTER TABLE $t DROP COLUMN junk")
    // narrower schema, same live rows, DV still applied (positions kept)
    assert(spark.table(t).columns.toSeq === Seq("id", "v"))
    assert(spark.table(t).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (3L, "c")))
    assert(store("t_drop").dvCensus.nonEmpty,
      "delete vectors must follow the rebuilt files")

    // drops of load-bearing columns are rejected
    val tp = freshTable("t_drop_part")
    spark.sql(s"CREATE TABLE $tp (id BIGINT, p INT) PARTITIONED BY (p)")
    intercept[Exception](spark.sql(s"ALTER TABLE $tp DROP COLUMN p"))
    val t1 = freshTable("t_drop_only")
    spark.sql(s"CREATE TABLE $t1 (id BIGINT)")
    intercept[Exception](spark.sql(s"ALTER TABLE $t1 DROP COLUMN id"))
  }

  test("DROP COLUMN before the partition column keeps group keys bound " +
      "to the right ordinal") {
    val t = freshTable("t_drop_shift")
    spark.sql(s"CREATE TABLE $t (junk STRING, p INT, id BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t VALUES ('x', 1, 10), ('y', 1, 11), " +
      "('z', 2, 20)")
    spark.sql(s"ALTER TABLE $t DROP COLUMN junk") // p shifts 1 -> 0
    // rebuilt files carry the TRUE partition key, so a metadata delete
    // drops exactly partition 1 (a stale ordinal would key on id/junk)
    assert(store("t_drop_shift").dataFiles.forall(_.groupKey.isDefined))
    spark.sql(s"DELETE FROM $t WHERE p = 1")
    assert(spark.table(t).orderBy("id").as[(Int, Long)].collect().toSeq
      === Seq((2, 20L)))
    // post-drop inserts land in the right groups too
    spark.sql(s"INSERT INTO $t VALUES (3, 30)")
    spark.sql(s"DELETE FROM $t WHERE p = 3")
    assert(spark.table(t).as[(Int, Long)].collect().toSeq === Seq((2, 20L)))
  }

  test("DROP COLUMN re-binds CHECK constraints; dropping a constrained " +
      "column is refused") {
    val t = freshTable("t_drop_chk")
    spark.sql(s"CREATE TABLE $t (junk STRING, price DOUBLE) " +
      "TBLPROPERTIES ('constraints.pos' = 'price >= 0')")
    spark.sql(s"INSERT INTO $t VALUES ('a', 1.0)")
    // the constrained column itself is protected
    intercept[Exception](spark.sql(s"ALTER TABLE $t DROP COLUMN price"))
    // dropping the OTHER column shifts price's ordinal; the check must
    // follow it — a stale binding would validate nothing (or crash)
    spark.sql(s"ALTER TABLE $t DROP COLUMN junk")
    intercept[Exception](spark.sql(s"INSERT INTO $t VALUES (-5.0)"))
    spark.sql(s"INSERT INTO $t VALUES (2.0)")
    assert(spark.table(t).as[Double].collect().toSeq.sorted === Seq(1.0, 2.0))
  }

  test("a column added after a drop never inherits the dropped column's " +
      "field id — history stays attributed to the dead column") {
    val t = freshTable("t_id_reuse")
    Seq((1L, "bee")).toDF("a", "b").writeTo(t).create()  // b holds 'bee'
    spark.sql(s"ALTER TABLE $t DROP COLUMN b")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (c STRING)")
    spark.sql(s"INSERT INTO $t VALUES (2, 'cee')")
    // the v1 insert's CDC row must NOT hand b's historical value to c
    val ch = spark.table(s"graft_cat.ns.`t_id_reuse$$changes`")
      .orderBy("_commit_version").select("a", "c")
      .as[(Long, Option[String])].collect().toSeq
    assert(ch === Seq((1L, None), (2L, Some("cee"))),
      s"dropped column's history leaked into the new column: $ch")
  }

  test("COW commits abort when a concurrent write landed in the " +
      "rewritten scope") {
    val t = freshTable("t_cow_occ")
    Seq((1L, "a")).toDF("id", "v").writeTo(t).create()
    val table = store("t_cow_occ")
    val staleBase = table.dataFiles
    // a concurrent append between scan and commit
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    def row(id: Long, v: String) =
      org.apache.spark.sql.catalyst.InternalRow(id,
        org.apache.spark.unsafe.types.UTF8String.fromString(v))
    intercept[java.util.ConcurrentModificationException] {
      table.installReplaceGroups(Array(Array(row(1L, "A"))), None,
        "UPDATE", staleBase)
    }
    // the committed insert survived; the stale rewrite did not land
    assert(spark.table(t).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b")))
    // a FRESH rewrite against the current base commits fine
    table.installReplaceGroups(
      Array(Array(row(1L, "A"), row(2L, "b"))), None, "UPDATE",
      table.dataFiles)
    assert(spark.table(t).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "A"), (2L, "b")))
  }

  test("rename + add + drop compose; ids stay unique and stable") {
    val t = freshTable("t_evolve")
    Seq((1L, "a")).toDF("id", "v").writeTo(t).create()
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (w STRING)")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO v2")
    spark.sql(s"ALTER TABLE $t DROP COLUMN w")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (x BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', 7)")
    assert(spark.table(t).orderBy("id")
      .as[(Long, String, Option[Long])].collect().toSeq
      === Seq((1L, "a", None), (2L, "b", Some(7L))))
    // ids unique across the whole evolution
    val ids = store("t_evolve").schema().fields
      .flatMap(f => FieldIds.idOf(f))
    assert(ids.length === 3 && ids.distinct.length === 3, ids.toSeq)
  }
}
