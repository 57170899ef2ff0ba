package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-file Bloom-filter data skipping (`bloom.columns`, Delta's bloom
  * index): point lookups on a high-cardinality UNCLUSTERED key skip
  * files the zone-map envelope cannot — each file below is written
  * hash-interleaved, so every envelope spans the whole key range and
  * only the bloom proves exact-value absence. */
class GraftBloomSpec extends SparkSpec {
  import spark.implicits._

  private def graftTable(cat: String, ns: String, t: String): GraftTable =
    spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog].store.tables((Seq(ns), t))

  test("a point lookup on an unclustered key skips files via the bloom " +
      "where zone maps admit everything; the filters survive restart") {
    val wh = tmpDir("graft-bloom")
    spark.conf.set("spark.sql.catalog.blm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blm.warehouse", wh)
    spark.sql("CREATE TABLE blm.ns.t (k STRING, v BIGINT) " +
      "TBLPROPERTIES ('bloom.columns'='k')")
    // 4 commits of interleaved keys: file i holds keys ≡ i (mod 4), so
    // every file's (min, max) envelope covers the full range — zone
    // maps alone cannot skip a single file for any point lookup
    (0 until 4).foreach { i =>
      (0 until 200).map(j => (f"key${i + 4 * j}%04d", (i + 4 * j).toLong))
        .toDF("k", "v").coalesce(1).writeTo("blm.ns.t").append()
    }
    val table = graftTable("blm", "ns", "t")

    def lookupCensus(cat: String, key: String): (Long, ScanCensus) = {
      val t = graftTable(cat, "ns", "t")
      val n = spark.table(s"$cat.ns.t").filter(col("k") === key).count()
      (n, t.lastScanCensus.get)
    }
    // key 0005 lives only in file 1 (5 mod 4): blooms skip ~3 of 4
    val (n1, c1) = lookupCensus("blm", "key0005")
    assert(n1 === 1L)
    assert(c1.filesTotal === 4)
    assert(c1.filesRead < 4,
      s"bloom must skip interleaved files zone maps cannot: $c1")
    // an absent key skips everything (no envelope can help here)
    val (n0, c0) = lookupCensus("blm", "nope")
    assert(n0 === 0L)
    assert(c0.filesRead === 0, s"absent key must read zero files: $c0")
    // sanity: the zone envelope really is useless on this layout —
    // every file spans the full range
    val zs = table.filesSnapshot.map(_.zones(0))
    assert(zs.forall(_ != null) && zs.distinct.length <= 4)

    // restart: a cold fold decodes the blooms from the log and the
    // fresh catalog skips identically
    spark.conf.set("spark.sql.catalog.blr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blr.warehouse", wh)
    spark.conf.set("spark.sql.catalog.blr.warehouse.isolated", "true")
    val (rn, rc) = lookupCensus("blr", "key0005")
    assert(rn === 1L)
    assert(rc.filesRead < rc.filesTotal,
      s"restart must keep the bloom index: $rc")
    // and the property reports back from the restored schema metadata
    assert(graftTable("blr", "ns", "t").properties()
      .get(GraftBloom.BloomProp) === "k")
  }

  test("OPTIMIZE rebuilds blooms for the compacted files; lookups keep " +
      "skipping after the rewrite") {
    val wh = tmpDir("graft-bloomo")
    spark.conf.set("spark.sql.catalog.blo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blo.warehouse", wh)
    spark.sql("CREATE TABLE blo.ns.t (k STRING, v BIGINT) " +
      "TBLPROPERTIES ('bloom.columns'='k')")
    (0 until 8).foreach { i =>
      (0 until 50).map(j => (f"key${i + 8 * j}%04d", j.toLong))
        .toDF("k", "v").coalesce(1).writeTo("blo.ns.t").append()
    }
    // compact 8 tiny files into 2 (200-row target)
    GraftMaintenance.sql(spark, "OPTIMIZE blo.ns.t TARGET 200 ROWS")
      .collect()
    val t = graftTable("blo", "ns", "t")
    assert(t.filesSnapshot.length < 8)
    assert(t.filesSnapshot.forall(_.blooms.exists(_ != null)),
      "every compacted file must carry a rebuilt bloom")
    val n = spark.table("blo.ns.t").filter(col("k") === "key0003").count()
    assert(n === 1L)
    val c = t.lastScanCensus.get
    assert(c.filesRead < c.filesTotal || c.filesTotal === 1,
      s"post-OPTIMIZE lookups must keep skipping: $c")
  }

  test("bloom.columns refuses unsupported types and unknown columns at " +
      "CREATE; results never change (false positives cost I/O only)") {
    spark.conf.set("spark.sql.catalog.blh", classOf[GraftCatalog].getName)
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE blh.ns.blh_bad (x DOUBLE) " +
        "TBLPROPERTIES ('bloom.columns'='x')"))
    assert(e1.getMessage.contains("no stable equality hash") ||
      Option(e1.getCause).exists(
        _.getMessage.contains("no stable equality hash")))
    intercept[Exception](spark.sql(
      "CREATE TABLE blh.ns.blh_bad2 (x BIGINT) " +
        "TBLPROPERTIES ('bloom.columns'='nope')"))
    // heap (in-JVM) tables build blooms through the same kernel; an
    // IN-list lookup returns exactly the matching rows
    spark.sql("CREATE TABLE blh.ns.blh_t (k STRING, v BIGINT) " +
      "TBLPROPERTIES ('bloom.columns'='k')")
    (0 until 100).map(i => (s"k$i", i.toLong)).toDF("k", "v")
      .repartition(4).writeTo("blh.ns.blh_t").append()
    val got = spark.table("blh.ns.blh_t")
      .filter(col("k").isin("k3", "k97", "absent"))
      .orderBy("v").as[(String, Long)].collect().toSeq
    assert(got === Seq(("k3", 3L), ("k97", 97L)))
  }

  test("ALTER TABLE SET ('bloom.columns') flips the index on an " +
      "existing table; OPTIMIZE backfills the old files") {
    val wh = tmpDir("graft-blooma")
    spark.conf.set("spark.sql.catalog.bla", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bla.warehouse", wh)
    spark.sql("CREATE TABLE bla.ns.t (k STRING, v BIGINT)") // no bloom
    (0 until 4).foreach { i =>
      (0 until 100).map(j => (f"key${i + 4 * j}%04d", j.toLong))
        .toDF("k", "v").coalesce(1).writeTo("bla.ns.t").append()
    }
    val t = graftTable("bla", "ns", "t")
    assert(t.filesSnapshot.forall(_.blooms.isEmpty))
    spark.sql(
      "ALTER TABLE bla.ns.t SET TBLPROPERTIES ('bloom.columns'='k')")
    assert(t.properties().get(GraftBloom.BloomProp) === "k")
    // pre-ALTER files serve WITHOUT filters (conservative) …
    spark.table("bla.ns.t").filter(col("k") === "key0005").count()
    assert(t.lastScanCensus.get.filesRead === 4)
    // … new writes build them …
    (0 until 50).map(j => (f"key9${j}%03d", j.toLong)).toDF("k", "v")
      .coalesce(1).writeTo("bla.ns.t").append()
    assert(t.filesSnapshot.last.blooms.exists(_ != null))
    // … and OPTIMIZE backfills the rest through the shared kernel
    GraftMaintenance.sql(spark, "OPTIMIZE bla.ns.t").collect()
    assert(t.filesSnapshot.forall(_.blooms.exists(_ != null)))
    // the restored catalog agrees (the flag rides the entry's schema)
    spark.conf.set("spark.sql.catalog.blar", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blar.warehouse", wh)
    spark.conf.set("spark.sql.catalog.blar.warehouse.isolated", "true")
    assert(graftTable("blar", "ns", "t").properties()
      .get(GraftBloom.BloomProp) === "k")
    // UNSET drops the flag; stale filters on files remain truth-
    // preserving and scans stay correct
    spark.sql("ALTER TABLE bla.ns.t UNSET TBLPROPERTIES ('bloom.columns')")
    assert(t.properties().get(GraftBloom.BloomProp) === null)
    assert(spark.table("bla.ns.t").filter(col("k") === "key0005").count()
      === 1L)
  }

  test("blooms survive a CHECKPOINT-anchored cold fold (not just the " +
      "delta-entry tail)") {
    val savedK = GraftTable.checkpointInterval
    try {
      GraftTable.checkpointInterval = 3 // force anchors mid-sequence
      val wh = tmpDir("graft-bloomc")
      spark.conf.set("spark.sql.catalog.blc", classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.blc.warehouse", wh)
      spark.sql("CREATE TABLE blc.ns.t (k STRING, v BIGINT) " +
        "TBLPROPERTIES ('bloom.columns'='k')")
      (0 until 6).foreach { i =>
        (0 until 50).map(j => (f"key${i + 6 * j}%04d", j.toLong))
          .toDF("k", "v").coalesce(1).writeTo("blc.ns.t").append()
      }
      // retire the pre-checkpoint delta entries: the fold MUST start
      // from the checkpoint's own census (where blooms ride the part
      // payloads' file meta)
      GraftMaintenance.sql(spark, "VACUUM blc.ns.t RETAIN 2 SNAPSHOTS")
        .collect()
      spark.conf.set("spark.sql.catalog.blcr", classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.blcr.warehouse", wh)
      spark.conf.set("spark.sql.catalog.blcr.warehouse.isolated", "true")
      val t = graftTable("blcr", "ns", "t")
      assert(t.filesSnapshot.forall(_.blooms.exists(_ != null)),
        "every folded file must carry its bloom")
      val n = spark.table("blcr.ns.t").filter(col("k") === "key0007")
        .count()
      assert(n === 1L)
      val c = t.lastScanCensus.get
      assert(c.filesRead < c.filesTotal,
        s"checkpoint-folded blooms must keep skipping: $c")
    } finally GraftTable.checkpointInterval = savedK
  }

  test("bloom.fpp sizes the filter: a 0.001 table's filters are " +
      "larger and measurably tighter than the 1% default") {
    val wh = tmpDir("graft-bloomf")
    spark.conf.set("spark.sql.catalog.blf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blf.warehouse", wh)
    spark.sql("CREATE TABLE blf.ns.t (k STRING, v BIGINT) " +
      "TBLPROPERTIES ('bloom.columns'='k', 'bloom.fpp'='0.001')")
    (0 until 500).map(i => (s"key$i", i.toLong)).toDF("k", "v")
      .coalesce(1).writeTo("blf.ns.t").append()
    val b = graftTable("blf", "ns", "t").filesSnapshot.head.blooms
      .find(_ != null).get
    // 0.001 → 15 bits/key, 10 probes (vs the default 10/7)
    assert(b.k === GraftBloom.probesFor(GraftBloom.bitsForFpp(0.001)))
    assert(b.words.length * 64L >= 500L * 15L)
    val fps = (0 until 20000).count(i => b.mightContain(
      GraftBloom.hashOf(org.apache.spark.unsafe.types.UTF8String
        .fromString(s"other-$i"))))
    assert(fps < 60, s"~0.1% fpp expected at 15 bits/key, got $fps/20000")
    // kernel sanity at the tighter sizing: still zero false negatives
    assert((0 until 500).forall(i => b.mightContain(GraftBloom.hashOf(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"key$i")))))
    // an out-of-range fpp refuses at CREATE
    intercept[Exception](spark.sql(
      "CREATE TABLE blf.ns.bad (k STRING) " +
        "TBLPROPERTIES ('bloom.columns'='k', 'bloom.fpp'='1.5')"))
  }

  test("bloom.fpp survives an ALTER of bloom.columns, reports back in " +
      "properties(), and is itself ALTER-able") {
    val wh = tmpDir("graft-bloomfa")
    spark.conf.set("spark.sql.catalog.blfa", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blfa.warehouse", wh)
    spark.sql("CREATE TABLE blfa.ns.t (k STRING, v BIGINT) " +
      "TBLPROPERTIES ('bloom.columns'='k', 'bloom.fpp'='0.001')")
    val t = graftTable("blfa", "ns", "t")
    assert(t.properties().get(GraftBloom.FppProp) === "0.001")
    // re-stamping the column set keeps the CREATE-time sizing in force
    spark.sql(
      "ALTER TABLE blfa.ns.t SET TBLPROPERTIES ('bloom.columns'='k,v')")
    assert(t.properties().get(GraftBloom.BloomProp) === "k,v")
    assert(t.properties().get(GraftBloom.FppProp) === "0.001",
      "ALTER of bloom.columns must not discard bloom.fpp")
    (0 until 400).map(i => (s"key$i", i.toLong)).toDF("k", "v")
      .coalesce(1).writeTo("blfa.ns.t").append()
    val b = t.filesSnapshot.last.blooms.find(_ != null).get
    assert(b.k === GraftBloom.probesFor(GraftBloom.bitsForFpp(0.001)),
      "new files after the re-stamp must size at the preserved fpp")
    // the sizing knob itself flips by ALTER; subsequent files re-size
    spark.sql(
      "ALTER TABLE blfa.ns.t SET TBLPROPERTIES ('bloom.fpp'='0.1')")
    assert(t.properties().get(GraftBloom.FppProp) === "0.1")
    (0 until 400).map(i => (s"new$i", i.toLong)).toDF("k", "v")
      .coalesce(1).writeTo("blfa.ns.t").append()
    val b2 = t.filesSnapshot.last.blooms.find(_ != null).get
    assert(b2.k === GraftBloom.probesFor(GraftBloom.bitsForFpp(0.1)))
    // UNSET returns to the default sizing without touching the set
    spark.sql("ALTER TABLE blfa.ns.t UNSET TBLPROPERTIES ('bloom.fpp')")
    assert(t.properties().get(GraftBloom.FppProp) === null)
    assert(t.properties().get(GraftBloom.BloomProp) === "k,v")
    (0 until 400).map(i => (s"dft$i", i.toLong)).toDF("k", "v")
      .coalesce(1).writeTo("blfa.ns.t").append()
    assert(t.filesSnapshot.last.blooms.find(_ != null).get.k ===
      GraftBloom.K)
  }

  test("the bloom kernel itself: no false negatives, ~1% false " +
      "positives, stable encode/decode round-trip") {
    val keys = (0 until 5000).map(i =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s"key-$i"))
    val b = GraftBloom.build(keys.iterator.map(x => x: Any), keys.length)
    assert(keys.forall(k => b.mightContain(GraftBloom.hashOf(k))),
      "a bloom filter must never produce a false negative")
    val fps = (0 until 10000).count(i => b.mightContain(GraftBloom.hashOf(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"other-$i"))))
    assert(fps < 300, s"~1% fpp expected at 10 bits/key, got $fps/10000")
    val rt = GraftBloom(GraftBloom.decodeWords(
      GraftBloom.encodeWords(b.words)), b.k)
    assert(java.util.Arrays.equals(rt.words, b.words))
  }

  test("legacy inline-'bl' log entries materialize their sidecar at " +
      "decode: refs survive checkpoints and retention dropping the entry") {
    import java.nio.file.{Files, Paths}
    val wh = tmpDir("graft-bloom-legacy")
    spark.conf.set("spark.sql.catalog.blg", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blg.warehouse", wh)
    spark.sql("CREATE TABLE blg.ns.t_lg (k STRING, v BIGINT) " +
      "TBLPROPERTIES ('bloom.columns'='k')")
    (0 until 500).map(i => (f"key$i%06d", i.toLong)).toDF("k", "v")
      .coalesce(1).writeTo("blg.ns.t_lg").append()
    (0 until 500).map(i => (f"big$i%06d", i.toLong)).toDF("k", "v")
      .coalesce(1).writeTo("blg.ns.t_lg").append()
    import scala.jdk.CollectionConverters._
    val td = Files.list(Paths.get(wh))
      .filter(p => Files.isRegularFile(p.resolve("table.json")))
      .findFirst().orElseThrow()
    // rewrite v1/v2 into the pre-sidecar format a round-13 log used:
    // inline base64 words ("bl"), no refs — and delete the sidecars,
    // exactly the on-disk state such a log leaves behind
    val pathRe = """"path":"([^"]+)"""".r
    val refRe = """"blx":\[\[(\d+),(\d+),(\d+)\]\]""".r
    for (v <- Seq(1, 2)) {
      val p = td.resolve("log").resolve(f"$v%011d.json")
      val json0 = new String(Files.readAllBytes(p), "UTF-8")
      val seg = td.resolve(pathRe.findFirstMatchIn(json0).get.group(1))
      val words = GraftBloomSidecar.read(seg)
      val m = refRe.findFirstMatchIn(json0).get
      val ord = m.group(1).toInt
      val json = refRe.replaceFirstIn(json0,
        s""""bl":[[$ord,${m.group(2)},"${
          GraftBloom.encodeWords(words(ord).words)}"]]""")
      assert(json != json0, "rewrite must hit the entry")
      Files.write(p, json.getBytes("UTF-8"))
      Files.delete(GraftBloomSidecar.pathFor(seg))
    }
    // cold fold: the eager words serve the lookup AND re-materialize
    // the sidecars beside their segments
    spark.conf.set("spark.sql.catalog.blg1", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blg1.warehouse", wh)
    spark.conf.set("spark.sql.catalog.blg1.warehouse.isolated", "true")
    assert(spark.table("blg1.ns.t_lg")
      .filter(col("k") === "big000007").count() === 1L)
    val sidecars = Files.list(td.resolve("data")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".bloom")).toSeq
    assert(sidecars.size === 2,
      s"legacy decode must materialize the missing sidecars: $sidecars")
    // retention retires the legacy entries (VACUUM anchors a checkpoint
    // at the base, whose re-encode carries only refs): the next cold
    // fold has no inline words left — only the materialized sidecars
    spark.sql("INSERT INTO blg1.ns.t_lg VALUES ('more', 1)")
    GraftMaintenance.sql(spark, "VACUUM blg1.ns.t_lg RETAIN 1 SNAPSHOTS")
      .collect()
    spark.conf.set("spark.sql.catalog.blg2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blg2.warehouse", wh)
    spark.conf.set("spark.sql.catalog.blg2.warehouse.isolated", "true")
    assert(spark.table("blg2.ns.t_lg")
      .filter(col("k") === "big000007").count() === 1L)
    val t2 = graftTable("blg2", "ns", "t_lg")
    assert(t2.lastScanCensus.get.filesRead === 1,
      s"the migrated filters must keep skipping: ${t2.lastScanCensus.get}")
  }
}
