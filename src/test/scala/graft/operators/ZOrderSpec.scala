package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Physical twin of the s31 zone-map census: the Morton code is a real
  * bijection on the bin grid, a z-ordered PARTITIONED layout's per-file
  * stats equal the relational zone map, and reading only the
  * zone-map-scanned files answers the box query exactly (the
  * no-false-negative contract data skipping lives on).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton code is a bijection on the 16x16 bin grid") {
    val pairs = for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong)
    val got = pairs.toDF("bx", "byy")
      .select(ZOrder.morton(col("bx"), col("byy")).as("z"))
      .as[Long].collect().toSet
    assert(got === (0 until 256).map(_.toLong).toSet)
    // locality sanity: the curve keeps each 2x2 cell block in one
    // 4-code span (the property file rectangles derive from)
    val corner = spark.range(1)
      .select(ZOrder.morton(lit(4L), lit(4L)), ZOrder.morton(lit(5L), lit(5L)))
      .head()
    assert((corner.getLong(0), corner.getLong(1)) === ((48L, 51L)))
  }

  test("physical layout: file stats equal the zone map, skipping loses no rows, z beats linear") {
    val pts = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val mm = pts.agg(min("x"), max("x"), min("y"), max("y")).head()
    val (minx, maxx, miny, maxy) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    val laid = pts.select(col("x"), col("y"),
        ZOrder.bin16(col("x"), lit(minx), lit(maxx)).as("bx"),
        ZOrder.bin16(col("y"), lit(miny), lit(maxy)).as("byy"))
      .withColumn("zv", ZOrder.morton(col("bx"), col("byy")))
      .withColumn("fz", expr("zv DIV 16"))
    val dest = tmpDir("zorder") + "/t"
    laid.write.partitionBy("fz").parquet(dest)

    // relational zone map vs the stats of the PHYSICAL files
    val zone = laid.groupBy("fz")
      .agg(min("bx").as("minbx"), max("bx").as("maxbx"),
        min("byy").as("minby"), max("byy").as("maxby"),
        count(lit(1)).as("nr"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    zone.foreach { case (f, (mnx, mxx, mny, mxy, nr)) =>
      val file = spark.read.parquet(s"$dest/fz=$f")
        .agg(min("bx"), max("bx"), min("byy"), max("byy"), count(lit(1)))
        .head()
      assert((file.getLong(0), file.getLong(1), file.getLong(2),
        file.getLong(3), file.getLong(4)) === ((mnx, mxx, mny, mxy, nr)),
        s"file $f stats diverge from the zone map")
    }

    // box query answered from ONLY the zone-map-scanned files
    def overlaps(e: (Long, Long, Long, Long, Long)): Boolean =
      !(e._2 < 4 || e._1 > 5 || e._4 < 4 || e._3 > 5)
    val scanned = zone.filter { case (_, e) => overlaps(e) }.keys.toSeq
    val boxFilter = col("bx").between(4, 5) && col("byy").between(4, 5)
    val viaSkip = spark.read.parquet(dest)
      .filter(col("fz").isin(scanned: _*) && boxFilter).count()
    val full = laid.filter(boxFilter).count()
    assert(full > 0 && viaSkip === full,
      "skipped read must return every matching row")
    // the partition filter actually prunes at the source, not post-scan
    val plan = spark.read.parquet(dest)
      .filter(col("fz").isin(scanned: _*) && boxFilter)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("fz"),
      s"expected fz partition pruning at the scan:\n$plan")

    // 2-D selectivity: the linear (x-stripe) layout must scan at least
    // as many rows as the z-order layout for the same box
    val linZone = laid.groupBy("bx")
      .agg(min("byy").as("minby"), max("byy").as("maxby"),
        count(lit(1)).as("nr"))
      .collect().map(r => (r.getLong(0), r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val linScanned = linZone.filter(overlaps).map(_._5).sum
    val zScanned = zone.values.filter(overlaps).map(_._5).sum
    assert(zScanned <= linScanned,
      s"z-order scanned $zScanned rows vs linear $linScanned")
  }
}
