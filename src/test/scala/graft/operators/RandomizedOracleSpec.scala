package graft.operators

import graft.SparkSpec

/** Randomized cross-checks of the custom operators against brute-force
  * in-memory oracles — seeded, so failures reproduce. The DuckDB gate
  * verifies each operator on ONE data distribution; these sweep many
  * random shapes (dense/sparse graphs, tie-heavy timelines) where the
  * distributed formulations could diverge from the spec'd semantics.
  */
class RandomizedOracleSpec extends SparkSpec {
  import spark.implicits._

  test("connected components match a union-find oracle on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 20 + rnd.nextInt(40)
      val m = 5 + rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // union-find oracle → per-node min reachable id
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val touched = edges.flatMap(e => Seq(e._1.toInt, e._2.toInt)).distinct
      val minOfRoot = touched.groupBy(find).map { case (r, ns) => r -> ns.min }
      val expected = touched.map(v => v.toLong -> minOfRoot(find(v)).toLong).toMap

      val got = ConnectedComponents(edges.toDF("a", "b"), maxIter = 40)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial: n=$n m=$m")
    }
  }

  test("as-of join matches a brute-force scan on random keyed timelines") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nKeys = 1 + rnd.nextInt(4)
      // quotes: distinct (key, time) as AsOfJoin requires; values encode
      // identity so the matched row is checkable
      val quotes = (for {
        k <- 0 until nKeys
        t <- rnd.shuffle((0 until 50).toList).take(5 + rnd.nextInt(10))
      } yield (k.toLong, t.toLong, k * 1000.0 + t)).toSeq
      val trades = Seq.fill(30)((rnd.nextInt(nKeys).toLong, rnd.nextInt(55).toLong))
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val expected = trades.map { case (id, k, t) =>
        id -> quotes.filter(q => q._1 == k && q._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap

      val got = AsOfJoin(
        trades.toDF("trade_id", "k", "t_time"),
        quotes.toDF("k", "q_time", "px"),
        "k", "t_time", "q_time")
        .collect()
        .map(r => r.getAs[Long]("trade_id") ->
          (if (r.isNullAt(r.fieldIndex("px"))) None
           else Some(r.getAs[Double]("px")))).toMap
      assert(got === expected, s"trial $trial: keys=$nKeys")
    }
  }

  test("deque winnowing matches a brute-force oracle on random token arrays") {
    import org.apache.spark.sql.functions._
    def refHash(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val n = 2 + rnd.nextInt(3) // shingle size 2..4
      val w = 2 + rnd.nextInt(4) // window 2..5
      val rows = Seq.fill(80)(
        Seq.fill(rnd.nextInt(14))(s"t${rnd.nextInt(12)}"))
      val expected = rows.map { toks =>
        if (toks.length < n) Set.empty[Long]
        else {
          val hs = toks.sliding(n).map(g => refHash(g.mkString(" "))).toSeq
          if (hs.length < w) Set(hs.min)
          else hs.sliding(w).map(_.min).toSet
        }
      }
      val got = rows.toDF("l")
        .select(graft.functions.TextFunctions.winnow(col("l"), n, w))
        .collect().map(_.getSeq[Long](0).toSet)
      assert(got.toSeq === expected, s"trial $trial: n=$n w=$w")
    }
  }

  test("fused minhashes matches an in-memory oracle on random shingle sets") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(11)
    def refHash(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    for (trial <- 1 to 3) {
      val k = 1 + rnd.nextInt(15) // crosses the 1-digit/2-digit prefix edge
      val rows = Seq.fill(60)(
        Seq.fill(rnd.nextInt(8))( // includes empty shingle arrays
          Seq.fill(1 + rnd.nextInt(3))(s"tk${rnd.nextInt(30)}").mkString(" ")))
      val expected = rows.map { shingles =>
        (0 until k).map { p =>
          if (shingles.isEmpty) None
          else Some(shingles.map(s => refHash(s"$p|$s")).min)
        }
      }
      val got = rows.toDF("sh")
        .select(graft.functions.TextFunctions.minhashes(col("sh"), k))
        .collect()
        .map(_.getSeq[Any](0).map(Option(_).map(_.asInstanceOf[Long])))
      // per-row multisets: DataFrame order is preserved for a local seq
      assert(got.toSeq === expected, s"trial $trial: k=$k")
      // sanity: the expression's own prefix table agrees with the fold
      assert(graft.plans.MinHashExpr.prefixHashes(k).toSeq ===
        (0 until k).map(p => refHash(s"$p|")))
      assert(graft.plans.PolyHashExpr.hash(
        UTF8String.fromString("zz")) === refHash("zz"))
    }
  }

  test("null-element algebra holds on random null-mixed inputs") {
    import org.apache.spark.sql.functions._
    def refHash(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    val rnd = new scala.util.Random(31)

    // minhashes: null elements skipped; no survivor → k nulls
    val mhRows = Seq.fill(60)(Seq.fill(rnd.nextInt(6))(
      if (rnd.nextInt(100) < 20) null
      else s"s${rnd.nextInt(20)} s${rnd.nextInt(20)}"))
    val k = 5
    val mhExpected = mhRows.map { sh =>
      val live = sh.filter(_ != null)
      (0 until k).map(p =>
        if (live.isEmpty) None else Some(live.map(s => refHash(s"$p|$s")).min))
    }
    val mhGot = mhRows.toDF("sh")
      .select(graft.functions.TextFunctions.minhashes(col("sh"), k))
      .collect().map(_.getSeq[Any](0).map(Option(_).map(_.asInstanceOf[Long])))
    assert(mhGot.toSeq === mhExpected)

    // shingle_minhash + winnow: windows containing a null token drop
    val tkRows = Seq.fill(60)(Seq.fill(rnd.nextInt(12))(
      if (rnd.nextInt(100) < 15) null else s"t${rnd.nextInt(10)}"))
    val n = 2; val w = 3
    def validWindows(toks: Seq[String]): Seq[Long] =
      if (toks.length < n) Seq.empty
      else toks.sliding(n).filter(_.forall(_ != null))
        .map(g => refHash(g.mkString(" "))).toSeq
    val shExpected = tkRows.map { toks =>
      val hs = validWindows(toks)
      if (hs.isEmpty) None else Some(hs.min)
    }
    val shGot = tkRows.toDF("l")
      .select(graft.functions.TextFunctions.fingerprint(col("l"), n))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(shGot.toSeq === shExpected)
    val wnExpected = tkRows.map { toks =>
      val hs = validWindows(toks)
      if (hs.isEmpty) Set.empty[Long]
      else if (hs.length < w) Set(hs.min)
      else hs.sliding(w).map(_.min).toSet
    }
    val wnGot = tkRows.toDF("l")
      .select(graft.functions.TextFunctions.winnow(col("l"), n, w))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(wnGot.toSeq === wnExpected)

    // vec_dot: any null element or a length mismatch → NULL
    val vRows = Seq.fill(60) {
      val la = 1 + rnd.nextInt(5)
      val lb = if (rnd.nextInt(100) < 20) 1 + rnd.nextInt(5) else la
      (Seq.fill(la)(if (rnd.nextInt(100) < 15) null
        else java.lang.Double.valueOf(rnd.nextInt(10).toDouble)),
        Seq.fill(lb)(if (rnd.nextInt(100) < 15) null
          else java.lang.Double.valueOf(rnd.nextInt(10).toDouble)))
    }
    val vExpected = vRows.map { case (a, b) =>
      if (a.length != b.length || a.contains(null) || b.contains(null)) None
      else Some(a.zip(b).map(p => p._1.doubleValue * p._2.doubleValue).sum)
    }
    val vGot = vRows.toDF("a", "b")
      .select(graft.functions.VectorFunctions.dot(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vGot.toSeq === vExpected)
  }
}
