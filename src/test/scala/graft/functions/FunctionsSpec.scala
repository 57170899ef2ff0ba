package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("polyHash matches the reference recurrence") {
    // independently computed: fold of (acc*31 + ascii) % 1e9+7 over chars
    val got = Seq("5|t1 t2 t3", "a").toDF("s")
      .select(TextFunctions.polyHash(col("s"))).as[Long].collect()
    assert(got === Array(428288651L, 97L))
  }

  test("codegen PolyHash expression equals the HOF formulation") {
    val strs = (1 to 200).map(i => s"token_$i some text $i!")
    val df = strs.toDF("s").select(
      TextFunctions.polyHash(col("s")).as("fast"),
      TextFunctions.polyHashHof(col("s")).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("shingles: n-grams, distinct, short-input guard") {
    val got = Seq("t1 t2 t3 t4 t5", "t1 t2").toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("t1 t2 t3", "t2 t3 t4", "t3 t4 t5"))
    assert(got(1) === Seq.empty)
  }

  test("fused minhashes equals the per-permutation formulation bit-for-bit") {
    // includes multi-char permutation prefixes (10..11) and the empty-
    // shingle edge (short doc -> k NULL elements, like array_min(empty))
    val k = 12
    val docs = (1 to 120).map(i =>
      (1 to (i % 7) + 1).map(j => s"w${(i * 31 + j) % 50}").mkString(" ")) :+
      "short"
    val df = docs.toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 2).as("sh"))
      .select(
        TextFunctions.minhashes(col("sh"), k).as("fused"),
        array((0 until k).map(p => TextFunctions.minhash(col("sh"), p)): _*)
          .as("ref"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Any](0) === r.getSeq[Any](1))
    }
    // the short doc produced the all-NULL signature in both formulations
    assert(rows.exists(_.getSeq[Any](0).forall(_ == null)))
  }

  test("one-pass shingle_minhash equals the string-materializing formulation") {
    // random-ish token arrays incl. the short-doc edge (< n tokens -> null)
    val docs = (1 to 150).map(i =>
      (1 to (i % 9)).map(j => s"w${(i * 17 + j * 5) % 40}").mkString(" "))
    val df = docs.toDF("text")
      .select(TextFunctions.tokens(col("text")).as("l"))
      .select(
        TextFunctions.fingerprint(col("l")).as("fast"),
        TextFunctions.fingerprintHof(col("l")).as("ref"))
    val rows = df.collect()
    assert(rows.exists(_.isNullAt(0)), "short docs must fingerprint to null")
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("one-pass winnow equals the HOF formulation as a fingerprint set") {
    // token arrays crossing every edge: < n tokens (empty), n..n+w-2
    // shingles (single global min), and long docs (true sliding windows)
    val docs = (1 to 150).map(i =>
      (1 to (i % 12)).map(j => s"w${(i * 13 + j * 7) % 25}").mkString(" "))
    val rows = docs.toDF("text")
      .select(TextFunctions.tokens(col("text")).as("l"))
      .select(
        TextFunctions.winnow(col("l"), 3, 4).as("fast"),
        TextFunctions.winnowHof(col("l"), 3, 4).as("ref"))
      .collect()
    assert(rows.exists(_.getSeq[Long](0).isEmpty), "no short-doc edge hit")
    assert(rows.exists(_.getSeq[Long](0).size > 1), "no multi-window doc")
    rows.foreach { r =>
      assert(r.getSeq[Long](0).toSet === r.getSeq[Long](1).toSet)
      // and the native twin is sorted ascending (deterministic layout)
      val f = r.getSeq[Long](0)
      assert(f == f.sorted)
    }
  }

  test("minhash is permutation-dependent and deterministic") {
    val df = Seq("x y z w").toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 2).as("sh"))
    val a = df.select(TextFunctions.minhash(col("sh"), 0)).head().getLong(0)
    val b = df.select(TextFunctions.minhash(col("sh"), 1)).head().getLong(0)
    val a2 = df.select(TextFunctions.minhash(col("sh"), 0)).head().getLong(0)
    assert(a === a2)
    assert(a !== b)
  }

  test("simhash: identical docs collide, 32-bit range") {
    val df = Seq("spark window agg join", "spark window agg join", "totally different words here")
      .toDF("text")
      .withColumn("hs", transform(TextFunctions.tokens(col("text")),
        t => TextFunctions.polyHash(t)))
      .select(TextFunctions.simhash(col("hs")).as("sh"))
    val got = df.as[Long].collect()
    assert(got(0) === got(1))
    assert(got.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("simhashBits: width control, 32-bit compat, 60-bit composition locality") {
    val texts = Seq(
      "spark window agg join broadcast shuffle codegen",
      "spark window agg join broadcast shuffle codegen",      // identical
      "spark window agg join broadcast shuffle pipeline",     // 1 token off
      "entirely unrelated vocabulary everywhere now")
    val df = texts.toDF("text")
      .withColumn("hs1", transform(TextFunctions.tokens(col("text")),
        t => TextFunctions.polyHash(t)))
      .withColumn("hs2", transform(TextFunctions.tokens(col("text")),
        t => TextFunctions.polyHash(concat(lit("q|"), t))))
      .select(
        TextFunctions.simhashBits(col("hs1"), 30).as("h30"),
        (TextFunctions.simhashBits(col("hs1"), 30) +
          TextFunctions.simhashBits(col("hs2"), 30) * lit(1073741824L)).as("h60"),
        TextFunctions.simhash(col("hs1")).as("h32"))
    val rows = df.collect()
    val h30 = rows.map(_.getAs[Long]("h30"))
    val h60 = rows.map(_.getAs[Long]("h60"))
    val h32 = rows.map(_.getAs[Long]("h32"))
    // the hash domain is mod 1e9+7 (< 2^30), so 30- and 32-bit simhashes
    // agree and stay in 30-bit range
    assert(h30 === h32)
    assert(h30.forall(v => v >= 0 && v < (1L << 30)))
    assert(h60.forall(v => v >= 0 && v < (1L << 60)))
    // identical docs collide at 60 bits; near-identical docs land within
    // a small Hamming distance; unrelated docs far away
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h60(0) === h60(1))
    assert(ham(h60(0), h60(2)) <= 12)
    assert(ham(h60(0), h60(3)) > 12)
  }

  test("codegen DotProduct equals the HOF formulation bit-for-bit") {
    val rng = new scala.util.Random(7)
    val df = (1 to 100).map { _ =>
      (Array.fill(64)(rng.nextFloat()), Array.fill(64)(rng.nextFloat()))
    }.toDF("a", "b")
      .select(VectorFunctions.toDoubleArr(col("a")).as("a"),
        VectorFunctions.toDoubleArr(col("b")).as("b"))
    val cmp = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      VectorFunctions.dotHof(col("a"), col("b")).as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("null array elements follow the HOF null algebra (no NPE)") {
    // minhashes: NULL elements skipped, like array_min over transform
    // (poly_hash(NULL) = NULL, which array_min ignores)
    val r = spark.sql(
      """SELECT minhashes(array('a b', NULL, 'b c'), 2) AS got,
        |  array(
        |    array_min(transform(array('a b', 'b c'),
        |      s -> poly_hash(concat('0|', s)))),
        |    array_min(transform(array('a b', 'b c'),
        |      s -> poly_hash(concat('1|', s))))) AS ref""".stripMargin).head()
    assert(r.getSeq[Any](0) === r.getSeq[Any](1))
    // all elements NULL -> k NULLs, same as empty
    val allNull = spark.sql("SELECT minhashes(array(CAST(NULL AS STRING)), 3)")
      .head().getSeq[Any](0)
    assert(allNull === Seq(null, null, null))
    // shingle_minhash: windows containing a NULL token hash to NULL
    // (concat propagates) and drop; min over the survivors
    val s1 = spark.sql("SELECT shingle_minhash(array('a', NULL, 'b', 'c'), 2)")
      .head().getLong(0)
    val bc = spark.sql("SELECT poly_hash('b c')").head().getLong(0)
    assert(s1 === bc)
    // no surviving window -> NULL
    assert(spark.sql("SELECT shingle_minhash(array('a', NULL), 2)")
      .head().isNullAt(0))
    // winnow: NULL-containing shingles dropped before windowing
    val wn = spark.sql(
      "SELECT winnow_fingerprints(array('a', NULL, 'b', 'c'), 2, 2)")
      .head().getSeq[Long](0)
    assert(wn === Seq(bc))
    assert(spark.sql("SELECT winnow_fingerprints(array(NULL, 'a'), 2, 2)")
      .head().getSeq[Long](0).isEmpty)
  }

  test("size parameters must be foldable non-null integer literals") {
    import org.apache.spark.sql.AnalysisException
    val eNull = intercept[AnalysisException](
      spark.sql("SELECT minhashes(array('a'), CAST(NULL AS INT))"))
    assert(eNull.getMessage.contains("minhashes"))
    assert(eNull.getMessage.contains("foldable"))
    val eCol = intercept[AnalysisException](
      spark.sql("SELECT shingle_minhash(array('a','b'), x) FROM VALUES (2) AS t(x)"))
    assert(eCol.getMessage.contains("shingle_minhash"))
    val eTopk = intercept[AnalysisException](
      spark.sql("SELECT topk(x, CAST(NULL AS INT)) FROM VALUES (1.0d) AS t(x)"))
    assert(eTopk.getMessage.contains("topk"))
    val eWin = intercept[AnalysisException](
      spark.sql("SELECT winnow_fingerprints(array('a','b'), 2, x) FROM VALUES (2) AS t(x)"))
    assert(eWin.getMessage.contains("winnow_fingerprints"))
  }

  test("vec_dot null elements and length mismatch yield NULL like the HOF") {
    // null element -> NULL (zip_with product null -> sum null)
    assert(spark.sql(
      "SELECT vec_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(2.0d, 3.0d))")
      .head().isNullAt(0))
    // length mismatch -> NULL (zip_with pads the shorter side with nulls)
    assert(spark.sql("SELECT vec_dot(array(1.0d), array(2.0d, 3.0d))")
      .head().isNullAt(0))
    // clean inputs still compute
    assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0) === 11.0)
  }

  test("cosine: self-similarity 1.0, orthogonality 0.0") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
      .select(VectorFunctions.cosine(
        VectorFunctions.toDoubleArr(col("a")),
        VectorFunctions.toDoubleArr(col("b"))).as("cos"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) === 0.0)
  }
}
