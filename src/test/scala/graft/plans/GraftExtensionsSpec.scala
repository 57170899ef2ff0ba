package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions` route: a session constructed with
  * [[GraftExtensions]] resolves the custom functions with no explicit
  * `registerAll` call, and child sessions inherit them.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions-built session resolves poly_hash/vec_dot/topk in SQL") {
    spark // force the shared session (and its SparkContext) to exist first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // reuses the JVM's SparkContext; builds a NEW session state with the
      // extensions applied — exactly what --conf spark.sql.extensions does
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      try {
        val hash = s2.sql("SELECT poly_hash('spark')").head().getLong(0)
        assert(hash == PolyHashExpr.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString("spark")))
        val dot = s2.sql(
          "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
          .head().getDouble(0)
        assert(dot == 11.0)
        val topk = s2.sql(
          "SELECT topk(x, 2) FROM VALUES (1.0d), (3.0d), (2.0d) AS t(x)")
          .head().getSeq[Double](0)
        assert(topk == Seq(3.0, 2.0))
        val mh = s2.sql("SELECT minhashes(array('a b', 'b c'), 2)")
          .head().getSeq[Long](0)
        val ref = s2.sql(
          """SELECT array(
            |  array_min(transform(array('a b', 'b c'),
            |    s -> poly_hash(concat('0|', s)))),
            |  array_min(transform(array('a b', 'b c'),
            |    s -> poly_hash(concat('1|', s)))))""".stripMargin)
          .head().getSeq[Long](0)
        assert(mh == ref)
        val shmh = s2.sql(
          "SELECT shingle_minhash(array('a', 'b', 'c'), 2)")
          .head().getLong(0)
        val shmhRef = s2.sql(
          "SELECT least(poly_hash('a b'), poly_hash('b c'))")
          .head().getLong(0)
        assert(shmh == shmhRef)
        // 3 shingles of 2 tokens, window 2 → minima of 2 windows
        val win = s2.sql(
          "SELECT winnow_fingerprints(array('a', 'b', 'c', 'd'), 2, 2)")
          .head().getSeq[Long](0).toSet
        val winRef = s2.sql(
          """SELECT array(least(poly_hash('a b'), poly_hash('b c')),
            |             least(poly_hash('b c'), poly_hash('c d')))""".stripMargin)
          .head().getSeq[Long](0).toSet
        assert(win == winRef)
        // wav_meta resolves through the extensions route too
        val wav = WavHeaderExpr.wavBytes(
          Array.tabulate(8)(_.toByte), sampleRate = 16000, channels = 2)
        val hex = wav.map(b => f"$b%02x").mkString
        val wm = s2.sql(
          s"SELECT wav_meta(unhex('$hex')) AS w").selectExpr(
          "w.channels", "w.sample_rate", "w.n_frames").head()
        assert((wm.getInt(0), wm.getInt(1), wm.getLong(2)) === ((2, 16000, 2L)))
        // png_meta resolves through the extensions route too
        val png = PngHeaderExpr.pngBytes(Array.tabulate(6)(_.toByte),
          width = 320, height = 200, colorType = 6)
        val phex = png.map(b => f"$b%02x").mkString
        val pm = s2.sql(
          s"SELECT png_meta(unhex('$phex')) AS p").selectExpr(
          "p.width", "p.height", "p.channels", "p.idat_bytes").head()
        assert((pm.getInt(0), pm.getInt(1), pm.getInt(2), pm.getLong(3))
          === ((320, 200, 4, 6L)))
        // newSession() keeps injected builders (temp functions would not
        // survive this — the reason extensions are the cluster-wide route)
        val s3 = s2.newSession()
        assert(s3.sql("SELECT poly_hash('x')").head().getLong(0) ==
          PolyHashExpr.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString("x")))
      } finally {
        // do NOT s2.stop(): that would stop the JVM-shared SparkContext
        // out from under every later suite; dropping the references is
        // the correct teardown for a context-sharing session
      }
    } finally {
      // restore the shared test session as default/active
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("view-free analysis never probes the view store (fast path), " +
    "and the first CREATE VIEW re-enables substitution") {
    // in-JVM catalog: mayHoldViews == views.nonEmpty (live map)
    spark.conf.set("spark.sql.catalog.extfp", "graft.sources.GraftCatalog")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS extfp.fp")
    spark.sql("CREATE TABLE extfp.fp.t (k INT, v STRING)")
    spark.sql("INSERT INTO extfp.fp.t VALUES (1, 'a'), (2, 'b')")
    // per-STORE counter (r20): another store's view activity — a
    // concurrent suite's background query — cannot flake the == 0 pins
    def storeOf(cat: String) = spark.sessionState.catalogManager
      .catalog(cat).asInstanceOf[graft.sources.GraftCatalog].store
    def probesDuring(cat: String)(body: => Unit): Long = {
      val c = storeOf(cat).viewProbes
      val before = c.get(); body
      c.get() - before
    }
    // no views anywhere in the store → the substitution rule's gate
    // short-circuits before lookupView on every fixpoint iteration
    assert(probesDuring("extfp") {
      assert(spark.sql(
        "SELECT count(*) FROM extfp.fp.t WHERE k = 1").head().getLong(0) == 1)
    } == 0L)
    // first CREATE VIEW flips the store flag; the same read shape now
    // substitutes (and therefore probes)
    spark.sql("CREATE VIEW extfp.fp.v AS SELECT k, upper(v) AS uv FROM extfp.fp.t")
    assert(probesDuring("extfp") {
      assert(spark.sql("SELECT uv FROM extfp.fp.v WHERE k = 2")
        .head().getString(0) == "B")
    } > 0L)
    // DROP of the last view restores the zero-probe fast path (in-JVM
    // store: the live map empties; durable stores conservatively keep
    // probing once the `_views/` dir exists — documented asymmetry)
    spark.sql("DROP VIEW extfp.fp.v")
    assert(probesDuring("extfp") {
      assert(spark.sql(
        "SELECT count(*) FROM extfp.fp.t").head().getLong(0) == 2)
    } == 0L)
    // durable leg: a warehouse-backed catalog with no views stats the
    // missing `_views/` dir and never reads a file; the first CREATE
    // (even from a SECOND catalog instance over the same path) is
    // visible with no invalidation call
    val wh = tmpDir("extfp-wh")
    spark.conf.set("spark.sql.catalog.extfpd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.extfpd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS extfpd.fp")
    spark.sql("CREATE TABLE extfpd.fp.t (k INT)")
    spark.sql("INSERT INTO extfpd.fp.t VALUES (7)")
    assert(probesDuring("extfpd") {
      assert(spark.sql(
        "SELECT count(*) FROM extfpd.fp.t").head().getLong(0) == 1)
    } == 0L)
    spark.sql("CREATE VIEW extfpd.fp.dv AS SELECT k + 1 AS k1 FROM extfpd.fp.t")
    assert(spark.sql("SELECT k1 FROM extfpd.fp.dv").head().getInt(0) == 8)
  }
}
