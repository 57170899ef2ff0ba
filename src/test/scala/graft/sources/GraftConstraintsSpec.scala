package graft.sources

import graft.SparkSpec
import scala.jdk.CollectionConverters._

/** CHECK constraints (`constraints.<name>` table properties, Delta's
  * ADD CONSTRAINT): compiled once against the table schema, validated
  * against every commit's incoming rows BEFORE the state swaps, and
  * against existing rows when added — the table can never hold a
  * violating row. NULL results pass (SQL CHECK semantics); unsupported
  * expressions are rejected at definition time, never under-enforced. */
class GraftConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    val fq = s"graft_cat.ns.$name"
    spark.sql(s"DROP TABLE IF EXISTS $fq")
    fq
  }

  test("a violating commit is refused whole; valid commits pass; NULL " +
      "passes") {
    val t = freshTable("t_chk")
    spark.sql(s"CREATE TABLE $t (id BIGINT, price DOUBLE) " +
      "TBLPROPERTIES ('constraints.pos_price' = 'price >= 0')")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0), (2, NULL)") // NULL passes
    assert(spark.table(t).count() === 2)

    val ex = intercept[Exception] {
      spark.sql(s"INSERT INTO $t VALUES (3, 5.0), (4, -1.0)")
    }
    assert(exMessage(ex).contains("pos_price"), s"unexpected: $ex")
    // the WHOLE commit refused — the valid row did not land either
    assert(spark.table(t).count() === 2)

    // UPDATE routes through the same gate
    val ex2 = intercept[Exception] {
      spark.sql(s"UPDATE $t SET price = -5 WHERE id = 1")
    }
    assert(exMessage(ex2).contains("pos_price"))
    assert(spark.table(t).filter($"price" < 0).count() === 0)
  }

  private def exMessage(e: Throwable): String = {
    var cur = e
    val sb = new StringBuilder
    while (cur != null) { sb.append(cur.getMessage).append('\n')
      cur = cur.getCause }
    sb.toString
  }

  test("ALTER TABLE adds/drops constraints; adding validates existing " +
      "rows; numeric widening and IN work") {
    val t = freshTable("t_chk_alter")
    spark.sql(s"CREATE TABLE $t (id BIGINT, status STRING)")
    spark.sql(s"INSERT INTO $t VALUES (5, 'ok'), (6, 'bad')")

    // adding a constraint the existing rows violate is refused
    val ex = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('constraints.st' = \"status IN ('ok', 'fine')\")")
    }
    assert(exMessage(ex).contains("existing row"), s"unexpected: $ex")

    // a satisfiable one lands (int literal vs BIGINT column: widening)
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('constraints.idpos' = 'id > 0 AND id < 100')")
    intercept[Exception](spark.sql(s"INSERT INTO $t VALUES (-1, 'x')"))
    assert(spark.table(t).count() === 2)

    // reported through properties; dropping re-opens the gate
    assert(GraftTableStore.tables((Seq("ns"), "t_chk_alter"))
      .properties().get("constraints.idpos") === "id > 0 AND id < 100")
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('constraints.idpos')")
    spark.sql(s"INSERT INTO $t VALUES (-1, 'x')")
    assert(spark.table(t).count() === 3)
  }

  test("fractional literals and narrow-column IN widen correctly; " +
      "decimal mixes resolve in double") {
    val t = freshTable("t_chk_widen")
    spark.sql(s"CREATE TABLE $t (price DOUBLE, n BIGINT) TBLPROPERTIES " +
      "('constraints.frac' = 'price > 0.5', " +
      "'constraints.pick' = 'n IN (1, 2, 3000000000)')")
    spark.sql(s"INSERT INTO $t VALUES (0.6, 1), (0.7, 3000000000)")
    // 0.5 parses as DECIMAL(1,1): the comparison must resolve in DOUBLE,
    // not cast the column into the literal's 1-digit precision (which
    // would overflow to NULL and pass everything)
    intercept[Exception](spark.sql(s"INSERT INTO $t VALUES (0.4, 2)"))
    // int literals widened up to the BIGINT column, not vice versa
    intercept[Exception](spark.sql(s"INSERT INTO $t VALUES (0.9, 7)"))
    assert(spark.table(t).count() === 2)
  }

  test("unsupported or malformed expressions are rejected at definition " +
      "time") {
    val t = freshTable("t_chk_bad")
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    // function calls are outside the enforced dialect
    intercept[Exception](spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('constraints.f' = 'length(v) < 10')"))
    // non-boolean
    intercept[Exception](spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('constraints.n' = 'id + 1')"))
    // unknown column
    intercept[Exception](spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('constraints.u' = 'nope > 0')"))
    // string vs numeric comparison
    intercept[Exception](spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('constraints.t' = 'v > 3')"))
    // none of them half-registered
    assert(GraftTableStore.tables((Seq("ns"), "t_chk_bad")).properties()
      .keySet().asScala.forall(!_.startsWith("constraints.")))
  }
}
