package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Child-process entry for [[GraftMultiProcessSpec]]: a REAL second JVM
  * exercising the warehouse commit protocol (OS file lock + hard-link
  * CAS) under genuine process isolation.
  *
  * Modes:
  *  - `append <wh> <cat> <tbl> <from> <to>`: one INSERT per id, then
  *    clean exit — the concurrent-writers stress.
  *  - `crash <wh> <cat> <tbl> _ _`: land a writer task's segment like an
  *    in-flight write would, then `halt` WITHOUT committing — the
  *    kill-mid-commit probe. The contract under test: a crash leaves at
  *    worst an unreferenced segment/tmp, never a log entry referencing
  *    missing data (GraftDurability's claim). */
object ForkedWriterMain {
  def main(args: Array[String]): Unit = {
    val Array(mode, wh, cat, tbl, fromS, toS) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-forked-$mode-$cat")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("forked-wh").toString)
      .getOrCreate()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse.isolated", "true")
    mode match {
      case "append" =>
        (fromS.toLong to toS.toLong).foreach { i =>
          spark.sql(s"INSERT INTO $cat.ns.$tbl VALUES ($i, 'w-$cat')")
        }
        spark.stop()
        sys.exit(0)
      case "crash" =>
        val t = spark.sessionState.catalogManager.catalog(cat)
          .asInstanceOf[GraftCatalog].store.tables((Seq("ns"), tbl))
        val spec = t.durableWriteSpec().get
        val w = GraftWriterFactory(None, Some(spec)).createWriter(0, 0L)
        w.write(new GenericInternalRow(Array[Any](999L,
          UTF8String.fromString("crash"))))
        w.commit() // the segment lands; the table commit never happens
        Runtime.getRuntime.halt(137)
      case other =>
        System.err.println(s"unknown mode $other"); sys.exit(2)
    }
  }
}
