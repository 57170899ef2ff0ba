package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** One persisted SQL VIEW definition (r18 — the DSv2 `ViewCatalog`
  * surface on [[GraftCatalog]]). A view is a named, parameter-free SQL
  * macro: the stored text re-parses and INLINES at read time, so
  * Catalyst optimizes straight through it — column pruning, filter
  * pushdown and zone/bloom skipping reach the underlying scans exactly
  * as if the user had written the body by hand (the reference's
  * semantic-model measures are this shape: named definitions over the
  * warehouse tables).
  *
  * `currentCatalog`/`currentNamespace` capture the CREATE-time
  * resolution context: unqualified table names inside the body mean
  * the same tables wherever the view is later read from (standard view
  * semantics — Iceberg's V2 views persist the same pair).
  * `queryColumnNames` are the analyzed output columns at create time;
  * `columnAliases` (optional) rename them positionally. */
case class GraftViewMeta(
    namespace: Seq[String],
    name: String,
    sql: String,
    currentCatalog: String,
    currentNamespace: Seq[String],
    schemaDdl: String,
    queryColumnNames: Seq[String],
    columnAliases: Seq[String],
    properties: Map[String, String])

/** Warehouse persistence for view definitions: one self-contained JSON
  * per view under `<warehouse>/_views/` (the name prefix keeps the dir
  * out of the table-dir scan at open — table discovery requires
  * `table.json`). Durable stores treat DISK as the source of truth —
  * every load re-reads the file, so a second process's CREATE/ALTER/
  * DROP is visible immediately with no invalidation protocol; a view
  * JSON is a few hundred bytes, one read per query ANALYSIS (never per
  * row or per task). Creation CASes through the [[GraftLogStore]]
  * backend, so duplicate names refuse across processes. In-JVM stores
  * (no warehouse) keep views in the store map alone. */
object GraftViews {

  /** Diagnostic: total `lookupView` calls this JVM — the analyzer
    * fast-path pin (GraftExtensionsSpec asserts a view-free query
    * analyzes with ZERO probes). Never read on a hot path. */
  val probes = new java.util.concurrent.atomic.AtomicLong(0)

  def viewsDir(wh: Path): Path = wh.resolve("_views")

  /** Filename-safe encoding of one identifier part: URL-encode, then
    * escape '.' (legal inside a quoted identifier part, but the joiner
    * between parts here) and '*'. */
  private def enc(part: String): String =
    java.net.URLEncoder.encode(part, "UTF-8")
      .replace(".", "%2E").replace("*", "%2A")

  def path(wh: Path, ns: Seq[String], name: String): Path =
    viewsDir(wh).resolve((ns :+ name).map(enc).mkString(".") + ".json")

  def encode(m: GraftViewMeta): String = {
    def arr(xs: Seq[String]) = JArray(xs.toList.map(JString(_)))
    JsonMethods.compact(JsonMethods.render(JObject(List(
      "namespace" -> arr(m.namespace),
      "name" -> JString(m.name),
      "sql" -> JString(m.sql),
      "currentCatalog" -> JString(m.currentCatalog),
      "currentNamespace" -> arr(m.currentNamespace),
      "schemaDdl" -> JString(m.schemaDdl),
      "queryColumnNames" -> arr(m.queryColumnNames),
      "columnAliases" -> arr(m.columnAliases),
      "properties" -> JObject(m.properties.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) })))))
  }

  def decode(json: String): GraftViewMeta = {
    val o = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    def str(k: String): String =
      o(k).asInstanceOf[JString].s
    def arr(k: String): Seq[String] =
      o(k).asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
    val props = o("properties").asInstanceOf[JObject].obj.map {
      case (k, JString(v)) => k -> v
      case (k, other) => k -> other.toString
    }.toMap
    GraftViewMeta(arr("namespace"), str("name"), str("sql"),
      str("currentCatalog"), arr("currentNamespace"), str("schemaDdl"),
      arr("queryColumnNames"), arr("columnAliases"), props)
  }

  def read(wh: Path, ns: Seq[String], name: String)
      : Option[GraftViewMeta] = {
    val p = path(wh, ns, name)
    if (!Files.isRegularFile(p)) None
    else
      try Some(decode(new String(Files.readAllBytes(p), UTF_8)))
      catch { case _: java.io.IOException => None }
  }

  /** CAS-create: false when a view (file) already owns the name. */
  def create(wh: Path, logStore: GraftLogStore,
      m: GraftViewMeta): Boolean = {
    Files.createDirectories(viewsDir(wh))
    logStore.putIfAbsent(path(wh, m.namespace, m.name),
      encode(m).getBytes(UTF_8))
  }

  /** Replace (ALTER VIEW / CREATE OR REPLACE): last-writer-wins via an
    * atomic move — the same protocol table.json updates use. */
  def replace(wh: Path, m: GraftViewMeta): Unit = {
    Files.createDirectories(viewsDir(wh))
    val p = path(wh, m.namespace, m.name)
    val tmp = viewsDir(wh).resolve(p.getFileName.toString + ".tmp")
    Files.write(tmp, encode(m).getBytes(UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  def drop(wh: Path, logStore: GraftLogStore, ns: Seq[String],
      name: String): Boolean = {
    val p = path(wh, ns, name)
    val existed = Files.isRegularFile(p)
    if (existed) logStore.delete(p)
    existed
  }

  /** Every persisted view in the namespace (decoded — the JSON is the
    * identity; filenames are only uniqueness). */
  def list(wh: Path, ns: Seq[String]): Seq[GraftViewMeta] = {
    val d = viewsDir(wh)
    if (!Files.isDirectory(d)) return Nil
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".json"))
        .flatMap { p =>
          try Some(decode(new String(Files.readAllBytes(p), UTF_8)))
          catch { case scala.util.control.NonFatal(_) => None }
        }
        .filter(_.namespace == ns)
        .toSeq.sortBy(_.name)
    } finally s.close()
  }
}
