package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** ROW-ID SIDECAR of a rewritten segment (`<segment>.rowids`): the
  * explicit per-row `_row_id` / `_row_commit_version` vectors a
  * COW/OPTIMIZE/ZORDER output file carries when its rows' identities
  * cannot be arithmetic (they were PRESERVED from the rewrite's
  * inputs). Exactly the role Delta fills by materializing row ids into
  * the rewritten parquet: the vectors live WITH the data bytes, the
  * commit log carries only an O(1) flag per file, and readers load the
  * sidecar lazily, executor-side, once per scan partition — a 100 TB
  * table's metadata never grows with row churn.
  *
  * Reference semantics reproduced: Delta protocol "Row Tracking"
  * (baseRowId + materialized row ids through rewrites); Iceberg v3 row
  * lineage (first_row_id per file). Layout: magic, version, n, n×id,
  * n×commitVersion. Written tmp-then-atomic-rename like the bloom
  * sidecar; swept by the same lifecycle (GraftTableLog.reclaim maps it
  * to its segment's ref). */
object GraftRowIdSidecar {
  val Suffix = ".rowids"
  private val Magic = 0x47524944 // "GRID"

  def pathFor(segment: Path): Path =
    segment.resolveSibling(segment.getFileName.toString + Suffix)

  def write(segment: Path, ids: Array[Long], vers: Array[Long]): Unit = {
    require(ids.length == vers.length,
      s"row-id sidecar vectors disagree: ${ids.length} ids, " +
        s"${vers.length} versions")
    val target = pathFor(segment)
    val tmp = target.resolveSibling(target.getFileName.toString +
      ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(tmp)))
    try {
      out.writeInt(Magic)
      out.writeInt(1)
      out.writeInt(ids.length)
      var i = 0
      while (i < ids.length) { out.writeLong(ids(i)); i += 1 }
      i = 0
      while (i < vers.length) { out.writeLong(vers(i)); i += 1 }
    } finally out.close()
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** LOUD on a missing sidecar — a live explicit-tracked file whose
    * vectors vanished means the lifecycle contract broke; serving
    * nulls (or arithmetic ids) instead would silently corrupt row
    * identity downstream (CDF pairing, incremental MERGE audits). */
  def read(segment: Path): (Array[Long], Array[Long]) = {
    val p = pathFor(segment)
    if (!Files.exists(p))
      throw new IllegalStateException(
        s"row-id sidecar missing for live segment: $p — swept while " +
          "its segment is still referenced?")
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(p)))
    try {
      val magic = in.readInt(); val ver = in.readInt()
      if (magic != Magic || ver != 1)
        throw new IllegalStateException(
          s"bad row-id sidecar $p (magic=$magic version=$ver)")
      val n = in.readInt()
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) { ids(i) = in.readLong(); i += 1 }
      val vers = new Array[Long](n)
      i = 0
      while (i < n) { vers(i) = in.readLong(); i += 1 }
      (ids, vers)
    } finally in.close()
  }

  /** Deep-clone helper: carry the vectors with their copied segment. */
  def copyAlongside(from: Path, to: Path): Unit = {
    val src = pathFor(from)
    if (Files.exists(src))
      Files.copy(src, pathFor(to), StandardCopyOption.REPLACE_EXISTING)
  }
}
