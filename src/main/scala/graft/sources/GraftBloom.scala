package graft.sources

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-(file, column) Bloom filter — Delta's bloom-filter index, the
  * data-skipping complement to zone maps: zone maps prune files by
  * min/max envelope, which only bites when values CLUSTER (sorted,
  * z-ordered, partition-correlated); a point lookup on a
  * high-cardinality UNCLUSTERED key (an id, a hash, a uuid) matches
  * every file's envelope and scans the table. A per-file bloom answers
  * "might this exact value be in this file" in O(k) word probes with no
  * false negatives, so `WHERE key = x` touches the handful of files
  * that can contain x — on a 100 TB table the difference between a
  * point lookup and a table scan.
  *
  * The filter lives in the table's commit log next to the zone maps
  * (Delta keeps it in a sidecar index file; the shape is the same:
  * per-file, immutable, rebuilt when the file is rewritten). Sized at
  * [[GraftBloom.BitsPerKey]] bits per distinct-ish key with
  * [[GraftBloom.K]] probes → ~1% false positives; a 64k-row file costs
  * ~80 KB of log metadata per bloom'd column — metadata-budget-sized,
  * and ONLY for the columns the user opted in via the
  * `bloom.columns` table property.
  *
  * Hashing is engine-stable (XXH64 over the Catalyst-internal value
  * with a fixed seed) and double-hashed: probe i tests bit
  * `h1 + i·h2 mod m`. Words serialize little-endian base64 in the log.
  */
final case class GraftBloom(words: Array[Long], k: Int)
    extends Serializable {
  private def bits: Long = words.length.toLong * 64L

  def mightContain(h: Long): Boolean = {
    val h1 = h
    val h2 = (h >>> 32) | 1L // odd ⇒ full-period stride
    val m = bits
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, m)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }
}

object GraftBloom {
  /** Table property opting columns into per-file blooms:
    * `'bloom.columns'='id,key'`. */
  val BloomProp = "bloom.columns"

  /** Optional sizing property: `'bloom.fpp'='0.001'` → bits/key =
    * ceil(-log₂(fpp)/ln 2), probes ≈ 0.69·bits/key — the standard
    * Bloom optimum. Absent ⇒ the 10-bits/key ≈ 1% default. */
  val FppProp = "bloom.fpp"

  /** StructField metadata flag the property compiles into — the schema
    * already ships to executor-side writers and persists in the log, so
    * the flag reaches every stats-building site with zero plumbing. */
  val MetaKey = "graft.bloom"

  /** Per-field bits/key override (from `bloom.fpp`), beside the flag. */
  val BitsMetaKey = "graft.bloom.bits"

  /** The user's `bloom.fpp` value itself, preserved beside the derived
    * bits/key so ALTER re-stamps keep the sizing and `properties()` can
    * report the knob back exactly as set. */
  val FppMetaKey = "graft.bloom.fpp"

  /** ~10 bits/key with 7 probes ≈ 1% false-positive rate — the
    * standard parquet/Delta bloom sizing. */
  val BitsPerKey = 10
  val K = 7

  /** bits/key for a requested false-positive rate (the Bloom optimum
    * m/n = -ln p / (ln 2)², clamped to a sane [4, 64] band). */
  def bitsForFpp(fpp: Double): Int = {
    require(fpp > 0.0 && fpp < 1.0, s"bloom.fpp must be in (0,1): $fpp")
    math.min(64, math.max(4,
      math.ceil(-math.log(fpp) / (math.log(2) * math.log(2))).toInt))
  }

  /** Optimal probe count for a bits/key budget (k = m/n · ln 2). */
  def probesFor(bitsPerKey: Int): Int =
    math.max(1, math.round(bitsPerKey * math.log(2)).toInt)

  /** Types whose equality lookups blooms serve: integral-backed values
    * and strings. Floating point is excluded (equality on doubles is a
    * bug farm, not a lookup), as are nested types. */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Engine-stable 64-bit hash of a Catalyst-internal value. The same
    * function runs at build (over stored rows) and at scan (over the
    * pushed literal), so representation is the only contract. */
  def hashOf(v: Any): Long = v match {
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    case b: java.lang.Boolean => XXH64.hashLong(if (b) 1L else 0L, 42L)
    case n: java.lang.Byte => XXH64.hashLong(n.longValue(), 42L)
    case n: java.lang.Short => XXH64.hashLong(n.longValue(), 42L)
    case n: java.lang.Integer => XXH64.hashLong(n.longValue(), 42L)
    case n: java.lang.Long => XXH64.hashLong(n.longValue(), 42L)
    case other => throw new IllegalArgumentException(
      s"no stable bloom hash for ${other.getClass.getName}")
  }

  /** Build a filter over one column's non-null internal values. */
  def build(values: Iterator[Any], expectedKeys: Int,
            bitsPerKey: Int = BitsPerKey): GraftBloom = {
    val k = if (bitsPerKey == BitsPerKey) K else probesFor(bitsPerKey)
    val bits = math.max(64L, expectedKeys.toLong * bitsPerKey)
    val words = new Array[Long](((bits + 63) / 64).toInt)
    val m = words.length.toLong * 64L
    values.foreach { v =>
      val h1 = hashOf(v)
      val h2 = (h1 >>> 32) | 1L
      var i = 0
      while (i < k) {
        val bit = java.lang.Math.floorMod(h1 + i * h2, m)
        words((bit >>> 6).toInt) |= 1L << (bit & 63)
        i += 1
      }
    }
    GraftBloom(words, k)
  }

  /** Stamp the bloom flag into the named fields' metadata; refuses
    * unknown columns and unsupported types at CREATE time. */
  def stamp(schema: StructType, colsCsv: String,
            fpp: Option[Double] = None): StructType = {
    val names = colsCsv.split(',').map(_.trim).filter(_.nonEmpty)
    names.foreach { c =>
      val i = schema.fieldIndex(c) // throws on unknown column
      if (!supported(schema.fields(i).dataType))
        throw new UnsupportedOperationException(
          s"$BloomProp column $c: type ${schema.fields(i).dataType} has " +
            "no stable equality hash (integral/string/date/timestamp only)")
    }
    val set = names.toSet
    StructType(schema.fields.map { f =>
      if (set.contains(f.name)) {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
          .putBoolean(MetaKey, true)
        fpp.foreach { p =>
          mb.putLong(BitsMetaKey, bitsForFpp(p).toLong)
          mb.putDouble(FppMetaKey, p)
        }
        f.copy(metadata = mb.build())
      } else f
    })
  }

  /** The table's `bloom.fpp` in force, read back from field metadata
    * (table-level at stamp time, so any stamped field carries it). */
  def fppOf(schema: StructType): Option[Double] =
    schema.fields.collectFirst {
      case f if f.metadata.contains(FppMetaKey) =>
        f.metadata.getDouble(FppMetaKey)
    }

  /** The per-field bits/key in force (the `bloom.fpp` override or the
    * default). */
  def bitsOf(f: StructField): Int =
    if (f.metadata.contains(BitsMetaKey))
      f.metadata.getLong(BitsMetaKey).toInt
    else BitsPerKey

  /** Strip every bloom flag (ALTER replaces the set wholesale). */
  def unstamp(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (f.metadata.contains(MetaKey) ||
          f.metadata.contains(BitsMetaKey) ||
          f.metadata.contains(FppMetaKey)) {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
        mb.remove(MetaKey)
        mb.remove(BitsMetaKey)
        mb.remove(FppMetaKey)
        f.copy(metadata = mb.build())
      } else f
    })

  /** The bloom'd column names, reconstructed from field metadata (the
    * inverse of [[stamp]] — used to report the table property back). */
  def stampedCols(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(MetaKey) &&
        f.metadata.getBoolean(MetaKey) => f.name
    }

  def encodeWords(words: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    words.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def decodeWords(b64: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}

/** Compact per-file bloom descriptor the COMMIT LOG carries instead of
  * the filter words: (schema ordinal, probe count, word count) per
  * bloom'd column. The words themselves live in a SIDECAR file beside
  * the segment ([[GraftBloomSidecar]]) — a 1M-row file's ~1.3 MB of
  * filter bits must not ride every delta entry and every checkpoint
  * (commit metadata stays O(files), never O(rows); Delta's bloom index
  * and parquet's footer blooms are sidecar bytes for the same reason). */
final case class GraftBloomRef(ord: Int, k: Int, words: Int)
    extends Serializable

/** Bloom-filter SIDECAR io: `<segment>.parquet.bloom` beside the
  * segment, written by the same task that writes the segment (tmp +
  * atomic rename, like the segment itself), read lazily the first time
  * a point lookup consults the file's filters. Self-describing binary:
  * magic, version, capture-width, then (ord, k, nWords, words…) per
  * bloom'd column. The sidecar shares the segment's lifecycle: moved/
  * copied/deleted alongside it, swept by VACUUM when the segment ref
  * is no longer live. */
object GraftBloomSidecar {
  val Suffix = ".bloom"
  private val Magic = 0x47424C4D // "GBLM"

  def pathFor(segment: java.nio.file.Path): java.nio.file.Path =
    segment.resolveSibling(segment.getFileName.toString + Suffix)

  /** The log-sized refs of an eager filter array (null when none). */
  def refsOf(blooms: Array[GraftBloom]): Array[GraftBloomRef] = {
    if (blooms == null || blooms.isEmpty) return null
    val rs = blooms.iterator.zipWithIndex.collect {
      case (b, i) if b != null => GraftBloomRef(i, b.k, b.words.length)
    }.toArray
    if (rs.isEmpty) null else rs
  }

  /** Write the filters beside `segment`; returns the refs the commit
    * message / log entry carries, or null when no column carries one. */
  def write(segment: java.nio.file.Path,
            blooms: Array[GraftBloom]): Array[GraftBloomRef] = {
    val refs = refsOf(blooms)
    if (refs == null) return null
    val target = pathFor(segment)
    val tmp = target.resolveSibling(target.getFileName.toString +
      ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(tmp)))
    try {
      out.writeInt(Magic)
      out.writeInt(1)
      out.writeInt(blooms.length) // capture-width of the array
      out.writeInt(refs.length)
      refs.foreach { r =>
        out.writeInt(r.ord); out.writeInt(r.k); out.writeInt(r.words)
        val ws = blooms(r.ord).words
        var i = 0
        while (i < ws.length) { out.writeLong(ws(i)); i += 1 }
      }
    } finally out.close()
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    refs
  }

  /** Read the filters back. LOUD on a missing sidecar: a live file
    * whose sidecar vanished means the lifecycle contract broke (a
    * sweep ate bytes a retained ref still needs) — silence here would
    * be an invisible table-scan regression, not safety. */
  def read(segment: java.nio.file.Path): Array[GraftBloom] = {
    val p = pathFor(segment)
    if (!java.nio.file.Files.exists(p))
      throw new IllegalStateException(
        s"bloom sidecar missing for live segment: $p — swept while " +
          "its segment is still referenced?")
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      java.nio.file.Files.newInputStream(p)))
    try {
      val magic = in.readInt(); val ver = in.readInt()
      if (magic != Magic || ver != 1)
        throw new IllegalStateException(
          s"bad bloom sidecar $p (magic=$magic version=$ver)")
      val width = in.readInt()
      val entries = in.readInt()
      val arr = new Array[GraftBloom](width)
      var e = 0
      while (e < entries) {
        val ord = in.readInt(); val k = in.readInt(); val w = in.readInt()
        val words = new Array[Long](w)
        var i = 0
        while (i < w) { words(i) = in.readLong(); i += 1 }
        if (ord < width) arr(ord) = GraftBloom(words, k)
        e += 1
      }
      arr
    } finally in.close()
  }

  /** Lifecycle twins of the segment ops (no-ops when absent). */
  def copyAlongside(src: java.nio.file.Path,
                    dst: java.nio.file.Path): Unit = {
    val s = pathFor(src)
    if (java.nio.file.Files.exists(s))
      java.nio.file.Files.copy(s, pathFor(dst),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
  def moveAlongside(src: java.nio.file.Path,
                    dst: java.nio.file.Path): Unit = {
    val s = pathFor(src)
    if (java.nio.file.Files.exists(s))
      java.nio.file.Files.move(s, pathFor(dst),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
  def deleteAlongside(segment: java.nio.file.Path): Unit = {
    java.nio.file.Files.deleteIfExists(pathFor(segment))
    ()
  }
}
