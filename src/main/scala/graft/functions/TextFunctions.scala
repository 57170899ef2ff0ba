package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-pipeline primitives for large-scale training-data curation:
  * tokenization, shingling, polynomial hashing, MinHash, SimHash, and
  * winnowing-style fingerprints — all as composable Column expressions over
  * Spark's built-in (array) higher-order functions, so every operator is a
  * narrow per-row map: no shuffle, no UDF, no driver involvement. The only
  * shuffles in the downstream dedup pipelines are the groupBy/join on the
  * emitted keys, which is the minimum any distributed dedup needs.
  *
  * The hash is a char-level polynomial rolling hash mod 1e9+7 — chosen over
  * xxhash64 because the DuckDB correctness oracle must reproduce it
  * bit-for-bit with portable SQL (see [[TextSql]], which emits the same
  * formulas as DuckDB SQL from this one definition site).
  */
object TextFunctions {

  val HashMod = 1000000007L

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** acc = (acc*31 + byte) % 1e9+7, folded left-to-right — exact integer
    * arithmetic, identical in any engine. Backed by the codegen-native
    * [[graft.plans.PolyHash]] expression (sessions must call
    * `PolyHashExpr.register` once); [[polyHashHof]] is the pure-built-in
    * formulation kept for cross-validation. */
  def polyHash(s: Column): Column = graft.plans.PolyHashExpr.column(s)

  /** Reference formulation via array higher-order functions — same values
    * (for ASCII input), ~100× slower inner loop; used in tests to pin the
    * custom expression's semantics. */
  def polyHashHof(s: Column): Column =
    aggregate(
      transform(split(s, ""), ch => ascii(ch).cast(LongType)),
      lit(0L),
      (acc, x) => (acc * 31 + x) % HashMod)

  /** Distinct n-token shingles, joined with single spaces. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))

  /** MinHash under permutation `perm`: min over shingles of H(perm|shingle).
    * One value per (row, perm); k permutations = k narrow map columns. */
  def minhash(shingleArr: Column, perm: Int): Column =
    array_min(transform(shingleArr, s => polyHash(concat(lit(s"$perm|"), s))))

  /** All k MinHash permutations in ONE shingle-array pass — bit-equal to
    * `array(minhash(arr, 0), …, minhash(arr, k-1))` (FunctionsSpec pins
    * it) via the codegen-native [[graft.plans.MinHashes]] expression;
    * sessions must call `GraftFunctions.registerAll` first. */
  def minhashes(shingleArr: Column, k: Int): Column =
    call_function(graft.plans.MinHashExpr.FnName, shingleArr, lit(k))

  /** n-bit SimHash over the token multiset: bit j of the result is the
    * sign of Σ_tokens (bit_j(H(token))*2-1). Single-pass: one aggregate
    * folds every token hash into an n-wide bit-sum array (bit test via
    * `h & 2^j`), then one fold re-assembles the value — the token hashes
    * are evaluated exactly once per row (a per-bit formulation would be
    * inlined n× by Catalyst's project collapsing).
    *
    * The hash domain is mod 1e9+7, so only bits 0..29 carry signal; wider
    * signatures must combine several independent hash arrays (see
    * `t10_simhash_pairs`: two 30-bit half-signatures → 60 usable bits). */
  def simhashBits(tokenHashes: Column, nbits: Int): Column = {
    val powers = array((0 until nbits).map(j => lit(1L << j)): _*)
    val bitSums = aggregate(
      tokenHashes,
      array_repeat(lit(0L), nbits),
      (acc, h) => zip_with(acc,
        transform(powers, p => when(h.bitwiseAND(p) > 0, lit(1L)).otherwise(lit(-1L))),
        (a, b) => a + b))
    aggregate(
      zip_with(bitSums, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
  }

  /** 32-bit SimHash (bits 30/31 are structurally 0 — see [[simhashBits]]). */
  def simhash(tokenHashes: Column): Column = simhashBits(tokenHashes, 32)

  /** Winnowing-style document fingerprint: min hash over n-token shingles
    * (single permutation). Equal fingerprints → near-dup candidates.
    * Backed by the one-pass codegen [[graft.plans.ShingleMinHash]]
    * (no shingle strings materialized); [[fingerprintHof]] is the
    * built-in formulation kept for cross-validation. */
  def fingerprint(toks: Column, n: Int = 4): Column =
    call_function(graft.plans.ShingleMinHashExpr.FnName, toks, lit(n))

  /** Reference formulation via shingle strings + array HOFs — identical
    * values (array_min ignores the distinct step); pins the custom
    * expression's semantics in FunctionsSpec. */
  def fingerprintHof(toks: Column, n: Int = 4): Column =
    array_min(transform(shingles(toks, n), s => polyHash(s)))

  /** Positional winnowing: distinct minima of every w-window of n-token
    * shingle hashes (ascending) — the MOSS fingerprint set. Backed by the
    * one-pass codegen [[graft.plans.Winnow]] (monotonic-deque sliding
    * min); [[winnowHof]] is the built-in formulation kept for
    * cross-validation. */
  def winnow(toks: Column, n: Int, w: Int): Column =
    call_function(graft.plans.WinnowExpr.FnName, toks, lit(n), lit(w))

  /** Reference formulation: positional shingle hashes (no distinct) →
    * per-window `array_min(slice(...))` → `array_distinct`; compared as a
    * SET in FunctionsSpec (the native twin returns ascending order). */
  def winnowHof(toks: Column, n: Int, w: Int): Column = {
    val hs = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => polyHash(array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<bigint>"))
    when(size(hs) >= w,
      array_distinct(transform(sequence(lit(0), size(hs) - w),
        j => array_min(slice(hs, j + 1, lit(w))))))
      .when(size(hs) > 0, array(array_min(hs)))
      .otherwise(array().cast("array<bigint>"))
  }
}

/** DuckDB-SQL twins of [[TextFunctions]] — string templates emitting the
  * same arithmetic, so Spark result and oracle share one definition. */
object TextSql {
  /** char-polynomial hash of a VARCHAR expression. */
  def hash(inner: String): String =
    "list_reduce(list_transform(string_split(" + inner +
      ", ''), c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a*31 + b) % 1000000007)"

  /** distinct n-token shingles of a token-list expression `l`. */
  def shingles(l: String, n: Int): String = {
    val parts = (0 until n).map(k => s"$l[i+$k]").mkString(" || ' ' || ")
    s"list_distinct(CASE WHEN len($l) >= $n THEN list_transform(range(1, len($l) - ${n - 2}), i -> $parts) ELSE [] END)"
  }

  def minhash(shingleExpr: String, perm: Int): String =
    s"list_min(list_transform($shingleExpr, s -> ${hash(s"'$perm|' || s")}))"

  /** n-bit simhash over a precomputed token-hash list expression `hs`. */
  def simhashBits(hs: String, nbits: Int): String =
    (0 until nbits).map { j =>
      val pow = 1L << j
      s"(CASE WHEN list_sum(list_transform($hs, h -> ((h // $pow) % 2)*2 - 1)) > 0 THEN CAST($pow AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** 32-bit simhash over a precomputed token-hash list expression `hs`. */
  def simhash(hs: String): String = simhashBits(hs, 32)

  def fingerprint(l: String, n: Int = 4): String =
    s"list_min(list_transform(${shingles(l, n)}, s -> ${hash("s")}))"
}
