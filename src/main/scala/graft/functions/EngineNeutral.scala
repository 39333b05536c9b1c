package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-neutral building blocks shared by the dedup / text operators.
  *
  * The correctness oracle re-computes every query in DuckDB, so anything
  * that hashes must hash IDENTICALLY in both engines. Spark's `xxhash64`
  * and DuckDB's `hash()` differ, but `md5` is bit-identical everywhere:
  * we derive a 60-bit non-negative Long from the first 15 hex chars of
  * md5. Hot kernels are native codegen expressions (Hash60Expr,
  * CharNgramsExpr — see VectorExpressions.scala); the rest stays inside
  * `org.apache.spark.sql.functions` so whole-stage codegen applies. No
  * UDFs anywhere.
  */
object EngineNeutral {

  /** 60-bit deterministic hash of a string column — native kernel
    * ([[Hash60Expr]]: md5 digest bytes straight to a Long, no hex
    * round-trip). Value identical to conv(substring(md5(c),1,15),16,10).
    * DuckDB equivalent: CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT).
    */
  def hash60(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(Hash60Expr(Bridge.expression(c)))
  }

  /** The functions-API formulation of hash60 (reference implementation;
    * tests assert the kernel matches it). */
  def hash60Hof(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: hash60(s + "#" + seed) — used for MinHash permutations.
    * DuckDB: hash60(concat(s, '#', CAST(i AS VARCHAR))).
    */
  def hash60Seeded(c: Column, seed: Column): Column =
    hash60(concat(c, lit("#"), seed.cast("string")))

  // ---- universal-hash MinHash permutations ------------------------------
  // ONE md5 per token; the i-th permutation is (a_i*h + b_i) mod p over the
  // 31-bit base hash (products stay < 2^62 — no Long overflow). 16x fewer
  // md5 evaluations than hashing per permutation, same oracle guarantees.

  /** Mersenne prime 2^31 - 1. */
  val MinhashPrime: Long = 2147483647L

  /** Deterministic permutation coefficients (shared with OracleSql). */
  def minhashA(i: Int): Long = (1103515245L * (i + 1) + 12345L) % MinhashPrime
  def minhashB(i: Int): Long = (2654435761L * (i + 1) + 1013904223L) % MinhashPrime

  /** 31-bit base hash. DuckDB: hash60(t) % 2147483647. */
  def hash31(c: Column): Column = hash60(c) % MinhashPrime

  /** The i-th MinHash permutation of a 31-bit base hash column. */
  def minhashPerm(h31: Column, i: Int): Column =
    (h31 * minhashA(i) + minhashB(i)) % MinhashPrime

  /** Whitespace tokens of trimmed text (never null; empty text → empty array).
    * DuckDB: string_split_regex(trim(text), '\s+').
    */
  def wsTokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Distinct whitespace tokens — the "word set" used by set-similarity ops.
    * DuckDB: list_distinct(string_split_regex(trim(text), '\s+')).
    * NOTE: list_distinct does not preserve order, so never rely on element
    * order downstream — only on set semantics (min / intersect / union).
    */
  def wordSet(text: Column): Column = array_distinct(wsTokens(text))

  /** Distinct character n-grams over the lowercased alphanumeric skeleton.
    * DuckDB: list_distinct(list_transform(range(1, len(s)-n+2),
    *           j -> substr(s, j, n)))   with s = regexp_replace(lower(text),'[^a-z0-9]','','g')
    */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(charNgramsOrdered(text, n))

  /** ORDERED (non-distinct) character n-grams over the lowercased
    * alphanumeric skeleton — positional, as winnowing requires. Native
    * expression: the cleaning regex runs once per row (a lambda-captured
    * version re-runs it per gram — see CharNgramsExpr).
    * DuckDB: list_transform(range(1, len(s)-n+2), j -> substr(s, j, n)).
    */
  def charNgramsOrdered(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    val s = regexp_replace(lower(text), "[^a-z0-9]", "")
    Bridge.column(graft.functions.CharNgramsExpr(Bridge.expression(s), n))
  }

  /** Word w-shingles ("a b c") over whitespace tokens.
    * DuckDB: list_transform(range(1, len(t)-w+2), j -> t[j]||' '||...).
    *
    * Formulated as a zip_with fold of w SHIFTED SLICES — never
    * element_at inside a transform lambda: a lambda-captured token
    * expression re-evaluates the regex split per ELEMENT ACCESS, i.e.
    * O(tokens x w) splits per row (measured 35 s for a corpus pass that
    * runs in under a second this way). The token expression still
    * appears w times (once per slice); callers on a hot path should
    * alias the token array and use [[wordShinglesOf]] directly so it is
    * evaluated once. */
  def wordShingles(text: Column, w: Int): Column =
    array_distinct(wordShinglesOf(wsTokens(text), w))

  /** Non-distinct, in-order w-shingles of an (ideally aliased) token
    * array column. */
  def wordShinglesOf(t: Column, w: Int): Column = {
    val nGrams = greatest(size(t) - (w - 1), lit(0))
    (0 until w).map(m => slice(t, lit(m + 1), nGrams))
      .reduce((acc, p) => zip_with(acc, p, (a, b) => concat_ws(" ", a, b)))
  }

  /** Exact Jaccard of two (already-distinct) string arrays, as double.
    * DuckDB: len(list_intersect(a,b)) / len(list_distinct(list_concat(a,b))).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
