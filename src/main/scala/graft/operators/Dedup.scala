package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.EngineNeutral._
import graft.syntax._

/** Deduplication suite for training-data pipelines, over `documents`.
  *
  * Five operators, each with a different recall/cost point:
  *  - exact:        hash-groupBy on a normalized fingerprint. One shuffle
  *                  on the hash — embarrassingly scalable.
  *  - minhashLsh:   word-set MinHash signatures → banded buckets →
  *                  bucket-join candidates → exact-Jaccard verify.
  *                  Shuffles on (band, band_hash) — never all-pairs.
  *  - simhash:      64-bit-ish weighted sign-fingerprint per doc; near-dup
  *                  pairs via byte-block banding (Manku et al., WWW'07).
  *  - ngramJaccard: exact set-similarity join on char 3-grams with
  *                  PREFIX FILTERING (Chaudhuri et al., ICDE'06): only the
  *                  globally-rarest (1-t)|s|+1 shingles of each doc are
  *                  indexed, which preserves exactness for threshold t
  *                  while shrinking the inverted index join.
  *  - embeddingNearDup: cosine-threshold pairs; exact blocked variant here,
  *                  LSH variant in Similarity.
  *
  * All hashing is engine-neutral (md5-derived, EngineNeutral.hash60) so
  * the DuckDB oracle reproduces signatures bit-for-bit.
  */
object Dedup {

  // ---- exact ----------------------------------------------------------

  /** Exact dedup groups: one row per distinct normalized content, with
    * the survivor (min doc_id) and the multiplicity. */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select($"doc_id", md5(regexp_replace(lower($"text"), "[^a-z0-9]", "")).as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  // ---- MinHash + LSH --------------------------------------------------

  val MinhashPerms = 16
  val Bands = 4
  val RowsPerBand = 4 // Bands * RowsPerBand == MinhashPerms

  /** MinHash signature columns over a distinct-token-set column. */
  private def minhashSig(ws: Column): Seq[Column] =
    (0 until MinhashPerms).map { i =>
      array_min(transform(ws, t => hash60Seeded(t, lit(i)))).as(s"mh$i")
    }

  /** Per-doc banded signature rows: (doc_id, band_id, band_hash) ONLY —
    * token sets are deliberately NOT carried here, so the band shuffle
    * moves ~50 bytes/row regardless of document size. */
  def minhashBands(s: SparkSession, dir: String): DataFrame = {
    val sig = Tables.documents(s, dir)
      .select(col("doc_id") +: minhashSig(wordSet($"text")): _*)
    val bandRows = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}").cast("string"))
      sig.select(
        $"doc_id",
        lit(b.toLong).as("band_id"),
        md5(concat_ws("|", cols: _*)).as("band_hash"))
    }
    bandRows.reduce(_ unionAll _)
  }

  /** Banded-signature view (no pair join) — the oracle-checkable artifact. */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    minhashBands(s, dir)

  /** Near-dup pairs: docs sharing any band bucket, verified with exact
    * word-set Jaccard >= threshold. The join key (band_id, band_hash)
    * keeps candidate generation linear in bucket sizes — the standard
    * scale-out LSH shape (no all-pairs anywhere). Candidate pairs are
    * deduped FIRST and only then joined back to the word sets, so the
    * heavy token arrays never ride through the band shuffle. */
  def minhashLshPairs(s: SparkSession, dir: String, threshold: Double = 0.9): DataFrame = {
    val bands = minhashBands(s, dir)
    val l = bands.select($"band_id", $"band_hash", $"doc_id".as("doc_a"))
    val r = bands.select($"band_id".as("band_id_r"), $"band_hash".as("band_hash_r"),
      $"doc_id".as("doc_b"))
    val cands = l.join(r,
        $"band_id" === $"band_id_r" && $"band_hash" === $"band_hash_r" &&
          $"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b")
      .distinct()
    val ws = Tables.documents(s, dir).select($"doc_id", wordSet($"text").as("ws"))
    cands
      .join(ws.select($"doc_id".as("doc_a"), $"ws".as("ws_a")), "doc_a")
      .join(ws.select($"doc_id".as("doc_b"), $"ws".as("ws_b")), "doc_b")
      .withColumn("jaccard", jaccard($"ws_a", $"ws_b"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
  }

  // ---- SimHash --------------------------------------------------------

  val SimhashBits = 48

  /** Weighted 48-bit SimHash per doc: bit b is the sign of the sum over
    * tokens (multiset — counts are the weights) of ±1 by the token-hash's
    * bit b, i.e. bit set iff 2·(#tokens with bit b set) >= #tokens.
    * The bit loop is unrolled in Scala so every shift amount is a literal
    * Int (shiftright/shiftleft require one) and codegen stays flat. */
  def simhashCol(text: Column): Column = {
    val toks = wsTokens(lower(text))
    val hashes = transform(toks, t => hash60(t))
    val n = size(hashes).cast("long")
    (0 until SimhashBits).map { b =>
      val setCount = size(filter(hashes,
        h => shiftright(h, b).bitwiseAND(1L) === 1L)).cast("long")
      when(setCount * 2L >= n, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Per-doc SimHash signatures (oracle-checkable). */
  def simhashSignatures(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select($"doc_id", simhashCol($"text").as("simhash"))

  /** Near-dup pairs with Hamming distance <= maxDist, found by block
    * banding: split the 48 bits into 6 bytes; any pair within distance d
    * <= 5 must agree on >= 1 whole byte (pigeonhole), so bucket-join on
    * (byte_idx, byte_value) and verify exact Hamming via bit_count. */
  def simhashPairs(s: SparkSession, dir: String, maxDist: Int = 5): DataFrame = {
    val sig = simhashSignatures(s, dir)
    val blocks = (0 until 6).map { i =>
      sig.select($"doc_id", $"simhash",
        lit(i.toLong).as("blk"),
        shiftright($"simhash", i * 8).bitwiseAND(255L).as("blk_val"))
    }.reduce(_ unionAll _)
    val l = blocks.select($"blk", $"blk_val", $"doc_id".as("doc_a"), $"simhash".as("sh_a"))
    val r = blocks.select($"blk".as("blk_r"), $"blk_val".as("blk_val_r"),
      $"doc_id".as("doc_b"), $"simhash".as("sh_b"))
    l.join(r, $"blk" === $"blk_r" && $"blk_val" === $"blk_val_r" && $"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", $"sh_a", $"sh_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count($"sh_a".bitwiseXOR($"sh_b")).cast("long"))
      .filter($"hamming" <= maxDist)
      .select($"doc_a", $"doc_b", $"hamming")
  }

  // ---- n-gram Jaccard with prefix filtering ---------------------------

  /** Exact char-3gram Jaccard join at threshold t via prefix filtering.
    *
    * For |a∩b|/|a∪b| >= t, the overlap must be >= t/(1+t)·(|a|+|b|); if
    * the shingles of each doc are ordered by a GLOBAL order (rarest
    * first) and only the first |s| - ceil(t·|s|) + 1 are indexed, any
    * qualifying pair still collides on >= 1 indexed shingle — so the
    * inverted-index join below is EXACT, not approximate, while indexing
    * only ~(1-t) of each doc's shingles and avoiding the hottest (most
    * frequent) shingles ordering them last. */
  def ngramJaccardPairs(s: SparkSession, dir: String, threshold: Double = 0.35): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select($"doc_id", charNgrams($"text", 3).as("grams"))
    // global shingle frequencies → rarity order (freq asc, gram asc)
    val freq = docs.select(explode($"grams").as("gram"))
      .groupBy($"gram").agg(count(lit(1)).as("df"))
    val exploded = docs
      .select($"doc_id", size($"grams").cast("double").as("sz"), explode($"grams").as("gram"))
      .join(freq, "gram")
    // rank shingles per doc by global rarity; keep the prefix
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"df".asc, $"gram".asc)
    val prefix = exploded
      .withColumn("pos", row_number().over(w))
      .filter($"pos" <= ($"sz" - ceil($"sz" * threshold) + 1))
      .select($"gram", $"doc_id")
    // candidate pairs share >= 1 prefix shingle
    val cands = prefix.as("a")
      .join(prefix.as("b"), col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify with exact jaccard on the full shingle sets
    cands
      .join(docs.select($"doc_id".as("doc_a"), $"grams".as("g_a")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"grams".as("g_b")), "doc_b")
      .withColumn("jaccard", jaccard($"g_a", $"g_b"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
  }

  // ---- embedding near-dup ---------------------------------------------

  /** Cosine-threshold near-dup pairs over embeddings. Exact semantics:
    * label-blocked pair join (the coarse quantizer here is the given
    * label; Similarity.srpNearDupPairs is the unblocked LSH variant). */
  def embeddingNearDup(s: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    import graft.functions.VectorOps._
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))
    val l = e.select($"label", $"vec_id".as("vec_a"), $"v".as("v_a"))
    val r = e.select($"label".as("label_r"), $"vec_id".as("vec_b"), $"v".as("v_b"))
    l.join(r, $"label" === $"label_r" && $"vec_a" < $"vec_b")
      .withColumn("cos_sim", round(cosine($"v_a", $"v_b"), 4))
      .filter($"cos_sim" >= threshold)
      .select($"vec_a", $"vec_b", $"cos_sim")
  }
}
