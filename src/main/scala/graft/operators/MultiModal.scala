package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.syntax._

/** Multimodal-column operators: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct riding alongside.
  *
  * The container has no codec libraries, so the DECODE step is a
  * clearly-marked deterministic stub (see [[decodeStub]]); everything
  * around it — the schema (payload binary + metadata struct), the
  * per-modality routing, the partition-friendly aggregate shapes — is the
  * real 100 TB plumbing a production decode UDF would drop into.
  *
  * At scale the payload column lives in its own parquet column chunk:
  * metadata-only queries (mmMetaStats) never read payload bytes thanks to
  * column pruning, which is the whole point of the layout.
  */
object MultiModal {

  /** Deterministic modality assignment for the synthetic corpus. */
  private def mimeOf(docId: Column): Column =
    when(pmod(docId, lit(3)) === 0, "image/png")
      .when(pmod(docId, lit(3)) === 1, "audio/wav")
      .otherwise("video/mp4")

  /** Multimodal projection of `documents`: payload as opaque bytes plus a
    * typed metadata struct — the canonical storage layout. */
  def asMultimodal(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      $"doc_id",
      encode($"text", "UTF-8").as("payload"),
      struct(
        mimeOf($"doc_id").as("mime"),
        octet_length(encode($"text", "UTF-8")).cast("long").as("n_bytes"),
        (pmod($"doc_id", lit(5)) * 160 + 320).cast("long").as("width"),
        (pmod($"doc_id", lit(5)) * 90 + 180).cast("long").as("height")
      ).as("meta"))

  /** STUB decode seam. A production build replaces this with a real codec
    * call (mapInPandas / JNI); the contract — payload bytes in, fixed-width
    * feature vector out, deterministic, null-safe — is what the pipeline
    * depends on. The fake derives 4 doubles from payload length + md5 so
    * outputs are stable and oracle-checkable. */
  def decodeStub(payload: Column): Column = {
    val h = conv(substring(md5(payload), 1, 15), 16, 10).cast("long")
    array(
      octet_length(payload).cast("double"),
      (h % 256L).cast("double"),
      (shiftright(h, 8) % 256L).cast("double"),
      (shiftright(h, 16) % 256L).cast("double"))
  }

  /** Metadata-only stats per modality — must never touch payload bytes
    * (column pruning keeps the scan to the meta struct). */
  def mmMetaStats(s: SparkSession, dir: String): DataFrame =
    asMultimodal(s, dir)
      .select($"meta.mime".as("mime"), $"meta.n_bytes".as("n_bytes"),
        $"meta.width".as("width"), $"meta.height".as("height"))
      .groupBy($"mime")
      .agg(
        count(lit(1)).as("n_assets"),
        sum($"n_bytes").as("total_bytes"),
        round(avg($"width"), 2).as("avg_width"),
        round(avg($"height"), 2).as("avg_height"))

  /** Per-asset fingerprint + stub-decoded features (the decode path). */
  def mmFeatures(s: SparkSession, dir: String): DataFrame =
    asMultimodal(s, dir)
      .withColumn("features", decodeStub($"payload"))
      .select(
        $"doc_id",
        $"meta.mime".as("mime"),
        md5($"payload").as("payload_md5"),
        element_at($"features", 1).as("f_len"),
        round(element_at($"features", 2) + element_at($"features", 3) +
          element_at($"features", 4), 2).as("f_sig"))

  /** One multimodal asset row for the batched-decode path. */
  final case class MmAsset(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoded features for one asset. */
  final case class MmDecoded(doc_id: Long, mime: String, f_len: Double, f_sig: Double)

  /** The BATCHED decode path — the Scala analogue of a mapInPandas codec
    * stage: per-partition iteration so a real codec can amortize model /
    * library initialization per partition (not per row), with a typed
    * row contract on both sides. `codec` is injectable; the default is
    * the deterministic stub ([[decodeStub]] semantics, same outputs as
    * the expression path — asserted in tests). A production build passes
    * a JNI/FFI codec here and NOTHING else changes: schema, partitioning
    * and batch shape are already what a 1000-executor job needs. */
  def decodeBatched(s: SparkSession, dir: String,
                    codec: Iterator[MmAsset] => Iterator[MmDecoded] = stubCodec)
  : org.apache.spark.sql.Dataset[MmDecoded] = {
    import s.implicits.{newProductEncoder, newSequenceEncoder}
    asMultimodal(s, dir)
      .select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MmAsset]
      .mapPartitions(codec)
  }

  /** Default partition codec: deterministic md5-derived fake features
    * (bit-compatible with the decodeStub expression path). */
  def stubCodec(it: Iterator[MmAsset]): Iterator[MmDecoded] = {
    // per-partition init happens HERE in a real codec (load model, open
    // decoder); the stub's md5 instance stands in for that lifecycle
    val md = java.security.MessageDigest.getInstance("MD5")
    it.map { a =>
      md.reset()
      val hex = md.digest(a.payload).map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      MmDecoded(a.doc_id, a.mime,
        a.payload.length.toDouble,
        (h % 256L).toDouble + ((h >> 8) % 256L).toDouble + ((h >> 16) % 256L).toDouble)
    }
  }

  /** RESIZE (stub geometry + payload budget): fit the asset's declared
    * dimensions inside a `box`-pixel bounding box with integer
    * fit-within arithmetic (scale = ceil(longest/box); new dims =
    * floor(dim/scale)) and budget the payload proportionally
    * (bytes/scale², area-law). The pixel resample itself belongs to the
    * decode seam ([[decodeStub]]/[[stubCodec]]); what this operator
    * pins — and what survives a codec swap — is the deterministic
    * geometry, the byte budget, and a content probe over the retained
    * prefix. Pure per-row arithmetic: scan-speed, no shuffle at all. */
  def mmResize(s: SparkSession, dir: String, box: Long = 256L): DataFrame = {
    require(box > 0, s"bounding box must be positive, got $box")
    asMultimodal(s, dir)
      .select($"doc_id", $"meta.mime".as("mime"), $"payload",
        $"meta.width".as("w"), $"meta.height".as("h"),
        $"meta.n_bytes".as("n_bytes"))
      // integer ceil via (x + box - 1) / box: all values positive and
      // far below 2^52, so the double division truncates exactly
      .withColumn("scale",
        greatest(((greatest($"w", $"h") + box - 1) / lit(box)).cast("long"), lit(1L)))
      .withColumn("new_w", ($"w" / $"scale").cast("long"))
      .withColumn("new_h", ($"h" / $"scale").cast("long"))
      .withColumn("out_bytes",
        (($"n_bytes" + $"scale" * $"scale" - 1) / ($"scale" * $"scale")).cast("long"))
      .select($"doc_id", $"mime", $"w", $"h", $"scale", $"new_w", $"new_h",
        $"out_bytes",
        md5($"payload".substr(lit(1), $"out_bytes")).as("probe"))
  }

  /** EXACT PAYLOAD DEDUP — the multimodal twin of
    * [[graft.operators.Dedup.exact]]: identical binary payloads (same
    * bytes, regardless of filename/metadata) collapse to one survivor
    * per (mime, content-hash) group. This is the first pass of every
    * multimodal curation pipeline — a crawl re-serving the same image
    * under a thousand URLs dies here before any expensive decode runs.
    * One shuffle on the md5 fingerprint (computed scan-side, so the
    * payload bytes never ride the exchange — only the 32-char digest
    * does); grouping includes mime so a byte-coincidence across
    * modalities (impossible for real codecs, cheap to guard) never
    * merges assets of different types. */
  def mmPayloadDedup(s: SparkSession, dir: String): DataFrame =
    asMultimodal(s, dir)
      .select($"doc_id", $"meta.mime".as("mime"), md5($"payload").as("payload_md5"))
      .groupBy($"mime", $"payload_md5")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  /** Frame/sample selection: deterministic stride over byte offsets — the
    * shape of frame-sampling (video) or windowing (audio) without a codec:
    * one output row per sampled offset, partition-parallel per asset. */
  def mmFrameSample(s: SparkSession, dir: String, stride: Int = 64): DataFrame =
    asMultimodal(s, dir)
      .select($"doc_id", $"meta.mime".as("mime"), $"payload",
        $"meta.n_bytes".as("n_bytes"))
      // zero-length payload: sequence(0, -1, +stride) is illegal in Spark
      // while the oracle's range(0, 0, stride) just emits nothing — guard
      // to an empty array so both engines emit no rows for empty assets
      .withColumn("frame_off", explode(
        when($"n_bytes" > 0, sequence(lit(0L), $"n_bytes" - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<long>"))))
      .select(
        $"doc_id", $"mime", $"frame_off",
        // content probe of the sampled window (binary slice; md5 of the
        // bytes — the corpus is ASCII so the oracle can mirror on text)
        md5($"payload".substr($"frame_off" + 1, lit(32))).as("frame_probe"))

  /** PERCEPTUAL-HASH NEAR-DUP PAIRS — near-duplicate assets WITHIN each
    * modality by Hamming distance over a 48-bit content fingerprint:
    * the multimodal completion of the dedup family ([[mmPayloadDedup]]
    * catches bit-identical copies; this catches the re-encoded /
    * slightly-edited copies a byte hash misses — the dominant duplicate
    * class in crawled image/video corpora).
    *
    * The fingerprint here is a SimHash over the stub-decoded payload's
    * content 4-grams ([[decodeStub]] discipline: a production build
    * swaps in a DCT aHash / chromaprint per modality behind the same
    * (asset → 48-bit code) contract; everything downstream — banding,
    * verification, per-mime scoping — is the real plumbing and is what
    * this operator tests). Candidate generation is the
    * [[Dedup.simhashPairs]] 6-byte pigeonhole: any pair within distance
    * ≤ 5 agrees on ≥ 1 whole byte, so bucket-join on (mime, byte_idx,
    * byte_value) — the mime key scopes buckets per modality (a
    * cross-modality "near-dup" is meaningless and would only widen
    * buckets) — with leftmost-shared-block dedup making candidates
    * unique by construction, then one exact bit_count verify. Never
    * all-pairs; the exchange carries one row per (asset, byte-block).
    */
  /** SHOT-BOUNDARY DETECTION — per video asset, cut candidates by
    * consecutive-frame feature difference (the histogram-difference
    * method of Zhang, Kankanhalli & Smoliar, Multimedia Systems 1(1),
    * 1993): sample frames at the [[mmFrameSample]] stride, derive a
    * per-frame scalar feature, flag a cut wherever |f_t − f_{t−1}|
    * clears the threshold, and report per-asset cut statistics — the
    * scene-granularity signal a video curation pipeline reads to split
    * assets into clips before captioning/embedding.
    *
    * The per-frame feature is the [[decodeStub]] discipline (md5 of the
    * sampled window reduced mod 256 — a fake luminance histogram; a
    * production build swaps a real histogram/embedding behind the same
    * (window → scalar) contract). What this operator pins is the REAL
    * plumbing: per-asset ordered frame windows (ONE exchange on doc_id
    * — the window partition key IS the group key, so the aggregate
    * rides the same exchange), a lag-1 difference, a threshold knob,
    * and bounded per-asset output. A single-frame asset reports null
    * mean/max delta (no consecutive pair exists) — both engines agree.
    * At 100 TB: frames fan out stride-bounded per asset, nothing ever
    * leaves the asset's partition. */
  def mmShotBoundaries(s: SparkSession, dir: String, stride: Int = 64,
                       threshold: Long = 85L): DataFrame = {
    require(stride >= 1 && threshold >= 0, "need stride >= 1, threshold >= 0")
    import org.apache.spark.sql.expressions.Window
    val frames = asMultimodal(s, dir)
      .filter($"meta.mime" === "video/mp4")
      .select($"doc_id", $"payload", $"meta.n_bytes".as("n_bytes"))
      .withColumn("frame_off", explode(
        when($"n_bytes" > 0, sequence(lit(0L), $"n_bytes" - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<long>"))))
      .select($"doc_id", $"frame_off",
        (conv(substring(md5($"payload".substr($"frame_off" + 1, lit(32))), 1, 15),
          16, 10).cast("long") % 256L).as("f"))
    val w = Window.partitionBy($"doc_id").orderBy($"frame_off".asc)
    frames.withColumn("delta", abs($"f" - lag($"f", 1).over(w)))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when($"delta" >= threshold, 1L).otherwise(0L)).as("n_cuts"),
        round(sum($"delta").cast("double") / count($"delta"), 6).as("mean_delta"),
        max($"delta").as("max_delta"))
  }

  def mmPhashPairs(s: SparkSession, dir: String, maxDist: Int = 5): DataFrame = {
    require(maxDist >= 0 && maxDist <= 5,
      s"pigeonhole banding over 6 byte-blocks is exact only for maxDist <= 5, got $maxDist")
    import graft.functions.EngineNeutral.{charNgrams, hash60}
    val sig = asMultimodal(s, dir)
      .select($"doc_id", $"meta.mime".as("mime"),
        decode($"payload", "UTF-8").as("content"))
      .select($"doc_id", $"mime",
        Dedup.simhashFromHashes(
          transform(charNgrams($"content", 4), g => hash60(g))).as("phash"))
    val blockStructs = (0 until 6).map { i =>
      struct(lit(i.toLong).as("blk"),
        shiftright($"phash", i * 8).bitwiseAND(255L).as("blk_val"))
    }
    val blocks = sig
      .select($"doc_id", $"mime", $"phash", explode(array(blockStructs: _*)).as("b"))
      .select($"doc_id", $"mime", $"phash",
        $"b.blk".as("blk"), $"b.blk_val".as("blk_val"))
    val l = blocks.select($"mime", $"blk", $"blk_val",
      $"doc_id".as("doc_a"), $"phash".as("ph_a"))
    val r = blocks.select($"mime".as("mime_r"), $"blk".as("blk_r"),
      $"blk_val".as("blk_val_r"), $"doc_id".as("doc_b"), $"phash".as("ph_b"))
    val noEarlierBlock = (0 until 5).map { e =>
      $"blk" <= e ||
        shiftright($"ph_a", e * 8).bitwiseAND(255L) =!=
          shiftright($"ph_b", e * 8).bitwiseAND(255L)
    }.reduce(_ && _)
    l.join(r, $"mime" === $"mime_r" && $"blk" === $"blk_r" &&
        $"blk_val" === $"blk_val_r" && $"doc_a" < $"doc_b" && noEarlierBlock)
      .withColumn("hamming", bit_count($"ph_a".bitwiseXOR($"ph_b")).cast("long"))
      .filter($"hamming" <= maxDist)
      .select($"mime", $"doc_a", $"doc_b", $"hamming")
  }

  /** PHASH DUPLICATE CLUSTERS — connected components over the banded
    * pHash Hamming pairs ([[mmPhashPairs]]), rolled up to the per-mime
    * duplicate-FAMILY histogram (mime, cluster_size, n_clusters,
    * n_assets). The multimodal twin of [[Dedup.clusterSizes]]: pairwise
    * Hamming ≤ maxDist is not transitive, so "how many near-identical
    * COPIES of each asset exist" is a component question, not a pair
    * question — a re-encoded image family chained A≈B≈C counts as ONE
    * family of 3 here, where the pair report shows 2-3 disconnected
    * rows. Per-mime by construction (pairs never cross mime, so
    * components can't either); the histogram is the artifact a
    * multimodal curation run reads to decide per-modality dedup policy.
    *
    * Shape: the pair join is the proven pigeonhole-banded one; CC is
    * [[Dedup.clustersFromPairs]] (frontier min-propagation, O(diameter)
    * checkpointed rounds, star-contraction fallback); the rollup is two
    * bounded aggregates. Nothing here scales worse than the pair set
    * itself. */
  def mmPhashClusters(s: SparkSession, dir: String, maxDist: Int = 5): DataFrame = {
    val assets = asMultimodal(s, dir)
      .select($"doc_id", $"meta.mime".as("mime")).localCheckpoint(true)
    val pairs = mmPhashPairs(s, dir, maxDist).select($"doc_a", $"doc_b")
    Dedup.clustersFromPairs(assets.select($"doc_id"), pairs)
      .join(assets, "doc_id")
      .groupBy($"cluster_id")
      .agg(min($"mime").as("mime"), count(lit(1)).as("sz"))
      .groupBy($"mime", $"sz")
      .agg(count(lit(1)).as("n_clusters"), sum($"sz").as("n_assets"))
      .select($"mime", $"sz".as("cluster_size"), $"n_clusters", $"n_assets")
  }
}
