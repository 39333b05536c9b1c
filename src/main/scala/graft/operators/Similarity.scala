package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.VectorOps._
import graft.syntax._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *  - bruteForceTopK: exact cosine top-k. The query set is broadcast and
  *    scoring streams over the corpus — one pass, no corpus shuffle. The
  *    ranking is TWO-PHASE so no single task ever ranks a whole query's
  *    corpus: a local top-k within (q_id, corpus-hash-bucket) first, then
  *    the final top-k over the <= nBuckets*k survivors per query.
  *  - ivfTopK: IVF-style scale path — corpus is pre-bucketed by a coarse
  *    quantizer (SRP signature); queries probe only matching buckets.
  *    Trades recall for a bucket-pruned scan, the standard ANN shape.
  *  - srpNearDupPairs: banded SRP LSH (bands x bitsPerBand, like the
  *    MinHash path) — bucket population stays bounded as the corpus
  *    grows by raising nBands/bitsPerBand, never a fixed 256 buckets.
  */
object Similarity {

  /** Two-phase top-k: rank within (q_id, bucket) partitions first — each
    * task sees ~1/nBuckets of one query's candidates — then rank the
    * per-bucket winners. At 1000 executors the first window's exchange
    * spreads each query over nBuckets tasks instead of one. */
  private def topKTwoPhase(scored: DataFrame, k: Int, nBuckets: Int): DataFrame = {
    val bucketed = scored.withColumn("bkt", pmod(hash($"vec_id"), lit(nBuckets)))
    val wLocal = Window.partitionBy($"q_id", $"bkt")
      .orderBy($"cos_sim".desc, $"vec_id".asc)
    val wFinal = Window.partitionBy($"q_id")
      .orderBy($"cos_sim".desc, $"vec_id".asc)
    bucketed
      .withColumn("rn_local", row_number().over(wLocal))
      .filter($"rn_local" <= k)
      .withColumn("rn", row_number().over(wFinal))
      .filter($"rn" <= k)
      .select($"q_id", $"vec_id", $"cos_sim")
  }

  /** Exact brute-force cosine top-k for queries (vec_id < nQueries). */
  def bruteForceTopK(s: SparkSession, dir: String,
                     nQueries: Int = 5, k: Int = 10, nBuckets: Int = 32): DataFrame =
    bruteForceTopKFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k, nBuckets)

  /** Core of [[bruteForceTopK]] over any (vec_id, v) frame. */
  def bruteForceTopKFrom(e: DataFrame, nQueries: Int, k: Int,
                         nBuckets: Int = 32): DataFrame = {
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"))
    val scored = e.join(broadcast(q), $"vec_id" =!= $"q_id")
      .withColumn("cos_sim", round(cosine($"q_v", $"v"), 4))
    topKTwoPhase(scored, k, nBuckets)
  }

  /** Exact brute-force cosine top-k via the BOUNDED-HEAP AGGREGATE
    * ([[graft.functions.TopKAgg]]) instead of window ranking: one
    * partial+final ObjectHashAggregate, map-side combined — the exchange
    * carries k rows per (query, partition), NOT the full scored corpus.
    * This is the plan the window two-phase trick approximates; at 1000
    * executors it is strictly less shuffle for the same (deterministic,
    * oracle-identical) result. */
  def bruteForceTopKAgg(s: SparkSession, dir: String,
                        nQueries: Int = 5, k: Int = 10): DataFrame =
    bruteForceTopKAggFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k)

  /** Core of [[bruteForceTopKAgg]] over any (vec_id, v) frame. */
  def bruteForceTopKAggFrom(e: DataFrame, nQueries: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"))
    val scored = e.join(broadcast(q), $"vec_id" =!= $"q_id")
      .withColumn("cos_sim", round(cosine($"q_v", $"v"), 4))
    val topk = Bridge.column(
      graft.functions.TopKAgg(
        Bridge.expression($"cos_sim"),
        Bridge.expression($"vec_id"), k).toAggregateExpression())
    scored.groupBy($"q_id")
      .agg(topk.as("tk"))
      .select($"q_id", explode($"tk").as("t"))
      .select($"q_id", $"t.vec_id".as("vec_id"), $"t.cos_sim".as("cos_sim"))
  }

  /** K-NN GRAPH — every vector's exact top-k cosine neighbors, the
    * backbone structure of semantic-dedup clustering, diversity
    * sampling and graph-based ANN indexes (the exact counterpart of an
    * NN-Descent/HNSW build). All-pairs work is inherent to the exact
    * graph; what must NOT happen at 100 TB is a full-corpus broadcast
    * or a nested-loop join. Shape: BLOCK-GRID self-join — the neighbor
    * side is hash-bucketed into nBlocks, the source side is replicated
    * once per block (explode of a literal range), and the pair space is
    * covered exactly once by the `blk` EQUI-join; each join cell is
    * 1/nBlocks of the corpus, so per-task memory stays bounded as
    * nBlocks scales with the corpus. Per-source top-k is the bounded
    * heap [[graft.functions.TopKAgg]]: map-side combined, the exchange
    * carries k rows per (source, partition) — never the scored pair
    * space. Deterministic (score desc, id asc), so the DuckDB twin is a
    * plain window rank over the cross join. */
  def knnGraph(s: SparkSession, dir: String, k: Int = 5, nBlocks: Int = 8): DataFrame =
    knnGraphFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      k, nBlocks)

  /** Core of [[knnGraph]] over any (vec_id, v) frame. */
  def knnGraphFrom(e: DataFrame, k: Int, nBlocks: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    require(k >= 1 && nBlocks >= 1, s"need k >= 1 and nBlocks >= 1, got k=$k nBlocks=$nBlocks")
    val nbrs = e.select(pmod(hash($"vec_id"), lit(nBlocks)).as("blk"),
      $"vec_id".as("nbr_id"), $"v".as("nbr_v"))
    val srcs = e.select($"vec_id".as("src_id"), $"v".as("src_v"),
      explode(sequence(lit(0), lit(nBlocks - 1))).as("blk"))
    val scored = srcs.join(nbrs, Seq("blk"))
      .filter($"src_id" =!= $"nbr_id")
      .withColumn("cos_sim", round(cosine($"src_v", $"nbr_v"), 4))
    val topk = Bridge.column(
      graft.functions.TopKAgg(
        Bridge.expression($"cos_sim"),
        Bridge.expression($"nbr_id"), k).toAggregateExpression())
    scored.groupBy($"src_id")
      .agg(topk.as("tk"))
      .select($"src_id", explode($"tk").as("t"))
      .select($"src_id", $"t.vec_id".as("nbr_id"), $"t.cos_sim".as("cos_sim"))
  }

  /** All XOR masks of Hamming weight <= maxH over nBits — the multi-probe
    * expansion set. |masks| = sum_{h<=maxH} C(nBits, h). */
  private[operators] def probeMasks(nBits: Int, maxH: Int): Seq[Long] =
    (0 to maxH).flatMap(h =>
      (0 until nBits).combinations(h)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))).toSeq)

  /** IVF/LSH bucketed ANN: SRP coarse quantizer with MULTI-PROBE — each
    * query expands to its own bucket plus every Hamming<=probeHamming
    * neighbor bucket, which trades probe count for recall while KEEPING
    * the equi-join shape (the probe expansion happens on the tiny
    * broadcast query side; the corpus is bucketed once — at scale,
    * written bucketed/partitioned by `bucket`). Deterministic, so the
    * oracle mirrors it exactly. Probe/recall tradeoff at nBits=8:
    * H<=1 = 9 probes, H<=2 = 37 probes (measured recall in
    * DedupSimilaritySpec and docs/SCALING.md). */
  def ivfTopK(s: SparkSession, dir: String,
              nQueries: Int = 5, k: Int = 10, nBits: Int = 8,
              probeHamming: Int = 1): DataFrame =
    ivfTopKFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k, nBits, probeHamming)

  /** Core of [[ivfTopK]] over any (vec_id, v) frame. */
  def ivfTopKFrom(e0: DataFrame, nQueries: Int, k: Int, nBits: Int = 8,
                  probeHamming: Int = 1): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= nBits,
      s"probeHamming must be in [0, $nBits], got $probeHamming")
    val e = e0.withColumn("bucket", srpSignature($"v", nBits))
    val probes = probeMasks(nBits, probeHamming).map {
      case 0L => $"bucket"
      case m => $"bucket".bitwiseXOR(lit(m))
    }
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"),
        explode(array(probes: _*)).as("q_bucket"))
    val scored = e.join(broadcast(q), $"bucket" === $"q_bucket" && $"vec_id" =!= $"q_id")
      .withColumn("cos_sim", round(cosine($"q_v", $"v"), 4))
    topKTwoPhase(scored, k, nBuckets = 8)
  }

  /** IVF RANGE SEARCH — every corpus vector within cosine >= tau of each
    * query, restricted to the query's probed coarse buckets: the radius
    * companion of [[ivfTopK]] and the other first-class ANN query shape
    * (FAISS `range_search` next to `search`). Top-k answers "the best
    * k matches"; range answers "EVERYTHING this similar" — the recall
    * primitive of near-dup audits ("all docs ≥ τ of this template") and
    * threshold-calibrated retrieval, where k is unknowable in advance.
    *
    * Shape: identical to [[ivfTopK]] up to scoring — SRP coarse
    * quantizer, multi-probe bucket explode on the broadcast query side,
    * one corpus scan pruned to probed buckets by the equi-join — then a
    * plain tau filter instead of rank truncation. No exchange after the
    * scan at all (the top-k variant still pays its two-phase rank);
    * output is radius-volume-bound, the inherent cost of the query.
    * Same candidate semantics as [[ivfTopK]]: vectors outside probed
    * buckets are by-design unseen, and the oracle reproduces the exact
    * pruning. */
  def ivfRangeSearch(s: SparkSession, dir: String,
                     nQueries: Int = 5, tau: Double = 0.3, nBits: Int = 8,
                     probeHamming: Int = 1): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= nBits,
      s"probeHamming must be in [0, $nBits], got $probeHamming")
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("bucket", srpSignature($"v", nBits))
    val probes = probeMasks(nBits, probeHamming).map {
      case 0L => $"bucket"
      case m => $"bucket".bitwiseXOR(lit(m))
    }
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"),
        explode(array(probes: _*)).as("q_bucket"))
    e.join(broadcast(q), $"bucket" === $"q_bucket" && $"vec_id" =!= $"q_id")
      .withColumn("cos_sim", round(cosine($"q_v", $"v"), 4))
      .filter($"cos_sim" >= tau)
      .select($"q_id", $"vec_id", $"cos_sim")
  }

  /** APPENDABLE IVF INDEX — batch-incremental maintenance of the coarse
    * IVF layer, the [[graft.operators.Dedup.lshIndexAppend]] discipline
    * applied to the vector index: a real 100 TB corpus ingests daily,
    * and retraining the index per batch (what every `sim_ivf*` query
    * does inline, correctly, for a one-shot report) would be an
    * O(corpus) nightly rebuild. Here the index is a PERSISTED artifact:
    * per-bucket decimal-exact centroids trained on the STANDING corpus
    * only, and an arriving batch (the engine-neutral coin
    * hash60(vec_id) % batchMod == 0, a deterministic stand-in for the
    * ingestion-date predicate) is ASSIGNED to its nearest existing
    * centroid — FAISS `add()` semantics: new vectors never move the
    * codebook, never open a bucket, never touch standing rows.
    *
    * Output, one row per index bucket: standing membership, appended
    * count, growth ratio, and `cos_drift` — the cosine between the
    * standing centroid and the post-append recomputed mean, i.e. the
    * displacement a periodic retrain WOULD apply. That column is the
    * retrain trigger a production index watches (the [[centroidShift]]
    * convergence discipline pointed at ingestion drift); buckets
    * receiving no vectors report growth 0 and drift cos 1.
    *
    * Shape: standing×standing is NEVER joined — the index build is one
    * bounded posexplode aggregate over the standing rows, the
    * assignment is batch × broadcast-centroid-table (O(batch·buckets)
    * scored rows, argmax via the k=1 bounded heap with the (cos desc,
    * bucket asc) tie-break), and the merged means are one more bounded
    * aggregate. All arithmetic is the proven twin-exact discipline
    * (DECIMAL component sums, round-6 means, round-4 cosines). */
  def ivfAppend(s: SparkSession, dir: String, batchMod: Int = 8,
                nBits: Int = 8): DataFrame =
    ivfAppendFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      batchMod, nBits)

  /** The persisted coarse-index artifact over any (vec_id, v) frame:
    * per-bucket decimal-exact centroid vectors (bucket, cv, n_vecs)
    * under the SRP coarse quantizer — what [[ivfAppend]] trains on the
    * standing corpus and what the streaming ingestion router
    * ([[graft.streaming.Streams.ivfRouter]]) loads as its static model.
    * ≤2^nBits rows whatever the corpus size. */
  def ivfCentroidVecs(e: DataFrame, nBits: Int): DataFrame =
    bucketCentroidsFrom(e, nBits)
      .groupBy($"bucket")
      .agg(transform(array_sort(collect_list(struct($"pos", $"mean_comp"))),
        x => x.getField("mean_comp")).as("cv"),
        max($"n_vecs").as("n_vecs"))

  /** Nearest-existing-centroid assignment of `vecs` (vec_id, v) against
    * a centroid table (bucket, cv, …): rounded cosine, argmax via the
    * k=1 bounded heap with the (cos desc, bucket asc) tie-break — FAISS
    * `add()`'s routing. Shared by [[ivfAppend]]'s batch path and
    * asserted bit-identical to the streaming router's
    * [[graft.functions.NearestCentroidExpr]] kernel in StreamingSpec.
    * Output: (vec_id, bucket, cos_sim). */
  def assignToCentroids(vecs: DataFrame, cv: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val top1 = Bridge.column(
      graft.functions.TopKAgg(
        Bridge.expression($"cos_sim"), Bridge.expression($"bucket"), 1)
        .toAggregateExpression())
    vecs.join(broadcast(cv.select($"bucket", $"cv")))
      .withColumn("cos_sim", round(cosine($"v", $"cv"), 4))
      .groupBy($"vec_id").agg(top1.as("tk"))
      .select($"vec_id", explode($"tk").as("t"))
      .select($"vec_id", $"t.vec_id".as("bucket"), $"t.cos_sim".as("cos_sim"))
  }

  /** Core of [[ivfAppend]] over any (vec_id, v) frame. */
  def ivfAppendFrom(e0: DataFrame, batchMod: Int, nBits: Int): DataFrame = {
    require(batchMod >= 2, s"batchMod must be >= 2, got $batchMod")
    val isNew = graft.functions.EngineNeutral.hash60(
      $"vec_id".cast("string")) % batchMod === 0
    val e = e0.localCheckpoint(true)
    val standing = e.filter(!isNew)
    val fresh = e.filter(isNew)
    // the persisted index artifact: decimal-exact per-bucket means of
    // the standing corpus under the SRP coarse quantizer
    val cv0 = ivfCentroidVecs(standing, nBits)
      .withColumnRenamed("n_vecs", "n_standing")
    // append assignment: nearest EXISTING centroid — never a retrain
    val assigned = assignToCentroids(fresh, cv0)
      .select($"vec_id", $"bucket")
    // post-append member set: standing rows keep their signature route,
    // batch rows enter by assignment; the recomputed mean prices what a
    // retrain would move
    val members = standing
      .select(srpSignature($"v", nBits).cast("long").as("bucket"), $"v")
      .unionAll(fresh.join(assigned, "vec_id").select($"bucket", $"v"))
    val cv1 = members
      .select($"bucket", posexplode($"v").as(Seq("pos", "comp")))
      .groupBy($"bucket", $"pos")
      .agg(sum($"comp".cast("decimal(27,10)")).as("s2"), count(lit(1)).as("n2"))
      .select($"bucket", $"pos",
        round($"s2".cast("double") / $"n2", 6).as("mc1"))
      .groupBy($"bucket")
      .agg(transform(array_sort(collect_list(struct($"pos", $"mc1"))),
        x => x.getField("mc1")).as("cv1"))
    val appended = assigned.groupBy($"bucket").agg(count(lit(1)).as("n_appended"))
    cv0.join(appended, Seq("bucket"), "left")
      .join(cv1, "bucket")
      .select($"bucket", $"n_standing",
        coalesce($"n_appended", lit(0L)).as("n_appended"),
        round(coalesce($"n_appended", lit(0L)).cast("double") / $"n_standing", 6)
          .as("growth"),
        round(cosine($"cv", $"cv1"), 4).as("cos_drift"))
  }

  /** APPEND RECALL DRIFT — the retrieval price of serving the STALE
    * appended index ([[ivfAppend]]'s post-append state: standing
    * centroids, batch vectors routed to their nearest existing bucket)
    * measured against a FULL RETRAIN (centroids recomputed over the
    * whole corpus, every vector re-routed), both probed with the same
    * nearest-centroid top-`nProbe` discipline and both scored for
    * recall@k against the exact brute-force top-k. THE go/no-go number
    * of incremental index maintenance: appending is free until this
    * report says the stale geometry is costing recall — then a retrain
    * is scheduled, priced, and this same query verifies it paid off.
    *
    * Shape: the exact baseline is the [[bruteForceTopKAggFrom]]
    * bounded-heap pass, run once; each variant is one corpus scan
    * pruned to probed buckets by a broadcast (q_id, bucket) equi-join
    * (candidate volume reported as `scan_frac` — the recall is
    * meaningless without its cost). Output: 2 rows. */
  def ivfAppendRecall(s: SparkSession, dir: String, batchMod: Int = 8,
                      nBits: Int = 8, nQueries: Int = 5, k: Int = 10,
                      nProbe: Int = 2): DataFrame =
    ivfAppendRecallFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      batchMod, nBits, nQueries, k, nProbe)

  /** Core of [[ivfAppendRecall]] over any (vec_id, v) frame. */
  def ivfAppendRecallFrom(e0: DataFrame, batchMod: Int, nBits: Int,
                          nQueries: Int, k: Int, nProbe: Int): DataFrame = {
    require(batchMod >= 2, s"batchMod must be >= 2, got $batchMod")
    require(nQueries >= 1 && k >= 1 && nProbe >= 1,
      s"need nQueries >= 1, k >= 1, nProbe >= 1")
    import org.apache.spark.sql.graftbridge.Bridge
    val isNew = graft.functions.EngineNeutral.hash60(
      $"vec_id".cast("string")) % batchMod === 0
    val e = e0.localCheckpoint(true)
    val standing = e.filter(!isNew)
    val fresh = e.filter(isNew)
    def cvOf(src: DataFrame): DataFrame = bucketCentroidsFrom(src, nBits)
      .groupBy($"bucket")
      .agg(transform(array_sort(collect_list(struct($"pos", $"mean_comp"))),
        x => x.getField("mean_comp")).as("cv"))
    def topBuckets(vecs: DataFrame, cents: DataFrame, p: Int): DataFrame = {
      val topP = Bridge.column(
        graft.functions.TopKAgg(
          Bridge.expression($"cos_sim"), Bridge.expression($"bucket"), p)
          .toAggregateExpression())
      vecs.join(broadcast(cents))
        .withColumn("cos_sim", round(cosine($"v", $"cv"), 4))
        .groupBy($"vec_id").agg(topP.as("tk"))
        .select($"vec_id", explode($"tk").as("t"))
        .select($"vec_id", $"t.vec_id".as("bucket"))
    }
    val cvStale = cvOf(standing)
    val cvRetrained = cvOf(e)
    // post-append routing (the ivfAppend state) vs full-rebuild routing
    val memStale = standing
      .select(srpSignature($"v", nBits).cast("long").as("bucket"), $"vec_id", $"v")
      .unionAll(fresh.join(topBuckets(fresh, cvStale, 1), "vec_id")
        .select($"bucket", $"vec_id", $"v"))
    val memRetrained = e
      .select(srpSignature($"v", nBits).cast("long").as("bucket"), $"vec_id", $"v")
    val exact = bruteForceTopKAggFrom(e, nQueries, k)
      .select($"q_id", $"vec_id").localCheckpoint(true)
    val nCorpus = e.groupBy().agg(count(lit(1)).as("n_corpus"))
    def variantRow(name: String, cents: DataFrame, mems: DataFrame): DataFrame = {
      val qs = e.filter($"vec_id" < nQueries)
        .select($"vec_id".as("q_id"), $"v".as("q_v"))
      val probes = topBuckets(
        qs.select($"q_id".as("vec_id"), $"q_v".as("v")), cents, nProbe)
        .select($"vec_id".as("q_id"), $"bucket")
      val cand = mems.join(broadcast(probes), "bucket")
        .filter($"vec_id" =!= $"q_id")
        .join(broadcast(qs), "q_id")
        .withColumn("cos_sim", round(cosine($"q_v", $"v"), 4))
        .select($"q_id", $"vec_id", $"cos_sim")
        .localCheckpoint(true)
      val nCand = cand.groupBy().agg(count(lit(1)).as("n_candidates"))
      val top = topKTwoPhase(cand, k, nBuckets = 8)
        .select($"q_id".as("aq"), $"vec_id".as("av"))
      exact
        .join(top, $"q_id" === $"aq" && $"vec_id" === $"av", "left")
        .groupBy()
        .agg(count(lit(1)).as("n_exact"), count($"av").as("n_overlap"))
        .crossJoin(nCand).crossJoin(nCorpus)
        .select(lit(name).as("variant"),
          round($"n_overlap".cast("double") / $"n_exact", 6).as("recall_at_k"),
          $"n_candidates",
          round($"n_candidates".cast("double")
            / (lit(nQueries.toDouble) * ($"n_corpus" - 1).cast("double")), 6)
            .as("scan_frac"))
    }
    variantRow("stale_append", cvStale, memStale)
      .unionAll(variantRow("retrained", cvRetrained, memRetrained))
  }

  /** APPENDABLE PQ CODEBOOK — the [[ivfAppend]] discipline applied to
    * the FINE quantizer: the persisted artifact here is the trained PQ
    * codebook (one Lloyd refinement over the STANDING corpus, the
    * [[pqLloydCodebooks]] trainer), and an arriving batch is ENCODED
    * against it — FAISS `add()` on the code table: new vectors take the
    * nearest EXISTING entry per subspace, the codebook never moves,
    * standing codes are never re-derived. The report prices exactly what
    * that staleness costs: per subspace, the batch's reconstruction MSE
    * under the stale codebook vs under a full retrain (codebook
    * re-trained over standing+batch), `mse_excess` being the quantization
    * error the deployment accepts per appended vector by NOT retraining —
    * the fine-quantizer retrain trigger, the codebook-drift companion to
    * [[ivfAppend]]'s coarse `cos_drift` and [[pqReconError]]'s
    * whole-corpus MSE. `top_code_share` (largest fraction of the batch
    * landing in one code cell) flags distribution shift the MSE can't:
    * a drifted batch collapses into few cells long before its error
    * rises.
    *
    * Shape: standing×standing is never joined — both codebooks are
    * bounded aggregates over one decomposed scan each (≤128 rows, the
    * proven DECIMAL-mean discipline); both batch encodes are
    * batch × broadcast-codebook with the k=1 bounded-heap argmin
    * ([[nearestCodeIn]] — d², rounded 6, ties to the smaller code, and
    * the winning d² IS the per-subvector reconstruction SSE, so the MSE
    * aggregate needs no second scoring pass); the report is one bounded
    * groupBy per variant. Output: m = 8 rows. */
  def pqAppend(s: SparkSession, dir: String, batchMod: Int = 8): DataFrame =
    pqAppendFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")), batchMod)

  /** Core of [[pqAppend]] over any (vec_id, v) frame. */
  def pqAppendFrom(e0: DataFrame, batchMod: Int): DataFrame = {
    require(batchMod >= 2, s"batchMod must be >= 2, got $batchMod")
    val isNew = graft.functions.EngineNeutral.hash60(
      $"vec_id".cast("string")) % batchMod === 0
    val e = e0.localCheckpoint(true)
    val standing = e.filter(!isNew)
    val fresh = e.filter(isNew)
    // the persisted artifact: the standing-trained Lloyd codebook; the
    // comparator: the same trainer over standing+batch (what a retrain
    // would ship). Both ≤128 rows.
    val cbvStale = cbVecsOf(pqLloydCodebooksFrom(standing))
    val cbvRetrained = pqLloydCodebookVecs(e)
    // batch encode against each codebook: nearest existing entry per
    // subspace; the argmin's d2 is the reconstruction SSE of that choice
    val decFresh = pqDecomposed(fresh).select($"vec_id", $"sub", $"sv")
      .localCheckpoint(true)
    val staleAsg = nearestCodeIn(decFresh, cbvStale)
    val retrAsg = nearestCodeIn(decFresh, cbvRetrained)
    val nEntries = cbvStale.groupBy($"sub")
      .agg(count(lit(1)).as("n_entries"))
    val staleAgg = staleAsg.groupBy($"sub").agg(
      count(lit(1)).as("n_appended"),
      sum($"d2".cast("decimal(27,10)")).as("sse_stale"))
    val retrAgg = retrAsg.groupBy($"sub")
      .agg(sum($"d2".cast("decimal(27,10)")).as("sse_retr"))
    val conc = staleAsg.groupBy($"sub", $"code")
      .agg(count(lit(1)).as("nc"))
      .groupBy($"sub").agg(max($"nc").as("max_code"), sum($"nc").as("n_tot"))
    nEntries.join(staleAgg, "sub").join(retrAgg, "sub").join(conc, "sub")
      .select($"sub", $"n_entries", $"n_appended",
        round($"sse_stale".cast("double") / $"n_appended", 6).as("mse_stale"),
        round($"sse_retr".cast("double") / $"n_appended", 6).as("mse_retrained"),
        round(($"sse_stale" - $"sse_retr").cast("double") / $"n_appended", 6)
          .as("mse_excess"),
        round($"max_code".cast("double") / $"n_tot", 6).as("top_code_share"))
  }

  /** INDEX-ARTIFACT PERSISTENCE — the missing half of the appendable-
    * index story: [[ivfAppend]]/[[pqAppend]] and the streaming routers
    * treat the standing centroids/codebook as "the persisted artifact",
    * and these four functions make that literal. The artifacts are
    * BOUNDED tables (≤2^nBits centroid rows, ≤m·2^bits codebook rows)
    * whatever the corpus size, so persistence is one tiny single-file
    * parquet each — written once per (re)train, loaded by every batch
    * append and every router restart. Parquet stores BIGINT/DOUBLE/
    * DOUBLE[] columns bit-exactly (IEEE bits, no re-rounding), so a
    * serve from the loaded artifact is BIT-IDENTICAL to a serve from
    * the in-plan build — [[indexRoundtrip]] is the registered,
    * oracle-checked proof. */
  def writeIvfIndex(cv: DataFrame, path: String): Unit = {
    val cols = cv.columns.toSet
    require(Set("bucket", "cv").subsetOf(cols),
      s"ivf index artifact needs (bucket, cv[, n_vecs]) columns, got $cols")
    cv.select(($"bucket" +: $"cv" +:
      (if (cols("n_vecs")) Seq($"n_vecs") else Nil)): _*)
      // ≤2^nBits rows: one file, not one per shuffle partition
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load the coarse-index artifact [[writeIvfIndex]] persisted. A
    * 0-row artifact is a valid "no index trained yet" state (the
    * routers degrade to null routing on it); a MISSING path is a
    * deployment error and fails loudly with the parquet read error. */
  def loadIvfIndex(s: SparkSession, path: String): DataFrame = {
    val df = s.read.parquet(path)
    val cols = df.columns.toSet
    require(Set("bucket", "cv").subsetOf(cols),
      s"not an ivf index artifact at $path: columns $cols")
    df.select($"bucket".cast("long").as("bucket"),
      $"cv".cast("array<double>").as("cv"))
  }

  def writePqCodebook(cbv: DataFrame, path: String): Unit = {
    val cols = cbv.columns.toSet
    require(Set("sub", "code", "cv").subsetOf(cols),
      s"pq codebook artifact needs (sub, code, cv) columns, got $cols")
    cbv.select($"sub", $"code", $"cv")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load the fine-quantizer artifact [[writePqCodebook]] persisted —
    * same empty-vs-missing contract as [[loadIvfIndex]]. */
  def loadPqCodebook(s: SparkSession, path: String): DataFrame = {
    val df = s.read.parquet(path)
    val cols = df.columns.toSet
    require(Set("sub", "code", "cv").subsetOf(cols),
      s"not a pq codebook artifact at $path: columns $cols")
    df.select($"sub".cast("long").as("sub"), $"code".cast("long").as("code"),
      $"cv".cast("array<double>").as("cv"))
  }

  /** Scratch root for [[indexRoundtrip]]'s artifacts: one directory per
    * corpus dir (md5-tagged so base and scaled legs never collide),
    * under java.io.tmpdir — the artifacts are KB-sized whatever the
    * corpus. */
  private def indexScratch(dir: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    new java.io.File(new java.io.File(
      sys.props("java.io.tmpdir"), "graft-index"),
      new java.io.File(dir).getName + "-" + tag).getPath
  }

  /** INDEX PERSISTENCE ROUND-TRIP — the write→load→serve path of the
    * appendable index family, registered and oracle-checked: train the
    * standing coarse centroids ([[ivfCentroidVecs]]) and the standing
    * PQ codebook ([[pqCodebookTable]]), PERSIST both to parquet, load
    * them back, and serve the arriving batch ([[ivfAppend]]'s coin
    * split) entirely from the LOADED artifacts — coarse bucket via
    * [[assignToCentroids]], fine codes via [[pqEncode]]. Output: one
    * row per (batch vector, subspace) — (vec_id, bucket, cos_sim, sub,
    * code, d2), the complete index-ready stored row a 100 TB ingestion
    * pipeline writes per arriving vector. The DuckDB twin re-derives
    * the serve from the raw corpus with no write/load step at all, so
    * a hash match IS the load-equivalence proof: parquet round-tripped
    * artifacts serve bit-identically to the in-plan build
    * (RoundtripSpec additionally pins artifact-table equality and the
    * in-plan-vs-loaded serve equality frame by frame).
    *
    * Shape: both trainers are the proven bounded aggregates; the two
    * artifact writes move ≤(2^nBits + m·2^bits) rows through one file
    * each; the serve is batch × broadcast-artifact with the k=1
    * bounded heap — standing×standing is never joined, nothing here
    * outgrows the corpus scan at any scale. */
  def indexRoundtrip(s: SparkSession, dir: String, batchMod: Int = 8,
                     nBits: Int = 8): DataFrame = {
    require(batchMod >= 2, s"batchMod must be >= 2, got $batchMod")
    val isNew = graft.functions.EngineNeutral.hash60(
      $"vec_id".cast("string")) % batchMod === 0
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .localCheckpoint(true)
    val standing = e.filter(!isNew)
    val fresh = e.filter(isNew)
    val root = indexScratch(dir)
    writeIvfIndex(ivfCentroidVecs(standing, nBits), s"$root/ivf")
    writePqCodebook(pqCodebookTable(standing), s"$root/pq")
    val cv = loadIvfIndex(s, s"$root/ivf")
    val cbv = loadPqCodebook(s, s"$root/pq")
    assignToCentroids(fresh, cv)
      .join(pqEncode(fresh, cbv), "vec_id")
      .select($"vec_id", $"bucket", $"cos_sim", $"sub", $"code", $"d2")
  }

  /** MMR DIVERSIFIED RE-RANK — greedy Maximal Marginal Relevance
    * (Carbonell & Goldstein, SIGIR'98) over each query's exact top-m
    * shortlist: pick k results maximizing
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s), λ = 0.7 — relevance
    * traded against redundancy with what's already picked. THE
    * diversified-sampling primitive of a training-data pipeline:
    * "the k most relevant examples" out of a near-dup-riddled corpus is
    * k copies of one document; this is "the k most relevant DISTINCT
    * ones". λ and 1−λ are written as the literals 0.7 / 0.3 in both
    * engines (1.0−0.7 is a different double than 0.3).
    *
    * Shape: the corpus-scale work is exactly the [[bruteForceTopKAgg]]
    * shortlist pass (bounded-heap aggregate, map-side combined); MMR
    * itself then runs on m rows per query — the m×m within-shortlist
    * sim matrix and k greedy steps are deliberately shortlist-local
    * (the CLASSIC MMR contract: diversity against the retrieved set,
    * never the corpus), so every post-shortlist frame is O(nQ·m²)
    * however large the corpus. Each step: anti-join away the selected,
    * left-join the max-sim penalty from the pair matrix, one window
    * rank under the total order (mmr desc, vec_id) — iterates
    * checkpointed ([[graft.operators.Graph.kCore]] discipline). All
    * scores derive from round-4 cosines with one multiply/subtract
    * rounded to 6 — engine-identical; the twin unrolls the same k
    * steps. */
  def mmrRerank(s: SparkSession, dir: String,
                nQueries: Int = 5, m: Int = 20, k: Int = 5): DataFrame = {
    require(k >= 1 && m >= k, s"need 1 <= k <= m, got k=$k m=$m")
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val short = bruteForceTopKAggFrom(e, nQueries, m)
      .select($"q_id", $"vec_id", $"cos_sim".as("rel"))
      .localCheckpoint(true)
    val sv = short.join(e, "vec_id").select($"q_id", $"vec_id", $"v")
    val pairSims = sv.as("x")
      .join(sv.as("y"), col("x.q_id") === col("y.q_id") &&
        col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.q_id").as("q_id"), col("x.vec_id").as("d"),
        col("y.vec_id").as("s"), round(cosine(col("x.v"), col("y.v")), 4).as("sim"))
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"mmr".desc, $"vec_id".asc)
    var selected: DataFrame = null
    for (step <- 1 to k) {
      val scored =
        if (selected == null) short.withColumn("pen", lit(0.0))
        else {
          val rem = short.join(selected.select($"q_id", $"vec_id"),
            Seq("q_id", "vec_id"), "left_anti")
          val pens = pairSims
            .join(selected.select($"q_id", $"vec_id".as("s")), Seq("q_id", "s"))
            .groupBy($"q_id", $"d").agg(max($"sim").as("pen"))
          rem.join(pens, rem("q_id") === pens("q_id") && rem("vec_id") === pens("d"), "left")
            .select(rem("q_id"), $"vec_id", $"rel", coalesce($"pen", lit(0.0)).as("pen"))
        }
      val pick = scored
        .withColumn("mmr", round(lit(0.7) * $"rel" - lit(0.3) * $"pen", 6))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"q_id", $"vec_id", $"rel", $"mmr", lit(step.toLong).as("step"))
      selected =
        (if (selected == null) pick else selected.unionAll(pick))
          .localCheckpoint(true)
    }
    selected.select($"q_id", $"step", $"vec_id", $"rel", $"mmr".as("mmr_score"))
  }

  /** BUCKET CENTROIDS — the mean vector of every coarse-quantizer
    * bucket: the IVF index-build / k-means-assignment-step primitive (a
    * Lloyd iteration is exactly this aggregate against the previous
    * centroids; here the partition is the deterministic SRP quantizer
    * [[ivfTopK]] probes). Shape: posexplode to (bucket, pos, comp) —
    * dimensionality is a constant (64), so the explode is a bounded
    * fan-out scan — then ONE partial-aggregated sum/count per
    * (bucket, pos) and a bounded reassembly per bucket. The component
    * sum runs in DECIMAL(27,10): decimal addition is EXACT and
    * order-independent, so the result is identical under any partial-agg
    * schedule / partitioning / engine — a double sum would hash-diverge
    * from the oracle in the last bits depending on add order. The mean
    * is divided and rounded once, in double, identically on both sides.
    * Output is the EXPLODED centroid (bucket, pos, mean_comp, n_vecs) —
    * one row per component, the layout a downstream assignment join
    * consumes without array columns in the exchange. */
  def bucketCentroids(s: SparkSession, dir: String, nBits: Int = 8): DataFrame =
    bucketCentroidsFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nBits)

  /** Core of [[bucketCentroids]] over any (vec_id, v) frame. */
  def bucketCentroidsFrom(e: DataFrame, nBits: Int): DataFrame =
    e.select(srpSignature($"v", nBits).cast("long").as("bucket"),
        posexplode($"v").as(Seq("pos", "comp")))
      .groupBy($"bucket", $"pos")
      .agg(sum($"comp".cast("decimal(27,10)")).as("s"), count(lit(1)).as("n_vecs"))
      .select($"bucket", $"pos".cast("long").as("pos"),
        round($"s".cast("double") / $"n_vecs", 6).as("mean_comp"), $"n_vecs")

  /** PER-DIMENSION EMBEDDING STATS — mean, population variance and range
    * of every embedding dimension: the embedding-health audit a vector
    * pipeline runs before trusting its geometry. Dead dimensions
    * (variance ~0) waste index bits and silently break cosine
    * discrimination; grossly unbalanced variances are the signal that
    * PQ subspaces need the [[pqBalanced]] treatment or the corpus needs
    * whitening — this report is where both decisions start.
    *
    * Shape: one bounded posexplode (dim is a constant) and ONE
    * partial-agged shuffle on pos — 64 output rows whatever the corpus.
    * Σx and Σx² run in DECIMAL(27,10) (the [[bucketCentroids]]
    * discipline: decimal addition is exact and order-independent);
    * mean and E[x²] divide once in double, variance = E[x²] − mean² is
    * then the same IEEE expression on identical doubles in both
    * engines. min/max are order-independent by nature. */
  def dimStats(s: SparkSession, dir: String): DataFrame =
    dimStatsFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")))

  /** Core of [[dimStats]] over any (vec_id, v) frame. */
  def dimStatsFrom(e: DataFrame): DataFrame = {
    val m = $"s1".cast("double") / $"n_vecs"
    val me2 = $"s2".cast("double") / $"n_vecs"
    e.select(posexplode($"v").as(Seq("pos", "comp")))
      .groupBy($"pos")
      .agg(
        count(lit(1)).as("n_vecs"),
        sum($"comp".cast("decimal(27,10)")).as("s1"),
        sum(($"comp" * $"comp").cast("decimal(27,10)")).as("s2"),
        min($"comp").as("min_comp"),
        max($"comp").as("max_comp"))
      .select($"pos".cast("long").as("pos"), $"n_vecs",
        round(m, 6).as("mean"),
        round(me2 - m * m, 6).as("variance"),
        round($"min_comp", 6).as("min_comp"),
        round($"max_comp", 6).as("max_comp"))
  }

  /** PCA TOP COMPONENT (power iteration) — the leading eigenvector and
    * eigenvalue of the embedding covariance matrix, by 6 unrolled power
    * iterations: the dimensionality-reduction / whitening primitive
    * ([[dimStats]] reads the diagonal; this reads the geometry). The
    * loading vector is what a pipeline projects onto before coarse
    * clustering, and leading-eigenvalue drift between ingestion runs is
    * an embedding-model-change alarm.
    *
    * Scale shape: covariance is trained on a DETERMINISTIC 1-in-4
    * systematic sample (vec_id % 4 — the train-on-sample pattern every
    * production PCA uses; the sample is the scan, the model is 64²
    * rows). One sampled scan explodes d² = 4096 centered products per
    * vector into a partial-agged (i, j) aggregate — DECIMAL sums of
    * round-10 terms, so partial-agg order never moves a covariance.
    * Each iteration is a 4096-row matvec join + 64-row normalize —
    * driver-light, all relational. Iterates round to 8
    * ([[graft.operators.Graph.pageRank]] discipline), so both engines
    * iterate on identical doubles; the eigenvalue estimate is the final
    * iteration's pre-normalization norm (the standard power-method
    * Rayleigh proxy). Start vector is exactly 0.125·1 (1/√64 — exact in
    * binary). Output: 64 rows (pos, loading, eigenvalue). */
  def pcaPower(s: SparkSession, dir: String, iters: Int = 6): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1, 8], got $iters")
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .filter($"vec_id" % 4 === 0)
    val x = e.select($"vec_id", posexplode($"v").as(Seq("pos", "comp")))
    val mu = x.groupBy($"pos")
      .agg(round(sum($"comp".cast("decimal(27,10)")).cast("double") /
        count(lit(1)), 6).as("mu"))
    val cx = x.join(mu, "pos")
      .select($"vec_id", $"pos", ($"comp" - $"mu").as("d"))
    val cov = cx.as("a").join(cx.as("b"), "vec_id")
      .groupBy(col("a.pos").as("i"), col("b.pos").as("j"))
      .agg(sum(round(col("a.d") * col("b.d"), 10).cast("decimal(27,10)")).as("sp"),
        count(lit(1)).as("n"))
      .select($"i", $"j", round($"sp".cast("double") / $"n", 8).as("c"))
      .localCheckpoint(true)
    var vec = cov.select($"i".as("p")).distinct()
      .select($"p", lit(0.125).as("val"))
    var lastNorm: DataFrame = null
    for (_ <- 1 to iters) {
      val w = cov.join(vec, $"j" === $"p")
        .groupBy($"i")
        .agg(round(sum(round($"c" * $"val", 12).cast("decimal(38,12)"))
          .cast("double"), 10).as("w"))
      val nrm = w.agg(sqrt(round(sum(round($"w" * $"w", 12)
        .cast("decimal(38,12)")).cast("double"), 10)).as("nrm"))
      lastNorm = nrm.localCheckpoint(true)
      vec = w.crossJoin(broadcast(lastNorm))
        .select($"i".as("p"), round($"w" / $"nrm", 8).as("val"))
        .localCheckpoint(true)
    }
    vec.crossJoin(broadcast(lastNorm))
      .select($"p".cast("long").as("pos"), $"val".as("loading"),
        round($"nrm", 6).as("eigenvalue"))
  }

  /** CENTROID ASSIGNMENT — Lloyd's other half over [[bucketCentroids]]:
    * every vector is (re)assigned to its most-similar centroid by
    * cosine (spherical k-means, the natural metric for embeddings — and
    * the same codegen kernel the rest of the similarity family uses).
    * One full Lloyd iteration IS these two operators composed; chaining
    * assign→centroids→assign… is the whole clustering loop, each step a
    * deterministic oracle-checkable query. Shape: the centroid table is
    * O(buckets) rows and BROADCAST; the corpus streams past it once; the
    * per-vector argmax is the bounded-heap [[graft.functions.TopKAgg]]
    * at k=1 (score = cosine, ties on the smaller bucket id), so the one
    * exchange carries a single-row heap per (vector, partition). A
    * vector's assignment can differ from its own SRP bucket — that
    * movement is exactly what a Lloyd step is for (spec asserts the
    * argmax dominates the home-bucket similarity). */
  def centroidAssign(s: SparkSession, dir: String, nBits: Int = 8): DataFrame =
    centroidAssignFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nBits)

  /** Core of [[centroidAssign]] over any (vec_id, v) frame. */
  def centroidAssignFrom(e: DataFrame, nBits: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val cents = bucketCentroidsFrom(e, nBits)
      .groupBy($"bucket")
      .agg(transform(array_sort(collect_list(struct($"pos", $"mean_comp"))),
        x => x.getField("mean_comp")).as("cv"))
    val scored = e.join(broadcast(cents))
      .withColumn("cos_sim", round(cosine($"v", $"cv"), 4))
    val top1 = Bridge.column(
      graft.functions.TopKAgg(
        Bridge.expression($"cos_sim"),
        Bridge.expression($"bucket"), 1).toAggregateExpression())
    scored.groupBy($"vec_id")
      .agg(top1.as("tk"))
      .select($"vec_id", explode($"tk").as("t"))
      .select($"vec_id", $"t.vec_id".as("bucket"), $"t.cos_sim".as("cos_sim"))
  }

  /** ONE FULL LLOYD ITERATION as a single query: [[centroidAssign]]
    * composed with the recompute-means half of [[bucketCentroids]] —
    * the updated centroids AFTER every vector moves to its most-similar
    * centroid. Chaining this operator is k-means; each link is
    * deterministic and oracle-checked end-to-end (SRP seeding →
    * assignment → decimal-exact new means in one plan). Shapes are the
    * proven ones: broadcast centroid table, k=1 heap argmax, bounded
    * posexplode, decimal partial sums. Clusters that lose every vector
    * disappear from the output — standard Lloyd behavior. */
  def lloydIteration(s: SparkSession, dir: String, nBits: Int = 8): DataFrame =
    lloydIterationFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nBits)

  /** Core of [[lloydIteration]] over any (vec_id, v) frame. */
  def lloydIterationFrom(e: DataFrame, nBits: Int): DataFrame = {
    val assigned = centroidAssignFrom(e, nBits).select($"vec_id", $"bucket")
    e.join(assigned, "vec_id")
      .select($"bucket", posexplode($"v").as(Seq("pos", "comp")))
      .groupBy($"bucket", $"pos")
      .agg(sum($"comp".cast("decimal(27,10)")).as("s"), count(lit(1)).as("n_vecs"))
      .select($"bucket", $"pos".cast("long").as("pos"),
        round($"s".cast("double") / $"n_vecs", 6).as("mean_comp"), $"n_vecs")
  }

  /** CENTROID SHIFT — Lloyd convergence measured AS A QUERY: for every
    * bucket that survives one iteration, the cosine between its seed
    * centroid ([[bucketCentroids]]) and its post-assignment centroid
    * ([[lloydIteration]]), plus the population change. The k-means
    * stopping rule ("iterate until centroids stop moving") needs
    * exactly this artifact; keeping it oracle-checked means a broken
    * assignment step shows up as spurious movement, not silence. Both
    * sides are tiny exploded centroid tables (O(buckets × dims) rows);
    * the reassembly and cosine run at driver-irrelevant scale. */
  def centroidShift(s: SparkSession, dir: String, nBits: Int = 8): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    def assemble(df: DataFrame, vecName: String, nName: String): DataFrame =
      df.groupBy($"bucket")
        .agg(
          transform(array_sort(collect_list(struct($"pos", $"mean_comp"))),
            x => x.getField("mean_comp")).as(vecName),
          max($"n_vecs").as(nName))
    val before = assemble(bucketCentroidsFrom(e, nBits), "v0", "n0")
    val after = assemble(lloydIterationFrom(e, nBits), "v1", "n1")
    before.join(after, "bucket")
      .select($"bucket",
        round(cosine($"v0", $"v1"), 4).as("cos_move"),
        $"n0".as("n_before"), $"n1".as("n_after"))
  }

  /** RECALL REPORT — ANN quality measured AS A QUERY: per-query overlap
    * of the multi-probe IVF top-k ([[ivfTopK]]) against the exact
    * brute-force top-k ([[bruteForceTopKAgg]]). An approximate index
    * without a continuously-measured recall is a liability at 100 TB
    * (index drift after re-ingestion is invisible until retrieval
    * degrades); this keeps the measurement in the engine, over the same
    * data, as an oracle-checkable artifact. Both sides are the proven
    * top-k shapes; the overlap is a left-semi membership probe and one
    * aggregate per query — the output is nQueries rows. */
  def recallReport(s: SparkSession, dir: String,
                   nQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val exact = bruteForceTopKAggFrom(e, nQueries, k).select($"q_id", $"vec_id")
    val approx = ivfTopKFrom(e, nQueries, k)
      .select($"q_id".as("aq"), $"vec_id".as("av"))
    exact
      .join(approx, $"q_id" === $"aq" && $"vec_id" === $"av", "left")
      .groupBy($"q_id")
      .agg(
        count(lit(1)).as("n_exact"),
        count($"av").as("n_overlap"),
        round(count($"av").cast("double") / count(lit(1)), 6).as("recall_at_k"))
  }

  /** IVF PROBE-SWEEP CURVE — recall@k AND scan cost of the multi-probe
    * IVF index at every probe radius H = 0..maxHamming, in one report:
    * per radius, the probed candidate volume (as a fraction of the
    * brute-force nQueries·(N−1) scan) against the macro recall vs the
    * exact top-k. THE tuning artifact of a deployed ANN index — nprobe
    * is the one knob an operator actually turns (FAISS `nprobe`, and
    * the reason every vector-DB benchmark is a recall-vs-QPS curve),
    * and choosing it blind means either paying 10× the scan for recall
    * already saturated, or silently serving 60% recall. Keeping the
    * sweep in the engine over the live corpus makes the choice an
    * oracle-checkable query, re-runnable after every re-ingestion
    * (bucket-balance drift moves this curve; [[recallReport]] alone
    * pins just one point of it).
    *
    * Shape: the exact baseline runs ONCE (the [[bruteForceTopKAggFrom]]
    * bounded-heap pass); per radius, one corpus scan pruned to probed
    * buckets by the broadcast equi-join — the probe expansion lives on
    * the nQueries-row side, the corpus is bucketed once and
    * checkpointed. The candidate frame is checkpointed per radius so
    * its two consumers (the candidate count and the top-k rank) derive
    * it once. Counts are exact integers; each row closes with two
    * rounded divisions — engine-identical. Output: maxHamming+1 rows. */
  def ivfProbeCurve(s: SparkSession, dir: String,
                    nQueries: Int = 5, k: Int = 10, nBits: Int = 8,
                    maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= nBits,
      s"maxHamming must be in [0, $nBits], got $maxHamming")
    val e0 = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val e = e0.withColumn("bucket", srpSignature($"v", nBits))
      .localCheckpoint(true)
    val exact = bruteForceTopKAggFrom(e0, nQueries, k)
      .select($"q_id", $"vec_id").localCheckpoint(true)
    val nCorpus = e.agg(count(lit(1)).as("n_corpus"))
    (0 to maxHamming).map { hMax =>
      val probes = probeMasks(nBits, hMax).map {
        case 0L => $"bucket"
        case m => $"bucket".bitwiseXOR(lit(m))
      }
      val q = e.filter($"vec_id" < nQueries)
        .select($"vec_id".as("q_id"), $"v".as("q_v"),
          explode(array(probes: _*)).as("q_bucket"))
      val scored = e
        .join(broadcast(q), $"bucket" === $"q_bucket" && $"vec_id" =!= $"q_id")
        .withColumn("cos_sim", round(cosine($"q_v", $"v"), 4))
        .select($"q_id", $"vec_id", $"cos_sim")
        .localCheckpoint(true)
      val cand = scored.agg(count(lit(1)).as("n_candidates"))
      val approx = topKTwoPhase(scored, k, nBuckets = 8)
        .select($"q_id".as("aq"), $"vec_id".as("av"))
      exact
        .join(approx, $"q_id" === $"aq" && $"vec_id" === $"av", "left")
        .agg(count(lit(1)).as("n_exact"), count($"av").as("n_overlap"))
        .crossJoin(broadcast(cand)).crossJoin(broadcast(nCorpus))
        .select(lit(hMax.toLong).as("probe_hamming"),
          lit(probeMasks(nBits, hMax).size.toLong).as("n_probes"),
          $"n_candidates",
          round($"n_candidates".cast("double") /
            (lit(nQueries.toDouble) * ($"n_corpus" - lit(1L)).cast("double")), 6)
            .as("scan_frac"),
          $"n_overlap", $"n_exact",
          round($"n_overlap".cast("double") / $"n_exact".cast("double"), 6)
            .as("recall_at_k"))
    }.reduce(_ unionAll _)
  }

  /** THRESHOLD-CALIBRATION HISTOGRAM — the similarity distribution of
    * the banded-SRP candidate pairs, bucketed at 0.1 grain: the curve a
    * pipeline reads to PICK its near-dup threshold (the valley between
    * the near-dup mode near 1.0 and the background mode near 0 is the
    * defensible cut; a threshold chosen blind is a guess). Runs the
    * exact [[srpNearDupPairsFrom]] candidate machinery with the verify
    * filter OPEN (threshold −1 keeps every candidate), then one
    * partial-aggregated count per bin — the output is ≤ 21 rows
    * whatever the corpus size, and the candidate set is the banded one
    * (linear under the auto-sized bands), never all-pairs.
    * Bin = floor(round(cos,4)·10): both engines bucket the SAME rounded
    * double with the SAME IEEE multiply+floor, so a value landing a few
    * ulps under a decimal boundary bins identically either side. */
  def thresholdHistogram(s: SparkSession, dir: String): DataFrame =
    srpNearDupPairs(s, dir, threshold = -1.0)
      .groupBy(floor($"cos_sim" * 10).cast("long").as("cos_bin"))
      .agg(count(lit(1)).as("n_pairs"))

  /** Target mean bucket population for auto-sized SRP banding. */
  val AutoTargetBucketRows = 64L

  /** SRP-LSH near-dup pairs (unblocked twin of Dedup.embeddingNearDup):
    * banded signatures — a pair is a candidate if it agrees on ALL bits
    * of ANY band (nBands x bitsPerBand total SRP bits), then verified
    * with exact cosine. Candidates are deduped BEFORE the vector re-join
    * so embeddings never ride through the band shuffle.
    *
    * BUCKET-POPULATION DISCIPLINE: the candidate join is quadratic
    * WITHIN a bucket, so a fixed bitsPerBand silently goes quadratic as
    * the corpus grows (the round-3 10x bench measured exactly that:
    * 4 bits = 16 buckets/band made a 50k-vector corpus 42x slower, not
    * 10x). With bitsPerBand=0 (the default) the band width is sized
    * from the corpus count so mean bucket population stays ~
    * [[AutoTargetBucketRows]]: bits = clamp(4..14, log2(n/target)) —
    * one cheap count() job at build time, after which candidates scale
    * LINEARLY in n. Wider bands lower per-band collision probability for
    * borderline pairs (the standard LSH recall knob — raise nBands to
    * compensate at low thresholds; near-exact duplicates keep ~p^bits
    * with p close to 1, so recall for true dups stays high). The DuckDB
    * twin mirrors the auto sizing at every scale (OracleSqlGen reads the
    * corpus size from the parquet footer and applies the same clamp). */
  def srpNearDupPairs(s: SparkSession, dir: String, threshold: Double = 0.4,
                      nBands: Int = 4, bitsPerBand: Int = 0): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    srpNearDupPairsFrom(e, threshold, nBands, bitsPerBand)
  }

  /** Band width keeping mean bucket population ~AutoTargetBucketRows:
    * clamp(4..14, ceil(log2(n / target))). */
  private[graft] def autoBitsPerBand(n: Long): Int = {
    val raw = math.ceil(
      math.log(math.max(1.0, n.toDouble / AutoTargetBucketRows)) / math.log(2.0)).toInt
    math.min(14, math.max(4, raw))
  }

  /** Core of [[srpNearDupPairs]] over any (vec_id, v) frame.
    *
    * LEFTMOST-BAND emission (same construction as the MinHash path,
    * Dedup.minhashLshPairs): every band row carries the row's FULL array
    * of band values (nBands packed longs, ~32 bytes), and a pair is
    * emitted only from the first band the two rows share — candidates
    * are unique BY CONSTRUCTION, so the multi-million-row `distinct()`
    * exchange between candidate generation and the vector re-join is
    * gone entirely (PlanSpec pins the exchange count). */
  def srpNearDupPairsFrom(e: DataFrame, threshold: Double,
                          nBands: Int = 4, bitsPerBand0: Int = 0): DataFrame = {
    val bitsPerBand =
      if (bitsPerBand0 > 0) bitsPerBand0 else autoBitsPerBand(e.count())
    require(nBands * bitsPerBand <= 60,
      s"nBands * bitsPerBand must fit the packed-Long budget (<= 60), got ${nBands * bitsPerBand}")
    // all band values in one projection (the kernel reads v once per
    // band either way), then ONE explode — not an nBands-way union
    val withBvs = e.select($"vec_id",
      array((0 until nBands).map(b =>
        srpSignatureSlice($"v", b * bitsPerBand, bitsPerBand)): _*).as("bvs"))
    val bandRows = withBvs.select(
      $"vec_id", $"bvs",
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band_id"), element_at($"bvs", b + 1).as("bv"))): _*)).as("b"))
      .select($"vec_id", $"bvs", $"b.band_id".as("band_id"), $"b.bv".as("bv"))
    val l = bandRows.select($"band_id", $"bv", $"vec_id".as("vec_a"), $"bvs".as("bvs_a"))
    val r = bandRows.select($"band_id".as("band_id_r"), $"bv".as("bv_r"),
      $"vec_id".as("vec_b"), $"bvs".as("bvs_b"))
    val noEarlierMatch = (0 until nBands - 1).map { earlier =>
      $"band_id" <= earlier ||
        element_at($"bvs_a", earlier + 1) =!= element_at($"bvs_b", earlier + 1)
    }.reduceOption(_ && _).getOrElse(lit(true))
    val cands = l.join(r,
        $"band_id" === $"band_id_r" && $"bv" === $"bv_r" &&
          $"vec_a" < $"vec_b" && noEarlierMatch)
      .select($"vec_a", $"vec_b")
    cands
      .join(e.select($"vec_id".as("vec_a"), $"v".as("v_a")), "vec_a")
      .join(e.select($"vec_id".as("vec_b"), $"v".as("v_b")), "vec_b")
      .withColumn("cos_sim", round(cosine($"v_a", $"v_b"), 4))
      .filter($"cos_sim" >= threshold)
      .select($"vec_a", $"vec_b", $"cos_sim")
  }

  // ---- product quantization ---------------------------------------------

  /** PQ geometry: m subspaces over the 64-dim embedding. */
  private val PqSubspaces = 8
  private val PqBitsPerCode = 4
  private def pqSubDim: Int = graft.functions.SrpPlanes.Dim / PqSubspaces

  /** Subvector width of the PQ geometry — public so the streaming
    * encode router builds its kernel on the same slicing. */
  def pqSubspaceDim: Int = pqSubDim

  /** Per-row (sub, code, subvector) decomposition shared by the three PQ
    * operators: subspace j's code is the SRP band of the 8-dim SUBVECTOR
    * over planes [j*nBits, (j+1)*nBits) (the fused codegen kernel
    * projects shorter vectors over their own length, so the plane is
    * effectively its first 8 components) — a deterministic, data-free
    * quantizer seeding, exactly like the IVF coarse quantizer. */
  private def pqDecomposed(e: DataFrame, extra: Seq[String] = Nil): DataFrame =
    e.select($"vec_id" +: extra.map(col) :+
        posexplode(array((0 until PqSubspaces).map { j =>
          val sv = slice($"v", j * pqSubDim + 1, pqSubDim)
          struct(
            srpSignatureSlice(sv, j * PqBitsPerCode, PqBitsPerCode).as("code"),
            sv.as("sv"))
        }: _*)).as(Seq("sub", "sc")): _*)
      .select($"vec_id" +: extra.map(col) ++: Seq($"sub".cast("long").as("sub"),
        $"sc.code".as("code"), $"sc.sv".as("sv")): _*)

  /** PRODUCT-QUANTIZATION CODES — each 64-dim vector compressed to m=8
    * 4-bit subspace codes (512 B of doubles → 4 B of codes, the 128×
    * memory collapse that makes billion-vector ANN candidate scoring fit
    * in RAM; pairs with [[ivfTopK]] as the standard IVF-PQ layout).
    * Shape: ONE codegen scan, zero shuffles — every code is a fused
    * SRP-band projection of a vector slice. */
  def pqCodes(s: SparkSession, dir: String): DataFrame =
    pqCodesFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")))

  /** Core of [[pqCodes]] over any (vec_id, v) frame. */
  def pqCodesFrom(e: DataFrame): DataFrame =
    pqDecomposed(e).select($"vec_id", $"sub", $"code")

  /** PQ CODEBOOKS — the reconstruction table: per (subspace, code), the
    * mean subvector of every vector that quantized there (exactly the
    * [[bucketCentroids]] aggregate per subspace; a PQ-Lloyd refinement
    * step would re-run this against reassigned codes). Component sums in
    * DECIMAL(27,10): exact, order-independent, engine-identical. Output
    * is exploded (sub, code, pos, mean_comp, n_vecs) — ≤ m·2^bits·subDim
    * = 1,024 rows whatever the corpus size; one exchange total. */
  def pqCodebooks(s: SparkSession, dir: String): DataFrame =
    pqCodebooksFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")))

  /** Core of [[pqCodebooks]] over any (vec_id, v) frame. */
  def pqCodebooksFrom(e: DataFrame): DataFrame =
    pqDecomposed(e)
      .select($"sub", $"code", posexplode($"sv").as(Seq("pos", "comp")))
      .groupBy($"sub", $"code", $"pos")
      .agg(sum($"comp".cast("decimal(27,10)")).as("s"), count(lit(1)).as("n_vecs"))
      .select($"sub", $"code", $"pos".cast("long").as("pos"),
        round($"s".cast("double") / $"n_vecs", 6).as("mean_comp"), $"n_vecs")

  /** PQ RECONSTRUCTION ERROR — quantization quality measured AS A QUERY
    * (the recall-report discipline applied to compression): per
    * (subspace, component), the mean squared error between original
    * components and their codebook reconstruction. The artifact a 100 TB
    * deployment watches for codebook drift after re-ingestion — rising
    * MSE in one subspace says "re-train that codebook" long before
    * retrieval quality visibly decays. Shape: the ≤1,024-row codebook is
    * BROADCAST back against the decomposed scan; squared deviations sum
    * in DECIMAL for engine-exact totals; one exchange on (sub, pos).
    * Output is m·subDim = 64 rows. */
  def pqReconError(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cb = pqCodebooksFrom(e).select($"sub", $"code", $"pos", $"mean_comp")
    pqDecomposed(e)
      .select($"sub", $"code", posexplode($"sv").as(Seq("pos", "comp")))
      .withColumn("pos", $"pos".cast("long"))
      .join(broadcast(cb), Seq("sub", "code", "pos"))
      .select($"sub", $"pos",
        (($"comp" - $"mean_comp") * ($"comp" - $"mean_comp"))
          .cast("decimal(27,10)").as("sq"))
      .groupBy($"sub", $"pos")
      .agg(sum($"sq").as("s"), count(lit(1)).as("n_vecs"))
      .select($"sub", $"pos",
        round($"s".cast("double") / $"n_vecs", 6).as("mse"), $"n_vecs")
  }

  /** PQ-ADC TOP-K — the query path of IVF-PQ: each query builds a tiny
    * LOOKUP TABLE (its dot product against every codebook entry,
    * m·2^bits = 128 doubles), and corpus similarity is a table lookup
    * per stored code. SCORING dereferences only (vec_id, sub, code) —
    * the point at 100 TB, where the 4-byte code table is the stored
    * artifact that streams and the 512-byte embedding column stays cold.
    * (On this test corpus no code column is materialized, so the plan
    * derives codes inline from the embedding scan; a deployment swaps
    * that leaf for the code table and nothing downstream changes.)
    * Shape: LUT = queries × broadcast codebook (≤ nQueries·128 rows,
    * broadcast back); the code scan joins it on (sub, code);
    * per-(query, vector) partials sum in DECIMAL (exact under any
    * partial-agg order; the dot-product DOUBLES agree to the last ULP
    * on both engines — the one residual asymmetry is the double→decimal
    * cast itself, HALF_UP in Spark vs half-even in DuckDB, which only
    * differs on an exact tie at the 10th decimal, never observed on
    * these hash-derived values); the final rank is the proven two-phase
    * top-k. Scores are inner products against
    * RECONSTRUCTED vectors — approximate by construction; the companion
    * [[pqRecall]] measures exactly how approximate. */
  def pqAdcTopK(s: SparkSession, dir: String,
                nQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val scored = pqCodesFrom(e)
      .join(broadcast(pqAdcLut(e, nQueries)), Seq("sub", "code"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(round(sum($"part").cast("double"), 6).as("adc_score"))
    adcRank(scored, k)
  }

  /** Codebook entries reassembled to vectors: (sub, code, cv). ≤128 rows
    * whatever the corpus size — always broadcast-sized. */
  private def pqCodebookVecs(e: DataFrame): DataFrame =
    pqCodebooksFrom(e)
      .groupBy($"sub", $"code")
      .agg(transform(array_sort(collect_list(struct($"pos", $"mean_comp"))),
        x => x.getField("mean_comp")).as("cv"))

  /** Per-query ADC lookup table (q_id, sub, code, part): each query's dot
    * product against every codebook entry — ≤ nQueries·m·2^bits rows of
    * DECIMAL partials, broadcast to the code scan. */
  private def pqAdcLut(e: DataFrame, nQueries: Int): DataFrame =
    pqDecomposed(e).filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"sub", $"sv".as("qv"))
      .join(broadcast(pqCodebookVecs(e)), "sub")
      .select($"q_id", $"sub", $"code",
        graft.functions.VectorOps.dot($"qv", $"cv")
          .cast("decimal(27,10)").as("part"))

  /** The proven two-phase top-k over (q_id, vec_id, adc_score). */
  private def adcRank(scored: DataFrame, k: Int): DataFrame = {
    val bucketed = scored.withColumn("bkt", pmod(hash($"vec_id"), lit(8)))
    val wLocal = Window.partitionBy($"q_id", $"bkt")
      .orderBy($"adc_score".desc, $"vec_id".asc)
    val wFinal = Window.partitionBy($"q_id")
      .orderBy($"adc_score".desc, $"vec_id".asc)
    bucketed
      .withColumn("rn_local", row_number().over(wLocal))
      .filter($"rn_local" <= k)
      .withColumn("rn", row_number().over(wFinal))
      .filter($"rn" <= k)
      .select($"q_id", $"vec_id", $"adc_score")
  }

  /** IVF-PQ TOP-K — the billion-vector ANN layout: [[ivfTopK]]'s coarse
    * multi-probe pruning composed with [[pqAdcTopK]]'s table-lookup
    * scoring, so ADC dereferences ONLY codes in the probed coarse buckets
    * instead of all N. At 100 TB the stored artifact is the (bucket, sub,
    * code) table written bucketed/partitioned by the coarse bucket:
    * the probe join becomes partition pruning, and each query reads
    * |probes|/2^nBits of the code table (H<=1 at nBits=8 = 9/256 ≈ 3.5%
    * of N) — the full-scan reservation the flat-ADC docstring carries is
    * exactly what this operator removes. Shape: both the probe set
    * (nQueries·|probes| rows) and the ADC LUT (nQueries·128 rows) are
    * BROADCAST against the one code scan; DECIMAL partials; the proven
    * two-phase rank. Recall compounds the coarse quantizer's candidate
    * loss with PQ's score distortion — [[pqRecall]] reports both paths
    * side by side. */
  def ivfPqTopK(s: SparkSession, dir: String,
                nQueries: Int = 5, k: Int = 10, nBits: Int = 8,
                probeHamming: Int = 1): DataFrame =
    ivfPqTopKFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k, nBits, probeHamming)

  /** Core of [[ivfPqTopK]] over any (vec_id, v) frame. */
  def ivfPqTopKFrom(e: DataFrame, nQueries: Int, k: Int, nBits: Int = 8,
                    probeHamming: Int = 1): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= nBits,
      s"probeHamming must be in [0, $nBits], got $probeHamming")
    val eb = e.withColumn("bucket", srpSignature($"v", nBits))
    val probeCols = probeMasks(nBits, probeHamming).map {
      case 0L => $"bucket"
      case m => $"bucket".bitwiseXOR(lit(m))
    }
    val probes = eb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("p_id"), explode(array(probeCols: _*)).as("q_bucket"))
    val lut = pqAdcLut(e, nQueries)
      .withColumnRenamed("sub", "l_sub").withColumnRenamed("code", "l_code")
    val scored = pqDecomposed(eb, Seq("bucket"))
      .select($"vec_id", $"bucket", $"sub", $"code")
      .join(broadcast(probes), $"bucket" === $"q_bucket" && $"vec_id" =!= $"p_id")
      .join(broadcast(lut),
        $"q_id" === $"p_id" && $"sub" === $"l_sub" && $"code" === $"l_code")
      .groupBy($"q_id", $"vec_id")
      .agg(round(sum($"part").cast("double"), 6).as("adc_score"))
    adcRank(scored, k)
  }

  /** IVF-PQ PROBE-SWEEP CURVE — [[ivfProbeCurve]]'s report for the
    * COMPRESSED path: recall@k and code-scan cost of the IVF-PQ index
    * ([[ivfPqTopK]]) at every probe radius H = 0..maxHamming, measured
    * against the exact float top-k. The raw-vector sweep prices the
    * coarse quantizer alone; this one prices coarse pruning AND PQ
    * score distortion together — the recall an IVF-PQ deployment
    * actually serves at each nprobe, which is the only number that
    * matters when the corpus scan is codes-only (16 B/vector) and
    * turning the probe knob is free relative to re-training the
    * codebook. Completes the tuning-curve trio: coarse quantizer
    * ([[ivfProbeCurve]]), LSH banding
    * ([[Dedup.lshTuningCurve]]), compressed retrieval (this).
    *
    * Shape: codes, coarse buckets and the ADC LUT build ONCE
    * (checkpointed; LUT broadcast); per radius one code-only scan
    * pruned by the broadcast probe set, one (q, vec) DECIMAL partial
    * agg (checkpointed — the candidate count and the rank both read
    * it), the proven two-phase rank, and a left-join overlap against
    * the once-built exact baseline. Output: maxHamming+1 rows. */
  def ivfPqProbeCurve(s: SparkSession, dir: String,
                      nQueries: Int = 5, k: Int = 10, nBits: Int = 8,
                      maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= nBits,
      s"maxHamming must be in [0, $nBits], got $maxHamming")
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val exact = bruteForceTopKAggFrom(e, nQueries, k)
      .select($"q_id", $"vec_id").localCheckpoint(true)
    val eb = e.withColumn("bucket", srpSignature($"v", nBits))
    val sigs = eb.select($"vec_id", $"bucket").localCheckpoint(true)
    val codes = pqDecomposed(eb, Seq("bucket"))
      .select($"vec_id", $"bucket", $"sub", $"code").localCheckpoint(true)
    val lut = pqAdcLut(e, nQueries)
      .withColumnRenamed("sub", "l_sub").withColumnRenamed("code", "l_code")
      .localCheckpoint(true)
    val nCorpus = sigs.agg(count(lit(1)).as("n_corpus"))
    (0 to maxHamming).map { hMax =>
      val probeCols = probeMasks(nBits, hMax).map {
        case 0L => $"bucket"
        case m => $"bucket".bitwiseXOR(lit(m))
      }
      val probes = sigs.filter($"vec_id" < nQueries)
        .select($"vec_id".as("p_id"), explode(array(probeCols: _*)).as("q_bucket"))
      val scored = codes
        .join(broadcast(probes), $"bucket" === $"q_bucket" && $"vec_id" =!= $"p_id")
        .join(broadcast(lut),
          $"q_id" === $"p_id" && $"sub" === $"l_sub" && $"code" === $"l_code")
        .groupBy($"q_id", $"vec_id")
        .agg(round(sum($"part").cast("double"), 6).as("adc_score"))
        .localCheckpoint(true)
      val cand = scored.agg(count(lit(1)).as("n_candidates"))
      val approx = adcRank(scored, k)
        .select($"q_id".as("aq"), $"vec_id".as("av"))
      exact
        .join(approx, $"q_id" === $"aq" && $"vec_id" === $"av", "left")
        .agg(count(lit(1)).as("n_exact"), count($"av").as("n_overlap"))
        .crossJoin(broadcast(cand)).crossJoin(broadcast(nCorpus))
        .select(lit(hMax.toLong).as("probe_hamming"),
          lit(probeMasks(nBits, hMax).size.toLong).as("n_probes"),
          $"n_candidates",
          round($"n_candidates".cast("double") /
            (lit(nQueries.toDouble) * ($"n_corpus" - lit(1L)).cast("double")), 6)
            .as("scan_frac"),
          $"n_overlap", $"n_exact",
          round($"n_overlap".cast("double") / $"n_exact".cast("double"), 6)
            .as("recall_at_k"))
    }.reduce(_ unionAll _)
  }

  /** TWO-STAGE RETRIEVAL: IVF-PQ SHORTLIST + EXACT RE-RANK — the shape
    * every production ANN deployment actually serves (Jégou et al.
    * TPAMI'11 §V: ADC orders a shortlist, exact distances re-order it):
    * [[ivfPqTopK]] produces a shortlist of `shortlist` candidates per
    * query by compressed-domain ADC score, then ONLY those candidates'
    * raw vectors are fetched and scored with exact cosine, and the final
    * top-k is ranked on the exact score. PQ's score distortion is
    * confined to candidate SELECTION (where a miss costs recall already
    * priced by [[pqRecall]]), never to the returned ORDER — the ranking
    * the user sees is exact.
    *
    * Shape at 100 TB: the expensive pass stays compressed — the corpus
    * scan touches only (bucket, codes). The re-rank side is
    * nQueries x shortlist rows (hundreds), BROADCAST against the raw
    * vector table, so the exact-score fetch is a broadcast-pruned point
    * read (with the vector table sorted/bucketed on vec_id it is an
    * index fetch, raw vectors otherwise cold). The final rank windows
    * over <= shortlist rows per query — no two-phase needed. Both
    * scores are kept: adc_score (what stage 1 believed) next to cos_sim
    * (the truth) is the per-hit distortion audit. */
  def ivfPqRerank(s: SparkSession, dir: String,
                  nQueries: Int = 5, k: Int = 10, shortlist: Int = 50,
                  nBits: Int = 8, probeHamming: Int = 1): DataFrame =
    ivfPqRerankFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k, shortlist, nBits, probeHamming)

  /** Core of [[ivfPqRerank]] over any (vec_id, v) frame. */
  def ivfPqRerankFrom(e: DataFrame, nQueries: Int, k: Int, shortlist: Int,
                      nBits: Int = 8, probeHamming: Int = 1): DataFrame = {
    require(shortlist >= k, s"shortlist must be >= k, got $shortlist < $k")
    val cand = ivfPqTopKFrom(e, nQueries, shortlist, nBits, probeHamming)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"))
    val wFinal = Window.partitionBy($"q_id")
      .orderBy($"cos_sim".desc, $"vec_id".asc)
    e.join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cos_sim", round(cosine($"q_v", $"v"), 4))
      .withColumn("rn", row_number().over(wFinal))
      .filter($"rn" <= k)
      .select($"q_id", $"vec_id", $"cos_sim", $"adc_score")
  }

  /** IVFADC TOP-K — the full residual-coded IVF-PQ layout (the
    * billion-vector structure of Jégou et al., TPAMI'11: coarse
    * quantizer + PQ over RESIDUALS): every vector stores its coarse
    * bucket plus 8 4-bit codes of the residual v − centroid(bucket), and
    * a query's score against a candidate is
    * ⟨q, centroid(bucket)⟩ + Σ_sub LUT(q, sub, code) — the coarse term
    * looked up per probed bucket, the residual term per stored code.
    * Residuals concentrate around 0, so the same 4-bit alphabet spends
    * its resolution on the part of the vector the coarse quantizer
    * didn't already explain — tighter reconstructions than flat PQ at
    * identical storage ([[ivfPqTopK]] quantizes raw vectors; this
    * operator is what that layout graduates into). Shape: coarse
    * centroid table ≤2^nBits rows and residual codebook ≤128 rows, BOTH
    * broadcast — the residual derivation, coding and scoring all ride
    * the one corpus scan; probe set and LUT broadcast as in
    * [[ivfPqTopK]]; DECIMAL partials (coarse + 8 residual parts per
    * candidate, exact under any agg order); the proven two-phase rank.
    * At 100 TB the stored artifact is (bucket, 4 B codes) written
    * bucketed by the coarse bucket — probe-side partition pruning, raw
    * vectors cold. */
  def ivfAdcTopK(s: SparkSession, dir: String,
                 nQueries: Int = 5, k: Int = 10, nBits: Int = 8,
                 probeHamming: Int = 1): DataFrame =
    ivfAdcTopKFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k, nBits, probeHamming)

  /** Coarse centroids reassembled to vectors: (bucket, cv) — ≤2^nBits
    * rows, always broadcast-sized. */
  private[graft] def coarseCentroidVecs(e: DataFrame, nBits: Int): DataFrame =
    bucketCentroidsFrom(e, nBits)
      .groupBy($"bucket")
      .agg(transform(array_sort(collect_list(struct($"pos", $"mean_comp"))),
        x => x.getField("mean_comp")).as("cv"))

  /** Residual frame (vec_id, bucket, v): v − centroid(bucket). Means are
    * rounded to 6 on both engines, so residual components are
    * engine-identical doubles. */
  private[graft] def residualFrameFrom(e: DataFrame, nBits: Int): DataFrame =
    e.withColumn("bucket", srpSignature($"v", nBits))
      .join(broadcast(coarseCentroidVecs(e, nBits)), "bucket")
      .select($"vec_id", $"bucket",
        zip_with($"v", $"cv", (a, b) => a - b).as("v"))

  /** Residual codebook (global across buckets, the standard IVFADC
    * sharing): (sub, code, cv) over residual subvectors — ≤128 rows,
    * decimal-exact means like [[pqCodebooks]]. */
  private[graft] def residualCodebookVecs(e: DataFrame, nBits: Int): DataFrame =
    pqDecomposed(residualFrameFrom(e, nBits), Seq("bucket"))
      .select($"sub", $"code", posexplode($"sv").as(Seq("pos", "comp")))
      .groupBy($"sub", $"code", $"pos")
      .agg(sum($"comp".cast("decimal(27,10)")).as("s"), count(lit(1)).as("n"))
      .select($"sub", $"code", $"pos",
        round($"s".cast("double") / $"n", 6).as("mean_comp"))
      .groupBy($"sub", $"code")
      .agg(transform(array_sort(collect_list(struct($"pos", $"mean_comp"))),
        x => x.getField("mean_comp")).as("cv"))

  /** Core of [[ivfAdcTopK]] over any (vec_id, v) frame. */
  def ivfAdcTopKFrom(e: DataFrame, nQueries: Int, k: Int, nBits: Int = 8,
                     probeHamming: Int = 1): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= nBits,
      s"probeHamming must be in [0, $nBits], got $probeHamming")
    val eb = e.withColumn("bucket", srpSignature($"v", nBits))
    val cents = coarseCentroidVecs(e, nBits)
    val rdec = pqDecomposed(residualFrameFrom(e, nBits), Seq("bucket"))
    // probe set carrying the coarse term ⟨q, centroid(probed bucket)⟩;
    // probes of empty buckets drop in the centroid join (no codes there
    // anyway)
    val probeCols = probeMasks(nBits, probeHamming).map {
      case 0L => $"bucket"
      case m => $"bucket".bitwiseXOR(lit(m))
    }
    val probes = eb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("p_id"), $"v".as("p_v"),
        explode(array(probeCols: _*)).as("q_bucket"))
      .join(broadcast(cents), $"q_bucket" === cents("bucket"))
      .select($"p_id", $"q_bucket",
        graft.functions.VectorOps.dot($"p_v", $"cv")
          .cast("decimal(27,10)").as("coarse"))
    // residual ADC LUT: RAW query subvectors against the residual
    // codebook (the score decomposes as ⟨q,c⟩ + ⟨q,r̂⟩)
    val lut = pqDecomposed(e).filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"sub", $"sv".as("qv"))
      .join(broadcast(residualCodebookVecs(e, nBits)), "sub")
      .select($"q_id", $"sub".as("l_sub"), $"code".as("l_code"),
        graft.functions.VectorOps.dot($"qv", $"cv")
          .cast("decimal(27,10)").as("part"))
    val scored = rdec.select($"vec_id", $"bucket", $"sub", $"code")
      .join(broadcast(probes), $"bucket" === $"q_bucket" && $"vec_id" =!= $"p_id")
      .join(broadcast(lut),
        $"q_id" === $"p_id" && $"sub" === $"l_sub" && $"code" === $"l_code")
      .groupBy($"q_id", $"vec_id")
      .agg(round((sum($"part") + max($"coarse")).cast("double"), 6)
        .as("adc_score"))
    adcRank(scored, k)
  }

  /** IVFADC RECALL REPORT — the [[recallReport]] discipline applied to
    * the residual-coded path: per-query overlap of [[ivfAdcTopK]]
    * against the exact brute-force top-k. Read alongside [[pqRecall]]
    * (flat-ADC and raw-code IVF-PQ): the three reports together price
    * each layout step — compression, coarse pruning, residual coding —
    * in recall, continuously, in the engine. */
  def ivfAdcRecall(s: SparkSession, dir: String,
                   nQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val exact = bruteForceTopKAggFrom(e, nQueries, k).select($"q_id", $"vec_id")
    val approx = ivfAdcTopK(s, dir, nQueries, k)
      .select($"q_id".as("aq"), $"vec_id".as("av"))
    exact
      .join(approx, $"q_id" === $"aq" && $"vec_id" === $"av", "left")
      .groupBy($"q_id")
      .agg(
        count(lit(1)).as("n_exact"),
        count($"av").as("ivfadc_overlap"),
        round(count($"av").cast("double") / count(lit(1)), 6)
          .as("ivfadc_recall_at_k"))
  }

  /** PQ-LLOYD CODEBOOK REFINEMENT — one Lloyd iteration over the
    * SRP-seeded codebooks, per subspace (the [[lloydIteration]] discipline
    * applied to PQ training): every subvector is REASSIGNED to its
    * nearest codebook entry by squared L2 distance (the PQ metric — codes
    * approximate inner products, so training minimizes reconstruction
    * SSE, not cosine), then per-(sub, code) means are recomputed over the
    * new assignment. Both Lloyd half-steps are SSE-non-increasing, so
    * refined reconstruction MSE <= seed MSE by construction — asserted on
    * the fixture in DedupSimilaritySpec, and the honest artifact a
    * deployment chains until the codebook converges. Shape: the ≤128-row
    * codebook is BROADCAST; the per-(vector, sub) argmin is the k=1
    * bounded-heap aggregate (map-side combined, so the exchange carries
    * one row per group, not the ×2^bits scored fan-out); d² composes the
    * codegen dot kernel (⟨x,x⟩ − 2⟨x,c⟩ + ⟨c,c⟩, identical fp order on
    * both engines); DECIMAL component sums, division+round once. */
  def pqLloydCodebooks(s: SparkSession, dir: String): DataFrame =
    pqLloydCodebooksFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")))

  /** Nearest-entry assignment (vec_id, sub, code) of each decomposed
    * subvector row against an arbitrary ≤128-row codebook frame
    * (sub, code, cv), by rounded squared L2 with ties to the smaller
    * code. Shape: the codebook is BROADCAST (≤2^bits entries per
    * subspace fan-out on the scan); the argmin is the k=1 bounded-heap
    * aggregate (map-side combined — the one exchange carries a single
    * row per (vector, subspace), not the ×2^bits scored fan-out). */
  private def nearestCodeIn(dec: DataFrame, cbv: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val cb = cbv.withColumnRenamed("sub", "c_sub")
    val scored = dec.join(broadcast(cb), $"sub" === $"c_sub")
      .withColumn("d2", round(
        graft.functions.VectorOps.dot($"sv", $"sv")
          - lit(2.0) * graft.functions.VectorOps.dot($"sv", $"cv")
          + graft.functions.VectorOps.dot($"cv", $"cv"), 6))
    // argmin via the bounded heap: score = -d2 (desc), ties on smaller
    // code; the winning (already-rounded) d2 rides along as -score for
    // the trajectory's reconstruction-MSE aggregate
    val top1 = Bridge.column(
      graft.functions.TopKAgg(
        Bridge.expression(-$"d2"),
        Bridge.expression($"code"), 1).toAggregateExpression())
    scored.groupBy($"vec_id", $"sub")
      .agg(top1.as("tk"))
      .select($"vec_id", $"sub", explode($"tk").as("t"))
      .select($"vec_id", $"sub", $"t.vec_id".as("code"),
        (-$"t.cos_sim").as("d2"))
  }

  /** Lloyd assignment half-step: (vec_id, sub, code, sv) with `code` the
    * nearest SEED codebook entry by (rounded) squared L2, ties to the
    * smaller code — exposed for the spec's SSE-monotonicity check. */
  private[graft] def pqLloydAssignFrom(e: DataFrame): DataFrame = {
    val dec = pqDecomposed(e).select($"vec_id", $"sub", $"sv")
    dec.join(nearestCodeIn(dec, pqCodebookVecs(e)), Seq("vec_id", "sub"))
  }

  /** Means half-step: per-(sub, code, pos) component means over an
    * assignment frame (vec_id, sub, code, sv) — DECIMAL sums, one
    * division + round. Shared by the one-step refinement and the chain. */
  private def lloydMeansOf(assigned: DataFrame): DataFrame =
    assigned
      .select($"sub", $"code", posexplode($"sv").as(Seq("pos", "comp")))
      .groupBy($"sub", $"code", $"pos")
      .agg(sum($"comp".cast("decimal(27,10)")).as("s"), count(lit(1)).as("n_vecs"))
      .select($"sub", $"code", $"pos".cast("long").as("pos"),
        round($"s".cast("double") / $"n_vecs", 6).as("mean_comp"), $"n_vecs")

  /** Core of [[pqLloydCodebooks]] over any (vec_id, v) frame. */
  def pqLloydCodebooksFrom(e: DataFrame): DataFrame =
    lloydMeansOf(pqLloydAssignFrom(e))

  /** PQ RECALL REPORT — per-query overlap of the compressed top-k paths
    * against the exact brute-force top-k, the [[recallReport]] discipline
    * applied to compression: a PQ index whose recall is not continuously
    * measured is silent retrieval decay waiting to ship. Reports BOTH the
    * flat-ADC path ([[pqAdcTopK]], full code scan — score distortion
    * only) and the IVF-PQ path ([[ivfPqTopK]], probed buckets — candidate
    * loss compounded on score distortion) side by side, so the marginal
    * recall cost of coarse pruning is itself a monitored artifact. */
  def pqRecall(s: SparkSession, dir: String,
               nQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val exact = bruteForceTopKAggFrom(e, nQueries, k).select($"q_id", $"vec_id")
    val approx = pqAdcTopK(s, dir, nQueries, k)
      .select($"q_id".as("aq"), $"vec_id".as("av"))
    val ivfpq = ivfPqTopK(s, dir, nQueries, k)
      .select($"q_id".as("iq"), $"vec_id".as("iv"))
    exact
      .join(approx, $"q_id" === $"aq" && $"vec_id" === $"av", "left")
      .join(ivfpq, $"q_id" === $"iq" && $"vec_id" === $"iv", "left")
      .groupBy($"q_id")
      .agg(
        count(lit(1)).as("n_exact"),
        count($"av").as("n_overlap"),
        round(count($"av").cast("double") / count(lit(1)), 6).as("recall_at_k"),
        count($"iv").as("ivfpq_overlap"),
        round(count($"iv").cast("double") / count(lit(1)), 6).as("ivfpq_recall_at_k"))
  }

  /** Refined codebook entries reassembled to vectors (sub, code, cv) —
    * the [[pqLloydCodebooks]] means; ≤128 rows, always broadcast-sized.
    * Entries that lost every member in the reassignment simply drop out
    * (standard Lloyd: empty cells vanish; re-seeding is a policy choice
    * left to the training loop). */
  private def pqLloydCodebookVecs(e: DataFrame): DataFrame =
    cbVecsOf(pqLloydCodebooksFrom(e))

  /** The persisted FINE-quantizer artifact over any (vec_id, v) frame:
    * the Lloyd-trained PQ codebook reassembled to entry vectors
    * (sub, code, cv) — what [[pqAppend]] trains on the standing corpus
    * and what the streaming encode router
    * ([[graft.streaming.Streams.pqRouter]]) loads as its static model.
    * ≤ m·2^bits = 128 rows whatever the corpus size. */
  def pqCodebookTable(e: DataFrame): DataFrame =
    cbVecsOf(pqLloydCodebooksFrom(e))

  /** PQ encode of `vecs` (vec_id, v) against a trained codebook table
    * (sub, code, cv): per (vector, subspace), the nearest entry by
    * rounded d² with ties to the smaller code ([[nearestCodeIn]] — the
    * argmin d² IS that subspace's reconstruction SSE). The batch half
    * the streaming encode router mirrors bit for bit (parity asserted
    * in StreamingSpec). Output: (vec_id, sub, code, d2). */
  def pqEncode(vecs: DataFrame, cbv: DataFrame): DataFrame =
    nearestCodeIn(pqDecomposed(vecs).select($"vec_id", $"sub", $"sv"),
      cbv.select($"sub", $"code", $"cv"))

  /** Codebook rows (sub, code, pos, mean_comp, …) reassembled to entry
    * vectors (sub, code, cv) — ≤128 rows, always broadcast-sized. */
  private def cbVecsOf(cb: DataFrame): DataFrame =
    cb.groupBy($"sub", $"code")
      .agg(transform(array_sort(collect_list(struct($"pos", $"mean_comp"))),
        x => x.getField("mean_comp")).as("cv"))

  /** PQ-LLOYD TRAINING CHAIN — [[pqLloydCodebooks]] iterated to a FIXED
    * depth (the [[graft.operators.Graph.pageRank]] discipline: a fixed
    * unroll with per-step 6-decimal state rounding keeps both engines
    * iterating on identical doubles, so the chain is oracle-exact; a
    * convergence-driven `while shift > ε` is driver policy a deployment
    * wraps around this step function, watching [[pqLloydTrajectory]]).
    * Each step: reassign every subvector to its nearest current entry
    * (broadcast ≤128-row codebook, k=1 bounded-heap argmin), recompute
    * per-(sub, code) means (DECIMAL partials). Both half-steps are
    * SSE-non-increasing, so reconstruction MSE is monotone down the
    * chain — asserted per step in DedupSimilaritySpec. Shape per step:
    * one broadcast join + one exchange carrying a row per (vector,
    * subspace); the corpus scan is shared across steps by AQE exchange
    * reuse. Returns the trained codebook (sub, code, pos, mean_comp,
    * n_vecs) after `iters` steps. */
  def pqLloydChain(s: SparkSession, dir: String, iters: Int = 3): DataFrame =
    pqLloydChainFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")), iters)

  /** Core of [[pqLloydChain]] over any (vec_id, v) frame. */
  def pqLloydChainFrom(e: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"need >= 1 Lloyd steps, got $iters")
    val dec = pqDecomposed(e).select($"vec_id", $"sub", $"sv")
    var cbv = pqCodebookVecs(e)
    var cb: DataFrame = null
    (1 to iters).foreach { _ =>
      val assigned = dec.join(nearestCodeIn(dec, cbv), Seq("vec_id", "sub"))
      cb = lloydMeansOf(assigned)
      cbv = cbVecsOf(cb)
    }
    cb
  }

  /** PQ-LLOYD TRAINING TRAJECTORY — the artifact a training run actually
    * reads: one row per iteration 0..iters with (reconstruction `mse`
    * under nearest-entry assignment to that iteration's codebook,
    * `n_entries` surviving cells, `max_shift` L2 displacement of the
    * worst-moved entry vs the previous iteration — NULL at iter 0).
    * Together they answer "has training converged, and did any cell
    * empty out" without a separate probe query. MSE sums the
    * (already-rounded) assignment d² in DECIMAL(27,10) and divides
    * once — engine-identical; the shift max is over entries present in
    * both iterations (a vanished cell shows up as an `n_entries` drop).
    * Every per-iteration aggregate is a single-row reduction over
    * broadcast-sized frames; the (vector, subspace) assignment exchange
    * per level is the same one the chain itself needs — AQE reuses it. */
  def pqLloydTrajectory(s: SparkSession, dir: String,
                        iters: Int = 3): DataFrame =
    pqLloydTrajectoryFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")), iters)

  /** Core of [[pqLloydTrajectory]] over any (vec_id, v) frame. */
  def pqLloydTrajectoryFrom(e: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"need >= 1 Lloyd steps, got $iters")
    import graft.functions.VectorOps.dot
    val dec = pqDecomposed(e).select($"vec_id", $"sub", $"sv")
    def summary(assigned: DataFrame, cbvI: DataFrame, iter: Int,
                prev: Option[DataFrame]): DataFrame = {
      val mse = assigned.agg(
        round(sum($"d2".cast("decimal(27,10)")).cast("double")
          / count(lit(1)), 6).as("mse"))
      val n = cbvI.agg(count(lit(1)).as("n_entries"))
      val shift = prev.map { p =>
        p.select($"sub", $"code", $"cv".as("v0"))
          .join(cbvI.select($"sub", $"code", $"cv".as("v1")), Seq("sub", "code"))
          .agg(max(round(sqrt(greatest(
            dot($"v0", $"v0") - lit(2.0) * dot($"v0", $"v1")
              + dot($"v1", $"v1"),
            lit(0.0))), 6)).as("max_shift"))
      }.getOrElse(e.sparkSession.range(1)
        .select(lit(null).cast("double").as("max_shift")))
      mse.crossJoin(n).crossJoin(shift)
        .select(lit(iter.toLong).as("iter"), $"mse", $"n_entries", $"max_shift")
    }
    var cbv = pqCodebookVecs(e)
    var assigned = dec.join(nearestCodeIn(dec, cbv), Seq("vec_id", "sub"))
    var out = summary(assigned, cbv, 0, None)
    (1 to iters).foreach { i =>
      val next = cbVecsOf(lloydMeansOf(assigned))
      val assignedNext = dec.join(nearestCodeIn(dec, next), Seq("vec_id", "sub"))
      out = out.unionByName(summary(assignedNext, next, i, Some(cbv)))
      cbv = next
      assigned = assignedNext
    }
    out
  }

  /** TRAINED-CODEBOOK ADC TOP-K — [[pqAdcTopK]] run against the
    * Lloyd-REFINED codebooks instead of the data-free SRP seed: the
    * corpus is RE-ENCODED (nearest refined entry per subvector — the
    * assignment half-step against the trained table) and each query's
    * LUT is built from the refined entries. This is what a deployment
    * ships after training: [[pqLloydCodebooks]] is one refinement step,
    * this operator is the retrieval path that consumes its output, and
    * [[pqTrainedRecall]] prices the improvement. Shape: refined
    * codebook ≤128 rows broadcast twice (re-encode argmin + LUT); the
    * re-encode exchange carries one row per (vector, subspace) — at
    * 100 TB the trained codes are the stored artifact, written once,
    * and retrieval reduces to the same code-scan + broadcast-LUT join
    * as the seed path; DECIMAL partials; the proven two-phase rank. */
  def adcTrainedTopK(s: SparkSession, dir: String,
                     nQueries: Int = 5, k: Int = 10): DataFrame =
    adcTrainedTopKFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k)

  /** Core of [[adcTrainedTopK]] over any (vec_id, v) frame. */
  def adcTrainedTopKFrom(e: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val lcbv = pqLloydCodebookVecs(e)
    val dec = pqDecomposed(e).select($"vec_id", $"sub", $"sv")
    val tcodes = nearestCodeIn(dec, lcbv)
    val lut = dec.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"sub", $"sv".as("qv"))
      .join(broadcast(lcbv), "sub")
      .select($"q_id", $"sub".as("l_sub"), $"code".as("l_code"),
        graft.functions.VectorOps.dot($"qv", $"cv")
          .cast("decimal(27,10)").as("part"))
    val scored = tcodes
      .join(broadcast(lut),
        $"sub" === $"l_sub" && $"code" === $"l_code" && $"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id")
      .agg(round(sum($"part").cast("double"), 6).as("adc_score"))
    adcRank(scored, k)
  }

  /** PQ CODEBOOK SHIFT — the [[centroidShift]] discipline applied to PQ
    * training: per (subspace, code), the L2 displacement of the codebook
    * entry under one Lloyd step, with member counts before and after.
    * The convergence monitor a training loop watches (chain Lloyd steps
    * until the shift column goes quiet) and the drift alarm a deployment
    * re-checks after re-ingestion. d² composes the codegen dot kernel
    * (⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩, identical fp order on both engines),
    * clamped at 0 before the sqrt (a self-distance can land a hair
    * negative in fp). ≤128 output rows; both codebooks are bounded
    * aggregates — one exchange each. Seed entries that lose every
    * member under the Lloyd step (an emptied cell — exactly the event
    * a drift alarm must surface) are KEPT via a left join, reported
    * with n_after = 0 and a null l2_shift rather than silently
    * dropped. */
  def pqLloydShift(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    def assemble(df: DataFrame, vecName: String, nName: String): DataFrame =
      df.groupBy($"sub", $"code")
        .agg(
          transform(array_sort(collect_list(struct($"pos", $"mean_comp"))),
            x => x.getField("mean_comp")).as(vecName),
          max($"n_vecs").as(nName))
    val before = assemble(pqCodebooksFrom(e), "v0", "n0")
    val after = assemble(pqLloydCodebooksFrom(e), "v1", "n1")
    import graft.functions.VectorOps.dot
    before.join(after, Seq("sub", "code"), "left")
      .select($"sub", $"code",
        when($"v1".isNotNull,
          round(sqrt(greatest(
            dot($"v0", $"v0") - lit(2.0) * dot($"v0", $"v1") + dot($"v1", $"v1"),
            lit(0.0))), 6)).as("l2_shift"),
        $"n0".as("n_before"), coalesce($"n1", lit(0L)).as("n_after"))
  }

  /** TRAINED-PQ RECALL REPORT — seed-codebook flat ADC ([[pqAdcTopK]])
    * and trained-codebook ADC ([[adcTrainedTopK]]) overlapped against
    * the exact brute-force top-k, side by side per query: the marginal
    * retrieval value of one Lloyd refinement step, measured in the
    * engine. (Training minimizes reconstruction SSE — guaranteed
    * monotone, asserted in DedupSimilaritySpec; recall is the
    * downstream symptom this report watches, not a quantity with a
    * monotonicity guarantee.) */
  def pqTrainedRecall(s: SparkSession, dir: String,
                      nQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val exact = bruteForceTopKAggFrom(e, nQueries, k).select($"q_id", $"vec_id")
    val seed = pqAdcTopK(s, dir, nQueries, k)
      .select($"q_id".as("sq"), $"vec_id".as("sv_id"))
    val trained = adcTrainedTopKFrom(e, nQueries, k)
      .select($"q_id".as("tq"), $"vec_id".as("tv"))
    exact
      .join(seed, $"q_id" === $"sq" && $"vec_id" === $"sv_id", "left")
      .join(trained, $"q_id" === $"tq" && $"vec_id" === $"tv", "left")
      .groupBy($"q_id")
      .agg(
        count(lit(1)).as("n_exact"),
        count($"sv_id").as("seed_overlap"),
        round(count($"sv_id").cast("double") / count(lit(1)), 6)
          .as("seed_recall_at_k"),
        count($"tv").as("trained_overlap"),
        round(count($"tv").cast("double") / count(lit(1)), 6)
          .as("trained_recall_at_k"))
  }

  /** Per-dimension SQ8 affine grid over a corpus: one row,
    * (mnl, scl) — 64 mins and 64 scales (range/255), position-sorted.
    * A bounded aggregate whatever the corpus size — always
    * broadcast-sized (two 64-double arrays). */
  private def sq8Stats(e: DataFrame): DataFrame =
    e.select(posexplode($"v").as(Seq("pos", "comp")))
      .groupBy($"pos")
      .agg(min($"comp").as("mn"), max($"comp").as("mx"))
      .select($"pos", $"mn", (($"mx" - $"mn") / lit(255.0)).as("sc"))
      .agg(
        transform(array_sort(collect_list(struct($"pos", $"mn"))),
          x => x.getField("mn")).as("mnl"),
        transform(array_sort(collect_list(struct($"pos", $"sc"))),
          x => x.getField("sc")).as("scl"))

  /** SQ8 TOP-K — SCALAR quantization retrieval, the other half of the
    * quantization family next to PQ/IVFPQ/IVFADC: each dimension gets
    * an independent affine int8 grid (min..max in 255 steps), a vector
    * compresses to 64 uint8 codes (512 B → 64 B), and retrieval scores
    * the query against the DECODED grid points. SQ8 is what production
    * vector stores use when recall must stay near-exact and 8× memory
    * is enough (PQ's 128× collapse costs more recall); it also has no
    * codebook to train or drift — the per-dimension (min, scale) pair
    * is the entire model, re-derivable in one bounded aggregate.
    *
    * Shape at 100 TB: the (mn, scale) grid is a single broadcast row
    * (two 64-double arrays — no join key at all); encode+decode is ONE
    * codegen scan (`transform` with the broadcast arrays — clamp,
    * floor-to-grid, reproject); scoring distributes exactly like
    * [[bruteForceTopK]] (broadcast queries × corpus scan, two-phase
    * rank) but over 64 B codes instead of 512 B doubles — the scan the
    * stored code table serves while the embedding column stays cold.
    * (On this test corpus the codes derive inline from the embedding
    * scan, like [[pqAdcTopK]]'s leaf — a deployment swaps in the code
    * table and nothing downstream changes. The inner-product form
    * Σ qᵢ·(mnᵢ + cᵢ·scᵢ) also splits as ⟨q,mn⟩ + Σ (qᵢscᵢ)·cᵢ — a
    * per-query constant plus an integer-weighted sum, the SIMD kernel
    * a columnar scanner runs; the decode-then-dot here is the same
    * arithmetic composed to be engine-identical, ULP for ULP.)
    * Grid arithmetic: floor(x + 0.5) not round() (HALF_UP vs half-even
    * never enters), degenerate dimensions (max == min → scale 0) decode
    * to the min, clamp to [0, 255] bounds out-of-grid queries — all the
    * same IEEE ops on both engines. */
  def sq8TopK(s: SparkSession, dir: String,
              nQueries: Int = 5, k: Int = 10): DataFrame =
    sq8TopKFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k)

  /** Core of [[sq8TopK]] over any (vec_id, v) frame. */
  def sq8TopKFrom(e: DataFrame, nQueries: Int, k: Int): DataFrame = {
    import graft.functions.VectorOps.dot
    val dec = e.crossJoin(broadcast(sq8Stats(e)))
      .select($"vec_id", transform($"v", (x, i) => {
        val mn = element_at($"mnl", i + 1)
        val sc = element_at($"scl", i + 1)
        when(sc === 0.0, mn).otherwise(
          mn + least(lit(255.0), greatest(lit(0.0),
            floor((x - mn) / sc + lit(0.5)))) * sc)
      }).as("dv"))
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"))
    val scored = dec.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(dot($"q_v", $"dv"), 6).as("adc_score"))
    adcRank(scored, k).withColumnRenamed("adc_score", "sq8_score")
  }

  /** SQ8 RECALL REPORT — [[sq8TopK]] overlapped against the exact
    * brute-force inner-product top-k per query: the recall the 8×
    * compression actually costs on this corpus (the [[pqRecall]]
    * discipline; SQ8's per-dimension grid typically sits far above
    * PQ's subspace codebooks, and the report is where that claim gets
    * measured instead of assumed). Exact side ranks by the same
    * rounded inner product so the comparison isolates quantization,
    * not metric choice. */
  def sq8Recall(s: SparkSession, dir: String,
                nQueries: Int = 5, k: Int = 10): DataFrame = {
    import graft.functions.VectorOps.dot
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"))
    val exactScored = e.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        round(dot($"q_v", $"v"), 6).as("adc_score"))
    val exact = adcRank(exactScored, k).select($"q_id", $"vec_id")
    val sq = sq8TopKFrom(e, nQueries, k)
      .select($"q_id".as("sq"), $"vec_id".as("sv_id"))
    exact
      .join(sq, $"q_id" === $"sq" && $"vec_id" === $"sv_id", "left")
      .groupBy($"q_id")
      .agg(
        count(lit(1)).as("n_exact"),
        count($"sv_id").as("sq8_overlap"),
        round(count($"sv_id").cast("double") / count(lit(1)), 6)
          .as("sq8_recall_at_k"))
  }

  /** Per-dimension midrange thresholds as one broadcast row (thl: 64
    * position-sorted doubles). Midrange — mn + (mx−mn)/2 — instead of
    * the mean: min/max are EXACT under any partial-agg order (the
    * [[sq8TopK]] grid discipline), so the threshold never depends on
    * double-sum ordering; a mean would need a DECIMAL detour for the
    * same engine-stability. */
  private def bqThresholds(e: DataFrame): DataFrame =
    e.select(posexplode($"v").as(Seq("pos", "comp")))
      .groupBy($"pos")
      .agg(min($"comp").as("mn"), max($"comp").as("mx"))
      .select($"pos", ($"mn" + ($"mx" - $"mn") / lit(2.0)).as("th"))
      .agg(transform(array_sort(collect_list(struct($"pos", $"th"))),
        x => x.getField("th")).as("thl"))

  /** BINARY QUANTIZATION RECALL — 1-bit-per-dimension sign quantization
    * (Charikar, STOC'02's SimHash applied to retrieval — the "BQ" mode
    * modern vector stores ship for 32× memory collapse): each dimension
    * keeps only WHICH SIDE of its midrange the component falls on, a
    * 64-dim vector packs into two 32-bit words, candidate generation is
    * a HAMMING-distance scan over 16 B codes, and the top-`shortlist`
    * Hamming candidates are re-ranked by the exact inner product before
    * the final top-k. Reported: per query, the overlap of that pipeline
    * against the exact top-k — the recall the 32× collapse costs, next
    * to [[sq8Recall]] (8×) and [[pqRecall]] (128×), completing the
    * compression-vs-recall ladder a deployment picks from.
    *
    * Shape at 100 TB: thresholds are ONE broadcast row (64 doubles —
    * derived from order-free min/max); encoding is one codegen scan
    * (64 comparisons folding into two integer words — no shuffle); the
    * Hamming scan distributes exactly like [[bruteForceTopK]] but reads
    * 16 B/vector instead of 512 B — the binary sidecar column a code
    * table serves while embeddings stay cold; XOR+POPCNT is inside
    * whole-stage codegen (Spark's bit_count intrinsic). Shortlist and
    * final rank both run the proven two-phase window. Determinism:
    * bits are exact comparisons against an engine-identical threshold,
    * Hamming is integer, tie-breaks are (distance, vec_id) total
    * orders, and the re-rank rounds the dot to 6 — both engines walk
    * the identical shortlist. */
  def bqRecall(s: SparkSession, dir: String, nQueries: Int = 5,
               k: Int = 10, shortlist: Int = 50): DataFrame =
    bqRecallFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k, shortlist)

  /** (vec_id, v, lo, hi): the corpus with its two packed 32-bit sign
    * words — the shared encode of [[bqRecall]] and [[ivfBqTopK]]. The
    * 1-row threshold frame is localCheckpoint'd: the code frame is
    * consumed by both the corpus and the query side, and an
    * un-materialized threshold subtree would inline its full
    * posexplode scan into each. */
  private def bqCodes(e: DataFrame): DataFrame = {
    def packBits(off: Int): Column =
      (0 until 32).map { i =>
        when(element_at($"v", off + i + 1) >= element_at($"thl", off + i + 1),
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    e.crossJoin(broadcast(bqThresholds(e).localCheckpoint(true)))
      .select($"vec_id", $"v", packBits(0).as("lo"), packBits(32).as("hi"))
  }

  /** Core of [[bqRecall]] over any (vec_id, v) frame. */
  def bqRecallFrom(e: DataFrame, nQueries: Int, k: Int,
                   shortlist: Int): DataFrame = {
    require(nQueries >= 1 && k >= 1 && shortlist >= k,
      s"need nQueries >= 1, k >= 1, shortlist >= k")
    val bits = bqCodes(e)
    val q = bits.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"),
        $"lo".as("qlo"), $"hi".as("qhi"))
    val ham = bits.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", $"q_v", $"v",
        (bit_count($"lo".bitwiseXOR($"qlo"))
          + bit_count($"hi".bitwiseXOR($"qhi"))).cast("long").as("hamming"))
    // two-phase ASCENDING shortlist rank (the adcRank shape, inverted)
    val bucketed = ham.withColumn("bkt", pmod(hash($"vec_id"), lit(8)))
    val wLocal = Window.partitionBy($"q_id", $"bkt")
      .orderBy($"hamming".asc, $"vec_id".asc)
    val wFinal = Window.partitionBy($"q_id")
      .orderBy($"hamming".asc, $"vec_id".asc)
    val shortd = bucketed
      .withColumn("rl", row_number().over(wLocal)).filter($"rl" <= shortlist)
      .withColumn("rn", row_number().over(wFinal)).filter($"rn" <= shortlist)
    val reranked = adcRank(
      shortd.select($"q_id", $"vec_id",
        round(dot($"q_v", $"v"), 6).as("adc_score")), k)
      .select($"q_id".as("bq"), $"vec_id".as("bv_id"))
    val qv = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"))
    val exact = adcRank(
      e.join(broadcast(qv), $"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id",
          round(dot($"q_v", $"v"), 6).as("adc_score")), k)
      .select($"q_id", $"vec_id")
    exact
      .join(reranked, $"q_id" === $"bq" && $"vec_id" === $"bv_id", "left")
      .groupBy($"q_id")
      .agg(
        count(lit(1)).as("n_exact"),
        count($"bv_id").as("bq_overlap"),
        round(count($"bv_id").cast("double") / count(lit(1)), 6)
          .as("bq_recall_at_k"))
  }

  /** IVF-BQ TOP-K — the binary-sidecar retrieval shape AT SCALE:
    * [[ivfTopK]]'s SRP coarse-bucket pruning composed with
    * [[bqRecall]]'s Hamming-scan-then-exact-rerank, so the 16 B/vector
    * binary scan touches ONLY the probed coarse buckets instead of the
    * whole corpus — the flat-BQ docstring's full-scan reservation is
    * exactly what this removes, the same way [[ivfPqTopK]] removes
    * flat ADC's. At 100 TB the stored artifact is the (bucket, lo, hi)
    * code table partitioned by coarse bucket: the probe join becomes
    * partition pruning, each query reads |probes|/2^nBits of a table
    * that is itself 32× smaller than the embeddings, and the raw
    * vector column is fetched only for the ≤`shortlist` re-rank rows.
    *
    * Shape: threshold row broadcast (order-free min/max midranges),
    * probe set and query codes broadcast against the one pruned code
    * scan, XOR+POPCNT inside whole-stage codegen, two-phase ASC
    * shortlist rank, exact-dot re-rank over ≤shortlist rows/query under
    * the proven rank spec. Candidate semantics compose both prunings:
    * vectors outside probed buckets are by-design unseen (the
    * [[ivfTopK]] contract), and within buckets the Hamming shortlist
    * bounds the exact work (the [[bqRecall]] contract). */
  def ivfBqTopK(s: SparkSession, dir: String, nQueries: Int = 5,
                k: Int = 10, nBits: Int = 8, probeHamming: Int = 1,
                shortlist: Int = 50): DataFrame =
    ivfBqTopKFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k, nBits, probeHamming, shortlist)

  /** Core of [[ivfBqTopK]] over any (vec_id, v) frame. */
  def ivfBqTopKFrom(e: DataFrame, nQueries: Int, k: Int, nBits: Int,
                    probeHamming: Int, shortlist: Int): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= nBits,
      s"probeHamming must be in [0, $nBits], got $probeHamming")
    require(nQueries >= 1 && k >= 1 && shortlist >= k,
      s"need nQueries >= 1, k >= 1, shortlist >= k")
    val codes = bqCodes(e).withColumn("bucket", srpSignature($"v", nBits))
    val probes = probeMasks(nBits, probeHamming).map {
      case 0L => $"bucket"
      case m => $"bucket".bitwiseXOR(lit(m))
    }
    val q = codes.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"),
        $"lo".as("qlo"), $"hi".as("qhi"),
        explode(array(probes: _*)).as("q_bucket"))
    val ham = codes
      .join(broadcast(q), $"bucket" === $"q_bucket" && $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", $"q_v", $"v",
        (bit_count($"lo".bitwiseXOR($"qlo"))
          + bit_count($"hi".bitwiseXOR($"qhi"))).cast("long").as("hamming"))
    val bucketed = ham.withColumn("bkt", pmod(hash($"vec_id"), lit(8)))
    val wLocal = Window.partitionBy($"q_id", $"bkt")
      .orderBy($"hamming".asc, $"vec_id".asc)
    val wFinal = Window.partitionBy($"q_id")
      .orderBy($"hamming".asc, $"vec_id".asc)
    val shortd = bucketed
      .withColumn("rl", row_number().over(wLocal)).filter($"rl" <= shortlist)
      .withColumn("rn", row_number().over(wFinal)).filter($"rn" <= shortlist)
    adcRank(shortd.select($"q_id", $"vec_id",
        round(dot($"q_v", $"v"), 6).as("adc_score")), k)
      .withColumnRenamed("adc_score", "bq_score")
  }

  /** MATRYOSHKA PREFIX-DIMENSION RECALL — rank by the inner product of
    * PREFIX SLICES of the embedding (dims 16 / 32 / 64) and report each
    * prefix's top-k overlap against the full-dimension exact top-k: the
    * adaptive-retrieval audit Matryoshka Representation Learning
    * (Kusupati et al., NeurIPS'22) is built around — if the 16-dim
    * prefix already recalls ~1.0, the first-stage scan can read a
    * quarter of the bytes and the full vector only re-ranks. The
    * full-dim row doubles as the harness's own sanity anchor: its
    * recall is 1.0 by construction, pinning that the slice machinery
    * and the exact side rank identically.
    *
    * Shape at 100 TB: one broadcast query set × corpus scan PER PREFIX
    * (each reading only its prefix bytes — with the embedding stored
    * dimension-chunked, shorter prefixes scan proportionally less), the
    * proven two-phase rank, and a per-(query, dim) bounded aggregate.
    * Slices and dots are sequential-fold kernels — engine-identical —
    * and scores round to 6 before the (score desc, vec_id) total-order
    * rank. */
  def matryoshkaRecall(s: SparkSession, dir: String, nQueries: Int = 5,
                       k: Int = 10, dims: Seq[Int] = Seq(16, 32, 64)): DataFrame =
    matryoshkaRecallFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nQueries, k, dims)

  /** Core of [[matryoshkaRecall]] over any (vec_id, v) frame. */
  def matryoshkaRecallFrom(e: DataFrame, nQueries: Int, k: Int,
                           dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty && dims.forall(d => d >= 1 && d <= 64),
      s"dims must be within [1, 64], got $dims")
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"))
    val joined = e.join(broadcast(q), $"vec_id" =!= $"q_id")
    val exact = adcRank(
      joined.select($"q_id", $"vec_id",
        round(dot($"q_v", $"v"), 6).as("adc_score")), k)
      .select($"q_id", $"vec_id")
    dims.map { d =>
      val pref = adcRank(
        joined.select($"q_id", $"vec_id",
          round(dot(slice($"q_v", 1, d), slice($"v", 1, d)), 6)
            .as("adc_score")), k)
        .select($"q_id".as("pq"), $"vec_id".as("pv_id"))
      exact
        .join(pref, $"q_id" === $"pq" && $"vec_id" === $"pv_id", "left")
        .groupBy($"q_id")
        .agg(
          count(lit(1)).as("n_exact"),
          count($"pv_id").as("prefix_overlap"),
          round(count($"pv_id").cast("double") / count(lit(1)), 6)
            .as("prefix_recall_at_k"))
        .select($"q_id", lit(d.toLong).as("dim"), $"n_exact",
          $"prefix_overlap", $"prefix_recall_at_k")
    }.reduce(_ unionAll _)
  }

  /** OPQ-LITE: VARIANCE-BALANCED SUBSPACE ASSIGNMENT — the cheap half of
    * Optimized Product Quantization (Ge et al., CVPR'13: allocate
    * dimensions to subspaces so variance is balanced; the full method
    * learns a rotation, the structured variant just PERMUTES): rank the
    * 64 dimensions by corpus variance, deal them round-robin into the 8
    * subspaces, and quantize the PERMUTED subvectors through the same PQ
    * kernel. Natural contiguous slicing can trap all the high-variance
    * dimensions in one subspace, whose 4-bit alphabet then carries most
    * of the corpus's energy while other codebooks encode noise; the
    * balanced deal equalizes per-subspace energy so every codebook bit
    * works. Output: one row per subspace — its assigned-dimension count,
    * summed variance (the balance audit) and reconstruction MSE under
    * the balanced layout, next to [[pqReconError]]'s natural-layout MSE.
    *
    * Shape at 100 TB: the variance pass is one partial-agged exchange on
    * the 64 positions (sums + squares in DECIMAL — order-free); the
    * 64-row dimension→(sub, spos) map is BROADCAST back against the
    * component stream, so the permutation costs a map-side join, not a
    * shuffle; the rest is the standard PQ codebook/recon shape. The
    * permutation is derived IN-PLAN (rank window over 64 rows) — no
    * driver collect, and the DuckDB twin derives the identical map from
    * the identical rounded variances. */
  def pqBalanced(s: SparkSession, dir: String): DataFrame =
    pqBalancedFrom(Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")))

  /** Core of [[pqBalanced]] over any (vec_id, v) frame. */
  def pqBalancedFrom(e: DataFrame): DataFrame = {
    val comp = e.select($"vec_id", posexplode($"v").as(Seq("pos", "comp")))
      .withColumn("pos", $"pos".cast("long"))
    val st = comp.groupBy($"pos").agg(
      count(lit(1)).as("n"),
      sum($"comp".cast("decimal(27,10)")).as("s"),
      sum(($"comp" * $"comp").cast("decimal(27,10)")).as("ss"))
    val vt = st.select($"pos",
      round(($"ss".cast("double") - $"s".cast("double") * $"s".cast("double")
        / $"n") / $"n", 6).as("v_pos"))
    // 64-row frame: the single-partition rank window is bounded by the
    // DIMENSIONALITY, never the corpus
    val w = Window.partitionBy(lit(0)).orderBy($"v_pos".desc, $"pos".asc)
    val m = vt.withColumn("rn", row_number().over(w))
      .select($"pos", $"v_pos",
        expr("CAST((rn - 1) % 8 AS BIGINT)").as("sub"),
        expr("CAST((rn - 1) div 8 AS BIGINT)").as("spos"))
    val bsv = comp
      .join(broadcast(m.select($"pos", $"sub", $"spos")), Seq("pos"))
      .groupBy($"vec_id", $"sub")
      .agg(transform(array_sort(collect_list(struct($"spos", $"comp"))),
        x => x.getField("comp")).as("sv"))
    val codeExpr = (0 until PqSubspaces).foldLeft(lit(null).cast("long")) {
      (acc, j) =>
        when($"sub" === j,
          srpSignatureSlice($"sv", j * PqBitsPerCode, PqBitsPerCode)).otherwise(acc)
    }
    val bx = bsv.withColumn("code", codeExpr)
      .select($"sub", $"code", posexplode($"sv").as(Seq("spos", "comp")))
      .withColumn("spos", $"spos".cast("long"))
    val bcb = bx.groupBy($"sub", $"code", $"spos")
      .agg(sum($"comp".cast("decimal(27,10)")).as("cs"), count(lit(1)).as("cn"))
      .select($"sub", $"code", $"spos",
        round($"cs".cast("double") / $"cn", 6).as("mean_comp"))
    val sse = bx.join(broadcast(bcb), Seq("sub", "code", "spos"))
      .select($"sub",
        (($"comp" - $"mean_comp") * ($"comp" - $"mean_comp"))
          .cast("decimal(27,10)").as("sq"))
      .groupBy($"sub")
      .agg(round(sum($"sq").cast("double") / count(lit(1)), 6).as("mse"),
        count(lit(1)).as("n_comps"))
    m.groupBy($"sub")
      .agg(round(sum($"v_pos".cast("decimal(27,10)")).cast("double"), 6)
        .as("var_sum"), count(lit(1)).as("n_dims"))
      .join(sse, Seq("sub"))
      .select($"sub", $"n_dims", $"var_sum", $"mse", $"n_comps")
  }

  /** K-CENTER GREEDY CORESET SEEDS — Gonzalez (1985) farthest-point
    * traversal: start from the minimum vec_id, then repeatedly select
    * the point FARTHEST from its nearest already-selected seed. The
    * classic 2-approximation for the k-center objective, and the
    * deterministic workhorse behind coreset / diversity selection in
    * training-data curation (pick k maximally-spread exemplars) — the
    * derandomized sibling of k-means++ seeding (argmax instead of a D²
    * sample), usable directly as [[kmeansCentroidsFrom]] seeds.
    *
    * Shape (the [[graft.operators.Graph.pageRankConverged]] driver-loop
    * discipline): k−1 rounds, each ENTIRELY map-side — the one new seed
    * vector is baked into the plan as a LITERAL array (no join, no
    * shuffle), each point's nearest-seed distance is maintained
    * incrementally via least(dmin, d²(v, seed)), and the argmax is a
    * TakeOrderedAndProject (one reduce of a single row to the driver —
    * k driver rows total, never the corpus). State is localCheckpoint'ed
    * per round so round r's plan never re-derives rounds 1..r−1. At
    * 100 TB this is k bounded scans of the embedding table.
    *
    * Determinism: d² is the sequential-fold HOF (bit-identical to
    * DuckDB's list_sum/list_transform kernels, the [[VectorOps]]
    * contract); ties break on vec_id asc. The twin unrolls the k rounds
    * as MATERIALIZED CTEs (the graph_kcore discipline — each round is
    * referenced twice, so inlining would double the chain per round). */
  def kcenterSeeds(s: SparkSession, dir: String, k: Int = 8): DataFrame =
    kcenterSeedsFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")), k)

  /** Core of [[kcenterSeeds]] over any (vec_id, v) frame. */
  def kcenterSeedsFrom(e: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val sp = e.sparkSession
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val first = e.orderBy($"vec_id".asc).limit(1).collect().head
    var selected = Vector[Row](Row(1L, first.getLong(0), null))
    var seedVec: Seq[Double] = first.getSeq[Double](1)
    var state = e.select($"vec_id", $"v", d2($"v", typedLit(seedVec)).as("dmin"))
      .localCheckpoint(true)
    for (i <- 2 to k) {
      val sel = state.orderBy($"dmin".desc, $"vec_id".asc).limit(1).collect().head
      selected :+= Row(i.toLong, sel.getLong(0), sel.getDouble(2))
      seedVec = sel.getSeq[Double](1)
      if (i < k)
        state = state
          .withColumn("dmin", least($"dmin", d2($"v", typedLit(seedVec))))
          .localCheckpoint(true)
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("rk", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("sel_d2", DoubleType, nullable = true)))
    sp.createDataFrame(sp.sparkContext.parallelize(selected, 1), schema)
      .select($"rk", $"vec_id", round($"sel_d2", 6).as("sel_d2"))
  }

  /** K-MEANS‖ OVERSAMPLING SEEDS — scalable k-means++ initialization
    * (Bahmani, Moseley, Vattani, Kumar & Vassilvitskii, "Scalable
    * k-means++", VLDB 2012): instead of k-means++'s k inherently
    * sequential D²-weighted draws (k corpus scans that cannot batch),
    * k-means‖ runs a FIXED handful of rounds, each sampling every point
    * INDEPENDENTLY with probability min(1, ℓ·d²(x,C)/φ) — expected ℓ
    * new centers per round, so ~ℓ·rounds oversampled seeds land in a
    * handful of scans and a weighted Lloyd pass ([[pqLloydRefine]]'s
    * family) reduces them to k afterwards. This is THE distributed
    * k-means init — the paper's setting is exactly a 10⁹-point corpus
    * where [[kcenterSeedsFrom]]'s k sequential rounds and k-means++'s
    * k dependent draws are both too slow.
    *
    * Shape per round (nothing touches the driver but the expected-ℓ
    * selected centers — the [[kcenterSeedsFrom]] driver-policy
    * contract, ℓ rows instead of 1): one DECIMAL aggregate for
    * φ = Σ d² (order-free — the round-8 d² casts to DECIMAL(38,12)
    * before summing), one filtered corpus scan for the Bernoulli
    * selections, one map-side dmin update against the ≤ℓ new centers
    * baked in as LITERALS (no join, no shuffle — the k-center
    * discipline), then localCheckpoint. At 100 TB: 2·rounds bounded
    * scans of the embedding table.
    *
    * Determinism: the Bernoulli coin is the engine-neutral
    * hash60(vec_id ⧺ '#kpp#' ⧺ round) % 10⁶ / 10⁶ fraction compared
    * against ℓ·d²₈/φ with the same left-to-right double ops in both
    * engines (d²₈ = round(d², 8) is what both φ and the compare read);
    * d² itself is the sequential-fold HOF of the [[VectorOps]]
    * contract. The twin unrolls the rounds as MATERIALIZED CTEs.
    * Output: (sel_round, vec_id, sel_d2) — round 0 is the min-id start
    * center with NULL d². */
  def kmeansParallelSeeds(s: SparkSession, dir: String, l: Int = 8,
                          rounds: Int = 3): DataFrame =
    kmeansParallelFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      l, rounds)

  /** Core of [[kmeansParallelSeeds]] over any (vec_id, v) frame. */
  def kmeansParallelFrom(e0: DataFrame, l: Int, rounds: Int): DataFrame = {
    require(l >= 1 && rounds >= 1 && rounds <= 8,
      s"need l >= 1 and rounds in [1,8], got l=$l rounds=$rounds")
    val sp = e0.sparkSession
    val e = e0.localCheckpoint(true)
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val first = e.orderBy($"vec_id".asc).limit(1).collect().head
    var out = Vector[Row](Row(0L, first.getLong(0), null))
    var state = e
      .select($"vec_id", $"v",
        d2($"v", typedLit(first.getSeq[Double](1))).as("dmin"))
      .localCheckpoint(true)
    for (r <- 1 to rounds) {
      val sd = round($"dmin", 8)
      val phi = state
        .agg(sum(sd.cast("decimal(38,12)")).cast("double").as("phi"))
        .collect().head.getDouble(0)
      val coin = (graft.functions.EngineNeutral.hash60(
        concat($"vec_id".cast("string"), lit(s"#kpp#$r"))) % 1000000L)
        .cast("double") / lit(1000000.0)
      val sel = state
        .filter(coin < lit(l.toDouble) * sd / lit(phi))
        .select($"vec_id", $"v", sd.as("sd"))
        .collect().sortBy(_.getLong(0))
      out ++= sel.map(row => Row(r.toLong, row.getLong(0), row.getDouble(2)))
      if (r < rounds && sel.nonEmpty) {
        val newDs = sel.map(row => d2($"v", typedLit(row.getSeq[Double](1))))
        state = state
          .withColumn("dmin", ($"dmin" +: newDs).reduce(least(_, _)))
          .localCheckpoint(true)
      }
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("sel_round", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("sel_d2", DoubleType, nullable = true)))
    sp.createDataFrame(sp.sparkContext.parallelize(out, 1), schema)
      .select($"sel_round", $"vec_id", round($"sel_d2", 6).as("sel_d2"))
  }

  /** GRAPH-BASED ANN — beam search over the exact kNN graph: the fourth
    * retrieval paradigm of this family, next to LSH banding
    * ([[srpNearDupPairs]]), IVF ([[ivfTopK]]) and PQ ([[pqAdcTopK]]) —
    * the NSW/HNSW idea (Malkov & Yashunin, TPAMI 42(4), 2020) reduced
    * to its layer-0 semantics: greedy best-first expansion of a beam
    * through the neighborhood graph, where each hop scores the current
    * beam's out-neighbors against the query and keeps the top `beam`.
    * Graph ANN is what wins when vectors resist coarse partitioning
    * (IVF) and quantization (PQ) — connectivity adapts to the data's
    * local geometry instead of imposing a grid on it.
    *
    * Determinism: every candidate set is a pure function of the graph
    * (beam ∪ out-neighbors, DISTINCT), scores are round-4 cosines
    * ranked under the (cos desc, vec_id asc) total order — both
    * engines walk identical beams, so the twin is a hash match, not a
    * recall bound (recall itself is priced in DedupSimilaritySpec
    * against brute force). Entry set is the deterministic `vec_id %
    * entryMod` coin; hops are a FIXED unroll with checkpointed beams
    * (the [[graft.operators.Graph.pageRank]] discipline).
    *
    * Scale shape: the index build is [[knnGraphFrom]] (quadratic by
    * contract here — at deployment scale the graph is
    * [[graphAnnDescentTopK]]'s NN-descent build or the persisted
    * artifact); each hop is one equi-join of the (nQ·beam)-row frontier
    * against the k-out-degree graph plus one broadcast-query scoring
    * pass — candidate volume is nQ·beam·(k+1) per hop whatever the
    * corpus. Entry seeding is CAPPED at `maxEntries` (smallest ids of
    * the deterministic vec_id % entryMod coin — a TakeOrdered over the
    * coin's survivors), so the entry scoring is O(nQ·maxEntries)
    * whatever the corpus — at 10⁹ vectors the cap, not |V|/entryMod,
    * is the term; the 100 TB form can also swap in a coarse-centroid
    * probe (the [[ivfTopK]] quantizer) or an HNSW layer ladder — the
    * beam machinery is unchanged. */
  def graphAnnTopK(s: SparkSession, dir: String, nQueries: Int = 5,
                   k: Int = 10, beam: Int = 16, hops: Int = 4,
                   entryMod: Int = 16, knnK: Int = 8,
                   maxEntries: Int = 64): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val g = knnGraphFrom(e, knnK, 8)
      .select($"src_id", $"nbr_id").localCheckpoint(true)
    beamSearchTopK(e, g, nQueries, k, beam, hops, entryMod, maxEntries)
  }

  /** GRAPH-ANN OVER THE NN-DESCENT GRAPH — [[graphAnnTopK]]'s beam
    * search composed with [[knnDescentFrom]]'s sub-quadratic index
    * build: the END-TO-END deployment-scale ANN story, nothing
    * quadratic anywhere — O(N·(k+r)²)-per-round build, O(nQ·beam·k)
    * per-hop search. The descent graph is approximate, so beams walk a
    * slightly different neighborhood structure than the exact-graph
    * variant; recall against brute force is priced in
    * DedupSimilaritySpec for BOTH variants. Deterministic end to end —
    * the DuckDB twin chains the descent rounds and the beam hops and
    * hash-matches. */
  def graphAnnDescentTopK(s: SparkSession, dir: String, nQueries: Int = 5,
                          k: Int = 10, beam: Int = 16, hops: Int = 4,
                          entryMod: Int = 16, knnK: Int = 8,
                          maxEntries: Int = 64): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val g = knnDescentFrom(e, knnK, iters = 3, nInitBuckets = 16, revCap = 5)
      .select($"src_id", $"nbr_id").localCheckpoint(true)
    beamSearchTopK(e, g, nQueries, k, beam, hops, entryMod, maxEntries)
  }

  /** Shared beam-search core of the two graph-ANN variants: greedy
    * best-first expansion of a `beam`-wide frontier through the given
    * (src_id, nbr_id) neighborhood graph, `hops` fixed unrolled rounds
    * with checkpointed beams. */
  private def beamSearchTopK(e: DataFrame, g: DataFrame, nQueries: Int,
                             k: Int, beam: Int, hops: Int, entryMod: Int,
                             maxEntries: Int): DataFrame = {
    require(k >= 1 && beam >= k && hops >= 1 && hops <= 6 && entryMod >= 2
      && maxEntries >= 1,
      s"need 1 <= k <= beam, hops in [1,6], entryMod >= 2, maxEntries >= 1")
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"))
    def score(cand: DataFrame): DataFrame =
      cand.join(e, "vec_id").join(broadcast(q), "q_id")
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id", round(cosine($"q_v", $"v"), 4).as("cos_sim"))
    def rank(scored: DataFrame, n: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
      scored.withColumn("rn", row_number().over(w)).filter($"rn" <= n)
        .select($"q_id", $"vec_id", $"cos_sim")
    }
    val entries = e.filter($"vec_id" % entryMod === 0).select($"vec_id")
      .orderBy($"vec_id").limit(maxEntries)
    var beamDf = rank(score(q.select($"q_id").crossJoin(entries)), beam)
      .localCheckpoint(true)
    for (_ <- 1 to hops) {
      val cand = beamDf.select($"q_id", $"vec_id".as("src_id"))
        .join(g, "src_id").select($"q_id", $"nbr_id".as("vec_id"))
        .unionByName(beamDf.select($"q_id", $"vec_id"))
        .distinct()
      beamDf = rank(score(cand), beam).localCheckpoint(true)
    }
    rank(beamDf, k)
  }

  /** HUBNESS AUDIT — the k-occurrence distribution of the kNN graph:
    * for each vector, how many OTHER vectors list it among their k
    * nearest (in-degree of [[knnGraphFrom]]), histogrammed. Hubness is
    * THE high-dimensional ANN pathology (Radovanović, Nanopoulos &
    * Ivanović, JMLR 11, 2010): as dimension grows, a few points become
    * hubs appearing in a large fraction of kNN lists while antihubs
    * (k-occurrence 0) are never retrieved at all — which silently
    * biases every kNN-derived artifact this family builds (near-dup
    * graphs over-connect through hubs, graph-ANN beams collapse onto
    * them, SemDeDup survivor picks skew toward them). A fat right tail
    * plus a big zero bucket in this histogram is the signal to
    * re-normalize, whiten ([[pcaPower]]) or switch to a
    * hubness-corrected similarity before trusting downstream results.
    *
    * Shape: the kNN build (quadratic by contract here, NN-descent at
    * deployment scale) then ONE partial-agged in-degree count and ONE
    * histogram aggregate — O(max k-occurrence) output rows. The zero
    * bucket is made explicit by LEFT-joining the corpus onto the
    * in-degree table: antihub mass is the finding, not a dropped row. */
  def hubnessAudit(s: SparkSession, dir: String, k: Int = 5,
                   nBlocks: Int = 8): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val indeg = knnGraphFrom(e, k, nBlocks)
      .groupBy($"nbr_id").agg(count(lit(1)).as("k_occ"))
    e.select($"vec_id").join(indeg, $"vec_id" === $"nbr_id", "left")
      .select(coalesce($"k_occ", lit(0L)).as("k_occurrence"))
      .groupBy($"k_occurrence").agg(count(lit(1)).as("n_vecs"))
  }

  /** HUBNESS AUDIT ON THE NN-DESCENT GRAPH — [[hubnessAudit]]'s
    * k-occurrence histogram rebased on [[knnDescentFrom]]'s
    * sub-quadratic index: the deployment-scale form of the audit, where
    * the exact block-join build ([[knnGraphFrom]]) is not runnable. The
    * two histograms answer slightly different questions — the exact one
    * audits the TRUE neighborhood structure, this one audits the graph
    * the deployment actually serves from ([[graphAnnDescentTopK]]'s
    * beam walks THIS graph, so hubs here are the hubs the beam
    * collapses onto) — which is why both are registered rather than
    * one replacing the other.
    *
    * Shape: the NN-descent rounds (O(N·(k+revCap)²) candidate pairs per
    * round, every step key-partitioned) then the same ONE in-degree
    * count + ONE histogram aggregate as [[hubnessAudit]]; the zero
    * bucket stays explicit via the corpus LEFT join. This composition
    * IS benchable at scale — it rides the bench headline set precisely
    * because nothing in it is quadratic. */
  def hubnessDescent(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val indeg = knnDescentFrom(e, k, iters = 3, nInitBuckets = 16, revCap = 5)
      .groupBy($"nbr_id").agg(count(lit(1)).as("k_occ"))
    e.select($"vec_id").join(indeg, $"vec_id" === $"nbr_id", "left")
      .select(coalesce($"k_occ", lit(0L)).as("k_occurrence"))
      .groupBy($"k_occurrence").agg(count(lit(1)).as("n_vecs"))
  }

  /** [[hubnessDescent]] over the SQ8-coded descent build — the narrow-
    * exchange production path (see [[knnDescentSq8]]: the exact build's
    * 100× record was width-bound at 134× for this op; the code-framed
    * rounds close it). Same in-degree histogram, same zero bucket. */
  def hubnessDescentSq8(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val indeg = knnDescentSq8From(e, k, iters = 3, nInitBuckets = 16, revCap = 5)
      .groupBy($"nbr_id").agg(count(lit(1)).as("k_occ"))
    e.select($"vec_id").join(indeg, $"vec_id" === $"nbr_id", "left")
      .select(coalesce($"k_occ", lit(0L)).as("k_occurrence"))
      .groupBy($"k_occurrence").agg(count(lit(1)).as("n_vecs"))
  }

  /** SILHOUETTE REPORT — per-cluster simplified silhouette (Rousseeuw,
    * J. Comput. Appl. Math. 20, 1987; centroid-based variant) over the
    * SRP coarse clustering the IVF/k-means family is built on: for each
    * vector, cohesion a = cosine distance to its OWN bucket's centroid,
    * separation b = min cosine distance to any OTHER centroid,
    * s = (b − a) / max(a, b) ∈ [−1, 1]. The clustering-quality gate a
    * pipeline reads before trusting bucket-local operations (IVF probe
    * widths, SemDeDup within-bucket dedup, per-bucket sampling): a
    * bucket with mean silhouette ≤ 0 is slicing through a natural
    * cluster — its members sit closer to a neighbor than to their own
    * center, so bucket-local dedup misses exactly the near-dups that
    * matter. The classic silhouette's all-pairs a/b is quadratic in
    * cluster size; the centroid variant is the scale form — one
    * broadcast centroid table, one corpus scan.
    *
    * Shape: centroids assembled from the decimal-exact
    * [[bucketCentroidsFrom]] means ([[centroidAssignFrom]]'s exact
    * frame), broadcast (O(2^nBits) rows); each vector scores against
    * all centroids in one codegen pass — the per-vector a/b reduce to
    * conditional MINs in ONE partial-agged aggregate. Distances derive
    * from round-4 cosines, a/b round to 6 before the silhouette
    * expression (engine-identical doubles), per-bucket means sum in
    * DECIMAL(38,12). Output: one row per bucket. */
  def silhouette(s: SparkSession, dir: String, nBits: Int = 8): DataFrame =
    silhouetteFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      nBits)

  /** Core of [[silhouette]] over any (vec_id, v) frame. */
  def silhouetteFrom(e: DataFrame, nBits: Int): DataFrame = {
    val cents = bucketCentroidsFrom(e, nBits)
      .groupBy($"bucket")
      .agg(transform(array_sort(collect_list(struct($"pos", $"mean_comp"))),
        x => x.getField("mean_comp")).as("cv"))
    val scored = e
      .withColumn("own", srpSignature($"v", nBits).cast("long"))
      .join(broadcast(cents))
      .withColumn("dist", lit(1.0) - round(cosine($"v", $"cv"), 4))
    val per = scored.groupBy($"vec_id", $"own")
      .agg(round(min(when($"bucket" === $"own", $"dist")), 6).as("a"),
        round(min(when($"bucket" =!= $"own", $"dist")), 6).as("b"))
      .select($"vec_id", $"own", $"a", $"b",
        round(when(greatest($"a", $"b") > 0,
          ($"b" - $"a") / greatest($"a", $"b")).otherwise(lit(0.0)), 6)
          .as("sil"))
    def meanDec(c: Column): Column =
      round(sum(c.cast("decimal(38,12)")).cast("double") / count(lit(1)), 6)
    per.groupBy($"own".as("bucket"))
      .agg(count(lit(1)).as("n_vecs"),
        meanDec($"sil").as("mean_silhouette"),
        meanDec($"a").as("mean_cohesion_dist"),
        meanDec($"b").as("mean_separation_dist"))
  }

  /** NN-DESCENT — the sub-quadratic kNN-graph build (Dong, Moses & Li,
    * WWW'11): start from an arbitrary k-neighbor guess and iterate
    * "a neighbor of my neighbor is probably my neighbor" — each round,
    * every vector rescores only the two-hop neighborhood of the current
    * graph and keeps the best k. This is the deployment-scale
    * counterpart of the exact [[knnGraphFrom]] block join: per round the
    * candidate volume is O(N·(k+r)²) pairs instead of O(N²), so the
    * 10⁹-vector graph that the exact build cannot touch (2.5B-pair tasks)
    * costs a few equi-join rounds of ~N·k² scored pairs. Everything the
    * kNN graph feeds ([[hubnessAudit]], [[graphAnnTopK]], SemDeDup
    * survivor picks) can run on this graph unchanged — it has the same
    * schema and a measured-recall contract (DedupSimilaritySpec prices
    * recall vs the exact graph).
    *
    * Determinism (the twin is a hash match, not a recall bound):
    *  - init is NN-descent's "random" graph under the engine-neutral
    *    coin — vectors bucketed by TWO independently seeded
    *    hash60(vec_id # seed) % nInitBuckets partitions, each vector
    *    scored against its mates under both seeds, top-k under the
    *    (cos desc, id asc) total order. Two partitions, not one: a
    *    single hash partition is CLOSED under neighbor-of-neighbor
    *    (every neighbor's neighbors are the same bucket), so descent
    *    could never leave its init component — measured recall froze
    *    at 0.06. The union of two independent partitions is an
    *    expander, so the two-hop candidate set mixes across the whole
    *    corpus and recall climbs round over round;
    *  - each round, reverse edges are capped at `revCap` per node
    *    (NN-descent's ρ·k reverse sample, made deterministic: best
    *    `revCap` in-edges by (cos desc, src asc)) so a hub's in-degree
    *    never explodes the two-hop fan-out — per-node candidate count
    *    is bounded by (k + revCap)² whatever the degree skew;
    *  - candidates = sym ∪ sym∘sym (DISTINCT), scored as round-4
    *    cosines, top-k per source via the bounded heap
    *    [[graft.functions.TopKAgg]] — map-side combined, the exchange
    *    carries k rows per (source, partition).
    *
    * Shape per round: one window (reverse cap), two distincts, one
    * self-equi-join, one scoring join against the checkpointed corpus,
    * one heap agg — all key-partitioned, nothing on the driver; the
    * graph iterate localCheckpoints each round (the
    * [[graft.operators.Graph.pageRank]] lineage discipline). Convergence
    * is fast in practice (the paper reports ~90%+ recall in a handful of
    * rounds on million-scale sets); `iters` is a fixed unroll — a
    * convergence-driven round count is a driver policy, like
    * [[graft.operators.Graph.pageRankConverged]]. */
  def knnDescent(s: SparkSession, dir: String, k: Int = 5, iters: Int = 3,
                 nInitBuckets: Int = 16, revCap: Int = 5): DataFrame =
    knnDescentFrom(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      k, iters, nInitBuckets, revCap)

  /** Core of [[knnDescent]] over any (vec_id, v) frame. */
  def knnDescentFrom(e0: DataFrame, k: Int, iters: Int,
                     nInitBuckets: Int, revCap: Int): DataFrame = {
    val e = e0.localCheckpoint(true)
    def score(cand: DataFrame): DataFrame =
      cand
        .join(e.select($"vec_id".as("src_id"), $"v".as("src_v")), "src_id")
        .join(e.select($"vec_id".as("nbr_id"), $"v".as("nbr_v")), "nbr_id")
        .select($"src_id", $"nbr_id",
          round(cosine($"src_v", $"nbr_v"), 4).as("cos_sim"))
    knnDescentCore(e, k, iters, nInitBuckets, revCap, score)
  }

  /** Shared NN-descent skeleton: deterministic two-seeded bucket init,
    * `iters` rounds of (reverse cap → sym ∪ sym∘sym candidates → score
    * → bounded top-k heap), scorer pluggable so the exact-cosine and
    * SQ8-coded variants share one body (identical init, candidates,
    * tie-breaks). */
  private def knnDescentCore(e: DataFrame, k: Int, iters: Int,
                             nInitBuckets: Int, revCap: Int,
                             score: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    require(k >= 1 && iters >= 1 && iters <= 4 && nInitBuckets >= 2 && revCap >= 1,
      s"need k >= 1, iters in [1,4], nInitBuckets >= 2, revCap >= 1")
    def topkOf(scored: DataFrame): DataFrame = {
      val topk = Bridge.column(
        graft.functions.TopKAgg(
          Bridge.expression($"cos_sim"),
          Bridge.expression($"nbr_id"), k).toAggregateExpression())
      scored.groupBy($"src_id")
        .agg(topk.as("tk"))
        .select($"src_id", explode($"tk").as("t"))
        .select($"src_id", $"t.vec_id".as("nbr_id"), $"t.cos_sim".as("cos_sim"))
    }
    // nInitBuckets is a FLOOR: the actual bucket count grows with the
    // corpus (ceil(N/128) — ~128 vectors per bucket), a driver-side
    // policy off the already-checkpointed frame's count (the
    // Graph.BcastMaxEdges discipline). A fixed bucket count makes the
    // init join Θ(N²/buckets) — measured as a 7.2x 10x-ratio at 20k
    // vectors and ~5G scored init pairs at 200k; size-bounded buckets
    // keep it Θ(N·128), linear. At the harness scales (N <= 2000) the
    // formula floors at nInitBuckets, so oracle results are unchanged;
    // the twin mirrors the same GREATEST/ceil off count(*).
    val buckets = math.max(nInitBuckets.toLong,
      math.ceil(e.count() / 128.0).toLong)
    def seededBkt(seed: Int) =
      (graft.functions.EngineNeutral.hash60Seeded(
        $"vec_id".cast("string"), lit(seed)) % buckets) +
        lit(seed * buckets)
    val b = e.select($"vec_id",
      explode(array(seededBkt(0), seededBkt(1))).as("bkt"))
    val initCand = b.select($"bkt", $"vec_id".as("src_id"))
      .join(b.select($"bkt", $"vec_id".as("nbr_id")), Seq("bkt"))
      .filter($"src_id" =!= $"nbr_id")
      .select($"src_id", $"nbr_id").distinct()
    var g = topkOf(score(initCand)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val wRev = Window.partitionBy($"nbr_id")
        .orderBy($"cos_sim".desc, $"src_id".asc)
      val rev = g.withColumn("rn", row_number().over(wRev))
        .filter($"rn" <= revCap)
        .select($"nbr_id".as("va"), $"src_id".as("ua"))
      val sym = g.select($"src_id".as("va"), $"nbr_id".as("ua"))
        .unionByName(rev).distinct().localCheckpoint(true)
      val twoHop = sym
        .join(sym.select($"va".as("ub"), $"ua".as("wa")), $"ua" === $"ub")
        .select($"va", $"wa".as("ua"))
        .filter($"va" =!= $"ua")
      val cand = sym.unionByName(twoHop).distinct()
        .select($"va".as("src_id"), $"ua".as("nbr_id"))
      g = topkOf(score(cand)).localCheckpoint(true)
    }
    g
  }

  /** SQ8-CODED NN-DESCENT — [[knnDescent]] with the round-14 scale
    * hazard engineered out: the 100× rehearsal measured the exact
    * descent at 110–134× base cost because every scoring join carried
    * two 64-double arrays (~1 KB/candidate row) through the exchange,
    * which starts spilling at scale — candidate COUNT stayed the
    * designed O(N·(k+revCap)²); the WIDTH was the problem. Here the
    * rounds move 64-byte SQ8 codes instead (the [[sq8TopK]] per-dim
    * affine grid, one broadcast row): candidates join against a
    * (vec_id, array<tinyint>) frame ~6× narrower, decode happens
    * post-join in the codegen projection, and ONLY the final graph's
    * surviving (src, nbr) pairs are exact-rescored against the raw
    * vectors — O(N·k) full-width rows instead of O(N·(k+revCap)²) per
    * round.
    *
    * Semantics: the descent ranks by round-4 cosine of DECODED grid
    * points (deterministic on both engines — same IEEE ops, same
    * (cos desc, id asc) tie-break), so the discovered graph is a pure
    * function of the corpus; output carries the quantized score that
    * chose each edge (`cos_sim_sq8`) AND the exact rescored cosine
    * (`cos_sim`). SQ8's per-dimension grid sits far above the round-4
    * quantization the exact variant already applies, so edge sets stay
    * near-identical (priced in DedupSimilaritySpec). */
  def knnDescentSq8(s: SparkSession, dir: String, k: Int = 5, iters: Int = 3,
                    nInitBuckets: Int = 16, revCap: Int = 5): DataFrame =
    knnDescentSq8From(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v")),
      k, iters, nInitBuckets, revCap)

  /** Core of [[knnDescentSq8]] over any (vec_id, v) frame. */
  def knnDescentSq8From(e0: DataFrame, k: Int, iters: Int,
                        nInitBuckets: Int, revCap: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    // validate up front (knnDescentCore re-checks, but the grid collect
    // below must not run first — bad params should never cost a job)
    require(k >= 1 && iters >= 1 && iters <= 4 && nInitBuckets >= 2 && revCap >= 1,
      s"need k >= 1, iters in [1,4], nInitBuckets >= 2, revCap >= 1")
    val e = e0.localCheckpoint(true)
    // empty corpus → empty graph, mirroring the exact variant: sq8Stats
    // over zero rows yields an empty per-dim grid that the scoring
    // kernel would (correctly) reject, so short-circuit before it
    if (e.isEmpty) {
      return e.limit(0).select($"vec_id".as("src_id"), $"vec_id".as("nbr_id"),
        round(lit(0.0), 4).as("cos_sim_sq8"), round(lit(0.0), 4).as("cos_sim"))
    }
    // the grid is O(dims) doubles — a bounded driver-policy collect
    // (the k-means‖ / langid-router contract), baked into the scoring
    // kernel as plan constants
    val gridRow = sq8Stats(e).collect()(0)
    val mnl = gridRow.getSeq[Double](0).toIndexedSeq
    val scl = gridRow.getSeq[Double](1).toIndexedSeq
    // the narrow frame the descent rounds move: 64 int8 codes per
    // vector (stored −128-shifted to fit tinyint), ~80 B vs ~520 B
    val codes = e
      .select($"vec_id", transform($"v", (x, i) => {
        val mn = element_at(lit(mnl.toArray), i + 1)
        val sc = element_at(lit(scl.toArray), i + 1)
        (when(sc === 0.0, lit(0.0)).otherwise(
          least(lit(255.0), greatest(lit(0.0),
            floor((x - mn) / sc + lit(0.5)))))
          - lit(128.0)).cast("byte")
      }).as("code")).localCheckpoint(true)
    // fused decode+cosine kernel: one codegen loop per candidate row,
    // no intermediate decoded arrays — decode is mn + (c+128)·sc,
    // identical doubles to sq8TopK's clamp-to-grid form (the clamp
    // value IS c+128), so the twin's code-free decode matches ULP for
    // ULP
    def sq8cos(a: Column, b: Column): Column =
      Bridge.column(graft.functions.Sq8CosineExpr(
        Bridge.expression(a), Bridge.expression(b), mnl, scl))
    def score(cand: DataFrame): DataFrame =
      cand
        .join(codes.select($"vec_id".as("src_id"), $"code".as("src_c")), "src_id")
        .join(codes.select($"vec_id".as("nbr_id"), $"code".as("nbr_c")), "nbr_id")
        .select($"src_id", $"nbr_id",
          round(sq8cos($"src_c", $"nbr_c"), 4).as("cos_sim"))
    val g = knnDescentCore(e, k, iters, nInitBuckets, revCap, score)
    // exact rescore of the survivors only: O(N·k) full-width rows
    g.join(e.select($"vec_id".as("src_id"), $"v".as("src_v")), "src_id")
      .join(e.select($"vec_id".as("nbr_id"), $"v".as("nbr_v")), "nbr_id")
      .select($"src_id", $"nbr_id", $"cos_sim".as("cos_sim_sq8"),
        round(cosine($"src_v", $"nbr_v"), 4).as("cos_sim"))
  }
}
