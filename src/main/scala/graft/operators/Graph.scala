package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.syntax._

/** Graph analytics over the document near-duplicate graph — the
  * [[Dedup.minhashLshPairs]] edge set read as an undirected simple graph
  * (doc_a < doc_b, one row per edge). The dedup suite already runs
  * connectivity over this graph ([[Dedup.dupClusters]]); this suite adds
  * the structural reports a 100 TB curation run reads alongside it:
  * degree distribution (mirror/hub detection), a triangle census (how
  * clique-like the duplication is — boilerplate families close
  * triangles, chained near-dup drift does not), and PageRank (which
  * documents sit centrally in the duplication web — the survivors worth
  * keeping, or the templates worth filtering).
  *
  * Scale notes: everything is equi-join + aggregate — no all-pairs step
  * beyond what the banded LSH join already bounds. The triangle census
  * uses the DEGREE-ORDERED ORIENTATION (Suri & Vassilvitskii, WWW'11):
  * each edge points from its lower-(degree, id) endpoint to the higher,
  * so per-node out-degree is bounded by O(sqrt(E)) and the wedge join's
  * fan-out by the graph's arboricity — the property that keeps triangle
  * counting feasible on power-law graphs at cluster scale. PageRank is
  * a fixed unrolled iteration count (a convergence loop is a driver
  * policy, not a plan shape), with per-target contribution sums in
  * DECIMAL so partial-agg order never moves a rank.
  */
object Graph {

  /** Undirected edge set (a, b), a < b, one row per edge. */
  private def edges(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(s, dir).select($"doc_a".as("a"), $"doc_b".as("b"))

  /** Symmetrized adjacency (src, dst): every undirected edge both ways. */
  private def adjacency(e: DataFrame): DataFrame =
    e.select($"a".as("src"), $"b".as("dst"))
      .unionAll(e.select($"b".as("src"), $"a".as("dst")))

  /** Per-node degree (node, deg) of the undirected graph. */
  private def degrees(e: DataFrame): DataFrame =
    adjacency(e).groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))

  /** DEGREE DISTRIBUTION — (degree, n_nodes) histogram of the near-dup
    * graph. The curation health artifact: a fat tail appearing between
    * two ingestion runs means a template/mirror family entered the mix.
    * Two partial-aggregated shuffles; output is O(max degree) rows
    * whatever the corpus size. */
  def degreeDistribution(s: SparkSession, dir: String): DataFrame =
    degrees(edges(s, dir))
      .groupBy($"deg".as("degree"))
      .agg(count(lit(1)).as("n_nodes"))

  /** TRIANGLE CENSUS — node/edge/wedge/triangle counts and the global
    * clustering coefficient 3T/W of the near-dup graph, in one row.
    * Each triangle is counted exactly once: under the degree-ordered
    * orientation every triangle has exactly one node whose two edges
    * both point outward, so the wedge join (pairs of out-neighbors,
    * canonicalized x < y) probed against the undirected edge set yields
    * each triangle once. Wedge count W = Σ deg·(deg−1)/2 comes straight
    * off the degree table (terms are exact integers in double well past
    * any realistic degree — the sum is order-independent). */
  def triangleCensus(s: SparkSession, dir: String): DataFrame =
    censusOf(edges(s, dir).localCheckpoint(true))

  /** Edge-count threshold under which the per-edge adjacency joins of
    * the forward triangle algorithm BROADCAST the adjacency-list table
    * instead of shuffling on it — a driver-side AQE-style policy (one
    * count() over an already-materialized edge frame, ~free). Under the
    * bar the whole triangle computation is one fused codegen stage over
    * the edge list; above it the two adjacency joins fall back to SMJ —
    * two |E|-row shuffles carrying one bounded adjacency array each,
    * still never a Θ(Σ outdeg²) wedge exchange. The adjacency table
    * holds Σ outdeg = |E| longs ≈ 8 B/edge, so 16M edges ≈ 128 MB —
    * inside a production executor's broadcast budget (guide §3.1: "a
    * few hundred MB is usually fine"; the hard broadcast cap is 8 GB).
    * r17 raised the bar from 8M after measuring the cliff it created:
    * the 10x bench graph (9.6M edges) fell just past 8M onto the SMJ
    * fallback — whose array-heavy sort was BOTH ~4x slower than the
    * fused broadcast stage AND the stage that heap-OOMed the 10x leg
    * at the driver posture (spill-reader buffers in
    * UnsafeExternalSorter.getSortedIterator). 100x graphs (~96M
    * edges) stay on the honest SMJ+pass path. Env-overridable
    * (SPARK_GRAFT_TRI_BCAST_EDGES) so a deployment sizes it to its
    * executor broadcast budget — the choice is a join-strategy policy,
    * never a result change. */
  private val BcastMaxEdges: Long =
    sys.env.get("SPARK_GRAFT_TRI_BCAST_EDGES").map(_.toLong)
      .getOrElse(16000000L)

  /** Census body over any (a, b) edge frame — shared by the exact census
    * and the DOULION-sampled estimator so the two cannot drift. Callers
    * MUST pass a materialized (localCheckpoint'd) frame: the body
    * references `e` several times (degrees, the orientation join) and
    * runs the [[BcastMaxEdges]] policy count — an unmaterialized LSH
    * pair derivation would re-run at every reference (the round-11
    * PageRank lineage pathology). The census never materializes a
    * triangle row at all: n_triangles = Σ per-edge common-out-neighbor
    * counts from [[triangleEdges]]. */
  private[operators] def censusOf(
      e: DataFrame, passEdges: Long = CensusPassEdges): DataFrame = {
    val deg = degrees(e)
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum($"deg") / 2).cast("long").as("n_edges"),
      sum($"deg" * ($"deg" - 1) / 2).cast("long").as("n_wedges"))
    val (oriented, adj, bcast, nEdges) = triangleSetup(e, deg)
    def sumOf(sub: DataFrame) = triangleEdgesOf(sub, adj, bcast)
      .agg(coalesce(sum(size($"ws")).cast("long"), lit(0L))
        .as("n_triangles"))
    val passes = orientedPasses(oriented, nEdges, passEdges)
    val tri =
      if (passes.size == 1) sumOf(passes.head)
      else passes.map { p =>
        val r = sumOf(p).localCheckpoint(true); System.gc(); r
      }.reduce(_ unionAll _)
        .agg(sum($"n_triangles").cast("long").as("n_triangles"))
    stats.crossJoin(tri)
      .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles",
        round(lit(3.0) * $"n_triangles" / $"n_wedges", 6)
          .as("global_clustering"))
  }

  /** Hash-disjoint pass subsets of an oriented edge frame: one slice
    * under the [[CensusPassEdges]] bar (the plan the harness scales
    * verify), ceil(E / bar) deterministic slices above it — the
    * scratch-bounding policy shared by [[localClusteringFrom]],
    * [[censusOf]] and [[kTrussFrom]]'s support pass. Every edge lands
    * in exactly one slice, so any reduction summed across slices is
    * split-invariant. */
  private def orientedPasses(oriented: DataFrame, nEdges: Long,
                             passEdges: Long): Seq[DataFrame] = {
    require(passEdges >= 1, s"passEdges must be >= 1, got $passEdges")
    val k = math.max(1L, (nEdges + passEdges - 1) / passEdges).toInt
    if (k == 1) Seq(oriented)
    else (0 until k).map(i =>
      oriented.filter(pmod(xxhash64($"s", $"t"), lit(k)) === i))
  }

  /** FORWARD triangle algorithm (Schank & Wagner, SEA 2005) over the
    * (a, b) a<b edge frame: orient every edge from its lower-(deg, id)
    * endpoint to the higher, build the sorted out-adjacency table, and
    * for each oriented edge (s, t) emit ws = N⁺(s) ∩ N⁺(t) — exactly
    * the third corners of the triangles in which s is the source and t
    * the middle, so every triangle (s→t, s→w, t→w) appears EXACTLY once
    * as one element of one row's `ws`. Output: (s, t, ws) — the census
    * sums sizes, [[localClustering]] charges s, t and each w.
    *
    * Why this shape: the wedge-join formulation materializes the
    * Θ(Σ outdeg²) wedge stream through a hash join (measured 308M
    * probe rows and 876 s of CPU at sf0.1 — the graph is 74% globally
    * clustered, a quasi-clique); here the same arithmetic is one
    * SortedIntersectExpr merge per EDGE (~µs each over out-degrees the
    * orientation bounds by O(√E)) against an adjacency table of one row
    * per node. Under [[BcastMaxEdges]] the two adjacency joins
    * broadcast — the whole computation is one fused codegen stage over
    * the edge list, no shuffle touching anything wedge-sized; above the
    * bar they fall back to SMJ on node id, shuffling |E| bounded
    * arrays, which is the honest distributed form (still never a wedge
    * exchange). */
  private def triangleEdges(e: DataFrame, deg: DataFrame): DataFrame = {
    val (oriented, adj, bcast, _) = triangleSetup(e, deg)
    triangleEdgesOf(oriented, adj, bcast)
  }

  /** Shared first half of the forward algorithm: the degree-ordered
    * oriented edge frame, its sorted out-adjacency table (both
    * checkpointed), the broadcast decision and the edge count. */
  private def triangleSetup(e: DataFrame, deg: DataFrame)
  : (DataFrame, DataFrame, Boolean, Long) = {
    val nEdges = e.count()
    val ed = e
      .join(deg.select($"node".as("a"), $"deg".as("da")), "a")
      .join(deg.select($"node".as("b"), $"deg".as("db")), "b")
    val lowFirst = $"da" < $"db" || ($"da" === $"db" && $"a" < $"b")
    val oriented = ed.select(
      when(lowFirst, $"a").otherwise($"b").as("s"),
      when(lowFirst, $"b").otherwise($"a").as("t"))
      .localCheckpoint(true)
    val adj = oriented.groupBy($"s".as("node"))
      .agg(sort_array(collect_list($"t")).as("nbrs"))
      .localCheckpoint(true)
    (oriented, adj, nEdges <= BcastMaxEdges, nEdges)
  }

  /** Second half: N⁺(s) ∩ N⁺(t) per oriented edge of `sub` (any subset
    * of the setup's oriented frame) against the FULL adjacency. */
  private def triangleEdgesOf(sub: DataFrame, adj: DataFrame,
                              bcast: Boolean): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    def side(asCol: String, asNbrs: String) =
      adj.select($"node".as(asCol), $"nbrs".as(asNbrs))
    val withS =
      if (bcast) sub.join(broadcast(side("s", "ns")), Seq("s"))
      else sub.join(side("s", "ns"), Seq("s"))
    val joined =
      if (bcast) withS.join(broadcast(side("t", "nt")), Seq("t"))
      else withS.join(side("t", "nt"), Seq("t"))
    val ws = Bridge.column(graft.functions.SortedIntersectExpr(
      Bridge.expression($"ns"), Bridge.expression($"nt")))
    joined.select($"s", $"t", ws.as("ws"))
  }

  /** LOCAL CLUSTERING COEFFICIENT — per node, triangles(v) divided by
    * the wedges at v, deg(v)·(deg(v)−1)/2 (Watts & Strogatz, Nature
    * 393, 1998). The census ([[triangleCensus]]) answers "how
    * clique-like is the duplication globally"; this is the per-document
    * version a curation run ranks on: local_cc ≈ 1 marks a document
    * embedded in a closed template family (every two of its near-dups
    * are also near-dups of each other — delete the family), local_cc ≈ 0
    * at high degree marks a hub stitching UNRELATED documents together
    * (boilerplate contamination — fix the shingling, not the corpus).
    *
    * Shape: the SAME forward-algorithm derivation as the census
    * ([[triangleEdges]] — each triangle appears exactly once, as one
    * element of one edge's common-neighbor array), then each triangle
    * is charged to its three corners: the source and middle get
    * size(ws) in one 2-per-edge explode, each third corner gets 1 in
    * one explode(ws) pass, and a single partial-agged sum combines
    * them; degrees LEFT-join the per-node counts so triangle-free
    * nodes keep local_cc = 0. (The original 3-way unionAll over a
    * wedge-join triangle list planned as THREE full copies of the
    * chain — exchange reuse does not fire across union arms under AQE —
    * and its 3.5 s bench record was a count() artifact: Spark prunes
    * the final left join under a bare count(), so the 68 s of real
    * triangle work never ran. See Bench's toRdd note.) */
  def localClustering(s: SparkSession, dir: String): DataFrame =
    localClusteringFrom(edges(s, dir).localCheckpoint(true))

  /** Edges-per-pass bar for [[localClusteringFrom]]'s sequential
    * decomposition: under it the whole charge pipeline runs as one
    * plan; above it the oriented edge list is processed in
    * ceil(E / bar) deterministic hash-disjoint passes. Calibration:
    * the 100x rehearsal's 96.5M-edge graph needed ~60-100 GB of live
    * shuffle scratch in one pass (Σ outdeg² adjacency arrays through
    * the SMJ) — over this box's free disk — so ~24M edges/pass caps a
    * pass at roughly a quarter of that. On a 1000-executor cluster
    * scratch scales with the fleet and the bar can be raised; it is a
    * capacity policy, never a result change (passes are hash-disjoint
    * and summed — split-invariant by the orientedPasses contract).
    * Env-overridable (SPARK_GRAFT_TRI_PASS_EDGES) for fleet-scratch
    * sizing. */
  val CensusPassEdges: Long =
    sys.env.get("SPARK_GRAFT_TRI_PASS_EDGES").map(_.toLong)
      .getOrElse(24000000L)

  /** Core of [[localClustering]] over any materialized (a, b) a<b edge
    * frame. `passEdges` exposes the pass bar for tests. */
  def localClusteringFrom(e: DataFrame,
                          passEdges: Long = CensusPassEdges): DataFrame = {
    val deg = degrees(e)
    val perNode = perNodeTriangles(e, deg, passEdges)
    deg.join(perNode, Seq("node"), "left")
      .select($"node".as("doc_id"), $"deg".as("degree"),
        coalesce($"t", lit(0L)).as("n_triangles"),
        round(when($"deg" >= 2,
          lit(2.0) * coalesce($"t", lit(0L)) / ($"deg" * ($"deg" - 1)))
          .otherwise(lit(0.0)), 6).as("local_cc"))
  }

  /** Per-node triangle counts (node, t) over a materialized edge frame —
    * the charge pipeline shared by the exact [[localClusteringFrom]] and
    * the DOULION-sparsified [[clusteringApproxFrom]] so the two cannot
    * drift. `deg` must be `degrees(e)` (passed in so a caller that also
    * needs the degree table derives it once). */
  private def perNodeTriangles(e: DataFrame, deg: DataFrame,
                               passEdges: Long): DataFrame = {
    require(passEdges >= 1, s"passEdges must be >= 1, got $passEdges")
    val (oriented, adj, bcast, nEdges) = triangleSetup(e, deg)
    // ONE consumption of the triangle frame per pass: explode to a row
    // per triangle (s, t, w), then charge each corner +1 from a second
    // inline generator. Two consumers (a unionAll of separate s/t and
    // w selects) would EXECUTE the Σ outdeg² adjacency join twice —
    // two live copies of its shuffle files, which is exactly what
    // exhausted scratch disk at the 100x rehearsal. s and t receive
    // size(ws) in total by appearing once per closing w, so the
    // charges — and the oracle hash — are identical.
    def charges(sub: DataFrame): DataFrame =
      triangleEdgesOf(sub, adj, bcast)
        .select($"s", $"t", explode($"ws").as("w"))
        .select(explode(array($"s", $"t", $"w")).as("node"))
        .groupBy($"node").agg(count(lit(1)).as("t"))
    // Sequential hash-disjoint passes ([[orientedPasses]]): each pass
    // intersects 1/K of the oriented edges against the FULL adjacency
    // and reduces to per-node counts (bounded by |V|) before the next
    // pass starts, so live shuffle scratch is ~1/K of the one-shot
    // plan. The split covers every edge exactly once, so the summed
    // counts — and the oracle hash — cannot depend on it. The
    // checkpoint materializes the pass; the gc lets the ContextCleaner
    // drop the pass's shuffle files before the next pass claims the
    // disk (the Bench inter-query discipline — without it cleanup
    // waits for an arbitrary GC).
    val passes = orientedPasses(oriented, nEdges, passEdges)
    if (passes.size == 1) charges(passes.head)
    else passes.map { p =>
      val part = charges(p).localCheckpoint(true)
      System.gc()
      part
    }.reduce(_ unionAll _).groupBy($"node").agg(sum($"t").as("t"))
  }

  /** APPROXIMATE local clustering — the DOULION estimator
    * ([[triangleSample]]'s discipline, Tsourakakis et al. KDD'09)
    * applied PER NODE: sparsify the edge set with the deterministic
    * hash60 coin (keep (a,b) iff hash60(a ⧺ '|' ⧺ b) % keepMod == 0,
    * p = 1/keepMod), run the SAME exact per-node triangle charge on the
    * kept edges, scale each node's count by keepMod³ (a triangle
    * survives with probability p³ — unbiased), and normalize by the
    * node's TRUE degree from the full edge set. est_cc is the raw
    * unbiased estimator — it can exceed 1 for low-degree nodes (the
    * variance lives in the keepMod³ scale-up); [[clusteringApproxError]]
    * prices that variance per degree band against the exact
    * coefficient.
    *
    * Why it exists: [[localClustering]]'s Σ outdeg² intersection join is
    * the measured floor (the r16 record — a weighted-charge rewrite was
    * 1.4× WORSE) and the single heaviest 10× bench entry. Sparsifying at
    * p = 1/2 cuts the wedge work ~p² ≈ 4× and the orientation/adjacency
    * build ~2× for a concentration-bounded estimate — the 10× cheaper
    * default a curation pipeline ranks on when exact counts are not the
    * point. The coin is engine-neutral, so the twin is a hash match,
    * not a tolerance match. */
  def clusteringApprox(s: SparkSession, dir: String, keepMod: Int = 2): DataFrame =
    clusteringApproxFrom(edges(s, dir).localCheckpoint(true), keepMod)

  /** Core of [[clusteringApprox]] over any materialized (a, b) a<b edge
    * frame. The kept subset is re-materialized so the charge pipeline's
    * several references (degrees, orientation, adjacency) scan stored
    * rows, not the filter chain ([[triangleSample]]'s measured split). */
  def clusteringApproxFrom(full: DataFrame, keepMod: Int = 2,
                           passEdges: Long = CensusPassEdges): DataFrame = {
    require(keepMod >= 2, s"keepMod must be >= 2, got $keepMod")
    val kept = full.filter(
      graft.functions.EngineNeutral.hash60(
        concat($"a".cast("string"), lit("|"), $"b".cast("string")))
        % keepMod === 0)
      .localCheckpoint(true)
    val perNode = perNodeTriangles(kept, degrees(kept), passEdges)
    val scale = keepMod.toLong * keepMod * keepMod
    degrees(full).join(perNode, Seq("node"), "left")
      .select($"node".as("doc_id"), $"deg".as("degree"),
        (coalesce($"t", lit(0L)) * lit(scale)).as("est_triangles"),
        round(when($"deg" >= 2,
          lit(2.0) * coalesce($"t", lit(0L)) * lit(scale.toDouble)
            / ($"deg" * ($"deg" - 1)))
          .otherwise(lit(0.0)), 6).as("est_cc"))
  }

  /** Error audit of [[clusteringApprox]] vs the exact
    * [[localClustering]], per degree band — the artifact that tells a
    * pipeline whether the 4× cheaper estimate is usable at its degree
    * profile. Bands are fixed integer cuts (deg < 4 / 16 / 64 / else),
    * so banding is engine-exact; the error moments aggregate in
    * DECIMAL(27,10) over the 6-rounded coefficients (order-invariant
    * sums), divided once in double. Deliberately NOT benched: it runs
    * the exact operator as its baseline — the audit is an offline
    * calibration pass, the production scan is [[clusteringApprox]]. */
  def clusteringApproxError(s: SparkSession, dir: String,
                            keepMod: Int = 2): DataFrame = {
    val e = edges(s, dir).localCheckpoint(true)
    val exact = localClusteringFrom(e)
    val approx = clusteringApproxFrom(e, keepMod)
      .select($"doc_id", $"est_cc")
    val dec = "decimal(27,10)"
    exact.join(approx, Seq("doc_id"))
      .select(
        when($"degree" < 4, lit(0L)).when($"degree" < 16, lit(1L))
          .when($"degree" < 64, lit(2L)).otherwise(lit(3L)).as("deg_band"),
        ($"est_cc" - $"local_cc").cast(dec).as("err"),
        abs($"est_cc" - $"local_cc").cast(dec).as("abs_err"))
      .groupBy($"deg_band")
      .agg(count(lit(1)).as("n_nodes"),
        round(sum($"err").cast("double") / count(lit(1)), 6).as("bias"),
        round(sum($"abs_err").cast("double") / count(lit(1)), 6).as("mae"),
        round(max($"abs_err").cast("double"), 6).as("max_abs_err"))
  }

  /** SAMPLED TRIANGLE CENSUS — the DOULION estimator (Tsourakakis,
    * Kang, Miller & Faloutsos, KDD'09): sparsify the graph by keeping
    * each edge independently with probability p, run the SAME exact
    * degree-ordered census on the kept edges, and scale the triangle
    * count by 1/p³ (each triangle survives with probability p³, so the
    * estimator is unbiased). This is the 100 TB posture for the census:
    * the exact count is Θ(Σ outdeg²) by contract — inherent, but at
    * extreme scale a p-sparsified pass costs ~p² of the wedge work for
    * a concentration-bounded estimate, and the knob is a single
    * parameter.
    *
    * The coin is DETERMINISTIC: keep edge (a,b) iff
    * hash60(a ⧺ '|' ⧺ b) % keepMod == 0 (p = 1/keepMod, the engine-
    * neutral md5 kernel) — so both engines sparsify identically and the
    * sampled census is EXACT on the sampled subgraph (the twin is a
    * hash match, not a tolerance match; estimator variance lives in the
    * p³ scale-up, priced against the exact census in GraphSpec). Output:
    * the sampled graph's census columns plus the sampling modulus and
    * `est_triangles` = n_triangles · keepMod³ (integer-exact). */
  def triangleSample(s: SparkSession, dir: String, keepMod: Int = 2): DataFrame = {
    require(keepMod >= 2, s"keepMod must be >= 2, got $keepMod")
    // Materialize the LSH derivation FIRST, then filter the stored rows
    // and materialize the kept set: inlining the md5 coin into the
    // derivation measured 11.3 s vs 6.9 + 0.9 s split at sf0.1 (the
    // filter pushed into the pair join perturbs its plan), and censusOf
    // references the kept frame repeatedly.
    val kept = edges(s, dir).localCheckpoint(true)
      .filter(
        graft.functions.EngineNeutral.hash60(
          concat($"a".cast("string"), lit("|"), $"b".cast("string")))
          % keepMod === 0)
      .localCheckpoint(true)
    censusOf(kept)
      .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles",
        $"global_clustering",
        lit(keepMod.toLong).as("keep_mod"),
        ($"n_triangles" * lit(keepMod.toLong) * lit(keepMod.toLong)
          * lit(keepMod.toLong)).as("est_triangles"))
  }

  /** PAGERANK over the (symmetrized) near-dup graph — `iters` unrolled
    * power iterations at damping 0.85, uniform 1/N start. Each
    * iteration is one equi-join (adjacency × current ranks) and one
    * aggregation on the target node; contributions pr/deg sum in
    * DECIMAL(27,10) (exact under any partial-agg order), and each
    * iteration's rank is rounded to 8 so both engines iterate on
    * identical doubles. Every node of this graph has degree ≥ 1 and the
    * graph is symmetric, so there are no dangling nodes and every node
    * receives mass — the contribution join is inner by construction.
    *
    * Materialization policy (the [[Dedup.clustersFromPairs]] discipline,
    * adopted after the round-11 100× rehearsal measured the unrolled
    * lineage at 88× its 10× cost): the LSH pair derivation is the
    * expensive leaf, so the adjacency is localCheckpoint'ed ONCE and
    * every iteration joins the stored edge set instead of re-deriving
    * the banded join; each iteration's rank frame (one small row per
    * node) is checkpointed too, truncating the lineage so a
    * convergence-driven caller passing iters=20 gets 20 bounded plans,
    * not one exponential one. Same arithmetic, same rounding — the
    * oracle hash is unchanged. 100× effect: 1073 s → 265 s (and the
    * 265 s is 36× the sf0.1 base for 100× the data — sublinear). */
  def pageRank(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val (adj, nodes, n) = prSetup(s, dir)
    var ranks = prStart(nodes, n)
    for (_ <- 1 to iters) {
      val prev = ranks
      ranks = prStep(adj, nodes, n, prev).localCheckpoint(true)
      Iterates.free(prev) // superseded iterate; no-op on the prStart frame
    }
    ranks.select($"node".as("doc_id"), $"deg".as("degree"), $"pr")
  }

  /** Materialized adjacency + per-node degrees + node count — the shared
    * setup every PageRank variant starts from. */
  private def prSetup(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val adj = adjacency(edges(s, dir)).localCheckpoint(true)
    val nodes = adj.groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    (adj, nodes, nodes.agg(count(lit(1)).as("n")))
  }

  /** Uniform 1/N start vector, rounded to 8 like every iterate.
    * Documented bound: round(1/N, 8) underflows to 0.0 once N exceeds
    * ~2e8 nodes, so the fixed 8-dp iteration convention caps the node
    * count at that order; past it, raise the rounding scale (both
    * engines in lockstep) — the near-dup graphs this engine builds are
    * per-corpus-shard, far under the bound. */
  private def prStart(nodes: DataFrame, n: DataFrame): DataFrame =
    nodes.crossJoin(broadcast(n))
      .select($"node", $"deg", $"n", round(lit(1.0) / $"n", 8).as("pr"))

  /** One power iteration: equi-join contributions, DECIMAL sum per
    * target, damped update rounded to 8 — [[pageRank]]'s exact body. */
  private def prStep(adj: DataFrame, nodes: DataFrame, n: DataFrame,
                     ranks: DataFrame): DataFrame = {
    val contrib = adj
      .join(ranks.select($"node", ($"pr" / $"deg").as("c")),
        $"src" === $"node")
      .select($"dst", $"c".cast("decimal(27,10)").as("c"))
    val sums = contrib.groupBy($"dst").agg(sum($"c").as("sc"))
    nodes.crossJoin(broadcast(n))
      .join(sums, $"node" === $"dst")
      .select($"node", $"deg", $"n",
        round(lit(0.15) / $"n" + lit(0.85) * $"sc".cast("double"), 8)
          .as("pr"))
  }

  /** Per-iteration rank displacement between two consecutive iterates:
    * single-row (max_delta, l1_delta), both over |pr_i − pr_{i−1}|
    * rounded to 8 (the iterates themselves are rounded to 8, so the
    * subtraction is the same IEEE op on identical doubles on both
    * engines); the L1 total sums in DECIMAL — order-independent. */
  private def prDelta(prev: DataFrame, cur: DataFrame): DataFrame =
    prev.select($"node", $"pr".as("p0"))
      .join(cur.select($"node", $"pr".as("p1")), "node")
      .select(round(abs($"p1" - $"p0"), 8).as("d"))
      .agg(max($"d").as("max_delta"),
        round(sum($"d".cast("decimal(27,10)")).cast("double"), 8)
          .as("l1_delta"))

  /** PAGERANK CONVERGENCE TRAJECTORY — per power iteration, the max and
    * L1 rank displacement from the previous iterate: the convergence
    * report a training loop watches (the [[graft.operators.Similarity]]
    * `pqLloydTrajectory` discipline applied to graph centrality). A
    * declining max_delta column says how many iterations the graph
    * actually needs; [[pageRankConverged]] is the driver policy that
    * reads exactly this signal iteration by iteration and stops.
    * Shape: `iters` checkpointed [[pageRank]] steps (same arithmetic,
    * same rounding — iterates are bit-identical to the registered
    * ranks), each followed by a self-join on node and a single-row
    * aggregate; output is `iters` rows however large the graph. */
  def pageRankTrajectory(s: SparkSession, dir: String,
                         iters: Int = 5): DataFrame = {
    val (adj, nodes, n) = prSetup(s, dir)
    var ranks = prStart(nodes, n)
    val rows = (1 to iters).map { i =>
      val prev = ranks
      ranks = prStep(adj, nodes, n, prev).localCheckpoint(true)
      // the delta row is materialized eagerly (one row) so the
      // superseded iterate's blocks can be dropped immediately instead
      // of staying referenced until the final union's action
      val row = prDelta(prev, ranks)
        .select(lit(i.toLong).as("iter"), $"max_delta", $"l1_delta")
        .localCheckpoint(true)
      Iterates.free(prev)
      row
    }
    rows.reduce(_ unionAll _)
  }

  /** CONVERGENCE-DRIVEN PAGERANK — the driver-policy loop the fixed
    * unroll was always the kernel for (the [[Dedup]] CC-loop
    * discipline): iterate [[prStep]], checkpoint each iterate, probe
    * the single-row max displacement on the driver, stop when it drops
    * under `eps` or at `maxIters`. The per-iteration probe collects ONE
    * row — the only driver-side data movement whatever the graph size —
    * and the checkpoint keeps every plan bounded (the round-11 100×
    * rehearsal measured the un-materialized unroll at 88× its 10× cost).
    * Returns the converged ranks plus the iteration count and final
    * max_delta so a caller can audit termination. Not oracle-registered:
    * the stopping rule is driver policy; each iterate it returns is
    * bit-identical to [[pageRank]] at that iteration count, which IS
    * oracle-checked — GraphSpec asserts exactly that equivalence, and
    * that the stop iteration is the first trajectory row under eps. */
  def pageRankConverged(s: SparkSession, dir: String, eps: Double = 1e-4,
                        maxIters: Int = 20): DataFrame = {
    require(eps > 0 && maxIters >= 1, s"need eps > 0, maxIters >= 1")
    val (adj, nodes, n) = prSetup(s, dir)
    var ranks = prStart(nodes, n)
    var iter = 0
    var maxDelta = Double.MaxValue
    while (iter < maxIters && maxDelta >= eps) {
      val prev = ranks
      ranks = prStep(adj, nodes, n, prev).localCheckpoint(true)
      iter += 1
      maxDelta = prDelta(prev, ranks).head.getDouble(0)
      Iterates.free(prev) // probe done — the superseded iterate is dead
    }
    ranks.select($"node".as("doc_id"), $"deg".as("degree"), $"pr",
      lit(iter.toLong).as("n_iters"),
      round(lit(maxDelta), 8).as("final_max_delta"))
  }

  /** K-CORE — the maximal subgraph where every node keeps degree >= k,
    * by iterative peel: drop nodes under k, recompute degrees within the
    * survivors, repeat. On the near-dup graph the k-core isolates the
    * DENSE duplication families (template/boilerplate clusters that
    * survive any single-edge noise) from chain-like drift that a
    * connected-component view lumps together — the structure a curation
    * run reads to decide "delete the whole family" vs "keep one of each
    * pair". Registered at a FIXED peel-round count (the [[pageRank]]
    * unroll discipline: a convergence loop is driver policy, not a plan
    * shape — [[pageRankConverged]] shows the loop; GraphSpec asserts the
    * fixture reaches its fixpoint within the registered rounds, and the
    * spec's extra-round probe proves one more peel changes nothing).
    * Shape: the adjacency is localCheckpoint'ed once; each round is two
    * membership SEMI-shaped equi joins + one partial-agged degree count,
    * each iterate checkpointed so round r's plan never re-derives rounds
    * 1..r-1. Output: surviving nodes with their within-core degree. */
  def kCore(s: SparkSession, dir: String, k: Int = 3, rounds: Int = 8): DataFrame =
    kCoreFrom(edges(s, dir), k, rounds)

  /** Core of [[kCore]] over any (a, b) a<b edge frame. */
  def kCoreFrom(e: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1 and rounds >= 1")
    val adj = adjacency(e).localCheckpoint(true)
    def coreDeg(members: DataFrame): DataFrame =
      adj.join(members.select($"node".as("ms")), $"src" === $"ms")
        .join(members.select($"node".as("md")), $"dst" === $"md")
        .groupBy($"src").agg(count(lit(1)).as("d"))
        .select($"src".as("node"), $"d")
    var members = adj.select($"src".as("node")).distinct()
    for (_ <- 1 to rounds) {
      val prev = members
      members = coreDeg(prev).filter($"d" >= k)
        .select($"node").localCheckpoint(true)
      Iterates.free(prev) // no-op on the round-0 distinct projection
    }
    coreDeg(members).select($"node".as("doc_id"), $"d".as("core_deg"))
  }

  /** K-TRUSS — the edge-level cohesion peel (Cohen, "Trusses: cohesive
    * subgraphs for social network analysis", 2008; distributed form:
    * Wang & Cheng, VLDB'12): repeatedly drop every edge supported by
    * fewer than k−2 triangles within the current subgraph. Where
    * [[kCore]] keeps nodes with enough NEIGHBORS, the truss keeps edges
    * with enough TRIANGLES — the strictly stronger cohesion cut, and on
    * a near-dup graph the sharpest template-family extractor: a
    * boilerplate hub's spoke edges have high degree but almost no
    * closed triangles, so the truss drops them while keeping genuine
    * mirror cliques intact (a clique of c docs survives any k ≤ c).
    *
    * Fixed `rounds` peels (the [[labelPropagation]]/[[kCore]]
    * determinism discipline — each round is a pure function of the
    * previous edge set, so the twin unrolls the same rounds as
    * MATERIALIZED CTEs); output is the surviving edge list with its
    * support recomputed WITHIN the survivor set. Per round the support
    * pass is one [[triangleEdges]] derivation — the degree-ordered
    * forward algorithm, orientation-bounded merge per edge, never a
    * wedge exchange — plus one explode(3 charges/triangle) + one
    * partial-agged sum + one equi-join filter, every iterate
    * checkpointed so round r never re-derives rounds 1..r−1. */
  def kTruss(s: SparkSession, dir: String, k: Int = 4, rounds: Int = 2): DataFrame =
    kTrussFrom(edges(s, dir).localCheckpoint(true), k, rounds)

  /** Core of [[kTruss]] over any materialized (a, b) a<b edge frame. */
  def kTrussFrom(e0: DataFrame, k: Int, rounds: Int,
                 passEdges: Long = CensusPassEdges): DataFrame = {
    require(k >= 3 && rounds >= 1, s"need k >= 3 and rounds >= 1")
    // per-edge triangle support: each (s, t, ws) row charges size(ws)
    // to the (s, t) edge and 1 to each of the two closing edges (s, w),
    // (t, w) — every triangle contributes once to each of its 3 edges
    // ONE consumption of the triangle frame (the localClustering
    // discipline): charging the (s,t) edge and the two closing edges
    // from separate selects would execute the adjacency join twice per
    // support pass. Explode to a row per triangle (s, t, w), then emit
    // its three edges from a second inline generator — each triangle
    // charges each of its edges exactly once, so no weight column.
    // Above the CensusPassEdges bar the slices run sequentially with
    // per-pass (a, b) partial counts (bounded by |E|) — the
    // scratch-bounding policy of [[localClusteringFrom]].
    def support(e: DataFrame): DataFrame = {
      val (oriented, adj, bcast, nEdges) = triangleSetup(e, degrees(e))
      def chargesOf(sub: DataFrame) = triangleEdgesOf(sub, adj, bcast)
        .select($"s", $"t", explode($"ws").as("w"))
        .select(explode(array(
          struct(least($"s", $"t").as("a"), greatest($"s", $"t").as("b")),
          struct(least($"s", $"w").as("a"), greatest($"s", $"w").as("b")),
          struct(least($"t", $"w").as("a"), greatest($"t", $"w").as("b"))))
          .as("x"))
        .select($"x.a".as("a"), $"x.b".as("b"))
      val passes = orientedPasses(oriented, nEdges, passEdges)
      if (passes.size == 1)
        chargesOf(passes.head)
          .groupBy($"a", $"b").agg(count(lit(1)).as("support"))
      else passes.map { p =>
        val r = chargesOf(p).groupBy($"a", $"b")
          .agg(count(lit(1)).as("c")).localCheckpoint(true)
        System.gc(); r
      }.reduce(_ unionAll _)
        .groupBy($"a", $"b").agg(sum($"c").as("support"))
    }
    var e = e0
    for (_ <- 1 to rounds) {
      val prev = e
      e = prev.join(support(prev), Seq("a", "b"))
        .filter($"support" >= k - 2)
        .select($"a", $"b").localCheckpoint(true)
      // free only iterates THIS loop created — e0 is the caller's frame
      // (spec callers reuse it across calls)
      if (prev ne e0) Iterates.free(prev)
    }
    e.join(support(e), Seq("a", "b"), "left")
      .select($"a".as("doc_a"), $"b".as("doc_b"),
        coalesce($"support", lit(0L)).as("support"))
  }

  /** LABEL PROPAGATION COMMUNITIES — synchronous LPA (Raghavan et al.,
    * Phys. Rev. E 76, 2007) over the near-dup graph at a FIXED round
    * count: each round, every node adopts the most frequent label among
    * its neighbors AND itself, ties broken by the smallest label. The
    * community view between the other two structural reports: connected
    * components ([[Dedup.dupClusters]]) lump everything a chain of weak
    * edges touches; k-core ([[kCore]]) keeps only the dense kernel; LPA
    * splits a component into its dense families while still assigning
    * EVERY node — the granularity at which "keep one per community"
    * curation actually operates.
    *
    * Determinism: synchronous updates + the min-label tie-break make
    * every round a pure function of the previous labeling, so a fixed
    * unroll is engine-reproducible (the [[pageRank]] discipline; the
    * twin unrolls the same rounds with MATERIALIZED CTEs). The
    * self-vote keeps two-node structures from oscillating. Per round:
    * one equi-join (neighbor labels) + one unionAll (self-vote) + one
    * partial-agged count + one per-node window rank — all shuffles on
    * node/label keys, each iterate checkpointed so round r never
    * re-derives rounds 1..r-1. */
  def labelPropagation(s: SparkSession, dir: String, rounds: Int = 4): DataFrame =
    labelPropagationFrom(edges(s, dir), rounds)

  /** Core of [[labelPropagation]] over any (a, b) a<b edge frame. */
  def labelPropagationFrom(e: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need rounds >= 1")
    import org.apache.spark.sql.expressions.Window
    val adj = adjacency(e).localCheckpoint(true)
    var labels = adj.select($"src".as("node")).distinct()
      .select($"node", $"node".as("label"))
    for (_ <- 1 to rounds) {
      val votes = adj
        .join(labels.select($"node".as("ln"), $"label"), $"src" === $"ln")
        .select($"dst".as("node"), $"label")
        .unionAll(labels)
      val w = Window.partitionBy($"node")
        .orderBy($"cnt".desc, $"label".asc)
      val prev = labels
      labels = votes.groupBy($"node", $"label").agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"node", $"label")
        .localCheckpoint(true)
      Iterates.free(prev) // no-op on the round-0 self-label projection
    }
    labels.select($"node".as("doc_id"), $"label".as("community"))
  }

  /** MODULARITY of the LPA partition (Newman & Girvan, Phys. Rev. E 69,
    * 2004): per community c, contribution e_c/m − (d_c/2m)² where e_c =
    * intra-community edges, d_c = degree sum, m = |E|; Q is the sum
    * over communities. The quality audit OVER [[labelPropagation]]'s
    * output: high-contribution communities are real template families
    * (dense inside, sparse out — delete-one-per confidently), a Q near
    * 0 says the "communities" are no better than random degree-matched
    * cuts and the curation should fall back to connected components.
    *
    * Determinism: e_c, d_c, m are integers (exact in any agg order);
    * the contribution is the same two IEEE double ops + round(6) on
    * both engines. m arrives via the one-row count the BcastMaxEdges
    * discipline already pays, not a crossJoin. Shape: the LPA rounds
    * (checkpointed), then one degree join + one two-sided label join
    * on the edge list + two bounded aggs. */
  def modularity(s: SparkSession, dir: String, rounds: Int = 4): DataFrame = {
    val e = edges(s, dir).localCheckpoint(true)
    val m = e.count().toDouble
    val lab = labelPropagationFrom(e, rounds)
      .select($"doc_id".as("node"), $"community")
    val degC = degrees(e).join(lab, "node")
      .groupBy($"community")
      .agg(count(lit(1)).as("n_nodes"), sum($"deg").as("deg_sum"))
    val intra = e
      .join(lab.select($"node".as("a"), $"community".as("ca")), "a")
      .join(lab.select($"node".as("b"), $"community".as("cb")), "b")
      .filter($"ca" === $"cb")
      .groupBy($"ca".as("community")).agg(count(lit(1)).as("intra_edges"))
    degC.join(intra, Seq("community"), "left")
      .select($"community", $"n_nodes", $"deg_sum",
        coalesce($"intra_edges", lit(0L)).as("intra_edges"),
        (round(coalesce($"intra_edges", lit(0L)).cast("double") / m
          - ($"deg_sum".cast("double") / (2 * m))
            * ($"deg_sum".cast("double") / (2 * m)), 6)
          // IEEE sign-of-zero normalization: a zero-intra-edge community
          // rounds to -0.0 on engines that keep the sign through round();
          // -0.0 + 0.0 = +0.0 canonicalizes both sides identically.
          + lit(0.0)).as("contribution"))
  }

  /** DEGREE ASSORTATIVITY (Newman, Phys. Rev. Lett. 89, 2002): the
    * Pearson correlation of endpoint degrees over the symmetrized edge
    * list — one number telling whether heavy documents duplicate with
    * other heavy documents (r > 0, concentrated template hubs; the
    * dedup survivor policy can rank by degree alone) or with the
    * long tail (r < 0, hub-and-spoke boilerplate; survivor choice
    * needs the cluster structure). Computed from the five integer
    * moment sums (n, Σjk, Σj, Σj², and their mirror — exact under any
    * agg order, BIGINT-safe at 100x since degrees are per-replica),
    * converted to IEEE doubles only in the final mean/sqrt formula and
    * rounded to 6 — the engine-neutral moments discipline of
    * rel_stats_agg. Shape: two broadcast-or-SMJ degree joins on the
    * adjacency + one single-row aggregate. */
  def assortativity(s: SparkSession, dir: String): DataFrame = {
    val e = edges(s, dir)
    val deg = degrees(e)
    val sums = adjacency(e)
      .join(deg.select($"node".as("src"), $"deg".as("dj")), "src")
      .join(deg.select($"node".as("dst"), $"deg".as("dk")), "dst")
      .agg(
        count(lit(1)).as("n2"),
        sum($"dj" * $"dk").as("sjk"),
        sum($"dj").as("sj"), sum($"dk").as("sk"),
        sum($"dj" * $"dj").as("sj2"), sum($"dk" * $"dk").as("sk2"))
    val n2d = $"n2".cast("double")
    val mj = $"sj".cast("double") / n2d
    val mk = $"sk".cast("double") / n2d
    sums.select(
      $"n2".as("n_directed_edges"),
      round(($"sjk".cast("double") / n2d - mj * mk)
        / (sqrt($"sj2".cast("double") / n2d - mj * mj)
          * sqrt($"sk2".cast("double") / n2d - mk * mk)), 6)
        .as("assortativity"))
  }

  /** ADAMIC-ADAR LINK PREDICTION — top-N non-adjacent document pairs
    * ranked by Σ_u 1/ln(deg(u)) over their common neighbors u (Adamic &
    * Adar, Social Networks 25(3), 2003). On the near-dup graph this is
    * the "missed duplicate" detector: two documents that share many
    * low-degree neighbors but no direct LSH edge are near-certainly the
    * same family — the pairs a curation run re-checks with an exact
    * Jaccard pass before trusting the banded index's negative.
    *
    * Scale shape: one wedge self-join on the center node — the same
    * Σ deg·(deg−1)/2 cost the triangle census pays — with hub centers
    * (deg > maxDeg) EXCLUDED from wedge generation before the join.
    * That cap is the standard link-prediction guard: a hub contributes
    * the least evidence per wedge (weight 1/ln(deg) is smallest there)
    * yet generates quadratically many wedge rows, so dropping hubs
    * bounds the join's fan-out at maxDeg²/2 per center while barely
    * moving the scores that matter. Per-wedge weights are rounded to 12
    * and summed in DECIMAL(38,12) — partial-agg order never moves a
    * score (the [[pageRank]] discipline) — then the existing edge set is
    * anti-joined away and the top N pairs are taken under the total
    * order (score desc, doc_a, doc_b): TakeOrderedAndProject, no global
    * sort materialization. */
  def adamicAdar(s: SparkSession, dir: String,
                 maxDeg: Int = 64, topN: Int = 50): DataFrame = {
    require(maxDeg >= 2 && topN >= 1, "need maxDeg >= 2 and topN >= 1")
    val e = edges(s, dir).localCheckpoint(true)
    val deg = degrees(e)
    // adjacency rows whose CENTER (src) is not a hub, carrying its degree;
    // deg >= 2 is implied by wedge formation, so ln(deg) > 0 always
    val adj = adjacency(e)
      .join(deg.filter($"deg" <= maxDeg), $"src" === $"node")
      .select($"src", $"dst", $"deg")
    val wedges = adj.as("l")
      .join(adj.as("r"), $"l.src" === $"r.src" && $"l.dst" < $"r.dst")
      .select($"l.dst".as("x"), $"r.dst".as("y"),
        round(lit(1.0) / log($"l.deg"), 12)
          .cast("decimal(38,12)").as("w"))
    val scored = wedges.groupBy($"x", $"y")
      .agg(sum($"w").as("aa_dec"), count(lit(1)).as("n_common"))
    scored
      .join(e, scored("x") === e("a") && scored("y") === e("b"), "left_anti")
      .select($"x".as("doc_a"), $"y".as("doc_b"),
        round($"aa_dec".cast("double"), 6).as("aa_score"), $"n_common")
      .orderBy($"aa_score".desc, $"doc_a", $"doc_b")
      .limit(topN)
  }

  /** RICH-CLUB COEFFICIENT — for each degree threshold k, the edge
    * density φ(k) = 2·E_k / (N_k·(N_k−1)) among the nodes of degree
    * > k (Colizza, Flammini, Serrano, Vespignani, Nature Physics 2,
    * 2006). On the near-dup graph this is the "do the heaviest
    * duplicators duplicate EACH OTHER" audit: a rising φ(k) says the
    * high-degree documents form one interlocked template family (one
    * survivor policy covers them all); a flat/falling curve says many
    * independent hubs (per-family policies needed). The five-row curve
    * is the shape a curation review reads next to the degree
    * distribution's tail.
    *
    * Shape: degrees localCheckpoint'd once; per threshold, one
    * filtered membership join pair on the edge list + two single-row
    * counts — |ks| bounded passes, output |ks| rows whatever the
    * graph. Counts are exact; φ divides once in double and rounds
    * to 6. */
  def richClub(s: SparkSession, dir: String,
               ks: Seq[Int] = Seq(2, 4, 8, 16, 32)): DataFrame =
    richClubFrom(edges(s, dir).localCheckpoint(true), ks)

  /** Core of [[richClub]] over any (a, b) a<b edge frame (callers pass
    * a materialized frame — the [[censusOf]] contract). */
  def richClubFrom(e: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"need thresholds >= 1, got $ks")
    val deg = degrees(e).localCheckpoint(true)
    ks.map { k =>
      val rich = deg.filter($"deg" > k)
      val nk = rich.agg(count(lit(1)).as("n_rich"))
      val ek = e
        .join(rich.select($"node".as("a")), "a")
        .join(rich.select($"node".as("b")), "b")
        .agg(count(lit(1)).as("e_rich"))
      nk.crossJoin(broadcast(ek))
        .select(lit(k.toLong).as("k"), $"n_rich", $"e_rich",
          when($"n_rich" >= 2,
            round($"e_rich" * 2.0 / ($"n_rich" * ($"n_rich" - 1)), 6))
            .otherwise(lit(0.0)).as("phi"))
    }.reduce(_ unionAll _)
  }

  /** CORENESS — the FULL k-core decomposition: every node labeled with
    * the largest k whose k-core contains it, via the iterated
    * neighborhood h-index (Lü, Zhou, Zhang, Stanley, Nature Comm. 7,
    * 2016): start each node at its degree and repeatedly set c(v) to
    * the h-index of its neighbors' current values — the sequence is
    * monotonically NONINCREASING and its fixpoint is exactly the core
    * number. Where [[kCore]] answers membership at ONE chosen k, this
    * is the whole density spectrum in a single pass — the artifact a
    * curation policy thresholds AFTER looking ("keep one doc per
    * family above coreness 5") instead of re-running a peel per k.
    *
    * Determinism: values are exact integers; the h-index is computed
    * from VALUE-GROUPED counts (max over distinct values v of
    * min(v, cumulative count) in value-descending order — identical
    * to ranking every neighbor row, see corenessFrom), so no tie
    * order exists to matter. Registered at a fixed round count
    * (the [[pageRank]] unroll discipline); GraphSpec proves the
    * fixture reaches the true peel-computed coreness within the
    * registered rounds AND that one more round moves nothing.
    * Shape per round: one adjacency equi-join + one map-side-combined
    * (node, value) count + a cumulative window over the collapsed
    * value frame — all keyed on the node, iterates checkpointed so
    * round r never re-derives rounds 1..r-1. */
  def coreness(s: SparkSession, dir: String, rounds: Int = 8): DataFrame =
    corenessFrom(edges(s, dir).localCheckpoint(true), rounds)

  /** Core of [[coreness]] over any (a, b) a<b edge frame (callers pass
    * a materialized frame — the [[censusOf]] contract). */
  def corenessFrom(e: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    import org.apache.spark.sql.expressions.Window
    val adj = adjacency(e).localCheckpoint(true)
    val deg = degrees(e).localCheckpoint(true)
    var c = deg.select($"node", $"deg".cast("long").as("cv"))
    for (_ <- 1 to rounds) {
      // h-index of the neighbor multiset from VALUE-GROUPED counts:
      // with distinct values v_1 > v_2 > ... and cumulative counts
      // c_j = Σ_{i<=j} cnt_i, h = max_j min(v_j, c_j) — identical to
      // ranking every neighbor row (max_i min(i, nv_i)): within a
      // value group the best rank is the group's last row, i.e. c_j.
      // The (dst, nv) partial agg is map-side combinable, so the
      // exchange carries grouped counts instead of every adjacency
      // row, and the rank sort shrinks to the per-node DISTINCT core
      // values (which collapse hard after the first rounds). r17
      // measured the per-row rank-window form at 2x this at 10x
      // (22.7 -> 13.4 s warm solo) with bit-identical output.
      val w = Window.partitionBy($"dst").orderBy($"nv".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = c
      c = adj.join(prev.select($"node".as("src"), $"cv".as("nv")), "src")
        .groupBy($"dst", $"nv")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum($"cnt").over(w))
        .groupBy($"dst")
        .agg(max(least($"cum", $"nv")).as("cv"))
        .select($"dst".as("node"), $"cv")
        .localCheckpoint(true)
      Iterates.free(prev) // no-op on the round-0 degree projection
    }
    deg.join(c, "node")
      .select($"node".as("doc_id"), $"deg".as("degree"), $"cv".as("coreness"))
  }

  /** NEIGHBORHOOD-JACCARD LINK PREDICTION — top-N non-adjacent pairs
    * ranked by |N(x)∩N(y)| / |N(x)∪N(y)| (Liben-Nowell & Kleinberg,
    * CIKM'03's structural-similarity baseline). The NORMALIZED
    * complement of [[adamicAdar]]: AA rewards many rare common
    * neighbors in absolute terms, so high-degree pairs dominate its
    * head; the Jaccard score divides the overlap by the union, so a
    * low-degree pair whose neighborhoods coincide ENTIRELY outranks a
    * hub pair that shares a sliver — the "same family, different
    * shard" signal a survivor-selection pass ranks by when it decides
    * which unlinked documents to re-probe with an exact verify.
    *
    * Scale shape: identical to [[adamicAdar]] — one hub-capped wedge
    * self-join (centers with deg > maxDeg excluded before the join
    * bounds fan-out at maxDeg²/2 per center; the overlap count is then
    * a LOWER bound for hub-coupled pairs, the standard cap semantics
    * documented there) + two degree joins for the denominator (FULL
    * degrees — the cap prunes wedge generation, not the union size),
    * one anti-join against the edge set, TakeOrderedAndProject under
    * the total order (jaccard desc, doc_a, doc_b). |N(x)∩N(y)| and the
    * degrees are exact integers, so only the final division is IEEE —
    * one rounded op, engine-stable. */
  def jaccardNeighbors(s: SparkSession, dir: String,
                       maxDeg: Int = 64, topN: Int = 50): DataFrame =
    jaccardNeighborsFrom(edges(s, dir).localCheckpoint(true), maxDeg, topN)

  /** Core of [[jaccardNeighbors]] over any (a, b) a<b edge frame.
    * Callers pass a materialized frame (the [[censusOf]] contract):
    * the body references it in the wedge join, both degree joins and
    * the anti-join. */
  def jaccardNeighborsFrom(e: DataFrame, maxDeg: Int, topN: Int): DataFrame = {
    require(maxDeg >= 2 && topN >= 1, "need maxDeg >= 2 and topN >= 1")
    val deg = degrees(e)
    val adjCapped = adjacency(e)
      .join(deg.filter($"deg" <= maxDeg), $"src" === $"node")
      .select($"src", $"dst")
    val common = adjCapped.as("l")
      .join(adjCapped.as("r"), $"l.src" === $"r.src" && $"l.dst" < $"r.dst")
      .groupBy($"l.dst".as("x"), $"r.dst".as("y"))
      .agg(count(lit(1)).as("n_common"))
    val scored = common
      .join(deg.select($"node".as("x"), $"deg".as("dx")), "x")
      .join(deg.select($"node".as("y"), $"deg".as("dy")), "y")
      .select($"x", $"y", $"n_common",
        round($"n_common".cast("double")
          / ($"dx" + $"dy" - $"n_common"), 6).as("nbr_jaccard"))
    scored
      .join(e, scored("x") === e("a") && scored("y") === e("b"), "left_anti")
      .select($"x".as("doc_a"), $"y".as("doc_b"), $"nbr_jaccard", $"n_common")
      .orderBy($"nbr_jaccard".desc, $"doc_a", $"doc_b")
      .limit(topN)
  }

  /** PERSONALIZED PAGERANK — random-walk-with-restart mass from a SEED
    * SET, not the uniform prior: restart probability 0.15 is split over
    * the seeds only, so rank mass stays concentrated in the seeds'
    * duplication orbit. The curation question this answers is the dual
    * of [[pageRank]]'s: not "which documents are central overall" but
    * "which documents sit downstream of THESE known templates" — the
    * contamination tracer you run when a boilerplate family is
    * identified and you want every document it plausibly seeded,
    * ranked by proximity.
    *
    * Seeds are a deterministic md5 coin (hash60(node) % seedMod == 0 —
    * the [[triangleSample]] discipline), so both engines trace the same
    * orbit; any caller-supplied seed frame slots into the same body.
    * Arithmetic follows [[pageRank]] exactly — DECIMAL(27,10)
    * contribution sums, every iterate rounded to 8 so the engines
    * iterate on identical doubles — with two deltas: the restart term
    * is `0.15/|S|` on seeds and 0 elsewhere, and the sum join is LEFT
    * (a node outside the orbit receives no mass this iteration — in
    * plain PageRank that cannot happen, here it is the common case).
    * Output keeps only pr > 0 rows: nodes within `iters` hops of a
    * seed — output is bounded by the orbit, not the graph.
    *
    * Shape per iteration: one equi-join + one DECIMAL agg + one left
    * join, adjacency localCheckpoint'd once, iterates checkpointed
    * (the [[pageRank]] lineage policy). At 100 TB the frontier stays
    * orbit-sized while the plan stays fixed. */
  def personalizedPageRank(s: SparkSession, dir: String,
                           iters: Int = 3, seedMod: Int = 16): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1, 8], got $iters")
    require(seedMod >= 2, s"seedMod must be >= 2, got $seedMod")
    val (adj, nodes, _) = prSetup(s, dir)
    val seeded = nodes.withColumn("is_seed",
      graft.functions.EngineNeutral.hash60($"node".cast("string"))
        % seedMod === 0)
    val ns = seeded.filter($"is_seed").agg(count(lit(1)).as("ns"))
    var ranks = seeded.crossJoin(broadcast(ns))
      .select($"node", $"deg",
        when($"is_seed", round(lit(1.0) / $"ns", 8))
          .otherwise(lit(0.0)).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = adj
        .join(ranks.select($"node", ($"pr" / $"deg").as("c")),
          $"src" === $"node")
        .select($"dst", $"c".cast("decimal(27,10)").as("c"))
      val sums = contrib.groupBy($"dst").agg(sum($"c").as("sc"))
      val prev = ranks
      ranks = seeded.crossJoin(broadcast(ns))
        .join(sums, $"node" === $"dst", "left")
        .select($"node", $"deg",
          round(
            when($"is_seed", lit(0.15) / $"ns").otherwise(lit(0.0)) +
              lit(0.85) * coalesce($"sc".cast("double"), lit(0.0)), 8)
            .as("pr"))
        .localCheckpoint(true)
      Iterates.free(prev) // no-op on the start projection
    }
    ranks.filter($"pr" > 0.0)
      .join(seeded.select($"node", $"is_seed"), "node")
      .select($"node".as("doc_id"), $"is_seed", $"pr")
  }

  /** DETERMINISTIC RANDOM WALKS — a DeepWalk-style walk corpus over the
    * near-dup graph (Perozzi, Al-Rfou & Skiena, KDD'14: truncated walks
    * as the "sentences" an embedding model trains on). One walk starts
    * at every node; at step t the walk at `cur` moves to the neighbor
    * minimizing hash60(start ⧺ "#wt#" ⧺ neighbor) — a per-(walk, step)
    * seeded draw from the engine-neutral md5 kernel, so the walk is a
    * pure function of the graph: both engines trace IDENTICAL paths
    * (the twin is a hash match) and a re-run is reproducible, the
    * property an embedding-training corpus needs for exact lineage.
    * The seed varies by start AND step, so two walks meeting at a node
    * diverge again and one walk revisiting a node need not cycle.
    *
    * Output: (start, step, node) long format, step 0..steps — one row
    * per walk position, `steps`·|V| + |V| rows total.
    *
    * Shape: per step ONE equi-join of the ≤|V|-row frontier against the
    * adjacency plus one bounded agg (min of a 2-field struct per walk —
    * partial-aggregated, so the exchange carries one row per walk per
    * partition). Fixed unroll, the [[pageRank]] discipline: iteration
    * count is a plan shape, convergence loops are driver policy; the
    * edge set is localCheckpoint'd once so the LSH derivation runs once,
    * not once per step. At 100 TB: frontier and adjacency co-partition
    * on the join key after the first step's exchange, and walk count
    * scales with |V| — never edge-quadratic. Tie-break inside the
    * struct min is (hash, neighbor) lexicographic, total order. */
  def randomWalks(s: SparkSession, dir: String, steps: Int = 3): DataFrame = {
    require(steps >= 1 && steps <= 8, s"steps must be in [1, 8], got $steps")
    val adj = adjacency(edges(s, dir).localCheckpoint(true))
    val w0 = adj.select($"src".as("start")).distinct()
      .select($"start", lit(0).as("step"), $"start".as("node"))
    var cur = w0
    var acc = w0
    for (t <- 1 to steps) {
      val nxt = cur.select($"start", $"node".as("cw"))
        .join(adj, $"cw" === $"src")
        .groupBy($"start")
        .agg(min(struct(
          graft.functions.EngineNeutral.hash60(
            concat($"start".cast("string"), lit(s"#w$t#"),
              $"dst".cast("string"))).as("h"),
          $"dst".as("d"))).as("pick"))
        .select($"start", lit(t).as("step"), $"pick.d".as("node"))
        // materialize each step once: step t's plan is referenced TWICE
        // (the output union and step t+1's frontier), and the lazy
        // unroll leaves the dedup to exchange reuse — which the r16
        // driver bench measured failing under a tight heap (7.4x). A
        // stored |V|-row frame per step is the bounded-plan form; the
        // superseded frontiers stay referenced by the output union, so
        // nothing is freed here.
        .localCheckpoint(true)
      acc = acc.unionByName(nxt)
      cur = nxt
    }
    acc
  }

  /** EIGENVECTOR CENTRALITY — power iteration x ← A·x / ‖A·x‖₁ on the
    * symmetrized near-dup adjacency (Bonacich, J. Math. Sociol. 2,
    * 1972), uniform start. Where [[pageRank]]'s damping teleport gives
    * every node a floor, eigenvector centrality gives mass ONLY through
    * structure: a document scores high iff its neighbors score high —
    * the sharpest "center of the densest duplication family" signal,
    * and the one that collapses fastest onto the dominant clique (the
    * family to audit first).
    *
    * Determinism (the [[pageRank]] discipline): neighbor sums in
    * DECIMAL(27,10) — exact under any partial-agg order — the L1
    * normalizer is one more DECIMAL sum over those sums (every term
    * positive, so ‖·‖₁ is the plain total), and each normalized iterate
    * rounds to 8 so both engines iterate on identical doubles. Every
    * node has deg ≥ 1 and the start vector is strictly positive, so
    * every node receives mass each iteration — the sum join stays
    * inner. Shape per iteration: one equi-join + one DECIMAL agg + one
    * single-row broadcast normalizer; adjacency localCheckpoint'd once,
    * iterates checkpointed (bounded plans at any iteration count). */
  def eigenCentrality(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1, 8], got $iters")
    val (adj, nodes, n) = prSetup(s, dir)
    // Start from the CONSTANT vector 1.0, not prStart's round(1/N, 8):
    // the first L1 normalization cancels any uniform positive constant
    // (sc_v = c*deg(v), sc_v/Σsc is c-free), so the output is byte-
    // identical to the 1/N start — but round(1/N, 8) underflows to 0.0
    // past N ≈ 2e8 nodes, which would zero the normalizer and null
    // every centrality. pageRank keeps 1/N because its damped update
    // genuinely depends on the start scale; it shares the same N bound,
    // documented there.
    var x = nodes.select($"node", $"deg", lit(1.0).as("pr"))
    for (_ <- 1 to iters) {
      val sums = adj
        .join(x.select($"node", $"pr".cast("decimal(27,10)").as("c")),
          $"src" === $"node")
        .groupBy($"dst").agg(sum($"c").as("sc"))
      val norm = sums.agg(sum($"sc").as("tot"))
      val prev = x
      x = nodes.join(sums, $"node" === $"dst")
        .crossJoin(broadcast(norm))
        .select($"node", $"deg",
          round($"sc".cast("double") / $"tot".cast("double"), 8).as("pr"))
        .localCheckpoint(true)
      Iterates.free(prev) // no-op on the constant-1 start projection
    }
    x.select($"node".as("doc_id"), $"deg".as("degree"),
      $"pr".as("centrality"))
  }

  /** HITS HUBS & AUTHORITIES (Kleinberg, JACM 46(5), 1999) over the
    * near-dup pair graph ORIENTED low→high doc_id — the pair list's
    * native (doc_a < doc_b) direction, so the orientation is
    * deterministic and engine-neutral by construction. A node is a
    * strong HUB when its out-edges point at strong authorities (an
    * early/low-id document whose near-dups are themselves heavily
    * duplicated — the template's likely origin), a strong AUTHORITY
    * when strong hubs point at it (a late/high-id copy that many
    * origin-side documents resolve to). Alongside [[pageRank]] (damped
    * undirected mass) and [[eigenCentrality]] (pure structural mass)
    * this is the directed, two-sided member of the centrality family.
    *
    * Determinism (the [[eigenCentrality]] discipline): both update
    * sums in DECIMAL(27,10) — exact under any partial-agg order — the
    * normalizer is the L1 total of those sums (all terms positive),
    * each normalized iterate rounds to 8 so both engines iterate on
    * identical doubles, and the start is the constant-1 hub vector
    * (the first normalization cancels any uniform constant, so there
    * is no 1/N underflow bound here at all). Totality: nodes with no
    * out-edges (never a hub) or no in-edges (never an authority) are
    * kept by the final left joins with score 0.
    *
    * Shape per iteration: two equi-joins + two DECIMAL aggs + two
    * single-row broadcast normalizers; the oriented edge list is
    * localCheckpoint'd once, iterates checkpointed (bounded plans at
    * any iteration count) — pageRank's lineage discipline. */
  def hits(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1, 8], got $iters")
    val e = edges(s, dir).select($"a".as("src"), $"b".as("dst"))
      .localCheckpoint(true)
    val nodes = e.select($"src".as("node"), lit(1L).as("od"), lit(0L).as("id"))
      .unionByName(e.select($"dst".as("node"), lit(0L).as("od"), lit(1L).as("id")))
      .groupBy($"node")
      .agg(sum($"od").as("out_deg"), sum($"id").as("in_deg"))
      .localCheckpoint(true)
    var hub = nodes.select($"node", lit(1.0).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val prevHub = hub
      val prevAuth = auth
      val asums = e
        .join(prevHub.select($"node", $"h".cast("decimal(27,10)").as("c")),
          $"src" === $"node")
        .groupBy($"dst").agg(sum($"c").as("sa"))
      val anorm = asums.agg(sum($"sa").as("tot"))
      auth = asums.crossJoin(broadcast(anorm))
        .select($"dst".as("node"),
          round($"sa".cast("double") / $"tot".cast("double"), 8).as("au"))
        .localCheckpoint(true)
      if (prevAuth != null) Iterates.free(prevAuth) // superseded half-step
      val hsums = e
        .join(auth.select($"node", $"au".cast("decimal(27,10)").as("c")),
          $"dst" === $"node")
        .groupBy($"src").agg(sum($"c").as("sh"))
      val hnorm = hsums.agg(sum($"sh").as("tot"))
      hub = hsums.crossJoin(broadcast(hnorm))
        .select($"src".as("node"),
          round($"sh".cast("double") / $"tot".cast("double"), 8).as("h"))
        .localCheckpoint(true)
      Iterates.free(prevHub) // no-op on the constant-1 start projection
    }
    nodes
      .join(hub, Seq("node"), "left")
      .join(auth, Seq("node"), "left")
      .select($"node".as("doc_id"), $"out_deg", $"in_deg",
        coalesce($"h", lit(0.0)).as("hub"),
        coalesce($"au", lit(0.0)).as("authority"))
  }

  /** MULTI-SOURCE BFS HOP DISTANCE — minimum hop count from a seed set
    * to every node within `maxHops` of it in the near-dup graph: the
    * contamination-radius audit (how far a flagged template family
    * propagates through near-dup links before full-connectivity
    * labeling — [[Dedup.dupClusters]] — would merge everything it
    * touches), and the hop-bounded reachability primitive under it.
    * Seeds are the `nSeeds` smallest doc_ids in the corpus —
    * deterministic and engine-neutral; seed rows report hops = 0
    * whether or not they appear in any near-dup pair.
    *
    * Shape: adjacency localCheckpoint'd once (the [[pageRank]] lineage
    * discipline); each level is frontier ⋈ adjacency → distinct new
    * nodes → anti-join the visited set, then the level checkpoints.
    * The anti-join is what keeps BFS linear on clique-heavy dedup
    * graphs: without it the frontier re-expands clique interiors every
    * level (path counts, not node counts). Per-level cost is the
    * frontier's out-edge volume; `maxHops` levels total — the
    * [[Dedup.dupClusters]] min-propagation cost model restricted to a
    * fixed round count. Output: one row per reached node with its
    * exact hop distance. */
  def bfsDistance(s: SparkSession, dir: String, nSeeds: Int = 8,
                  maxHops: Int = 3): DataFrame = {
    require(nSeeds >= 1, s"nSeeds must be >= 1, got $nSeeds")
    require(maxHops >= 1 && maxHops <= 8, s"maxHops must be in [1, 8], got $maxHops")
    val adj = adjacency(edges(s, dir)).localCheckpoint(true)
    val seeds = graft.sources.Tables.documents(s, dir)
      .select($"doc_id").orderBy($"doc_id").limit(nSeeds)
      .select($"doc_id".as("node"), lit(0L).as("hops"))
      .localCheckpoint(true)
    var visited = seeds
    var frontier = seeds
    for (h <- 1 to maxHops) {
      val nxt = frontier.join(adj, $"node" === $"src")
        .select($"dst".as("node")).distinct()
        .join(visited.select($"node".as("vn")), $"node" === $"vn", "left_anti")
        .select($"node", lit(h.toLong).as("hops"))
        .localCheckpoint(true)
      visited = visited.unionByName(nxt)
      frontier = nxt
    }
    visited.select($"node".as("doc_id"), $"hops")
  }

  /** SAMPLED BETWEENNESS CENTRALITY — Brandes' dependency accumulation
    * (Brandes, J. Math. Sociol. 25(2), 2001) from a fixed seed sample,
    * hop-bounded (the k-source estimator of Bader, Kintali, Madduri &
    * Mihail, WAW 2007): forward multi-source BFS layers carrying exact
    * shortest-path counts σ, then the backward sweep δ(v) = Σ_w
    * σ_v/σ_w · (1 + δ(w)) over the successor layer, summed over
    * sources. The path-based member of the centrality family: where
    * [[pageRank]]/[[eigenCentrality]] score mass concentration and
    * [[hits]] directed endorsement, betweenness scores BROKERAGE — a
    * document with high betweenness but modest degree is the bridge
    * stitching two template families into one CC, exactly the document
    * to re-examine before trusting transitive-closure dedup survivors.
    *
    * Determinism: seeds are the `nSeeds` smallest doc_ids (the
    * [[bfsDistance]] convention); σ sums are BIGINT-exact; each
    * backward contribution rounds the IEEE expression
    * CAST(σ_v)/σ_w · (1 + δ_w) to 12, sums in DECIMAL(38,12) (exact
    * under any partial-agg order — the Adamic-Adar discipline), and
    * each layer's δ rounds to 8 so both engines sweep on identical
    * doubles; the final per-node sum over sources is one DECIMAL agg
    * rounded to 6. Shape: maxHops frontier joins forward (each one
    * equi-join + one partial-agged BIGINT sum + one anti-join, layers
    * checkpointed — the pageRank lineage discipline), maxHops joins
    * backward, one final bounded agg; nothing wedge-sized, no driver
    * loop beyond the fixed hop count. */
  def betweenness(s: SparkSession, dir: String, nSeeds: Int = 8,
                  maxHops: Int = 3): DataFrame = {
    require(nSeeds >= 1, s"nSeeds must be >= 1, got $nSeeds")
    require(maxHops >= 1 && maxHops <= 6, s"maxHops must be in [1, 6], got $maxHops")
    val e = edges(s, dir).localCheckpoint(true)
    val adj = adjacency(e).localCheckpoint(true)
    val allNodes = degrees(e).select($"node")
    val seeds = graft.sources.Tables.documents(s, dir)
      .select($"doc_id").orderBy($"doc_id").limit(nSeeds)
      .select($"doc_id".as("start"))
    // forward: per (start, node) layer frames with exact path counts
    val f0 = seeds.select($"start", $"start".as("node"), lit(1L).as("sigma"))
      .localCheckpoint(true)
    val layers = scala.collection.mutable.ArrayBuffer(f0)
    var visited = f0.select($"start", $"node")
    for (_ <- 1 to maxHops) {
      val nxt = layers.last
        .join(adj, $"node" === $"src")
        .groupBy($"start", $"dst").agg(sum($"sigma").as("sigma"))
        .join(visited.select($"start".as("vs"), $"node".as("vn")),
          $"start" === $"vs" && $"dst" === $"vn", "left_anti")
        .select($"start", $"dst".as("node"), $"sigma")
        .localCheckpoint(true)
      val prevVisited = visited
      visited = prevVisited.unionByName(nxt.select($"start", $"node"))
        .localCheckpoint(true)
      // the layer frames stay (the backward sweep reads them); only the
      // superseded visited accumulator is dead. No-op on the f0 start.
      Iterates.free(prevVisited)
      layers += nxt
    }
    // backward: δ per layer, deepest first (δ of the deepest layer = 0)
    var delta = layers(maxHops)
      .select($"start", $"node", lit(0.0).as("d"))
      .localCheckpoint(true)
    val deltas = scala.collection.mutable.ArrayBuffer(delta)
    for (h <- (maxHops - 1) to 1 by -1) { // δ_0 (the seed layer) is unused
      val succ = layers(h + 1).select(
        $"start".as("ws"), $"node".as("wn"), $"sigma".as("wsig"))
      val dw = delta.select($"start".as("ds"), $"node".as("dn"), $"d".as("dw"))
      val contrib = layers(h)
        .join(adj, $"node" === $"src")
        .join(succ, $"start" === $"ws" && $"dst" === $"wn")
        .join(dw, $"start" === $"ds" && $"dst" === $"dn")
        .select($"start", $"node",
          round($"sigma".cast("double") / $"wsig" * (lit(1.0) + $"dw"), 12)
            .cast("decimal(38,12)").as("c"))
        .groupBy($"start", $"node")
        .agg(round(sum($"c").cast("double"), 8).as("dsum"))
      delta = layers(h).select($"start", $"node")
        .join(contrib, Seq("start", "node"), "left")
        .select($"start", $"node", coalesce($"dsum", lit(0.0)).as("d"))
        .localCheckpoint(true)
      deltas += delta
    }
    // B(v) = Σ_sources δ_s(v) over layers 1..maxHops (v ≠ s); each
    // reached (start, node) sits in exactly one layer, so the union is
    // duplicate-free and one DECIMAL agg closes the estimator
    val reached = deltas.reverse // δ frames for layers maxHops..1 → 1..maxHops
    val b = reached.reduce(_ unionAll _)
      .select($"node", $"d".cast("decimal(27,10)").as("d"))
      .groupBy($"node")
      .agg(round(sum($"d").cast("double"), 6).as("betweenness"))
    allNodes.join(b, Seq("node"), "left")
      .select($"node".as("doc_id"),
        coalesce($"betweenness", lit(0.0)).as("betweenness"))
  }

  /** SAMPLED HARMONIC CENTRALITY — C_h(v) = Σ_s 1/d(s, v) over the
    * fixed seed sample, hop-bounded (Boldi & Vigna, "Axioms for
    * Centrality", Internet Math. 10, 2014 — the closeness variant that
    * stays well-defined on disconnected graphs, which a near-dup graph
    * ALWAYS is: unreachable pairs contribute 0, not a broken ∞). The
    * distance-based member of the centrality family alongside
    * [[betweenness]] (brokerage) and [[pageRank]] (mass): a document
    * with high harmonic centrality is CLOSE to many seed templates at
    * once — the "sits near everything" hub a curation reviewer reads
    * first. Same estimator policy as [[betweenness]]/[[bfsDistance]]:
    * seeds are the nSeeds smallest doc_ids, distances exact within
    * maxHops.
    *
    * Shape: the [[betweenness]] forward sweep WITHOUT σ bookkeeping —
    * maxHops frontier expansions, each one equi-join + distinct + one
    * anti-join, layers checkpointed; per-layer contributions 1/h are
    * the same literal for every row of a layer, rounded to 12 and
    * summed in DECIMAL (order-independent), closed with one round-6.
    * Per-seed frontier state is |S|·reach rows — the k-source sampling
    * is exactly what makes this affordable at 100 TB (all-sources
    * closeness is Θ(V·E); HyperBall-style sketched closeness is the
    * [[hyperBall]] machinery if the full-V variant is ever needed). */
  def harmonicCentrality(s: SparkSession, dir: String, nSeeds: Int = 8,
                         maxHops: Int = 3): DataFrame = {
    require(nSeeds >= 1, s"nSeeds must be >= 1, got $nSeeds")
    require(maxHops >= 1 && maxHops <= 6, s"maxHops must be in [1, 6], got $maxHops")
    val e = edges(s, dir).localCheckpoint(true)
    val adj = adjacency(e).localCheckpoint(true)
    val allNodes = degrees(e).select($"node")
    val seeds = graft.sources.Tables.documents(s, dir)
      .select($"doc_id").orderBy($"doc_id").limit(nSeeds)
      .select($"doc_id".as("start"))
    var visited = seeds.select($"start", $"start".as("node"), lit(0L).as("hops"))
      .localCheckpoint(true)
    var frontier = visited.select($"start", $"node")
    for (h <- 1 to maxHops) {
      val nxt = frontier.join(adj, $"node" === $"src")
        .select($"start", $"dst".as("node")).distinct()
        .join(visited.select($"start".as("vs"), $"node".as("vn")),
          $"start" === $"vs" && $"node" === $"vn", "left_anti")
        .select($"start", $"node", lit(h.toLong).as("hops"))
        .localCheckpoint(true)
      visited = visited.unionByName(nxt).localCheckpoint(true)
      frontier = nxt.select($"start", $"node")
    }
    val contrib = visited.filter($"hops" > 0)
      .select($"node",
        round(lit(1.0) / $"hops".cast("double"), 12)
          .cast("decimal(38,12)").as("c"))
      .groupBy($"node")
      .agg(count(lit(1)).as("n_sources_reached"),
        round(sum($"c").cast("double"), 6).as("harmonic"))
    allNodes.join(contrib, Seq("node"), "left")
      .select($"node".as("doc_id"),
        coalesce($"n_sources_reached", lit(0L)).as("n_sources_reached"),
        coalesce($"harmonic", lit(0.0)).as("harmonic"))
  }

  // ---- HyperBall neighborhood function ----------------------------------

  /** HyperBall register geometry: 64 registers (top 6 bits of the
    * shared 60-bit hash), 54-bit remainder → ranks in [1, 55]. The
    * coarser-than-[[Dedup.hllRegistersFrom]] grid (64 vs 256 registers)
    * is deliberate: the sketch is carried PER NODE per iteration, so
    * register count multiplies every shuffle of the whole run — 64
    * registers (±13% per ball) is the published HyperBall operating
    * point for graphs where per-node memory is the binding constraint
    * (Boldi & Vigna run p=4..8 at web scale), and ball sums over many
    * components average the per-component error well below that. */
  private val HbRemBits = 54
  private val HbRegs = 64L
  /** α_64 · m² (Flajolet et al. AofA'07 give α_64 = 0.709) and the
    * 2^55 integer scale of the harmonic denominator — both folded to
    * the exact doubles the twin SQL interpolates. */
  private[graft] val HbAlphaM2: Double = 0.709 * 64.0 * 64.0
  private[graft] val HbPow: Double = (1L << (HbRemBits + 1)).toDouble

  private def hbParts(h: org.apache.spark.sql.Column) = {
    val rem = h.bitwiseAND(lit((1L << HbRemBits) - 1))
    (shiftright(h, HbRemBits),
      when(rem === 0, lit(HbRemBits + 1))
        .otherwise(lit(HbRemBits + 1) - length(bin(rem))).cast("long"))
  }

  /** Register iterate in PACKED form — the exchange-width fix (r16).
    *
    * The iterate is LOGICALLY a (node, reg, mj) frame, and through r15
    * it was carried that way: every hop's adjacency join + re-max moved
    * 64·(E+V) rows, which made hyperball/closeness_sketch ~45% of the
    * whole 10× bench leg. Packed, each node carries ONE 64-byte
    * BinaryType blob (byte[reg] = mj, 0 = absent —
    * [[graft.functions.PackRegExpr]]); the hop join moves (E+V) rows of
    * ~80 B and the merge is a bytewise-MAX aggregate
    * ([[graft.functions.RegMaxAgg]], map-side combinable, so the
    * exchange is bounded by V·partitions rows whatever E is). Register
    * CONTENT is identical to the row form — [[hbSummary]] reads back
    * the exact integers (n_regs, Σ 2^(55−mj)) the estimator consumed
    * before, so estimates (and the DuckDB twin, which still iterates
    * the logical row frame) are bit-identical. Init-blob and hop frames
    * are localCheckpoint'ed like every iterate in this file. */
  private def hbInitBlobs(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val (reg, rho) = hbParts(graft.functions.EngineNeutral.hash60(
      concat(lit("hb|"), $"node".cast("string"))))
    val blob = Bridge.column(graft.functions.PackRegExpr(
      Bridge.expression(reg), Bridge.expression(rho), HbRegs.toInt))
    degrees(e).select($"node").select($"node", blob.as("blob"))
  }

  /** One HyperBall hop over packed registers: neighbors' blobs union
    * the node's own, register-wise MAX per node. */
  private def hbHopBlobs(adj: DataFrame, regs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val regMax = Bridge.column(graft.functions.RegMaxAgg(
      Bridge.expression($"blob")).toAggregateExpression())
    adj.join(regs, $"node" === $"src")
      .select($"dst".as("node"), $"blob")
      .unionAll(regs)
      .groupBy($"node").agg(regMax.as("blob"))
  }

  /** (node, n_regs, s_present) readout of a packed frame — the exact
    * integers the row form aggregated per (node, reg) group. */
  private def hbSummary(regs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val st = Bridge.column(graft.functions.RegSummaryExpr(
      Bridge.expression($"blob"), HbRemBits + 1))
    regs.select($"node", st.as("st"))
      .select($"node", $"st"("n_regs").as("n_regs"),
        $"st"("s_present").as("s_present"))
  }

  /** HLL ball estimate from the (n_regs, s_present) readout: harmonic
    * denominator carried as the exact integer Σ 2^(55−mj) (+ 2^55 per
    * empty register — the [[Dedup.hllEstFrom]] discipline at the
    * 64-register grid), raw-vs-linear-counting branch per the paper,
    * rounded to 4 dp as DECIMAL(20,4). */
  private def hbBallCol: org.apache.spark.sql.Column = {
    val vZero = lit(HbRegs) - $"n_regs"
    val sScaled = $"s_present" + vZero * lit(1L << (HbRemBits + 1))
    val raw = lit(HbAlphaM2) * lit(HbPow) / sScaled.cast("double")
    val m = HbRegs.toDouble
    val est = when(raw <= lit(2.5 * m) && vZero > 0,
      lit(m) * log(lit(m) / vZero.cast("double"))).otherwise(raw)
    round(est, 4).cast("decimal(20,4)")
  }

  /** One curve row per hop: per-node estimates summed in DECIMAL
    * (order-independent) into the hop's reachable-pair mass. */
  private def hbHopRow(regs: DataFrame, hop: Int): DataFrame =
    hbSummary(regs).select(hbBallCol.as("ball"))
      .agg(count(lit(1)).as("n_nodes"), sum($"ball").as("pairs_dec"))
      .select(lit(hop.toLong).as("hops"), $"n_nodes", $"pairs_dec")

  /** Per-node HLL ball estimate (node, ball) of one packed frame —
    * the per-node view of [[hbHopRow]], same denominator/branch/round-4
    * discipline, ball carried as DECIMAL(20,4). */
  private def hbNodeEst(regs: DataFrame): DataFrame =
    hbSummary(regs).select($"node", hbBallCol.as("ball"))

  /** SKETCHED CLOSENESS (HyperBall's headline use) — HARMONIC
    * centrality for EVERY node, estimated from the per-node ball
    * sketches: C_h(v) ≈ Σ_{t=1..maxHops} (|B(v,t)| − |B(v,t−1)|)/t,
    * the telescoped form Boldi & Vigna compute at web scale (ICDMW'13
    * §3 — the whole point of HyperBall is that this needs only the
    * ball CARDINALITIES, which the sketches carry). The full-V
    * complement of [[harmonicCentrality]]: that one is EXACT but from
    * a seed SAMPLE (per-seed BFS state is |S|·reach rows — all-sources
    * is Θ(V·E)); this one scores every node at once for the price of
    * the register rounds, with ±13% HLL noise per ball. A curation run
    * uses them together: the sketch ranks the whole corpus, the exact
    * sampled sweep audits the sketch where it matters.
    *
    * Determinism: ball estimates are the [[hyperBall]] round-4
    * decimals; hop deltas are exact DECIMAL differences clamped at 0
    * (register growth makes balls monotone except at the raw/linear
    * branch crossover, where an ulp-scale dip is possible); each /t
    * term rounds to 8 and the 4-term sum is a FIXED-ORDER chain of
    * double adds — no aggregation-order hazard — closed with one
    * round-6. Shape: the [[hyperBall]] register rounds (checkpointed)
    * plus one bounded per-node aggregate per hop and a |V|-row 5-way
    * equi-join on node. */
  def closenessSketch(s: SparkSession, dir: String, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, s"maxHops must be in [1, 8], got $maxHops")
    val e = edges(s, dir).localCheckpoint(true)
    val adj = adjacency(e).localCheckpoint(true)
    var regsNow = hbInitBlobs(e).localCheckpoint(true)
    val balls = scala.collection.mutable.ArrayBuffer(
      hbNodeEst(regsNow).select($"node", $"ball".as("b0")))
    for (h <- 1 to maxHops) {
      regsNow = hbHopBlobs(adj, regsNow).localCheckpoint(true)
      balls += hbNodeEst(regsNow).select($"node", $"ball".as(s"b$h"))
    }
    val joined = balls.reduce((a, b) => a.join(b, "node"))
    val terms = (1 to maxHops).map { h =>
      round(greatest(lit(0.0),
        (col(s"b$h") - col(s"b${h - 1}")).cast("double")) / h, 8)
    }
    joined.select($"node".as("doc_id"),
      round(col(s"b$maxHops").cast("double"), 4).as("est_ball"),
      round(terms.reduce(_ + _), 6).as("est_harmonic"))
  }

  /** HYPERBALL NEIGHBORHOOD FUNCTION — the distance distribution of the
    * near-dup graph without ever materializing distances: per node, an
    * HLL sketch of the ball B(v, h) (all nodes within h hops), advanced
    * one hop per round by register-wise MAX over the node's neighbors
    * (Boldi & Vigna, "In-Core Computation of Geometric Centralities
    * with HyperBall", ICDMW 2013; the HyperANF estimator of Boldi,
    * Rosa & Vigna, WWW 2011). Output: one row per hop h = 0..maxHops —
    * the estimated reachable-pair count N(h) = Σ_v |B(v, h)|, the mean
    * ball size, the fraction of the supremum pair mass reached, and an
    * `is_eff_diameter` flag on the first hop reaching 90% of it (the
    * standard effective-diameter readout). For a curation run this is
    * the "how transitive is my duplication?" artifact: N(h) saturating
    * at h=2 says near-dup families are tight cliques that CC dedup
    * collapses safely; still growing at h=4 says chained drift is
    * bridging families and transitive-closure dedup will over-merge.
    *
    * THE algorithm for this question at 100 TB: exact distance
    * distributions are Θ(V·E) multi-source BFS (HADI-scale jobs), while
    * one HyperBall round is ONE adjacency equi-join + ONE partial-agged
    * (node, register) MAX — registers only ever grow, repeats are
    * absorbed by max, and shuffle volume is bounded by 64·V rows per
    * round after map-side combine whatever the edge count. Every
    * iterate is localCheckpoint'ed (the [[pageRank]] lineage
    * discipline). Determinism: register init hashes the node id through
    * the shared 60-bit kernel ("hb|" domain tag); rank/merge arithmetic
    * is integer-exact; the per-node estimate's single ln/÷ rounds at
    * 4 dp and the cross-node sum is DECIMAL — the [[Dedup.hllDistinct]]
    * parity discipline, so the twin iterates on identical values. */
  def hyperBall(s: SparkSession, dir: String, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, s"maxHops must be in [1, 8], got $maxHops")
    import org.apache.spark.sql.expressions.Window
    val e = edges(s, dir).localCheckpoint(true)
    val adj = adjacency(e).localCheckpoint(true)
    var regsNow = hbInitBlobs(e).localCheckpoint(true)
    val hops = scala.collection.mutable.ArrayBuffer(hbHopRow(regsNow, 0))
    for (h <- 1 to maxHops) {
      regsNow = hbHopBlobs(adj, regsNow).localCheckpoint(true)
      hops += hbHopRow(regsNow, h)
    }
    val win = Window.partitionBy()
    val curve = hops.reduce(_ unionAll _)
      .select($"hops", $"n_nodes",
        round($"pairs_dec".cast("double"), 4).as("pairs_est"),
        round($"pairs_dec".cast("double") / $"n_nodes".cast("double"), 4)
          .as("avg_ball"),
        round($"pairs_dec".cast("double") /
          max($"pairs_dec").over(win).cast("double"), 6).as("reached_frac"))
    curve
      .select($"hops", $"n_nodes", $"pairs_est", $"avg_ball", $"reached_frac",
        ($"hops" === min(when($"reached_frac" >= 0.9, $"hops")).over(win))
          .as("is_eff_diameter"))
  }
}
