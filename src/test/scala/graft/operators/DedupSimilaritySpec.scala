package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import graft.functions.EngineNeutral._
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Correctness properties of the dedup / similarity operators at sf0.001.
  * The LSH paths are checked against their exact brute-force twins — the
  * guarantee claims (prefix-filter exactness, pigeonhole banding) are
  * verified, not assumed.
  */
class DedupSimilaritySpec extends SparkSpec {

  test("knn graph: block count never changes the result; k rows per node") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def rows(nBlocks: Int) = Similarity.knnGraphFrom(e, k = 3, nBlocks = nBlocks)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val one = rows(1)
    assert(one === rows(7), "block-grid covering must be partition-invariant")
    // exactly k neighbors per node, none of them the node itself
    val bySrc = one.groupBy(_._1)
    val n = e.count()
    assert(bySrc.size.toLong === n)
    bySrc.foreach { case (src, ns) =>
      assert(ns.size === 3, s"node $src has ${ns.size} neighbors")
      assert(!ns.exists(_._2 == src), s"node $src is its own neighbor")
    }
    // the graph's top-1 edge agrees with the brute-force top-k oracle path
    val bf = Similarity.bruteForceTopKAggFrom(e, nQueries = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(one.filter(_._1 < 5) === bf)
  }

  test("nn-descent: k rows per node, no self-edges, monotone improvement " +
    "over its init, recall climbing round over round on the corpus") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val k = 5
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = edgeSet(Similarity.knnGraphFrom(e, k, nBlocks = 4))
    val n = e.count()
    def checkShape(g: Array[(Long, Long, Double)], tag: String): Unit = {
      val bySrc = g.groupBy(_._1)
      assert(bySrc.size.toLong === n, s"$tag: one group per node")
      bySrc.foreach { case (src, ns) =>
        assert(ns.length === k, s"$tag: node $src has ${ns.length} neighbors")
        assert(!ns.exists(_._2 == src), s"$tag: node $src self-edge")
        assert(ns.map(_._2).distinct.length === k, s"$tag: dup neighbor at $src")
      }
    }
    val r0 = edgeSet(Similarity.knnDescentFrom(e, k, iters = 1,
      nInitBuckets = 16, revCap = 5))
    val r2 = edgeSet(Similarity.knnDescentFrom(e, k, iters = 2,
      nInitBuckets = 16, revCap = 5))
    checkShape(r0, "iter1"); checkShape(r2, "iter2")
    // NN-descent is monotone per node: candidates always include the
    // current neighbors, so the mean kept similarity never decreases
    def meanSim(g: Array[(Long, Long, Double)]) = g.map(_._3).sum / g.length
    assert(meanSim(r2) >= meanSim(r0) - 1e-12,
      s"mean sim decreased: ${meanSim(r0)} -> ${meanSim(r2)}")
    // recall@k vs the exact graph improves round over round even on
    // THIS corpus — near-random 64-dim vectors, NN-descent's worst
    // case (no local structure to exploit; the clustered-data test
    // below is where the convergence claim is priced)
    val exactBySrc = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    def recall(g: Array[(Long, Long, Double)]) =
      g.count { case (s, nb, _) => exactBySrc(s).contains(nb) }
        .toDouble / exact.length
    assert(recall(r2) > recall(r0),
      f"round 2 did not improve recall: ${recall(r0)}%.3f -> ${recall(r2)}%.3f")
    // descent similarities can never exceed the exact per-node best —
    // approximate results must stay within the exact hull
    val exactBest = exact.groupBy(_._1).view.mapValues(_.map(_._3).max)
    r2.groupBy(_._1).foreach { case (s, ns) =>
      assert(ns.map(_._3).max <= exactBest(s) + 1e-9,
        s"node $s descent best exceeds exact best")
    }
  }

  test("nn-descent converges on clustered data: recall >= 0.9 in 3 rounds") {
    import spark.implicits._
    // 24 clusters x 21 members in 16 dims: tight jitter around well-
    // separated deterministic centers, so each vector's exact top-5 are
    // cluster mates. This is the data regime NN-descent is FOR — the
    // "neighbor of my neighbor" premise holds, and three rounds from
    // the two-seed hash init must recover almost the whole exact graph
    // (measured ladder on this fixture: 0.31 -> 0.67 -> 0.93 -> 0.99).
    val nClusters = 24; val perC = 21; val dim = 16
    val rows = (0 until nClusters * perC).map { i =>
      val c = i % nClusters
      val v = (0 until dim).map { d =>
        math.sin(c * 37.0 + d * 101.0) + 0.05 * math.sin(i * 13.0 + d * 7.0)
      }
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    def edgeSet(g: org.apache.spark.sql.DataFrame) = g.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = edgeSet(Similarity.knnGraphFrom(df, 5, nBlocks = 4))
    val desc = edgeSet(Similarity.knnDescentFrom(df, 5, iters = 3,
      nInitBuckets = 16, revCap = 5))
    val exactBySrc = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val hits = desc.count { case (s, nb, _) => exactBySrc(s).contains(nb) }
    val recall = hits.toDouble / exact.length
    assert(recall >= 0.9, f"clustered-data recall@5 too low: $recall%.3f")
  }

  test("sq8-coded nn-descent: same shape contract as the exact descent, " +
    "near-identical edge set, exact rescored cosines, quantized score " +
    "within SQ8 grid error of exact") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val k = 5
    val n = e.count()
    val sq8 = Similarity.knnDescentSq8From(e, k, iters = 3,
      nInitBuckets = 16, revCap = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val exact = Similarity.knnDescentFrom(e, k, iters = 3,
      nInitBuckets = 16, revCap = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // shape: k neighbors per node, no self-edges, no dups
    val bySrc = sq8.groupBy(_._1)
    assert(bySrc.size.toLong === n)
    bySrc.foreach { case (src, ns) =>
      assert(ns.length === k && !ns.exists(_._2 == src) &&
        ns.map(_._2).distinct.length === k, s"shape violated at $src")
    }
    // cos_sim is the EXACT cosine of the surviving pair: recompute
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dd += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dd / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(d: Double) = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    sq8.foreach { case (s, nb, q, ex) =>
      assert(ex === r4(cos(vecs(s), vecs(nb))), s"($s,$nb) exact rescore")
      // SQ8's per-dim grid error is far under the similarity scale:
      // the quantized score tracks the exact one closely
      assert(math.abs(q - ex) < 0.05, s"($s,$nb) sq8 score drifted: $q vs $ex")
    }
    // the narrow-exchange variant discovers (near-)the same graph: SQ8
    // grid noise can flip ties deep in a round, but overlap stays high
    val exactEdges = exact.map(t => (t._1, t._2)).toSet
    val overlap = sq8.count(t => exactEdges((t._1, t._2))).toDouble / exact.length
    assert(overlap >= 0.9, f"edge overlap vs exact descent too low: $overlap%.3f")
    // the hubness histogram over the sq8 build equals a rollup of the
    // sq8 graph's in-degrees (antihub zero bucket included)
    val indeg = sq8.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val allIds = e.select("vec_id").collect().map(_.getLong(0))
    val refHist = allIds.map(id => indeg.getOrElse(id, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val gotHist = Similarity.hubnessDescentSq8(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotHist === refHist, "sq8 hubness histogram diverges from rollup")
  }

  test("ivf append: append-only contract — buckets are exactly the " +
    "standing index's, every batch vector routes to its nearest existing " +
    "centroid, untouched buckets report zero growth and unit drift") {
    import spark.implicits._
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val out = Similarity.ivfAppendFrom(e, batchMod = 8, nBits = 8).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // driver-side mirror of the split and the standing index
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val (fresh, standing) = vecs.partition { case (id, _) => h60(id.toString) % 8 == 0 }
    assert(fresh.nonEmpty && standing.nonEmpty, "split degenerate — fixture issue")
    def srpSig(v: Array[Double], nBits: Int): Long =
      (0 until nBits).map { b =>
        val p = graft.functions.SrpPlanes.plane(b)
        var d = 0.0; var i = 0
        while (i < v.length) { d += v(i) * p(i); i += 1 }
        if (d >= 0) 1L << b else 0L
      }.sum
    val sigOf = standing.map { case (id, v) => id -> srpSig(v, 8) }.toMap
    val standingBuckets = sigOf.values.toSet
    // 1. append NEVER opens or closes a bucket
    assert(out.keySet === standingBuckets,
      "output buckets differ from the standing index's buckets")
    // 2. every batch vector lands somewhere: appended counts sum to |batch|
    assert(out.values.map(_._2).sum === fresh.length.toLong)
    // 3. growth is the exact ratio; untouched buckets report 0 growth
    //    and unit drift (recomputed mean of the same members)
    out.foreach { case (b, (nS, nA, growth, drift)) =>
      assert(nS === sigOf.count(_._2 == b).toLong, s"bucket $b standing count")
      assert(growth === BigDecimal(nA.toDouble / nS)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"bucket $b growth")
      if (nA == 0L) assert(drift === 1.0, s"untouched bucket $b must have drift 1")
      else assert(drift <= 1.0 && drift > 0.0, s"bucket $b drift out of range")
    }
  }

  test("ivf append recall: two variants, recall and scan_frac consistent " +
    "with their candidate volumes") {
    val r = Similarity.ivfAppendRecall(spark, Sf).collect()
      .map(x => x.getString(0) ->
        ((x.getDouble(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r.keySet === Set("stale_append", "retrained"))
    val n = Tables.embeddings(spark, Sf).count()
    r.foreach { case (v, (recall, nCand, frac)) =>
      assert(recall >= 0.0 && recall <= 1.0, s"$v recall")
      assert(nCand >= 0L && nCand <= 5L * (n - 1), s"$v candidate volume")
      assert(frac === BigDecimal(nCand.toDouble / (5.0 * (n - 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$v scan_frac")
    }
  }

  test("pq append: per-subspace report — every subspace prices the whole " +
    "batch, entry counts stay inside the 4-bit code space, and the " +
    "excess column is exactly the stale-minus-retrained MSE") {
    import spark.implicits._
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val out = Similarity.pqAppendFrom(e, batchMod = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // one row per subspace, exactly
    assert(out.keySet === (0L until 8L).toSet, "subspace coverage")
    // driver-side mirror of the engine-neutral coin: the batch size
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val nFresh = e.select("vec_id").collect().map(_.getLong(0))
      .count(id => h60(id.toString) % 8 == 0).toLong
    assert(nFresh > 0, "split degenerate — fixture issue")
    out.foreach { case (sub, (nEntries, nApp, mseS, mseR, mseX, share)) =>
      // the stale codebook lives in the 4-bit code space; Lloyd can
      // only close cells, never open them
      assert(nEntries >= 1L && nEntries <= 16L, s"sub $sub entry count")
      // every subspace encodes the WHOLE batch (PQ decomposes, never drops)
      assert(nApp === nFresh, s"sub $sub appended count")
      assert(mseS >= 0.0 && mseR >= 0.0, s"sub $sub negative MSE")
      // mse_excess is computed from the exact decimal SSEs, so it must
      // agree with the independently-rounded difference to rounding slack
      assert(math.abs(mseX - (mseS - mseR)) <= 2e-6,
        s"sub $sub excess $mseX vs ${mseS - mseR}")
      // the largest cell holds at least the mean share and is a share
      assert(share > 0.0 && share <= 1.0, s"sub $sub share range")
      assert(share >= 1.0 / 16.0 - 1e-6, s"sub $sub share below uniform floor")
    }
  }

  test("index roundtrip: parquet write→load round-trips both artifacts " +
    "bit for bit, and the serve from the LOADED artifacts equals the " +
    "in-plan serve frame by frame") {
    import spark.implicits._
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val isNew = graft.functions.EngineNeutral.hash60(
      col("vec_id").cast("string")) % 8 === 0
    val standing = e.filter(!isNew)
    val fresh = e.filter(isNew)
    val builtCv = Similarity.ivfCentroidVecs(standing, nBits = 8)
    val builtCbv = Similarity.pqCodebookTable(standing)
    val root = java.nio.file.Files
      .createTempDirectory("graft-idx-spec-").toString
    def bits(xs: Seq[Double]): Seq[Long] =
      xs.map(java.lang.Double.doubleToLongBits)
    try {
      Similarity.writeIvfIndex(builtCv, s"$root/ivf")
      Similarity.writePqCodebook(builtCbv, s"$root/pq")
      // 1. artifact-table equality, IEEE-bit-exact per vector component
      val cvB = builtCv.collect()
        .map(r => r.getLong(0) -> bits(r.getSeq[Double](1))).toMap
      val cvL = Similarity.loadIvfIndex(spark, s"$root/ivf").collect()
        .map(r => r.getLong(0) -> bits(r.getSeq[Double](1))).toMap
      assert(cvL === cvB, "loaded ivf centroids differ from the built table")
      val cbB = builtCbv.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> bits(r.getSeq[Double](2))).toMap
      val cbL = Similarity.loadPqCodebook(spark, s"$root/pq").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> bits(r.getSeq[Double](2))).toMap
      assert(cbL === cbB, "loaded pq codebook differs from the built table")
      // 2. the registered query's serve (loaded artifacts, its own
      //    write) equals the serve composed from the in-plan builds
      def frame(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(3)) ->
          ((r.getLong(1), java.lang.Double.doubleToLongBits(r.getDouble(2)),
            r.getLong(4), java.lang.Double.doubleToLongBits(r.getDouble(5)))))
        .toMap
      val inPlan = frame(
        Similarity.assignToCentroids(fresh, builtCv)
          .join(Similarity.pqEncode(fresh, builtCbv), "vec_id")
          .select(col("vec_id"), col("bucket"), col("cos_sim"),
            col("sub"), col("code"), col("d2")))
      val served = frame(Similarity.indexRoundtrip(spark, Sf))
      assert(served.nonEmpty, "roundtrip serve is empty — fixture issue")
      assert(served === inPlan,
        "serve from the loaded artifacts diverges from the in-plan serve")
      // 3. a non-artifact parquet fails the load loudly, naming the path
      e.limit(2).write.mode("overwrite").parquet(s"$root/bogus")
      val err = intercept[IllegalArgumentException] {
        Similarity.loadIvfIndex(spark, s"$root/bogus")
      }
      assert(err.getMessage.contains("bogus"),
        "load error must name the offending path")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("sq8 nn-descent: empty input yields an empty graph (not a grid " +
    "crash) and bad params fail fast, mirroring the exact variant") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val g = Similarity.knnDescentSq8From(empty, k = 5, iters = 3,
      nInitBuckets = 16, revCap = 5)
    assert(g.columns.toSeq ===
      Seq("src_id", "nbr_id", "cos_sim_sq8", "cos_sim"))
    assert(g.count() === 0L)
    // parameter validation fires BEFORE any job (grid collect included)
    intercept[IllegalArgumentException] {
      Similarity.knnDescentSq8From(empty, k = 0, iters = 3,
        nInitBuckets = 16, revCap = 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.knnDescentSq8From(empty, k = 5, iters = 9,
        nInitBuckets = 16, revCap = 5)
    }
  }

  test("bucket centroids equal an independent BigDecimal reference, per component") {
    import spark.implicits._
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val out = Similarity.bucketCentroidsFrom(e, nBits = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // independent reference: same decimal-exact arithmetic, driver-side
    def dec10(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(10, java.math.RoundingMode.HALF_UP)
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val byBucket = e.withColumn("bucket", VectorOps.srpSignature($"v", 8).cast("long"))
      .select($"bucket", $"v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).groupBy(_._1)
    assert(out.keySet.map(_._1) === byBucket.keySet)
    byBucket.foreach { case (bucket, rows) =>
      val vs = rows.map(_._2)
      for (pos <- vs.head.indices) {
        val s = vs.map(v => dec10(v(pos))).reduce(_ add _)
        val (m, n) = out((bucket, pos.toLong))
        assert(n === vs.size.toLong)
        assert(m === round6(s.doubleValue() / vs.size), s"bucket $bucket pos $pos")
      }
    }
  }

  test("centroid assignment: one row per vector, argmax dominates the home bucket") {
    import spark.implicits._
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val assigned = Similarity.centroidAssignFrom(e, nBits = 8)
    assert(assigned.count() === e.count())
    assert(assigned.select("vec_id").distinct().count() === e.count())
    // similarity to the CHOSEN centroid >= similarity to the vector's own
    // SRP bucket's centroid (the argmax property, via an independent join)
    val cents = Similarity.bucketCentroidsFrom(e, nBits = 8)
      .groupBy($"bucket")
      .agg(org.apache.spark.sql.functions.transform(
        array_sort(collect_list(struct($"pos", $"mean_comp"))),
        x => x.getField("mean_comp")).as("cv"))
    val home = e.withColumn("bucket", VectorOps.srpSignature($"v", 8).cast("long"))
      .join(cents, "bucket")
      .select($"vec_id", round(VectorOps.cosine($"v", $"cv"), 4).as("home_sim"))
    val viol = assigned.join(home, "vec_id")
      .filter($"cos_sim" < $"home_sim").count()
    assert(viol === 0L, s"$viol vectors scored below their home bucket")
    // and the assignment genuinely moves some vectors (else it's a no-op)
    val moved = assigned.join(
      e.withColumn("home", VectorOps.srpSignature($"v", 8).cast("long")), "vec_id")
      .filter($"bucket" =!= $"home").count()
    assert(moved > 0L, "Lloyd step reassigned nothing — suspicious for random data")
  }

  test("lloyd iteration: new means are exactly the assigned clusters' means") {
    import spark.implicits._
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val out = Similarity.lloydIterationFrom(e, nBits = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // reference: group vectors by the (independently spec'd) assignment,
    // then decimal-exact means driver-side
    def dec10(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(10, java.math.RoundingMode.HALF_UP)
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val assign = Similarity.centroidAssignFrom(e, nBits = 8)
      .select($"vec_id", $"bucket")
    val grouped = e.join(assign, "vec_id").select($"bucket", $"v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).groupBy(_._1)
    // every vector lands in exactly one surviving cluster
    assert(out.map(_._2._2).sum === e.count() * grouped.head._2.head._2.size)
    assert(out.keySet.map(_._1) === grouped.keySet)
    grouped.foreach { case (bucket, rows) =>
      val vs = rows.map(_._2)
      for (pos <- vs.head.indices) {
        val s = vs.map(v => dec10(v(pos))).reduce(_ add _)
        val (m, n) = out((bucket, pos.toLong))
        assert(n === vs.size.toLong)
        assert(m === round6(s.doubleValue() / vs.size), s"bucket $bucket pos $pos")
      }
    }
  }

  test("dedup rate report partitions the corpus and restates its own counts") {
    val rows = Dedup.rateBySource(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._2).sum === Tables.documents(spark, Sf).count())
    rows.foreach { case (src, nDocs, nDistinct, rate) =>
      assert(nDistinct >= 1L && nDistinct <= nDocs, src)
      val expect = java.math.BigDecimal.valueOf((nDocs - nDistinct).toDouble / nDocs)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(rate === expect, src)
    }
    // exact-copy detection through normalization, pinned on a fixture
    // (the harness corpus has near-dups but no exact normalized copies)
    import spark.implicits._
    val fixture = Seq(
      ("a", "Hello, World!"), ("a", "hello world"), ("a", "unrelated"),
      ("b", "x y z")).toDF("source", "text")
    val fx = Dedup.rateBySourceFrom(fixture).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(fx("a") === ((3L, 2L, 0.333333)), "punct/case-normalized copies must collapse")
    assert(fx("b") === ((1L, 1L, 0.0)))
  }

  test("exact dedup: groups partition the corpus; keep_id is the min doc") {
    val groups = Dedup.exact(spark, Sf)
    val total = groups.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total === Tables.documents(spark, Sf).count())
  }

  test("simhash banding finds EXACTLY the pairs with hamming <= 5 (pigeonhole)") {
    val banded = Dedup.simhashPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sig = Dedup.simhashSignatures(spark, Sf)
    val l = sig.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val r = sig.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    val brute = l.join(r, col("doc_a") < col("doc_b"))
      .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 5)
      .select("doc_a", "doc_b")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(banded === brute)
  }

  test("ngram prefix filtering is exact: equals brute-force jaccard join") {
    val pref = Dedup.ngramJaccardPairs(spark, Sf, threshold = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), charNgrams(col("text"), 3).as("g"))
    val l = docs.select(col("doc_id").as("doc_a"), col("g").as("g_a"))
    val r = docs.select(col("doc_id").as("doc_b"), col("g").as("g_b"))
    val brute = l.join(r, col("doc_a") < col("doc_b"))
      .filter(jaccard(col("g_a"), col("g_b")) >= 0.6)
      .select("doc_a", "doc_b")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pref === brute)
  }

  test("minhash LSH pairs: all reported pairs really exceed the threshold") {
    val pairs = Dedup.minhashLshPairs(spark, Sf, threshold = 0.9)
    assert(pairs.filter(col("jaccard") < 0.9).count() === 0L)
    assert(pairs.count() > 0L) // corpus has planted near-dups
  }

  test("two-phase brute-force top-k equals the single-window rank") {
    import org.apache.spark.sql.expressions.Window
    val twoPhase = Similarity.bruteForceTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val naive = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", round(VectorOps.cosine(col("q_v"), col("v")), 4))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    assert(twoPhase === naive)
  }

  test("range search: exactly the probed-bucket pairs at tau, consistent with top-k") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // independent formulation of the same contract: probed-bucket pair
    // space built WITHOUT the operator (separate signature/probe joins),
    // scored with the shared cosine kernel, tau-filtered
    val sig = e.withColumn("bucket", VectorOps.srpSignature(col("v"), 8))
    val probes = (Seq(col("bucket")) ++ (0 until 8).map(b =>
      col("bucket").bitwiseXOR(lit(1L << b))))
    val q = sig.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"),
        explode(array(probes: _*)).as("q_bucket"))
    val expect = sig.join(q, col("bucket") === col("q_bucket") &&
        col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", round(VectorOps.cosine(col("q_v"), col("v")), 4))
      .filter(col("cos_sim") >= 0.3)
      .select(col("q_id"), col("vec_id"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Similarity.ivfRangeSearch(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty, "range search returned nothing at tau=0.3")
    assert(got === expect)
    got.foreach { case (_, _, c) => assert(c >= 0.3) }
    // consistency: every ivfTopK row at or above tau is in the range result
    val tk = Similarity.ivfTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._3 >= 0.3).toSet
    assert(tk.subsetOf(got),
      "top-k rows above tau missing from the range result")
  }

  test("dim stats: hand-computed fixture; corpus invariants") {
    import spark.implicits._
    val fix = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0)), (2L, Seq(5.0, 6.0)))
      .toDF("vec_id", "v")
    val got = Similarity.dimStatsFrom(fix).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(0L) === ((3L, 3.0, 2.666667, 1.0, 5.0)))
    assert(got(1L) === ((3L, 4.0, 2.666667, 2.0, 6.0)))
    val corpus = Similarity.dimStats(spark, Sf).collect()
    assert(corpus.length === 64)
    corpus.foreach { r =>
      assert(r.getAs[Double]("variance") >= 0.0)
      assert(r.getAs[Double]("min_comp") <= r.getAs[Double]("max_comp"))
    }
  }

  test("pca power: unit loading, eigenvalue dominates every dim variance, " +
    "projection variance matches the eigenvalue estimate") {
    val rows = Similarity.pcaPower(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length === 64)
    val lam = rows.head._3
    assert(rows.forall(_._3 === lam))
    val norm2 = rows.map(x => x._2 * x._2).sum
    assert(math.abs(norm2 - 1.0) < 1e-6, s"loading not unit: |v|^2 = $norm2")
    // top eigenvalue >= every Rayleigh quotient at a basis vector =
    // every per-dim variance OF THE SAME SAMPLE the model trained on
    val sample = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") % 4 === 0)
    val dimVar = Similarity.dimStatsFrom(sample).collect()
      .map(_.getAs[Double]("variance")).max
    assert(lam >= dimVar - 1e-4,
      s"eigenvalue $lam below max dim variance $dimVar")
    // independent check: variance of the sample projected on the loading
    // approximates the eigenvalue (power iteration converged enough)
    val v = rows.sortBy(_._1).map(_._2)
    val projs = sample.collect().map { r =>
      val x = r.getSeq[Double](1).toArray
      x.indices.map(i => x(i) * v(i)).sum
    }
    val m = projs.sum / projs.length
    val pv = projs.map(p => (p - m) * (p - m)).sum / projs.length
    assert(math.abs(pv - lam) / lam < 0.05,
      s"projection variance $pv vs eigenvalue $lam — iteration not converged")
  }

  test("mmr rerank: greedy reference parity; step1 = top-rel; diversity bites") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val short = Similarity.bruteForceTopKAggFrom(e, nQueries = 5, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def r4(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def r6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dd += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dd / (math.sqrt(na) * math.sqrt(nb))
    }
    // greedy MMR reference per query, same literals and rounding
    val ref = short.groupBy(_._1).flatMap { case (q, rows) =>
      var rem = rows.map { case (_, id, rel) => id -> rel }.toMap
      var sel = Vector.empty[(Long, Long, Double, Double)] // (step, id, rel, mmr)
      for (step <- 1 to 5) {
        val scored = rem.map { case (id, rel) =>
          val pen = if (sel.isEmpty) 0.0
          else sel.map(s => r4(cos(vecs(id), vecs(s._2)))).max
          (id, rel, r6(0.7 * rel - 0.3 * pen))
        }
        val (id, rel, mmr) = scored.minBy { case (i2, _, m2) => (-m2, i2) }
        sel :+= ((step.toLong, id, rel, mmr))
        rem -= id
      }
      sel.map { case (st, id, rel, mmr) => (q, st, id, rel, mmr) }
    }.toSet
    val got = Similarity.mmrRerank(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got === ref, "engine MMR diverges from the greedy reference")
    // step 1 is the pure-relevance argmax
    val byQ = short.groupBy(_._1)
    got.filter(_._2 == 1L).foreach { case (q, _, id, _, _) =>
      val best = byQ(q).minBy { case (_, i2, rel) => (-rel, i2) }
      assert(id === best._2, s"q$q step1 is not the top-rel result")
    }
    // diversity bites somewhere: some query's picks differ from plain top-5
    val plain = byQ.view.mapValues(_.sortBy { case (_, i2, rel) => (-rel, i2) }
      .take(5).map(_._2).toSet).toMap
    val mmrSel = got.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    assert(mmrSel.exists { case (q, s2) => s2 != plain(q) },
      "MMR never diverged from plain top-k — fixture degenerate or penalty dead")
  }

  test("IVF top-k recall vs brute force is measured and bounded") {
    val brute = Similarity.bruteForceTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // multi-probe (own bucket + all Hamming-1 neighbors): assert a
    // non-degenerate recall floor for this near-random corpus (recall
    // measured 6-8x the single-probe quantizer)
    val recall = if (brute.isEmpty) 1.0 else ivf.intersect(brute).size.toDouble / brute.size
    assert(ivf.nonEmpty, "IVF returned nothing")
    assert(recall >= 0.08, f"IVF recall degenerate: $recall%.3f")
    info(f"IVF recall@10 = $recall%.3f (multi-probe Hamming-1, 8-bit quantizer)")
  }

  test("bounded-heap top-k aggregate equals the window-ranked brute force") {
    val agg = Similarity.bruteForceTopKAgg(spark, Sf)
    val win = Similarity.bruteForceTopK(spark, Sf)
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
  }

  test("IVF multi-probe recall on planted neighbors: Hamming-2 reaches >= 0.5") {
    import spark.implicits._
    // planted fixture: 10 random base vectors (the queries), each with 8
    // noisy copies in the corpus — true neighbors are unambiguous, unlike
    // the near-random harness corpus
    val rnd = new scala.util.Random(5)
    val bases = Array.fill(10)(Array.fill(64)(rnd.nextDouble() * 2 - 1))
    val rows = bases.zipWithIndex.map { case (b, i) => (i.toLong, b.toSeq) } ++
      (for (b <- 0 until 10; j <- 0 until 8) yield {
        val noisy = bases(b).map(x => x + (rnd.nextDouble() * 2 - 1) * 0.15)
        ((10 + b * 8 + j).toLong, noisy.toSeq)
      })
    val e = rows.toSeq.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val brute = Similarity.bruteForceTopKFrom(e, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(h: Int): Double = {
      val ivf = Similarity.ivfTopKFrom(e, nQueries = 10, k = 10, probeHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ivf.intersect(brute).size.toDouble / brute.size
    }
    val r1 = recallAt(1); val r2 = recallAt(2)
    info(f"planted recall@10: H<=1 (9 probes) = $r1%.3f, H<=2 (37 probes) = $r2%.3f")
    assert(r2 >= 0.5, f"Hamming-2 multi-probe recall too low: $r2%.3f")
    assert(r2 >= r1 - 1e-9, "wider probe ring must not lose recall")
  }

  test("SRP auto-banding widens bands with corpus size (bounded buckets)") {
    // gate size (500) must keep the oracle-pinned 4 bits; 10x steps widen
    assert(Similarity.autoBitsPerBand(10L) === 4)
    assert(Similarity.autoBitsPerBand(500L) === 4)
    assert(Similarity.autoBitsPerBand(5000L) === 7)
    assert(Similarity.autoBitsPerBand(50000L) === 10)
    assert(Similarity.autoBitsPerBand(Long.MaxValue / 4) === 14) // clamp
  }

  test("SRP near-dup pairs are a subset of the exact cosine-threshold pairs") {
    val srp = Similarity.srpNearDupPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val l = e.select(col("vec_id").as("vec_a"), col("v").as("v_a"))
    val r = e.select(col("vec_id").as("vec_b"), col("v").as("v_b"))
    val exact = l.join(r, col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", round(VectorOps.cosine(col("v_a"), col("v_b")), 4))
      .filter(col("cos_sim") >= 0.4)
      .select("vec_a", "vec_b")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(srp.subsetOf(exact))
  }

  test("threshold boundary: jaccard exactly 1.0 pairs survive threshold=1.0") {
    val pairs = Dedup.minhashLshPairs(spark, Sf, threshold = 1.0)
    // every reported pair must be an identical token set
    assert(pairs.filter(col("jaccard") =!= 1.0).count() === 0L)
    // and an invalid threshold is rejected with a clear message
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshPairs(spark, Sf, threshold = 1.5)
    }
    assert(e.getMessage.contains("threshold"))
  }

  test("dupClusters equals union-find over the same pair graph") {
    val pairs = Dedup.minhashLshPairs(spark, Sf).select("doc_a", "doc_b")
    val got = Dedup.dupClusters(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: plain union-find on the collected pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.collect().foreach { r =>
      val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val docs = Tables.documents(spark, Sf).select("doc_id").collect().map(_.getLong(0))
    // canonical root per component = min doc_id (union by min above)
    docs.foreach { d => assert(got(d) === find(d), s"doc $d") }
  }

  test("star-contraction fallback: a 60-hop chain converges (frontier would need 60 rounds)") {
    import spark.implicits._
    val n = 60
    val nodes = (0L to n.toLong).toDF("doc_id")
    val pairs = (0L until n.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // frontierRounds default (15) < chain length: the result being fully
    // converged proves the large-star/small-star fallback ran
    val got = Dedup.clustersFromPairs(nodes, pairs).collect()
    assert(got.length === n + 1)
    assert(got.forall(_.getLong(1) === 0L), "chain not fully contracted to min label")
  }

  test("starClusters equals union-find on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rawPairs = Seq.fill(80)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(p => p._1 != p._2)
    val rPairs = rawPairs.toDF("doc_a", "doc_b")
    val rNodes = (0L until 50L).toDF("doc_id")
    val star = Dedup.starClusters(rNodes, rPairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    rawPairs.foreach { case (a0, b0) =>
      val (a, b) = (find(a0), find(b0))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    (0L until 50L).foreach { d => assert(star(d) === find(d), s"node $d") }
  }

  test("embeddingNearDup refuses a hot label block; passes under the cap") {
    import spark.implicits._
    // skewed fixture: label 0 holds 6 of 8 vectors
    val rows = (0L until 8L).map { i =>
      (i, if (i < 6) 0L else 1L, Array.tabulate(4)(d => (i + d + 1).toDouble))
    }
    val e = rows.toDF("vec_id", "label", "v")
      .select(col("vec_id"), col("label"), col("v").cast("array<double>").as("v"))
    val ex = intercept[Exception] {
      Dedup.embeddingNearDupFrom(e, threshold = 0.0, maxBlockRows = 5L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("maxBlockRows") || m.contains("hot blocks")),
      s"unexpected error: ${msgs(ex).mkString(" | ")}")
    // under the cap: same pairs as the unguarded all-pairs join
    val ok = Dedup.embeddingNearDupFrom(e, threshold = 0.0, maxBlockRows = 6L)
    assert(ok.count() === (6L * 5 / 2 + 1L)) // C(6,2) within label 0 + C(2,2) in label 1
  }

  test("fused SRP band kernel is bit-identical to the per-row HOF formulation") {
    // the HOF form is the old oracle semantics (hash per row); the kernel
    // hoists the hyperplanes — same signatures on the real corpus proves
    // the hoist changed the plan, not the results
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val diff = e.select(
        VectorOps.srpSignatureSlice(col("v"), 4, 8).as("kernel"),
        VectorOps.srpSignatureSliceHof(col("v"), 4, 8).as("hof"))
      .filter(col("kernel") =!= col("hof"))
    assert(diff.count() === 0L)
  }

  test("resize: fit-within box geometry is tight, byte budget follows the area law") {
    val box = 256L
    val rows = MultiModal.mmResize(spark, Sf, box).collect().map(r =>
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, h, scale, newW, newH, outBytes) =>
      assert(math.max(newW, newH) <= box, s"($w,$h) resized outside the box")
      // scale is MINIMAL: one step smaller would overflow the box
      // (unless already at the identity scale)
      if (scale > 1L)
        assert(math.max(w, h) / (scale - 1) > box ||
          (math.max(w, h) + scale - 2) / (scale - 1) > box,
          s"($w,$h) over-shrunk at scale $scale")
      assert(newW === w / scale && newH === h / scale)
      assert(outBytes >= 0L)
    }
    // the harness dims (320..960 x 180..720) must exercise scale 2..4
    assert(rows.map(_._3).toSet === Set(2L, 3L, 4L))
  }

  test("batched decode path equals the expression stub path") {
    import org.apache.spark.sql.functions.round
    val batched = MultiModal.decodeBatched(spark, Sf)
      .toDF()
      .select(col("doc_id"), col("mime"), col("f_len"), round(col("f_sig"), 2).as("f_sig"))
    val expr = MultiModal.mmFeatures(spark, Sf)
      .select(col("doc_id"), col("mime"), col("f_len"), col("f_sig"))
    assert(batched.exceptAll(expr).isEmpty && expr.exceptAll(batched).isEmpty)
  }

  test("semantic survivors are pairwise NON-near-dup and cover every cluster") {
    import spark.implicits._
    val survivors = Dedup.semanticSurvivors(spark, Sf)
    val emb = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    // exactly one survivor per connected component
    val pairs = Dedup.embeddingNearDup(spark, Sf)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val nClusters = Dedup.clustersFromPairs(
        emb.select(col("vec_id").as("doc_id")), pairs)
      .select(col("cluster_id")).distinct().count()
    assert(survivors.count() === nClusters)
    // survivor minimality: two survivors within the threshold would have
    // shared an edge and been one component — so zero pairs remain
    val residual = Dedup.embeddingNearDupFrom(
      emb.join(survivors.select("vec_id"), "vec_id"), threshold = 0.4)
    assert(residual.count() === 0L,
      "near-dup pair survived semantic dedup")
  }

  test("multimodal meta stats never read payload bytes (column pruning)") {
    val plan = MultiModal.mmMetaStats(spark, Sf).queryExecution.executedPlan.toString
    // the parquet scan must not include `text` as a data column... it IS
    // the payload source here, so assert the scan schema is doc_id+text
    // only (no other columns survive pruning)
    assert(!plan.contains("n_chars"))
    val rows = MultiModal.mmMetaStats(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("n_assets")).sum === 500L)
  }

  test("PQ codes: 8 codes per vector, each in [0, 16)") {
    val codes = Similarity.pqCodes(spark, Sf)
    val nVecs = Tables.embeddings(spark, Sf).count()
    assert(codes.count() === nVecs * 8)
    assert(codes.filter(col("code") < 0 || col("code") >= 16).count() === 0L)
    val perVec = codes.groupBy(col("vec_id")).count().filter(col("count") =!= 8)
    assert(perVec.count() === 0L, "a vector without exactly 8 subspace codes")
  }

  test("PQ reconstruction beats the subspace-blind baseline componentwise") {
    // codebook means minimize within-bucket SSE for the partition, so the
    // per-(sub, pos) MSE can never exceed the variance around the global
    // per-(sub, pos) mean (the m2 both sides' rounding can't mask)
    val err = Similarity.pqReconError(spark, Sf)
      .select(col("sub"), col("pos"), col("mse"), col("n_vecs"))
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val baseline = e
      .select(posexplode(col("v")).as(Seq("gpos", "comp")))
      .withColumn("sub", (col("gpos") / 8).cast("long"))
      .withColumn("pos", (col("gpos") % 8).cast("long"))
      .groupBy(col("sub"), col("pos"))
      .agg(var_pop(col("comp")).as("varc"))
    val joined = err.join(baseline, Seq("sub", "pos")).collect()
    assert(joined.length === 64)
    joined.foreach { r =>
      val (mse, varc) = (r.getAs[Double]("mse"), r.getAs[Double]("varc"))
      assert(mse <= varc + 1e-6, s"sub=${r.getAs[Long]("sub")} pos=${r.getAs[Long]("pos")}: mse $mse > var $varc")
    }
    // every component cell was reconstructed for the whole corpus
    assert(err.filter(col("n_vecs") =!= e.count()).count() === 0L)
  }

  test("PQ ADC scores equal exact dots against reconstructed vectors") {
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val codes = Similarity.pqCodes(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cb = Similarity.pqCodebooks(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    def recon(id: Long): Array[Double] =
      Array.tabulate(64) { g =>
        val (sub, pos) = (g / 8, g % 8)
        cb((sub.toLong, codes((id, sub.toLong)), pos.toLong))
      }
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val got = Similarity.pqAdcTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(got.nonEmpty)
    got.foreach { case ((q, v), score) =>
      val expect = round6((vecs(q), recon(v)).zipped.map(_ * _).sum)
      assert(math.abs(score - expect) < 1e-6, s"q=$q v=$v: $score != $expect")
    }
    // recall report: k exact rows per query, recalls within [0, 1], and
    // the IVF-PQ path can only LOSE candidates vs flat ADC, never gain
    val rec = Similarity.pqRecall(spark, Sf).collect()
    assert(rec.length === 5)
    rec.foreach { r =>
      assert(r.getLong(1) === 10L)
      val rk = r.getDouble(3)
      assert(rk >= 0.0 && rk <= 1.0)
      val irk = r.getDouble(5)
      assert(irk >= 0.0 && irk <= 1.0)
    }
  }

  test("IVF-PQ top-k is exactly the ADC ranking restricted to probed buckets") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val buckets = e.withColumn("b", VectorOps.srpSignature(col("v"), 8))
      .select(col("vec_id"), col("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val codes = Similarity.pqCodes(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cb = Similarity.pqCodebooks(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    def recon(id: Long): Array[Double] =
      Array.tabulate(64) { g =>
        val (sub, pos) = (g / 8, g % 8)
        cb((sub.toLong, codes((id, sub.toLong)), pos.toLong))
      }
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // reference: per query, candidates = vectors whose coarse bucket is in
    // the H<=1 probe set; rank by the SAME ADC score as the flat path
    val expect = (0L until 5L).flatMap { q =>
      val probeSet = (Seq(0L) ++ (0 until 8).map(b => 1L << b))
        .map(buckets(q) ^ _).toSet
      vecs.keys.toSeq
        .filter(v => v != q && probeSet.contains(buckets(v)))
        .map(v => (q, v, round6((vecs(q), recon(v)).zipped.map(_ * _).sum)))
        .sortBy { case (_, v, s) => (-s, v) }
        .take(10)
    }.toSet
    val got = Similarity.ivfPqTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect)
    // pruning is real: no cartesian product anywhere in the plan
    val plan = Similarity.ivfPqTopK(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "IVF-PQ plan has a cartesian product")
  }

  test("ivfpq probe curve: every column equals the composed PQ mirror; " +
    "candidates monotone, recall capped by PQ distortion") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val buckets = e.withColumn("b", VectorOps.srpSignature(col("v"), 8))
      .select(col("vec_id"), col("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val codes = Similarity.pqCodes(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cb = Similarity.pqCodebooks(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    def recon(id: Long): Array[Double] =
      Array.tabulate(64) { g =>
        val (sub, pos) = (g / 8, g % 8)
        cb((sub.toLong, codes((id, sub.toLong)), pos.toLong))
      }
    def r4(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def r6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dd += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dd / (math.sqrt(na) * math.sqrt(nb))
    }
    val n = vecs.size
    val exact = (0L until 5L).map { q =>
      q -> vecs.filter(_._1 != q).toSeq
        .map { case (id, v) => (id, r4(cos(vecs(q), v))) }
        .sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
    }.toMap
    def choose(m: Int, d: Int): Long =
      (0 until d).foldLeft(1L)((acc, i) => acc * (m - i) / (i + 1))
    val ref = (0 to 2).map { h =>
      val cands = (0L until 5L).map { q =>
        q -> vecs.keys.toSeq.filter(id => id != q &&
          java.lang.Long.bitCount(buckets(id) ^ buckets(q)) <= h)
      }.toMap
      val nCand = cands.values.map(_.size.toLong).sum
      val overlap = (0L until 5L).map { q =>
        val top = cands(q)
          .map(id => (id, r6((vecs(q), recon(id)).zipped.map(_ * _).sum)))
          .sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
        (exact(q) intersect top).size.toLong
      }.sum
      (h.toLong, (0 to h).map(choose(8, _)).sum, nCand,
        r6(nCand.toDouble / (5.0 * (n - 1).toDouble)),
        overlap, 50L, r6(overlap.toDouble / 50.0))
    }
    val got = Similarity.ivfPqProbeCurve(spark, Sf).collect()
      .map(r => (r.getAs[Long]("probe_hamming"), r.getAs[Long]("n_probes"),
        r.getAs[Long]("n_candidates"), r.getAs[Double]("scan_frac"),
        r.getAs[Long]("n_overlap"), r.getAs[Long]("n_exact"),
        r.getAs[Double]("recall_at_k")))
      .sortBy(_._1).toSeq
    assert(got === ref, "engine ivfpq probe curve diverges from the mirror")
    // candidates monotone in H; recall bounded by the raw-vector sweep's
    // at the same radius (PQ distortion can only LOSE exact members)
    got.sliding(2).foreach { case Seq(a, b) => assert(b._3 >= a._3) }
    val raw = Similarity.ivfProbeCurve(spark, Sf).collect()
      .map(r => r.getAs[Long]("probe_hamming") -> r.getAs[Double]("recall_at_k"))
      .toMap
    got.foreach { r => assert(r._7 <= raw(r._1) + 1e-9,
      s"H=${r._1}: compressed recall ${r._7} above raw ${raw(r._1)}") }
  }

  test("IVFADC equals dots against coarse+residual reconstructions, probed buckets only") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val buckets = e.withColumn("b", VectorOps.srpSignature(col("v"), 8))
      .select(col("vec_id"), col("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents = Similarity.coarseCentroidVecs(e, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // residual codes through the SAME public code kernel the index uses
    val rcodes = Similarity.pqCodesFrom(Similarity.residualFrameFrom(e, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rcb = Similarity.residualCodebookVecs(e, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Double](2).toArray).toMap
    def recon(id: Long): Array[Double] = {
      val c = cents(buckets(id))
      Array.tabulate(64) { g =>
        val (sub, pos) = (g / 8, g % 8)
        c(g) + rcb((sub.toLong, rcodes((id, sub.toLong))))(pos)
      }
    }
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val expect = (0L until 5L).flatMap { q =>
      val probeSet = (Seq(0L) ++ (0 until 8).map(b => 1L << b))
        .map(buckets(q) ^ _).toSet
      vecs.keys.toSeq
        .filter(v => v != q && probeSet.contains(buckets(v)))
        .map(v => (q, v, round6((vecs(q), recon(v)).zipped.map(_ * _).sum)))
        .sortBy { case (_, v, s) => (-s, v) }
        .take(10)
    }.toSet
    val got = Similarity.ivfAdcTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expect)
    // residual coding is the point: reconstruction through coarse +
    // residual codebooks must beat flat-PQ reconstruction in total SSE
    // (the coarse centroid explains variance the flat codebook must
    // spend its 4-bit alphabet on)
    val flatCb = Similarity.pqCodebooks(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val flatCodes = Similarity.pqCodes(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def flatRecon(id: Long): Array[Double] =
      Array.tabulate(64) { g =>
        val (sub, pos) = (g / 8, g % 8)
        flatCb((sub.toLong, flatCodes((id, sub.toLong)), pos.toLong))
      }
    def sse(rec: Long => Array[Double]): Double =
      vecs.keys.toSeq.map { id =>
        (vecs(id), rec(id)).zipped.map((a, b) => (a - b) * (a - b)).sum
      }.sum
    val (rSse, fSse) = (sse(recon), sse(flatRecon))
    assert(rSse < fSse,
      s"residual-coded SSE $rSse not below flat-PQ SSE $fSse")
  }

  test("PQ-Lloyd refinement never increases reconstruction SSE") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val nVecs = e.count()
    // seed SSE from the recon-error artifact (mse is per-cell mean over
    // the whole corpus)
    val seedSse = Similarity.pqReconError(spark, Sf).collect()
      .map(r => r.getAs[Double]("mse") * r.getAs[Long]("n_vecs")).sum
    // refined SSE: every subvector against the refined mean of its NEW
    // assignment
    val refined = Similarity.pqLloydCodebooksFrom(e)
    val cbMap = refined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val assigned = Similarity.pqLloydAssignFrom(e)
      .select(col("sub"), col("code"), col("sv")).collect()
    assert(assigned.length === nVecs * 8)
    val refinedSse = assigned.map { r =>
      val (sub, code) = (r.getLong(0), r.getLong(1))
      r.getSeq[Double](2).zipWithIndex.map { case (x, i) =>
        val d = x - cbMap((sub, code, i.toLong))
        d * d
      }.sum
    }.sum
    // both Lloyd half-steps are SSE-non-increasing; the slack covers the
    // 1e-6 rounding of stored means on both sides
    assert(refinedSse <= seedSse + 1e-3,
      s"refined SSE $refinedSse > seed SSE $seedSse")
    // refined codebook stays within the code alphabet and covers the corpus
    assert(refined.filter(col("code") < 0 || col("code") >= 16).count() === 0L)
    val perSub = refined.filter(col("pos") === 0).groupBy(col("sub"))
      .agg(sum(col("n_vecs")).as("n")).collect()
    assert(perSub.length === 8)
    perSub.foreach(r => assert(r.getAs[Long]("n") === nVecs))
  }

  test("pq codebook shift: nonnegative, keyed by surviving entries, nonzero") {
    val shift = Similarity.pqLloydShift(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(shift.nonEmpty && shift.size <= 128)
    shift.values.foreach { case (l2, n0, n1) =>
      assert(l2 >= 0.0); assert(n0 > 0L && n1 > 0L)
    }
    // the SSE-monotonicity test proves reassignment moved subvectors, so
    // at least one surviving entry must have physically moved
    assert(shift.values.exists(_._1 > 0.0), "Lloyd step moved no codebook entry")
    // shift rows are exactly the entries present in BOTH codebooks
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val refinedKeys = Similarity.pqLloydCodebooksFrom(e)
      .select(col("sub"), col("code")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shift.keySet.subsetOf(refinedKeys))
  }

  test("lloyd chain: per-step monotone MSE, decreasing-to-quiet shift, " +
    "step-1 equals the single refinement") {
    val traj = Similarity.pqLloydTrajectory(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(traj.keySet === Set(0L, 1L, 2L, 3L))
    // reconstruction MSE is non-increasing down the chain (both Lloyd
    // half-steps are SSE-non-increasing; 1e-6 slack absorbs the per-step
    // state rounding)
    (1L to 3L).foreach { i =>
      assert(traj(i)._1 <= traj(i - 1)._1 + 1e-6,
        s"MSE rose at step $i: ${traj(i - 1)._1} -> ${traj(i)._1}")
    }
    // iter 0 has no predecessor; later shifts are positive (training is
    // actually moving entries) — convergence shows as the shift shrinking
    assert(traj(0L)._3.isEmpty)
    (1L to 3L).foreach(i => assert(traj(i)._3.exists(_ > 0.0)))
    // no emptied cells on this fixture: entry count stable
    assert(traj.values.map(_._2).toSet === Set(128L))
    // a 1-step chain IS the registered single refinement
    val one = Similarity.pqLloydChainFrom(
      Tables.embeddings(spark, Sf)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
      iters = 1)
    val single = Similarity.pqLloydCodebooks(spark, Sf)
    assert(one.exceptAll(single).isEmpty && single.exceptAll(one).isEmpty,
      "chain(iters=1) diverged from the one-step refinement")
    // training pays for itself on the fixture: mean trained recall >=
    // mean seed recall (per-query it is not guaranteed; the mean is the
    // honest deployment number)
    val rep = Similarity.pqTrainedRecall(spark, Sf).collect()
    val (seedSum, trainedSum) = (rep.map(_.getAs[Double]("seed_recall_at_k")).sum,
      rep.map(_.getAs[Double]("trained_recall_at_k")).sum)
    assert(trainedSum >= seedSum,
      s"one Lloyd step degraded mean recall: seed $seedSum trained $trainedSum")
  }

  test("trained-codebook ADC: re-encode SSE <= seed SSE; rank well-formed") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val seedSse = Similarity.pqReconError(spark, Sf).collect()
      .map(r => r.getAs[Double]("mse") * r.getAs[Long]("n_vecs")).sum
    // independent Scala-side re-encode against the refined codebook:
    // nearest entry by exact squared L2 (the engine rounds d2 to 1e-6,
    // which can only flip exact near-ties; the slack covers it)
    val lcb = Similarity.pqLloydCodebooksFrom(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val entries = lcb.keys.map(k => (k._1, k._2)).toSeq.distinct.sorted
      .map { case (sub, code) =>
        (sub, code, Array.tabulate(8)(p => lcb((sub, code, p.toLong)))) }
    val trainedSse = vecs.toSeq.map { case (_, v) =>
      (0 until 8).map { sub =>
        val sv = v.slice(sub * 8, sub * 8 + 8)
        entries.filter(_._1 == sub).map { case (_, _, cv) =>
          (sv, cv).zipped.map((a, b) => (a - b) * (a - b)).sum
        }.min
      }.sum
    }.sum
    assert(trainedSse <= seedSse + 1e-3,
      s"trained re-encode SSE $trainedSse > seed SSE $seedSse")
    // the retrieval artifact: 10 rows per query, scores non-increasing,
    // never the query itself
    val got = Similarity.adcTrainedTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === (0L until 5L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.length === 10, s"query $q returned ${rows.length} rows")
      assert(!rows.exists(_._2 == q), s"query $q retrieved itself")
      val scores = rows.sortBy(r => (-r._3, r._2)).map(_._3)
      assert(scores.sameElements(rows.map(_._3).sorted(Ordering[Double].reverse)))
    }
    // the recall report prices both paths against the same exact set
    val rep = Similarity.pqTrainedRecall(spark, Sf).collect()
    assert(rep.length === 5)
    rep.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 10L)
      val (s, t) = (r.getAs[Double]("seed_recall_at_k"),
        r.getAs[Double]("trained_recall_at_k"))
      assert(s >= 0.0 && s <= 1.0 && t >= 0.0 && t <= 1.0)
    }
  }

  test("sq8: engine ranking equals a brute-force grid mirror; recall " +
    "near-exact and above flat PQ-ADC") {
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dim = vecs.head._2.length
    // per-dimension affine grid, the operator's exact arithmetic
    val mn = Array.tabulate(dim)(i => vecs.values.map(_(i)).min)
    val sc = Array.tabulate(dim)(i => (vecs.values.map(_(i)).max - mn(i)) / 255.0)
    def dec(v: Array[Double]): Array[Double] = Array.tabulate(dim) { i =>
      if (sc(i) == 0.0) mn(i)
      else mn(i) + math.min(255.0,
        math.max(0.0, math.floor((v(i) - mn(i)) / sc(i) + 0.5))) * sc(i)
    }
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // sequential left-to-right dot — VectorOps.dot's kernel order
    def score(q: Array[Double], d: Array[Double]): Double =
      round6(q.indices.foldLeft(0.0)((acc, i) => acc + q(i) * d(i)))
    val ref = (0L until 5L).flatMap { q =>
      vecs.filter(_._1 != q).toSeq
        .map { case (id, v) => (id, score(vecs(q), dec(v))) }
        .sortBy { case (id, s) => (-s, id) }.take(10)
        .map { case (id, s) => (q, id, s) }
    }.toSet
    val got = Similarity.sq8TopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === ref, "engine SQ8 top-k diverges from the grid mirror")
    // 8-bit per-dimension quantization is near-exact retrieval: recall
    // at or near 1, and at least flat PQ-ADC's (which compresses 16x
    // harder and pays for it)
    val sq8 = Similarity.sq8Recall(spark, Sf).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("sq8_recall_at_k"))
      .toMap
    val pq = Similarity.pqRecall(spark, Sf).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_overlap").toDouble / r.getAs[Long]("n_exact")))
      .toMap
    assert(sq8.keySet === (0L until 5L).toSet)
    sq8.foreach { case (q, r) =>
      assert(r >= 0.8, s"query $q: SQ8 recall $r below the near-exact bar")
      assert(r >= pq(q) - 1e-9,
        s"query $q: SQ8 recall $r under PQ-ADC ${pq(q)} — 8x grid lost to 128x codebook")
    }
  }

  test("binary quantization: recall equals a brute-force sign-bit mirror " +
    "(thresholds, Hamming shortlist, rerank); overlap bounded") {
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dim = vecs.head._2.length
    // midrange thresholds — the operator's exact arithmetic
    val th = Array.tabulate(dim) { i =>
      val c = vecs.values.map(_(i))
      c.min + (c.max - c.min) / 2.0
    }
    def bits(v: Array[Double]): Array[Boolean] =
      Array.tabulate(dim)(i => v(i) >= th(i))
    def hamming(a: Array[Boolean], b: Array[Boolean]): Int =
      a.indices.count(i => a(i) != b(i))
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def score(q: Array[Double], v: Array[Double]): Double =
      round6(q.indices.foldLeft(0.0)((acc, i) => acc + q(i) * v(i)))
    val ref = (0L until 5L).map { q =>
      val qb = bits(vecs(q))
      val shortlist = vecs.filter(_._1 != q).toSeq
        .map { case (id, v) => (id, hamming(qb, bits(v))) }
        .sortBy { case (id, h) => (h, id) }.take(50).map(_._1)
      val bqTop = shortlist
        .map(id => (id, score(vecs(q), vecs(id))))
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val exact = vecs.filter(_._1 != q).toSeq
        .map { case (id, v) => (id, score(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      q -> ((exact intersect bqTop).size.toLong,
        round6((exact intersect bqTop).size.toDouble / exact.size))
    }.toMap
    val got = Similarity.bqRecall(spark, Sf).collect()
      .map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("bq_overlap"), r.getAs[Double]("bq_recall_at_k"))))
      .toMap
    assert(got.keySet === (0L until 5L).toSet)
    got.foreach { case (q, (ov, rec)) =>
      assert((ov, rec) === ref(q),
        s"query $q: engine ($ov, $rec) diverges from the sign-bit mirror ${ref(q)}")
      assert(ov >= 0L && ov <= 10L && rec >= 0.0 && rec <= 1.0)
    }
  }

  test("ivf-bq: engine ranking equals a brute-force mirror composing SRP " +
    "bucket pruning with the sign-code Hamming shortlist and exact rerank") {
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dim = vecs.head._2.length
    val th = Array.tabulate(dim) { i =>
      val c = vecs.values.map(_(i))
      c.min + (c.max - c.min) / 2.0
    }
    def bits(v: Array[Double]): Array[Boolean] =
      Array.tabulate(dim)(i => v(i) >= th(i))
    def bqHamming(a: Array[Boolean], b: Array[Boolean]): Int =
      a.indices.count(i => a(i) != b(i))
    // SRP coarse bucket: sign of the sequential-fold projection onto the
    // precomputed hyperplanes (the srpBand kernel's semantics)
    def bucket(v: Array[Double]): Int =
      (0 until 8).map { b =>
        val plane = graft.functions.SrpPlanes.plane(b)
        val proj = v.indices.foldLeft(0.0)((acc, i) => acc + v(i) * plane(i))
        if (proj >= 0) 1 << b else 0
      }.sum
    def bucketHamming(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def score(q: Array[Double], v: Array[Double]): Double =
      round6(q.indices.foldLeft(0.0)((acc, i) => acc + q(i) * v(i)))
    val ref = (0L until 5L).flatMap { q =>
      val qb = bits(vecs(q)); val qBucket = bucket(vecs(q))
      val shortlist = vecs.filter(_._1 != q).toSeq
        .filter { case (_, v) => bucketHamming(qBucket, bucket(v)) <= 1 }
        .map { case (id, v) => (id, bqHamming(qb, bits(v))) }
        .sortBy { case (id, h) => (h, id) }.take(50).map(_._1)
      shortlist.map(id => (id, score(vecs(q), vecs(id))))
        .sortBy { case (id, s) => (-s, id) }.take(10)
        .map { case (id, s) => (q, id, s) }
    }.toSet
    val got = Similarity.ivfBqTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === ref, "engine IVF-BQ top-k diverges from the composed mirror")
  }

  test("lsh tuning curve: every column equals a brute-force banding " +
    "mirror; candidate sets nest as bands coarsen") {
    import graft.functions.EngineNeutral.{MinhashPrime => P, minhashA, minhashB}
    def refHash60(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hb = docs.map { case (id, t) =>
      val toks = if (t.trim.isEmpty) Seq.empty[String]
        else t.trim.split("\\s+").toSeq.distinct
      id -> toks.map(tok => refHash60(tok) % P)
    }.filter(_._2.nonEmpty).toMap
    def mh(hs: Seq[Long], i: Int): Long =
      hs.map(h => (h * minhashA(i) + minhashB(i)) % P).min
    val configs = Seq((8, 2), (4, 4), (2, 8))
    def candsOf(b: Int, r: Int): Set[(Long, Long)] =
      (0 until b).flatMap { bi =>
        hb.toSeq.map { case (id, hs) =>
          (bi, refHash60((0 until r).map(ri => mh(hs, bi * r + ri)).mkString("|"))) -> id
        }.groupBy(_._1).values.flatMap { grp =>
          val ids = grp.map(_._2).sorted
          for (i <- ids.indices; j <- (i + 1) until ids.length)
            yield (ids(i), ids(j))
        }
      }.toSet
    def jacc(a: Seq[Long], b: Seq[Long]): Double = {
      val (sa, sb) = (a.toSet, b.toSet)
      if ((sa union sb).isEmpty) 0.0
      else (sa intersect sb).size.toDouble / (sa union sb).size.toDouble
    }
    val candSets = configs.map { case (b, r) => (b, r) -> candsOf(b, r) }.toMap
    val truth = candSets((8, 2)).filter { case (a, b) => jacc(hb(a), hb(b)) >= 0.9 }
    val ref = configs.map { case (b, r) =>
      val c = candSets((b, r)); val d = (c intersect truth).size.toLong
      (b.toLong, r.toLong, r6(1.0 - math.pow(1.0 - math.pow(0.9, r), b)),
        c.size.toLong, d,
        if (c.nonEmpty) r6(d.toDouble / c.size.toDouble) else Double.NaN,
        if (truth.nonEmpty) r6(d.toDouble / truth.size.toDouble) else Double.NaN)
    }.toSet
    val got = Dedup.lshTuningCurve(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
    assert(got === ref, "engine tuning curve diverges from the mirror")
    // aligned band layout: an r-row band match implies both r/2-row
    // halves match, so candidate sets NEST as banding coarsens
    assert(candSets((2, 8)).subsetOf(candSets((4, 4))))
    assert(candSets((4, 4)).subsetOf(candSets((8, 2))))
    assert(truth.nonEmpty, "fixture corpus must contain verified near-dups")
  }

  test("lsh tuning curve: the chunked truth pass is split-invariant — " +
    "forcing multiple sequential verify passes changes nothing") {
    val one = Dedup.lshTuningCurve(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
    // the fixture's (8,2) pre-dedup pair mass is well above 40k, so
    // 40k/pass forces several sequential generate+verify chunks (the
    // driver-assembled report path)
    val chunked = Dedup.lshTuningCurve(spark, Sf, verifyPairsPerPass = 40000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
    assert(chunked === one, "chunked verify diverged from the one-shot plan")
  }

  test("lsh tuning curve: empty and whitespace-only docs are dropped " +
    "before signatures (no shared all-null band bucket)") {
    import spark.implicits._
    // 3 token-free docs (would all share one null-minhash band key →
    // 3 spurious pairs per banding) + one genuine near-dup pair
    val tmp = java.nio.file.Files.createTempDirectory("lshempty").toString
    Seq(
      (1L, "", "en", "a", 0L), (2L, "   ", "en", "a", 3L),
      (3L, "\t\n", "en", "b", 2L),
      (10L, "alpha beta gamma delta epsilon zeta", "en", "a", 35L),
      (11L, "alpha beta gamma delta epsilon zeta", "en", "b", 35L),
      (12L, "totally unrelated content here now", "en", "a", 34L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.lshTuningCurve(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === Set((8L, 2L), (4L, 4L), (2L, 8L)))
    // exactly the one identical pair — were empty docs kept, each
    // banding would add C(3,2)=3 null-key candidates
    got.foreach { case (cfg, (nCand, nDet)) =>
      assert(nCand === 1L, s"$cfg: empty docs leaked into candidates")
      assert(nDet === 1L, s"$cfg: the identical pair must verify")
    }
  }

  test("main minhash path: empty and whitespace-only docs produce no " +
    "signature rows, no features, and no LSH pairs") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mhempty").toString
    val rows = Seq(
      (1L, "", "en", "a", 0L), (2L, "   ", "en", "a", 3L),
      (3L, "\t\n", "en", "b", 2L),
      (10L, "alpha beta gamma delta epsilon zeta", "en", "a", 35L),
      (11L, "alpha beta gamma delta epsilon zeta", "en", "b", 35L),
      (12L, "totally unrelated content here now", "en", "a", 34L))
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // signatures view: the token-free docs (empty / space-only under the
    // space-trim tokenizer contract) must not emit band rows — were they
    // kept, all of them would share md5("") in every band. Doc 3
    // ("\t\n") tokenizes to the singleton [""] under that contract
    // (trim strips spaces only, twin-identical), so it IS kept — but a
    // singleton unique token pairs with nothing.
    val sigDocs = Dedup.minhashSignatures(spark, tmp)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(sigDocs === Set(3L, 10L, 11L, 12L),
      "empty docs leaked into the banded-signature view")
    // shared featurizer (batch pairs AND streaming near-dup both ride it)
    val featDocs = Dedup.minhashDocFeatures(df.select($"doc_id", $"text"))
      .select("doc_id").as[Long].collect().toSet
    assert(featDocs === Set(3L, 10L, 11L, 12L),
      "empty docs leaked into minhashDocFeatures")
    // pair join: exactly the one genuine duplicate, zero empty-empty pairs
    val pairs = Dedup.minhashLshPairs(spark, tmp)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((10L, 11L)),
      "empty docs produced spurious LSH candidate pairs")
  }

  test("ivf probe curve: every column equals a brute-force mirror; " +
    "candidates and recall are monotone in probe radius") {
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def r4(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def r6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dd += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dd / (math.sqrt(na) * math.sqrt(nb))
    }
    def bucket(v: Array[Double]): Int =
      (0 until 8).map { b =>
        val plane = graft.functions.SrpPlanes.plane(b)
        val proj = v.indices.foldLeft(0.0)((acc, i) => acc + v(i) * plane(i))
        if (proj >= 0) 1 << b else 0
      }.sum
    val buckets = vecs.map { case (id, v) => id -> bucket(v) }
    val n = vecs.size
    val exact = (0L until 5L).map { q =>
      q -> vecs.filter(_._1 != q).toSeq
        .map { case (id, v) => (id, r4(cos(vecs(q), v))) }
        .sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
    }.toMap
    def choose(m: Int, d: Int): Long =
      (0 until d).foldLeft(1L)((acc, i) => acc * (m - i) / (i + 1))
    val ref = (0 to 2).map { h =>
      val cands = (0L until 5L).map { q =>
        q -> vecs.keys.filter(id => id != q &&
          Integer.bitCount(buckets(id) ^ buckets(q)) <= h).toSeq
      }.toMap
      val nCand = cands.values.map(_.size.toLong).sum
      val overlap = (0L until 5L).map { q =>
        val top = cands(q).map(id => (id, r4(cos(vecs(q), vecs(id)))))
          .sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
        (exact(q) intersect top).size.toLong
      }.sum
      (h.toLong, (0 to h).map(choose(8, _)).sum, nCand,
        r6(nCand.toDouble / (5.0 * (n - 1).toDouble)),
        overlap, 50L, r6(overlap.toDouble / 50.0))
    }
    val got = Similarity.ivfProbeCurve(spark, Sf).collect()
      .map(r => (r.getAs[Long]("probe_hamming"), r.getAs[Long]("n_probes"),
        r.getAs[Long]("n_candidates"), r.getAs[Double]("scan_frac"),
        r.getAs[Long]("n_overlap"), r.getAs[Long]("n_exact"),
        r.getAs[Double]("recall_at_k")))
      .sortBy(_._1).toSeq
    assert(got === ref, "engine probe curve diverges from the mirror")
    // growing the probe radius can only ADD candidates, and a candidate
    // from the exact top-k always outranks a non-member — so both the
    // candidate count and the recall are monotone in H
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 >= a._3 && b._7 >= a._7, s"curve not monotone: $a -> $b")
    }
    got.foreach { r =>
      assert(r._4 > 0.0 && r._4 <= 1.0)
      assert(r._7 >= 0.0 && r._7 <= 1.0)
    }
  }

  test("matryoshka recall: full-dim row anchors at exactly 1.0; prefix " +
    "rows equal a brute-force slice mirror") {
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def score(q: Array[Double], v: Array[Double], d: Int): Double =
      round6((0 until d).foldLeft(0.0)((acc, i) => acc + q(i) * v(i)))
    def topk(q: Long, d: Int): Set[Long] =
      vecs.filter(_._1 != q).toSeq
        .map { case (id, v) => (id, score(vecs(q), v, d)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val got = Similarity.matryoshkaRecall(spark, Sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("dim")) ->
        ((r.getAs[Long]("n_exact"), r.getAs[Long]("prefix_overlap"),
          r.getAs[Double]("prefix_recall_at_k"))))
      .toMap
    assert(got.keySet ===
      (for (q <- 0L until 5L; d <- Seq(16L, 32L, 64L)) yield (q, d)).toSet)
    for (q <- 0L until 5L) {
      val exact = topk(q, 64)
      assert(got((q, 64L)) === ((10L, 10L, 1.0)),
        s"query $q: the full-dim anchor row must recall exactly 1.0")
      for (d <- Seq(16, 32)) {
        val ov = (exact intersect topk(q, d)).size.toLong
        assert(got((q, d.toLong)) === ((10L, ov, round6(ov.toDouble / 10))),
          s"query $q dim $d: engine diverges from the slice mirror")
      }
    }
  }

  test("ivfpq rerank: exact-cosine rank of the ADC shortlist, order exact") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def round4(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        (x, y).zipped.map(_ * _).sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    // the reference: the shortlist's pairs re-scored exactly, ranked on
    // the exact score — stage 1's ADC order must have NO effect on the
    // returned order beyond membership
    val sl = Similarity.ivfPqTopKFrom(e, nQueries = 5, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = sl.groupBy(_._1).toSeq.flatMap { case (q, cands) =>
      cands.map { case (_, v, adc) => (q, v, round4(cos(vecs(q), vecs(v))), adc) }
        .sortBy { case (_, v, c, _) => (-c, v) }
        .take(10)
    }.toSet
    val got = Similarity.ivfPqRerank(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got === expect)
    // membership: every returned pair came from the shortlist
    val slPairs = sl.map(t => (t._1, t._2)).toSet
    assert(got.forall(t => slPairs.contains((t._1, t._2))))
  }

  test("balanced PQ: the round-robin deal equalizes per-subspace variance") {
    import spark.implicits._
    // adversarial layout: ALL the energy lives in dims 0..7 — natural
    // contiguous slicing traps it in subspace 0, the balanced deal must
    // spread exactly one hot dimension into each subspace
    val vecs = (0L until 20L).map { id =>
      id -> Array.tabulate(64) { d =>
        val noise = ((id * 31 + d * 7) % 11).toDouble / 1000.0
        if (d < 8) ((id * (d + 3)) % 7).toDouble * 10.0 + noise else noise
      }.toSeq
    }
    val e = vecs.toDF("vec_id", "v")
    val rows = Similarity.pqBalancedFrom(e).collect()
      .map(r => (r.getAs[Long]("sub"), r.getAs[Long]("n_dims"),
        r.getAs[Double]("var_sum"), r.getAs[Double]("mse")))
    // the map is a permutation: 8 subspaces x 8 dims
    assert(rows.length === 8 && rows.forall(_._2 === 8L))
    val spreads = rows.map(_._3)
    val balancedSpread = spreads.max - spreads.min
    // natural slicing's spread on this fixture: sub 0 holds all hot dims
    val comps = vecs.flatMap { case (_, v) => v.zipWithIndex }
    val natVar = comps.groupBy(_._2 / 8).map { case (sub, xs) =>
      sub -> xs.groupBy(_._2).values.map { c =>
        val d = c.map(_._1)
        d.map(x => x * x).sum / d.size - math.pow(d.sum / d.size, 2)
      }.sum
    }
    val natSpread = natVar.values.max - natVar.values.min
    assert(balancedSpread < natSpread / 4.0,
      s"balanced spread $balancedSpread vs natural $natSpread — deal failed")
    // registered query well-formed on the harness embeddings
    val reg = Similarity.pqBalanced(spark, Sf).collect()
    assert(reg.length === 8 &&
      reg.map(_.getAs[Long]("n_dims")).sum === 64L &&
      reg.forall(_.getAs[Double]("mse") >= 0.0))
  }

  test("KMV sketch: exact below k; estimator bounded; overlap recovers planted Jaccard") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
    // ground truth: exact distinct content-hash count per source
    val truth = docs
      .select(col("source"),
        hash60(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("h"))
      .distinct().groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // k above every source's cardinality -> the sketch holds everything
    // and est_distinct IS the exact distinct count
    val exactEst = Dedup.kmvDistinct(spark, Sf, k = 1 << 20).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(exactEst.keySet === truth.keySet)
    exactEst.foreach { case (src, est) =>
      assert(est === truth(src).toDouble, s"source $src: $est != ${truth(src)}")
    }
    // planted overlap: A = docs 0..999, B = 500..1499 -> Jaccard 1/3,
    // |A ∩ B| = 500, |A ∪ B| = 1500; distinct skeletons by construction
    val planted = spark.range(1500).select(
      when($"id" < 1000, "A").otherwise("B").as("source"),
      concat(lit("doc "), $"id").as("text"))
      .unionByName(spark.range(500, 1000).select(
        lit("B").as("source"), concat(lit("doc "), $"id").as("text")))
    // full sketch (k > union size): estimates are exact
    val full = Dedup.kmvOverlapFrom(Dedup.kmvSketchFrom(planted, 4096), 4096).collect()
    assert(full.length === 1)
    assert(full.head.getAs[Long]("n_union_sketch") === 1500L)
    assert(full.head.getAs[Double]("jaccard_est") === 0.333333)
    assert(full.head.getAs[Double]("union_est") === 1500.0)
    assert(full.head.getAs[Double]("inter_est") === 500.0)
    // k=64 sketch: estimator within generous bounds (std err ~ 1/sqrt(k-2))
    val est = Dedup.kmvOverlapFrom(Dedup.kmvSketchFrom(planted, 64), 64).collect().head
    assert(math.abs(est.getAs[Double]("jaccard_est") - 1.0 / 3) < 0.15,
      s"jaccard_est ${est.getAs[Double]("jaccard_est")} far from 1/3")
    assert(math.abs(est.getAs[Double]("union_est") - 1500.0) / 1500.0 < 0.5,
      s"union_est ${est.getAs[Double]("union_est")} far from 1500")
    val dEst = Dedup.kmvDistinct(spark, Sf, k = 64).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    dEst.foreach { case (src, e) =>
      assert(math.abs(e - truth(src)) / truth(src).toDouble < 0.5,
        s"source $src: est $e vs exact ${truth(src)}")
    }
  }

  test("tfidf cosine pairs: equals a brute-force all-pairs reference " +
    "(prefix filter exact); identical docs score 1; threshold respected") {
    import spark.implicits._
    // planted corpus: template family (shared boilerplate + rare terms),
    // an identical pair, and unrelated docs — cosines spread around the
    // 0.3 test threshold so pruning is stressed at the boundary
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "the quick brown fox leaps over the lazy cat",
      4L -> "quantum flux capacitor resonance cascade theory",
      5L -> "quantum flux capacitor overload cascade experiment",
      6L -> "entirely different subject matter altogether here",
      7L -> "the lazy dog naps under the brown fence",
      8L -> "cascade theory of quantum resonance explained simply")
    val docs = texts.toDF("doc_id", "text")
    val thr = 0.3
    val got = Dedup.tfidfCosinePairsFrom(docs, thr).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute-force reference mirroring the declared arithmetic: 6-dp
    // rounded weights, exact BigDecimal sums, one double divide
    def toks(t: String) = t.toLowerCase.trim.split("\\s+").toSeq
    val tf = texts.map { case (id, t) =>
      id -> toks(t).groupBy(identity).view.mapValues(_.size).toMap }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size)
    val n = texts.size.toDouble
    def w(id: Long): Map[String, BigDecimal] = tf(id).flatMap { case (t, c) =>
      val dw = BigDecimal(c.toDouble * math.log(n / df(t)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      if (dw > 0) Some(t -> dw) else None
    }
    val ids = texts.map(_._1)
    val expect = (for {
      a <- ids; b <- ids if a < b
      wa = w(a); wb = w(b)
      shared = wa.keySet intersect wb.keySet
      if shared.nonEmpty
      dot = shared.toSeq.map(t => wa(t) * wb(t)).sum
      n2a = wa.values.map(x => x * x).sum
      n2b = wb.values.map(x => x * x).sum
      cos = dot.toDouble / (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble))
      if cos >= thr
    } yield (a, b) -> BigDecimal(cos)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    assert(got === expect,
      s"engine ${got.toSeq.sorted} vs brute force ${expect.toSeq.sorted}")
    assert(got((1L, 2L)) === 1.0, "identical docs must score 1.0")
    assert(!got.contains((1L, 6L)), "unrelated docs must not pair")
    // registered query well-formed at the default threshold
    val reg = Dedup.tfidfCosinePairs(spark, Sf).collect()
    assert(reg.forall(r => r.getLong(0) < r.getLong(1)))
    assert(reg.forall(r => r.getDouble(2) >= 0.85 && r.getDouble(2) <= 1.000001))
  }

  test("HLL: registers match a from-scratch scalar reference; union sketch = sketch of union; estimator bounded") {
    import spark.implicits._
    // scalar reference HLL off the same md5-derived layout
    def scalarReg(s: String): (Long, Long) = {
      val skel = s.toLowerCase.replaceAll("[^a-z0-9]", "")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(skel.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      val rem = h & ((1L << 52) - 1)
      (h >>> 52, if (rem == 0) 53L else 53L - (64 - java.lang.Long.numberOfLeadingZeros(rem)))
    }
    val docs = Tables.documents(spark, Sf)
    val expect = docs.select($"source", $"text").as[(String, String)].collect()
      .map { case (src, t) => (src, scalarReg(t)) }
      .groupBy { case (src, (reg, _)) => (src, reg) }
      .map { case ((src, reg), xs) => (src, reg, xs.map(_._2._2).max) }.toSet
    val got = Dedup.hllRegistersFrom(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect, "register frame differs from the scalar reference")
    // mergeability: the ALL row's registers (max over per-source sketches)
    // equal the sketch built directly over the union corpus
    val allViaMerge = Dedup.hllRegistersFrom(docs)
      .groupBy($"reg").agg(max($"mj").as("mj")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val allDirect = Dedup.hllRegistersFrom(docs.withColumn("source", lit("ALL")))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(allViaMerge === allDirect, "merged sketch != sketch of union")
    // estimator: every row's self-audit error within 3 sigma of the
    // p=8 standard error (1.04/sqrt(256) ~ 6.5%)
    val rows = Dedup.hllDistinct(spark, Sf).collect()
    assert(rows.map(_.getString(0)).contains("ALL"))
    rows.foreach { r =>
      assert(r.getAs[Double]("err_rel") < 0.20,
        s"${r.getString(0)}: err_rel ${r.getAs[Double]("err_rel")}")
    }
    // the harness-corpus rows above exercise linear counting (empty
    // registers exist at fixture scale); exercise the RAW branch with a
    // planted full-register sketch: every register at rank 3 ->
    // S = 256 * 2^50, raw = alpha*m^2*8 = 4723.386... (hand arithmetic)
    val planted = spark.range(256)
      .select(lit("P").as("source"), $"id".as("reg"), lit(3L).as("mj"))
    val praw = Dedup.hllEstFrom(planted, col("source")).collect().head
    assert(praw.getAs[Long]("n_zero_regs") === 0L)
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    val expected = BigDecimal(alpha * 65536.0 * 9007199254740992.0 /
      (256.0 * math.pow(2, 50))).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(praw.getAs[Double]("est_hll")) === expected)
  }

  test("k-center seeds: matches the sequential Gonzalez greedy; farthest distance non-increasing") {
    import spark.implicits._
    // fixture with unambiguous geometry: 30 points in 3 well-separated
    // blobs plus 2 remote outliers — the greedy must pick the outliers
    // and one point per blob before densifying anywhere
    def vec(base: Double, id: Long): Seq[Double] =
      Seq.tabulate(64)(d => base + ((id * 13 + d * 5) % 7).toDouble / 100.0)
    val pts: Seq[(Long, Seq[Double])] =
      (0L until 10L).map(i => i -> vec(0.0, i)) ++
      (10L until 20L).map(i => i -> vec(50.0, i)) ++
      (20L until 30L).map(i => i -> vec(-40.0, i)) ++
      Seq(100L -> vec(200.0, 100L), 101L -> vec(-150.0, 101L))
    val e = pts.toDF("vec_id", "v")
    val got = Similarity.kcenterSeedsFrom(e, k = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1)
    // sequential reference: same traversal in plain Scala
    val byId = pts.toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var seeds = Vector(pts.map(_._1).min)
    var dmin = pts.map { case (id, v) => id -> d2(v, byId(seeds.head)) }.toMap
    var expect = Vector[(Long, Long, Option[Double])]((1L, seeds.head, None))
    for (i <- 2 to 6) {
      val (nid, nd) = dmin.toSeq.maxBy { case (id, d) => (d, -id) }
      expect :+= ((i.toLong, nid, Some(math.rint(nd * 1e6) / 1e6)))
      seeds :+= nid
      dmin = dmin.map { case (id, d) => id -> math.min(d, d2(byId(id), byId(nid))) }
    }
    assert(got.toVector === expect)
    // farthest-first invariant: selection distances never increase
    val ds = got.flatMap(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b },
      s"selection distances must be non-increasing: ${ds.mkString(",")}")
    // the two outliers and all three blobs are covered within the first 5 picks
    val first5 = got.take(5).map(_._2).toSet
    assert(first5.contains(100L) && first5.contains(101L))
    // registered query: k=8 distinct ids, first rank has null distance
    val reg = Similarity.kcenterSeeds(spark, Sf).collect()
    assert(reg.length === 8 && reg.map(_.getLong(1)).distinct.length === 8)
    assert(reg.count(_.isNullAt(2)) === 1)
  }
  test("silhouette: matches a brute-force centroid-silhouette mirror; " +
    "bounded in [-1,1]; buckets partition the corpus") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // brute-force mirror: SRP bucket via the engine's own signature
    // (collected once), centroids as round-6 means, round-4 cosines
    val sig = e.select(col("vec_id"),
        VectorOps.srpSignature(col("v"), 8).cast("long").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cents = sig.groupBy(_._2).map { case (b, m) =>
      val vs = m.keys.toSeq.map(vecs)
      b -> (0 until 64).map(i =>
        r((vs.map(v => BigDecimal(v(i)).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum / vs.size).toDouble, 6)).toArray
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val per = vecs.map { case (id, v) =>
      val own = sig(id)
      val a = r(1.0 - r(cos(v, cents(own)), 4), 6)
      val b = r(cents.filter(_._1 != own).values
        .map(c => 1.0 - r(cos(v, c), 4)).min, 6)
      val s = if (math.max(a, b) > 0) r((b - a) / math.max(a, b), 6) else 0.0
      (id, own, a, b, s)
    }
    val expByBucket = per.groupBy(_._2).map { case (b, xs) =>
      def m(f: ((Long, Long, Double, Double, Double)) => Double): Double =
        r((xs.map(x => BigDecimal(f(x)).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum / xs.size).toDouble, 6)
      b -> ((xs.size.toLong, m(_._5), m(_._3), m(_._4)))
    }
    val got = Similarity.silhouette(spark, Sf).collect().map { row =>
      row.getAs[Long]("bucket") ->
        ((row.getAs[Long]("n_vecs"), row.getAs[Double]("mean_silhouette"),
          row.getAs[Double]("mean_cohesion_dist"),
          row.getAs[Double]("mean_separation_dist")))
    }.toMap
    assert(got.keySet === expByBucket.keySet)
    got.foreach { case (b, (n, ms, ma, mb)) =>
      val (en, ems, ema, emb) = expByBucket(b)
      assert(n === en, s"bucket $b size")
      assert(math.abs(ms - ems) < 1e-9, s"bucket $b mean sil $ms vs $ems")
      assert(math.abs(ma - ema) < 1e-9, s"bucket $b cohesion")
      assert(math.abs(mb - emb) < 1e-9, s"bucket $b separation")
      assert(ms >= -1.0 && ms <= 1.0)
    }
    // buckets partition the corpus
    assert(got.values.map(_._1).sum === vecs.size.toLong)
  }
  test("graph ANN: replays a brute-force beam-search trace exactly; " +
    "recall against exact top-k is substantial") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      r4(d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    // the engine's own knn graph at the op's k=8 (knnGraph itself is
    // spec-verified vs brute force at its registered k)
    val g = Similarity.knnGraph(spark, Sf, k = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2).toSet }
    val queries = vecs.keys.filter(_ < 5).toSeq.sorted
    val entries = vecs.keys.filter(_ % 16 == 0).toSet
    def rank(cand: Set[Long], q: Long, n: Int): Seq[(Long, Double)] =
      cand.filter(_ != q).toSeq.map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (id, sc) => (-sc, id) }.take(n)
    val expected = queries.flatMap { q =>
      var beam = rank(entries, q, 16).map(_._1)
      for (_ <- 1 to 4) {
        val cand = beam.toSet ++ beam.flatMap(b => g.getOrElse(b, Set.empty))
        beam = rank(cand, q, 16).map(_._1)
      }
      rank(beam.toSet, q, 10).map { case (id, sc) => (q, id, sc) }
    }.toSet
    val got = Similarity.graphAnnTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected, "engine beam must replay the brute-force trace")
    // recall@10 vs exact top-10 (graph search is approximate by design;
    // on the 256-vector fixture with 4 hops (the operator default, and
    // what the brute-force mirror runs) it should find most of them)
    val hits = queries.map { q =>
      val exact = rank(vecs.keySet, q, 10).map(_._1).toSet
      val found = got.collect { case (qq, id, _) if qq == q => id }
      (exact intersect found).size
    }.sum
    assert(hits >= queries.size * 10 * 6 / 10,
      s"recall too low: $hits of ${queries.size * 10}")
  }
  test("graph ANN over the NN-descent graph: replays the brute-force " +
    "beam trace on the engine's own descent graph; recall substantial") {
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      r4(d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    // the engine's own DESCENT graph at the op's knnK=8 (descent itself
    // is spec-verified above) — the mirror walks the same structure
    val g = Similarity.knnDescent(spark, Sf, k = 8, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2).toSet }
    val queries = vecs.keys.filter(_ < 5).toSeq.sorted
    val entries = vecs.keys.filter(_ % 16 == 0).toSeq.sorted.take(64).toSet
    def rank(cand: Set[Long], q: Long, n: Int): Seq[(Long, Double)] =
      cand.filter(_ != q).toSeq.map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (id, sc) => (-sc, id) }.take(n)
    val expected = queries.flatMap { q =>
      var beam = rank(entries, q, 16).map(_._1)
      for (_ <- 1 to 4) {
        val cand = beam.toSet ++ beam.flatMap(b => g.getOrElse(b, Set.empty))
        beam = rank(cand, q, 16).map(_._1)
      }
      rank(beam.toSet, q, 10).map { case (id, sc) => (q, id, sc) }
    }.toSet
    val got = Similarity.graphAnnDescentTopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected, "engine beam must replay the brute-force trace")
    val hits = queries.map { q =>
      val exact = rank(vecs.keySet, q, 10).map(_._1).toSet
      val found = got.collect { case (qq, id, _) if qq == q => id }
      (exact intersect found).size
    }.sum
    assert(hits >= queries.size * 10 * 5 / 10,
      s"descent-graph recall too low: $hits of ${queries.size * 10}")
  }
  test("hubness audit: histogram equals the knn graph's in-degrees, " +
    "covers the corpus, conserves k*N edge endpoints") {
    val g = Similarity.knnGraph(spark, Sf).collect().map(_.getLong(1))
    val n = Tables.embeddings(spark, Sf).count()
    val indeg = g.groupBy(identity).map { case (id, xs) => id -> xs.length.toLong }
    val expected = (indeg.values.groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong } +
      (0L -> (n - indeg.size))).filter(_._2 > 0)
    val got = Similarity.hubnessAudit(spark, Sf).collect()
      .map(r => r.getAs[Long]("k_occurrence") -> r.getAs[Long]("n_vecs")).toMap
    assert(got === expected)
    assert(got.values.sum === n, "histogram partitions the corpus")
    assert(got.map { case (k, c) => k * c }.sum === g.length.toLong,
      "sum k*count equals total kNN edges")
  }

  test("kmeans|| seeds: full selection trace equals a sequential " +
    "driver-side reference of the Bernoulli rounds") {
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) =>
        acc + (a(i) - b(i)) * (a(i) - b(i))) // the HOF's sequential fold
    def rnd(v: Double, n: Int) =
      BigDecimal(v).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ids = vecs.keys.toSeq.sorted
    val first = ids.head
    var dmin = ids.map(id => id -> d2(vecs(id), vecs(first))).toMap
    var expected = Vector((0L, first, Option.empty[Double]))
    for (r <- 1 to 3) {
      val sd = dmin.map { case (k, v) => k -> rnd(v, 8) }
      val phi = sd.values.map(BigDecimal(_)).sum.toDouble
      val sel = ids.filter(id =>
        (h60(s"$id#kpp#$r") % 1000000L).toDouble / 1000000.0
          < 8.0 * sd(id) / phi)
      expected ++= sel.map(id => (r.toLong, id, Some(rnd(sd(id), 6))))
      if (r < 3 && sel.nonEmpty)
        dmin = dmin.map { case (id, dv) =>
          id -> (dv +: sel.map(c => d2(vecs(id), vecs(c)))).min
        }
    }
    val got = Similarity.kmeansParallelSeeds(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Option.empty[Double] else Some(r.getDouble(2))))
      .toVector
    assert(got.sorted === expected.sorted)
    assert(expected.count(_._1 > 0) >= 3,
      "fixture must actually select oversampled seeds")
  }

  test("hubness on the NN-descent graph: histogram equals that graph's " +
    "in-degrees, covers the corpus, conserves its edge endpoints") {
    val g = Similarity.knnDescent(spark, Sf).collect().map(_.getLong(1))
    val n = Tables.embeddings(spark, Sf).count()
    val indeg = g.groupBy(identity).map { case (id, xs) => id -> xs.length.toLong }
    val expected = (indeg.values.groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong } +
      (0L -> (n - indeg.size))).filter(_._2 > 0)
    val got = Similarity.hubnessDescent(spark, Sf).collect()
      .map(r => r.getAs[Long]("k_occurrence") -> r.getAs[Long]("n_vecs")).toMap
    assert(got === expected)
    assert(got.values.sum === n, "histogram partitions the corpus")
    assert(got.map { case (k, c) => k * c }.sum === g.length.toLong,
      "sum k*count equals total descent-graph edges")
  }

  test("dedup funnel: designed fixture exercises every layer and the " +
    "marginal attribution; empty layers report zero") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val base = (1 to 40).map(i => s"w$i").mkString(" ") // 40 distinct words
    val docs = Seq(
      (1L, base),                 // canonical
      (2L, base),                 // exact dup of 1 (also near-dup: first-flag=exact)
      (3L, base + " extra"),      // near-dup of 1 (41 words, jacc 40/41)
      (4L, (1 to 10).map(i => s"w$i").mkString(" ")), // contained in 1
      (5L, (1 to 40).map(i => s"q$i").mkString(" "))) // clean
      .toDF("doc_id", "text")
    val got = Dedup.dedupFunnelFrom(spark, docs).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // exact: doc 2 flagged (dup of 1); new=1; surviving 4
    assert(got("exact") === ((1L, 1L, 4L)))
    // neardup: docs 2 and 3 dominated; doc 2 already taken by exact
    assert(got("neardup") === ((2L, 1L, 3L)))
    // containment at threshold 0.8 is not exact-subset: 1/2/3 mutually
    // contain each other (38 of 39 shingles shared) and 4 is contained
    // in all of them -> flagged {1,2,3,4}; only {1,4} are NEW (2 was
    // taken by exact, 3 by neardup) -> survivors = just the clean doc 5
    assert(got("containment") === ((4L, 2L, 1L)))
    // empty-layer zero row: a corpus with no exact dups still reports the layer
    val noExact = Seq((1L, base), (2L, base + " tail"), (3L, "z y x w v")).toDF("doc_id", "text")
    val g2 = Dedup.dedupFunnelFrom(spark, noExact).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(g2.keySet === Set("exact", "neardup", "containment"))
    assert(g2("exact") === 0L)
  }

  test("weighted jaccard equals brute multiset jaccard; repetition splits it from set jaccard") {
    import spark.implicits._
    def tf(t: String): Map[String, Int] = {
      val tr = t.trim
      if (tr.isEmpty) Map.empty
      else tr.split("\\s+").toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
    }
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Dedup.weightedJaccardPairs(spark, Sf).collect()
    assert(rows.nonEmpty, "sf0.001 corpus must yield candidate pairs at 0.7")
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ta, tb) = (tf(docs(a)), tf(docs(b)))
      val keys = ta.keySet ++ tb.keySet
      val minS = keys.toSeq.map(k => math.min(ta.getOrElse(k, 0), tb.getOrElse(k, 0))).sum
      val maxS = keys.toSeq.map(k => math.max(ta.getOrElse(k, 0), tb.getOrElse(k, 0))).sum
      val expect = if (maxS == 0) 0.0 else minS.toDouble / maxS
      assert(math.abs(r.getAs[Double]("w_jaccard") - expect) < 1e-6,
        s"pair ($a,$b): got ${r.getAs[Double]("w_jaccard")}, brute $expect")
    }
    // the pair set is EXACTLY the LSH join's at the same set threshold
    val lsh = Dedup.minhashLshPairs(spark, Sf, 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === lsh)
    // repetition fixture: identical vocabulary (set jaccard 1.0) but
    // tripled token -> multiset jaccard 2/4
    val fix = Seq((1L, "a a a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = Dedup.weightedJaccardPairsFrom(fix, 0.7).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Double]("jaccard") === 1.0)
    assert(out(0).getAs[Double]("w_jaccard") === 0.5)
  }

  test("edit-distance pairs equal UNBLOCKED brute force (length banding is exact-complete)") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, Sf).groupBy(col("p_name")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val brute = (for {
      (na, ca) <- names; (nb, cb) <- names
      if na < nb
      d = lev(na, nb) if d <= 3
    } yield (na, nb, d.toLong, ca, cb)).toSet
    val got = Dedup.editDistancePairs(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got.nonEmpty, "part names at sf0.001 must contain d<=3 pairs")
    assert(got === brute)
    // cardinality guard refuses oversized name spaces in-plan
    val err = intercept[Exception] {
      Dedup.editDistancePairs(spark, Sf, maxNames = 1L).collect()
    }
    assert(err.getMessage.contains("editDistancePairs") ||
      Option(err.getCause).exists(_.getMessage.contains("editDistancePairs")))
  }

  test("lsh append: incremental output equals the full pair join " +
    "restricted to pairs touching a new doc; batch arms partition it") {
    val full = Dedup.minhashLshPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def isNew(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(8).map("%02x".format(_)).mkString.take(15), 16)
      h % 8 == 0
    }
    val expected = full.filter { case (a, b, _) => isNew(a) || isNew(b) }
    val got = Dedup.lshIndexAppend(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected,
      s"incremental != filtered full: extra=${got -- expected} missing=${expected -- got}")
    assert(got.nonEmpty, "batch split must touch some near-dup pairs")
    assert(got.size < full.size,
      "standing-only pairs must be excluded (incrementality)")
  }

  test("lsh index roundtrip: parquet-persisted standing index probes " +
    "bit-identically to the in-plan append; bad artifacts fail loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("lshrt").toString
    try {
      val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
      val standingDocs = docs.filter(
        hash60(col("doc_id").cast("string")) % 8 =!= 0)
      // 1. the artifact round-trips bit-exactly: written standing
      //    features == loaded standing features, row by row
      def feats(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) ->
          ((r.getSeq[Long](1).toList, r.getSeq[Long](2).toList))).toMap
      val built = Dedup.minhashDocFeatures(standingDocs)
      Dedup.writeLshIndex(built, s"$tmp/lsh")
      val loaded = feats(Dedup.loadLshIndex(spark, s"$tmp/lsh"))
      assert(loaded === feats(built),
        "loaded lsh index differs from the built feature frame")
      // 2. the registered query (its own write/load under tmpdir)
      //    equals the in-plan append — persistence is invisible in
      //    the result
      def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      val served = pairs(Dedup.lshIndexRoundtrip(spark, Sf))
      assert(served.nonEmpty, "roundtrip probe is empty — fixture issue")
      assert(served === pairs(Dedup.lshIndexAppend(spark, Sf)),
        "probe against the loaded artifact diverges from in-plan append")
      // 3. a non-artifact parquet fails the load loudly, naming the path
      docs.limit(2).write.mode("overwrite").parquet(s"$tmp/bogus")
      val err = intercept[IllegalArgumentException] {
        Dedup.loadLshIndex(spark, s"$tmp/bogus")
      }
      assert(err.getMessage.contains("bogus"),
        "load error must name the offending path")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  test("passjoin edit-distance pairs equal the length-banded operator " +
    "(segment blocking is exact-complete), incl. synthetic short names") {
    // corpus equality: PassJoin must produce the SAME pair set as the
    // quadratic-verify operator — pigeonhole candidates lose nothing
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val banded = pairs(Dedup.editDistancePairs(spark, Sf))
    val pj = pairs(Dedup.editDistancePassJoin(spark, Sf))
    assert(pj === banded)
    assert(pj.nonEmpty)
    // maxDist=1, k=2: exercises the odd/even segment-length split and
    // the short-name arm (len < k) on a hand-built corpus
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pjtest").toString
    val parts = Seq("a", "b", "ab", "abc", "abd", "xbd", "abcd", "zzzz",
      "abcde", "", "a").toDF("p_name")
    parts.write.mode("overwrite").parquet(s"$tmp/part.parquet")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Seq("a", "b", "ab", "abc", "abd", "xbd", "abcd", "zzzz",
      "abcde", "").groupBy(identity).map { case (n, xs) =>
      n -> (if (n == "a") 2L else 1L)
    }
    val brute = (for {
      (na, ca) <- names.toSeq; (nb, cb) <- names.toSeq
      if na < nb
      d = lev(na, nb) if d <= 1
    } yield (na, nb, d.toLong, ca, cb)).toSet
    val got = pairs(Dedup.editDistancePassJoin(spark, tmp, maxDist = 1))
    assert(got === brute, s"short-name fixture mismatch:\n got=$got\n exp=$brute")
  }
}
