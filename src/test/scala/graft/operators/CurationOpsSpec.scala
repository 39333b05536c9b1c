package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantics of the round-8 curation operators on hand-built fixtures
  * plus cross-operator invariants at sf0.001: repeated-span boilerplate
  * fractions, event path transitions (incl. the ms-tie contract),
  * payload dedup vs text dedup, and the threshold histogram vs the pair
  * join it summarizes.
  */
class CurationOpsSpec extends SparkSpec {

  test("common spans: df-threshold boilerplate fractions on a fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e x y"), // shingles: "a b c d e","b c d e x","c d e x y"
      (2L, "a b c d e q r"),
      (3L, "z a b c d e"), //   "z a b c d","a b c d e"
      (4L, "p q r s t u"), //   both unique
      (5L, "too short")) //     < w tokens: no shingles, no row
      .toDF("doc_id", "text")
    val got = TextAnalysis.commonSpansFrom(docs, w = 5, minDf = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // "a b c d e" appears in docs 1,2,3 => df=3 >= minDf; everything else df<3
    assert(got(1L) === ((3L, 1L, 0.333333)))
    assert(got(2L) === ((3L, 1L, 0.333333)))
    assert(got(3L) === ((2L, 1L, 0.5)))
    assert(got(4L) === ((2L, 0L, 0.0)))
    assert(!got.contains(5L), "a doc shorter than w tokens emits no row")
  }

  test("common spans: minDf=1 marks every shingle common") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val r = TextAnalysis.commonSpansFrom(docs, w = 5, minDf = 1).collect()(0)
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L && r.getDouble(3) === 1.0)
  }

  test("path transitions: counts, distinct users, and ms-tie by event_id") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, "view", 1000L),
      (1L, 11L, "click", 2000L),
      (1L, 12L, "buy", 3000L),
      // user 2: same-ms pair — order must come from event_id, not input order
      (2L, 21L, "view", 5000L),
      (2L, 20L, "click", 5000L))
      .toDF("user_id", "event_id", "event_type", "ms")
    val got = Events.pathTransitionsFrom(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(("view", "click")) === ((1L, 1L)))
    assert(got(("click", "buy")) === ((1L, 1L)))
    // event_id 20 ("click") sorts before 21 ("view") at ms 5000
    assert(got(("click", "view")) === ((1L, 1L)))
    assert(got.size === 3)
  }

  test("path transitions: transition total = events - users (chain lengths)") {
    val ev = Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    val total = Events.pathTransitionsFrom(ev)
      .agg(sum("n")).collect()(0).getLong(0)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(total === nEvents - nUsers,
      "each user contributes (chain length - 1) transitions")
  }

  test("top paths: equals a brute-force sliding-window mine of user chains") {
    val ev = Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      rows.sortBy(r => (r._4, r._2)).map(_._3).sliding(3)
        .filter(_.size == 3).map(p => (uid, p.mkString(" > ")))
    }
    val expected = paths.groupBy(_._2).map { case (p, hits) =>
      (p, hits.size.toLong, hits.map(_._1).distinct.size.toLong)
    }.toSeq.sortBy { case (p, n, _) => (-n, p) }.take(20)
    val got = Events.topPaths(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected, "engine top paths diverge from brute force")
    assert(got.nonEmpty && got.size <= 20)
    // ranking is the declared total order
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._2 > b._2 || (a._2 === b._2 && a._1 < b._1))
      case _ => ()
    }
  }

  test("payload dedup groups mirror text fingerprint groups") {
    val mm = MultiModal.mmPayloadDedup(spark, Sf)
    val nDocs = Tables.documents(spark, Sf).count()
    assert(mm.agg(sum("n_copies")).collect()(0).getLong(0) === nDocs)
    // identical-bytes grouping == grouping by the raw text (UTF-8 encode
    // is injective), modulo the mime split
    val textGroups = Tables.documents(spark, Sf)
      .groupBy(col("text")).agg(count(lit(1))).count()
    val mmGroupsIgnoringMime = MultiModal.asMultimodal(spark, Sf)
      .groupBy(md5(col("payload"))).agg(count(lit(1))).count()
    assert(mmGroupsIgnoringMime === textGroups)
    // keep_id is the group's minimum doc_id
    val bad = mm.join(
        MultiModal.asMultimodal(spark, Sf)
          .select(col("doc_id"), col("meta.mime").as("mime"),
            md5(col("payload")).as("payload_md5")),
        Seq("mime", "payload_md5"))
      .filter(col("doc_id") < col("keep_id"))
    assert(bad.count() === 0L, "keep_id must be the min doc_id of its group")
  }

  test("unigram logprob: hand-computed corpus distribution on a fixture") {
    import spark.implicits._
    // corpus tokens: a:2, b:2, z:1, total 5
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "z"), (4L, "  "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogprobFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val common = BigDecimal(-math.log(2.0 / 5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rare = BigDecimal(-math.log(1.0 / 5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((2L, common)) && got(2L) === ((2L, common)))
    assert(got(3L) === ((1L, rare)), "rare token must score higher")
    assert(!got.contains(4L), "empty doc emits no row")
  }

  test("anomaly z-score: trailing-baseline mean/std on a ramp fixture") {
    import spark.implicits._
    // one type, hour i has count i (i = 1..10): only hours 9 and 10 have
    // >= 8 strictly-preceding baseline points
    val hourly = (1 to 10).map(i => ("t", i * 3600L, i.toLong))
      .toDF("event_type", "hour_ts", "n")
    val got = Events.anomalyZscoreFrom(hourly, minBaseline = 8).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    def z(n: Double, base: Seq[Double]): Double = {
      val avg = base.sum / base.size
      val std = math.sqrt(base.map(x => (x - avg) * (x - avg)).sum / (base.size - 1))
      BigDecimal((n - avg) / std).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got === Map(
      9 * 3600L -> z(9, (1 to 8).map(_.toDouble)),
      10 * 3600L -> z(10, (1 to 9).map(_.toDouble))))
  }

  test("recall report: k exact rows per query, overlap bounded, ids complete") {
    val rows = Similarity.recallReport(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet === Set(0L, 1L, 2L, 3L, 4L))
    rows.foreach { case (q, nExact, nOverlap, recall) =>
      assert(nExact === 10L, s"query $q must rank exactly k exact rows")
      assert(nOverlap >= 0L && nOverlap <= nExact)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(recall === BigDecimal(nOverlap.toDouble / nExact)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("sliding agg: every event lands in exactly 3 hop windows, aligned") {
    val sliding = Events.slidingAgg(spark, Sf)
    val nEvents = Tables.events(spark, Sf).count()
    assert(sliding.agg(sum("n")).collect()(0).getLong(0) === 3L * nEvents)
    val misaligned = sliding.filter(pmod(col("window_ts"), lit(3600L)) =!= 0L)
    assert(misaligned.count() === 0L, "window starts must be hour-aligned")
    // the hop windows cover the tumbling hourly counts: summing each
    // hour's 3 covering windows triple-counts exactly
    val hourly = Events.hourlyAgg(spark, Sf).agg(sum("n")).collect()(0).getLong(0)
    assert(hourly === nEvents)
  }

  test("minhash calibration: estimates on the 1/16 grid, near the exact jaccard") {
    val rows = Dedup.minhashCalibration(spark, Sf).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (jacc, est) =>
      // any LSH pair shares a full band = 4 consecutive agreeing perms
      assert(est >= 0.25 - 1e-9 && est <= 1.0 + 1e-9, s"est $est out of range")
      val grid = math.round(est * 16) / 16.0
      assert(math.abs(est - BigDecimal(grid).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"est $est not on the 1/16 grid")
      assert(jacc >= 0.9, "pairs come from the 0.9-threshold join")
    }
    // unbiased estimator: the mean absolute error stays small over the
    // (high-similarity) pair population
    val mae = rows.map { case (j, e) => math.abs(j - e) }.sum / rows.size
    assert(mae < 0.15, s"mean |est - jaccard| = $mae — estimator drifting")
  }

  test("rfm: buckets in 1..5, users and monetary fully partitioned") {
    val seg = Events.rfm(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    seg.foreach { case (rB, fB, mB, _, _) =>
      assert(Seq(rB, fB, mB).forall(b => b >= 1L && b <= 5L), s"bucket out of range: ($rB,$fB,$mB)")
    }
    val purchases = Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
    assert(seg.map(_._4).sum === purchases.select("user_id").distinct().count())
    val totalCents = purchases
      .agg(sum(round(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    val segCents = seg.map(s => BigDecimal(s._5) * 100).sum
    assert(segCents.toLongExact === totalCents,
      "segment monetary totals must partition the corpus purchase value")
  }

  test("cluster sizes histogram partitions the corpus and matches the labels") {
    val hist = Dedup.clusterSizes(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val nDocs = Tables.documents(spark, Sf).count()
    assert(hist.values.map(_._2).sum === nDocs, "every doc is in exactly one cluster")
    hist.foreach { case (sz, (nC, nD)) => assert(nD === sz * nC) }
    // agrees with an independent rollup of the labels
    val direct = Dedup.dupClusters(spark, Sf)
      .groupBy("cluster_id").count()
      .groupBy("count").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.view.mapValues(_._1).toMap === direct)
  }

  test("centroid shift: populations partition the corpus, movement bounded") {
    val rows = Similarity.centroidShift(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val n = Tables.embeddings(spark, Sf).count()
    assert(rows.map(_._3).sum === n, "seed populations must partition the corpus")
    rows.foreach { case (b, cosMove, n0, n1) =>
      assert(cosMove <= 1.0 + 1e-9, s"bucket $b cos_move $cosMove > 1")
      assert(n0 >= 1L && n1 >= 1L)
    }
    // a bucket whose population is unchanged AND whose members were all
    // already best-assigned has cos_move 1.0 — the fixture corpus has
    // many singleton/stable buckets, so some exact-1 rows must exist
    assert(rows.exists(_._2 == 1.0), "expected at least one stable centroid")
  }

  test("threshold histogram sums to the open-threshold pair count, bins sane") {
    val hist = Similarity.thresholdHistogram(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allPairs = Similarity.srpNearDupPairs(spark, Sf, threshold = -1.0)
    assert(hist.values.sum === allPairs.count())
    assert(hist.keys.forall(b => b >= -10L && b <= 10L), s"bins out of range: $hist")
    // bins >= 4 are exactly the pairs the 0.4-threshold join emits
    // (floor(round(cos,4)*10) >= 4 <=> round(cos,4) >= 0.4 — see docstring)
    val atThreshold = Similarity.srpNearDupPairs(spark, Sf, threshold = 0.4).count()
    assert(hist.filter(_._1 >= 4L).values.sum === atThreshold)
  }

  test("bm25: engine ranking equals a brute-force Okapi mirror") {
    val terms = Seq("vector", "spark", "stream", "scan")
    val (k1, b) = (1.2, 0.75)
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        (if (r.getString(1).trim.isEmpty) Array.empty[String]
         else r.getString(1).toLowerCase.trim.split("\\s+")))
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def idf(t: String) =
      math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
    def roundAt(d: Double, s: Int) = java.math.BigDecimal.valueOf(d)
      .setScale(s, java.math.RoundingMode.HALF_UP)
    val ref = docs.flatMap { case (id, tk) =>
      val parts = terms.flatMap { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0) None
        else Some(roundAt(idf(t) * (tf * (k1 + 1.0))
          / (tf + k1 * ((1.0 - b) + b * tk.length / avgdl)), 9))
      }
      if (parts.isEmpty) None
      else Some((id, parts.length.toLong,
        roundAt(parts.reduce(_ add _).doubleValue(), 6).doubleValue()))
    }.sortBy { case (id, _, s) => (-s, id) }.take(10).toSeq
    val engine = TextAnalysis.bm25TopK(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy { case (id, _, s) => (-s, id) }
    assert(engine === ref, "engine BM25 top-10 diverges from the Okapi mirror")
    // more matched terms can only help: every top doc here hits all terms
    assert(engine.forall(_._2 >= 1L))
  }

  test("span dedup: canonical survives, dup spans excised, docs rebuilt") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e x y"), //  canonical owner of "a b c d e"
      (2L, "q a b c d e r"), //  dup at pos 1 -> tokens 1..5 removed
      (3L, "too short"), //      < w tokens: passes through verbatim
      (4L, "m n o p q z m n o p q"), // within-doc dup at pos 6
      (5L, "a b c d e x y")) //  all three spans dup vs doc 1 -> emptied
      .toDF("doc_id", "text")
    val got = TextAnalysis.spanDedupFrom(docs, w = 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((7L, 0L, "a b c d e x y")), "canonical doc untouched")
    assert(got(2L) === ((7L, 5L, "q r")), "dup span excised mid-doc")
    assert(got(3L) === ((2L, 0L, "too short")), "short doc passes through")
    assert(got(4L) === ((11L, 5L, "m n o p q z")), "within-doc dup keeps first")
    assert(got(5L) === ((7L, 7L, "")), "overlapping dup spans union to full removal")
    // conservation: kept tokens + removed tokens == original tokens
    got.values.foreach { case (n, rem, clean) =>
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(kept + rem === n)
    }
  }

  test("shard plan: two-phase prefix sum equals one global window; shards balanced") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, Sf)
    val target = 5000L
    val got = TextAnalysis.shardPlanFrom(docs, target, nBuckets = 8)
    // reference: the SINGLE global window the two-phase decomposition
    // must reduce to, over the same (bucket, hash, id) total order
    val d = docs.select(col("doc_id"), col("n_chars"),
        graft.functions.EngineNeutral.hash60(
          concat(col("doc_id").cast("string"), lit("#shard"))).as("hk"))
      .withColumn("bkt", pmod(col("hk"), lit(8L)))
    val ref = d
      .withColumn("gcum", sum(col("n_chars"))
        .over(Window.orderBy(col("bkt").asc, col("hk").asc, col("doc_id").asc)))
      .selectExpr("doc_id", "n_chars", s"(gcum - n_chars) div $target as shard")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "two-phase prefix sum diverged from the global window")
    // balance: every shard's char total is within one max-doc of target
    // (a doc belongs to the shard its START offset falls in), totals
    // conserve the corpus, and shard ids are contiguous from 0
    val maxDoc = docs.agg(max(col("n_chars"))).head.getLong(0)
    val sizes = got.groupBy("shard").agg(sum(col("n_chars")).as("tot")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nShards = sizes.keys.max + 1
    assert(nShards >= 3, "fixture too small to exercise shard boundaries")
    assert(sizes.keys.toSeq.sorted === (0L until nShards),
      "shard ids must be contiguous from 0")
    assert(sizes.values.sum === docs.agg(sum(col("n_chars"))).head.getLong(0))
    sizes.foreach { case (sh, tot) =>
      assert(tot < target + maxDoc, s"shard $sh overshoots: $tot")
      if (sh < nShards - 1)
        assert(tot > target - maxDoc, s"shard $sh undershoots: $tot")
    }
  }

  test("containment join: quoted-whole, partial, sub-threshold, short-doc cases") {
    import spark.implicits._
    // A has tokens x1..x10 (8 shingles); B quotes A whole plus a tail;
    // D shares 6 of its own 7 shingles with A (6/7 ~ 0.857 >= 0.8);
    // E shares 3 of 6 (0.5 < 0.8); F is too short for any shingle
    val xs = (1 to 10).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, xs),
      (2L, xs + " y1 y2 y3 y4 y5"),
      (3L, (1 to 8).map(i => s"x$i").mkString(" ") + " z"),
      (4L, (1 to 5).map(i => s"x$i").mkString(" ") + " z1 z2 z3"),
      (5L, "only two"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairsFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // A fully inside B (all 8 of A's shingles appear in B)
    assert(got((1L, 2L)) === ((8L, 1.0)))
    // D -> A: 6 of D's 7 shingles are A's
    assert(got((3L, 1L)) === ((6L, 0.857143)))
    // D -> B transitively (A's shingles are in B too)
    assert(got((3L, 2L)) === ((6L, 0.857143)))
    // no reverse containment (B is much bigger than A), no sub-threshold
    // rows, no short-doc rows, nothing else
    assert(!got.contains((2L, 1L)), "container reported as contained")
    assert(!got.contains((4L, 1L)), "sub-threshold pair leaked")
    assert(got.keySet.flatMap(p => Set(p._1, p._2)).intersect(Set(5L)).isEmpty)
    assert(got.keySet === Set((1L, 2L), (3L, 1L), (3L, 2L)))
    // asymmetry vs Jaccard: the quoted-whole pair is invisible at the
    // symmetric near-dup threshold (|A|/|B| = 8/13 union ratio)
    val jacc = 8.0 / 13.0
    assert(jacc < 0.8, "fixture must sit below the symmetric threshold")
  }

  test("bigram logprob: exact mirror parity; flags token ORDER unigrams cannot") {
    import spark.implicits._
    // docs 1-3 share natural phrasing; doc 4 has the SAME token multiset
    // shuffled (3xa + 2xb each) — unigram scores tie, bigram must not;
    // doc 5 has one token: totality row (0, 0.0)
    val fix = Seq(
      (1L, "a b a b a"), (2L, "a b a b a"), (3L, "a b a b a"),
      (4L, "a a b b a"), (5L, "z"))
      .toDF("doc_id", "text")
    // exact mirror: same literals, round12 terms, BigDecimal sum, round6
    val toksOf = Map(1L -> "a b a b a", 2L -> "a b a b a", 3L -> "a b a b a",
      4L -> "a a b b a", 5L -> "z").view.mapValues(_.split(" ").toSeq).toMap
    val allToks = toksOf.values.flatten.toSeq
    val uni = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = allToks.size.toLong
    val bigs = toksOf.values.flatMap(t => t.zip(t.tail)).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def r(d: Double, sc: Int) = java.math.BigDecimal.valueOf(d)
      .setScale(sc, java.math.RoundingMode.HALF_UP)
    val mirror = toksOf.map { case (id, t) =>
      val terms = t.zip(t.tail).map { bg =>
        val p = 0.7 * (bigs(bg).toDouble / uni(bg._1)) +
          0.3 * (uni(bg._2).toDouble / n)
        r(-math.log(p), 12)
      }
      if (terms.isEmpty) id -> ((0L, 0.0))
      else id -> ((terms.size.toLong,
        r(terms.reduce(_ add _).doubleValue() / terms.size, 6).doubleValue()))
    }
    val got = TextAnalysis.bigramLogprobFrom(fix).collect()
      .map(row => row.getLong(0) -> ((row.getLong(1), row.getDouble(2)))).toMap
    assert(got === mirror)
    // discrimination: unigram scores tie across docs 1-4, bigram does not
    val ug = TextAnalysis.unigramLogprobFrom(fix).collect()
      .map(row => row.getLong(0) -> row.getDouble(2)).toMap
    assert(Set(1L, 2L, 3L, 4L).map(ug).size === 1,
      "unigram must be blind to token order")
    assert(got(4L)._2 > got(1L)._2,
      "shuffled doc must score worse under the bigram model")
  }

  test("char entropy: hand-computed fixtures incl. empty-skeleton totality") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"), //        uniform single char: H = 0
      (2L, "ab"), //          two equiprobable chars: H = 1
      (3L, "AaBb!?"), //      skeleton "aabb": case-folded, punct dropped: H = 1
      (4L, "abcd"), //        four equiprobable: H = 2
      (5L, "!!! ..."), //     empty skeleton: kept with 0 chars, H = 0
      (6L, "aab")) //         p=(2/3,1/3): H = 0.918296
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropyFrom(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 1L, 0.0)))
    assert(got(2L) === ((2L, 2L, 1.0)))
    assert(got(3L) === ((4L, 2L, 1.0)))
    assert(got(4L) === ((4L, 4L, 2.0)))
    assert(got(5L) === ((0L, 0L, 0.0)))
    assert(got(6L) === ((3L, 2L, 0.918296)))
    // corpus sanity: real documents land in the text-shaped band
    val corpus = TextAnalysis.charEntropy(spark, Sf).collect()
    assert(corpus.length === Tables.documents(spark, Sf).count())
    val ents = corpus.map(_.getAs[Double]("entropy"))
    assert(ents.forall(e => e >= 0.0 && e <= math.log(36.0) / math.log(2.0)))
    assert(ents.count(_ > 3.5) > ents.length / 2,
      "most natural-text docs should exceed 3.5 bits/char")
  }

  test("heavy hitters: exact counts equal a full group-by; threshold honored") {
    import spark.implicits._
    val toks = Tables.documents(spark, Sf)
      .select(explode(graft.functions.EngineNeutral.wsTokens(lower(col("text"))))
        .as("token"))
    val n = toks.count()
    val theta = math.ceil(0.002 * n).toLong
    val brute = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= theta).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = TextAnalysis.heavyHitters(spark, Sf).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("freq"),
        r.getAs[Long]("n_total"), r.getAs[Double]("rel_freq")))
    assert(got.nonEmpty, "fixture corpus should have heavy tokens at phi=0.002")
    assert(got.map(g => g._1 -> g._2).toMap === brute,
      "sketch-then-confirm must equal the exact full group-by")
    got.foreach { case (_, f, nt, rf) =>
      assert(nt === n)
      assert(f >= theta)
      assert(rf === BigDecimal(f.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("misra-gries summary: superset guarantee under adversarial order and merges") {
    // stream: 3 heavy items drowned in 600 distinct singletons; cap=10
    // => guarantee covers freq > n/(cap+1) = 690/11 ~ 62.7
    val heavy = Seq("alpha" -> 70, "beta" -> 65, "gamma" -> 64)
    val noise = (1 to 600).map(i => s"noise$i" -> 1)
    val items = (heavy ++ noise).flatMap { case (t, c) => Seq.fill(c)(t) }
    // adversarial: all noise FIRST (forces max decrements), heavy last;
    // and split across 7 sub-summaries merged pairwise like partitions
    val orders = Seq(items, items.reverse, scala.util.Random.shuffle(items))
    orders.foreach { stream =>
      val parts = stream.grouped(math.max(1, stream.size / 7)).map { chunk =>
        val s = new graft.functions.MGSummary(10)
        chunk.foreach(s.add)
        s
      }.toSeq
      val merged = parts.reduce { (a, b) => a.mergeIn(b); a }
      assert(merged.m.size <= 10, "cap violated after merges")
      heavy.foreach { case (t, _) =>
        assert(merged.m.contains(t),
          s"heavy item $t lost (freq > n/(cap+1) must survive any order)")
      }
    }
  }

  test("count-min sketch: estimate >= exact always; min over rows is tight " +
    "when any probe row is collision-free") {
    import spark.implicits._
    val got = TextAnalysis.cmsEstimate(spark, Sf).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("freq"),
        r.getAs[Long]("cms_est"), r.getAs[Long]("overestimate")))
    assert(got.nonEmpty, "heavy-hitter probe set should be non-empty")
    got.foreach { case (t, f, est, over) =>
      assert(est >= f, s"CMS under-counted $t: est=$est < freq=$f")
      assert(over === est - f)
    }
    // probe rows must equal the heavy-hitter report exactly (same tokens,
    // same exact counts)
    val hh = TextAnalysis.heavyHitters(spark, Sf).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("freq")).toMap
    assert(got.map(g => g._1 -> g._2).toMap === hh)
    // the sketch never has more than depth*width cells, and cell counts
    // conserve total token mass per row
    val toks = Tables.documents(spark, Sf)
      .select(explode(graft.functions.EngineNeutral.wsTokens(lower(col("text"))))
        .as("token"))
    val n = toks.count()
    val cells = toks
      .select(col("token"), explode(array((0 until 4).map(lit): _*)).as("j"))
      .select(col("j"), (graft.functions.EngineNeutral.hash60(
        concat(col("token"), lit("#cms"), col("j").cast("string"))) % 4096)
        .as("bucket"))
      .groupBy("j", "bucket").count()
    assert(cells.count() <= 4L * 4096L)
    val perRow = cells.groupBy("j").agg(sum("count").as("mass"))
      .collect().map(_.getLong(1))
    assert(perRow.length === 4 && perRow.forall(_ === n),
      "each sketch row must conserve total token mass")
  }

  test("mm phash pairs match a brute-force per-mime simhash all-pairs") {
    def refHash60(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def phashOf(text: String): Long = {
      val sk = text.toLowerCase.replaceAll("[^a-z0-9]", "")
      val hs =
        if (sk.length < 4) Seq.empty[Long]
        else sk.sliding(4).toSeq.distinct.map(refHash60)
      (0 until 48).foldLeft(0L) { (acc, b) =>
        val ones = hs.count(h => ((h >> b) & 1L) == 1L)
        if (2 * ones >= hs.size) acc | (1L << b) else acc
      }
    }
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), phashOf(r.getString(1))))
    val byMime = docs.groupBy { case (id, _) => id % 3 }
    val expected = byMime.values.flatMap { grp =>
      val g = grp.toSeq
      for {
        (a, ha) <- g; (b, hb) <- g
        if a < b && java.lang.Long.bitCount(ha ^ hb) <= 5
      } yield (a, b, java.lang.Long.bitCount(ha ^ hb).toLong)
    }.toSet
    val got = MultiModal.mmPhashPairs(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected, "engine pairs diverge from the brute force")
    assert(got.nonEmpty, "fixture corpus must contain near-dup assets")
    // mime scoping: endpoints always share a modality
    MultiModal.mmPhashPairs(spark, Sf).collect().foreach { r =>
      assert(r.getLong(1) % 3 === r.getLong(2) % 3,
        "a pair must never cross modalities")
    }
  }

  test("mm phash clusters: per-mime family histogram equals brute-force " +
    "connected components over the pair graph") {
    val assets = Tables.documents(spark, Sf).select("doc_id").collect()
      .map(_.getLong(0))
    val pairs = MultiModal.mmPhashPairs(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // brute-force CC: union-find over the pair list
    val parent = collection.mutable.Map(assets.map(a => a -> a): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    def mimeOf(id: Long): String = (id % 3) match {
      case 0 => "image/png"; case 1 => "audio/wav"; case _ => "video/mp4"
    }
    val expected = assets.groupBy(find).toSeq
      .map { case (root, members) => (mimeOf(root), members.length.toLong) }
      .groupBy(identity)
      .map { case ((mime, sz), xs) =>
        (mime, sz, xs.size.toLong, xs.size.toLong * sz)
      }.toSet
    val got = MultiModal.mmPhashClusters(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected, "engine histogram diverges from union-find")
    // totals: every asset appears in exactly one family
    assert(got.toSeq.map(_._4).sum === assets.length.toLong)
    // a family never crosses modality (pairs are mime-scoped), so the
    // three mimes' asset totals are exactly the id%3 partition sizes
    val byMime = got.groupBy(_._1).view.mapValues(_.toSeq.map(_._4).sum).toMap
    assert(byMime === assets.groupBy(mimeOf).view
      .mapValues(_.length.toLong).toMap)
  }

  test("token fertility: per-source totals and rates equal a brute-force " +
    "mirror; every source covered") {
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.documents(spark, Sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val ref = docs.groupBy(_._1).map { case (src, ds) =>
      val w = ds.map { case (_, t) =>
        if (t.trim.isEmpty) 0L else t.trim.toLowerCase.split("\\s+").length.toLong
      }.sum
      val b = ds.map { case (_, t) => bpeRe.findAllIn(t).length.toLong }.sum
      val c = ds.map(_._2.length.toLong).sum
      val n = ds.length.toLong
      (src, n, w, b, c,
        if (w > 0) r6(b.toDouble / w.toDouble) else Double.NaN,
        if (b > 0) r6(c.toDouble / b.toDouble) else Double.NaN,
        r6(b.toDouble / n.toDouble))
    }.toSet
    val got = TextAnalysis.tokenFertility(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSet
    assert(got === ref, "engine fertility diverges from the mirror")
    assert(got.map(_._1) === docs.map(_._1).toSet)
    // sanity: fertility >= 1 (a word splits into >= 1 BPE-ish pieces)
    got.foreach { r => assert(r._6 >= 1.0, s"fertility < 1 for ${r._1}") }
  }

  test("zipf fit matches a BigDecimal least-squares reference; slope is " +
    "negative and r2 sane on natural-ish text") {
    import spark.implicits._
    def round8(d: Double) = BigDecimal(d)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    def round6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val freqs = Tables.documents(spark, Sf)
      .select(explode(graft.functions.EngineNeutral.wsTokens(lower(col("text"))))
        .as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t, f) => (-f, t) }.take(200)
    val nVocab = freqs.length
    val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
      (round8(math.log(i + 1.0)), round8(math.log(f.toDouble)))
    }
    def dsum(vs: Seq[Double]): Double =
      vs.map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val n = pts.length.toDouble
    val sx = dsum(pts.map(_._1)); val sy = dsum(pts.map(_._2))
    val sxx = dsum(pts.map(p => round8(p._1 * p._1)))
    val syy = dsum(pts.map(p => round8(p._2 * p._2)))
    val sxy = dsum(pts.map(p => round8(p._1 * p._2)))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    val r2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = TextAnalysis.zipfFit(spark, Sf).collect()(0)
    assert(got.getAs[Long]("n_terms") === nVocab.toLong)
    assert(math.abs(got.getAs[Double]("slope") - round6(slope)) < 2e-6)
    assert(math.abs(got.getAs[Double]("intercept") - round6(intercept)) < 2e-6)
    assert(math.abs(got.getAs[Double]("r2") - round6(r2)) < 2e-6)
    assert(got.getAs[Double]("slope") < 0.0, "rank-frequency must decline")
    val r2v = got.getAs[Double]("r2")
    assert(r2v > 0.0 && r2v <= 1.0, s"r2 out of range: $r2v")
  }
  test("gopher rules: each rule trips on its designed violator; clean doc passes") {
    import spark.implicits._
    val fifty = (1 to 25).flatMap(i => Seq("the", s"word$i")).mkString(" ")
    val docs = Seq(
      // 0: clean — 50 words, the+of stop kinds, all-alpha, sane lengths
      (0L, fifty + " of be and that"), // 54 words
      (1L, "the of short doc"), //            r_word_count: 4 words
      (2L, fifty.replace("word", "w")), //    r_mean_word_len: mean < 3
      (3L, fifty + " " + "### ## # ## ### ## #"), // r_symbol: 7 hash tokens / 57 words... each token multiple #
      (4L, (1 to 50).map(i => s"- the item$i of").mkString("\n")), // r_bullet: every line bullet-led
      (5L, (1 to 50).map(i => s"the line$i of trails ...").mkString("\n")), // r_ellipsis
      (6L, ((1 to 25).map(_.toString) ++ (1 to 25).map(i => s"${i}000")).mkString(" ")
        + " the of " + (1 to 8).map(_ => "42").mkString(" ")), // r_alpha: 58 words, 2 alpha
      (7L, (1 to 50).map(i => s"word$i only").mkString(" "))) // r_stop: zero stop words
      .map { case (id, tx) => (id, tx, "en", "fx", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.gopherRulesFrom(docs).collect().map { r =>
      r.getAs[Long]("doc_id") -> r
    }.toMap
    assert(got(0L).getAs[Boolean]("gopher_pass"), "clean doc must pass all rules")
    val failCol = Map(1L -> "r_word_count", 2L -> "r_mean_word_len",
      3L -> "r_symbol", 4L -> "r_bullet", 5L -> "r_ellipsis",
      6L -> "r_alpha", 7L -> "r_stop")
    failCol.foreach { case (id, col) =>
      assert(!got(id).getAs[Boolean](col), s"doc $id must fail $col")
      assert(!got(id).getAs[Boolean]("gopher_pass"), s"doc $id must fail overall")
    }
    // measured signals spot-checks
    assert(got(0L).getAs[Long]("n_words") === 54L)
    assert(got(0L).getAs[Long]("n_stop_kinds") === 5L) // the, of, be, and, that
    assert(got(4L).getAs[Double]("bullet_frac") === 1.0)
    assert(got(5L).getAs[Double]("ellipsis_line_frac") === 1.0)
    assert(got(7L).getAs[Long]("n_stop_kinds") === 0L)
    // registered entry = From columns + source (the From variant keeps
    // the minimal (doc_id, text) schema contract; the registered report
    // carries the per-source audit key)
    val reg = TextAnalysis.gopherRules(spark, Sf)
    assert(reg.columns.toSeq.filterNot(_ == "source")
      === got(0L).schema.fieldNames.toSeq)
    assert(reg.columns.contains("source"))
    // the From variant really does run on a bare (doc_id, text) frame
    val bare = TextAnalysis.gopherRulesFrom(
      docs.select(col("doc_id"), col("text")))
    assert(bare.count() === 8L)
    assert(reg.count() === Tables.documents(spark, Sf).count(),
      "one row per document, pass or fail")
  }
  test("shot boundaries: equals a brute-force frame-delta mirror; " +
    "single-frame assets report null deltas") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val vids = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 == 2)
    // Pin the ASCII-corpus assumption the DuckDB twin leans on: the
    // oracle slices with character-based substr/strlen while the Spark
    // side slices the UTF-8 payload by bytes — equivalent iff the
    // synthetic corpus is pure ASCII. If test data ever grows non-ASCII
    // text, fail HERE with a named cause, not as an oracle hash diff.
    vids.foreach { case (id, text) =>
      assert(text.forall(_ < 128),
        s"payload corpus must be ASCII for byte==char slicing (doc $id)")
    }
    val expected = vids.map { case (id, text) =>
      val offs = 0L.until(text.length.toLong, 64L)
      val fs = offs.map { o =>
        val win = text.substring(o.toInt, math.min(o.toInt + 32, text.length))
        java.lang.Long.parseLong(md5hex(win).take(15), 16) % 256L
      }
      val deltas = fs.sliding(2).collect { case Seq(a, b) => math.abs(b - a) }.toSeq
      val mean =
        if (deltas.isEmpty) None
        else Some(BigDecimal(deltas.sum.toDouble / deltas.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      id -> ((fs.size.toLong, deltas.count(_ >= 85L).toLong, mean,
        if (deltas.isEmpty) None else Some(deltas.max)))
    }.toMap
    val got = MultiModal.mmShotBoundaries(spark, Sf).collect().map { r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_cuts"),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    }.toMap
    assert(got.keySet === expected.keySet, "one row per non-empty video asset")
    got.foreach { case (id, v) =>
      assert(v === expected(id), s"asset $id: $v vs ${expected(id)}")
    }
    // corpus exercises both arms: some cuts fire, and deltas are bounded
    assert(got.values.map(_._2).sum > 0, "threshold 85 must fire somewhere")
    got.values.flatMap(_._4).foreach(d => assert(d >= 0L && d <= 255L))
  }
  test("markov stationary: matches a BigDecimal power-iteration mirror; " +
    "probabilities normalized; empirical shares partition") {
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val trans = Events.pathTransitions(spark, Sf).collect()
      .map(row => (row.getString(0), row.getString(1)) -> row.getLong(2)).toMap
    val rowTot = trans.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val p = trans.map { case ((f, t), n) => (f, t) -> r(n.toDouble / rowTot(f), 8) }
    val states = (trans.keys.map(_._1) ++ trans.keys.map(_._2)).toSeq.distinct.sorted
    var pi = states.map(_ -> r(1.0 / states.size, 8)).toMap
    for (_ <- 1 to 6) {
      val sums = states.map { t =>
        t -> p.collect { case ((f, t2), pv) if t2 == t =>
          BigDecimal(r(pi(f) * pv, 12)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
      }.toMap
      val tot = sums.values.sum
      pi = states.map(t => t -> r((sums(t) / tot).toDouble, 8)).toMap
    }
    val grand = trans.values.sum
    val got = Events.markovStationary(spark, Sf).collect().map { row =>
      row.getAs[String]("event_type") ->
        ((row.getAs[Double]("stationary_p"), row.getAs[Long]("n_out_transitions"),
          row.getAs[Double]("empirical_from_share")))
    }.toMap
    assert(got.keySet === states.toSet)
    got.foreach { case (t, (sp, nOut, emp)) =>
      assert(math.abs(sp - pi(t)) < 1e-9, s"state $t: $sp vs ${pi(t)}")
      assert(nOut === rowTot.getOrElse(t, 0L))
      assert(math.abs(emp - r(rowTot.getOrElse(t, 0L).toDouble / grand, 8)) < 1e-9)
    }
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-4, "mass normalized")
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-4, "shares partition")
  }

  test("lexical diversity: hand-computed fixture; yule k separates " +
    "repetitive from diverse text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a b"), //        5 tokens, 2 types, cnt 4+1
      (2L, "v w x y z"), //        all hapax
      (3L, "a b a b")) //          2+2
      .map { case (id, tx) => (id, tx, "en", "fx", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.lexicalDiversityFrom(docs).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    }.toMap
    // doc 1: N=5, V=2, hapax=1; K = 1e4*(16+1-5)/25 = 4800
    assert(got(1L) === ((5L, 2L, 0.4, 0.5, 4800.0)))
    // doc 2: N=5, V=5, all hapax; K = 1e4*(5-5)/25 = 0
    assert(got(2L) === ((5L, 5L, 1.0, 1.0, 0.0)))
    // doc 3: N=4, V=2, no hapax; K = 1e4*(4+4-4)/16 = 2500
    assert(got(3L) === ((4L, 2L, 0.5, 0.0, 2500.0)))
    // repetitive text scores strictly higher K than diverse text
    assert(got(1L)._5 > got(2L)._5)
  }

  test("attribution: linear credit on a hand-built fixture; window " +
    "boundaries half-open; untouched conversions fall to 'direct'") {
    import spark.implicits._
    val ev = Seq(
      // u1: two in-window touches share the 10.0 purchase equally
      (1L, 1L, "view", 0.0, 1000L),
      (2L, 1L, "click", 0.0, 1500L),
      (3L, 1L, "purchase", 10.0, 2000L),
      // u2: no touches at all
      (4L, 2L, "purchase", 7.5, 9000L),
      // u3: touch at the SAME ms as the conversion — excluded (t < ms)
      (5L, 3L, "view", 0.0, 3000L),
      (6L, 3L, "purchase", 2.0, 3000L),
      // u4: touch older than the window — excluded (t >= ms - window)
      (7L, 4L, "click", 0.0, 500L),
      (8L, 4L, "purchase", 4.0, 2000L))
      .toDF("event_id", "user_id", "event_type", "value", "ms")
    val got = Events.attributionFrom(ev, "purchase",
        Seq("view", "click", "signup"), windowMs = 1000L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("view") === ((1L, 1L, 5.0)))
    assert(got("click") === ((1L, 1L, 5.0)))
    assert(got("direct") === ((0L, 3L, 13.5)))
    assert(got.size === 3)
    // boundary inclusion: a touch exactly at ms - window IS in window
    val ev2 = Seq(
      (1L, 1L, "view", 0.0, 1000L),
      (2L, 1L, "purchase", 6.0, 2000L))
      .toDF("event_id", "user_id", "event_type", "value", "ms")
    val g2 = Events.attributionFrom(ev2, "purchase",
        Seq("view"), windowMs = 1000L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(g2 === Map("view" -> ((1L, 1L, 6.0))))
  }

  test("cusum changepoint: planted level shift found at the shift hour; " +
    "flat series ties to the earliest hour; last hour never a candidate") {
    import spark.implicits._
    val hourly = (
      // A: level 10 for 4 hours then 20 for 4 hours -> cp at hour 4
      (1L to 4L).map(h => (h * 3600, "A", 10L)) ++
      (5L to 8L).map(h => (h * 3600, "A", 20L)) ++
      // B: flat -> every S_t = 0, tie broken by earliest hour
      (1L to 5L).map(h => (h * 3600, "B", 7L)) ++
      // C: single hour -> excluded entirely (t_hours < 2)
      Seq((3600L, "C", 99L)))
      .toDF("hour_ts", "event_type", "n")
    val got = Events.changepointCusumFrom(hourly).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet === Set("A", "B"))
    // A: |S|max = |4*10*8 - 4*120| = 160 at pos 4; means 10 / 20
    assert(got("A") === ((4L * 3600, 8L, 160L, 10.0, 20.0)))
    // B: all-zero CUSUM -> earliest hour, means equal the flat level
    assert(got("B") === ((1L * 3600, 5L, 0L, 7.0, 7.0)))
    // registered query: one row per event type present, sane values
    val reg = Events.changepointCusum(spark, Sf).collect()
    assert(reg.nonEmpty)
    reg.foreach { r =>
      assert(r.getAs[Long]("s_abs_scaled") >= 0L)
      assert(r.getAs[Double]("mean_before") > 0.0)
      assert(r.getAs[Double]("mean_after") > 0.0)
    }
  }

  test("itemset pairs: hand-computed support and lift; dedup within " +
    "basket; no cross-day or cross-user pairing") {
    import spark.implicits._
    // baskets: u1/d1 {view, click, purchase} (click twice — dedup),
    // u1/d2 {view}, u2/d1 {view, click}, u3/d1 {purchase}
    // -> 4 baskets; pairs: (click,view) x2, (click,purchase) x1,
    //    (purchase,view) x1
    val base = Seq(
      (1L, "d1", "view"), (1L, "d1", "click"), (1L, "d1", "click"),
      (1L, "d1", "purchase"),
      (1L, "d2", "view"),
      (2L, "d1", "view"), (2L, "d1", "click"),
      (3L, "d1", "purchase"))
      .toDF("user_id", "day", "event_type")
    val got = Events.itemsetPairsFrom(base).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // singles: view 3, click 2, purchase 2; n_baskets 4
    assert(got.keySet === Set(("click", "view"), ("click", "purchase"),
      ("purchase", "view")))
    assert(got(("click", "view")) === ((2L, 0.5, 1.333333))) // 8/6 @6dp
    assert(got(("click", "purchase")) === ((1L, 0.25, 1.0))) // 4/4
    assert(got(("purchase", "view")) === ((1L, 0.25, 0.666667))) // 4/6 @6dp
    // registered query: bounded by |types|^2, canonical order, sane stats
    val reg = Events.itemsetPairs(spark, Sf).collect()
    assert(reg.nonEmpty)
    reg.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not canonical")
      assert(r.getAs[Double]("support") > 0.0 && r.getAs[Double]("support") <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("dsir weights: hand-built reference on a disjoint-vocabulary " +
    "fixture; target docs positive, off-target negative, empty doc absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "alpha beta alpha"),
      (2L, "en", "beta beta"),
      (3L, "de", "gamma delta"),
      (4L, "de", "delta delta gamma"),
      (5L, "en", "")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.dsirWeightsFrom(docs, 1024, "en").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(!got.contains(5L), "empty doc has no tokens and emits no row")
    // reference assumes the 4 distinct words occupy 4 distinct hash
    // buckets (deterministic — a collision would fail the equality and
    // the words would be re-chosen): nt=5 target tokens, nr=10 raw
    def r(v: Double, n: Int) =
      BigDecimal(v).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    def lr(ct: Long, cr: Long) = r(
      math.log((ct + 1).toDouble / (5 + 1024).toDouble) -
        math.log((cr + 1).toDouble / (10 + 1024).toDouble), 12)
    val (la, lb, lg, ld) = (lr(2, 2), lr(3, 3), lr(0, 2), lr(0, 3))
    def doc(terms: Seq[Double]) = {
      val s = terms.map(BigDecimal(_)).sum
      (terms.size.toLong, r(s.toDouble, 6), r(s.toDouble / terms.size, 6))
    }
    assert(got(1L) === doc(Seq(la, lb, la)))
    assert(got(2L) === doc(Seq(lb, lb)))
    assert(got(3L) === doc(Seq(lg, ld)))
    assert(got(4L) === doc(Seq(ld, ld, lg)))
    assert(got(1L)._2 > 0 && got(2L)._2 > 0,
      "target-language docs carry positive log importance")
    assert(got(3L)._2 < 0 && got(4L)._2 < 0,
      "off-target docs carry negative log importance")
  }

  test("source KL: hand-built reference on a two-source fixture; " +
    "identical-to-corpus source scores zero, skewed source positive") {
    import spark.implicits._
    // source A = the pooled distribution's majority, source B skewed:
    // corpus = {x:4, y:2, z:2}; A = {x:2, y:1, z:1} (exactly the corpus
    // mix -> KL 0); B = {x:2, y:1, z:1}? no — make B skewed {x:2, z:2}
    val docs = Seq(
      ("A", "x x y z"),
      ("B", "x x z z"))
      .toDF("source", "text")
    val got = TextAnalysis.sourceKlFrom(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def r(v: Double, n: Int) =
      BigDecimal(v).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    def kl(counts: Seq[(Long, Long)], ns: Long, n: Long): Double = {
      val s = counts.map { case (c, ct) =>
        BigDecimal(r((c.toDouble / ns)
          * math.log((c.toDouble / ns) / (ct.toDouble / n)), 12)).setScale(12)
      }.sum
      r(s.toDouble, 6)
    }
    // corpus: x=4, y=1, z=3 over n=8; A: x=2,y=1,z=1 over 4; B: x=2,z=2 over 4
    assert(got("A") === ((3L, 4L, kl(Seq((2L, 4L), (1L, 1L), (1L, 3L)), 4L, 8L))))
    assert(got("B") === ((2L, 4L, kl(Seq((2L, 4L), (2L, 3L)), 4L, 8L))))
    // the skewed source diverges more than the majority-mix source
    assert(got("B")._3 > got("A")._3)
    // and on the real fixture corpus every KL is >= 0 up to rounding
    val real = TextAnalysis.sourceKl(spark, Sf).collect()
    assert(real.nonEmpty)
    real.foreach(r0 => assert(r0.getDouble(3) >= -1e-6,
      s"KL must be non-negative, got ${r0.getDouble(3)} for ${r0.getString(0)}"))
  }

  test("periodicity: a 24h-periodic series scores autocorr 1, a constant " +
    "series 0 by the exact-variance guard; pair count excludes the lag head") {
    import spark.implicits._
    val hours = 0 until 72
    val hourly = (
      hours.map(h => ((1000000L + h) * 3600L, "daily", (h % 24 + 1).toLong)) ++
        hours.map(h => ((1000000L + h) * 3600L, "flat", 5L))
      ).toDF("hour_ts", "event_type", "n")
    val got = Events.periodicityFrom(hourly, 24).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("daily") === ((48L, 24L, 1.0)),
      "identical series 24h apart must correlate to exactly 1 after round(6)")
    assert(got("flat") === ((48L, 24L, 0.0)),
      "zero-variance series must hit the exact-integer guard, not NaN")
    // densification: dropping one mid-grid hour from 'daily' must change
    // the pair count not at all (grid is the full range) and keep a
    // defined result
    val sparse = hourly.filter(!($"event_type" === "daily" &&
      $"hour_ts" === (1000000L + 30) * 3600L))
    val got2 = Events.periodicityFrom(sparse, 24).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2("daily") === 48L)
  }

  test("ewma anomaly: spike over a flat baseline scores the exact " +
    "hand-computed deviation; gaps renormalize; thin baselines emit no row") {
    import spark.implicits._
    def r6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val h0 = 1000000L
    // flat 5s for 24 hours, then a 50 spike; one mid-baseline gap hour
    val spike = (0 until 24).filter(_ != 20)
      .map(h => ((h0 + h) * 3600L, "spike", 5L)) :+
      ((h0 + 24) * 3600L, "spike", 50L)
    // only 5 baseline hours — under minBaseline, must emit nothing
    val thin = (0 until 6).map(h => ((h0 + h) * 3600L, "thin", 5L))
    val hourly = (spike ++ thin).toDF("hour_ts", "event_type", "n")
    val got = Events.ewmaAnomalyFrom(hourly).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.forall(_._1 == "spike"), "thin baseline must emit no row")
    val atSpike = got.filter(_._2 == (h0 + 24) * 3600L)
    assert(atSpike.length === 1)
    // all present baseline points are 5, so the renormalized EWMA is
    // exactly 5 regardless of the gap; deviation = (50-5)/sqrt(6)
    assert(atSpike.head._4 === 5.0)
    assert(atSpike.head._5 === r6(45.0 / math.sqrt(6.0)))
    // output ordered by |deviation| desc
    val devs = got.map(t => math.abs(t._5))
    assert(devs.sameElements(devs.sorted(Ordering[Double].reverse)))
  }

  test("interarrival stats: hand-computed gaps, exact mean, nearest-rank " +
    "percentiles; single-event types emit no row") {
    import spark.implicits._
    val ev = Seq(
      ("a", 1L, 0L), ("a", 2L, 1000L), ("a", 3L, 3000L), ("a", 4L, 10000L),
      ("b", 5L, 42L)) // single event: no gap, no row
      .toDF("event_type", "event_id", "ms")
    val got = Events.interarrivalStatsFrom(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === Set("a"))
    // gaps 1000, 2000, 7000: mean 10000/3 -> 3333.333; p50 at rank
    // floor(2*0.5)+1=2 -> 2000; p90 at rank floor(2*0.9)+1=2 -> 2000
    assert(got("a") === ((4L, 3L, 3333.333, 2000L, 2000L)))
    // tie order among equal timestamps is pinned by event_id, so a
    // duplicate-ts fixture still yields deterministic zero gaps
    val tied = Seq(("t", 1L, 100L), ("t", 2L, 100L), ("t", 3L, 200L))
      .toDF("event_type", "event_id", "ms")
    val t = Events.interarrivalStatsFrom(tied).collect().head
    assert((t.getLong(1), t.getLong(2), t.getLong(4)) === ((3L, 2L, 0L)),
      "p50 of gaps [0, 100] must pick the actual 0 gap")
  }

  test("burstiness: hand-computed moments on fixtures for all three " +
    "regimes; metronome pins B = -1, coefficient bounded in (-1, 1)") {
    import spark.implicits._
    def r(d: Double, sc: Int) = java.math.BigDecimal.valueOf(d)
      .setScale(sc, java.math.RoundingMode.HALF_UP).doubleValue()
    // metronome: constant gaps -> sigma 0 -> B = (0-mu)/(0+mu) = -1
    val metro = Seq(("m", 1L, 0L), ("m", 2L, 500L), ("m", 3L, 1000L),
      ("m", 4L, 1500L)).toDF("event_type", "event_id", "ms")
    val m = Events.burstinessFrom(metro).collect().head
    assert((m.getString(0), m.getLong(1), m.getDouble(2), m.getDouble(3),
      m.getDouble(4), m.getDouble(5)) === (("m", 3L, 500.0, 0.0, 0.0, -1.0)))
    // bursty: gaps 1, 1, 9998 -> hand-computed population moments
    val burst = Seq(("b", 1L, 0L), ("b", 2L, 1L), ("b", 3L, 2L),
      ("b", 4L, 10000L)).toDF("event_type", "event_id", "ms")
    val b = Events.burstinessFrom(burst).collect().head
    val mu = 10000.0 / 3
    val sd = math.sqrt((1.0 + 1.0 + 9998.0 * 9998.0) / 3 - mu * mu)
    assert(b.getLong(1) === 3L)
    assert(b.getDouble(2) === r(mu, 3))
    assert(b.getDouble(3) === r(sd, 3))
    assert(b.getDouble(4) === r(sd / mu, 6))
    assert(b.getDouble(5) === r((sd - mu) / (sd + mu), 6))
    // n=3 gaps cap sigma at mu*sqrt(2), so B is bounded by ~0.17 here —
    // positive (bursty side) is the regime claim, not magnitude
    assert(b.getDouble(5) > 0.1, "near-degenerate bursts must read bursty")
    // degenerate: all-duplicate timestamps → every gap 0 → mu = 0 →
    // both ratios 0/0; the sum_g > 0 guard emits null on both sides
    // (Spark's non-ANSI Divide would null, DuckDB would NaN — the
    // explicit guard pins one convention)
    val dup = Seq(("d", 1L, 100L), ("d", 2L, 100L), ("d", 3L, 100L))
      .toDF("event_type", "event_id", "ms")
    val d = Events.burstinessFrom(dup).collect().head
    assert((d.getLong(1), d.getDouble(2), d.getDouble(3)) === ((2L, 0.0, 0.0)))
    assert(d.isNullAt(4) && d.isNullAt(5), "mu=0 ratios must be null")
    // real corpus: every type emits one row, coefficients in [-1, 1]
    val got = Events.burstiness(spark, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val bc = row.getDouble(5)
      assert(bc >= -1.0 && bc <= 1.0, s"${row.getString(0)}: B=$bc")
      assert(row.getDouble(4) >= 0.0)
    }
  }

  test("dedup impact: hand-computed counts and survivor KL on a " +
    "duplicated fixture; KL non-negative on the real corpus") {
    import spark.implicits._
    def r(d: Double, sc: Int) = java.math.BigDecimal.valueOf(d)
      .setScale(sc, java.math.RoundingMode.HALF_UP)
    val docs = Seq(
      (1L, "a a a b"), (2L, "a a a b"), // exact copies: keep doc 1
      (3L, "a b b c")) // unique
      .toDF("doc_id", "text")
    val row = TextAnalysis.dedupImpactFrom(docs).collect()(0)
    assert(row.getAs[Long]("n_docs") === 3L)
    assert(row.getAs[Long]("n_docs_kept") === 2L)
    assert(row.getAs[Long]("n_tokens") === 12L)
    assert(row.getAs[Long]("n_tokens_kept") === 8L)
    assert(row.getAs[Long]("n_types") === 3L)
    assert(row.getAs[Long]("n_types_kept") === 3L)
    // mirror the engine's exact KL arithmetic: full a:7 b:4 c:1 (N=12),
    // kept a:4 b:3 c:1 (Nk=8)
    val terms = Seq((4L, 7L), (3L, 4L), (1L, 1L)).map { case (ck, c) =>
      r((ck.toDouble / 8L) * math.log((ck.toDouble / 8L) / (c.toDouble / 12L)), 12)
    }
    val want = r(terms.reduce(_ add _).doubleValue(), 6).doubleValue()
    assert(row.getAs[Double]("kl_kept_vs_full") === want)
    // survivors' distribution can only stay or drift, never "anti-drift"
    val real = TextAnalysis.dedupImpact(spark, Sf).collect()(0)
    assert(real.getAs[Double]("kl_kept_vs_full") >= -1e-6)
    assert(real.getAs[Long]("n_docs_kept") <= real.getAs[Long]("n_docs"))
    assert(real.getAs[Long]("n_types_kept") <= real.getAs[Long]("n_types"))
  }

  test("heaps fit matches a BigDecimal least-squares reference over " +
    "doc-prefix buckets; growth exponent positive") {
    def round8(d: Double) = BigDecimal(d)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    def round6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    def toks(t: String): Seq[String] = {
      val tr = t.toLowerCase.trim
      if (tr.isEmpty) Seq() else tr.split("\\s+").toSeq
    }
    val mx = docs.map(_._1).max
    val step = mx / 64 + 1
    val seen = collection.mutable.Set[String]()
    val bt = collection.mutable.Map[Long, Long]()
    val bv = collection.mutable.Map[Long, Long]()
    for ((id, t) <- docs) {
      val ws = toks(t)
      val g = id / step
      bt(g) = bt.getOrElse(g, 0L) + ws.length
      bv(g) = bv.getOrElse(g, 0L) + ws.count(seen.add)
    }
    var (cn, cv) = (0L, 0L)
    val pts = bt.keys.toSeq.sorted.flatMap { g =>
      cn += bt(g); cv += bv(g)
      if (cn > 0 && cv > 0)
        Some((round8(math.log(cn.toDouble)), round8(math.log(cv.toDouble))))
      else None
    }
    def dsum(vs: Seq[Double]): Double =
      vs.map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val n = pts.length.toDouble
    val sx = dsum(pts.map(_._1)); val sy = dsum(pts.map(_._2))
    val sxx = dsum(pts.map(p => round8(p._1 * p._1)))
    val syy = dsum(pts.map(p => round8(p._2 * p._2)))
    val sxy = dsum(pts.map(p => round8(p._1 * p._2)))
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val lnK = (sy - beta * sx) / n
    val r2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = TextAnalysis.heapsFit(spark, Sf).collect()(0)
    assert(got.getAs[Long]("n_points") === pts.length.toLong)
    assert(math.abs(got.getAs[Double]("beta") - round6(beta)) < 2e-6)
    assert(math.abs(got.getAs[Double]("ln_k") - round6(lnK)) < 2e-6)
    assert(math.abs(got.getAs[Double]("r2") - round6(r2)) < 2e-6)
    // the synthetic corpus draws from a CLOSED ~40-word vocabulary, so
    // it saturates within the first bucket and beta rounds to 0 — the
    // "template flood" reading the operator exists to flag. A genuinely
    // open vocabulary must push beta positive: append docs with fresh
    // tokens and re-fit.
    assert(got.getAs[Double]("beta") >= 0.0)
    import spark.implicits._
    val open = docs.map { case (id, t) => (id, t) } ++
      (1 to 200).map(i => (mx + i, s"neword${i}a neword${i}b neword${i}c"))
    val beta2 = TextAnalysis.heapsFitFrom(
      open.toSeq.toDF("doc_id", "text"), 64).collect()(0).getAs[Double]("beta")
    assert(beta2 > 0.0,
      "an open-vocabulary extension must push the growth exponent positive")
  }

  test("ngram novelty: first doc fully novel, exact copy zero, partial " +
    "overlap fractional, short docs total at zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), // grams abcde, bcdef — both first here
      (2L, "a b c d e f"), // exact copy: 0 novel
      (3L, "a b"), // too short for a 5-gram
      (4L, "a b c d e x")) // abcde seen, bcdex new -> 0.5
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramNoveltyFrom(docs, 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((2L, 2L, 1.0)))
    assert(got(2L) === ((2L, 0L, 0.0)))
    assert(got(3L) === ((0L, 0L, 0.0)))
    assert(got(4L) === ((2L, 1L, 0.5)))
    // totality + bounds on the real corpus
    val real = TextAnalysis.ngramNovelty(spark, Sf).collect()
    assert(real.length.toLong === Tables.documents(spark, Sf).count())
    real.foreach { r =>
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("session stats: hand-built sessions land in the right size " +
    "buckets with exact durations") {
    import spark.implicits._
    val m = 60000L
    val ev = Seq(
      // user 1: 3 events 10 min apart (one session, 20 min span),
      // then one isolated event 2 h later (size-1 session)
      (1L, 1L, 0L), (1L, 2L, 10 * m), (1L, 3L, 20 * m), (1L, 4L, 140 * m),
      // user 2: a single event
      (2L, 5L, 0L))
      .toDF("user_id", "event_id", "ms")
      .withColumn("ts", expr("timestamp_millis(ms)"))
    val got = Events.sessionStatsFrom(ev, 1800000L).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got.keySet === Set(1L, 3L))
    assert(got(3L) === ((1L, 1200000.0, 1200000L)))
    assert(got(1L) === ((2L, 0.0, 0L)))
  }

  test("pmi bigrams: hand-computed collocation score; min-count floor " +
    "drops the rare pair; ranked by the total order") {
    import spark.implicits._
    def r6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // "a b" x5 adjacent, "b a" x4 — the floor keeps only (a, b)
    val docs = Seq((1L, "a b a b a b a b a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiBigramsFrom(docs, minCount = 5, topN = 50)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // tokens: a x5, b x5 (N=10); bigrams: 9 total, (a,b) x5, (b,a) x4
    val want = r6(math.log((5.0 / 9) / ((5.0 / 10) * (5.0 / 10))))
    assert(got.toSeq === Seq(("a", "b", 5L, want)))
    // on the real corpus: counts honor the floor and the ranking is the
    // (pmi desc, a, b) total order
    val real = TextAnalysis.pmiBigrams(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(real.forall(_._3 >= 5L))
    val resorted = real.sortBy(t => (-t._4, t._1, t._2))
    assert(real.sameElements(resorted))
  }

  test("ccnet buckets: per-lang partition with strictly ordered " +
    "head < middle < tail scores on real data") {
    val got = TextAnalysis.ccnetBuckets(spark, Sf).collect()
      .map(r => (r.getString(1), r.getDouble(3), r.getLong(4), r.getString(5)))
    assert(got.length.toLong === TextAnalysis.unigramLogprob(spark, Sf).count(),
      "every scored doc is labeled exactly once")
    assert(got.forall(t => Set("head", "middle", "tail")(t._4)))
    for ((lang, rows) <- got.groupBy(_._1)) {
      val byLabel = rows.groupBy(_._4)
      def bins(l: String) = byLabel.getOrElse(l, Array.empty).map(_._3)
      def scores(l: String) = byLabel.getOrElse(l, Array.empty).map(_._2)
      for ((lo, hi) <- Seq(("head", "middle"), ("middle", "tail"))
           if bins(lo).nonEmpty && bins(hi).nonEmpty) {
        assert(bins(lo).max < bins(hi).min,
          s"$lang: $lo bins must sit strictly below $hi bins")
        assert(scores(lo).max < scores(hi).min,
          s"$lang: $lo scores must sit strictly below $hi scores")
      }
      // the tertile cut puts SOME mass at/above the 2/3 bin — tail is
      // never empty (the cut bin always exists), and no single bucket
      // swallows a lang whose scores spread over >1 bin
      assert(bins("tail").nonEmpty, s"$lang: tail holds the cut bin")
      if (rows.map(_._3).distinct.length > 2)
        assert(byLabel.size >= 2, s"$lang: spread scores must split buckets")
    }
  }

  test("langid ngram: held-out docs of a real multilingual fixture " +
    "classify correctly; output equals a brute-force Cavnar-Trenkle " +
    "mirror; sub-trigram docs emit und") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog while the rain in spain stays mainly in the plain", "en"),
      (2L, "the cat sat on the mat with the hat and then the dog chased the cat around the garden", "en"),
      (3L, "der schnelle braune fuchs springt ueber den faulen hund waehrend der regen in spanien bleibt", "de"),
      (4L, "die katze sitzt auf der matte mit dem hut und dann jagt der hund die katze durch den garten", "de"),
      (6L, "le rapide renard brun saute par dessus le chien paresseux pendant que la pluie reste dans la plaine", "fr"),
      (7L, "le chat est assis sur le tapis avec le chapeau et puis le chien chasse le chat dans le jardin", "fr"))
    val heldOut = Seq(
      (101L, "she sells sea shells on the shore and the shells she sells are surely from the sea", "en"),
      (102L, "der fischer und die katze warten in dem garten auf den regen der nicht kommt", "de"),
      (103L, "le jardin et la plaine sont sous la pluie et le chat attend dans le chapeau", "fr"),
      (200L, "ab", "en")) // sub-trigram: no profile -> und
    val toDf = (xs: Seq[(Long, String, String)]) => xs
      .map { case (id, t, l) => (id, t, l, "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis
      .langIdNgramFrom(toDf(train), toDf(train ++ heldOut)).collect()
      .map(r => r.getLong(0) -> ((r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    // semantic claim: every held-out doc routes to its language, with a
    // positive abstention margin; the 2-char doc abstains as 'und'
    for ((id, _, l) <- heldOut if id != 200L) {
      assert(got(id)._1 === l, s"doc $id misrouted: ${got(id)}")
      assert(got(id)._3.exists(_ > 0), s"doc $id: margin must be positive")
    }
    assert(got(200L) === (("und", None, None)))
    // exactness claim: full output equals a plain-Scala C-T mirror
    def grams(t: String): Seq[String] = {
      val s = t.toLowerCase
      if (s.length < 3) Seq.empty
      else (0 to s.length - 3).map(i => s.substring(i, i + 3))
    }
    def ranked(gs: Seq[String], k: Int): Map[String, Int] =
      gs.groupBy(identity).map { case (g, xs) => (g, xs.size) }.toSeq
        .sortBy { case (g, c) => (-c, g) }.take(k).zipWithIndex
        .map { case ((g, _), i) => g -> (i + 1) }.toMap
    val langProf = train.groupBy(_._3).map { case (l, xs) =>
      l -> ranked(xs.flatMap(x => grams(x._2)), TextAnalysis.LangProfK)
    }
    val langs = langProf.keys.toSeq.sorted
    val mirror = (train ++ heldOut).map { case (id, t, _) =>
      val dp = ranked(grams(t), TextAnalysis.DocProfK)
      if (dp.isEmpty) id -> (("und", None, None))
      else {
        val ds = langs.map(l => (dp.toSeq.map { case (g, r) =>
          langProf(l).get(g).map(lr => math.abs(r - lr).toLong)
            .getOrElse(TextAnalysis.LangProfK.toLong)
        }.sum, l)).sorted
        id -> ((ds.head._2, Some(ds.head._1),
          Some(ds(1)._1 - ds.head._1): Option[Long]))
      }
    }.toMap
    assert(got === mirror, "engine diverges from the C-T mirror")
  }

  test("langid confusion: cells equal a per-split rollup of the per-doc " +
    "router output; the holdout matrix excludes every training doc; row " +
    "shares sum to 1 per (split, label)") {
    val pred = TextAnalysis.langIdNgram(spark, Sf).collect()
      .map(r => (if (r.getLong(0) % 5 == 0) "holdout" else "train",
        r.getString(1), r.getString(3)))
    val cells = pred.groupBy(identity).map { case (k, xs) =>
      k -> xs.length.toLong }
    val labelTot = pred.groupBy(t => (t._1, t._2))
      .map { case (k, xs) => k -> xs.length.toLong }
    val predTot = pred.groupBy(t => (t._1, t._3))
      .map { case (k, xs) => k -> xs.length.toLong }
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.langIdConfusion(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet === cells.keySet)
    got.foreach { case ((sp, l, p), (n, shl, shp)) =>
      assert(n === cells((sp, l, p)), s"($sp,$l,$p) count")
      assert(shl === r6(n.toDouble / labelTot((sp, l))), s"($sp,$l,$p) label share")
      assert(shp === r6(n.toDouble / predTot((sp, p))), s"($sp,$l,$p) pred share")
    }
    // the gate matrix (holdout) must carry no fit-inflated training doc
    val holdoutN = got.collect { case ((sp, _, _), (n, _, _)) if sp == "holdout" => n }.sum
    assert(holdoutN === pred.count(_._1 == "holdout").toLong,
      "holdout matrix must cover exactly the held-out docs")
    assert(got.keys.exists(_._1 == "holdout") && got.keys.exists(_._1 == "train"),
      "both splits must be present for the overfit-gap read")
    // every (split, label)'s row shares cover its mass
    got.keys.toSeq.groupBy(k => (k._1, k._2)).foreach { case (k, ks) =>
      val s = ks.map(kk => got(kk)._2).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$k shares sum to $s")
    }
    assert(got.values.map(_._1).sum === pred.length.toLong,
      "confusion cells must cover every routed doc")
  }

  // ---- BPE merge trainer mirror ---------------------------------------

  /** Plain-Scala classic BPE: tokenize, type counts, then k rounds of
    * (pair counts incl. overlapping occurrences, argmax by (cnt desc,
    * a asc, b asc), greedy left-to-right non-overlapping merge). */
  private def bpeMirror(texts: Seq[String], k: Int, minCount: Long)
      : (Seq[(Long, String, String, String, Long)], Seq[(Vector[String], Long)]) = {
    val pat = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
    val wc = scala.collection.mutable.HashMap.empty[String, Long]
    texts.foreach { t =>
      val m = pat.matcher(t.toLowerCase)
      while (m.find()) wc(m.group()) = wc.getOrElse(m.group(), 0L) + 1L
    }
    var types: Seq[(Vector[String], Long)] =
      wc.toSeq.map { case (w, n) => w.map(_.toString).toVector -> n }
    def applyMerge(v: Vector[String], a: String, b: String): Vector[String] = {
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) { buf += (a + b); i += 2 }
        else { buf += v(i); i += 1 }
      }
      buf.result()
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var r = 1
    var stop = false
    while (r <= k && !stop) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      types.foreach { case (v, n) =>
        v.indices.dropRight(1).foreach { i =>
          pairs((v(i), v(i + 1))) = pairs.getOrElse((v(i), v(i + 1)), 0L) + n
        }
      }
      val top = pairs.toSeq.filter(_._2 >= minCount)
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      top match {
        case None => stop = true
        case Some(((a, b), c)) =>
          out += ((r.toLong, a, b, a + b, c))
          types = types.map { case (v, n) => applyMerge(v, a, b) -> n }
          r += 1
      }
    }
    (out.toSeq, types)
  }

  test("bpe merges: the canonical low/lower/lowest fixture learns the " +
    "textbook merges and equals the plain-Scala mirror") {
    import spark.implicits._
    val texts = Seq(
      "low low low low low lower lower lowest lowest newest newest",
      "newest newest newest newest widest widest widest")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (mir, _) = bpeMirror(texts, 8, 2L)
    val got = TextAnalysis.bpeMergesFrom(docs, 8, 2L)._1.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got === mir, "engine merges diverge from the classic mirror")
    // textbook behavior: 'est'/'low' family merges dominate
    val merged = got.map(_._4)
    assert(merged.exists(m => m.contains("es") || m.contains("st")),
      s"expected an 'est'-family merge in $merged")
    assert(merged.exists(_.contains("lo")), s"expected a 'low'-family merge in $merged")
  }

  test("bpe merges: sf fixture equals the mirror for all 32 rounds; " +
    "selected pair counts are non-increasing; compression report matches") {
    val texts = Tables.documents(spark, Sf).select("text").collect()
      .map(_.getString(0)).filter(_ != null).toSeq
    val (mir, finTypes) = bpeMirror(texts, TextAnalysis.BpeK, 2L)
    val got = TextAnalysis.bpeMerges(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got === mir, "engine merges diverge from the mirror at sf")
    // the argmax count can never grow round over round: merging the top
    // pair only shrinks other counts, and pairs it creates are bounded
    // by its own count
    got.map(_._5).sliding(2).foreach {
      case Seq(prev, next) => assert(next <= prev,
        s"pair counts must be non-increasing, got $prev -> $next")
      case _ =>
    }
    // compression report vs the mirror's final types
    val rep = TextAnalysis.bpeCompression(spark, Sf).collect()(0)
    val baseSyms = bpeMirror(texts, 1, Long.MaxValue)._2
      .map { case (v, n) => v.length * n }.sum
    val finSyms = finTypes.map { case (v, n) => v.length * n }.sum
    assert(rep.getLong(0) === mir.length.toLong, "n_merges")
    assert(rep.getLong(3) === baseSyms, "base_symbols")
    assert(rep.getLong(4) === finSyms, "merged_symbols")
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rep.getDouble(5) === r6(finSyms.toDouble / baseSyms))
    // fertility under the trained merges: per-source rollup vs the
    // mirror's final segmentation (piece count per word = final symbols)
    val segLen = finTypes.map { case (v, n) => v.mkString -> v.length }.toMap
    val pat = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
    val perSource = scala.collection.mutable.HashMap
      .empty[String, (Long, Long, Long)]
    Tables.documents(spark, Sf).select("source", "text").collect()
      .foreach { r =>
        val src = r.getString(0)
        val m = pat.matcher(r.getString(1).toLowerCase)
        while (m.find()) {
          val t = m.group()
          val (nt, nc, np) = perSource.getOrElse(src, (0L, 0L, 0L))
          perSource(src) = (nt + 1, nc + t.length, np + segLen(t))
        }
      }
    // per-doc piece pricing equals the mirror's segmentation, doc by doc
    val docPieces = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .foreach { r =>
        val m = pat.matcher(r.getString(1).toLowerCase)
        var nt = 0L; var np = 0L
        while (m.find()) { nt += 1; np += segLen(m.group()) }
        docPieces(r.getLong(0)) = (nt, np)
      }
    val gotDoc = TextAnalysis.bpeDocPieces(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(gotDoc.keySet === docPieces.keySet.toSet)
    gotDoc.foreach { case (id, (nt, np, ppt)) =>
      val (mt, mp) = docPieces(id)
      assert((nt, np) === ((mt, mp)), s"doc $id counts")
      assert(ppt === (if (mt > 0) Some(r6(mp.toDouble / mt)) else None),
        s"doc $id ratio")
    }
    val fert = TextAnalysis.bpeFertility(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(fert.keySet === perSource.keySet)
    fert.foreach { case (src, (nt, nc, np, ppt, cpp)) =>
      val (mt, mc, mp) = perSource(src)
      assert((nt, nc, np) === ((mt, mc, mp)), s"$src counts")
      assert(ppt === r6(mp.toDouble / mt), s"$src pieces_per_token")
      assert(cpp === r6(mc.toDouble / mp), s"$src chars_per_piece")
    }
  }

  // ---- trained source NB mirror ----------------------------------------

  /** Plain-Scala mirror of TextAnalysis.sourceNbFrom: integer micro-nat
    * multinomial NB, identical vocab cut / smoothing / quantization /
    * tie-breaks. */
  private def nbMirror(rows: Seq[(Long, String, String)])
      : Map[Long, (String, String, String, Long, Option[Long])] = {
    val pat = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
    def toks(t: String): Seq[String] = {
      val m = pat.matcher(t.toLowerCase)
      val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    def micro(d: Double): Long = BigDecimal(d * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // Spark's log() is StrictMath.log (bit-verified: they differ from
    // Math.log by 1 ULP at e.g. x=3.0) — the mirror must match
    def slog(d: Double): Double = java.lang.StrictMath.log(d)
    val train = rows.filter(_._1 % 5 != 0)
    val trainToks = train.flatMap { case (_, t, s) => toks(t).map(s -> _) }
    val vocab = trainToks.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (tok, n) => (-n, tok) }.take(TextAnalysis.NbVocabK)
      .map(_._1).toSet
    val v = vocab.size.toLong
    val priors = train.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nTrain = train.size.toLong
    val ntc = trainToks.filter(p => vocab(p._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val ncl = ntc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val classes = priors.keys.toSeq.sorted
    rows.map { case (id, t, label) =>
      val cnts = toks(t).filter(vocab).groupBy(identity)
        .view.mapValues(_.size.toLong).toSeq
      val scores = classes.map { c =>
        val prior = micro(slog(priors(c).toDouble) - slog(nTrain.toDouble))
        val ts = cnts.map { case (tok, cnt) =>
          cnt * micro(slog(ntc.getOrElse((c, tok), 0L).toDouble + 1.0) -
            slog((ncl(c) + v).toDouble))
        }.sum
        (prior + ts, c)
      }.sortBy { case (s, c) => (-s, c) }
      val split = if (id % 5 == 0) "holdout" else "train"
      id -> ((label, split, scores.head._2, scores.head._1,
        scores.lift(1).map(x => scores.head._1 - x._1)))
    }.toMap
  }

  test("source nb: a separable two-source fixture routes every holdout " +
    "doc to its source; output equals the integer micro-nat mirror") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "uno dos tres cuatro cinco seis siete ocho"
    val rows = (1L to 20L).map { i =>
      if (i % 2 == 0) (i, s"$a token${i % 3}", "srcA")
      else (i, s"$b token${i % 3}", "srcB")
    }
    val docs = rows.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.sourceNbFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(got === nbMirror(rows), "engine diverges from the NB mirror")
    // semantic claim: with genuinely disjoint vocabularies the trained
    // head routes every HELD-OUT doc to its true source
    rows.filter(_._1 % 5 == 0).foreach { case (id, _, label) =>
      assert(got(id)._3 === label, s"holdout doc $id misrouted: ${got(id)}")
      assert(got(id)._5.exists(_ > 0L), s"doc $id: margin must be positive")
    }
  }

  test("source nb: sf fixture equals the mirror per doc; confusion cells " +
    "equal a per-split rollup with within-split shares") {
    val rows = Tables.documents(spark, Sf)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val mir = nbMirror(rows)
    val got = TextAnalysis.sourceNb(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(got === mir, "engine diverges from the NB mirror at sf")
    // confusion audit equals the rollup of the per-doc frame
    val pred = got.values.toSeq.map(x => (x._2, x._1, x._3))
    val cells = pred.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val labelTot = pred.groupBy(p => (p._1, p._2)).view.mapValues(_.size.toLong).toMap
    val predTot = pred.groupBy(p => (p._1, p._3)).view.mapValues(_.size.toLong).toMap
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val conf = TextAnalysis.sourceNbConfusion(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(conf.keySet === cells.keySet)
    conf.foreach { case ((sp, l, p), (n, shl, shp)) =>
      assert(n === cells((sp, l, p)))
      assert(shl === r6(n.toDouble / labelTot((sp, l))))
      assert(shp === r6(n.toDouble / predTot((sp, p))))
    }
  }

  test("quality nb: labels are exactly the median gate's keep/cut " +
    "verdicts; output equals the integer micro-nat NB mirror") {
    val docs = Tables.documents(spark, Sf)
    // the teacher: qualityFilterFrom's kept set (its own spec pins it
    // against the quantile mirror) — pass = kept, fail = cut
    val kept = TextAnalysis.qualityFilterFrom(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (kept(r.getLong(0))) "pass" else "fail")).toSeq
    // a meaningful teacher: both classes present in the training split
    assert(rows.filter(_._1 % 5 != 0).map(_._3).distinct.length === 2,
      "median-gate teacher must be two-class on the train split")
    val mir = nbMirror(rows)
    val got = TextAnalysis.qualityNb(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(got === mir, "engine diverges from the quality-NB mirror")
  }

  test("vocab coverage: every column equals a brute-force token-count " +
    "mirror; coverage monotone in budget, oov its complement") {
    val texts = Tables.documents(spark, Sf).select("text").collect()
      .map(_.getString(0)).filter(_ != null)
    val pat = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    texts.foreach { t =>
      val m = pat.matcher(t.toLowerCase)
      while (m.find()) {
        val tok = m.group()
        counts(tok) = counts.getOrElse(tok, 0L) + 1L
      }
    }
    val total = counts.values.sum
    val nTypes = counts.size.toLong
    val ranked = counts.toSeq.sortBy { case (tok, n) => (-n, tok) }
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = Seq(1024, 4096, 16384).map { v =>
      val cov = ranked.take(v).map(_._2).sum
      (v.toLong, cov, total, nTypes,
        r6(cov.toDouble / total), r6((total - cov).toDouble / total))
    }.toSet
    val got = TextAnalysis.vocabCoverage(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got === ref, "engine coverage curve diverges from the mirror")
    val byV = got.toSeq.sortBy(_._1)
    assert(byV.map(_._5) === byV.map(_._5).sorted, "coverage monotone in V")
    byV.foreach { row =>
      assert(math.abs(row._5 + row._6 - 1.0) < 1e-5, s"cov+oov != 1: $row")
    }
  }

  test("text model roundtrip: all three artifacts round-trip bit-exactly; " +
    "the loaded-model serve equals the batch operators on holdout") {
    val tmp = java.nio.file.Files.createTempDirectory("tmr").toString
    try {
      val docs = Tables.documents(spark, Sf)
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      // 1. each artifact loads back exactly what was written
      val builtProf = TextAnalysis.langProfileOf(train)
      TextAnalysis.writeLangProfile(builtProf, s"$tmp/langid")
      def profSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(profSet(TextAnalysis.loadLangProfile(spark, s"$tmp/langid"))
        === profSet(builtProf), "langid profile artifact drifted")
      val builtNb = TextAnalysis.sourceNbModelOf(train)
      TextAnalysis.writeNbModel(builtNb, spark, s"$tmp/nb")
      assert(TextAnalysis.loadNbModel(spark, s"$tmp/nb") === builtNb,
        "nb model artifact drifted")
      val builtMerges = TextAnalysis.bpeMerges(spark, Sf)
      TextAnalysis.writeBpeMerges(builtMerges, s"$tmp/bpe")
      val mergesSeq = builtMerges.collect().sortBy(_.getLong(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      assert(TextAnalysis.loadBpeMerges(spark, s"$tmp/bpe") === mergesSeq,
        "bpe merge artifact drifted (or lost rank order)")
      // 2. the registered query (its own write/load under tmpdir)
      //    equals the three BATCH operators on the holdout split —
      //    persistence AND kernel-vs-batch parity in one frame
      val served = TextAnalysis.modelRoundtrip(spark, Sf).collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(served.nonEmpty, "roundtrip serve is empty — fixture issue")
      def optL(r: org.apache.spark.sql.Row, i: Int) =
        if (r.isNullAt(i)) None else Some(r.getLong(i))
      def optD(r: org.apache.spark.sql.Row, i: Int) =
        if (r.isNullAt(i)) None else Some(r.getDouble(i))
      val lang = TextAnalysis.langIdNgram(spark, Sf)
        .filter(col("doc_id") % 5 === 0).collect()
        .map(r => r.getLong(0) -> ((r.getString(3), optL(r, 4), optL(r, 5)))).toMap
      val nb = TextAnalysis.sourceNb(spark, Sf)
        .filter(col("split") === "holdout").collect()
        .map(r => r.getLong(0) -> ((r.getString(3), r.getLong(4), optL(r, 5)))).toMap
      val bpe = TextAnalysis.bpeDocPieces(spark, Sf)
        .filter(col("doc_id") % 5 === 0).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), optD(r, 3)))).toMap
      assert(served.keySet === lang.keySet)
      assert(served.keySet === nb.keySet)
      assert(served.keySet === bpe.keySet)
      served.foreach { case (id, r) =>
        assert((r.getString(1), optL(r, 2), optL(r, 3)) === lang(id),
          s"doc $id: langid serve != batch")
        assert((r.getString(4), r.getLong(5), optL(r, 6)) === nb(id),
          s"doc $id: nb serve != batch")
        assert((r.getLong(7), r.getLong(8), optD(r, 9)) === bpe(id),
          s"doc $id: bpe serve != batch")
      }
      // 3. a non-artifact parquet fails each load loudly, naming the path
      docs.select("doc_id").limit(2).write.mode("overwrite")
        .parquet(s"$tmp/bogus")
      Seq[(String, String) => Any](
        (p, _) => TextAnalysis.loadLangProfile(spark, p),
        (p, _) => TextAnalysis.loadNbModel(spark, p),
        (p, _) => TextAnalysis.loadBpeMerges(spark, p)).foreach { f =>
        val err = intercept[IllegalArgumentException] { f(s"$tmp/bogus", "") }
        assert(err.getMessage.contains("bogus"),
          "load error must name the offending path")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }
}
