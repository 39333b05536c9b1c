package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantics pins for the round-5 gate additions (funnel, grouping sets,
  * unpivot, repetition, packing, redaction) plus the error-bound gate for
  * the one sketch query — fixture-level behavior the sf-level oracle
  * hash-compare can't isolate.
  */
class GateSemanticsSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("registry invariant: queries and oracle twins are the same key set") {
    // the driver's gate only checks queries that have a twin — a
    // registration drifting out of either map silently weakens the gate
    assert(graft.SparkEntry.queries.keySet === graft.SparkEntry.oracleSql.keySet)
  }

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("funnel: strictly-before events don't convert, simultaneous ones do") {
    // A: click BEFORE first view -> stops at stage 1
    // B: click simultaneous with view (>=), purchase after -> full convert
    // C: no view at all -> never enters the funnel
    // D: purchase before its first qualifying click -> stops at stage 2
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 5L), (1L, "purchase", 20L),
      (2L, "view", 10L), (2L, "click", 10L), (2L, "purchase", 15L),
      (3L, "click", 5L), (3L, "purchase", 6L),
      (4L, "view", 10L), (4L, "click", 20L), (4L, "purchase", 15L)
    ).toDF("user_id", "event_type", "ms")
    val out = Events.funnelFrom(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("funnel: null users never enter any stage") {
    val ev = Seq(
      (Some(1L), "view", 10L), (Some(1L), "click", 11L),
      (None, "view", 1L), (None, "click", 2L)
    ).toDF("user_id", "event_type", "ms")
    val out = Events.funnelFrom(ev, Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L))
  }

  test("grouping sets: GROUPING() markers separate grouped-out from data") {
    val rows = Relational.q30GroupingSets(spark, Sf).collect()
    val combos = rows.map(r => (r.getLong(4), r.getLong(5))).toSet
    assert(combos === Set((0L, 0L), (0L, 1L), (1L, 1L)),
      s"unexpected marker combos: $combos")
    // grand total: one row, n == |lineitem|
    val total = Tables.lineitem(spark, Sf).count()
    val grand = rows.filter(r => r.getLong(4) == 1L)
    assert(grand.length === 1 && grand.head.getLong(2) === total)
    // a marker of 1 == that column grouped out (NULL); 0 == real data value
    rows.foreach { r =>
      assert(r.isNullAt(0) === (r.getLong(4) == 1L), s"g_rf marker lies: $r")
      assert(r.isNullAt(1) === (r.getLong(5) == 1L), s"g_ls marker lies: $r")
    }
    // each set partitions the same data: per-set n sums to the total
    Seq((0L, 0L), (0L, 1L), (1L, 1L)).foreach { c =>
      val n = rows.filter(r => (r.getLong(4), r.getLong(5)) == c).map(_.getLong(2)).sum
      assert(n === total, s"set $c sums to $n, not $total")
    }
  }

  test("unpivot: one row per (id, metric), values preserved") {
    val out = Relational.q31Unpivot(spark, Sf)
    val nParts = Tables.part(spark, Sf).count()
    assert(out.count() === 2 * nParts)
    assert(out.select($"metric").distinct().collect().map(_.getString(0)).toSet
      === Set("retailprice", "psize"))
    // melt loses nothing: re-pivoting the size metric matches the source
    val back = out.filter($"metric" === "psize")
      .select($"p_partkey", $"val".as("p_size"))
    val src = Tables.part(spark, Sf)
      .select($"p_partkey", $"p_size".cast("double").as("p_size"))
    assert(back.exceptAll(src).count() === 0L && src.exceptAll(back).count() === 0L)
  }

  test("repetition score: exact fractions on hand-built texts") {
    val docs = Seq(
      (1L, "a a a a"),         // 4 tokens 1 distinct; bigrams: "a a" x3
      (2L, "a b a b a"),       // 5 tok 2 distinct; bg: ab,ba,ab,ba -> 4, 2 distinct, top 2
      (3L, "x y z"),           // all unique; bg xy,yz -> top run 1
      (4L, "solo"),            // 1 token -> no bigrams, zero fracs
      (5L, "")                 // empty -> all zero
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScoreFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((0.75, 0.666667, 1.0))) // 1 - 1/3, rounded to 6dp
    assert(out(2L) === ((0.6, 0.5, 0.5)))
    assert(out(3L) === ((0.0, 0.0, 0.5)))
    assert(out(4L) === ((0.0, 0.0, 0.0)))
    assert(out(5L) === ((0.0, 0.0, 0.0)))
  }

  test("sequence packing: totals preserved, overrun bounded by one doc") {
    val budget = 256L
    val packs = TextAnalysis.packSequences(spark, Sf, budget).collect()
    val docs = Tables.documents(spark, Sf)
      .select(size(graft.functions.EngineNeutral.wsTokens(lower($"text")))
        .cast("long").as("n_tok"))
    val totalTok = docs.agg(sum($"n_tok")).collect()(0).getLong(0)
    val maxDoc = docs.agg(max($"n_tok")).collect()(0).getLong(0)
    assert(packs.map(_.getLong(3)).sum === totalTok, "tokens lost in packing")
    assert(packs.map(_.getLong(2)).sum === Tables.documents(spark, Sf).count())
    // first-token binning: a pack holds docs whose first token lands in its
    // budget window, so it can run over by at most one doc's tail
    val worst = packs.map(_.getLong(3)).max
    assert(worst <= budget + maxDoc - 1,
      s"pack_tokens $worst exceeds budget+maxdoc-1 = ${budget + maxDoc - 1}")
  }

  test("redaction: sequential counts don't double-count consumed matches") {
    val docs = Seq(
      (1L, "reach bob123456@mail.example.com or 77778888"),
      (2L, "the key is 1234 keys"),
      (3L, "clean text")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactFrom(docs, Seq(
        ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
        ("digits", "[0-9]{4,}", "[NUM]"),
        ("term", "\\bkey\\b", "[TERM]")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // doc 1: the digits inside the email are consumed by [EMAIL] first —
    // only the standalone run counts (the round-6 audit-trail fix)
    assert(out(1L) === ((1L, 1L, 0L, md5hex("reach [EMAIL] or [NUM]"))))
    // doc 2: \bkey\b matches "key" but not "keys"
    assert(out(2L) === ((0L, 1L, 1L, md5hex("the [TERM] is [NUM] keys"))))
    assert(out(3L) === ((0L, 0L, 0L, md5hex("clean text"))))
  }

  test("decontamination: shared shingles counted once, clean docs absent") {
    val corpus = Seq(
      (1L, "a b c d e"),     // shares "b c d" and "c d e" with eval
      (2L, "q r s t"),       // clean
      (3L, "b c d b c d")    // "b c d" twice in-doc -> still counts once
    ).toDF("doc_id", "text")
    val evalSet = Seq((10L, "z b c d w c d e")).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminateFrom(corpus, evalSet, w = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }

  test("decontamination plan broadcasts the eval shingle set") {
    val df = TextAnalysis.decontaminate(spark, Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"eval side not broadcast:\n$p")
  }

  test("cohort retention: exact counts on a hand-built activity matrix") {
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L), // A: cohort 0, back at +1 and +3
      (2L, 0L),                     // B: cohort 0, never returns
      (3L, 1L), (3L, 2L)            // C: cohort 1, back at +1
    ).toDF("user_id", "p")
    val out = Events.cohortRetentionFrom(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("cohort retention invariants on the harness events") {
    val rows = Events.cohortRetention(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "activity before a user's own cohort")
    // no later offset can retain more users than the cohort had at entry
    val size0 = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    rows.foreach { case (c, _, n) => assert(n <= size0(c), s"cohort $c") }
    // cohort entry sizes partition the distinct-user population
    val nUsers = Tables.events(spark, Sf)
      .filter($"user_id".isNotNull).select("user_id").distinct().count()
    assert(size0.values.sum === nUsers)
  }

  test("approx distinct: HLL estimate within 3x the configured rsd") {
    // the raw estimate (the registered query only exposes the verdict)
    val approx = Tables.orders(spark, Sf)
      .groupBy($"o_orderstatus")
      .agg(approx_count_distinct($"o_custkey", 0.01).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, Sf)
      .groupBy($"o_orderstatus").agg(count_distinct($"o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err <= 0.03, s"status $k: estimate ${approx(k)} vs exact $n (err $err)")
    }
    // and the registered verdict form agrees: exact counts + all-true
    val verdict = Relational.q23ApproxDistinct(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(verdict.view.mapValues(_._1).toMap === exact)
    assert(verdict.values.forall(_._2), s"within_bound violated: $verdict")
  }

  test("ngram counts: exact counts, deterministic top-k tie-break, n=3") {
    val docs = Seq("a b a b", "b a", "x", "", "  ").toDF("text")
    // bigrams: "a b a b" -> (a b)(b a)(a b); "b a" -> (b a); others none
    val bi = TextAnalysis.ngramCountsFrom(docs, n = 2, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bi === Map("a b" -> 2L, "b a" -> 2L))
    // k=1 boundary tie between the two count-2 grams breaks gram-ASC
    val top1 = TextAnalysis.ngramCountsFrom(docs, n = 2, k = 1).collect()
    assert(top1.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("a b", 2L)))
    // trigrams: only the 4-token doc yields any
    val tri = TextAnalysis.ngramCountsFrom(docs, n = 3, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tri === Map("a b a" -> 1L, "b a b" -> 1L))
  }

  test("token-budget mix: quota crossed by at most one doc, monotone in budget") {
    val docs = Tables.documents(spark, Sf)
    val base = TextAnalysis.tokenBudgetMixFrom(docs,
      budgets = Map("src0" -> 300L, "src1" -> 0L), defaultBudget = 100L)
    val rows = base.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(!rows.exists(_._2 == "src1"), "zero budget must drop the source")
    // per source: tokens BEFORE the last kept doc are under budget, and
    // dropping the largest-cum doc brings the total under budget
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val budget = if (src == "src0") 300L else 100L
      val maxCum = rs.map(_._4).max
      val lastTok = rs.filter(_._4 == maxCum).head._3
      assert(maxCum - lastTok < budget, s"$src kept a doc past the quota")
    }
    // monotone: doubling every budget only ever ADDS documents
    val bigger = TextAnalysis.tokenBudgetMixFrom(docs,
      budgets = Map("src0" -> 600L, "src1" -> 0L), defaultBudget = 200L)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet.subsetOf(bigger))
  }

  test("curation manifest: stage seams conserve docs and tokens") {
    val docs = Tables.documents(spark, Sf)
    // independent recomputation of the stage chain's survivor set
    val kept = TextAnalysis.qualityFilterFrom(docs).select($"doc_id")
    val highQ = docs.join(kept, Seq("doc_id"), "left_semi")
      .withColumn("fp", md5(regexp_replace(lower($"text"), "[^a-z0-9]", "")))
    val survTokens = highQ
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"fp").orderBy($"doc_id")))
      .filter($"rn" === 1)
      .select(size(graft.functions.EngineNeutral.wsTokens(lower($"text"))).cast("long").as("n"))
      .agg(sum($"n"), count(lit(1))).collect()(0)
    val manifest = TextAnalysis.curationManifest(spark, Sf)
      .agg(sum($"pack_tokens"), sum($"n_docs")).collect()(0)
    assert(manifest.getLong(0) === survTokens.getLong(0), "token totals diverge at a seam")
    assert(manifest.getLong(1) === survTokens.getLong(1), "doc counts diverge at a seam")
    // and the gate actually gates: fewer docs than the raw corpus
    assert(manifest.getLong(1) < docs.count())
  }

  test("quality filter: per-source exact median, odd and even group sizes") {
    // pure-alpha texts of w identical tokens: punct=0, stopwords=0, so
    // quality = round(min(w/64,1)*0.4 + 0.3, 6) — strictly increasing in w
    def doc(id: Long, src: String, w: Int) = (id, src, Seq.fill(w)("aa").mkString(" "))
    def q(w: Int): Double =
      java.math.BigDecimal.valueOf(math.min(w / 64.0, 1.0) * 0.4 + 0.3)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val docs = Seq(
      doc(1, "odd", 1), doc(2, "odd", 2), doc(3, "odd", 3),
      doc(4, "odd", 4), doc(5, "odd", 5),
      doc(10, "even", 10), doc(11, "even", 20), doc(12, "even", 30), doc(13, "even", 40)
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.qualityFilterFrom(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    // odd source: median is the middle value q(3); docs 3,4,5 clear it
    val odd = out.filter(_._2 == "odd")
    assert(odd.map(_._1).toSet === Set(3L, 4L, 5L))
    assert(odd.forall(_._4 === q(3)))
    // even source: median is the midpoint of q(20),q(30); docs 12,13 clear it
    val even = out.filter(_._2 == "even")
    assert(even.map(_._1).toSet === Set(12L, 13L))
    val mid = java.math.BigDecimal.valueOf((q(20) + q(30)) / 2.0)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(even.forall(_._4 === mid))
  }

  test("quality filter: keeps at least half of every source, cleanly split") {
    val kept = TextAnalysis.qualityFilterFrom(Tables.documents(spark, Sf))
    val all = TextAnalysis.qualityScore(spark, Sf).select($"doc_id", $"quality")
      .join(Tables.documents(spark, Sf).select($"doc_id", $"source"), Seq("doc_id"))
    val keptBySrc = kept.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val allBySrc = all.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptBySrc.keySet === allBySrc.keySet)
    allBySrc.foreach { case (src, n) =>
      assert(keptBySrc(src) * 2 >= n, s"source $src kept ${keptBySrc(src)} of $n")
    }
    // every dropped doc scores strictly below every kept doc of its source
    val minKept = kept.groupBy($"source").agg(min($"quality").as("mn")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dropped = all.join(kept.select($"doc_id"), Seq("doc_id"), "left_anti")
    dropped.groupBy($"source").agg(max($"quality").as("mx")).collect()
      .foreach(r => assert(r.getDouble(1) < minKept(r.getString(0)), r.getString(0)))
  }

  test("latest-per-key: one row per key, survivor is max (date, orderkey)") {
    val out = Relational.q40LatestPerKey(spark, Sf)
    val orders = Tables.orders(spark, Sf)
    // exactly one survivor per customer present in orders
    assert(out.count() === orders.select($"o_custkey").distinct().count())
    assert(out.select($"o_custkey").distinct().count() === out.count())
    // the survivor is the max (o_orderdate, o_orderkey) struct of its key —
    // the deterministic-tiebreak contract, independent of the window impl
    val expect = orders.groupBy($"o_custkey")
      .agg(max(struct($"o_orderdate", $"o_orderkey")).as("mx"))
      .select($"o_custkey", $"mx.o_orderkey".as("latest_orderkey"))
    val got = out.select($"o_custkey", $"latest_orderkey")
    assert(got.exceptAll(expect).count() === 0L)
    assert(expect.exceptAll(got).count() === 0L)
  }

  test("latest-per-key: orderdate ties break on the higher orderkey") {
    val orders = Tables.orders(spark, Sf)
    // synthesize guaranteed ties: coarsen every date to its month, so most
    // customers have several same-date orders; survivor must be the max
    // orderkey among the max-month rows
    val coarse = orders.withColumn("o_orderdate", date_trunc("month", $"o_orderdate"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    val got = coarse.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey")
    val expect = coarse.groupBy($"o_custkey")
      .agg(max(struct($"o_orderdate", $"o_orderkey")).as("mx"))
      .select($"o_custkey", $"mx.o_orderkey".as("o_orderkey"))
    assert(got.exceptAll(expect).count() === 0L)
  }

  test("scd2 intervals: per-key timeline chains with one open interval") {
    val out = Relational.q42Scd2Intervals(spark, Sf)
    val orders = Tables.orders(spark, Sf)
    assert(out.count() === orders.count(), "SCD2 must keep every log row")
    // exactly one current (open) interval per key
    val openPerKey = out.filter($"is_current").groupBy($"o_custkey").count()
    assert(openPerKey.filter($"count" =!= 1).count() === 0L)
    // intervals chain: every closed interval's valid_to is the valid_from
    // of ANOTHER interval of the same key, and never precedes valid_from
    assert(out.filter($"valid_to" < $"valid_from").count() === 0L)
    val froms = out.select($"o_custkey", $"valid_from".as("valid_to")).distinct()
    val dangling = out.filter($"valid_to".isNotNull)
      .select($"o_custkey", $"valid_to")
      .join(froms, Seq("o_custkey", "valid_to"), "left_anti")
    assert(dangling.count() === 0L, "a closed interval points at no successor")
  }

  test("conditional agg: each count_if equals its filtered-subquery count") {
    val orders = Tables.orders(spark, Sf)
    val out = Relational.q41ConditionalAgg(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val prios = orders.select($"o_orderpriority").distinct()
      .collect().map(_.getString(0))
    assert(out.keySet === prios.toSet)
    prios.foreach { p =>
      val g = orders.filter($"o_orderpriority" === p)
      val r = out(p)
      assert(r.getLong(1) === g.count(), s"$p: n")
      assert(r.getLong(2) === g.filter($"o_totalprice" > 200000.0).count(), s"$p: n_big")
      assert(r.getLong(3) === g.filter($"o_orderstatus" === "F").count(), s"$p: n_finished")
      assert(r.getBoolean(4) === (g.filter($"o_totalprice" > 400000.0).count() > 0), s"$p: any_jumbo")
      assert(r.getBoolean(5) === (g.filter(!($"o_totalprice" > 1000.0)).count() === 0L), s"$p: all_above_floor")
    }
  }

  test("stats agg: var = sd^2, corr in [-1,1], skewness sign matches moments") {
    val rows = Relational.q39StatsAgg(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sd, v, c) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // both sides rounded to 4dp independently, so compare loosely
      assert(math.abs(sd * sd - v) <= 2e-3, s"var != sd^2: $r")
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $r")
    }
    // population-g1 contract: Spark's skewness must match the explicit
    // central-moment form m3/m2^1.5 computed from first principles
    val fl = rows.head.getString(0)
    val prices = Tables.lineitem(spark, Sf)
      .filter($"l_returnflag" === fl).select($"l_extendedprice")
      .collect().map(_.getDouble(0))
    val n = prices.length.toDouble
    val mu = prices.sum / n
    val m2 = prices.map(x => (x - mu) * (x - mu)).sum / n
    val m3 = prices.map(x => math.pow(x - mu, 3)).sum / n
    val g1 = m3 / math.pow(m2, 1.5)
    val got = rows.find(_.getString(0) == fl).get.getDouble(5)
    assert(math.abs(got - g1) <= 1e-3, s"skewness not population g1: got $got want $g1")
  }

  test("bench coverage invariant: every registered query is benched or " +
    "carries an explicit exclusion reason") {
    // the structural fix for the post-rehearsal registration gap: the
    // scale sweeps read Bench.headline, and this pin derives headline's
    // complement from the REGISTRY — a new registration that neither
    // joins the bench nor records a notBenched reason fails here, in
    // the same commit, before any rehearsal can miss it
    val benched = graft.Bench.headline.toSet
    val excused = graft.Bench.notBenched.keySet
    val all = graft.SparkEntry.queries.keySet
    assert((benched intersect excused).isEmpty,
      s"both benched and excused: ${benched intersect excused}")
    assert((benched -- all).isEmpty, s"benched but unregistered: ${benched -- all}")
    assert((excused -- all).isEmpty, s"excused but unregistered: ${excused -- all}")
    val uncovered = all -- benched -- excused
    assert(uncovered.isEmpty,
      s"add to Bench.headline or Bench.notBenched (with a reason): $uncovered")
    assert(graft.Bench.notBenched.values.forall(_.trim.length >= 20),
      "every exclusion must carry a real reason, not a placeholder")
  }

  test("negative-zero net: no registered query emits -0.0 in any float " +
    "column at sf0.001") {
    // graph_modularity's r13 red row was Spark +0.0 vs DuckDB -0.0 on a
    // zero-intra-edge community — invisible to Python value compares
    // (-0.0 == 0.0) but fatal to the driver's repr-hash gate. Contract:
    // every registered output normalizes the sign of zero (append
    // `+ lit(0.0)` after a round() that can land on -0.0). One probe
    // aggregate per query; string rendering is the same image the
    // driver hashes. round()/KL/PMI/CUSUM/assortativity are all in the
    // hazard class, so the net sweeps the WHOLE registry, not a list.
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val dir = "/root/testdata/sf0.001"
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val df = fn(spark, dir)
        val fcols = df.schema.fields
          .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
          .map(_.name)
        if (fcols.isEmpty) None
        else {
          val probes = fcols.map(c =>
            sum(when(col(c).cast("string") === "-0.0", 1L).otherwise(0L))
              .as(c))
          val row = df.agg(probes.head, probes.tail: _*).collect().head
          val bad = fcols.indices
            .filter(i => !row.isNullAt(i) && row.getLong(i) > 0)
            .map(fcols)
          if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(",")}")
        }
      }
    assert(offenders.isEmpty,
      s"-0.0 present (add `+ lit(0.0)`): ${offenders.mkString("; ")}")
  }
}
