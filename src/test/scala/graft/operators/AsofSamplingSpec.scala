package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the generic as-of join core and the deterministic
  * stratified sampler — the two round-4 operator generalizations.
  * (Their registered forms are additionally DuckDB-oracle-gated.)
  */
class AsofSamplingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val left = Seq(
    (1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
    .toDF("k", "ms", "tag")
  private lazy val right = Seq(
    (1L, 90L, 1.0, "x"), (1L, 150L, 2.0, "y"), (2L, 60L, 3.0, "z"))
    .toDF("k", "ms", "v", "lbl")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("asofJoinOn backward: most recent right at-or-before, no-match dropped") {
    val out = Events.asofJoinOn(left, right, "k", "ms", Seq("v", "lbl"))
      .select("k", "ms", "tag", "asof_ms", "v", "lbl")
    assert(rows(out) === Set(
      Seq(1L, 100L, "a", 90L, 1.0, "x"),
      Seq(1L, 200L, "b", 150L, 2.0, "y"))) // k=2: right is AFTER the left row
  }

  test("asofJoinOn forward: earliest right at-or-after") {
    val out = Events.asofJoinOn(left, right, "k", "ms", Seq("v", "lbl"),
        direction = "forward")
      .select("k", "ms", "tag", "asof_ms", "v", "lbl")
    assert(rows(out) === Set(
      Seq(1L, 100L, "a", 150L, 2.0, "y"),
      Seq(2L, 50L, "c", 60L, 3.0, "z"))) // (1,200): nothing after it
  }

  test("asofJoinOn tolerance drops out-of-window matches, both directions") {
    val b = Events.asofJoinOn(left, right, "k", "ms", Seq("v"),
      toleranceMs = Some(10L)).select("k", "ms", "asof_ms")
    assert(rows(b) === Set(Seq(1L, 100L, 90L))) // 200-150=50 > 10 dropped
    val f = Events.asofJoinOn(left, right, "k", "ms", Seq("v"),
      direction = "forward", toleranceMs = Some(10L)).select("k", "ms", "asof_ms")
    assert(rows(f) === Set(Seq(2L, 50L, 60L))) // 150-100=50 > 10 dropped
  }

  test("asofJoinOn equal-time ties: match includes equality, payload = struct max") {
    val r2 = Seq((1L, 100L, 4.0, "q"), (1L, 100L, 5.0, "p"), (1L, 100L, 5.0, "o"))
      .toDF("k", "ms", "v", "lbl")
    val out = Events.asofJoinOn(left.filter($"ms" === 100), r2, "k", "ms",
      Seq("v", "lbl")).select("asof_ms", "v", "lbl")
    // at equal time the right row matches; (5.0,"q"?) no — struct order
    // compares v first, then lbl: max = (5.0, "p")
    assert(rows(out) === Set(Seq(100L, 5.0, "p")))
  }

  test("asofJoinOn fails fast on output-name collisions and reserved names") {
    // payload name equals a left-carried column → ambiguous output
    val rTag = right.withColumnRenamed("lbl", "tag")
    val e1 = intercept[IllegalArgumentException] {
      Events.asofJoinOn(left, rTag, "k", "ms", Seq("v", "tag"))
    }
    assert(e1.getMessage.contains("collide") && e1.getMessage.contains("tag"))
    // payload named like the synthesized asof_<timeCol> column
    val rAsof = right.withColumnRenamed("lbl", "asof_ms")
    val e2 = intercept[IllegalArgumentException] {
      Events.asofJoinOn(left, rAsof, "k", "ms", Seq("asof_ms"))
    }
    assert(e2.getMessage.contains("asof_ms"))
    // inputs using internal __-prefixed working names
    val lRes = left.withColumnRenamed("tag", "__side")
    val e3 = intercept[IllegalArgumentException] {
      Events.asofJoinOn(lRes, right, "k", "ms", Seq("v"))
    }
    assert(e3.getMessage.contains("reserved") && e3.getMessage.contains("__side"))
  }

  test("asofJoinOn matches the registered events twin") {
    // the default asofJoin must be exactly the generic core at
    // (backward, no tolerance) — pinned by the oracle gate, re-checked
    // here against a second, windowless construction on a tiny slice
    val ev = graft.sources.Tables.events(spark, Sf)
      .select($"event_id", $"user_id", $"event_type", $"value",
        unix_millis($"ts").as("ms"))
      .filter($"user_id" < 5)
    val clicks = ev.filter($"event_type" === "click").select($"user_id", $"ms", $"event_id")
    val views = ev.filter($"event_type" === "view").select($"user_id", $"ms", $"value".as("vv"))
    val core = Events.asofJoinOn(clicks, views, "user_id", "ms", Seq("vv"))
      .select($"user_id", $"event_id", $"ms", $"asof_ms", round($"vv", 2).as("vv"))
    // brute force: max-value view per (user, ms), then per click the max
    // view-ms at-or-before, then its value
    val vred = views.groupBy($"user_id".as("vu"), $"ms".as("vms")).agg(max($"vv").as("vv"))
    val brute = clicks.join(vred, $"user_id" === $"vu" && $"vms" <= $"ms")
      .groupBy($"user_id", $"event_id", $"ms")
      .agg(max(struct($"vms", $"vv")).as("m"))
      .select($"user_id", $"event_id", $"ms", $"m.vms".as("asof_ms"),
        round($"m.vv", 2).as("vv"))
    assert(core.exceptAll(brute).isEmpty && brute.exceptAll(core).isEmpty)
  }

  private lazy val docs = graft.sources.Tables.documents(spark, Sf)

  test("stratifiedSample rate edges: 1.0 keeps all, 0.0 keeps none") {
    val all = TextAnalysis.stratifiedSampleFrom(docs, Map.empty, defaultRate = 1.0)
    assert(all.count() === docs.count())
    val none = TextAnalysis.stratifiedSampleFrom(docs, Map.empty, defaultRate = 0.0)
    assert(none.count() === 0L)
  }

  test("stratifiedSample is deterministic across partitionings") {
    val rates = Map("src0" -> 0.8, "src1" -> 0.3)
    val a = TextAnalysis.stratifiedSampleFrom(docs, rates, 0.2).select("doc_id")
    val b = TextAnalysis.stratifiedSampleFrom(docs.repartition(13), rates, 0.2)
      .select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("stratifiedSample nests: a lower rate is a subset of a higher one") {
    val lo = TextAnalysis.stratifiedSampleFrom(docs, Map.empty, 0.3).select("doc_id")
    val hi = TextAnalysis.stratifiedSampleFrom(docs, Map.empty, 0.7).select("doc_id")
    assert(lo.exceptAll(hi).isEmpty, "0.3 sample must nest inside 0.7 sample")
    assert(lo.count() < hi.count())
  }

  test("stratifiedSample is independent of the hashSplit assignment") {
    // the salted hash must not correlate with the split buckets: every
    // split stratum should retain SOME docs at a mid rate (a correlated
    // hash would empty one side)
    val kept = TextAnalysis.stratifiedSampleFrom(docs, Map.empty, 0.5)
      .withColumn("b", graft.functions.EngineNeutral.hash60($"doc_id".cast("string")) % 10L)
      .select(countDistinct(when($"b" < 8L, 0L).when($"b" < 9L, 1L).otherwise(2L)))
      .collect()(0).getLong(0)
    assert(kept === 3L, "sampling emptied a hashSplit stratum")
  }
}
