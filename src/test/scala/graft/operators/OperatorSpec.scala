package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Operator invariants over the harness tables at sf0.001. */
class OperatorSpec extends SparkSpec {

  test("q4 top-k equals the prefix of the full deterministic sort") {
    val topk = Relational.q4TopK(spark, Sf).collect().toSeq
    val full = Tables.orders(spark, Sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .collect().take(10).toSeq
    assert(topk === full)
  }

  test("anti join + semi join partition the left side") {
    val nCust = Tables.customer(spark, Sf).count()
    val withOrders = Tables.customer(spark, Sf)
      .join(Tables.orders(spark, Sf),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val noOrders = Relational.q8AntiJoin(spark, Sf).collect()(0).getLong(0)
    assert(withOrders + noOrders === nCust)
  }

  test("full outer join keeps both unmatched directions, zero-filled") {
    val rows = Relational.q32FullOuter(spark, Sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val supN = Tables.supplier(spark, Sf).filter(col("s_nationkey") < 15)
      .select("s_nationkey").distinct().collect().map(_.getInt(0)).toSet
    val custN = Tables.customer(spark, Sf).filter(col("c_nationkey") >= 10)
      .select("c_nationkey").distinct().collect().map(_.getInt(0)).toSet
    assert(rows.keySet === (supN ++ custN), "full outer must cover both key sets")
    (supN -- custN).foreach(n => assert(rows(n)._2 === 0L, s"nation $n right side"))
    (custN -- supN).foreach(n => assert(rows(n)._1 === 0L, s"nation $n left side"))
    (supN & custN).foreach(n =>
      assert(rows(n)._1 > 0L && rows(n)._2 > 0L, s"nation $n overlap"))
    assert((supN -- custN).nonEmpty && (custN -- supN).nonEmpty,
      "fixture filters must produce both unmatched directions")
  }

  test("distinct is idempotent and minimal") {
    val d1 = Relational.q3Distinct(spark, Sf)
    assert(d1.count() === d1.distinct().count())
  }

  test("left join preserves every left key") {
    val agg = Relational.q5LeftJoinAgg(spark, Sf)
    assert(agg.count() === Tables.customer(spark, Sf).count())
    // customers with no orders: order_count 0, total_spent 0.0
    assert(agg.filter("order_count = 0 AND total_spent <> 0.0").count() === 0L)
  }

  test("window top-per-key emits at most 3 rows per customer") {
    val w = Relational.q9WindowTopPerKey(spark, Sf)
    assert(w.groupBy("o_custkey").count().filter("count > 3").count() === 0L)
  }

  test("count(col) = count(*) - nulls") {
    val fact = Tables.orders(spark, Sf)
      .join(Tables.customer(spark, Sf), col("o_custkey") === col("c_custkey"), "left")
    val total = fact.count()
    val nonNull = fact.agg(count(col("c_name"))).collect()(0).getLong(0)
    val nulls = fact.filter(col("c_name").isNull).count()
    assert(nonNull + nulls === total)
  }

  test("events sessionization: session count bounded by event count") {
    val s = Events.sessionize(spark, Sf)
    assert(s.filter(col("n_sessions") > col("n_events")).count() === 0L)
    assert(s.filter(col("n_sessions") < 1).count() === 0L)
  }

  test("hourly agg preserves total event count") {
    val total = Events.hourlyAgg(spark, Sf).agg(sum("n")).collect()(0).getLong(0)
    assert(total === Tables.events(spark, Sf).count())
  }

  test("tf-idf: exactly k rows per doc, ranks contiguous, scores ordered") {
    val top = TextAnalysis.tfidfTopTerms(spark, Sf, k = 3)
    val perDoc = top.groupBy("doc_id").count()
    assert(perDoc.filter("count > 3").count() === 0L)
    // rank 1 score >= rank 3 score within every doc
    val byRank = top.groupBy("doc_id")
      .agg(max(when(col("rnk") === 1, col("tfidf"))).as("r1"),
        max(when(col("rnk") === 3, col("tfidf"))).as("r3"))
    assert(byRank.filter(col("r1") < col("r3")).count() === 0L)
  }

  test("hash split is deterministic and partitions the corpus") {
    val a = TextAnalysis.hashSplit(spark, Sf).collect().map(_.toSeq).toSet
    val b = TextAnalysis.hashSplit(spark, Sf).collect().map(_.toSeq).toSet
    assert(a === b) // pure function of doc_id: identical across runs
    val total = TextAnalysis.hashSplit(spark, Sf)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total === Tables.documents(spark, Sf).count())
  }

  test("bloom-pruned join result is EXACTLY the unfiltered join") {
    import org.apache.spark.sql.functions.{broadcast => bcast}
    val bloomed = Relational.q33BloomPrunedJoin(spark, Sf)
    val part = Tables.part(spark, Sf).filter(col("p_brand") === "Brand#4")
      .select(col("p_partkey"), col("p_type"))
    val plain = Tables.lineitem(spark, Sf)
      .join(bcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty,
      "bloom false positives leaked into (or pruning dropped rows from) the join")
  }

  test("weighted sample: exact-k per source, ranked, weight-monotone") {
    val ws = TextAnalysis.weightedSample(spark, Sf)
    // exactly min(k, |source|) rows per source, ranks contiguous from 1
    val perSrc = ws.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
    assert(perSrc.filter(col("n") > 10 || col("mx") =!= col("n") || col("mn") =!= 1L)
      .count() === 0L)
    // priorities are non-increasing in rank within a source
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("rk")
    val inversions = ws
      .withColumn("prev", lag("priority", 1).over(w))
      .filter(col("prev").isNotNull && col("priority") > col("prev"))
    assert(inversions.count() === 0L, "priority not sorted within source")
    // weight-monotonicity: blowing up one excluded doc's weight pulls it in
    val docs = Tables.documents(spark, Sf).select("doc_id", "source", "n_chars")
    val sampled = ws.select("doc_id").collect().map(_.getLong(0)).toSet
    val outsider = docs.filter(!col("doc_id").isin(sampled.toSeq: _*))
      .orderBy("doc_id").limit(1).collect()(0).getLong(0)
    val boosted = docs.withColumn("n_chars",
      when(col("doc_id") === outsider, lit(1000000000L)).otherwise(col("n_chars")))
    val resampled = TextAnalysis.weightedSampleFrom(boosted, k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(resampled.contains(outsider),
      s"doc $outsider with dominating weight was not selected")
  }

  test("merge upsert+delete equals the recompute with deletes excluded; " +
    "actions partition the keys") {
    val merged = Relational.q45MergeUpsert(spark, Sf)
    val cutoff = to_date(lit("1998-07-01"))
    // tombstoned change keys: post-cutoff activity AND hash60(key)%8==0 —
    // the synthesized CDC delete markers
    val changeKeys = Tables.orders(spark, Sf)
      .filter(col("o_orderdate") >= cutoff)
      .select(col("o_custkey")).distinct()
    val tombKeys = changeKeys
      .filter(graft.functions.EngineNeutral.hash60(col("o_custkey").cast("string")) % 8 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(tombKeys.nonEmpty, "fixture must exercise the delete arm")
    // survivors (non-delete arms) == rollup over ALL orders EXCLUDING the
    // tombstoned keys — the full CDC apply must be indistinguishable from
    // the batch recompute with deletes excluded
    val full = Tables.orders(spark, Sf).groupBy(col("o_custkey"))
      .agg(
        round(sum(col("o_totalprice").cast("decimal(27,10)")).cast("double"), 2)
          .as("spent"),
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"))
      .select(col("o_custkey").as("custkey"), col("spent"),
        col("last_order"), col("n_orders"))
      .filter(!col("custkey").isin(tombKeys.toSeq: _*))
    val m = merged.filter(col("merge_action") =!= "delete")
      .select("custkey", "spent", "last_order", "n_orders")
    assert(m.exceptAll(full).isEmpty && full.exceptAll(m).isEmpty,
      "incremental merge diverged from the batch recompute minus deletes")
    // spent compares exactly: prices are 2-decimal values, so the
    // DECIMAL(27,10) partial sums are exact multiples of 0.01 and
    // round(a,2)+round(b,2) == round(a+b,2) identically
    val actions = merged.groupBy("merge_action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actions.keySet.subsetOf(Set("insert", "update", "keep", "delete")))
    assert(actions.values.sum === merged.count())
    // an inserted key has no pre-cutoff orders; a kept key none after
    val preKeys = Tables.orders(spark, Sf)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    merged.filter(col("merge_action") === "insert")
      .select("custkey").collect().map(_.getLong(0))
      .foreach { k =>
        assert(!preKeys.contains(k), s"insert key $k exists in base")
        assert(!tombKeys.contains(k), s"unmatched tombstone $k must be a no-op, not an insert")
      }
    merged.filter(col("merge_action") === "keep")
      .select("custkey").collect().map(_.getLong(0))
      .foreach(k => assert(preKeys.contains(k), s"keep key $k missing from base"))
    // delete rows: exactly the matched tombstones, carrying the BASE state
    val expectedDeleteKeys = tombKeys & preKeys
    assert(expectedDeleteKeys.nonEmpty,
      "fixture never fires the MATCHED delete arm — cutoff leaves base empty?")
    val deleteRows = merged.filter(col("merge_action") === "delete")
      .select("custkey", "spent", "last_order", "n_orders")
    assert(deleteRows.collect().map(_.getLong(0)).toSet === expectedDeleteKeys,
      "delete arm must cover exactly the matched tombstoned keys")
    val baseRollup = Tables.orders(spark, Sf)
      .filter(col("o_orderdate") < cutoff)
      .groupBy(col("o_custkey"))
      .agg(
        round(sum(col("o_totalprice").cast("decimal(27,10)")).cast("double"), 2)
          .as("spent"),
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"))
      .select(col("o_custkey").as("custkey"), col("spent"),
        col("last_order"), col("n_orders"))
      .filter(col("custkey").isin(expectedDeleteKeys.toSeq: _*))
    assert(deleteRows.exceptAll(baseRollup).isEmpty &&
      baseRollup.exceptAll(deleteRows).isEmpty,
      "deleted rows must report the base state being removed")
  }

  test("agg delta-apply equals a BigDecimal-exact recompute over the effective rows") {
    import java.math.{BigDecimal => BD, RoundingMode}
    val out = Relational.q50AggDeltaApply(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    // independent reference: effective rows = (base − deletes) ∪ inserts,
    // moments and HALF_UP rationals computed exactly on the driver
    val eff = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .filter { r =>
        val k = r.getLong(1)
        k % 10 == 0 || (k % 10 != 0 && k % 17 != 0)
      }
      .map(r => r.getLong(0) -> BD.valueOf(r.getDouble(2)).setScale(2, RoundingMode.HALF_UP))
      .groupBy(_._1)
    assert(out.keySet === eff.keySet, "key set diverged (retirement or insert lost)")
    eff.foreach { case (k, rows) =>
      val n = rows.length
      val s = rows.map(_._2).reduce(_ add _)
      val s2 = rows.map(r => r._2.multiply(r._2)).reduce(_ add _)
      val nB = BD.valueOf(n.toLong)
      val mean = s.divide(nB, 4, RoundingMode.HALF_UP)
      val varr = s2.multiply(nB).subtract(s.multiply(s))
        .divide(nB.multiply(nB), 4, RoundingMode.HALF_UP)
      val (on, ts, ms, vs) = out(k)
      assert(on === n.toLong, s"key $k: n $on != $n")
      assert(ts === s.setScale(2, RoundingMode.HALF_UP).doubleValue(), s"key $k spent")
      assert(ms === mean.doubleValue(), s"key $k mean $ms != $mean")
      assert(vs === varr.doubleValue(), s"key $k var $vs != $varr")
    }
    // the fixture must actually exercise both delta arms
    val keys = Tables.orders(spark, Sf).select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(keys.exists(_ % 10 == 0), "no insert rows in fixture")
    assert(keys.exists(k => k % 10 != 0 && k % 17 == 0), "no delete rows in fixture")
  }

  test("scd2 late splice equals the full rebuild; fixture hits mid-interval") {
    val spliced = Relational.q46Scd2LateSplice(spark, Sf)
    // splice(base, late) == rebuild(base ∪ late): the corrected history
    // must be indistinguishable from re-windowing the full log
    val rebuilt = Relational.q42Scd2Intervals(spark, Sf)
      .select("o_custkey", "o_orderkey", "o_totalprice",
        "valid_from", "valid_to", "is_current")
    val sp = spliced.select("o_custkey", "o_orderkey", "o_totalprice",
      "valid_from", "valid_to", "is_current")
    assert(sp.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(sp).isEmpty,
      "spliced history diverged from the full rebuild")
    // every untouched key has no late rows; every spliced key has one
    val byKey = spliced.groupBy("o_custkey")
      .agg(count_if(col("is_late")).as("n_late"),
        countDistinct(col("splice")).as("n_labels"),
        first(col("splice")).as("label"))
    assert(byKey.filter(col("n_labels") =!= 1).isEmpty,
      "a key must be entirely spliced or entirely untouched")
    assert(byKey.filter(col("label") === "untouched" && col("n_late") > 0).isEmpty)
    assert(byKey.filter(col("label") === "spliced" && col("n_late") === 0).isEmpty)
    // the fixture must actually exercise the mid-interval landing: some
    // late row falls STRICTLY inside a pre-splice interval of its key
    val lateRows = spliced.filter(col("is_late"))
      .select(col("o_custkey").as("k"), col("valid_from").as("late_vf"))
    val baseHist = spliced.filter(!col("is_late") && col("splice") === "spliced")
    // pre-splice intervals of affected keys: re-derive from base rows only
    val preSplice = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("valid_from").asc, col("o_orderkey").asc)
      baseHist.select(col("o_custkey"), col("o_orderkey"), col("valid_from"))
        .withColumn("pre_vt", lead(col("valid_from"), 1).over(w))
    }
    val midHits = lateRows.join(preSplice,
      col("k") === col("o_custkey") &&
        col("valid_from") < col("late_vf") && col("late_vf") < col("pre_vt"))
    assert(midHits.count() > 0,
      "fixture never lands a late row strictly inside an existing interval")
  }

  test("scd2 late splice closes/inserts/re-points at mid-interval and boundary") {
    import spark.implicits._
    val src = Seq(
      // key 1: base [jan,mar), [mar,∞); late row lands mid-interval at feb
      (1L, 10L, 100.0, "1995-01-01", false),
      (1L, 30L, 300.0, "1995-03-01", false),
      (1L, 20L, 200.0, "1995-02-01", true),
      // key 2: late row TIES an existing boundary date (apr); the
      // o_orderkey tiebreak (21 < 41) makes the late interval the empty
      // [apr, apr) and keeps the existing row's interval open
      (2L, 11L, 110.0, "1995-01-01", false),
      (2L, 41L, 410.0, "1995-04-01", false),
      (2L, 21L, 210.0, "1995-04-01", true),
      // key 3: no late rows — must pass through untouched
      (3L, 12L, 120.0, "1995-01-01", false))
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "valid_from", "is_late")
      .withColumn("valid_from", to_date(col("valid_from")))
    val out = Relational.scd2SpliceFrom(src).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.getDate(3)).map(_.toString), Option(r.getDate(4)).map(_.toString),
          r.getBoolean(5), r.getString(7))).toMap
    // key 1: predecessor closed at the late valid_from, late interval
    // inserted, successor re-pointed (its own interval unchanged here)
    assert(out((1L, 10L)) === ((Some("1995-01-01"), Some("1995-02-01"), false, "spliced")))
    assert(out((1L, 20L)) === ((Some("1995-02-01"), Some("1995-03-01"), false, "spliced")))
    assert(out((1L, 30L)) === ((Some("1995-03-01"), None, true, "spliced")))
    // key 2 boundary tie: [jan,apr) closed at the tied date against the
    // LATE row (tiebreak), late row collapses to the empty [apr,apr),
    // existing apr row stays current
    assert(out((2L, 11L)) === ((Some("1995-01-01"), Some("1995-04-01"), false, "spliced")))
    assert(out((2L, 21L)) === ((Some("1995-04-01"), Some("1995-04-01"), false, "spliced")))
    assert(out((2L, 41L)) === ((Some("1995-04-01"), None, true, "spliced")))
    // key 3 untouched
    assert(out((3L, 12L)) === ((Some("1995-01-01"), None, true, "untouched")))
  }

  test("ntile/percent_rank/cume_dist: quartile balance and rank bounds") {
    val rows = Relational.q44NtileCume(spark, Sf).collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[Double]("revenue"),
        r.getAs[Long]("quartile"), r.getAs[Double]("pct_rank"),
        r.getAs[Double]("cume")))
    // one row per customer that has orders
    val nExpected = Tables.orders(spark, Sf)
      .select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(rows.length.toLong === nExpected)
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val n = rs.length
      // ntile: quartile sizes differ by at most one, labels are 1..4
      val sizes = rs.groupBy(_._3).map { case (q, xs) => q -> xs.size }
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L, 4L)), s"segment $seg labels")
      assert(sizes.values.max - sizes.values.min <= 1, s"segment $seg imbalance")
      // percent_rank spans [0, 1] exactly (the custkey tiebreak makes
      // the order total, so ranks are dense); cume_dist ends at 1
      assert(rs.map(_._4).min === 0.0)
      assert(n == 1 || rs.map(_._4).max === 1.0)
      assert(rs.map(_._5).max === 1.0)
      assert(rs.forall(r => r._5 > 0.0 && r._5 <= 1.0 && r._4 >= 0.0 && r._4 <= 1.0))
    }
  }

  test("scd2 snapshot-at: one row per key = the latest change at or before T") {
    val at = java.time.LocalDateTime.parse("1995-06-17T00:00:00")
    val snap = Relational.q47Scd2SnapshotAt(spark, Sf).collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        ((r.getAs[Long]("o_orderkey"), r.getAs[java.time.LocalDateTime]("valid_from"))))
    // interval disjointness => the snapshot is a consistent image: one row per key
    assert(snap.map(_._1).distinct.length === snap.length)
    // independent formulation: per key, the covering interval belongs to the
    // change row with the LEXICOGRAPHICALLY LAST (valid_from, o_orderkey)
    // among rows dated <= T (every earlier tied/preceding row's interval is
    // closed by its successor's valid_from <= T)
    val expect = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .collect()
      .map(r => (r.getAs[Long](0), r.getAs[Long](1),
        r.getAs[java.time.LocalDateTime](2)))
      .filter(!_._3.isAfter(at))
      .groupBy(_._1)
      .map { case (k, rs) =>
        val (_, ok, d) = rs.maxBy { case (_, ok, d) =>
          (d.toEpochSecond(java.time.ZoneOffset.UTC), ok)
        }
        k -> ((ok, d))
      }
    assert(snap.toMap === expect)
  }

  test("skew audit: head ranked (cnt desc, key asc), shares exact, cum monotone") {
    val got = Relational.q48SkewAudit(spark, Sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("l_suppkey"),
        r.getAs[Long]("cnt"), r.getAs[Double]("share_pct"),
        r.getAs[Double]("cum_share_pct")))
    assert(got.map(_._1).toSeq === (1L to got.length).toSeq)
    val counts = Tables.lineitem(spark, Sf)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getAs[Long](0), r.getAs[Long](1)))
    val total = counts.map(_._2).sum
    val head = counts.sortBy { case (k, c) => (-c, k) }.take(20)
    assert(got.map(t => (t._2, t._3)).toSeq === head.toSeq)
    def round6(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    got.foreach { case (_, _, c, share, _) =>
      assert(share === round6(c * 100.0 / total))
    }
    // cumulative share: strictly increasing down the head, ends <= 100
    assert(got.map(_._5).toSeq === got.map(_._5).sorted.toSeq)
    assert(got.last._5 <= 100.0)
    assert(got.head._4 === got.head._5)
  }

  test("column profile equals independent per-column aggregates") {
    val got = Relational.q49ColumnProfile(spark, Sf).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          r.getAs[Long]("n_distinct"), r.getAs[Double]("min_v"),
          r.getAs[Double]("max_v")))).toMap
    val li = Tables.lineitem(spark, Sf)
    val n = li.count()
    Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_quantity", "l_extendedprice", "l_discount").foreach { c =>
      val ref = li.select(
        count(lit(1)), count(col(c)),
        countDistinct(col(c).cast("double")),
        min(col(c).cast("double")), max(col(c).cast("double"))).collect()(0)
      assert(got(c) === ((n, n - ref.getLong(1), ref.getLong(2),
        ref.getDouble(3), ref.getDouble(4))), s"column $c profile diverges")
    }
    assert(got.size === 6)
  }

  test("scd2 snapshot diff: applying the diff to snapshot A reconstructs B") {
    val fromAt = "1996-06-17"; val toAt = "1999-06-17"
    val snapA = Relational.q47Scd2SnapshotAt(spark, Sf, fromAt)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val snapB = Relational.q47Scd2SnapshotAt(spark, Sf, toAt)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val diff = Relational.q51SnapshotDiff(spark, Sf, fromAt, toAt)
    // the diff must be a faithful patch: B == (A \ removed-or-changed keys)
    //   ∪ (to-side of added/changed rows)
    val touched = diff.select(col("o_custkey"))
    val patched = snapA.join(touched, Seq("o_custkey"), "left_anti")
      .unionByName(diff.filter(col("change_type").isin("added", "changed"))
        .select(col("o_custkey"), col("orderkey_to").as("o_orderkey"),
          col("price_to").as("o_totalprice")))
    assert(patched.exceptAll(snapB).isEmpty && snapB.exceptAll(patched).isEmpty,
      "diff applied to snapshot A must reconstruct snapshot B")
    // classification is exhaustive and sides are populated per type
    assert(diff.filter(!col("change_type").isin("added", "removed", "changed"))
      .isEmpty)
    assert(diff.filter(col("change_type") === "added" &&
      (col("orderkey_from").isNotNull || col("orderkey_to").isNull)).isEmpty)
    assert(diff.filter(col("change_type") === "removed" &&
      (col("orderkey_to").isNotNull || col("orderkey_from").isNull)).isEmpty)
    assert(diff.filter(col("change_type") === "changed" &&
      (col("orderkey_from").isNull || col("orderkey_to").isNull)).isEmpty)
    // the two-year gap must exercise every arm on the fixture
    val arms = diff.groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("added", "changed").foreach(a =>
      assert(arms.getOrElse(a, 0L) > 0, s"fixture never exercises '$a'"))
    // no key appears twice: snapshots are ≤1 row per key, join is 1:1
    assert(diff.groupBy("o_custkey").count().filter(col("count") > 1).isEmpty)
  }
  test("join-view delta-apply equals a full recompute over post-change tables") {
    // Spark-side scratch recompute: effective orders joined to updated
    // customers — the IVM correctness statement, independently of the
    // DuckDB twin (which states the same thing cross-engine)
    val o = Tables.orders(spark, Sf).select(col("o_custkey"), col("o_orderkey"),
      col("o_totalprice").cast("decimal(18,2)").as("p"))
    val rnew = o.filter(col("o_orderkey") % 10 === 0)
      .unionByName(o.filter(col("o_orderkey") % 10 =!= 0 &&
        col("o_orderkey") % 17 =!= 0))
    val snew = Tables.customer(spark, Sf).select(col("c_custkey"),
      when(col("c_custkey") % 13 === 0, (col("c_nationkey") + 1) % 25)
        .otherwise(col("c_nationkey")).as("c_nationkey"))
    val full = rnew.join(snew, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("p")).cast("double"), 2).as("total_revenue"))
    val inc = Relational.q52JoinDeltaView(spark, Sf)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "delta expansion must equal the scratch recompute exactly")
    // the dim delta matters: dropping the R⋈ΔS and ΔR⋈ΔS terms (i.e.
    // recomputing against the OLD dim) must NOT equal the applied view
    val stale = rnew.join(Tables.customer(spark, Sf)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("p")).cast("double"), 2).as("total_revenue"))
    assert(!inc.exceptAll(stale).isEmpty,
      "fixture must actually move orders across nations")
    // order conservation: total order count equals the effective multiset
    val totInc = inc.agg(sum(col("n_orders"))).head.getLong(0)
    assert(totInc === rnew.join(snew, col("o_custkey") === col("c_custkey")).count())
  }

  test("histogram quantiles: estimates within one bin width of exact " +
    "percentiles, monotone, correct total") {
    val nBins = 1024
    val xs = Tables.lineitem(spark, Sf)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val (mn, mx) = (xs.head, xs.last)
    val width = (mx - mn) / nBins
    val got = Relational.q53HistogramQuantiles(spark, Sf, nBins).collect()
      .map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got.size === 4 && got.values.forall(_._3 === xs.length.toLong))
    for ((p, (_, est, _)) <- got) {
      // exact p-quantile: the ceil(p*n)-th smallest (the first value the
      // cumulative compare can reach)
      val exact = xs(math.ceil(p * xs.length).toInt - 1)
      assert(math.abs(est - exact) <= width + 1e-9,
        s"p=$p: est $est vs exact $exact exceeds bin width $width")
    }
    val ordered = got.toSeq.sortBy(_._1).map(_._2._2)
    assert(ordered === ordered.sorted, "estimates must be monotone in p")
  }

  test("table checksum: equals an md5 reference sum on customer, is row-" +
    "order invariant, and moves when any single row flips") {
    def refHash60(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def cents(d: Double): Long = java.math.BigDecimal.valueOf(d * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val rows = Tables.customer(spark, Sf).collect().map { r =>
      Seq(r.getLong(0).toString, r.getString(1), r.getInt(2).toString,
        cents(r.getDouble(3)).toString, r.getString(4)).mkString("|")
    }
    // emitted fingerprint = exact DECIMAL(38,0) sum mod 2^61-1 as BIGINT
    val M61 = BigInt(2305843009213693951L)
    val refSum = rows.map(s => BigInt(refHash60(s))).sum
    val got = Relational.q54TableChecksum(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigInt(r.getLong(2))))).toMap
    assert(got.keySet === Set("lineitem", "orders", "customer"))
    assert(got("customer") === ((rows.length.toLong, refSum % M61)),
      "customer checksum diverges from the md5 reference sum mod 2^61-1")
    // order invariance is structural (a commutative sum), and any
    // single-row flip moves the total: dropping each of 5 sample rows
    // yields 5 distinct sums, none equal to the full sum (mod 2^61-1 a
    // collision would need a 2^-61 accident on 5 draws)
    val dropped = rows.take(5).map(s => (refSum - BigInt(refHash60(s))) % M61)
    assert(dropped.forall(_ != refSum % M61))
    assert(dropped.distinct.length === dropped.length)
    // the other two tables carry consistent row counts
    assert(got("lineitem")._1 ===
      Tables.lineitem(spark, Sf).count())
    assert(got("orders")._1 === Tables.orders(spark, Sf).count())
  }

  test("fk audit: orphan/null counts equal collected-key-set mirrors " +
    "for all five relations") {
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Seq[Option[Long]] =
      df.select(col(c).cast("long")).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    def parents(df: org.apache.spark.sql.DataFrame, c: String): Set[Long] =
      keys(df, c).flatten.toSet
    val cases = Seq(
      ("lineitem.l_orderkey->orders",
        keys(Tables.lineitem(spark, Sf), "l_orderkey"),
        parents(Tables.orders(spark, Sf), "o_orderkey")),
      ("lineitem.l_partkey->part",
        keys(Tables.lineitem(spark, Sf), "l_partkey"),
        parents(Tables.part(spark, Sf), "p_partkey")),
      ("lineitem.l_suppkey->supplier",
        keys(Tables.lineitem(spark, Sf), "l_suppkey"),
        parents(Tables.supplier(spark, Sf), "s_suppkey")),
      ("orders.o_custkey->customer",
        keys(Tables.orders(spark, Sf), "o_custkey"),
        parents(Tables.customer(spark, Sf), "c_custkey")),
      ("customer.c_nationkey->nation",
        keys(Tables.customer(spark, Sf), "c_nationkey"),
        parents(Tables.nation(spark, Sf), "n_nationkey")))
    val got = Relational.q55FkAudit(spark, Sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === cases.map(_._1).toSet)
    for ((name, ks, ps) <- cases) {
      val nNull = ks.count(_.isEmpty).toLong
      val nOrphan = ks.count(k => k.isDefined && !ps(k.get)).toLong
      assert(got(name) === ((ks.length.toLong, nNull, nOrphan)),
        s"$name diverges from the collected-key mirror")
    }
  }
}
