package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Storage-layout evidence for the 100 TB posture: partition pruning and
  * bucketed co-located joins — the two levers that keep a cluster from
  * scanning or shuffling data it doesn't need.
  */
class LayoutSpec extends SparkSpec {

  private val warehouse = "/tmp/graft-layout-test"

  test("partitioned parquet scans prune to the filtered partitions") {
    val out = s"$warehouse/orders_by_status"
    Tables.orders(spark, Sf)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val df = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition pruning in:\n$p")
    // pruned scan reads strictly fewer files than partitions exist
    assert(df.count() === Tables.orders(spark, Sf).filter(col("o_orderstatus") === "F").count())
  }

  test("z-order localizes a 2-D predicate; a 1-D sort scatters it") {
    import graft.sources.Layout
    // correctness first: the scan answer is layout-independent
    val z = Events.zorderScan(spark, Sf)
    val flat = Tables.events(spark, Sf)
      .filter(col("user_id").between(100L, 130L) &&
        col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-01-17").cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    assert(z.exceptAll(flat).isEmpty && flat.exceptAll(z).isEmpty)

    // locality: fraction of files CONTRIBUTING rows to the 2-D filter —
    // the proxy for what parquet footer min/max pruning can skip
    def contributing(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("user_id").between(100L, 130L) &&
          col("ts") >= lit("2024-01-10").cast("timestamp") &&
          col("ts") < lit("2024-01-17").cast("timestamp"))
        .select(input_file_name()).distinct().count()
    val zdir = Layout.ensureEventsZOrdered(spark, Sf)
    val zFiles = contributing(spark.read.parquet(zdir))
    val zTotal = spark.read.parquet(zdir).select(input_file_name()).distinct().count()
    // 1-D control: same file count, sorted by time alone — tight ts
    // envelopes, but every file spans all users, so the user band hits
    // every file in the time window
    val out = s"$warehouse/events_ts_sorted"
    Tables.events(spark, Sf)
      .repartitionByRange(zTotal.toInt, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(out)
    val tFiles = contributing(spark.read.parquet(out))
    assert(zFiles * 2 <= tFiles,
      s"z-order did not localize: $zFiles of $zTotal z-files vs $tFiles time-sorted files touch the predicate")
    assert(zFiles.toDouble / zTotal <= 0.5,
      s"2-D predicate touches $zFiles of $zTotal z-ordered files")
  }

  test("shard writer: deterministic assignment, exact shard count, sorted content") {
    val out = s"$warehouse/shards"
    val docs = Tables.documents(spark, Sf).select("doc_id", "source", "text")
    graft.sources.Layout.writeShards(spark, docs, out, nShards = 8)
    val back = spark.read.parquet(out)
    // nothing lost, nothing duplicated
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
    // every doc's shard is the pure hash function of its id — re-writing
    // to a different location yields the identical assignment
    val out2 = s"$warehouse/shards2"
    graft.sources.Layout.writeShards(spark, docs, out2, nShards = 8)
    val a1 = back.select("doc_id", "shard")
    val a2 = spark.read.parquet(out2).select("doc_id", "shard")
    assert(a1.exceptAll(a2).isEmpty && a2.exceptAll(a1).isEmpty)
    // hive layout: exactly the shard=N directories, prunable scan
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length === 8, dirs.mkString(","))
    val one = spark.read.parquet(out).filter(col("shard") === 3)
    one.collect()
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters"),
      "shard predicate did not prune")
    // within a shard file, rows are doc_id-sorted (stable shard bytes)
    val ids = spark.read.parquet(s"$out/shard=3").select("doc_id")
      .collect().map(_.getLong(0))
    assert(ids.sameElements(ids.sorted), "shard content not sorted by doc_id")
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_layout")
    spark.sql("USE graft_layout")
    try {
      Tables.orders(spark, Sf).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .format("parquet").saveAsTable("orders_b")
      Tables.customer(spark, Sf).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .format("parquet").saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key: no Exchange below the join
      assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
        !p.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n$p")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.sql("USE default")
    }
  }

  test("JSONL corpus round-trips through the documents schema") {
    val out = s"$warehouse/docs_jsonl"
    Tables.documents(spark, Sf).write.mode("overwrite").json(out)
    // corrupt-record-only queries over raw JSON require a cached parse
    val back = Tables.documentsFromJsonl(spark, out).cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() === 0L)
    val a = Tables.documents(spark, Sf).select("doc_id", "text", "lang", "source", "n_chars")
    val b = back.select("doc_id", "text", "lang", "source", "n_chars")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // corrupt lines land in the audit column, not silently dropped
    // (a fresh file in the dir — appending to a Spark-written part file
    // trips the Hadoop local-FS .crc sidecar)
    import java.nio.file.{Files, Paths}
    Files.write(Paths.get(out, "bad.json"), "{not valid json\n".getBytes)
    back.unpersist()
    spark.catalog.refreshByPath(out) // drop cached file listing/plan
    val withBad = Tables.documentsFromJsonl(spark, out).cache()
    try assert(withBad.filter(col("_corrupt_record").isNotNull).count() === 1L)
    finally withBad.unpersist()
  }

  test("persistStar materializes the star schema as catalog tables") {
    import graft.imdb.Pipeline
    val star = Pipeline.build(spark)
    Pipeline.persistStar(spark, star, db = "imdb_test")
    try {
      assert(spark.table("imdb_test.dim_movies").count() === 1000L)
      assert(spark.table("imdb_test.fact_movies").count() === 1492L)
      assert(spark.catalog.tableExists("imdb_test.dim_genres"))
      // the fact is partitioned on genre_id: a genre predicate must land
      // in PartitionFilters (directory pruning), not a row-level filter
      val drama = spark.table("imdb_test.fact_movies")
        .filter(col("genre_id") === "Drama")
      drama.collect()
      val p = drama.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*genre_id".r.findFirstIn(p).isDefined,
        s"genre predicate not pruned at partition level:\n$p")
      assert(drama.count() ===
        star.factMovies.filter(col("genre_id") === "Drama").count())
    } finally {
      Seq("dim_movies", "dim_people", "dim_genres", "fact_movies")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS imdb_test.$t"))
      spark.sql("DROP DATABASE IF EXISTS imdb_test")
    }
  }

  test("compaction plan: covers the corpus, exact ceil targets, verdict consistent") {
    val plan = graft.sources.Layout.compactionPlan(spark, Sf, targetRows = 5L)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_files"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("target_files"),
        r.getAs[String]("action")))
    // every partition reported exactly once; row totals cover the corpus
    val nDocs = Tables.documents(spark, Sf).count()
    assert(plan.map(_._1).distinct.length === plan.length)
    assert(plan.map(_._3).sum === nDocs)
    plan.foreach { case (src, nf, nr, tf, act) =>
      assert(nf >= 1 && nr >= 1, s"$src: empty partition reported")
      assert(tf === math.max((nr + 4) / 5, 1L), s"$src: ceil target wrong")
      val expect = if (nf > tf) "coalesce" else if (nf < tf) "split" else "keep"
      assert(act === expect, s"$src: action $act for n_files=$nf target=$tf")
    }
  }
  test("zone-map skipping audit equals a brute-force mirror; day layout " +
    "skips all files but the predicate's") {
    import graft.sources.Layout
    def refHash60(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val ev = Tables.events(spark, Sf)
      .select(col("event_id"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), math.floor(r.getLong(1) / 86400000.0).toLong))
    val d0 = ev.map(_._2).min
    val preds = Seq(5, 10, 15).map(d0 + _)
    val layouts = Map(
      "day_partitioned" -> ev.groupBy(_._2).map { case (d, xs) =>
        d -> ((d, d, xs.length.toLong)) },
      "hash_partitioned" -> ev.groupBy { case (id, _) => refHash60(id.toString) % 64 }
        .map { case (f, xs) =>
          f -> ((xs.map(_._2).min, xs.map(_._2).max, xs.length.toLong)) })
    val expected = (for {
      (lname, zones) <- layouts
      pd <- preds
    } yield {
      val skipped = zones.values.count { case (mn, mx, _) => mx < pd || mn > pd }
      val scanned = zones.values.collect {
        case (mn, mx, n) if !(mx < pd || mn > pd) => n
      }.sum
      (lname, pd) -> ((zones.size.toLong, skipped.toLong, scanned,
        BigDecimal(skipped.toDouble / zones.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }).toMap
    val got = Layout.skippingStats(spark, Sf).collect().map { r =>
      (r.getAs[String]("layout"), r.getAs[Long]("pred_day")) ->
        ((r.getAs[Long]("n_files"), r.getAs[Long]("n_skipped"),
          r.getAs[Long]("n_rows_scanned"), r.getAs[Double]("skip_frac")))
    }.toMap
    assert(got === expected)
    // the layout story: day clustering answers a day predicate from ONE
    // file; the hash scatter cannot skip like that
    preds.foreach { pd =>
      val (nf, sk, scanned, _) = got(("day_partitioned", pd))
      assert(sk === nf - 1, s"day layout must skip all but day $pd's file")
      assert(scanned === ev.count(_._2 == pd).toLong)
      val (_, hsk, hscan, _) = got(("hash_partitioned", pd))
      assert(hsk <= sk && hscan >= scanned,
        "hash scatter can never skip more than the clustered layout")
    }
  }
}
