package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.syntax._

/** Partitioned table layouts — the storage half of partition PRUNING.
  *
  * At 100 TB nobody scans a flat directory: facts are laid out
  * hive-partitioned on their dominant filter key (events by day,
  * corpora by source) so a date- or source-predicate query touches only
  * the matching directories — the scan's `PartitionFilters` — and never
  * opens the rest. These helpers materialize that layout from the flat
  * harness parquet ONCE per sf dir (marker file) so registered queries
  * can demonstrate pruning end-to-end; in production the layout is how
  * the tables are written in the first place and this step disappears.
  *
  * Partition-count discipline (the part that matters at scale): events
  * partition by DAY (~365/yr directories, each internally splittable),
  * not by hour/minute — small-file death; documents by bounded `source`
  * cardinality. Both match the partition column to the query predicate,
  * which is the only reason to partition at all.
  */
object Layout {

  private[graft] def baseOf(sfDir: String) =
    new org.apache.hadoop.fs.Path(sfDir).getName

  /** Marker-gated one-shot materialization, via the Hadoop FS API so the
    * layout root can be any supported scheme (hdfs://, s3a://, file:) —
    * same FS resolution the bucketed-facts path below uses. */
  private def ensure(s: SparkSession, root: String)(write: String => Unit): String = {
    val marker = new org.apache.hadoop.fs.Path(s"$root/_GRAFT_LAYOUT_OK")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      write(root)
      fs.create(marker, true).close()
    }
    root
  }

  /** Events re-laid hive-partitioned by event_date (ts kept at µs). */
  def ensureEventsByDate(s: SparkSession, sfDir: String,
                         root: String = "/root/repo/target/graft-layout"): String =
    ensure(s, s"$root/${baseOf(sfDir)}/events_by_date") { dir =>
      Tables.events(s, sfDir)
        .withColumn("event_date", to_date($"ts"))
        .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    }

  /** Events read back through the partitioned layout. */
  def eventsByDate(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensureEventsByDate(s, sfDir))

  /** TRAINING-SHARD WRITER — the sink every curation pipeline ends in:
    * the corpus written as exactly `nShards` deterministic shards,
    * sharded by a salted hash of doc_id (a pure function of the row —
    * reproducible across runs, engines and cluster sizes; NOT
    * round-robin, which depends on partition layout) and sorted by
    * doc_id within each shard (stable byte-identical shard content). At
    * 100 TB this is `repartition(n, col)` + `sortWithinPartitions` —
    * one shuffle keyed by the shard id, then a streaming sort per
    * shard; the hive `shard=` directories mean a trainer can read any
    * subset with partition pruning. Returns the shard root. */
  def writeShards(s: SparkSession, docs: org.apache.spark.sql.DataFrame,
                  dir: String, nShards: Int): String = {
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    import graft.functions.EngineNeutral.hash60
    docs
      .withColumn("shard",
        pmod(hash60(concat($"doc_id".cast("string"), lit("#shard"))), lit(nShards.toLong)))
      .repartition(nShards, $"shard")
      .sortWithinPartitions($"shard", $"doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    dir
  }

  /** 16-bit × 16-bit Morton interleave: bit i of `x` lands at position
    * 2i+1 and bit i of `y` at 2i, so sorting by the result orders rows
    * along the Z space-filling curve over (x, y). Pure long bit ops —
    * whole-stage codegen, no UDF. */
  private def zValue(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Z-ORDERED events layout — MULTI-dimensional clustering, the file-
    * skipping complement of [[ensureEventsByDate]]'s single-dimension
    * hive partitioning. Sorting by one column localizes only that
    * column's predicates; at 100 TB an events table is filtered by user
    * AND time in the same query, and a Z-order sort keeps each parquet
    * file's (user_id, ts) min/max envelope tight in BOTH dimensions, so
    * footer stats prune files/row-groups for 2-D range predicates that
    * a 1-D layout scatters across the whole table (the technique behind
    * Databricks Delta OPTIMIZE ZORDER / Iceberg sort orders; Morton
    * 1966).
    *
    * Shape: both dimensions are affinely ranked to 16 bits against the
    * table's min/max (one broadcast 1-row bounds aggregate — no
    * driver-side collect), interleaved to a 32-bit z-value, then
    * `repartitionByRange(zval)` + in-partition sort — one range
    * exchange, the same cost as any global sort, paid once at write
    * time. The rank grid is coarse on purpose: adjacent grid cells
    * share files anyway, and 2^32 cells already far exceeds any
    * realistic file count. */
  def ensureEventsZOrdered(s: SparkSession, sfDir: String,
                           root: String = "/root/repo/target/graft-layout",
                           nFiles: Int = 32): String =
    ensure(s, s"$root/${baseOf(sfDir)}/events_zorder") { dir =>
      val ev = Tables.events(s, sfDir)
      val hour = (unix_timestamp($"ts") / lit(3600L)).cast("long")
      val bounds = ev.agg(
        min($"user_id").as("u0"), max($"user_id").as("u1"),
        min(hour).as("h0"), max(hour).as("h1"))
      ev.join(broadcast(bounds))
        .withColumn("zval", zValue(
          (($"user_id" - $"u0") * lit(65536L)) / ($"u1" - $"u0" + lit(1L)),
          ((hour - $"h0") * lit(65536L)) / ($"h1" - $"h0" + lit(1L))))
        .repartitionByRange(nFiles, $"zval")
        .sortWithinPartitions($"zval")
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .write.mode("overwrite").parquet(dir)
    }

  /** Events read back through the Z-ordered layout (ts already µs —
    * the nanos conversion happened at layout-write time). */
  def eventsZOrdered(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(ensureEventsZOrdered(s, sfDir))

  /** Documents exported as hive-partitioned (by source) JSONL — the
    * interchange layout a corpus lands in before ETL. */
  def ensureDocumentsJsonl(s: SparkSession, sfDir: String,
                           root: String = "/root/repo/target/graft-layout"): String =
    ensure(s, s"$root/${baseOf(sfDir)}/documents_jsonl") { dir =>
      Tables.documents(s, sfDir)
        .write.mode("overwrite").partitionBy("source").json(dir)
    }

  /** Bucketed fact tables: lineitem and orders written `bucketBy` (and
    * sorted) on the join key into the session catalog. Both sides
    * hash-bucketed the same way = a CO-LOCATED sort-merge join with ZERO
    * exchanges — the shuffle paid ONCE at write time and amortized over
    * every subsequent join, which is how a 100 TB fact⋈fact workload
    * stops re-shuffling its biggest tables on every query (PlanSpec
    * asserts the exchange-free join). Returns (lineitemTable, ordersTable). */
  def ensureBucketedFacts(s: SparkSession, sfDir: String,
                          buckets: Int = 8): (String, String) = {
    val db = "graft_bucketed_" + baseOf(sfDir).replace('.', '_').replace('-', '_')
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val lt = s"$db.lineitem_b"
    val ot = s"$db.orders_b"
    // a fresh metastore with a stale warehouse dir (previous session's
    // files, no catalog entry) would fail LOCATION_ALREADY_EXISTS — the
    // directory is a derived cache of our own write, so clear it
    def dropStaleLocation(table: String): Unit = {
      val wh = s.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(s"$wh/$db.db/${table.split('.').last}")
      val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
    if (!s.catalog.tableExists(lt)) {
      dropStaleLocation(lt)
      Tables.lineitem(s, sfDir).write
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(lt)
    }
    if (!s.catalog.tableExists(ot)) {
      dropStaleLocation(ot)
      Tables.orders(s, sfDir).write
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(ot)
    }
    (lt, ot)
  }

  /** Documents read back through the partitioned JSONL layout (explicit
    * schema — no inference scan; `source` comes from partition discovery). */
  def documentsJsonl(s: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureDocumentsJsonl(s, sfDir)
    import org.apache.spark.sql.types._
    // documentsSchema minus the partition column, which the directory
    // layout contributes; _corrupt_record audits bad lines (PERMISSIVE)
    val fileSchema = StructType(
      Tables.documentsSchema.fields.filterNot(_.name == "source"))
      .add("_corrupt_record", StringType)
    s.read
      .schema(fileSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
  }

  /** SMALL-FILES COMPACTION PLANNER — the maintenance query behind every
    * OPTIMIZE/compaction job: per partition of the JSONL corpus layout,
    * how many files hold how many rows, how many files the partition
    * SHOULD have at the target rows-per-file, and the verdict
    * (`coalesce` too many small files / `split` files too fat / `keep`).
    * The small-files problem is the quiet killer of 100 TB table
    * health — a partition fragmented into thousands of tiny files pays
    * per-file open/footer/listing cost until scans are metadata-bound;
    * this planner is the audit that drives the rewrite, and because it
    * only aggregates (partition, file) counts it costs one scan of the
    * layout's row metadata, never a rewrite. Shape: file identity comes
    * from `input_file_name()` (per-row, codegen, no filesystem listing
    * on the driver), one partial-aggregated exchange on the partition
    * key; target_files is exact integer arithmetic — identical in the
    * DuckDB twin via `//`. A file yields a count only if it has rows:
    * empty files are invisible to BOTH engines, which is the right
    * blindness for a row-budget planner. */
  def compactionPlan(s: SparkSession, sfDir: String,
                     targetRows: Long = 100L): DataFrame = {
    require(targetRows >= 1, s"need targetRows >= 1, got $targetRows")
    documentsJsonl(s, sfDir)
      .select($"source", input_file_name().as("f"))
      .groupBy($"source")
      .agg(countDistinct($"f").as("n_files"), count(lit(1)).as("n_rows"))
      .withColumn("target_files",
        greatest(expr(s"(n_rows + ${targetRows - 1}) div $targetRows"), lit(1L)))
      .withColumn("action",
        when($"n_files" > $"target_files", "coalesce")
          .when($"n_files" < $"target_files", "split")
          .otherwise("keep"))
  }

  /** ZONE-MAP SKIPPING AUDIT — prices a layout decision in skipped
    * files BEFORE rewriting anything: events are assigned to
    * hypothetical files under two layouts (day-clustered — the
    * [[ensureEventsByDate]] shape — vs md5-hash-scattered, the
    * "whatever the upstream writer emitted" default), per-file min/max
    * day zone maps are computed, and each of a set of single-day
    * predicates is priced as (files skipped, rows a zone-map scan must
    * still read). The report every 100 TB layout migration starts
    * from: "this rewrite turns a full scan into touching 1 file of N"
    * — measured on the real data, not asserted. Predicate days are
    * offsets from the corpus min day, so the audit is deterministic on
    * any dataset.
    *
    * Shape: one scan, a 2-way unionAll of map-side file assignments
    * (day index, and the engine-neutral md5 coin — no sort, no window:
    * a global ntile would serialize on one task at scale), ONE
    * partial-agged (layout, file) zone-map aggregate — O(files) rows —
    * then a broadcast cross join against the O(|preds|) predicate frame
    * and a final bounded aggregate. Day arithmetic follows the cohort
    * discipline: floor(epoch-ms / 86400000.0), exact in double far past
    * any realistic date. */
  def skippingStats(s: SparkSession, sfDir: String, nHashFiles: Int = 64,
                    predOffsets: Seq[Int] = Seq(5, 10, 15)): DataFrame = {
    require(nHashFiles >= 1 && predOffsets.nonEmpty, "need files and predicates")
    val ev = Tables.events(s, sfDir).select($"event_id",
      floor(unix_millis($"ts") / lit(86400000.0)).cast("long").as("day"))
    val assigned = ev
      .select(lit("day_partitioned").as("layout"), $"day".as("file_id"), $"day")
      .unionByName(ev.select(lit("hash_partitioned").as("layout"),
        (graft.functions.EngineNeutral.hash60($"event_id".cast("string"))
          % nHashFiles).as("file_id"), $"day"))
    val zones = assigned.groupBy($"layout", $"file_id")
      .agg(min($"day").as("min_day"), max($"day").as("max_day"),
        count(lit(1)).as("n_rows"))
    val preds = ev.agg(min($"day").as("d0"))
      .select(explode(array(predOffsets.map(o => $"d0" + o): _*)).as("pred_day"))
    val skip = $"max_day" < $"pred_day" || $"min_day" > $"pred_day"
    zones.crossJoin(broadcast(preds))
      .groupBy($"layout", $"pred_day")
      .agg(count(lit(1)).as("n_files"),
        sum(when(skip, 1L).otherwise(0L)).as("n_skipped"),
        sum(when(skip, lit(0L)).otherwise($"n_rows")).as("n_rows_scanned"))
      .withColumn("skip_frac",
        round($"n_skipped".cast("double") / $"n_files", 6))
  }
}
