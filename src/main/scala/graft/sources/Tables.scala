package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (see /root/repo/TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's parquet source
  * handles column pruning + predicate pushdown; at cluster scale the same
  * paths would be `s3a://...` partitioned directories and nothing here
  * changes — the base dir is a constructor-style argument everywhere.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long and truncate to a microsecond
    * timestamp (integer `div` — a double division would lose precision at
    * 2^60 ns magnitudes). DuckDB keeps ns; downstream operators only
    * compare coarsened values (hour buckets / epoch millis).
    *
    * The nanos-as-long flag must be set in the SESSION BUILDER (Bench,
    * Verify and the spec session all do) — a loader that silently flips
    * session conf is a side effect a shared session doesn't expect, so
    * this asserts instead of mutating. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet stores TIMESTAMP(NANOS): set " +
        "spark.sql.legacy.parquet.nanosAsLong=true in the SparkSession " +
        "builder before reading the events table")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** The documents schema, for non-parquet ingestion paths. */
  val documentsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
  }

  /** JSONL corpus ingestion — the common interchange format for training
    * corpora. Explicit schema (no inference pass: at 100 TB inference is
    * a full extra scan); PERMISSIVE with a corrupt-record column so bad
    * lines are auditable instead of silently dropped. */
  def documentsFromJsonl(s: SparkSession, path: String): DataFrame =
    s.read
      .schema(documentsSchema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
}
