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
  /** The events parquet has shipped in two layouts across test-data
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts via nanosAsLong=true, surfacing the column as a raw long)
    * and plain TIMESTAMP(MICROS) (surfacing as timestamp_ntz). This
    * loader dispatches on the READ schema so both layouts yield the
    * same downstream contract: a session-zoned (UTC) TimestampType `ts`
    * at microsecond grain.
    *   - long ts (nanos-as-long): integer `div 1000` truncation — a
    *     double division would lose precision at 2^60 ns magnitudes.
    *   - timestamp_ntz ts (micros): cast to TimestampType; under the
    *     mandatory UTC session zone the instant is unchanged.
    * DuckDB reads either layout natively; twins compare values at the
    * grains the operators emit (hour buckets / epoch millis / dates).
    *
    * For the NANOS layout the nanos-as-long flag must be set in the
    * SESSION BUILDER (Bench, Verify and the spec session all do) — a
    * loader that silently flips session conf is a side effect a shared
    * session doesn't expect. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.parquet ts column has unsupported type $other " +
          "(expected long nanos, timestamp_ntz, or timestamp)")
    }
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
