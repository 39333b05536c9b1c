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
    * compare coarsened values (hour buckets / epoch millis). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
