package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.VectorOps._
import graft.syntax._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *  - bruteForceTopK: exact cosine top-k. The query set is broadcast and
  *    scoring streams over the corpus — one pass, no corpus shuffle; the
  *    only exchange is the final per-query top-k (tiny: queries × k × P
  *    partial winners under AQE).
  *  - ivfTopK: IVF-style scale path — corpus is pre-bucketed by a coarse
  *    quantizer (SRP signature); queries probe only matching buckets.
  *    Trades recall for a bucket-pruned scan, the standard ANN shape.
  */
object Similarity {

  /** Exact brute-force cosine top-k for queries (vec_id < nQueries). */
  def bruteForceTopK(s: SparkSession, dir: String,
                     nQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"))
    val scored = e.join(broadcast(q), $"vec_id" =!= $"q_id")
      .withColumn("cos_sim", round(cosine($"q_v", $"v"), 4))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    scored.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"q_id", $"vec_id", $"cos_sim")
  }

  /** IVF/LSH bucketed ANN: 8-bit SRP coarse quantizer. Corpus bucketed
    * once (at scale: written bucketed/partitioned by `bucket`); a query
    * probes only its own bucket. Approximate by design — verified in
    * tests for recall against bruteForceTopK, not against the oracle. */
  def ivfTopK(s: SparkSession, dir: String,
              nQueries: Int = 5, k: Int = 10, nBits: Int = 8): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("bucket", srpSignature($"v", nBits))
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("q_id"), $"v".as("q_v"), $"bucket".as("q_bucket"))
    val scored = e.join(broadcast(q), $"bucket" === $"q_bucket" && $"vec_id" =!= $"q_id")
      .withColumn("cos_sim", round(cosine($"q_v", $"v"), 4))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    scored.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"q_id", $"vec_id", $"cos_sim")
  }

  /** SRP-LSH near-dup pairs (unblocked twin of Dedup.embeddingNearDup):
    * bucket on the full SRP signature, verify cosine within buckets. */
  def srpNearDupPairs(s: SparkSession, dir: String,
                      threshold: Double = 0.4, nBits: Int = 8): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("bucket", srpSignature($"v", nBits))
    val l = e.select($"bucket", $"vec_id".as("vec_a"), $"v".as("v_a"))
    val r = e.select($"bucket".as("bucket_r"), $"vec_id".as("vec_b"), $"v".as("v_b"))
    l.join(r, $"bucket" === $"bucket_r" && $"vec_a" < $"vec_b")
      .withColumn("cos_sim", round(cosine($"v_a", $"v_b"), 4))
      .filter($"cos_sim" >= threshold)
      .select($"vec_a", $"vec_b", $"cos_sim")
  }
}
