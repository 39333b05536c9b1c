package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structure-preserving K-fold scale-up of a test-data sf directory — the
  * local stand-in for "would this plan survive 10x the data?".
  *
  * Naive replication would be a WRONG scale test for the similarity /
  * dedup operators: exact copies are all mutual near-dups, so pair
  * outputs would grow quadratically in K by construction and every LSH
  * bucket would hold K copies of the same key. Instead each replica is
  * perturbed so that WITHIN-replica structure is preserved exactly and
  * CROSS-replica similarity is destroyed:
  *
  *  - facts/dims: surrogate keys are offset by `k * KeyStride` in every
  *    table that carries them (lineitem⋈orders⋈customer keep their join
  *    fan-out; part/supplier/nation/region stay unscaled like real
  *    slowly-growing dimensions);
  *  - documents: every whitespace token gets a replica-unique prefix —
  *    token sets are disjoint across replicas (Jaccard 0) but isomorphic
  *    within one (same shingle counts, same Jaccard between any two docs
  *    of the same replica);
  *  - embeddings: each replica's vectors are cyclically rotated by
  *    k mod 64 dimensions, and replicas beyond the 64 distinct rotations
  *    additionally flip the sign of every odd dimension — both are
  *    isometries applied uniformly within a replica, so every
  *    within-replica dot product is preserved BIT-FOR-BIT (s_j x_j ·
  *    s_j y_j = x_j y_j exactly in fp) while cross-replica cosines drop
  *    to noise; the two knobs give 128 distinct perturbations;
  *  - events: ids/users offset, timestamps kept (load grows K-fold per
  *    hour bucket, the realistic shape).
  *
  * Output sizes of pair-emitting operators therefore scale LINEARLY in K,
  * which is exactly the contract a horizontally-partitioned corpus has at
  * 100 TB. The scaled dir is written once (marker file) and reused.
  */
object ScaledCorpus {

  /** Key offset stride between replicas — far above any sf0.1 surrogate key. */
  val KeyStride: Long = 10000000000L

  private def marker(target: String) = new java.io.File(s"$target/_GRAFT_SCALED_OK")

  /** Materialize `base` scaled by `k` into `target` (idempotent). */
  def ensure(s: SparkSession, base: String, target: String, k: Int): String = {
    require(k >= 1 && k <= 128,
      s"scale factor must be in [1, 128] (64 rotations x 2 sign patterns), got $k")
    if (marker(target).exists()) return target
    new java.io.File(target).mkdirs()

    // events.parquet has shipped as TIMESTAMP(NANOS) (older generations)
    // or TIMESTAMP(MICROS) (current); the raw read below copies ts
    // through untouched either way, so the scaled file keeps the base
    // layout and Tables.events' schema dispatch handles both. The
    // nanos-as-long conf is still required in the builder: harmless for
    // the micros layout, mandatory to read the nanos one (asserted here
    // like Tables.events — no conf mutation).
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "ScaledCorpus may read a TIMESTAMP(NANOS) events.parquet: set " +
        "spark.sql.legacy.parquet.nanosAsLong=true in the SparkSession builder")
    def raw(name: String): DataFrame = s.read.parquet(s"$base/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$target/$name.parquet")

    def replicate(df: DataFrame)(perturb: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => perturb(df, i)).reduce(_ unionAll _)

    def offsetKeys(df: DataFrame, i: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * KeyStride)))

    // dims copied as-is (dimensions grow slower than facts)
    Seq("region", "nation", "part", "supplier").foreach(n => write(raw(n), n))

    write(replicate(raw("customer"))((d, i) => offsetKeys(d, i, "c_custkey")), "customer")
    write(replicate(raw("orders"))((d, i) =>
      offsetKeys(d, i, "o_orderkey", "o_custkey")), "orders")
    write(replicate(raw("lineitem"))((d, i) =>
      offsetKeys(d, i, "l_orderkey")), "lineitem")
    write(replicate(raw("events"))((d, i) =>
      offsetKeys(d, i, "event_id", "user_id")), "events")
    write(replicate(raw("documents"))((d, i) => {
      val p = s"r${i}x"
      offsetKeys(d, i, "doc_id")
        .withColumn("text",
          when(length(trim(col("text"))) === 0, col("text"))
            .otherwise(concat(lit(p), regexp_replace(col("text"), "\\s+", s" $p"))))
    }), "documents")
    write(replicate(raw("embeddings"))((d, i) =>
      if (i == 0) d
      else {
        val rot = i % 64
        val grp = i / 64
        offsetKeys(d, i, "vec_id")
          .withColumn("embedding", {
            val v = col("embedding")
            val n = size(v)
            val rotated =
              if (rot == 0) v
              else concat(slice(v, lit(rot + 1), n - rot), slice(v, lit(1), lit(rot)))
            if (grp == 0) rotated
            else transform(rotated, (x, j) =>
              when(j % 2 === 1, -x).otherwise(x))
          })
      }), "embeddings")

    marker(target).createNewFile()
    target
  }
}
