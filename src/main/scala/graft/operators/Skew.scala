package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.syntax._

/** Skew-handling utilities — the explicit salting strategies for the
  * cases AQE's runtime skew-join splitting cannot fix:
  *
  *  - a HOT AGGREGATION KEY (one group dominates): AQE splits skewed
  *    JOIN partitions, but a single hash-aggregate group still lands in
  *    one task. [[saltedAgg]] runs the aggregate in two phases over a
  *    salted composite key, so the hot group's partial results spread
  *    over `salt` tasks before the tiny final combine.
  *  - a BROADCAST-INELIGIBLE skewed join where the skew is known ahead
  *    of time (e.g. null-ish sentinel keys): [[saltedJoin]] replicates
  *    the small side `salt` ways and salts the big side uniformly, so
  *    the hot key's rows spread over `salt` partitions.
  *
  * Both are semantics-preserving rewrites, verified in SkewSpec against
  * their unsalted forms.
  */
object Skew {

  /** Two-phase count/sum aggregate over a possibly-skewed key.
    * Output schema: key, n (count), sum_value (sum of `value`). */
  def saltedAgg(df: DataFrame, key: Column, value: Column, salt: Int = 16): DataFrame = {
    val partial = df
      .groupBy(key.as("k"), pmod(hash(monotonically_increasing_id()), lit(salt)).as("s"))
      .agg(count(lit(1)).as("pn"), sum(value).as("psum"))
    partial
      .groupBy($"k")
      .agg(sum($"pn").as("n"), sum($"psum").as("sum_value"))
      .withColumnRenamed("k", "key")
  }

  /** Salted equi-join of a skewed big side against a small (but not
    * broadcastable) side: big rows get a uniform salt in [0, salt); the
    * small side is replicated `salt` times; the join key becomes
    * (key, salt). Row multiset identical to the plain inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, salt: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicated,
        saltedBig(bigKey) === replicated(smallKey) &&
          saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
