package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §7.5.7 / builder prompt):
  * AQE's runtime skew-split is the first line of defense; explicit salting
  * is the deterministic fallback when a single key dominates even one
  * AQE-split partition (the classic 100 TB "null key / whale user" case).
  *
  * Shape: the skewed (large) side gets a salt in [0, buckets) derived by
  * hashing the whole row — deterministic, no `rand()`, so results are
  * reproducible; the build side is replicated `buckets` times. The join key
  * becomes (key, salt): one hot key now spreads over `buckets` shuffle
  * partitions, at the cost of replicating the (small) build side. */
object Skew {

  /** Inner equi-join `large ⋈ small` on `largeKey == smallKey`, salted into
    * `buckets` sub-partitions per key. Row-multiset-equivalent to the plain
    * join (each large row carries exactly one salt; each small row matches
    * it through exactly one of its replicas). */
  def saltedJoin(large: DataFrame, small: DataFrame,
                 largeKey: String, smallKey: String, buckets: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(hash(large.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated,
        salted(largeKey) === replicated(smallKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
