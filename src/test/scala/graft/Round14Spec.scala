package graft

import org.apache.spark.sql.functions._

/** Round 14 (VERDICT r13 #4): the co-purchase edge frame is memoized per
  * (session, fixture dir) and materialized once — ten graph queries used
  * to each pay the identical o-keyed build shuffle. These tests pin the
  * cache contract: a hit IS the same frame, a different dir is a
  * different frame, a hit's rows equal a fresh un-memoized build, and
  * the consuming queries plan from the materialized RDD rather than
  * re-deriving the lineitem lineage. */
class Round14Spec extends SparkTestBase {

  test("coPurchaseEdges memo: same (session, dir) reuses the frame; rows equal a fresh build") {
    val a = ops.Analytics.coPurchaseEdges(spark, sf0001)
    val b = ops.Analytics.coPurchaseEdges(spark, sf0001)
    assert(a eq b, "second call must return the memoized frame")
    val fresh = ops.Analytics.coPurchaseEdgesBuild(spark, sf0001)
      .orderBy("a", "b").collect().map(_.toSeq).toSeq
    val memo = a.orderBy("a", "b").collect().map(_.toSeq).toSeq
    assert(memo === fresh)
    assert(memo.nonEmpty)
  }

  test("coPurchaseEdges memo: a different dir misses (no cross-dir leak)") {
    val a = ops.Analytics.coPurchaseEdges(spark, sf0001)
    val other = ops.Analytics.coPurchaseEdges(spark, "/root/testdata/sf0.01")
    assert(!(a eq other))
    // and the original key still hits afterwards
    assert(ops.Analytics.coPurchaseEdges(spark, sf0001) eq a)
  }

  test("graph consumers plan from the materialized edge RDD, not a lineitem rescan") {
    ops.Analytics.coPurchaseEdges(spark, sf0001) // prime
    val p = ops.Analytics.triangleCount(spark, sf0001)
      .queryExecution.executedPlan.toString()
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    assert(!p.toLowerCase.contains("lineitem"), p)
  }
}
