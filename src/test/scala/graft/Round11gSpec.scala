package graft

import org.apache.spark.sql.functions._

/** Round-11 seventh batch: key-skew profiler and rolling-7-day WAU —
  * JVM replays plus definitional invariants (p99 covers ≥99% of keys,
  * WAU ≥ DAU, stickiness ∈ (0, 1]). */
class Round11gSpec extends SparkTestBase {

  private def r6(x: Double): Double =
    BigDecimal.decimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("profile_key_skew: counts/p99/salt replicate JVM") {
    val users = Tables.events(spark, sf0001).select("user_id").collect()
      .map(_.getLong(0))
    val perKey = users.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nKeys = perKey.size.toLong
    val nRows = users.length.toLong
    val maxC = perKey.values.max
    val sortedC = perKey.values.toSeq.sorted
    val p99 = sortedC((math.ceil(nKeys * 99 / 100.0).toInt - 1).max(0))
    // p99 as implemented: smallest c whose cumulative key coverage
    // reaches 99% — replicate via the value-grouped cumulative
    val byC = perKey.values.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    var cum = 0L
    val p99c = byC.collectFirst {
      case (c, k) if { cum += k; cum * 100 >= nKeys * 99 } => c
    }.get
    val avg = r6(nRows.toDouble / nKeys.toDouble)
    val skew = r6(maxC.toDouble / avg)
    val salt = math.ceil(maxC.toDouble / avg).toLong
    val top = perKey.toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val got = SparkEntry.queries("profile_key_skew")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6),
        r.getDouble(7), r.getLong(8)))
    assert(got.map(g => (g._1, g._2)).toSeq == top)
    got.foreach { g =>
      assert(g._3 == nKeys && g._4 == nRows && g._5 == avg)
      assert(g._6 == p99c && g._7 == maxC && g._8 == skew && g._9 == salt)
    }
    assert(p99c <= maxC && p99 <= maxC) // definitional sanity
  }

  test("dau_rolling_7d: window expansion replicates JVM; WAU >= DAU and stickiness in (0,1]") {
    val du = Tables.events(spark, sf0001).select("user_id", "ts").collect()
      .map { r =>
        val t = r.getTimestamp(1)
        val us = t.getTime / 1000 * 1000000L + t.getNanos / 1000
        (us / 86400000000L, r.getLong(0))
      }.distinct
    val maxDay = du.map(_._1).max
    val dau = du.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val wau = du.flatMap { case (d, u) => (d to math.min(d + 6, maxDay))
      .map(t => (t, u)) }.distinct
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val want = dau.keys.toSeq.sorted.map { d =>
      (d, dau(d), wau(d), r6(dau(d).toDouble / wau(d).toDouble)) }
    val got = SparkEntry.queries("dau_rolling_7d")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == want, s"\n got ${got.take(3).toSeq}…\nwant ${want.take(3)}…")
    got.foreach { g =>
      assert(g._3 >= g._2, "7-day WAU can never be below the day's DAU")
      assert(g._4 > 0.0 && g._4 <= 1.0)
    }
  }
}
