package graft

import org.apache.spark.sql.functions._

/** Round-15 continuation legs for the batch-3 operators: a full JVM
  * replica of the greedy k-center traversal, GSP anti-monotonicity,
  * and decimation cross-checks against the VAD/ZCR fixtures. */
class Round15gSpec extends SparkTestBase {

  private def r6(x: Double): Double =
    BigDecimal.decimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------------- k-center

  test("k-center: JVM greedy replica reproduces all 8 selections and the radius") {
    val embs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    // index-order left fold — the ArrayMath/list_sum parity order
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def d2(a: Array[Double], b: Array[Double]): Double =
      r6(dot(a, a) + dot(b, b) - 2.0 * dot(a, b))
    val byId = embs.toMap
    var sel = Vector((embs.head._1, Option.empty[Double]))
    for (_ <- 2 to 8) {
      val next = embs
        .filter(p => !sel.exists(_._1 == p._1))
        .map(p => (p._1, sel.map(c => d2(p._2, byId(c._1))).min))
        .minBy { case (id, mind) => (-mind, id) }
      sel = sel :+ ((next._1, Some(next._2)))
    }
    val radius = embs
      .map(p => sel.map(c => d2(p._2, byId(c._1))).min).max
    val got = SparkEntry.queries("llm_kcenter_select")(spark, sf0001)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getDouble(3)))
    assert(got.map(_._1).toSeq === sel.map(_._1))
    assert(got.map(_._2).toSeq === sel.map(_._2))
    assert(got.head._3 === radius)
  }

  test("k-center greedy invariants: maximin non-increasing, radius bounded by the last pick") {
    val rows = SparkEntry.queries("llm_kcenter_select")(spark, sf0001)
      .collect().sortBy(_.getLong(0))
    val maximins = rows.drop(1).map(_.getDouble(2)).toSeq
    assert(maximins === maximins.sorted.reverse,
      "farthest-point distances must not increase along the traversal")
    val radius = rows.head.getDouble(3)
    assert(radius <= maximins.last,
      "after the k-th pick the cover radius cannot exceed its maximin")
    assert(radius > 0.0)
  }

  // ------------------------------------------- sequential patterns

  test("GSP anti-monotonicity: every 3-pattern's support <= both of its 2-prefixes/suffixes") {
    val rows = SparkEntry.queries("seq_pattern_support")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val sup2 = rows.filter(_._1 == 2L).map(r => r._2 -> r._3).toMap
    val threes = rows.filter(_._1 == 3L)
    assert(threes.nonEmpty && sup2.nonEmpty)
    threes.foreach { case (_, p, n) =>
      val Array(a, b, c) = p.split(">")
      assert(n <= sup2.getOrElse(s"$a>$b", 0L),
        s"$p support exceeds its prefix")
      assert(n <= sup2.getOrElse(s"$b>$c", 0L),
        s"$p support exceeds its suffix")
    }
  }

  test("GSP support for one pattern replays from the raw event stream") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val want = byUser.count { case (_, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      val purchases = es.filter(_._2 == "purchase").map(_._3)
      views.nonEmpty && purchases.exists(_ > views.min)
    }.toLong
    val got = SparkEntry.queries("seq_pattern_support")(spark, sf0001)
      .where(col("pattern") === "view>purchase").collect()(0).getLong(2)
    assert(got === want)
  }

  // ------------------------------------------------- audio resample

  test("decimation replica: output matches a direct fold over the decoded samples") {
    for (docId <- 0L to 25L) {
      val s = ops.MmAudio.samplesOf(
        ops.MmAudio.Wav(docId, ops.MmVad.synthesize(docId)))
      var peak = 0L; var sumAbs = 0L
      for (j <- 0 until s.length / 2) {
        val y = math.floorDiv(s(2 * j) + s(2 * j + 1), 2).toLong
        peak = math.max(peak, math.abs(y)); sumAbs += math.abs(y)
      }
      val r = ops.MmResample.resampleOf(docId)
      assert((r.peak_out, r.sum_abs_out) === ((peak, sumAbs)), s"doc $docId")
      assert(r.n_out === 4000L)
    }
  }

  test("decimation cross-checks VAD: sum_abs_out = n_speech * 80 * amplitude") {
    for (docId <- 0L to 25L) {
      val vad = ops.MmVad.vadOf(docId)
      val amp = 500L + 100L * (docId % 30 % 10)
      val r = ops.MmResample.resampleOf(docId)
      assert(r.sum_abs_out === vad.n_speech * 80L * amp, s"doc $docId")
      assert(r.peak_out === (if (vad.n_speech > 0) amp else 0L))
    }
  }
}
