package graft

import org.apache.spark.sql.functions._

/** Round-11 twenty-second batch: frame-level audio energy over the
  * decoded multimodal column and the inter-arrival distribution — JVM
  * replays (the audio one decoding the real WAV payloads independently)
  * plus the invariants (peak frame RMS bounds the mean; band shares sum
  * to 1; a constant signal's RMS ladder is flat). */
class Round11vSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
  private def micro(x: Double): Long = math.rint(x * 1e6).toLong

  test("mm_audio_energy: frame RMS ladder replicates an independent JVM decode; peak bounds mean") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt))
    def r6hu(x: Double): Double =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val want = docs.map { case (id, nc) =>
      val s = ops.MmAudio.samplesOf(
        ops.MmAudio.Wav(id, ops.MmAudio.synthesize(id, nc)))
      val frames = s.grouped(64).filter(_.length == 64).toArray
      val rms = frames.map { f =>
        r6hu(math.sqrt(f.map(v => v.toLong * v).sum.toDouble / 64)) }
      val pk = rms.zipWithIndex.maxBy { case (r, i) => (r, -i) }._2
      val sm = rms.map(micro).sum
      (id, rms.length.toLong, pk.toLong, rms(pk),
        ((2 * sm + rms.length) / (2L * rms.length)) / 1e6)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("mm_audio_energy")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want)
    got.foreach { g =>
      assert(g._4 >= g._5, s"peak below mean: $g")
      assert(g._2 >= 4L, s"too few frames: $g")
    }
    // kernel anchor: a constant signal has a FLAT ladder — every frame's
    // RMS equals |c|, so peak == mean exactly
    val const = Array.fill(128)(500)
    val cr = const.grouped(64).map(f =>
      r6hu(math.sqrt(f.map(v => v.toLong * v).sum.toDouble / 64))).toSeq
    assert(cr.distinct == Seq(500.0))
  }

  test("ts_interarrival_dist: band table replicates JVM; shares sum to ~1 and bands cover") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = ev.groupBy(_._1).values.flatMap { xs =>
      val s = xs.sortBy(t => (t._2, t._3)).map(_._2)
      s.zip(s.tail).map { case (a, b) => (b - a) / 1000000L }
    }.toSeq
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val idx = (s.length - 1) * p
      val lo = idx.toInt; val frac = idx - lo
      if (lo + 1 < s.length) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo)
    }
    val n = gaps.length.toLong
    val meanS = ((2 * gaps.sum * 1000000L + n) / (2 * n)) / 1e6
    val p50 = r6(pct(gaps.map(_.toDouble), 0.5))
    val p90 = r6(pct(gaps.map(_.toDouble), 0.9))
    def band(g: Long): String =
      if (g < 60) "a_lt_1m" else if (g < 300) "b_1m_5m"
      else if (g < 1800) "c_5m_30m" else if (g < 7200) "d_30m_2h"
      else "e_ge_2h"
    val want = gaps.groupBy(band).toSeq.sortBy(_._1).map { case (b, xs) =>
      val k = xs.length.toLong
      (b, k, ((2 * k * 1000000L + n) / (2 * n)) / 1e6, meanS, p50, p90)
    }
    val got = SparkEntry.queries("ts_interarrival_dist")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want)
    assert(got.map(_._2).sum == n, "band mass")
    val pctSum = got.map(g => micro(g._3)).sum
    assert(math.abs(pctSum - 1000000L) <= got.length,
      s"shares sum to $pctSum ppm-of-1e6")
    assert(p90 >= p50 && p50 >= 0.0)
  }
}
