package graft

import org.apache.spark.sql.functions._

/** Round-11 thirteenth batch: Matryoshka truncation-recall audit and
  * binary-segmentation changepoint location — JVM replays plus the
  * structural fixed points (recall of the full ranking against itself
  * is 1; a clean step series splits exactly at the step). */
class Round11mSpec extends SparkTestBase {

  import graft.functions.ArrayMath.{dotJvm, round6}

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("llm_matryoshka_recall: overlap replicates JVM; self-recall kernel is exactly 1") {
    val em = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def top10(qid: Long, qv: Array[Double], dims: Int): Seq[Long] = {
      val q = qv.take(dims)
      val qn = math.sqrt(dotJvm(q, q))
      em.filter(_._1 != qid).map { case (id, v) =>
        val c = v.take(dims)
        (round6(dotJvm(q, c) / (qn * math.sqrt(dotJvm(c, c)))), id)
      }.sortBy(t => (-t._1, t._2)).take(10).map(_._2).toSeq
    }
    val queries = em.filter(_._1 < 10)
    val want = queries.map { case (qid, qv) =>
      val hit = top10(qid, qv, 16).toSet
        .intersect(top10(qid, qv, 64).toSet).size.toLong
      (qid, hit, r6(hit.toDouble / 10.0))
    }
    val meanWant = r6(want.map(_._2).sum.toDouble / (want.length * 10).toDouble)
    val got = SparkEntry.queries("llm_matryoshka_recall")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == want.toSeq)
    got.foreach(g => assert(g._4 == meanWant))
    // the audit must be informative on the fixture: truncation loses
    // SOMETHING somewhere, but the rankings are far from independent
    assert(got.exists(_._2 < 10), "16-dim ranking identical to 64-dim?")
    assert(meanWant > 0.2, s"suspiciously low recall $meanWant")
    // kernel fixed point: full dims vs full dims is the same ranking
    queries.foreach { case (qid, qv) =>
      assert(top10(qid, qv, 64) == top10(qid, qv, 64))
      assert(top10(qid, qv, 64).toSet.intersect(
        top10(qid, qv, 64).toSet).size == 10)
    }
  }

  test("ts_changepoint_binseg: gains replicate JVM; a clean step splits exactly at the step") {
    def micro(x: Double): Long = math.rint(x * 1e6).toLong
    def splits(ys: Seq[(String, Double)]): Seq[(String, Long, Long, Double, Double, Double)] = {
      val n = ys.length
      val sn = ys.map(t => micro(t._2)).sum / 1e6
      (1 until n).map { k =>
        val sk = ys.take(k).map(t => micro(t._2)).sum / 1e6
        val gain = sk * sk / k + (sn - sk) * (sn - sk) / (n - k).toDouble -
          sn * sn / n
        (ys(k - 1)._1, k.toLong, (n - k).toLong,
          r6(sk / k), r6((sn - sk) / (n - k)), r6(gain))
      }.sortBy(t => (-t._6, t._1)).take(3)
    }
    val daily = Tables.orders(spark, sf0001)
      .select(col("o_orderdate").cast("date").cast("string"),
        col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, xs) =>
        (d, r6(xs.map(x => micro(x._2)).sum / 1e6 / 1e6)) }
    val want = splits(daily)
    val got = SparkEntry.queries("ts_changepoint_binseg")(spark, sf0001)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want)
    assert(got.head._6 >= got(1)._6 && got(1)._6 >= got(2)._6)
    // kernel fixed point: a clean level shift maximizes gain at the step
    val step = (1 to 40).map(i =>
      (f"2020-01-$i%02d", if (i <= 25) 1.0 else 3.0))
    assert(splits(step).head._1 == "2020-01-25")
    assert(splits(step).head._4 == 1.0 && splits(step).head._5 == 3.0)
  }
}
