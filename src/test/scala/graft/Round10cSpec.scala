package graft

import org.apache.spark.sql.functions._

/** Round-10 third batch: inverted index, PMI collocations, Markov
  * transitions, market-basket lift — each replayed from first
  * principles in JVM over the raw fixture. */
class Round10cSpec extends SparkTestBase {

  private lazy val docWords: Array[(Long, Array[String])] =
    Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))

  test("llm_inverted_index: df/ctf/postings replicate; postings ascend; top-20 by ctf") {
    val rows = SparkEntry.queries("llm_inverted_index")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(rows.length == 20)
    assert(rows.map(_._3).sliding(2).forall(p => p.head >= p.last),
      "not sorted by collection tf desc")
    // replicate the top term's full posting list
    val (term, df, ctf, postings) = rows.head
    val tf = docWords.map { case (id, ws) => id -> ws.count(_ == term) }
      .filter(_._2 > 0).sortBy(_._1)
    assert(df == tf.length && ctf == tf.map(_._2.toLong).sum)
    assert(postings == tf.map { case (d, t) => s"$d:$t" }.mkString(","))
  }

  test("llm_pmi_collocations: PMI replicates for the top pair; support floor holds") {
    val rows = SparkEntry.queries("llm_pmi_collocations")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.length == 20 && rows.forall(_._2 >= 5L))
    val pairs = docWords.flatMap(_._2.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val (bg, cab, cl, cr, pmi) = rows.head
    val Array(a, b) = bg.split(" ")
    assert(cab == pairs.count(_ == ((a, b))))
    assert(cl == pairs.count(_._1 == a) && cr == pairs.count(_._2 == b))
    val want = math.log(cab.toDouble * pairs.length / (cl.toDouble * cr))
    assert(math.abs(pmi - math.rint(want * 1e6) / 1e6) < 1e-9)
  }

  test("markov_event_transitions: rows per from_type sum to ~1; counts conserve transitions") {
    val rows = SparkEntry.queries("markov_event_transitions")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val byFrom = rows.groupBy(_._1)
    byFrom.foreach { case (f, rs) =>
      val psum = rs.map(_._4).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$f row sums to $psum") }
    // total transitions = total events - distinct users (one start each)
    val nEvents = Tables.events(spark, sf0001).count()
    val nUsers = Tables.events(spark, sf0001).select("user_id").distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers)
  }

  test("ab_test_ztest: z replicates from raw events; A/A control quiet, planted effect fires") {
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def armOf(u: Long) = Math.floorMod(Tables.h48jvm(u.toString), 2L)
    def z(nA: Long, xA: Long, nB: Long, xB: Long): Double = {
      val (pa, pb) = (xA.toDouble / nA, xB.toDouble / nB)
      val pp = (xA + xB).toDouble / (nA + nB)
      (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / nA + 1.0 / nB))
    }
    val byUser = ev.groupBy(_._1).toSeq.map { case (u, rs) =>
      (armOf(u), rs.collect { case (_, "purchase", v) => v }
        .foldLeft(Double.MinValue)(math.max) > 180.0)
    }
    val (ua, ub) = byUser.partition(_._1 == 0)
    val zConv = z(ua.size, ua.count(_._2), ub.size, ub.count(_._2))
    val evArm = ev.map { case (u, _, v) =>
      val a = armOf(u); (a, v + (if (a == 0) 30.0 else 0.0) > 200.0) }
    val (ea, eb) = evArm.partition(_._1 == 0)
    val zExc = z(ea.size, ea.count(_._2), eb.size, eb.count(_._2))
    val got = SparkEntry.queries("ab_test_ztest")(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(7), r.getBoolean(8))).toMap
    assert(math.abs(got("high_value_buyer")._1 -
      math.rint(zConv * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got("exceed_planted")._1 -
      math.rint(zExc * 1e6) / 1e6) < 1e-9)
    assert(!got("high_value_buyer")._2, "A/A control came out significant")
    assert(got("exceed_planted")._2, "planted uplift not detected")
  }

  test("cohort_retention_matrix: offset-0 identity, size conservation, JVM replica of a row") {
    val rows = SparkEntry.queries("cohort_retention_matrix")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // offset 0: the cohort is by definition fully active on its own day
    rows.filter(_._2 == 0).foreach { r =>
      assert(r._3 == r._4 && r._5 == 1.0, s"offset-0 violated: $r") }
    // cohort sizes partition the user base
    val nUsers = Tables.events(spark, sf0001).select("user_id").distinct().count()
    assert(rows.filter(_._2 == 0).map(_._3).sum == nUsers)
    rows.foreach(r => assert(r._5 > 0.0 && r._5 <= 1.0))
    // replicate one non-trivial cell from raw events
    val act = Tables.events(spark, sf0001)
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val firstOf = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val dayMs = 86400000L
    val (cohortStr, off, _, nAct, _) = rows.find(r => r._2 > 0).get
    val cells = act.count { case (u, d) =>
      val c = firstOf(u)
      java.time.Instant.ofEpochMilli(c).toString.startsWith(cohortStr) &&
        (d - c) / dayMs == off.toLong }
    assert(cells.toLong == nAct, s"cell ($cohortStr, $off): $cells vs $nAct")
  }

  test("rfm_segments: cells partition the base; per-dimension scores quarter; spend conserved") {
    val rows = SparkEntry.queries("rfm_segments")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getDouble(5)))
    val nCust = Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._5).sum == nCust, "segment cells don't partition the base")
    // quartile scoring: each dimension's marginal is 4 non-degenerate
    // buckets, none holding more than ~half the base (exact quarters are
    // impossible with ties; a collapsed boundary would show as ≥ 50%)
    Seq[((String, Int, Int, Int, Long, Double)) => Int](_._2, _._3, _._4)
      .zipWithIndex.foreach { case (dim, i) =>
        val marg = rows.groupBy(dim).view.mapValues(_.map(_._5).sum).toMap
        assert(marg.keySet == Set(1, 2, 3, 4), s"dim $i scores: ${marg.keySet}")
        marg.values.foreach(v =>
          assert(v <= nCust * 55 / 100, s"dim $i bucket holds $v of $nCust")) }
    // total spend conservation against a raw decimal replica
    val want = Tables.orders(spark, sf0001).select("o_custkey", "o_totalprice")
      .collect().groupBy(_.getLong(0)).toSeq
      .map(_._2.map(r => BigDecimal(r.getDouble(1)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .map(_.toDouble).sum
    assert(math.abs(rows.map(_._6).sum - want) < 1e-3)
  }

  test("agg_winsorized_stats: clip fraction ~2%, winsorized mean replicates for one type") {
    val rows = SparkEntry.queries("agg_winsorized_stats")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    val n = rows.map(_._2).sum
    val clipped = rows.map(r => r._3 + r._4).sum
    assert(clipped > 0, "no rows clipped — winsorization unexercised")
    assert(clipped.toDouble / n < 0.03, s"clip fraction ${clipped.toDouble / n}")
    // JVM replica: global [p1, p99] then one type's winsorized mean
    val vals = Tables.events(spark, sf0001).select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def pct(xs: Seq[Double], q: Double): Double = {
      val s = xs.sorted
      val pos = (s.size - 1) * q
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      math.rint((lo + (pos - pos.toInt) * (hi - lo)) * 1e6) / 1e6
    }
    val (lo, hi) = (pct(vals.map(_._2), 0.01), pct(vals.map(_._2), 0.99))
    val (tpe, _, cl, ch, _, mw) = rows.head
    val mine = vals.filter(_._1 == tpe).map(_._2)
    assert(cl == mine.count(_ < lo) && ch == mine.count(_ > hi))
    val wsum = mine.map(v => BigDecimal(math.max(lo, math.min(hi, v)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(math.abs(mw - math.rint(wsum / mine.size * 1e6) / 1e6) < 2e-6,
      s"$tpe winsorized mean: $mw")
  }

  test("session_top_paths: top path count replicates against a from-scratch sessionizer") {
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3)))
    def us(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val grams = ev.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val ordered = rs.sortBy(e => (us(e._4), e._2))
      // split into 2h-gap sessions, then per-session type 3-grams
      val sessions = ordered.foldLeft(Vector.empty[Vector[(Long, String)]]) {
        case (acc, e) =>
          val t = us(e._4)
          if (acc.nonEmpty && t - acc.last.last._1 <= 7200000000L)
            acc.init :+ (acc.last :+ (t, e._3))
          else acc :+ Vector((t, e._3))
      }
      sessions.flatMap(_.map(_._2).sliding(3).filter(_.size == 3)
        .map(_.mkString(">")))
    }
    val got = SparkEntry.queries("session_top_paths")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == 10)
    val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (p, n) =>
      assert(counts(p) == n, s"path $p: ${counts(p)} vs $n") }
    // the emitted top-10 really is the top of the full distribution
    val floor = got.map(_._2).min
    assert(counts.values.count(_ > floor) < 10,
      "a path outside the top-10 outranks an emitted one")
  }

  test("trending_decayed_parts: scores are exact binary fractions; JVM replica matches bit-for-bit") {
    val rows = SparkEntry.queries("trending_decayed_parts")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 20)
    // every score is a multiple of 2^-40 — the no-pow design's whole point
    rows.foreach { case (p, _, s) =>
      val scaled = s * math.pow(2, 40)
      assert(scaled == math.rint(scaled), s"part $p score $s not exact") }
    // bit-exact JVM replica of the top part from raw tables
    val maxD = Tables.orders(spark, sf0001)
      .agg(max(col("o_orderdate"))).collect().head.getTimestamp(0).getTime
    val odate = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    val (topPart, topN, topScore) = rows.head
    val terms = Tables.lineitem(spark, sf0001)
      .where(col("l_partkey") === topPart)
      .select("l_orderkey").collect().map(_.getLong(0))
      .map { ok =>
        val weeks = math.min(((maxD - odate(ok)) / 86400000L / 7).toInt, 40)
        1.0 / (1L << weeks)
      }
    assert(terms.length.toLong == topN)
    assert(terms.sum == topScore, s"replica ${terms.sum} vs $topScore")
  }

  test("concentration_revenue: masses replicate from raw orders; shares consistent") {
    val r = SparkEntry.queries("concentration_revenue")(spark, sf0001)
      .collect().head
    val per = Tables.orders(spark, sf0001)
      .select("o_custkey", "o_totalprice").collect()
      .groupBy(_.getLong(0)).toSeq
      .map(_._2.map(x => BigDecimal(x.getDouble(1)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Long]("n_customers") == per.size)
    assert(math.abs(r.getAs[Double]("total_rev") - per.sum) < 1e-3)
    val p90 = r.getAs[Double]("p90")
    val top = per.filter(_ > p90)
    assert(r.getAs[Long]("n_top") == top.size)
    assert(math.abs(r.getAs[Double]("top_rev") - top.sum) < 1e-3)
    assert(r.getAs[Double]("max_rev") == per.max)
    // ~10% of customers above an interpolated p90, and shares ordered
    assert(top.size <= per.size / 5 && top.size >= per.size / 20)
    assert(r.getAs[Double]("top_share") > r.getAs[Double]("max_share"))
    assert(r.getAs[Double]("top_share") > 0.1, "decile share implausibly low")
  }

  test("basket_lift_pairs: top pair's support and lift replicate; basket size bounds pair work") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val maxBasket = byOrder.values.map(_.size).max
    assert(maxBasket <= 16, s"basket size $maxBasket — pair-gen bound broken")
    val rows = SparkEntry.queries("basket_lift_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.length == 20 && rows.forall(_._3 >= 2L))
    val (pa, pb, nab, na, nb, lift) = rows.head
    assert(nab == byOrder.values.count(s => s(pa) && s(pb)))
    assert(na == byOrder.values.count(_(pa)) && nb == byOrder.values.count(_(pb)))
    val want = nab.toDouble * byOrder.size / (na.toDouble * nb)
    assert(math.abs(lift - math.rint(want * 1e6) / 1e6) < 1e-9)
  }
}
