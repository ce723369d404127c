package graft

import org.apache.spark.sql.functions._

/** Round-11 seventeenth batch: CCNet perplexity tertile bucketing and
  * two-hop reach — JVM replays plus the partition invariants (tertile
  * buckets cover every doc exactly once with head ≤ middle ≤ tail mean
  * perplexity; reach₂ ≥ degree with equality iff no genuine second
  * hop). */
class Round11qSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("llm_ccnet_ppl_buckets: tertile panel replicates JVM; buckets partition each language") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val allWords = docs.flatMap(_._3.split(" ", -1))
    val freq = allWords.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = allWords.length.toLong
    def micro(x: Double): Long = math.rint(x * 1e6).toLong
    val perDoc = docs.map { case (_, lang, text) =>
      val ws = text.split(" ", -1)
      val s = ws.map(w => micro(math.log(freq(w).toDouble / t))).sum / 1e6
      (lang, r6(math.exp(-(s / ws.length))))
    }
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val idx = (s.length - 1) * p
      val lo = idx.toInt
      val frac = idx - lo
      r6(if (lo + 1 < s.length) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo))
    }
    val want = perDoc.groupBy(_._1).toSeq.flatMap { case (lang, xs) =>
      val ppl = xs.map(_._2).toSeq
      val t1 = pct(ppl, 1.0 / 3); val t2 = pct(ppl, 2.0 / 3)
      ppl.groupBy(p => if (p <= t1) "head" else if (p <= t2) "middle"
        else "tail")
        .toSeq.map { case (b, ps) =>
          (lang, b, ps.length.toLong,
            r6(ps.map(micro).sum / 1e6 / ps.length), t1, t2)
        }
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("llm_ccnet_ppl_buckets")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want)
    // buckets PARTITION each language and means order head ≤ mid ≤ tail
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum == docs.count(_._2 == lang), s"$lang mass")
      val byB = rows.map(r => r._2 -> r._4).toMap
      assert(byB("head") <= byB("middle") && byB("middle") <= byB("tail"),
        s"$lang bucket means out of order: $byB")
    }
  }

  test("graph_two_hop_reach: hub-capped reach replicates JVM; reach >= degree always") {
    // sf0.001's 200-part graph is DENSE (degrees up to 51), so the
    // round-12 hub cap (32) genuinely fires here — the replica mirrors
    // the h48-lowest fanout truncation bit-for-bit
    val cap = 32
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e, (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val fan = adj.map { case (m, nbrs) =>
      m -> (if (nbrs.size <= cap) nbrs
        else nbrs.toSeq.sortBy(y => (Tables.h48jvm(s"$m:$y"), y))
          .take(cap).toSet)
    }
    val want = adj.toSeq.map { case (a, nbrs) =>
      val reach = (nbrs ++ nbrs.flatMap(fan(_))) - a
      (a, nbrs.size.toLong, reach.size.toLong,
        r6(reach.size.toDouble / nbrs.size.toDouble),
        nbrs.count(adj(_).size > cap).toLong)
    }.sortBy(x => (-x._3, x._1)).take(20)
    val got = SparkEntry.queries("graph_two_hop_reach")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == want)
    got.foreach(g => assert(g._3 >= g._2, s"reach below degree: $g"))
    // expansion genuinely fires somewhere (a 2-hop neighborhood larger
    // than the 1-hop one exists on the fixture)
    assert(got.exists(g => g._3 > g._2), "no node expands at 2 hops")
    // the cap genuinely fires on this fixture: hub-adjacent rows exist
    assert(got.exists(_._5 > 0L), "hub cap never fired at sf0.001 — " +
      "the truncation path is untested here")
  }
}
