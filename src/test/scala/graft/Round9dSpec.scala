package graft

import org.apache.spark.sql.functions._

/** Round-9: Sorted-Neighborhood ER. */
class Round9dSpec extends SparkTestBase {

  test("SNM equals the in-memory sort+window+jaccard replica (distributed rank exact)") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val ranked = docs.sortBy { case (id, t) => (t, id) }.map(_._1)
    val words = docs.map { case (id, t) =>
      id -> t.split(" ", -1).distinct.toSet
    }.toMap
    val expected = (for {
      i <- ranked.indices
      j <- (i + 1) until math.min(i + 6, ranked.length)
    } yield {
      val (a, b) = (ranked(i), ranked(j))
      val (d1, d2) = (math.min(a, b), math.max(a, b))
      val inter = (words(d1) & words(d2)).size
      val uni = words(d1).size + words(d2).size - inter
      (d1, d2, inter.toLong, uni.toLong)
    }).filter { case (_, _, i2, u) => 10 * i2 >= 9 * u }
      .map { case (d1, d2, i2, u) =>
        (d1, d2, i2, u,
          BigDecimal(i2.toDouble / u.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (d1, d2, _, _, _) => (d1, d2) }
    val got = graft.ops.Er.sortedNeighborhood(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture yields no SNM pairs — window untested")
  }

  test("k-anonymity bands partition the corpus: doc mass conserved, k-math exact") {
    val out = graft.ops.Audit.kAnonymity(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val total = Tables.documents(spark, sf0001).count()
    assert(out.values.map(_._2).sum === total, "band doc mass != corpus")
    // independent replica of the class histogram
    val classes = Tables.documents(spark, sf0001)
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100))
      .groupBy(identity).map(_._2.length)
    def band(k: Int) = if (k < 5) "k<5" else if (k < 20) "5<=k<20" else "k>=20"
    val expected = classes.groupBy(band).map { case (b, ks) =>
      b -> (ks.size.toLong, ks.map(_.toLong).sum)
    }
    assert(out === expected)
  }

  test("table diff statuses reconcile exactly with the mutation constants") {
    val out = graft.ops.Audit.tableDiff(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ids = Tables.events(spark, sf0001).select("event_id").collect()
      .map(_.getLong(0))
    val removed = ids.count(_ % 97 == 0).toLong
    val added = ids.count(_ % 103 == 0).toLong
    val changed = ids.count(id => id % 101 == 0 && id % 97 != 0).toLong
    assert(out("removed") === removed)
    assert(out("added") === added)
    assert(out("changed") === changed)
    assert(out("unchanged") === ids.length - removed - changed)
    assert(out.values.sum === ids.length + added)
  }

  test("seasonal baseline: 24 hour rows, mass conserved, flags consistent with means") {
    val out = graft.ops.Audit.tsSeasonalHourly(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (0 until 24))
    assert(out.map(_._2).sum === Tables.events(spark, sf0001).count())
    // independent replica of the per-hour flag counts
    val ev = Tables.events(spark, sf0001)
      .select(hour(col("ts")), col("value")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1))
    val byH = ev.groupBy(_._1)
    out.foreach { case (h, n, _, nHi) =>
      val vs = byH(h).map(_._2)
      assert(n === vs.length)
      val mean = vs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / vs.length
      assert(nHi === vs.count(_ > mean + 50.0), s"hour $h")
    }
  }

  test("SNM candidate generation is equi-bucketed: no non-equi join node") {
    val plan = graft.ops.Er.sortedNeighborhood(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
