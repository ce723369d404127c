package graft

import org.apache.spark.sql.functions._

/** Round-11 fourteenth batch: the Jaro–Winkler native expression with
  * its blocked-ER query, and deterministic farthest-first center
  * seeding — kernel unit points from the record-linkage literature,
  * JVM replays over the raw fixture, and the greedy-coverage invariant
  * (picked distances are non-increasing). */
class Round11nSpec extends SparkTestBase {

  import graft.functions.ArrayMath.{dotJvm, round6}
  import graft.functions.JaroWinkler.sim

  test("jaro-winkler kernel: literature reference pairs, symmetry, bounds") {
    // Winkler's canonical examples (also probed against DuckDB's
    // jaro_winkler_similarity — scaladoc at the expression)
    assert(math.abs(sim("martha", "marhta") - 0.9611111111) < 1e-9)
    assert(math.abs(sim("dixon", "dicksonx") - 0.8133333333) < 1e-9)
    assert(math.abs(sim("duane", "dwayne") - 0.84) < 1e-9)
    assert(sim("abc", "abc") == 1.0 && sim("a", "b") == 0.0)
    assert(sim("", "abc") == 0.0 && sim("", "") == 1.0)
    // boost only above the 0.7 threshold: this pair shares a 4-char
    // prefix but has jaro (4/10 + 4/10 + 4/4)/3 = 0.6 — the Winkler
    // bump must NOT fire, so sim stays exactly at the raw jaro
    assert(math.abs(sim("abcdzzzzzz", "abcdyyyyyy") - 0.6) < 1e-12)
    val pairs = Seq(("martha", "marhta"), ("apple pie", "apple tart"),
      ("spring green yellow", "spring yellow green"))
    pairs.foreach { case (a, b) =>
      assert(sim(a, b) == sim(b, a), s"asymmetric on ($a, $b)")
      assert(sim(a, b) >= 0.0 && sim(a, b) <= 1.0)
    }
  }

  test("er_jaro_winkler: blocked fuzzy matches replicate a JVM sweep through the same kernel") {
    val parts = Tables.part(spark, sf0001)
      .select("p_partkey", "p_brand", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val names = parts.groupBy(p => (p._2, p._3)).view
      .mapValues(_.size.toLong).toSeq
      .map { case ((brand, name), n) => (brand, name, n) }
    val want = names.groupBy(_._1).toSeq.flatMap { case (brand, ns) =>
      val s = ns.sortBy(_._2)
      for {
        i <- s.indices; j <- i + 1 until s.length
        jw = round6(sim(s(i)._2, s(j)._2)) if jw >= 0.8
      } yield (brand, s(i)._2, s(j)._2, s(i)._3, s(j)._3, jw)
    }.sortBy(t => (-t._6, t._1, t._2, t._3)).take(20)
    val got = SparkEntry.queries("er_jaro_winkler")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == want)
    assert(got.nonEmpty, "no fuzzy matches at sf0.001")
    // distinct-name grain: no trivial self-matches — every emitted pair
    // is genuinely fuzzy (strictly below 1), yet above the gate
    got.foreach(g => assert(g._6 >= 0.8 && g._6 < 1.0))
  }

  test("ml_farthest_first: greedy picks replicate JVM; coverage radius non-increasing") {
    val em = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double =
      round6(dotJvm(a, a) + dotJvm(b, b) - 2.0 * dotJvm(a, b))
    var centers = Vector((em.head._1, em.head._2, 0.0))
    for (_ <- 1 to 3) {
      val pick = em.map { case (id, v) =>
        (id, centers.map(c => d2(v, c._2)).min)
      }.maxBy { case (id, d) => (d, -id) }
      val emb = em.find(_._1 == pick._1).get._2
      centers = centers :+ ((pick._1, emb, pick._2))
    }
    val want = centers.zipWithIndex.map { case ((id, _, d), r) => (r, id, d) }
    val got = SparkEntry.queries("ml_farthest_first")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want)
    // Gonzalez invariant: each later pick is at most as far out as the
    // previous one (min-dist to a GROWING set can only shrink)
    val ds = got.drop(1).map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, s"radii: $ds")
    assert(ds.head > 0.0, "degenerate corpus: first pick at distance 0")
    // all four picks distinct
    assert(got.map(_._2).distinct.length == 4)
  }
}
