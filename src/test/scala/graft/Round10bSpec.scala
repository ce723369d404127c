package graft

import org.apache.spark.sql.functions._

/** Round-10 continuation: the KMV/bottom-k distinct sketch (L193) —
  * partition invariance, independent JVM replica, estimator algebra,
  * set-operation consistency — and the declarative expectation-suite
  * audit (L194) — single-scan compilation, verdict correctness. */
class Round10bSpec extends SparkTestBase {

  test("dq_expectations: one scan per table, real violations counted, verdicts exact") {
    val df = SparkEntry.queries("dq_expectations")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the suite's claim: N verdicts for one fact scan per table — the
    // whole 10-expectation report reads orders, lineitem, customer ONCE
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 3, s"expected 3 parquet scans (orders/lineitem/customer), got $scans:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan) // RI rides the dim broadcast
    val rows = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.length == 10)
    rows.foreach { case (_, _, v, _, passed) => assert(passed == (v == 0L)) }
    val nOrders = Tables.orders(spark, sf0001).count()
    val nLi = Tables.lineitem(spark, sf0001).count()
    rows.foreach { case (tbl, _, _, n, _) =>
      assert(n == (if (tbl == "orders") nOrders else nLi)) }
    // the deliberately-failing check counts REAL violations, verified
    // independently; every other expectation passes on the fixture
    val wantBad = Tables.orders(spark, sf0001)
      .where(col("o_totalprice") > 400000.0).count()
    assert(wantBad > 0, "fixture lost its >400k orders — failing check no longer fails")
    val bad = rows.filter(!_._5)
    assert(bad.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("orders", "in_range(o_totalprice)", wantBad)))
  }

  private def custA = Tables.orders(spark, sf0001)
    .where(col("o_orderpriority").startsWith("1"))
    .select(col("o_custkey"))

  test("KMV sketch is partition-invariant: partial/merge ≡ one-partition build") {
    // The merge (dedup, keep k smallest) must be associative+commutative
    // so ObjectHashAggregate's partial/final split — and the streaming
    // cross-micro-batch merge — is exact at any task layout.
    def sk(parts: Int): Seq[Long] = custA.repartition(parts)
      .agg(functions.Kmv.sketch(
        Tables.h48(col("o_custkey").cast("string")), 16).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(sk(1) == sk(13))
    val agg = custA.agg(functions.Kmv.sketch(
      Tables.h48(col("o_custkey").cast("string")), 16).as("sk"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("graft_kmv"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
  }

  test("KMV sketch equals the bottom-k of distinct h48, ascending; duplicates dedup") {
    val keys = custA.collect().map(_.getLong(0))
    assert(keys.length > keys.distinct.length,
      "fixture slice has no duplicate custkeys — dedup not exercised")
    val want = keys.distinct.map(k => Tables.h48jvm(k.toString)).sorted.take(16).toSeq
    val got = custA.agg(functions.Kmv.sketch(
      Tables.h48(col("o_custkey").cast("string")), 16).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(got == want)
    // below-k group: the sketch IS the complete distinct hash set
    val tiny = custA.limit(5)
    val tinyKeys = tiny.collect().map(_.getLong(0)).distinct
    val gotTiny = tiny.agg(functions.Kmv.sketch(
      Tables.h48(col("o_custkey").cast("string")), 16).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(gotTiny == tinyKeys.map(k => Tables.h48jvm(k.toString)).sorted.toSeq)
  }

  test("KMV estimator: exact below k, (k-1)*2^48 div h_(k) at k; non-long input refused") {
    val s = spark
    import s.implicits._
    val n = 500
    val hashes = (1 to n).map(i => Tables.h48jvm(s"item$i"))
    val df = hashes.toDF("h")
    val k = 64
    val est = df.agg(functions.Kmv.sketch(col("h"), k).as("sk"))
      .selectExpr(functions.Kmv.estimateSql("sk", k) + " AS est")
      .collect().head.getLong(0)
    val hk = hashes.distinct.sorted.apply(k - 1)
    assert(est == (k - 1).toLong * (1L << 48) / hk)
    // within 3 rsd of the true 500 (deterministic given the hash set)
    assert(math.abs(est - n) <= 3.0 * n / math.sqrt(k - 2), s"est=$est")
    // exact path below k
    val estSmall = df.limit(20).agg(functions.Kmv.sketch(col("h"), k).as("sk"))
      .selectExpr(functions.Kmv.estimateSql("sk", k) + " AS est")
      .collect().head.getLong(0)
    assert(estSmall == 20L)
    intercept[Exception] {
      df.agg(functions.Kmv.sketch(col("h").cast("string"), k)).collect()
    }
  }

  test("KMV union algebra: bottom-k of merged sketches == sketch of the union") {
    val s = spark
    import s.implicits._
    val k = 32
    val a = (1 to 300).map(i => s"u$i")
    val b = (200 to 500).map(i => s"u$i") // genuine partial overlap
    def skOf(xs: Seq[String]): Seq[Long] =
      xs.toDF("x").agg(functions.Kmv.sketch(Tables.h48(col("x")), k).as("sk"))
        .collect().head.getSeq[Long](0)
    val merged = (skOf(a) ++ skOf(b)).distinct.sorted.take(k)
    assert(merged == skOf((a ++ b).distinct))
  }

  test("llm_stupid_backoff: rung counts and scores match a from-scratch JVM replica; all rungs fire") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val train = docs.filter(_._1 >= 100).map(_._2)
    val uni = train.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = train.map(_.size).sum.toDouble
    def grams(n: Int) = train.flatMap(ws =>
      ws.sliding(n).filter(_.size == n).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (bi, tri) = (grams(2), grams(3))
    var (nTri, nBoBi, nBoUni) = (0L, 0L, 0L)
    val avg = docs.filter(_._1 < 100).map { case (id, ws) =>
      val scores = ws.indices.map { i =>
        val cur = ws(i)
        val p1 = if (i >= 1) Some(ws(i - 1)) else None
        val p2 = if (i >= 2) Some(ws(i - 2)) else None
        val triKey = p2.flatMap(a => p1.map(b => s"$a $b $cur"))
        val biKey = p1.map(b => s"$b $cur")
        val sUni = uni.get(cur).map(_ / t).getOrElse(1.0 / t)
        triKey.flatMap(tri.get) match {
          case Some(c3) =>
            nTri += 1
            math.log(c3.toDouble / bi(s"${p2.get} ${p1.get}").toDouble)
          case None => biKey.flatMap(bi.get) match {
            case Some(c2) =>
              if (p2.isDefined) nBoBi += 1
              math.log((if (p2.isDefined) 0.4 else 1.0) *
                (c2.toDouble / uni(p1.get).toDouble))
            case None =>
              if (p1.isDefined) nBoUni += 1
              math.log((if (p2.isDefined) 0.4 else 1.0) *
                ((if (p1.isDefined) 0.4 else 1.0) * sUni))
          }
        }
      }
      id -> (math.floor(scores.map(s => math.rint(s * 1e6) / 1e6).sum /
        scores.size * 1e6 + 0.5) / 1e6, scores.size.toLong)
    }.toMap
    val got = SparkEntry.queries("llm_stupid_backoff")(spark, sf0001).collect()
    assert(got.length == avg.size)
    var (gTri, gBoBi, gBoUni) = (0L, 0L, 0L)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_tokens") == avg(id)._2)
      assert(math.abs(r.getAs[Double]("avg_logprob") - avg(id)._1) < 2e-6,
        s"doc $id: ${r.getAs[Double]("avg_logprob")} vs ${avg(id)._1}")
      gTri += r.getAs[Long]("n_tri_hit")
      gBoBi += r.getAs[Long]("n_bo_bi")
      gBoUni += r.getAs[Long]("n_bo_uni")
    }
    assert((gTri, gBoBi, gBoUni) == ((nTri, nBoBi, nBoUni)))
    assert(nTri > 0 && nBoBi > 0,
      s"backoff recursion not exercised: tri=$nTri bo_bi=$nBoBi")
  }

  test("funnel_time_to_convert: deltas and interpolated percentiles match a JVM replica") {
    val perUser = Tables.events(spark, sf0001)
      .select("user_id", "event_type", "ts").collect()
      .groupBy(_.getLong(0)).map { case (_, rs) =>
        // full-µs epoch (getTime alone truncates to ms — the fixture is
        // µs-precision, the Streams.microsOf lesson)
        def us(t: java.sql.Timestamp): Long =
          math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        def first(tp: String) = rs.filter(_.getString(1) == tp)
          .map(r => us(r.getTimestamp(2))).sorted.headOption
        (first("view"), first("click"), first("purchase"))
      }.toSeq
    def pct(xs: Seq[Long], q: Double): Double = {
      val s = xs.sorted.map(_.toDouble)
      val pos = (s.size - 1) * q
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val vcDeltas = perUser.collect {
      case (Some(v), Some(c), _) if c > v => c - v }
    val cpUsers = perUser.collect {
      case (Some(v), Some(c), Some(p)) if c > v && p > c => (p - c, p - v) }
    val got = SparkEntry.queries("funnel_time_to_convert")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("1_view_to_click")._1 == vcDeltas.size)
    assert(got("2_click_to_purchase")._1 == cpUsers.size)
    assert(got("3_view_to_purchase")._1 == cpUsers.size)
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-5
    assert(close(got("1_view_to_click")._2, pct(vcDeltas, 0.5) / 1e6))
    assert(close(got("1_view_to_click")._3, pct(vcDeltas, 0.9) / 1e6))
    assert(close(got("2_click_to_purchase")._2, pct(cpUsers.map(_._1), 0.5) / 1e6))
    assert(close(got("3_view_to_purchase")._3, pct(cpUsers.map(_._2), 0.9) / 1e6))
    assert(vcDeltas.nonEmpty && cpUsers.nonEmpty)
  }

  test("llm_text_normalize: every mutation class fires and every doc recovers exactly") {
    val r = SparkEntry.queries("llm_text_normalize")(spark, sf0001).collect().head
    val n = Tables.documents(spark, sf0001).count()
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("n_recovered") == n, "normalization failed to invert the dirtying")
    assert(r.getAs[Boolean]("h_sum_match"))
    assert(r.getAs[Long]("chars_dirty") > r.getAs[Long]("chars_norm"))
    // each dirtying rule must have a live, genuinely-mutating population
    val ids = Tables.documents(spark, sf0001).select("doc_id")
      .collect().map(_.getLong(0))
    Seq(3, 5, 7, 11).foreach { m =>
      assert(ids.exists(_ % m == 0), s"no doc exercises the mod-$m rule") }
    assert(r.getAs[Long]("n_mutated") >= ids.count(i =>
      i % 3 == 0 || i % 5 == 0 || i % 7 == 0) &&
      r.getAs[Long]("n_mutated") <= ids.count(i =>
        i % 3 == 0 || i % 5 == 0 || i % 7 == 0 || i % 11 == 0))
  }

  test("llm_random_projection: JL distortion concentrates, sign matrix replicates, JVM projection agrees") {
    val rows = SparkEntry.queries("llm_random_projection")(spark, sf0001)
      .collect().map(r => (r.getAs[Double]("d2_orig"),
        r.getAs[Double]("d2_proj"), r.getAs[Double]("ratio"),
        r.getAs[Boolean]("in_band")))
    assert(rows.length == 50)
    // E[ratio] = 1 exactly under ±1 signs; spread χ²(16)/16 ⇒ the mean
    // of 50 draws sits within ~3σ/√50 of 1 for any reasonable fixture
    val mean = rows.map(_._3).sum / rows.length
    assert(mean > 0.8 && mean < 1.2, s"mean distortion ratio $mean")
    assert(rows.count(_._4) >= 45, "JL concentration failed the 4-sigma band")
    // the sign matrix is pure h48 parity — replicate it and one full
    // projection in JVM from first principles
    def sign(i: Int, j: Int): Double =
      (Math.floorMod(Tables.h48jvm(s"$i:$j"), 2L) * 2L - 1L).toDouble
    val (va, ya) = {
      val r = Tables.embeddings(spark, sf0001).where(col("vec_id") === 0)
        .select("embedding").collect().head.getSeq[Float](0)
      val y = (1 to 16).map(j => 0.25 *
        (1 to 64).foldLeft(0.0)((acc, i) => acc + sign(i, j) * r(i - 1).toDouble))
      (r, y)
    }
    val yGot = ops.Llm5.randomProjection(spark, sf0001) // re-derive proj via d2
    assert(va.length == 64 && ya.length == 16 && yGot.columns.length == 5)
    // cross-check through the emitted distances: pair 0 = (vec0, vec1)
    val xb = Tables.embeddings(spark, sf0001).where(col("vec_id") === 1)
      .select("embedding").collect().head.getSeq[Float](0)
    val yb = (1 to 16).map(j => 0.25 *
      (1 to 64).foldLeft(0.0)((acc, i) => acc + sign(i, j) * xb(i - 1).toDouble))
    val d2p = (0 until 16).foldLeft(0.0)((acc, j) =>
      acc + (ya(j) - yb(j)) * (ya(j) - yb(j)))
    assert(math.abs(rows.head._2 - math.rint(d2p * 1e6) / 1e6) < 2e-6,
      s"pair-0 projected distance: spark=${rows.head._2} jvm=$d2p")
  }

  test("drift_psi_length: PSI matches a JVM replica, alarm fires, mass conserved") {
    val rows = SparkEntry.queries("drift_psi_length")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_base"),
        r.getAs[Long]("n_curr"), r.getAs[Double]("term"),
        r.getAs[Double]("psi"), r.getAs[Boolean]("drift")))
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // both histograms see every doc exactly once
    assert(rows.map(_._2).sum == docs.length && rows.map(_._3).sum == docs.length)
    // independent replica of both histograms and the smoothed PSI
    def bucket(n: Long) = math.min(n / 100, 9L)
    val base = docs.groupBy(d => bucket(d._2)).view.mapValues(_.size.toLong).toMap
    val curr = docs.groupBy(d => bucket(d._2 +
      (if (d._1 % 2 == 0) 150 else 0))).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (b, nb, nc, term, _, _) =>
      assert(nb == base.getOrElse(b, 0L) && nc == curr.getOrElse(b, 0L))
      val p = (nb + 1).toDouble / (docs.length + 10)
      val q = (nc + 1).toDouble / (docs.length + 10)
      assert(math.abs(term - math.rint((p - q) * math.log(p / q) * 1e6) / 1e6)
        < 1e-9, s"bucket $b term")
    }
    val psi = rows.map(r => math.rint(r._4 * 1e6) / 1e6).sum
    assert(math.abs(rows.head._5 - math.rint(psi * 1e6) / 1e6) < 1e-9)
    // the alarm path is exercised: the planted shift is real drift
    assert(rows.head._5 > 0.1 && rows.forall(_._6))
    // and a no-drift control: identical histograms give PSI exactly 0
    assert(base.keySet.forall { b =>
      val p = (base(b) + 1).toDouble / (docs.length + 10)
      (p - p) * math.log(p / p) == 0.0 })
  }

  test("agg_kmv_setops: exact sides match countDistinct; estimates in their 3-rsd bands") {
    val r = SparkEntry.queries("agg_kmv_setops")(spark, sf0001).collect().head
    val o = Tables.orders(spark, sf0001)
    val nA = o.where(col("o_orderpriority").startsWith("1"))
      .select("o_custkey").distinct().count()
    val nB = o.where(col("o_orderpriority").startsWith("5"))
      .select("o_custkey").distinct().count()
    assert(r.getAs[Long]("n_a_exact") == nA)
    assert(r.getAs[Long]("n_b_exact") == nB)
    assert(r.getAs[Long]("n_union_exact") >= math.max(nA, nB))
    assert(r.getAs[Long]("n_inter_exact") ==
      nA + nB - r.getAs[Long]("n_union_exact"))
    assert(r.getAs[Boolean]("a_in_3rsd") && r.getAs[Boolean]("b_in_3rsd") &&
      r.getAs[Boolean]("union_in_3rsd"))
    // sf0.001 sits below k=256: every estimate must be EXACT there
    assert(r.getAs[Long]("n_a_kmv") == nA)
    assert(r.getAs[Long]("n_inter_kmv") == r.getAs[Long]("n_inter_exact"))
  }
}
