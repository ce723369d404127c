package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: exact-boundary session semantics, parameterized
  * connected-components parallelism, and the bounded-collect cap. */
class Round5Spec extends SparkTestBase {

  test("native session_window MERGES two events exactly gap apart (pins the oracle's > rule)") {
    val s = spark
    import s.implicits._
    // 2h gap, events at t0 and t0+2h exactly: native session_window keeps
    // them in ONE session ending last+gap — so a new session starts only
    // when diff > gap, which is precisely the lag+cumsum rule the
    // sessionize_native_window oracle uses (is_new when diff > 7200e6 us).
    // An exact-boundary fixture row therefore cannot break oracle parity.
    val df = Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 02:00:00"))
      .toDF("uid", "t").withColumn("ts", col("t").cast("timestamp"))
    val sw = df.groupBy(col("uid"), session_window(col("ts"), "2 hours").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("n"), col("sw.end").cast("string").as("end"))
      .collect()
    assert(sw.length === 1, sw.mkString(","))
    assert(sw.head.getLong(0) === 2L)
    assert(sw.head.getString(1) === "2024-01-01 04:00:00")
    // one second past the boundary → two sessions
    val df2 = Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 02:00:01"))
      .toDF("uid", "t").withColumn("ts", col("t").cast("timestamp"))
    assert(df2.groupBy(col("uid"), session_window(col("ts"), "2 hours")).count()
      .count() === 2L)
  }

  test("dedup clusters: hash-partitioned Pregel rounds match the single-partition path") {
    val auto = ops.Llm3.dedupClusters(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString)
    val par4 = ops.Llm3.dedupClustersAt(spark, sf0001, parallelism = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(auto.nonEmpty)
    assert(auto.toSeq === par4.toSeq)
  }

  test("repetition filter: fractions bounded, keep matches the thresholds, shuffle-free until output sort") {
    val df = ops.Llm3.repetitionFilter(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val dupW = r.getDouble(r.fieldIndex("dup_word_frac"))
      assert(dupW >= 0.0 && dupW <= 1.0, r.toString)
      if (!r.isNullAt(r.fieldIndex("dup_3gram_frac"))) {
        val dupG = r.getDouble(r.fieldIndex("dup_3gram_frac"))
        assert(dupG >= 0.0 && dupG <= 1.0, r.toString)
      }
    }
    // both verdicts must occur on the fixture or the threshold is vacuous
    val keeps = rows.count(_.getBoolean(4))
    assert(keeps > 0 && keeps < rows.length, s"keep=$keeps of ${rows.length}")
    // row-local pass: the only exchange is the deterministic output sort
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("hashpartitioning"),
      s"repetition filter must not shuffle on any key:\n$plan")
  }

  test("bpe pairs: 20 two-char pairs, counts non-increasing") {
    val rows = ops.Llm3.bpePairs(spark, sf0001).collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getString(0).length == 2), rows.mkString(","))
    val cnts = rows.map(_.getLong(1))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, cnts.mkString(","))
  }

  test("context packing: bins partition the corpus, token totals conserved") {
    val docs = Tables.documents(spark, sf0001)
    val rows = ops.Llm3.packContext(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // every document lands in exactly one bin
    assert(rows.map(_.getLong(2)).sum === docs.count())
    // doc_id ranges are sane and bins start at 0 within each source
    for (r <- rows) assert(r.getLong(4) <= r.getLong(5), r.toString)
    val bySource = rows.groupBy(_.getString(0))
    for ((_, rs) <- bySource) {
      val bins = rs.map(_.getLong(1)).sorted
      assert(bins.head === 0L, bins.mkString(","))
      // concat-then-chunk: a new bin starts only after 4096 more tokens of
      // prefix, so bin count never exceeds total_tokens/4096 + 1
      val total = rs.map(_.getLong(3)).sum
      assert(bins.length <= total / 4096 + 1, s"bins=${bins.length} tokens=$total")
    }
  }

  test("minhash banding (scale path) catches exact shingle-Jaccard near-dups") {
    // correctness bridge between exact similarity and the banded scale
    // path, IN THE SAME SIMILARITY SPACE: minhash signatures sketch
    // 3-gram SHINGLE sets (order-sensitive), so the reference here is
    // exact shingle Jaccard. (llm_dedup_jaccard's word-SET Jaccard is a
    // different, order-insensitive measure — the fixture's word-shuffle
    // near-dups score 0.9+ there with near-zero shingle overlap, and
    // banding is RIGHT to ignore them.) Deterministic hashes make this a
    // regression pin; analytic miss probability per pair at J=0.95 is
    // (1-0.95^2)^4 ~ 1e-4.
    val ws = filter(split(col("text"), " "), w => w =!= lit(""))
    val sh = Tables.documents(spark, sf0001)
      .select(col("doc_id"), ws.as("ws"))
      .where(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("ws")) - 3), i => concat_ws(" ",
          element_at(col("ws"), i + 1), element_at(col("ws"), i + 2),
          element_at(col("ws"), i + 3))))).as("gram"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val exact = sh.as("a")
      .join(sh.as("b"), col("a.gram") === col("b.gram") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.as("z1"), col("d1") === col("z1.doc_id"))
      .join(sz.as("z2"), col("d2") === col("z2.doc_id"))
      .where(col("inter").cast("double") /
        (col("z1.c") + col("z2.c") - col("inter")) >= 0.95)
      .select(col("d1"), col("d2"), greatest(col("z1.c"), col("z2.c")).as("sz"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(exact.nonEmpty, "fixture should contain shingle-level near-dups")
    val banded = ops.Llm.dedupNear(spark, sf0001)
      .select(col("doc1"), col("doc2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // an 8-hash sketch of a ~20-element set is high-variance (estimator
    // error ~ 1/sqrt(k) of a coarse quantity): tiny docs are the known
    // minhash weakness (measured here: the only fixture misses are the
    // two pairs with <30 shingles). Require PERFECT recall where the
    // sketch is meaningful, and a floor overall.
    val bigMissed = exact.filter(_._3 >= 40).map(t => (t._1, t._2)).toSet -- banded
    assert(bigMissed.isEmpty,
      s"banding missed adequately-sized pairs: $bigMissed")
    val all = exact.map(t => (t._1, t._2)).toSet
    val recall = (all & banded).size.toDouble / all.size
    assert(recall >= 0.9, s"overall recall $recall below floor")
  }

  test("boundedCollect fails loudly past its cap and passes under it") {
    val df = spark.range(100).toDF("x")
    assert(Tables.boundedCollect(df, 100, "test").length === 100)
    val e = intercept[IllegalArgumentException] {
      Tables.boundedCollect(df, 99, "test-over")
    }
    assert(e.getMessage.contains("driver-collect cap"), e.getMessage)
  }
}
