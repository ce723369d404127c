package graft

import org.apache.spark.sql.functions._

/** Round 12 fourth wave: STL decomposition, dataset card, tokenizer
  * fertility — identity and consistency properties. */
class Round12dSpec extends SparkTestBase {

  test("ts_stl_daily: additive identity holds exactly on every row") {
    val rows = SparkEntry.queries("ts_stl_daily")(spark, sf0001).collect()
    assert(rows.length > 20, "fixture must span many complete weeks")
    rows.foreach { r =>
      val x = BigDecimal(r.getAs[Double]("x"))
      val sum = BigDecimal(r.getAs[Double]("trend")) +
        BigDecimal(r.getAs[Double]("seasonal")) +
        BigDecimal(r.getAs[Double]("residual"))
      assert((x - sum).abs <= BigDecimal("0.000001") * 2,
        s"decomposition identity broke at day ${r.getAs[Long]("day_num")}: " +
          s"x=$x trend+seasonal+residual=$sum")
    }
    // seasonal is a pure day-of-week function: <= 7 distinct values,
    // constant within each dow
    val byDow = rows.groupBy(_.getAs[Long]("dow"))
    assert(byDow.size <= 7)
    byDow.foreach { case (d, g) =>
      assert(g.map(_.getAs[Double]("seasonal")).distinct.length === 1,
        s"seasonal not constant within dow $d")
    }
    // mean-centering: dow-weighted seasonal mass ~0 (each row carries
    // its dow's centered mean)
    val seasonalMean = rows.map(_.getAs[Double]("seasonal")).sum / rows.length
    assert(math.abs(seasonalMean) < 1.0,
      s"seasonal far from centered: $seasonalMean")
  }

  test("llm_dataset_card: ALL row is the exact rollup of the language rows") {
    val rows = SparkEntry.queries("llm_dataset_card")(spark, sf0001).collect()
    val all = rows.filter(_.getString(0) == "ALL")
    assert(all.length === 1)
    val langs = rows.filter(_.getString(0) != "ALL")
    assert(langs.nonEmpty)
    def sumOf(c: String) = langs.map(_.getAs[Long](c)).sum
    assert(all.head.getAs[Long]("n_docs") === sumOf("n_docs"))
    assert(all.head.getAs[Long]("n_tokens") === sumOf("n_tokens"))
    assert(all.head.getAs[Long]("n_chars") === sumOf("n_chars"))
    // distinct texts/sources are NOT additive across languages — but the
    // rollup can never exceed the per-language sum
    assert(all.head.getAs[Long]("n_distinct_texts") <= sumOf("n_distinct_texts"))
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_rate")
      assert(dup >= 0.0 && dup < 1.0)
      assert(r.getAs[Long]("n_distinct_texts") <= r.getAs[Long]("n_docs"))
    }
    // dup_rate is exactly the distinct-text deficit (sf0.001 happens to
    // carry zero EXACT dups — near-dup replicas differ textually)
    rows.foreach { r =>
      val want = BigDecimal(r.getAs[Long]("n_docs") -
        r.getAs[Long]("n_distinct_texts")) * 1000000 /
        BigDecimal(r.getAs[Long]("n_docs"))
      assert(math.abs(r.getAs[Double]("dup_rate") * 1e6 - want.toDouble) < 1.0)
    }
  }

  test("anomaly_stl_residual: scores the decomposition residual, identity intact") {
    val rows = SparkEntry.queries("anomaly_stl_residual")(spark, sf0001)
      .collect()
    assert(rows.length === 20)
    // composes the published decomposition: identity still holds per row
    rows.foreach { r =>
      val x = BigDecimal(r.getAs[Double]("x"))
      val sum = BigDecimal(r.getAs[Double]("trend")) +
        BigDecimal(r.getAs[Double]("seasonal")) +
        BigDecimal(r.getAs[Double]("residual"))
      assert((x - sum).abs <= BigDecimal("0.000002"))
    }
    // ordering: |z| descending with day tiebreak
    val zs = rows.map(r => math.abs(r.getAs[Double]("robust_z")))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b })
    // the flag matches its own rule
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_anomaly") ===
        (math.abs(r.getAs[Double]("robust_z")) > 3.5))
    }
  }

  test("er_golden_record: survivorship replicates a JVM closure + field rules") {
    // replicate: multipass verified pairs -> closure -> field survivorship
    val pairs = SparkEntry.queries("er_snm_multipass")(spark, sf0001)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars").cast("long").as("nc"),
        col("source")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val members = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
      .groupBy(find)
    val want = members.map { case (c, ms) =>
      val golden = ms.map(m => (docs(m)._1, m)).sortBy { case (nc, id) =>
        (-nc, id) }.head
      val srcs = ms.groupBy(m => docs(m)._2).view.mapValues(_.length)
      val majSrc = srcs.toSeq.sortBy { case (s, n) => (-n, s) }.head._1
      (c, ms.length.toLong, golden._2, golden._1, majSrc, ms.min, ms.max,
        ms.map(m => docs(m)._1).sum)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("er_golden_record")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(got === want)
    // the merge ledger only carries multi-member entities
    got.foreach { case (_, n, _, _, _, _, _, _) => assert(n >= 2) }
    assert(got.nonEmpty)
  }

  test("llm_tokenizer_fertility: ratios bounded and consistent with token_count") {
    val rows = SparkEntry.queries("llm_tokenizer_fertility")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the word+punct regex can only split words further: >= 1 token/word
      assert(r.getAs[Double]("fertility_regex") >= 1.0)
      assert(r.getAs[Double]("fertility_bpe") > 0.0)
      assert(r.getAs[Double]("chars_per_token") > 0.0)
    }
    // cross-check totals against the per-source token-count battery
    val bySource = SparkEntry.queries("llm_token_count")(spark, sf0001)
      .collect()
    assert(rows.map(_.getAs[Long]("sum_ws")).sum ===
      bySource.map(_.getAs[Long]("sum_ws")).sum)
    assert(rows.map(_.getAs[Long]("sum_re")).sum ===
      bySource.map(_.getAs[Long]("sum_re")).sum)
  }
}
