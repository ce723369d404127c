package graft

import org.apache.spark.sql.functions._

/** Round-3 operator invariants (Warehouse + Llm3): semantic properties the
  * DuckDB oracle hash-compare can't express — join-result sanity, session
  * partition arithmetic, statistical bounds, cluster consistency. */
class Round3Spec extends SparkTestBase {

  // ---- TPC-H shapes ----

  test("tpch_q3: top-10, revenue strictly ordered desc with key tiebreak, all positive") {
    val rows = ops.Warehouse.tpchQ3(spark, sf0001).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val rev = rows.map(_.getAs[Double]("revenue"))
    assert(rev.forall(_ > 0))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("tpch_q5: only ASIA nations appear, each at most once") {
    val n = Tables.nation(spark, sf0001).join(Tables.region(spark, sf0001),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .select("n_name").collect().map(_.getString(0)).toSet
    val got = ops.Warehouse.tpchQ5(spark, sf0001).collect().map(_.getAs[String]("n_name"))
    assert(got.toSet.subsetOf(n))
    assert(got.length === got.toSet.size)
  }

  test("tpch_q10: revenue only from 'R' lineitems of window orders (spot-check top row)") {
    val top = ops.Warehouse.tpchQ10(spark, sf0001).collect().head
    val direct = Tables.customer(spark, sf0001)
      .where(col("c_custkey") === top.getAs[Long]("c_custkey"))
      .join(Tables.orders(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .join(Tables.lineitem(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .where(col("l_returnflag") === "R")
      .agg(Tables.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
      .head().getDouble(0)
    assert(math.abs(top.getAs[Double]("revenue") - direct) < 1e-6)
  }

  // ---- CDC / sessions / time series ----

  test("cdc compaction: one row per live (user,type) key; ts is that key's max") {
    val cdc = ops.Warehouse.cdcLatestPerKey(spark, sf0001)
    val maxTs = Tables.events(spark, sf0001)
      .groupBy("user_id", "event_type")
      .agg(max(unix_micros(col("ts"))).as("mx"))
    assert(cdc.count() === maxTs.count())
    val bad = cdc.join(maxTs, Seq("user_id", "event_type"))
      .where(col("last_ts_us") =!= col("mx"))
    assert(bad.count() === 0)
  }

  test("sessionization partitions events: session sizes sum to the event count; durations fit the span") {
    val s = ops.Warehouse.sessionizeEvents(spark, sf0001)
    val total = Tables.events(spark, sf0001).count()
    assert(s.agg(sum("n_events")).head().getLong(0) === total)
    assert(s.where(col("dur_us") < 0).count() === 0)
    // single-event sessions have zero duration
    assert(s.where(col("n_events") === 1 && col("dur_us") =!= 0).count() === 0)
  }

  test("native session_window agrees with the lag+cumsum sessionization") {
    val native = ops.Warehouse.sessionizeNativeWindow(spark, sf0001)
      .select("user_id", "start_us", "n_events")
    val manual = ops.Warehouse.sessionizeEvents(spark, sf0001)
      .select("user_id", "start_us", "n_events")
    assert(native.exceptAll(manual).count() === 0)
    assert(manual.exceptAll(native).count() === 0)
  }

  test("time-weighted average lies within each user's value range") {
    val t = ops.Warehouse.tsTimeWeightedAvg(spark, sf0001)
    val rng = Tables.events(spark, sf0001).groupBy("user_id")
      .agg(min("value").as("mn"), max("value").as("mx"))
    val bad = t.join(rng, "user_id")
      .where(col("twa") < col("mn") - lit(1e-6) || col("twa") > col("mx") + lit(1e-6))
    assert(bad.count() === 0)
  }

  test("day-over-day pct change: first day null, others = total/prev - 1") {
    val rows = ops.Warehouse.tsPctChangeDaily(spark, sf0001).collect()
    assert(rows.head.isNullAt(rows.head.fieldIndex("pct_change")))
    rows.sliding(2).foreach { case Array(prev, cur) =>
      val expect = cur.getAs[Double]("total") / prev.getAs[Double]("total") - 1
      assert(math.abs(cur.getAs[Double]("pct_change") - expect) < 1e-5)
    case _ => ()
    }
  }

  test("histogram: bins cover all rows, bin bounds respected") {
    val h = ops.Warehouse.aggHistogramValue(spark, sf0001).collect()
    assert(h.map(_.getAs[Long]("n")).sum === Tables.events(spark, sf0001).count())
    h.foreach { r =>
      val bin = r.getAs[Int]("bin")
      assert(bin >= 0 && bin <= 9)
      if (bin < 9) {
        assert(r.getAs[Double]("min_v") >= bin * 50.0)
        assert(r.getAs[Double]("max_v") < (bin + 1) * 50.0)
      } else assert(r.getAs[Double]("min_v") >= 450.0)
    }
  }

  test("z-score agrees with Spark's own stddev_samp formulation") {
    val ours = ops.Warehouse.anomalyZscoreEvents(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    val stats = ev.groupBy("user_id")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
    val ref = ev.join(stats, "user_id")
      .groupBy("user_id")
      .agg(sum(when(abs((col("value") - col("mu")) / col("sd")) > 2, 1L)
        .otherwise(0L)).as("ref_anom"))
    val bad = ours.join(ref, "user_id")
      .where(col("n_anomalies") =!= col("ref_anom"))
    assert(bad.count() === 0)
  }

  test("entropy bounded by ln(#types); uniform-ish users near the bound") {
    val e = ops.Warehouse.aggUserEntropy(spark, sf0001).collect()
    e.foreach { r =>
      val ent = r.getAs[Double]("entropy")
      val k = r.getAs[Long]("n_types")
      assert(ent >= -1e-6 && ent <= math.log(k.toDouble) + 1e-6,
        s"user ${r.get(0)}: entropy $ent outside [0, ln($k)]")
    }
  }

  test("per-window top-k: rn in 1..3 and totals descend within each window") {
    val rows = ops.Warehouse.streamTopkPerWindow(spark, sf0001).collect()
    rows.groupBy(_.getAs[Long]("win_us")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      assert(sorted.length <= 3)
      val ts = sorted.map(_.getAs[Double]("total"))
      assert(ts.zip(ts.tail).forall { case (a, b) => a >= b })
    }
  }

  // ---- scalars ----

  test("string format: pads hit exactly 20 chars; devoweling removes uppercase vowels") {
    ops.Warehouse.scalarStringFormat(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[String]("padded").length === 20)
      assert(r.getAs[String]("rpadded").length === 20)
      assert(!r.getAs[String]("devoweled").exists("AEIOU".contains(_)))
    }
  }

  test("regexp extraction matches every props row (fixture always carries k)") {
    val g = ops.Warehouse.scalarRegexpExtract(spark, sf0001)
    val perType = Tables.events(spark, sf0001).groupBy("event_type").count()
    val bad = g.join(perType, "event_type").where(col("n_matched") =!= col("count"))
    assert(bad.count() === 0)
  }

  // ---- LLM pipeline ----

  test("tfidf: 3 ranked terms per doc, scores non-negative and descending") {
    val rows = ops.Llm3.tfidfTopterms(spark, sf0001).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      val sc = sorted.map(_.getAs[Double]("tfidf"))
      assert(sc.forall(_ >= 0))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
  }

  test("wordcount top-20 head matches a direct recount") {
    val top = ops.Llm3.wordcountTop20(spark, sf0001).collect()
    assert(top.length === 20)
    val head = top.head
    val direct = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") === head.getAs[String]("word")).count()
    assert(head.getAs[Long]("n") === direct)
  }

  test("PII redaction: masked names carry no digits; digit counts preserved") {
    ops.Llm3.piiRedact(spark, sf0001).collect().foreach { r =>
      assert(!r.getAs[String]("masked_name").exists(_.isDigit))
      assert(r.getAs[Int]("n_digits") === 9) // Customer#%09d fixture names
    }
  }

  test("product analytics: DAU bounds, retention rate in [0,1], funnel monotone") {
    val dau = ops.Warehouse.dauDaily(spark, sf0001).collect()
    val nUsers = Tables.events(spark, sf0001).select("user_id").distinct().count()
    dau.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("dau") <= nUsers)
    }
    ops.Warehouse.cohortRetention(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("retained") <= r.getAs[Long]("active"))
      val rate = r.getAs[Double]("rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    val f = ops.Warehouse.funnelStages(spark, sf0001).head()
    assert(f.getAs[Long]("n_view") >= f.getAs[Long]("n_click_after_view"))
    assert(f.getAs[Long]("n_click_after_view") >= f.getAs[Long]("n_purchase_after_click"))
  }

  test("decontamination: only non-benchmark docs flagged; overlap count verified for one doc") {
    val rows = ops.Llm3.decontaminate(spark, sf0001).collect()
    val src0 = Tables.documents(spark, sf0001).where(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !src0.contains(r.getAs[Long]("doc_id"))))
    assert(rows.forall(r =>
      r.getAs[Boolean]("contaminated") === (r.getAs[Long]("n_shared_grams") >= 3)))
    // local recompute of one doc's trigram overlap
    def tri(s: String): Set[String] =
      s.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
    val benchGrams = docs.filter(_.getString(1) == "src0")
      .flatMap(r => tri(r.getString(2))).toSet
    val probe = rows.head
    val text = docs.find(_.getLong(0) == probe.getAs[Long]("doc_id")).get.getString(2)
    assert(tri(text).count(benchGrams.contains).toLong === probe.getAs[Long]("n_shared_grams"))
  }

  test("weighted mix: rates cycle 0.05..0.20 by source index; sampled bounded by total") {
    ops.Llm3.sampleWeightedMix(spark, sf0001).collect().foreach { r =>
      val idx = r.getAs[String]("source").drop(3).toInt
      assert(math.abs(r.getAs[Double]("rate") - (idx % 4 + 1) * 0.05) < 1e-12)
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_total"))
    }
  }

  test("dedup clusters: labels are component-consistent and minimal (corpus-wide)") {
    // round 12: clusters run over the WHOLE corpus (banded MinHash
    // candidates, exact-Jaccard verified) — every doc gets a row
    val rows = ops.Llm3.dedupClusters(spark, sf0001).collect()
    val labels = rows
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(rows.length.toLong ===
      Tables.documents(spark, sf0001).count(), "one row per corpus doc")
    // every cluster label is the min doc_id of its members
    labels.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min === c, s"cluster $c min is ${members.keys.min}")
    }
    // contract edges = banded candidates verified at exact word-set
    // Jaccard >= 9/10 (integer rule): recompute the verification
    // independently in the JVM over the Spark-produced candidate set
    // and check endpoint label agreement
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("ws")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toSet).toMap
    val cand = ops.Llm.dedupNear(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc1"), r.getAs[Long]("doc2")))
    assert(cand.nonEmpty, "fixture has no banded candidates — test is vacuous")
    var verified = 0
    cand.foreach { case (a, b) =>
      val (wa, wb) = (docs(a), docs(b))
      val inter = wa.intersect(wb).size
      val uni = wa.size + wb.size - inter
      if (10 * inter >= 9 * uni) {
        verified += 1
        assert(labels(a) === labels(b), s"edge ($a,$b) split across clusters")
      }
    }
    assert(verified > 0, "no candidate survived verification — test is vacuous")
    // replica closure: identical TEXTS always share a cluster (identical
    // trigram sets → identical signatures collide in every band; J = 1
    // passes verification). NB: same word SET with different word order
    // is not a replica — trigram banding is order-sensitive by design.
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    texts.groupBy(_._2).filter(_._2.length > 1).foreach { case (_, g) =>
      assert(g.map(d => labels(d._1)).distinct.length === 1,
        s"identical docs ${g.map(_._1).toSeq} split across clusters")
    }
  }
}
