package graft

import org.apache.spark.sql.functions._

/** Round-6 additions: prefix-filtered threshold Jaccard (SSJoin) and the
  * sorted-merge intersect kernel backing its verify stage. */
class Round6Spec extends SparkTestBase {

  test("sorted-intersect kernel matches array_intersect semantics (eval + codegen)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      val a = rnd.shuffle((1 to 60).map(n => s"w$n").toList).take(rnd.nextInt(30)).distinct.sorted
      val b = rnd.shuffle((1 to 60).map(n => s"w$n").toList).take(rnd.nextInt(30)).distinct.sorted
      (i, a, b)
    } :+ ((201, List.empty[String], List("x"))) :+ ((202, List.empty[String], List.empty[String]))
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      col("id"),
      functions.ArrayMath.sortedIntersectSize(col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
    assert(both.where(col("merge") =!= col("builtin")).count() === 0L)
    // and via the SQL registration
    functions.ArrayMath.register(spark)
    df.createOrReplaceTempView("r6_arrays")
    val viaSql = spark.sql(
      "SELECT count(*) FROM r6_arrays WHERE graft_sorted_intersect_size(a, b) != size(array_intersect(a, b))")
    assert(viaSql.collect()(0).getLong(0) === 0L)
    // long arrays dispatch to the primitive path and agree too
    val viaLongs = spark.sql(
      "SELECT graft_sorted_intersect_size(array(1L,3L,5L), array(3L,4L,5L))")
    assert(viaLongs.collect()(0).getLong(0) === 2L)
    // mismatched element types are an analysis error, not garbage output
    val e = intercept[Exception] {
      spark.sql("SELECT graft_sorted_intersect_size(array(1L,2L), array('a','b'))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }

  test("z-order key: known morton values, degenerate constant dim, null propagation") {
    val s = spark
    import s.implicits._
    // hand-checkable morton codes: x fills even bits, y odd
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (65535L, 65535L))
      .toDF("x", "y")
      .select(functions.ZOrder.interleave16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.sameElements(Array(0L, 1L, 2L, 15L, 4294967295L)), got.mkString(","))
    // constant dimension: every row lands in bucket 0 there, so the z key
    // degrades to a plain sort on the live dimension (monotone in it)
    val zs = functions.ZOrder
      .withZKey(Seq((1L, 10L), (1L, 20L), (1L, 30L)).toDF("a", "b"), "a", "b")
      .orderBy("b").collect().map(_.getLong(2))
    assert(zs.sameElements(zs.sorted) && zs.distinct.length == zs.length, zs.mkString(","))
    // a null in either dimension nulls the key (its own leading file range)
    val zn = functions.ZOrder
      .withZKey(Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), Some(5L)))
        .toDF("a", "b"), "a", "b")
      .where(col("a").isNull).collect()
    assert(zn.length === 1 && zn(0).isNullAt(2))
    // an ALL-null dimension is a constant dimension, not an NPE: the key
    // stays non-null and monotone in the live dimension
    val za = functions.ZOrder
      .withZKey(Seq((Option.empty[Long], 10L), (None, 30L), (None, 20L))
        .toDF("a", "b"), "a", "b")
      .orderBy("b").collect().map(_.getLong(2))
    assert(za.sameElements(za.sorted) && za.distinct.length === za.length,
      za.mkString(","))
  }

  test("minhash sketch aggregate: exact parity with per-permutation mins, partials combine") {
    val s = spark
    import s.implicits._
    val p = functions.MinHashSig.P
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(_ => (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
      .toDF("g", "x").repartition(8) // force real partial/merge across partitions
    val sig = df.groupBy("g").agg(functions.MinHash.sig(col("x"), 8).as("sig"))
    // reference: the same affine permutations as explicit column math
    val ref = df.select(col("g"), col("x"),
        explode(sequence(lit(0), lit(7))).as("i"))
      .withColumn("h",
        (((lit(2L) * col("i") + 1L) * 1299721L % p) * (col("x") % p) +
          (col("i") * 15485863L + 11L) % p) % p)
      .groupBy("g", "i").agg(min("h").as("m"))
      .groupBy("g").agg(sort_array(collect_list(struct(col("i"), col("m")))).as("ms"))
      .select(col("g"), expr("transform(ms, e -> e.m)").as("sig2"))
    assert(sig.join(ref, "g").where(expr("sig != sig2")).count() === 0L)
    // the sketch must partial-aggregate (map-side combine), like any sum
    val plan = sig.queryExecution.executedPlan.toString
    assert(plan.contains("graft_minhash_sig"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
    // a non-long input is an analysis error, not a per-row cast crash
    intercept[Exception] {
      df.groupBy("g")
        .agg(functions.MinHash.sig(col("x").cast("string"), 4)).collect()
    }
    // negative inputs map into [0, P) instead of poisoning the minima
    val neg = Seq(("n", -5L)).toDF("g", "x").groupBy("g")
      .agg(functions.MinHash.sig(col("x"), 4).as("sig"))
      .collect()(0).getSeq[Long](1)
    assert(neg.forall(v => v >= 0 && v < functions.MinHashSig.P), neg.mkString(","))
  }

  test("llm_minhash_src_sim: all source pairs, estimates bounded, replica source estimates 1.0") {
    val out = SparkEntry.queries("llm_minhash_src_sim")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.length === 190, s"C(20,2) source pairs expected, got ${out.length}")
    out.foreach { case (_, _, e) => assert(e >= 0.0 && e <= 1.0) }
    // a corpus IS its own twin: signature agreement must be total
    val dir = java.nio.file.Files.createTempDirectory("graft-mhsig").toString
    Tables.documents(spark, sf0001)
      .where(col("source").isin("src0", "src1"))
      .withColumn("source", concat(col("source"), lit("copy")))
      .union(Tables.documents(spark, sf0001)
        .where(col("source").isin("src0", "src1")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val twin = ops.Llm3.minhashSourceSim(spark, dir)
      .where(col("source_a") === "src0" && col("source_b") === "src0copy")
      .collect()
    assert(twin.length === 1 && twin(0).getDouble(2) === 1.0, twin.mkString(", "))
  }

  test("span removal: exact dups vanish, unique docs survive whole, shared spans excise exactly") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-spanrm").toString
    Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"),
        (4L, "p q r a b c s t u"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ops.Llm3.dupSpanRemoval(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // identical docs: every span duplicated → all words removed, row kept
    assert(got(1L) === ((5L, "")) && got(2L) === ((5L, "")), got)
    // unique doc: untouched
    assert(got(3L) === ((0L, "x y z w q")), got)
    // doc 4 shares only the span "a b c" → exactly its 3 words excised
    assert(got(4L) === ((3L, "p q r s t u")), got)
    // plan: shingle-proportional joins only, no pair work
    val p = ops.Llm3.dupSpanRemoval(spark, sf0001)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bucketed range join: equals brute force, one output per pair, no pair-join node") {
    val s = spark
    val got = ops.Joins.joinRangeBucketed(s, sf0001)
    val plan = got.queryExecution.executedPlan.toString
    // the whole point: an equi join on the bucket, never a BNLJ/cartesian
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"), plan)
    assert(plan.contains("bucket"), plan)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // exactly-once by construction (point side has ONE bucket): no dedup pass
    assert(rows.length === rows.distinct.length)
    // a span-aligned interval covers exactly ONE bucket ([ts, ts+w) ends at
    // ts+w-1), a mid-span interval two — the array_distinct is live
    import s.implicits._
    val nb = Seq(7200000000L, 7200000001L).toDF("t")
      .select(size(functions.TimeBuckets.coveringBuckets("t", 3600000000L)))
      .collect().map(_.getInt(0))
    assert(nb.sameElements(Array(1, 2)), nb.mkString(","))
    // brute-force reference — legal at fixture scale only
    val ev = Tables.events(s, sf0001).select(col("event_id"), col("event_type"),
      col("value"), unix_micros(col("ts")).as("ts_us"))
    val e = ev.where(col("event_type") === "error" && col("value") >= 150)
      .select(col("event_id").as("err_id"), col("ts_us").as("err_us"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts_us").as("click_us"))
    val brute = c.join(e, col("click_us") >= col("err_us") &&
        col("click_us") < col("err_us") + 3600L * 1000000L)
      .select("click_id", "err_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(t => (t._1, t._2)).toSet === brute)
  }

  test("temporal join: exactly one dim version per probe, equi-key plan, version truth") {
    val s = spark
    val q = ops.Warehouse.cdcTemporalJoin(s, sf0001)
    val got = q.collect()
    // half-open intervals partition each user's timeline → one row per purchase
    val nPurchases = Tables.events(s, sf0001)
      .where(col("event_type") === "purchase").count()
    assert(got.length.toLong === nPurchases)
    assert(got.map(_.getLong(0)).distinct.length === got.length)
    // no row may claim a version that only starts AFTER the purchase
    val probe = ops.Warehouse.cdcTemporalJoin(s, sf0001)
      .join(Tables.events(s, sf0001).where(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            unix_micros(col("ts")).as("true_ts")),
        Seq("purchase_id"))
      .where(col("valid_from_us") > col("true_ts")).count()
    assert(probe === 0L)
    // plan: SMJ/shuffled equi join on user_id, no pair-join node
    val p = q.queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("prefix-filtered Jaccard equals the brute-force threshold join (lossless prunes)") {
    // Brute: every pair sharing >=1 word, exact intersection via the word
    // join, threshold J >= 9/10. The prefix path must reproduce this set
    // EXACTLY — prefix filtering, the length filter, and the positional
    // filter are all theorems, not heuristics.
    val docs = Tables.documents(spark, sf0001)
    val w = docs.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("word"))
    val sizes = w.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val brute = w.as("w1").join(w.as("w2"),
        col("w1.word") === col("w2.word") && col("w1.doc_id") < col("w2.doc_id"))
      .groupBy(col("w1.doc_id").as("doc1"), col("w2.doc_id").as("doc2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("z1"), col("doc1") === col("z1.doc_id"))
      .join(sizes.as("z2"), col("doc2") === col("z2.doc_id"))
      .withColumn("uni", col("z1.sz") + col("z2.sz") - col("inter"))
      .where(lit(10L) * col("inter") >= lit(9L) * col("uni"))
      .select(col("doc1"), col("doc2"), col("inter"), col("uni"))
    val bruteSet = brute.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // sf0.001 doc_ids are all < 2000, so the query's fixture bound is
    // vacuous here. The brute side works on RAW WORDS while the query
    // hashes words to 48-bit ids first — equality therefore also proves
    // the hashing introduced no effective collision on this corpus (a
    // collision would show up as an inflated `inter` on the prefix side).
    val prefixSet = ops.Llm.dedupJaccardPrefix(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(bruteSet.nonEmpty, "fixture should contain J>=0.9 pairs")
    assert(prefixSet === bruteSet,
      s"missing=${(bruteSet -- prefixSet).take(5)} extra=${(prefixSet -- bruteSet).take(5)}")
  }

  test("semdedup: cluster-bounded pruning, keep-lowest invariant, no cartesian in the plan") {
    val q = ops.Llm.semDedup(spark, sf0001)
    val p = q.queryExecution.executedPlan.toString()
    // the 16-row centroid fan-out is a broadcast equi-join on a constant
    // key, and pair-gen is an equi-join on the cell — never a cartesian
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val rows = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length === 500)
    assert(rows.count(_._3) > 0, "fixture-calibrated tau must exercise the prune branch")
    // deterministic keep rule: the lowest vec_id of every cell survives
    // (it has no lower-id partner to be pruned by)
    rows.groupBy(_._2).foreach { case (cell, members) =>
      val lowest = members.minBy(_._1)
      assert(!lowest._3, s"cell $cell pruned its lowest member $lowest")
    }
    // every cell is non-empty and cells partition the corpus
    assert(rows.map(_._2).distinct.length === 16)
  }

  test("dup-span fraction: bounds, exact-dup pair implies frac 1.0 on both sides") {
    val s = spark
    import s.implicits._
    val rows = ops.Llm3.dupSpans(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, dup, frac) =>
      assert(dup <= n && frac >= 0.0 && frac <= 1.0, s"doc $id: $dup/$n frac=$frac")
    }
    // hand fixture THROUGH THE PRODUCTION FUNCTION (written as a fixture-
    // layout temp dir): two identical docs → every shingle duplicated
    // (frac 1.0); an unrelated doc shares nothing (frac 0.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-dupspan").toString
    Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ops.Llm3.dupSpans(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got === Map(1L -> 1.0, 2L -> 1.0, 3L -> 0.0))
  }

  test("round-6 queries: shuffle budgets pinned") {
    // dup_spans: (doc,shingle) distinct + shingle-df agg + join alignment +
    // doc agg + output sort — 6 Exchanges, all key-proportional
    val p1 = ops.Llm3.dupSpans(spark, sf0001).queryExecution.executedPlan.toString()
    assert("Exchange".r.findAllIn(p1).size <= 6, s"dup_spans grew a shuffle:\n$p1")
    // semdedup: argmax window + cell pair join alignment + prune distinct +
    // decision join + output sort — 5 Exchanges
    val p2 = ops.Llm.semDedup(spark, sf0001).queryExecution.executedPlan.toString()
    assert("Exchange".r.findAllIn(p2).size <= 5, s"semdedup grew a shuffle:\n$p2")
    // minhash source sim: the signature pipeline (shingle distinct +
    // source agg + limit collapse) appears TWICE pre-AQE — both pair-join
    // branches derive from the same subplan — and must collapse to one
    // at runtime via exchange reuse; the pair join itself adds none
    // (broadcast over the bounded signature table)
    val q3 = ops.Llm3.minhashSourceSim(spark, sf0001)
    q3.collect() // materialize THIS queryExecution so AQE finalizes reuse
    val p3 = q3.queryExecution.executedPlan.toString()
    assert(p3.contains("ReusedExchange"),
      s"the twin signature pipelines should share their exchanges:\n$p3")
  }

  test("prefix Jaccard plan: merge kernel present, no cartesian/NLJ, stopwords capped out of pair-gen") {
    val q = ops.Llm.dedupJaccardPrefix(spark, sf0001)
    val p = q.queryExecution.executedPlan.toString()
    assert(p.contains("graft_sorted_intersect_size"), s"verify stage must use the merge kernel:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the df-cap claim, measured: pair generation must touch far fewer
    // word collisions than the naive word join (stopword df^2 blow-up)
    val docs = Tables.documents(spark, sf0001)
    val w = docs.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("word"))
    val naiveCollisions = w.as("w1").join(w.as("w2"),
      col("w1.word") === col("w2.word") && col("w1.doc_id") < col("w2.doc_id")).count()
    val dfreq = w.groupBy("word").agg(count(lit(1)).as("df"))
    val sizes = w.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val prefixWords = w.join(dfreq, "word").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df").asc, col("word").asc)))
      .where(col("rn") <=
        col("sz") - floor((lit(9L) * col("sz") + lit(9L)) / lit(10L)).cast("long") + 1L)
    val prefixCollisions = prefixWords.as("p1").join(prefixWords.as("p2"),
      col("p1.word") === col("p2.word") && col("p1.doc_id") < col("p2.doc_id")).count()
    assert(prefixCollisions * 5 < naiveCollisions,
      s"prefix join should prune most collisions: $prefixCollisions vs $naiveCollisions")
  }
}
