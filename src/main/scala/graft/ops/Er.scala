package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-resolution blocking, third strategy: the Sorted-Neighborhood
  * Method (Hernández & Stolfo SIGMOD 1995) — sort the corpus by a
  * blocking key and compare only records within a sliding rank window.
  * Complements the dedup family's two existing candidate generators
  * (MinHash banding L7/J2, prefix filtering L112): SNM is the classic
  * choice when similarity correlates with a sortable key (names, text
  * prefixes, normalized addresses) and gives a HARD candidate budget of
  * N·w pairs — the property banding can't promise under skew.
  */
object Er {

  private val W = 5 // neighborhood window (rank distance)

  /** Window candidate pairs for ONE sorted pass: rank the corpus by
    * `skey` (ties broken by doc_id), emit unordered pairs within rank
    * distance ≤ W. The global rank is assigned WITHOUT a
    * single-partition window — `zipWithIndex` over the
    * range-partitioned sort (one tiny count job + per-partition
    * offsets); candidate generation is the `join_range_bucketed` trick
    * on the rank axis (bucket = rank div W, probe explodes (b, b−1),
    * equi-join + distance filter) — no non-equi join node, exactly
    * N·W pairs per pass. */
  private def windowPairs(spark: SparkSession, keyed: DataFrame): DataFrame = {
    import spark.implicits._
    val ranked = keyed.repartitionByRange(8, col("skey"), col("doc_id"))
      .sortWithinPartitions(col("skey"), col("doc_id"))
      .select(col("doc_id"), col("skey")).as[(Long, String)].rdd
      .zipWithIndex.map { case ((id, _), r) => (id, r) }
      .toDF("doc_id", "rank")
    val buck = ranked.withColumn("b", expr(s"rank div $W"))
    val probe = buck.select(col("doc_id").as("doc2"), col("rank").as("r2"),
      explode(array(col("b"), col("b") - 1)).as("b"))
    buck.select(col("doc_id").as("doc1"), col("rank").as("r1"), col("b"))
      .join(probe, "b")
      .where((col("r2") - col("r1")).between(1, W))
      .select(least(col("doc1"), col("doc2")).as("d1"),
        greatest(col("doc1"), col("doc2")).as("d2"))
  }

  /** Exact integer word-set Jaccard ≥ 9/10 verification of candidate
    * pairs — candidate-proportional (joins candidates to the word
    * index), never all-pairs; precision 1 by construction. */
  private def jaccardVerify(spark: SparkSession, dir: String,
      cand: DataFrame): DataFrame = {
    val w = documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("word"))
    val sizes = w.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(w.as("w1"), col("d1") === col("w1.doc_id"))
      .join(w.as("w2"),
        col("d2") === col("w2.doc_id") && col("w1.word") === col("w2.word"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("z1"), col("d1") === col("z1.doc_id"))
      .join(sizes.as("z2"), col("d2") === col("z2.doc_id"))
      .withColumn("uni", col("z1.sz") + col("z2.sz") - col("inter"))
      .where(lit(10) * col("inter") >= lit(9) * col("uni"))
      .select(col("d1"), col("d2"), col("inter"), col("uni"),
        round(col("inter").cast("double") / col("uni").cast("double"), 6)
          .as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** SNM near-dup detection over `documents`: sort key = the text
    * itself (replica families share long prefixes, so they pack into
    * adjacent ranks); candidates = pairs within rank distance ≤ 5;
    * verification = EXACT word-set Jaccard ≥ 9/10 in integer arithmetic
    * (`10·inter ≥ 9·uni`, the L112 contract) so precision is 1 by
    * construction and the oracle is bit-identical. Recall is the method's
    * knob (a clique of >w+1 identical docs contributes only its
    * window-local pairs; multi-pass SNM with a second key is the
    * standard remedy) — Round9dSpec measures it against the exhaustive
    * in-window ground truth.
    *
    * Scale notes: the global rank is assigned WITHOUT a single-partition
    * window — `zipWithIndex` over the range-partitioned sort (one tiny
    * count job + per-partition offsets; the RDD hop is the documented
    * tier for genuinely per-partition logic). Candidate generation is
    * the `join_range_bucketed` trick on the rank axis: bucket = rank
    * div w, probe side explodes (b, b−1), equi-join + distance filter —
    * no non-equi join node, candidates exactly the N·w window pairs.
    * Verification joins only candidate pairs to the word index —
    * candidate-proportional, never all-pairs. */
  def sortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
      .select(col("doc_id"), col("text").as("skey"))
    jaccardVerify(spark, dir, windowPairs(spark, d))
  }

  /** MULTI-PASS SNM (the Hernández–Stolfo remedy for single-pass
    * window-local recall, VERDICT r9 #3): a second sorted pass on an
    * INDEPENDENT key — the REVERSED text, so prefix-divergent but
    * suffix-similar records that sort far apart in pass 1 become rank
    * neighbors in pass 2 — then the UNION of both windows' candidates
    * feeds one shared exact-Jaccard verification. Precision stays 1 by
    * construction (every emitted pair is verified); the candidate
    * budget stays hard at 2·N·W.
    *
    * Measured on the sf0.001 fixture against the EXHAUSTIVE
    * ≥0.9-Jaccard ground truth (11 025 pairs, dominated by one dense
    * 231-doc family; Round10Spec re-derives these numbers): pass 1
    * alone recalls 2.1% of true pairs, two passes 4.5% — the window
    * budget is the binding constraint, exactly as Hernández & Stolfo
    * describe. Their full remedy is multi-pass + TRANSITIVE CLOSURE:
    * feeding these verified pairs through the L67 connected-components
    * op recovers 96.1% of true pairs at 53.2% pair precision (the
    * ≥0.9-Jaccard relation is not transitive; closure trades pairwise
    * precision for entity-level recall). Both stages ship: this query
    * emits the verified pairs (precision 1), and Round10Spec runs the
    * closure and pins both recall numbers.
    *
    * Scale: each pass is the single-pass plan (range-partitioned sort,
    * zipWithIndex ranks, equi-bucketed window join); the union is a
    * distinct over ≤2·N·W rows shuffled on the pair key. Nothing
    * all-pairs anywhere. */
  def snmMultipass(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
    val p1 = windowPairs(spark, d.select(col("doc_id"), col("text").as("skey")))
    val p2 = windowPairs(spark, d.select(col("doc_id"), reverse(col("text")).as("skey")))
    jaccardVerify(spark, dir, p1.union(p2).distinct())
  }

  /** L342 — golden-record survivorship merge (the ER stage AFTER
    * matching that every MDM/linkage pipeline ships: matched pairs →
    * transitive entity clusters → ONE merged record per entity with
    * FIELD-LEVEL survivorship rules — unlike L237's keep-best, which
    * picks one member whole, survivorship composes the golden record
    * attribute by attribute). Pairs = the L164 SNM-multipass verified
    * set (precision 1, budget 2·N·W); clusters via
    * [[Llm3.componentLabelsDf]] — the hybrid that ACTUALLY routes: a
    * ≤cap pair set through the driver union-find, a >cap set through
    * the pointer-doubling Pregel loop (round 13 closed the r12 gap
    * where this scaladoc promised the fallback the code didn't have);
    * rules: representative text = LONGEST member (max n_chars, doc_id
    * tiebreak), source = majority vote (count desc, lexicographic
    * tiebreak), plus the member ledger (count, id span, total chars) an
    * auditable merge publishes. Only multi-member entities emit — the
    * merge ledger, not a corpus copy. */
  def goldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val pairs = snmMultipass(spark, dir).select(col("d1"), col("d2"))
    val labelDf = Llm3.componentLabelsDf(spark, pairs)
      .select(col("node").as("doc_id"), col("label").as("cluster"))
    // no broadcast hint: the ≤cap path yields a local relation Spark
    // auto-broadcasts; the >cap Pregel path yields a distributed frame
    // that must shuffle-join (forcing broadcast there would be the bug)
    val members = documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), col("source"))
      .join(labelDf, Seq("doc_id"))
    val wLongest = Window.partitionBy(col("cluster"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val golden = members.withColumn("rk", row_number().over(wLongest))
      .where(col("rk") === 1)
      .select(col("cluster"), col("doc_id").as("golden_doc"),
        col("n_chars").cast("long").as("golden_chars"))
    val srcMode = members.groupBy(col("cluster"), col("source"))
      .agg(count(lit(1)).as("c"))
      .withColumn("mrk", row_number().over(Window.partitionBy(col("cluster"))
        .orderBy(col("c").desc, col("source").asc)))
      .where(col("mrk") === 1)
      .select(col("cluster"), col("source").as("majority_source"))
    val stats = members.groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        sum(col("n_chars").cast("long")).as("total_chars"))
    golden.join(stats, "cluster").join(srcMode, "cluster")
      .select(col("cluster"), col("n_members"), col("golden_doc"),
        col("golden_chars"), col("majority_source"), col("min_doc"),
        col("max_doc"), col("total_chars"))
      .orderBy("cluster")
  }

  // Fellegi–Sunter field parameters: (m, u) = P(agree | match) and
  // P(agree | non-match), fixed published-style priors (no EM fit —
  // the scoring kernel is what this row ships). Weights are computed
  // ONCE in JVM, rounded 6dp, and embedded as identical literals in
  // both the Spark plan and the oracle SQL, so ln never runs in-query.
  private val FsFields = Seq(
    ("words_band", 0.90, 0.10), ("first_word", 0.85, 0.05),
    ("last_word", 0.85, 0.05), ("chars_close", 0.95, 0.20))
  private def r6(x: Double) = math.rint(x * 1e6) / 1e6
  private val FsAgree = FsFields.map { case (_, m, u) => r6(math.log(m / u)) }
  private val FsDisagree =
    FsFields.map { case (_, m, u) => r6(math.log((1 - m) / (1 - u))) }
  private val FsThreshold = 2.0

  /** L232 — Fellegi–Sunter record-linkage scoring (Fellegi & Sunter
    * JASA 1969 — the decision-theoretic standard behind every linkage
    * engine): candidate pairs from (lang, source, n_chars-band)
    * blocking (block sizes are data-bounded and tiny — the spec pins
    * them), then a log-likelihood-ratio score Σ w_f over four field
    * comparisons (word-count band, first token, last token, char-length
    * proximity), match iff score > τ. Agreement weights ln(m/u) /
    * ln((1−m)/(1−u)) are JVM-precomputed round-6 literals — identical
    * constants in both engines, fixed 4-term add order, score round-6 —
    * fully hash-gated. 100 TB: the pair space is the blocked equi
    * self-join (never corpus²), comparisons row-local; this is the
    * SCORING stage the SNM/LSH blocking rows feed. Top-20 by score. */
  def fellegiSunter(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"),
      col("lang"), col("source"), col("n_chars"),
      expr("n_chars div 100").as("cb"),
      expr("size(split(text, ' ')) div 10").as("wb"),
      element_at(split(col("text"), " "), 1).as("fw"),
      element_at(split(col("text"), " "), -1).as("lw"))
    val pairs = d.as("x").join(d.as("y"),
        col("x.lang") === col("y.lang") &&
          col("x.source") === col("y.source") &&
          col("x.cb") === col("y.cb") &&
          col("x.doc_id") < col("y.doc_id"))
    val agrees = Seq(
      (col("x.wb") === col("y.wb")),
      (col("x.fw") === col("y.fw")),
      (col("x.lw") === col("y.lw")),
      (abs(col("x.n_chars") - col("y.n_chars")) <= 10))
    val score = agrees.zipWithIndex.map { case (a, i) =>
      when(a, lit(FsAgree(i))).otherwise(lit(FsDisagree(i)))
    }.reduceLeft(_ + _)
    pairs.select(
        col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        agrees(0).cast("int").as("a_words"),
        agrees(1).cast("int").as("a_first"),
        agrees(2).cast("int").as("a_last"),
        agrees(3).cast("int").as("a_chars"),
        round(score, 6).as("score"))
      .withColumn("is_match", col("score") > FsThreshold)
      .orderBy(col("score").desc, col("d1").asc, col("d2").asc)
      .limit(20)
  }

  /** L250 — blocking-quality metrics (Christen TKDE 2012's evaluation
    * triple for any blocking scheme: reduction ratio RR = 1 −
    * \|cand\|/\|all pairs\|, pairs completeness PC = recall of true
    * matches, pairs quality PQ = precision of the candidate set — the
    * numbers that justify a blocking choice BEFORE paying for
    * verification). Graded on the bounded 50-doc slice where the
    * exhaustive ≥0.9-Jaccard ground truth is enumerable in-engine
    * (C(50,2) = 1 225 pairs — the truth side is the audit's cost, which
    * is exactly why it runs on a slice); candidates = the L183 SNM
    * text-sorted window pass (rank assigned over the FULL corpus, the
    * production shape, then restricted to the slice). All counts exact
    * integers; the three ratios exact divisions round-6. */
  def blockingQuality(spark: SparkSession, dir: String): DataFrame = {
    val n = 50
    val d = documents(spark, dir).where(col("doc_id") < n)
    // scheme 1: the L183 text-sorted SNM window (ranks over the FULL
    // corpus — the production shape — then restricted to the slice)
    val c1 = windowPairs(spark,
        documents(spark, dir).select(col("doc_id"), col("text").as("skey")))
      .where(col("d1") < n && col("d2") < n)
      .select(col("d1"), col("d2")).distinct()
      .withColumn("scheme", lit("1_snm_text"))
    // scheme 2: the L232 attribute blocking (lang, source, chars-band)
    val db = d.select(col("doc_id"), col("lang"), col("source"),
      expr("n_chars div 100").as("cb"))
    val c2 = db.as("x").join(db.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
          col("x.cb") === col("y.cb") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .withColumn("scheme", lit("2_attr_block"))
    // scheme 3: SSJoin prefix filtering at t = 0.9 (Chaudhuri et al.
    // ICDE 2006) — provably LOSSLESS for threshold word-set Jaccard:
    // any J ≥ t pair must share one of each side's first
    // sz − ceil(t·sz) + 1 tokens in the global (df, word) order
    val w = d.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("word"))
    val sizes = w.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val dfw = w.groupBy("word").agg(count(lit(1)).as("dfreq"))
    val wOrd = Window.partitionBy(col("doc_id"))
      .orderBy(col("dfreq").asc, col("word").asc)
    val pref = w.join(dfw, "word").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(wOrd))
      .where(col("rn") <= expr("sz - ((9 * sz + 9) div 10) + 1"))
      .select(col("doc_id"), col("word"))
    val c3 = pref.as("p1").join(pref.as("p2"),
        col("p1.word") === col("p2.word") && col("p1.doc_id") < col("p2.doc_id"))
      .select(col("p1.doc_id").as("d1"), col("p2.doc_id").as("d2")).distinct()
      .withColumn("scheme", lit("3_prefix_filter"))
    val truth = w.as("w1").join(w.as("w2"),
        col("w1.word") === col("w2.word") && col("w1.doc_id") < col("w2.doc_id"))
      .groupBy(col("w1.doc_id").as("d1"), col("w2.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("z1"), col("d1") === col("z1.doc_id"))
      .join(sizes.as("z2"), col("d2") === col("z2.doc_id"))
      .where(lit(10) * col("inter") >= lit(9) * (col("z1.sz") + col("z2.sz") - col("inter")))
      .select(col("d1"), col("d2"))
    val allPairs = n.toLong * (n - 1) / 2
    val cand = c1.unionAll(c2).unionAll(c3)
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    cand.join(truth.withColumn("hit", lit(1)), Seq("d1", "d2"), "left")
      .groupBy("scheme")
      .agg(count(lit(1)).as("n_cand"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
      .crossJoin(broadcast(nTruth))
      .select(col("scheme"), lit(allPairs).as("n_all_pairs"),
        col("n_cand"), col("n_truth"), col("n_hit"),
        round(lit(1.0) - col("n_cand").cast("double") / allPairs.toDouble, 6)
          .as("reduction_ratio"),
        round(col("n_hit").cast("double") / col("n_truth").cast("double"), 6)
          .as("pairs_completeness"),
        round(col("n_hit").cast("double") / col("n_cand").cast("double"), 6)
          .as("pairs_quality"))
      .orderBy("scheme")
  }

  /** L315 — Jaro–Winkler fuzzy matching within brand blocks
    * (Jaro 1989; Winkler 1990 — THE record-linkage string comparator,
    * the default scorer feeding L250's Fellegi–Sunter weights; Spark
    * ships levenshtein but no JW, so this runs through the repo's own
    * codegen'd [[graft.functions.JaroWinklerSim]] expression — a UDF
    * here would box every pair and fall out of whole-stage codegen on
    * exactly the O(pairs) stage that dominates ER). Standard blocked
    * comparison shape: equi-join on the blocking key (pairs bounded by
    * block size², never corpus²), a < b dedup, JW ≥ 0.8 match
    * threshold, top-20 by (similarity, key pair). The kernel is
    * semantics-pinned to DuckDB's `jaro_winkler_similarity` (probed;
    * scaladoc at the expression), so the oracle is a built-in call. */
  def jaroWinklerBlocked(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.JaroWinkler.jaroWinkler
    // DISTINCT-NAME grain first: the corpus collapses to the (brand,
    // name) vocabulary frame (bounded by catalog vocabulary, NOT row
    // count), each distinct name carrying its part multiplicity. The
    // pair join and every JW evaluation then run on bounded² pairs —
    // the first cut paired individual rows and burned 6 s at sf0.1
    // re-scoring identical strings 10³ times (and its top-20 was all
    // jw = 1.0 exact-name dups, which are L:J1 exact-dedup territory,
    // not fuzzy matching).
    val names = part(spark, dir)
      .groupBy(col("p_brand"), col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
    val a = names.select(col("p_brand"), col("p_name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val b = names.select(col("p_brand"), col("p_name").as("name_b"),
      col("n_parts").as("n_parts_b"))
    a.join(b, Seq("p_brand"))
      .where(col("name_a") < col("name_b"))
      .withColumn("jw", round(jaroWinkler(col("name_a"), col("name_b")), 6))
      .where(col("jw") >= 0.8)
      .select(col("p_brand"), col("name_a"), col("name_b"),
        col("n_parts_a"), col("n_parts_b"), col("jw"))
      .orderBy(col("jw").desc, col("p_brand").asc, col("name_a").asc,
        col("name_b").asc)
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_jaro_winkler" -> (jaroWinklerBlocked _),
    "er_blocking_quality" -> (blockingQuality _),
    "er_fellegi_sunter" -> (fellegiSunter _),
    "er_sorted_neighborhood" -> (sortedNeighborhood _),
    "er_snm_multipass" -> (snmMultipass _),
    "er_golden_record" -> (goldenRecord _),
  )

  val oracles: Map[String, String] = Map(
    "er_jaro_winkler" ->
      """WITH nm AS (SELECT p_brand, p_name,
             CAST(COUNT(*) AS BIGINT) AS n_parts
           FROM part GROUP BY 1, 2),
         pr AS (SELECT a.p_brand,
             a.p_name AS name_a, b.p_name AS name_b,
             a.n_parts AS n_parts_a, b.n_parts AS n_parts_b,
             round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
           FROM nm a JOIN nm b
             ON a.p_brand = b.p_brand AND a.p_name < b.p_name)
         SELECT p_brand, name_a, name_b, n_parts_a, n_parts_b, jw
         FROM pr WHERE jw >= 0.8
         ORDER BY jw DESC, p_brand, name_a, name_b LIMIT 20""",
    "er_blocking_quality" ->
      s"""WITH r1 AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY text, doc_id) - 1 AS rank
           FROM documents),
         c1 AS (SELECT DISTINCT '1_snm_text' AS scheme,
             LEAST(a.doc_id, b.doc_id) AS d1,
             GREATEST(a.doc_id, b.doc_id) AS d2
           FROM r1 a JOIN r1 b ON b.rank - a.rank BETWEEN 1 AND $W
           WHERE a.doc_id < 50 AND b.doc_id < 50),
         db AS (SELECT doc_id, lang, source, n_chars // 100 AS cb
           FROM documents WHERE doc_id < 50),
         c2 AS (SELECT '2_attr_block' AS scheme, x.doc_id AS d1, y.doc_id AS d2
           FROM db x JOIN db y ON x.lang = y.lang AND x.source = y.source
             AND x.cb = y.cb AND x.doc_id < y.doc_id),
         w AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
             AS word
           FROM documents WHERE doc_id < 50),
         sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM w GROUP BY 1),
         dfw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS dfreq FROM w GROUP BY 1),
         pref AS (SELECT doc_id, word FROM (
             SELECT w.doc_id, w.word, sz.sz,
               ROW_NUMBER() OVER (PARTITION BY w.doc_id
                 ORDER BY dfw.dfreq ASC, w.word ASC) AS rn
             FROM w JOIN dfw USING (word) JOIN sz USING (doc_id))
           WHERE rn <= sz - ((9 * sz + 9) // 10) + 1),
         c3 AS (SELECT DISTINCT '3_prefix_filter' AS scheme,
             p1.doc_id AS d1, p2.doc_id AS d2
           FROM pref p1 JOIN pref p2
             ON p1.word = p2.word AND p1.doc_id < p2.doc_id),
         truth AS (SELECT w1.doc_id AS d1, w2.doc_id AS d2
           FROM w w1 JOIN w w2 ON w1.word = w2.word AND w1.doc_id < w2.doc_id
           JOIN sz a ON w1.doc_id = a.doc_id JOIN sz b ON w2.doc_id = b.doc_id
           GROUP BY 1, 2, a.sz, b.sz
           HAVING 10 * COUNT(*) >= 9 * (a.sz + b.sz - COUNT(*))),
         cand AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
           UNION ALL SELECT * FROM c3),
         agg AS (SELECT scheme, CAST(COUNT(*) AS BIGINT) AS n_cand,
             CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM truth
               WHERE truth.d1 = cand.d1 AND truth.d2 = cand.d2)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
           FROM cand GROUP BY 1)
         SELECT scheme, CAST(1225 AS BIGINT) AS n_all_pairs, n_cand,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth, n_hit,
           round(1.0 - CAST(n_cand AS DOUBLE) / 1225.0, 6) AS reduction_ratio,
           round(CAST(n_hit AS DOUBLE) /
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM truth), 6)
             AS pairs_completeness,
           round(CAST(n_hit AS DOUBLE) / CAST(n_cand AS DOUBLE), 6)
             AS pairs_quality
         FROM agg ORDER BY scheme""",
    "er_fellegi_sunter" -> {
      def w(i: Int) = (f"${FsAgree(i)}%.6f", f"${FsDisagree(i)}%.6f")
      val terms = Seq(
        ("x.wb = y.wb", w(0)), ("x.fw = y.fw", w(1)),
        ("x.lw = y.lw", w(2)), ("abs(x.n_chars - y.n_chars) <= 10", w(3)))
      // CAST: DuckDB parses fractional literals as DECIMAL; Spark's
      // lit(Double) is DOUBLE — pin both sides to double arithmetic
      val score = terms.map { case (c, (wa, wd)) =>
        s"(CASE WHEN $c THEN CAST($wa AS DOUBLE) ELSE CAST($wd AS DOUBLE) END)"
      }.mkString(" + ")
      s"""WITH d AS (SELECT doc_id, lang, source, n_chars,
             n_chars // 100 AS cb,
             len(string_split(text, ' ')) // 10 AS wb,
             string_split(text, ' ')[1] AS fw,
             string_split(text, ' ')[-1] AS lw
           FROM documents)
         SELECT x.doc_id AS d1, y.doc_id AS d2,
           CAST(x.wb = y.wb AS INT) AS a_words,
           CAST(x.fw = y.fw AS INT) AS a_first,
           CAST(x.lw = y.lw AS INT) AS a_last,
           CAST(abs(x.n_chars - y.n_chars) <= 10 AS INT) AS a_chars,
           round($score, 6) AS score,
           round($score, 6) > $FsThreshold AS is_match
         FROM d x JOIN d y
           ON x.lang = y.lang AND x.source = y.source AND x.cb = y.cb
           AND x.doc_id < y.doc_id
         ORDER BY score DESC, d1 ASC, d2 ASC LIMIT 20"""
    },
    "er_sorted_neighborhood" ->
      s"""WITH r AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY text, doc_id) - 1 AS rank
           FROM documents),
         cand AS (SELECT LEAST(a.doc_id, b.doc_id) AS d1,
             GREATEST(a.doc_id, b.doc_id) AS d2
           FROM r a JOIN r b ON b.rank - a.rank BETWEEN 1 AND $W),
         w AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
           FROM documents),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM w GROUP BY 1),
         inter AS (SELECT c.d1, c.d2, COUNT(*) AS inter
           FROM cand c
           JOIN w w1 ON c.d1 = w1.doc_id
           JOIN w w2 ON c.d2 = w2.doc_id AND w1.word = w2.word
           GROUP BY 1, 2)
         SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
           CAST(z1.sz + z2.sz - inter AS BIGINT) AS uni,
           round(CAST(inter AS DOUBLE) / CAST(z1.sz + z2.sz - inter AS DOUBLE), 6)
             AS jaccard
         FROM inter
         JOIN sizes z1 ON d1 = z1.doc_id
         JOIN sizes z2 ON d2 = z2.doc_id
         WHERE 10 * inter >= 9 * (z1.sz + z2.sz - inter)
         ORDER BY d1, d2""",
    "er_snm_multipass" ->
      s"""WITH $snmMultipassCteSql
         SELECT i.d1, i.d2, CAST(i.inter AS BIGINT) AS inter,
           CAST(z1.sz + z2.sz - i.inter AS BIGINT) AS uni,
           round(CAST(i.inter AS DOUBLE) /
             CAST(z1.sz + z2.sz - i.inter AS DOUBLE), 6) AS jaccard
         FROM inter i
         JOIN sizes z1 ON i.d1 = z1.doc_id
         JOIN sizes z2 ON i.d2 = z2.doc_id
         WHERE 10 * i.inter >= 9 * (z1.sz + z2.sz - i.inter)
         ORDER BY i.d1, i.d2""",
    "er_golden_record" ->
      s"""WITH RECURSIVE $snmMultipassCteSql,
         pr AS (SELECT i.d1, i.d2 FROM inter i
           JOIN sizes z1 ON i.d1 = z1.doc_id
           JOIN sizes z2 ON i.d2 = z2.doc_id
           WHERE 10 * i.inter >= 9 * (z1.sz + z2.sz - i.inter)),
         und AS (SELECT d1 AS src, d2 AS dst FROM pr
           UNION ALL SELECT d2, d1 FROM pr),
         nodes AS (SELECT DISTINCT src AS node FROM und),
         reach(node, rr) AS (SELECT node, node FROM nodes
           UNION
           SELECT reach.node, und.dst FROM reach
           JOIN und ON reach.rr = und.src),
         cc AS (SELECT node AS doc_id, MIN(rr) AS cluster
           FROM reach GROUP BY 1),
         mem AS (SELECT cc.doc_id, cc.cluster, d.n_chars, d.source
           FROM cc JOIN documents d USING (doc_id)),
         g AS (SELECT cluster, doc_id AS golden_doc,
             CAST(n_chars AS BIGINT) AS golden_chars,
             ROW_NUMBER() OVER (PARTITION BY cluster
               ORDER BY n_chars DESC, doc_id) AS rk
           FROM mem),
         st AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
             MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
           FROM mem GROUP BY 1),
         sm AS (SELECT cluster, source AS majority_source FROM (
             SELECT cluster, source, ROW_NUMBER() OVER (PARTITION BY cluster
               ORDER BY COUNT(*) DESC, source) AS mrk
             FROM mem GROUP BY cluster, source) WHERE mrk = 1)
         SELECT g.cluster, n_members, golden_doc, golden_chars,
           majority_source, min_doc, max_doc, total_chars
         FROM g JOIN st USING (cluster) JOIN sm USING (cluster)
         WHERE rk = 1 ORDER BY cluster""",
  )

  /** Shared DuckDB CTE chain for the SNM multipass candidate+verify
    * stages, ending in `inter(d1, d2, inter)` and `sizes(doc_id, sz)` —
    * composed by the er_snm_multipass oracle and er_golden_record's
    * transitive-closure oracle so the pair rule can never drift. */
  private def snmMultipassCteSql: String =
    s"""r1 AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY text, doc_id) - 1 AS rank
           FROM documents),
         r2 AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY reverse(text), doc_id) - 1 AS rank
           FROM documents),
         cand AS (
           -- explicit DISTINCT over UNION ALL, not bare UNION: under a
           -- composing WITH RECURSIVE prelude (er_golden_record) DuckDB
           -- stops deduplicating a bare UNION inside a non-recursive
           -- CTE, and a duplicated candidate would double its word
           -- intersection count and spuriously pass the Jaccard gate
           SELECT DISTINCT d1, d2 FROM (
             SELECT LEAST(a.doc_id, b.doc_id) AS d1,
               GREATEST(a.doc_id, b.doc_id) AS d2
             FROM r1 a JOIN r1 b ON b.rank - a.rank BETWEEN 1 AND $W
             UNION ALL
             SELECT LEAST(a.doc_id, b.doc_id) AS d1,
               GREATEST(a.doc_id, b.doc_id) AS d2
             FROM r2 a JOIN r2 b ON b.rank - a.rank BETWEEN 1 AND $W)),
         w AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
           FROM documents),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM w GROUP BY 1),
         inter AS (SELECT c.d1, c.d2, COUNT(*) AS inter
           FROM cand c
           JOIN w w1 ON c.d1 = w1.doc_id
           JOIN w w2 ON c.d2 = w2.doc_id AND w1.word = w2.word
           GROUP BY 1, 2)"""
}
