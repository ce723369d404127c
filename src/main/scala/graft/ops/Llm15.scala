package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16: the ANN quality audit (VERDICT r15 #6) — recall@5 of every
  * approximate index in the family (LSH hyperplane buckets, IVF
  * centroid probe, PQ asymmetric-distance, IVF-PQ) against the EXACT
  * cosine top-5 ground truth (`llm_sim_topk`'s semantics) on one shared
  * query set, plus the candidate-scan cost per query — the
  * recall-vs-cost readout a pipeline owner actually reads before
  * choosing an index (Johnson, Douze & Jégou, IEEE TBD 2019 — the FAISS
  * evaluation discipline: every index is a point on this curve).
  *
  * Composition, not re-implementation: the LSH bucketed frame
  * ([[Llm.lshFrame]]), the IVF probe ([[Llm2.ivfProbe]]) and the PQ
  * ADC distance table ([[Llm5.adcDistances]]) are the SAME internals
  * the four green index keys run, so this key audits the shipped
  * code paths. Each method retrieves its own top-5 (cosine for
  * bucket/cell scans, ADC ascending for the PQ pair), hits are counted
  * against the exact set, and the per-method summary averages over the
  * shared |Q| = 5 query set. Recall values are exact multiples of
  * 1/(5·5) and candidate counts are integers, so the round-6 doubles
  * are engine-stable. Scan shape: every stage is an existing key's
  * plan (bucket equi-joins, broadcast probes, code joins); the audit
  * adds only |Q|-grain joins on top. */
object Llm15 {

  private def dotCol(a: Column, b: Column) =
    graft.functions.ArrayMath.dotProduct(a, b)
  private def normCol(a: Column) =
    graft.functions.ArrayMath.l2Norm(a)

  private val K = 5 // retrieval depth AND |Q| (queries = vec_id < 5)

  /** Ground-truth stop-shingle document-frequency cap — see
    * [[bandAudit]]'s scaladoc for the measured rationale. */
  private[graft] val StopShingleDf = 8

  private def top5(scored: DataFrame, ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(ord: _*)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= K)
      .select(col("qid"), col("vec_id"))
  }

  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
      .withColumn("nrm", normCol(col("emb")))
      .select(col("vec_id"), col("label"), col("emb"), col("nrm"))

    val qs = e.where(col("vec_id") < K).select(col("vec_id").as("qid"))
    // ground truth: the exact cosine top-5 (llm_sim_topk's kernel)
    val exact = Llm.simTopk(spark, dir).where(col("qid") < K)
      .select(col("qid"), col("vec_id"))

    // --- LSH: candidates share the 6-bit hyperplane bucket
    val lshE = Llm.lshFrame(spark, dir)
    val lshScored = lshE.where(col("vec_id") < K)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("nrm").as("qnrm"), col("bucket"))
      .join(lshE.select(col("vec_id"), col("embedding"), col("nrm"), col("bucket")),
        Seq("bucket"))
      .where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(dotCol(col("qemb"), col("embedding")) / (col("qnrm") * col("nrm")), 6)
          .as("cos_r"))

    // --- IVF: candidates live in the one probed centroid cell
    val ivfScored = Llm2.ivfProbe(spark, dir)
      .join(e, col("cell") === e("label") && col("qid") =!= e("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(dotCol(col("qemb"), col("emb")) / (col("qnrm") * col("nrm")), 6)
          .as("cos_r"))

    // --- PQ: the full ADC table (code scan over the whole corpus)
    val pqScored = Llm5.adcDistances(spark, dir)

    // --- IVF-PQ: the ADC table restricted to the probed cell
    val ivfpqScored = pqScored
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .join(broadcast(Llm2.ivfProbe(spark, dir)
          .select(col("qid").as("pqid"), col("cell"))),
        col("pqid") === col("qid") && col("label") === col("cell"))
      .select(col("qid"), col("vec_id"), col("adc"))

    def methodRow(m: String, retrieved: DataFrame, cand: DataFrame): DataFrame = {
      val hits = retrieved.join(exact, Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).as("hits"))
      val ncand = cand.groupBy("qid").agg(count(lit(1)).as("ncand"))
      qs.join(hits, Seq("qid"), "left").join(ncand, Seq("qid"), "left")
        .agg(count(lit(1)).as("n_queries"),
          round(avg(coalesce(col("hits"), lit(0L)).cast("double") / K), 6)
            .as("avg_recall"),
          round(min(coalesce(col("hits"), lit(0L)).cast("double") / K), 6)
            .as("min_recall"),
          round(avg(coalesce(col("ncand"), lit(0L)).cast("double")), 6)
            .as("avg_candidates"))
        .select(lit(m).as("method"), col("n_queries"), col("avg_recall"),
          col("min_recall"), col("avg_candidates"))
    }

    // the exact row is the anchor: recall 1 by definition, candidates =
    // the full corpus minus self — the cost the approximate rows undercut
    val exactScan = e.select(col("vec_id")).crossJoin(
      broadcast(qs)).where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"))

    methodRow("exact", exact, exactScan)
      .unionAll(methodRow("ivf", top5(ivfScored,
        Seq(col("cos_r").desc, col("vec_id").asc)), ivfScored))
      .unionAll(methodRow("ivfpq", top5(ivfpqScored,
        Seq(col("adc").asc, col("vec_id").asc)), ivfpqScored))
      .unionAll(methodRow("lsh", top5(lshScored,
        Seq(col("cos_r").desc, col("vec_id").asc)), lshScored))
      .unionAll(methodRow("pq", top5(pqScored,
        Seq(col("adc").asc, col("vec_id").asc)), pqScored))
      .orderBy("method")
  }

  /** L399 — LSH banding-parameter audit over the SHARED k=8 MinHash
    * signatures (Leskovec, Rajaraman & Ullman, MMDS ch. 3 — the (b, r)
    * S-curve every dedup deployment tunes: P(candidate | s) =
    * 1 − (1 − sʳ)ᵇ with midpoint s* = (1/b)^(1/r)): the four ways to
    * band 8 minhashes — (8,1), (4,2), (2,4), (1,8) — each swept for
    * candidate volume (the COST), recall and precision against the
    * corpus's exact-Jaccard ground truth. Ground truth is planted and
    * clean: the fixture's shingle-Jaccard pair landscape is bimodal
    * (28 near-dup pairs ≥ 0.8, ~12k background pairs < 0.2, nothing
    * between at any SF), so "true pair" ⟺ Jaccard ≥ 0.5 with wide
    * margins on both sides — no boundary float risk. s* midpoints are
    * JVM-precomputed round-6 literals shared with the oracle (the
    * BhCrit convention — no cross-engine pow). Scale shape: signatures
    * are the one corpus aggregate (reused across configs); candidates
    * are bucket-collision pairs per config (the L23 discipline); the
    * ground-truth join is stop-shingle-capped (below) — never
    * all-pairs.
    *
    * STOP-SHINGLE CAP (the measured scale fix): the naive ground-truth
    * self-join on raw shingles is NOT collision-proportional on a
    * saturated-vocabulary corpus — at sf0.1 the median shingle sits in
    * 9 documents and Σ C(df, 2) reaches 1.27 M pairs (measured; 15 k at
    * sf0.001 — quadratic in corpus size). Ground truth therefore uses
    * INFORMATIVE shingles only (document frequency ≤ [[StopShingleDf]]
    * — the boilerplate cut every production shingle-dedup applies),
    * bounding per-shingle pair volume at C(8,2) = linear in distinct
    * shingles at ANY corpus size (195 k at sf0.1, 6.5× less). Measured
    * semantics cost: ZERO at the correctness gate (max df at sf0.01 is
    * 7 — the cap is inert there, and at sf0.001 the 28-pair truth set
    * is IDENTICAL with and without the cut, which Round16cSpec's
    * uncapped brute-force equality pins); near-identical replicas
    * share their rare shingles, so informative-Jaccard keeps them. The
    * per-config rows carry `n_stop_shingles` so the cut is visible in
    * the output, not silent. Signatures/candidates are untouched — the
    * production MinHash path hashes ALL shingles.
    *
    * Cost (measured sf0.1, local[32]): 4.3 s/rep — an audit-tier
    * superset of llm_dedup_near's 2.0 s (same signature kernel, but
    * FOUR band configurations instead of one, plus the exact
    * ground-truth pass); run at tuning cadence, not per-batch. */
  def bandAudit(spark: SparkSession, dir: String): DataFrame = {
    val configs = Seq((8, 1), (4, 2), (2, 4), (1, 8))
    val sigs = Llm.minhashSigs(spark, dir).localCheckpoint(true)

    // exact-Jaccard ground truth over distinct INFORMATIVE 3-word shingles
    // (round 17: Tables.fanout here was tried and REVERTED — the audit's
    // cost is the self-join/aggregate chain, not this scan, and the key
    // regressed 2.15→3.53 s with the extra exchanges in the suite run)
    val sh = documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(ws) - 2), " +
          "i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1]))"))).as("s"))
      .localCheckpoint(true) // consumed by dfreq AND both shi self-join sides
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val shi = sh.join(dfreq.where(col("df") <= StopShingleDf), "s")
      .select(col("doc_id"), col("s"))
    val nStop = dfreq.where(col("df") > StopShingleDf)
      .agg(count(lit(1)).as("n_stop_shingles"))
    val cnt = shi.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val truePairs = shi.as("a").join(shi.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("ix"))
      .join(cnt.select(col("doc_id").as("doc1"), col("n").as("na")), "doc1")
      .join(cnt.select(col("doc_id").as("doc2"), col("n").as("nb")), "doc2")
      .where(col("ix").cast("double") /
        (col("na") + col("nb") - col("ix")).cast("double") >= 0.5)
      .select(col("doc1"), col("doc2"))
      .localCheckpoint(true)

    def configRow(b: Int, r: Int): DataFrame = {
      val bandsCol = array((0 until b).map { j =>
        struct(lit(j).as("band"),
          concat_ws("_", (0 until r).map(i => col(s"m${j * r + i}")): _*).as("sig"))
      }: _*)
      val cand = sigs.select(col("doc_id"), explode(bandsCol).as("bd"))
        .select(col("doc_id"), col("bd.band").as("band"), col("bd.sig").as("sig"))
        .groupBy("band", "sig")
        .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")) > 1)
        .select(explode(expr(
          "flatten(transform(ids, (x, i) -> " +
            "transform(slice(ids, i + 2, size(ids)), " +
            "y -> struct(x AS doc1, y AS doc2))))")).as("p"))
        .select(col("p.doc1").as("doc1"), col("p.doc2").as("doc2"))
        .distinct()
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      val nTrue = truePairs.agg(count(lit(1)).as("n_true"))
      val nDet = cand.join(truePairs, Seq("doc1", "doc2"))
        .agg(count(lit(1)).as("n_detected"))
      val sStar = BigDecimal(math.pow(1.0 / b, 1.0 / r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      nCand.crossJoin(nTrue).crossJoin(nDet).crossJoin(nStop)
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          lit(sStar).as("s_star"), col("n_candidates"), col("n_true"),
          col("n_detected"), col("n_stop_shingles"),
          round(col("n_detected").cast("double") / col("n_true"), 6).as("recall"),
          when(col("n_candidates") > 0,
            round(col("n_detected").cast("double") / col("n_candidates"), 6))
            .otherwise(lit(null).cast("double")).as("precision"))
    }
    configs.map { case (b, r) => configRow(b, r) }
      .reduce(_ unionAll _).orderBy(col("bands").desc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_ann_recall" -> (annRecall _),
    "llm_dedup_band_audit" -> (bandAudit _),
  )

  // ---------- DuckDB oracle: the four index oracles' CTEs composed ----

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def normSql(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  private def methodSql(m: String, five: String, cand: String): String =
    s"""SELECT '$m' AS method,
        CAST(COUNT(*) AS BIGINT) AS n_queries,
        round(AVG(COALESCE(h.hits, 0) / 5.0), 6) AS avg_recall,
        round(MIN(COALESCE(h.hits, 0) / 5.0), 6) AS min_recall,
        round(AVG(COALESCE(nc.ncand, 0) * 1.0), 6) AS avg_candidates
      FROM qs
      LEFT JOIN (SELECT fv.qid, COUNT(*) AS hits
        FROM $five fv JOIN ext5 gt ON fv.qid = gt.qid AND fv.vec_id = gt.vec_id
        GROUP BY 1) h USING (qid)
      LEFT JOIN (SELECT qid, COUNT(*) AS ncand FROM $cand GROUP BY 1) nc USING (qid)"""

  private def bandAuditOracle: String = {
    val mins = Llm.MinhashA.zipWithIndex.map { case (a, i) =>
      s"MIN((c*$a + ${Llm.minhashB(i)}) % ${Llm.P}) AS m$i"
    }.mkString(", ")
    def cfg(b: Int, r: Int): String = {
      val bandSelects = (0 until b).map { j =>
        val sig = (0 until r).map(i => s"CAST(m${j * r + i} AS VARCHAR)")
          .mkString(" || '_' || ")
        s"SELECT doc_id, $j AS band, $sig AS sig FROM m"
      }.mkString(" UNION ALL ")
      val sStar = BigDecimal(math.pow(1.0 / b, 1.0 / r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
          $sStar AS s_star,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM (
            SELECT DISTINCT b1.doc_id, b2.doc_id FROM ($bandSelects) b1
            JOIN ($bandSelects) b2 ON b1.band = b2.band AND b1.sig = b2.sig
              AND b1.doc_id < b2.doc_id)) AS n_candidates,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM tp) AS n_true,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM (
            SELECT DISTINCT b1.doc_id AS doc1, b2.doc_id AS doc2
            FROM ($bandSelects) b1 JOIN ($bandSelects) b2
              ON b1.band = b2.band AND b1.sig = b2.sig AND b1.doc_id < b2.doc_id)
            cd JOIN tp ON cd.doc1 = tp.doc1 AND cd.doc2 = tp.doc2) AS n_detected"""
    }
    val rows = Seq((8, 1), (4, 2), (2, 4), (1, 8)).map { case (b, r) => cfg(b, r) }
      .mkString("\n UNION ALL ")
    s"""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
          WHERE len(string_split(text,' ')) >= 3),
        sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws)-1),
          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM w),
        h AS (SELECT doc_id, ${graft.Tables.h48Sql("s")} AS c FROM sh),
        m AS MATERIALIZED (SELECT doc_id, $mins FROM h GROUP BY doc_id),
        dfq AS MATERIALIZED (SELECT s, CAST(COUNT(*) AS BIGINT) AS df
          FROM sh GROUP BY 1),
        shi AS MATERIALIZED (SELECT doc_id, sh.s FROM sh
          JOIN dfq ON dfq.s = sh.s AND dfq.df <= $StopShingleDf),
        cnts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shi GROUP BY 1),
        inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
            CAST(COUNT(*) AS BIGINT) AS ix
          FROM shi a JOIN shi b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        tp AS MATERIALIZED (SELECT doc1, doc2 FROM inter
          JOIN cnts ca ON ca.doc_id = doc1 JOIN cnts cb ON cb.doc_id = doc2
          WHERE ix * 1.0 / (ca.n + cb.n - ix) >= 0.5)
      SELECT bands, rows_per_band, s_star, n_candidates, n_true, n_detected,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM dfq WHERE df > $StopShingleDf) AS n_stop_shingles,
        round(n_detected * 1.0 / n_true, 6) AS recall,
        CASE WHEN n_candidates > 0
          THEN round(n_detected * 1.0 / n_candidates, 6) END AS precision
      FROM ($rows) ORDER BY bands DESC"""
  }

  val oracles: Map[String, String] = Map(
    "llm_dedup_band_audit" -> bandAuditOracle,
    "llm_ann_recall" -> {
      val hw = s"(${graft.Tables.h48Sql("(j || '_' || i)")} % 2001 - 1000)"
      s"""WITH ${Llm5.subSql},
        ${Llm5.ivfProbeSql},
        qs AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 5),
        -- exact cosine top-5 ground truth (the llm_sim_topk oracle, q < 5)
        exsc AS (SELECT q.vec_id AS qid, c.vec_id,
            round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos_r
          FROM e2 q JOIN e2 c ON q.vec_id < 5 AND q.vec_id != c.vec_id),
        ext5 AS (SELECT qid, vec_id FROM (SELECT *, ROW_NUMBER() OVER
            (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM exsc)
          WHERE rn <= 5),
        -- LSH buckets (the llm_ann_lsh oracle)
        bits AS (SELECT vec_id, j,
            CASE WHEN list_sum(list_transform(range(1,65),
                i -> CAST(embedding[i] AS DOUBLE) * CAST($hw AS DOUBLE))) >= 0
              THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END AS bit
          FROM embeddings CROSS JOIN (SELECT unnest(range(0,6)) AS j) js),
        buckets AS (SELECT vec_id, CAST(SUM(bit) AS BIGINT) AS bucket
          FROM bits GROUP BY 1),
        eb AS (SELECT e2.vec_id, embedding, nrm, bucket
          FROM e2 JOIN buckets USING (vec_id)),
        lshsc AS (SELECT q.vec_id AS qid, c.vec_id,
            round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos_r
          FROM eb q JOIN eb c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
          WHERE q.vec_id < 5),
        lsh5 AS (SELECT qid, vec_id FROM (SELECT *, ROW_NUMBER() OVER
            (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM lshsc)
          WHERE rn <= 5),
        -- IVF probed-cell scan (the llm_ivf_ann oracle, top-5)
        ivfsc AS (SELECT p.qid, c.vec_id,
            round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos_r
          FROM probed p JOIN e2 q ON q.vec_id = p.qid
            JOIN e2 c ON c.label = p.cell AND c.vec_id != p.qid),
        ivf5 AS (SELECT qid, vec_id FROM (SELECT *, ROW_NUMBER() OVER
            (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM ivfsc)
          WHERE rn <= 5),
        -- PQ ADC over all codes (the llm_pq_ann oracle)
        lut AS (SELECT v.vec_id AS qid, v.s, c.j,
            round(v.snn - 2 * list_sum(list_transform(range(1, 9),
              i -> CAST(v.sv[i] * c.cemb[i] AS DOUBLE))) + c.cnn, 6) AS dr
          FROM subn v JOIN cb c USING (s) WHERE v.vec_id < 5),
        adc AS (SELECT l.qid, y.vec_id,
            CAST(SUM(CAST(l.dr AS DECIMAL(18,6))) AS DOUBLE) AS adc
          FROM codes y JOIN lut l ON y.s = l.s AND y.code = l.j
            AND l.qid != y.vec_id
          GROUP BY 1, 2),
        pq5 AS (SELECT qid, vec_id FROM (SELECT *, ROW_NUMBER() OVER
            (PARTITION BY qid ORDER BY adc ASC, vec_id ASC) AS rn FROM adc)
          WHERE rn <= 5),
        -- IVF-PQ: the ADC table restricted to the probed cell
        ipqsc AS (SELECT a.qid, a.vec_id, a.adc
          FROM adc a JOIN embeddings y ON y.vec_id = a.vec_id
            JOIN probed p ON p.qid = a.qid AND y.label = p.cell),
        ipq5 AS (SELECT qid, vec_id FROM (SELECT *, ROW_NUMBER() OVER
            (PARTITION BY qid ORDER BY adc ASC, vec_id ASC) AS rn FROM ipqsc)
          WHERE rn <= 5),
        exsc_cand AS (SELECT qid, vec_id FROM exsc)
        SELECT * FROM (
          ${methodSql("exact", "ext5", "exsc_cand")}
          UNION ALL ${methodSql("ivf", "ivf5", "ivfsc")}
          UNION ALL ${methodSql("ivfpq", "ipq5", "ipqsc")}
          UNION ALL ${methodSql("lsh", "lsh5", "lshsc")}
          UNION ALL ${methodSql("pq", "pq5", "adc")})
        ORDER BY method"""
    },
  )
}
