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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_ann_recall" -> (annRecall _),
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

  val oracles: Map[String, String] = Map(
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
