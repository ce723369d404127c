package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 LLM-pipeline extensions (SURVEY.md §2.J widening):
  * IVF-style ANN (the centroid-prune scale path next to [[Llm.annLsh]]'s
  * hyperplane buckets), n-gram frequency analysis, approximate percentiles
  * (sketch aggregate), and multimodal chunking plumbing.
  *
  * Scale notes (100 TB):
  *  - IVF: centroid computation is one partial-aggregable pass over
  *    (cell, dim) pairs — shuffle ∝ |cells|·dim, not data. Assignment is a
  *    broadcast join against the (tiny) centroid table; the candidate
  *    search is an equi-join on the cell id — never a cross join. With
  *    k ≫ 10 cells the same plan holds: the centroid table stays
  *    broadcast-sized (k·dim doubles) up to millions of cells.
  *  - Bigram mining reuses the exploded-token + lead-window shape of the
  *    MinHash shingler: one shuffle keyed by doc to order tokens, one
  *    aggregation shuffle keyed by (lang, bigram) — both ∝ token count.
  *  - approx_percentile is Spark's built-in KLL-ish quantile sketch:
  *    mergeable partial state, constant memory per group — the only way to
  *    do percentiles over 100 TB without a global sort.
  *  - Chunking is a row-local 1→N generator (no shuffle), the exact
  *    plumbing shape a binary media column needs for frame/segment
  *    sampling; payload here is the text column as bytes-equivalent.
  */
object Llm2 {

  /** Embedding dimensionality (FIXTURES.md: fixed dim=64). */
  private val Dim = 64

  private def dotCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.ArrayMath.dotProduct(a, b)
  private def normCol(a: org.apache.spark.sql.Column) =
    graft.functions.ArrayMath.l2Norm(a)

  /** The IVF probe stage, shared with [[Llm5.ivfpqAnn]]: per query
    * (vec_id<5) its nearest cell centroid — cells = label groups,
    * centroid = exact decimal-mean per dimension (deterministic across
    * engines and partition orders), probe = cosine over the broadcast
    * |labels|-row centroid table. Returns (qid, qemb, qnrm, cell). */
  private[graft] def ivfProbe(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
      .withColumn("nrm", normCol(col("emb")))

    // Centroids: mean per (label, dim) via exact decimal sums, reassembled
    // into an ordered array per label. |labels|·64 rows — broadcastable.
    val centroids = e
      .select(col("label"), posexplode(col("emb")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(davg(col("x")).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cemb"))
      .withColumn("cnrm", normCol(col("cemb")))

    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("nrm").as("qnrm"))

    // Probe: centroids ranked by cosine (broadcast nested-loop over k
    // rows); rn = 1 is the classic single probe, [[Llm19]] keeps rn <= p
    ivfProbeRankedFrom(q, centroids)
      .where(col("rn") === 1)
      .select(col("qid"), col("qemb"), col("qnrm"), col("label").as("cell"))
  }

  /** All centroids ranked per query — (qid, qemb, qnrm, label, cos_c,
    * rn); the multi-probe generalization reads rn <= nprobe. */
  private[graft] def ivfProbeRanked(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
      .withColumn("nrm", normCol(col("emb")))
    val centroids = e
      .select(col("label"), posexplode(col("emb")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(davg(col("x")).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cemb"))
      .withColumn("cnrm", normCol(col("cemb")))
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("nrm").as("qnrm"))
    ivfProbeRankedFrom(q, centroids)
  }

  private def ivfProbeRankedFrom(q: DataFrame, centroids: DataFrame): DataFrame = {
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("cos_c").desc, col("label").asc)
    q.crossJoin(broadcast(centroids))
      .select(col("qid"), col("qemb"), col("qnrm"), col("label"),
        round(dotCol(col("qemb"), col("cemb")) / (col("qnrm") * col("cnrm")), 6).as("cos_c"))
      .withColumn("rn", row_number().over(wProbe))
  }

  /** IVF (inverted-file) ANN: cells = label groups, centroid = exact
    * decimal-mean per dimension (deterministic across engines and partition
    * orders), probe = 1 nearest centroid, exact cosine re-rank inside the
    * probed cell. Output: per query (vec_id<5) its probed cell and top-3
    * neighbors there. */
  def ivfAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
      .withColumn("nrm", normCol(col("emb")))
    val probed = ivfProbe(spark, dir)

    // Search: equi-join on the probed cell, exact cosine top-3.
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    probed.join(e, probed("cell") === e("label") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("cell"), col("vec_id"),
        round(dotCol(col("qemb"), col("emb")) / (col("qnrm") * col("nrm")), 6).as("cos_r"))
      .withColumn("rn", row_number().over(wRank))
      .where(col("rn") <= 3)
      .orderBy("qid", "rn")
  }

  /** One full k-means assignment step over the embedding corpus: centroids
    * seeded from the label means (k=10, exact decimal means — same
    * machinery as [[ivfAnn]]), EVERY vector assigned to its nearest
    * centroid by cosine, then per-cluster size + mean member similarity.
    * The canonical distributed-ML iteration shape: centroid table stays
    * broadcast-sized, assignment is a broadcast nested-loop over k rows
    * (never a shuffle of the corpus), the stats are one partial-aggregable
    * pass. Iterating = re-running with recomputed centroids. */
  /** Shared by [[kmeansStep]] and [[centroidAccuracy]]: every vector
    * assigned to its nearest label-mean centroid by cosine. Returns
    * (vec_id, label [the TRUE label], cluster [the assigned one], cos_c).
    * Centroid table stays broadcast-sized; the assignment is a broadcast
    * nested-loop over k rows — never a shuffle of the corpus. */
  private def centroidAssignment(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .withColumn("emb", transform(col("embedding"), x => x.cast("double")))
      .withColumn("nrm", normCol(col("emb")))
    val centroids = e
      .select(col("label"), posexplode(col("emb")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(davg(col("x")).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cemb"))
      .withColumn("cnrm", normCol(col("cemb")))
      .select(col("label").as("cluster"), col("cemb"), col("cnrm"))

    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("cluster").asc)
    e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("label"), col("cluster"),
        round(dotCol(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")), 6).as("cos_c"))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
  }

  def kmeansStep(spark: SparkSession, dir: String): DataFrame =
    centroidAssignment(spark, dir)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_assigned"), davg(col("cos_c")).as("avg_cos"))
      .orderBy("cluster")

  /** Nearest-class-mean classification accuracy (the standard cheap probe
    * of embedding quality before training a real classifier: how often is
    * a vector's nearest label-centroid its OWN label?). Per true label:
    * membership count, correctly-assigned count, accuracy. The aggregate
    * runs on the |corpus|-row assignment — one label-keyed shuffle of
    * three columns; the centroid machinery is [[centroidAssignment]]'s
    * broadcast shape, so nothing here grows super-linearly. */
  def centroidAccuracy(spark: SparkSession, dir: String): DataFrame =
    centroidAssignment(spark, dir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cluster") === col("label"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("acc", round(col("n_correct").cast("double") / col("n").cast("double"), 6))
      .orderBy("label")

  /** Top-3 bigrams per language (n-gram frequency mining). Bigrams are
    * built with a codegen'd lead window over exploded word positions —
    * same shape as the MinHash shingler. */
  def ngramBigrams(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = documents(spark, dir)
      .select(col("lang"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 2)
      // adjacent pairs via zipped shifted slices: pure codegen'd array
      // builtins — no interpreted lambda, no per-doc window shuffle
      .select(col("lang"), explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p"))
      .select(col("lang"), concat_ws(" ", col("p.0"), col("p.1")).as("bg"))
    val wTop = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bg").asc)
    bigrams.groupBy("lang", "bg").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 3)
      .select(col("lang"), col("rn"), col("bg"), col("n"))
      .orderBy("lang", "rn")
  }

  /** Approximate percentiles (quantile sketch) of value per event type,
    * made fully oracle-checkable (round-9, VERDICT r8 #4, same contract
    * as agg_approx_distinct_users): the sketch picks an actual sample
    * value near the rank, so its raw output can't be a hash-gate column —
    * instead the declared output is the EXACT interpolated percentile
    * (oracle: quantile_cont) plus a verdict that the sketch value landed
    * inside the exact [p−2, p+2]-percentile band. accuracy=10000 bounds
    * the sketch's rank error by n/10000 rows, and the band is 0.02·n rows
    * on each side, so the verdict is deterministically TRUE at every
    * fixture SF (at sf0.001's n≈120/group the rank error is under one
    * row; at sf0.1 it is ≤12 rows vs a 2400-row band). */
  def approxPercentileValue(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        expr("approx_percentile(value, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(value, 0.9, 10000)").as("ap90"),
        expr("percentile(value, 0.48)").as("lo50"),
        expr("percentile(value, 0.52)").as("hi50"),
        expr("percentile(value, 0.88)").as("lo90"),
        expr("percentile(value, 0.92)").as("hi90"))
      .select(col("event_type"), col("n"), col("p50"), col("p90"),
        (col("ap50") >= col("lo50") && col("ap50") <= col("hi50")).as("ap50_in_band"),
        (col("ap90") >= col("lo90") && col("ap90") <= col("hi90")).as("ap90_in_band"))
      .orderBy("event_type")

  /** Multimodal chunking: split each payload into fixed 256-char segments
    * (frame/segment sampling plumbing for binary media columns): per chunk
    * its index, length, and portable content hash. */
  def mmChunkText(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .where(col("doc_id") < 50)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .select(col("doc_id"), col("text"),
        // at least one chunk even for empty text: Spark's sequence(0,-1)
        // would DESCEND ([0,-1]) while DuckDB's range(0,0) is empty
        posexplode(sequence(lit(0),
          greatest(lit(0L), ceil(col("n_chars").cast("double") / 256.0) - 1).cast("int"))).as(Seq("ord", "idx")))
      .select(col("doc_id"), col("idx"),
        expr("substr(text, idx * 256 + 1, 256)").as("chunk"))
      .select(col("doc_id"), col("idx"),
        length(col("chunk")).as("chunk_len"),
        h48(col("chunk")).as("chunk_h48"))
      .orderBy("doc_id", "idx")

  /** REAL multimodal resize + feature extraction (round-9; the hash-derived
    * stand-in retired with [[graft.ops.MmDecode]]): decode the synthesized
    * PNG/BMP payload with `javax.imageio`, resize through Graphics2D to an
    * aspect-preserving 224-px bounding box (reported dims are what the
    * resized raster actually measures), and extract per-channel raster
    * means as the feature vector. The oracle predicts every column in
    * closed form (dims from n_chars, means as exact-integer-sum averages
    * over the deterministic pixels), so a codec or raster-walk regression
    * fails the hash gate. Row-local end-to-end. */
  def mmResizeFeature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fanout(documents(spark, dir)
        .select(col("doc_id"), col("n_chars").cast("int").as("n_chars")))
      .as[(Long, Int)] // fanout: r17, see Tables.fanout
      .mapPartitions(_.map { case (id, nc) =>
        graft.ops.MmDecode.resizeFeature(
          graft.ops.MmDecode.Payload(id, graft.ops.MmDecode.synthesize(id, nc)))
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Multimodal VIDEO frame sampling over a REAL container (round-10;
    * the last multimodal stub retired — see the video section of
    * [[graft.ops.MmDecode]]): each document's payload is synthesized as
    * a genuine animated GIF (2–13 frames, per-frame 25 fps
    * GraphicControlExtension delays, frame pixels varying per frame)
    * and then DEMUXED — frame count from a real container scan, 4
    * uniform sample points at ⌊j·n/4⌋ decoded from the true sequence,
    * timestamps from the parsed per-frame delay, mean gray from the
    * decoded raster. The oracle predicts all of it in closed form from
    * (doc_id, n_chars), so wrong count / order / timing / raster fails
    * the hash gate. Row-local `mapPartitions` end-to-end — the
    * frame-sample pass of a video pipeline shuffles nothing before its
    * sink, and at 100 TB the decode parallelism is the scan
    * parallelism. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .where(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars").cast("int").as("n_chars"))
      // codec work is CPU-bound per ROW while the input is a tiny
      // 2-column projection: spread it across cores even when the scan
      // is one parquet file (the local fixture), at the price of one
      // negligible 16-byte-per-row shuffle. Round 17: the hard-coded 32
      // became Tables.fanout — parallelism now derives from the session
      // core count and never shrinks an already-parallel scan.
      .transform(fanout)
      .as[(Long, Int)]
      .mapPartitions(_.flatMap { case (id, nc) =>
        graft.ops.MmDecode.sampleFrames(
          graft.ops.MmDecode.Payload(id, graft.ops.MmDecode.synthesizeVideo(id, nc)))
      })
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  // ------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_frame_sample" -> (mmFrameSample _),
    "llm_kmeans_step" -> (kmeansStep _),
    "mm_resize_feature" -> (mmResizeFeature _),
    "llm_ivf_ann" -> (ivfAnn _),
    "llm_ngram_bigrams" -> (ngramBigrams _),
    "agg_approx_percentile" -> (approxPercentileValue _),
    "mm_chunk_text" -> (mmChunkText _),
    "llm_centroid_accuracy" -> (centroidAccuracy _),
  )

  private def dsumSql(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"
  /** DuckDB dot product over the first 64 positions, double index-order. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1,${Dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def normSql(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  val oracles: Map[String, String] = Map(
    "llm_centroid_accuracy" ->
      s"""WITH ex AS (SELECT label, vec_id,
            CAST(unnest(embedding) AS DOUBLE) AS x,
            CAST(unnest(range(0, len(embedding))) AS INT) AS pos
          FROM embeddings),
          cd AS (SELECT label, pos,
            ${dsumSql("x")} / CAST(COUNT(x) AS DOUBLE) AS c
          FROM ex GROUP BY 1, 2),
          cent AS (SELECT label AS cluster, list(c ORDER BY pos) AS cemb FROM cd GROUP BY 1),
          centn AS (SELECT cluster, cemb, ${normSql("cemb")} AS cnrm FROM cent),
          e AS (SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm
            FROM embeddings),
          scored AS (SELECT e.vec_id, e.label, c.cluster,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY round(${dotSql("e.embedding", "c.cemb")} / (e.nrm * c.cnrm), 6) DESC,
                         c.cluster ASC) AS rn
            FROM e CROSS JOIN centn c)
          SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN cluster = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
            round(CAST(SUM(CASE WHEN cluster = label THEN 1 ELSE 0 END) AS DOUBLE)
              / COUNT(*), 6) AS acc
          FROM scored WHERE rn = 1
          GROUP BY 1 ORDER BY 1""",
    "mm_frame_sample" ->
      """WITH f AS (
           SELECT doc_id, CAST((n_chars % 12) + 2 AS BIGINT) AS n_frames,
             CAST((n_chars % 16) + 1 AS BIGINT) AS w
           FROM documents WHERE n_chars > 0),
         i AS (
           SELECT doc_id, n_frames, w,
             unnest(list_distinct(list_transform(range(0, 4),
               j -> CAST(FLOOR(j * n_frames / 4.0) AS BIGINT)))) AS frame_idx
           FROM f),
         m AS (
           SELECT *, (doc_id + 17 * frame_idx) % 256 AS a FROM i)
         SELECT doc_id, n_frames, frame_idx, frame_idx * 40 AS frame_ts_ms,
           CAST(w * a + (w * (w - 1)) // 2
             - 256 * GREATEST(0, a + w - 256) AS DOUBLE) / w AS mean_gray
         FROM m ORDER BY doc_id, frame_idx""",
    "llm_ivf_ann" ->
      s"""WITH ex AS (SELECT label, vec_id,
            CAST(unnest(embedding) AS DOUBLE) AS x,
            CAST(unnest(range(0, len(embedding))) AS INT) AS pos
          FROM embeddings),
          cd AS (SELECT label, pos,
            ${dsumSql("x")} / CAST(COUNT(x) AS DOUBLE) AS c
          FROM ex GROUP BY 1, 2),
          cent AS (SELECT label, list(c ORDER BY pos) AS cemb FROM cd GROUP BY 1),
          centn AS (SELECT label, cemb, ${normSql("cemb")} AS cnrm FROM cent),
          e AS (SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
          q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm FROM e WHERE vec_id < 5),
          probed0 AS (SELECT qid, qemb, qnrm, c.label,
              round(${dotSql("qemb", "c.cemb")} / (qnrm * c.cnrm), 6) AS cos_c,
              ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY round(${dotSql("qemb", "c.cemb")} / (qnrm * c.cnrm), 6) DESC,
                         c.label ASC) AS rn
            FROM q CROSS JOIN centn c),
          probed AS (SELECT qid, qemb, qnrm, label AS cell FROM probed0 WHERE rn = 1),
          scored AS (SELECT qid, cell, e.vec_id,
              round(${dotSql("qemb", "e.embedding")} / (qnrm * e.nrm), 6) AS cos_r
            FROM probed JOIN e ON probed.cell = e.label AND qid != e.vec_id),
          ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cos_r DESC, vec_id ASC) AS rn FROM scored)
          SELECT qid, cell, vec_id, cos_r, CAST(rn AS INT) AS rn
          FROM ranked WHERE rn <= 3 ORDER BY qid, rn""",
    "llm_ngram_bigrams" ->
      """WITH w AS (SELECT lang, doc_id, string_split(text, ' ') AS ws FROM documents),
         bg AS (SELECT lang, unnest(list_transform(range(1, len(ws)),
             i -> ws[i] || ' ' || ws[i+1])) AS bg
           FROM w WHERE len(ws) >= 2),
         cnt AS (SELECT lang, bg, CAST(COUNT(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2),
         ranked AS (SELECT lang, bg, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bg ASC) AS rn
           FROM cnt)
         SELECT lang, CAST(rn AS INT) AS rn, bg, n
         FROM ranked WHERE rn <= 3 ORDER BY lang, rn""",
    "llm_kmeans_step" ->
      s"""WITH ex AS (SELECT label, vec_id,
            CAST(unnest(embedding) AS DOUBLE) AS x,
            CAST(unnest(range(0, len(embedding))) AS INT) AS pos
          FROM embeddings),
          cd AS (SELECT label, pos,
            ${dsumSql("x")} / CAST(COUNT(x) AS DOUBLE) AS c
          FROM ex GROUP BY 1, 2),
          cent AS (SELECT label AS cluster, list(c ORDER BY pos) AS cemb FROM cd GROUP BY 1),
          centn AS (SELECT cluster, cemb, ${normSql("cemb")} AS cnrm FROM cent),
          e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
          scored AS (SELECT e.vec_id, c.cluster,
              round(${dotSql("e.embedding", "c.cemb")} / (e.nrm * c.cnrm), 6) AS cos_c,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY round(${dotSql("e.embedding", "c.cemb")} / (e.nrm * c.cnrm), 6) DESC,
                         c.cluster ASC) AS rn
            FROM e CROSS JOIN centn c)
          SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_assigned,
            ${dsumSql("cos_c")} / CAST(COUNT(cos_c) AS DOUBLE) AS avg_cos
          FROM scored WHERE rn = 1
          GROUP BY 1 ORDER BY 1""",
    "mm_resize_feature" ->
      // closed-form prediction of the REAL decode: dims from n_chars,
      // channel means as exact-integer-sum averages over the synthetic
      // pixels r=(id+y)%256 (x-invariant), g=(2id+x)%256 (y-invariant),
      // b=(3id+x+y)%256 (full raster). All sums are exact in double, so
      // the single final division matches the JVM bit-for-bit.
      """WITH d AS (SELECT doc_id,
            CAST(n_chars % 64 + 1 AS INT) AS w0,
            CAST((n_chars // 64) % 48 + 1 AS INT) AS h0
          FROM documents)
        SELECT doc_id, w0, h0,
          CAST(w0 * 224 // greatest(w0, h0) AS INT) AS rw,
          CAST(h0 * 224 // greatest(w0, h0) AS INT) AS rh,
          list_sum(list_transform(range(h0),
            y -> CAST((doc_id + y) % 256 AS DOUBLE))) / h0 AS mean_r,
          list_sum(list_transform(range(w0),
            x -> CAST((doc_id * 2 + x) % 256 AS DOUBLE))) / w0 AS mean_g,
          list_sum(list_transform(range(h0), y ->
            list_sum(list_transform(range(w0),
              x -> CAST((doc_id * 3 + x + y) % 256 AS DOUBLE)))))
            / (w0 * h0) AS mean_b
        FROM d ORDER BY doc_id""",
    "agg_approx_percentile" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
         round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
         TRUE AS ap50_in_band, TRUE AS ap90_in_band
         FROM events GROUP BY 1 ORDER BY 1""",
    "mm_chunk_text" -> {
      val h = graft.Tables.h48Sql("chunk")
      s"""WITH c AS (SELECT doc_id,
            CAST(unnest(range(0, greatest(1, CAST(ceil(n_chars / 256.0) AS INT)))) AS INT) AS idx,
            text
          FROM documents WHERE doc_id < 50),
          ch AS (SELECT doc_id, idx, substr(text, idx * 256 + 1, 256) AS chunk FROM c)
          SELECT doc_id, idx, CAST(length(chunk) AS INT) AS chunk_len,
            $h AS chunk_h48
          FROM ch ORDER BY doc_id, idx"""
    },
  )
}
