package graft

import graft.functions.CountMin
import graft.ops.{Llm6, MmAudio}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Round-9 continuation: the sketch-backed corpus operators (Bloom
  * prefilter, count-min) and the real WAV audio codec. */
class Round9bSpec extends SparkTestBase {

  private def tokens = Tables.documents(spark, sf0001)
    .select(explode(split(col("text"), " ")).as("token"))

  test("count-min sketch is partition-invariant: partial/merge ≡ one-partition build") {
    // Cell-wise counter addition must make the ObjectHashAggregate
    // partial/final split exact — any partition-count dependence here
    // would make the 100 TB answer depend on task layout.
    def sk(parts: Int): Seq[Long] = tokens.repartition(parts)
      .agg(CountMin.sketch(Tables.h48(col("token")), 4, 16).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(sk(1) == sk(13))
  }

  test("count-min never underestimates and a JVM replica reproduces every counter") {
    val toks = tokens.as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val (depth, width) = (4, 16)
    val P = 2147483647L
    // independent replica of the sketch from first principles
    val buf = new Array[Long](depth * width)
    toks.foreach { t =>
      val xm = java.lang.Math.floorMod(Tables.h48jvm(t), P)
      (0 until depth).foreach { j =>
        val a = (2L * j + 1) * 1299721L % P
        val b = (j * 15485863L + 11L) % P
        buf(j * width + (((a * xm + b) % P) % width).toInt) += 1L
      }
    }
    val sk = tokens
      .agg(CountMin.sketch(Tables.h48(col("token")), depth, width).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(sk == buf.toSeq, "distributed sketch ≠ JVM replica")
    // every estimate ≥ exact count (the one-sided CMS error guarantee)
    val exact = toks.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    exact.foreach { case (t, n) =>
      val xm = java.lang.Math.floorMod(Tables.h48jvm(t), P)
      val est = (0 until depth).map { j =>
        val a = (2L * j + 1) * 1299721L % P
        val b = (j * 15485863L + 11L) % P
        buf(j * width + (((a * xm + b) % P) % width).toInt)
      }.min
      assert(est >= n, s"CMS underestimated '$t': $est < $n")
    }
    // width 16 < vocabulary ⇒ collisions must exist: some overcount > 0
    assert(exact.exists { case (t, n) =>
      val xm = java.lang.Math.floorMod(Tables.h48jvm(t), P)
      (0 until depth).map { j =>
        val a = (2L * j + 1) * 1299721L % P
        val b = (j * 15485863L + 11L) % P
        buf(j * width + (((a * xm + b) % P) % width).toInt)
      }.min > n
    }, "expected at least one colliding token at width 16")
  }

  test("bloom-prefiltered decontamination is EXACT: ≡ the unfiltered confirm join") {
    // replica of the same summary WITHOUT the bloom stage
    def grams(src: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
        : org.apache.spark.sql.DataFrame =
      Tables.documents(spark, sf0001)
        .where(src(col("source")))
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= 3)
        .select(col("doc_id"), col("source"), explode(arrays_zip(
          slice(col("ws"), lit(1), size(col("ws")) - 2),
          slice(col("ws"), lit(2), size(col("ws")) - 2),
          slice(col("ws"), lit(3), size(col("ws")) - 2))).as("g"))
        .select(col("doc_id"), col("source"),
          concat_ws(" ", col("g.0"), col("g.1"), col("g.2")).as("gram"))
    val bench = grams(_ === "src0").select("gram").distinct()
    val shared = grams(_ =!= "src0").select("doc_id", "gram").distinct()
      .join(broadcast(bench), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val expected = Tables.documents(spark, sf0001)
      .where(col("source") =!= "src0").select("doc_id", "source")
      .join(shared, Seq("doc_id"), "left")
      .withColumn("c", coalesce(col("n") >= 3, lit(false)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("c"), 1L).otherwise(0L)).as("n_contaminated"),
        sum(when(col("c"), 0L).otherwise(1L)).as("n_clean"))
      .orderBy("source").collect().toSeq
    val got = Llm6.bloomDecontaminate(spark, sf0001).collect().toSeq
    assert(got == expected)
  }

  test("bloom prefilter prunes: true members all pass, non-members mostly rejected") {
    val docs = Tables.documents(spark, sf0001)
    val g = docs.select(col("source"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 3)
      .select(col("source"), explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 2),
        slice(col("ws"), lit(2), size(col("ws")) - 2),
        slice(col("ws"), lit(3), size(col("ws")) - 2))).as("gr"))
      .select(col("source"),
        concat_ws(" ", col("gr.0"), col("gr.1"), col("gr.2")).as("gram"))
    val bench = g.where(col("source") === "src0").select("gram").distinct()
    val sk = Tables.boundedCollect(bench.agg(ColumnBridge.column(
      BloomFilterAggregate(ColumnBridge.expression(xxhash64(col("gram"))),
        Literal(50000L), Literal(400000L), 0, 0).toAggregateExpression())
      .as("sk")), 1, "bloom test").head.getAs[Array[Byte]]("sk")
    val corpus = g.where(col("source") =!= "src0").select("gram").distinct()
    def pass(df: org.apache.spark.sql.DataFrame): Long =
      df.where(ColumnBridge.column(BloomFilterMightContain(
        Literal(sk, BinaryType),
        ColumnBridge.expression(xxhash64(col("gram")))))).count()
    // no false negatives, ever: every benchmark gram passes its own filter
    assert(pass(bench) == bench.count())
    val total = corpus.count()
    val trueShared = corpus.join(bench, "gram").count()
    val passed = pass(corpus)
    assert(passed >= trueShared, "bloom dropped a true member")
    // the scale claim: the prefilter kills most non-member grams
    assert(passed - trueShared <= (total - trueShared) / 10,
      s"fp rate too high: $passed passed of $total (true=$trueShared)")
  }

  test("WAV payloads are genuine RIFF/WAVE containers the JDK codec round-trips") {
    val bytes = MmAudio.synthesize(7L, 123)
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val m = MmAudio.decode(MmAudio.Wav(7L, bytes))
    val n = MmAudio.nFrames(123)
    val samples = (0 until n).map(i => MmAudio.sample(7L, i))
    assert(m.encoding == "PCM_SIGNED" && m.channels == 1 && m.bits == 16)
    assert(m.n_frames == n && m.sample_rate == MmAudio.rate(7L))
    assert(m.duration_us == n * 1000000L / MmAudio.rate(7L))
    assert(m.peak == samples.map(math.abs).max)
    assert(m.mean_abs == samples.map(s => math.abs(s).toLong).sum.toDouble / n)
    assert(m.rms == math.sqrt(
      samples.map(s => s.toLong * s).sum.toDouble / n))
  }

  test("audio decode is row-local: no exchange before the final sort") {
    val plan = Llm6.mmAudioDecode(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the orderBy's range exchange plus the round-17 fanout's RoundRobin
    // (Tables.fanout: id-frame spread for the codec kernels — moves only
    // the 2-column id projection, never decoded payloads); no OTHER
    // exchange may appear — the decode itself stays row-local
    assert(plan.split("Exchange").length - 1 == 2, plan)
    assert(plan.contains("RoundRobinPartitioning"), plan)
    assert(plan.split("rangepartitioning").length - 1 == 1, plan)
  }
}
