package graft

import org.apache.spark.sql.functions._

/** Source/sink surface beyond the parquet fixtures (SURVEY.md §2.A):
  * collection sources, text-file source, rate + socket streaming sources,
  * console/foreachBatch sinks. The socket source runs END-TO-END against a
  * loopback ServerSocket (zero-egress blocks external networking only);
  * kafka remains config-level wiring (`format("kafka")` jar absent here),
  * its construction documented in [[graft.streaming.Streams]] scaladoc. */
class SourcesSpec extends SparkTestBase {

  test("A2/A8: kafka option wiring is config-tested (no broker/jar in this container)") {
    import graft.streaming.Streams
    val src = Streams.kafkaSourceOptions("broker1:9092,broker2:9092", "events_topic")
    assert(src("kafka.bootstrap.servers") === "broker1:9092,broker2:9092")
    assert(src("subscribe") === "events_topic")
    assert(src("startingOffsets") === "earliest")
    assert(src("failOnDataLoss") === "true")
    val snk = Streams.kafkaSinkOptions("b:9092", "out_topic", "/tmp/graft-ckpt")
    assert(snk("kafka.bootstrap.servers") === "b:9092")
    assert(snk("topic") === "out_topic")
    assert(snk("checkpointLocation") === "/tmp/graft-ckpt")
    // The connector jar is absent in the zero-egress container: pin the
    // failure mode so the wiring is exercised up to the format-lookup
    // boundary (on a real cluster the same call yields the standard
    // key/value/topic/partition/offset/timestamp stream).
    val e = intercept[Exception] {
      Streams.kafkaSource(spark, "b:9092", "t").load()
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("A3: collection/element source (fromElements analogue)") {
    val s = spark
    import s.implicits._
    val ds = spark.createDataset(Seq(("a", 1), ("b", 2)))
    assert(ds.toDF("k", "v").agg(sum("v")).head().getLong(0) === 3L)
  }

  test("A4: text-file source (readTextFile analogue) + WordCount") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-text")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "the quick fox\nthe lazy dog\n")
    val counts = spark.read.text(dir.toString)
      .select(explode(split(col("value"), " ")).as("word"))
      .groupBy("word").count()
      .as[(String, Long)].collect().toMap
    assert(counts("the") === 2L && counts("fox") === 1L)
  }

  test("A5: socket source streams lines from a loopback server (zero-egress safe)") {
    // zero-egress blocks external networking, not the loopback device: a
    // local ServerSocket lets format("socket") run END-TO-END, upgrading
    // A5 from doc-only wiring to an executed source.
    val server = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    @volatile var client: java.net.Socket = null
    val feeder = new Thread(() => {
      try {
        client = server.accept()
        val out = new java.io.PrintWriter(client.getOutputStream, true)
        out.println("alpha"); out.println("beta"); out.println("gamma")
        out.flush()
      } catch { case _: Exception => () }
    })
    feeder.setDaemon(true)
    feeder.start()
    val q = spark.readStream.format("socket")
      .option("host", "127.0.0.1").option("port", port.toString).load()
      .writeStream.format("memory").queryName("sock_sink").outputMode("append").start()
    try {
      var n = 0L
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (n < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        n = spark.table("sock_sink").count()
      }
      assert(n === 3L, s"expected 3 socket lines, saw $n")
      assert(spark.table("sock_sink").collect().map(_.getString(0)).toSet ===
        Set("alpha", "beta", "gamma"))
    } finally {
      q.stop()
      if (client != null) client.close()
      server.close()
    }
  }

  test("A2: unbounded rate source streams rows") {
    val q = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
      .writeStream.format("memory").queryName("rate_sink").outputMode("append").start()
    try {
      var n = 0L
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (n == 0 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        n = spark.table("rate_sink").count()
      }
      assert(n > 0, "rate source produced no rows within 15s")
    } finally q.stop()
  }

  test("A1/A7: CSV and JSON source/sink roundtrip preserves the events table") {
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value") // ts omitted: csv tz parsing is lossy by design
    val base = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    ev.write.option("header", "true").mode("overwrite").csv(s"$base/csv")
    ev.write.mode("overwrite").json(s"$base/json")
    val backCsv = spark.read.option("header", "true")
      .schema(ev.schema).csv(s"$base/csv")
    val backJson = spark.read.schema(ev.schema).json(s"$base/json")
    val key = ev.agg(sum("event_id"), sum("user_id")).head()
    assert(backCsv.count() === ev.count())
    assert(backJson.count() === ev.count())
    assert(backCsv.agg(sum("event_id"), sum("user_id")).head() === key)
    assert(backJson.agg(sum("event_id"), sum("user_id")).head() === key)
  }

  test("A9: foreachBatch sink observes every micro-batch") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = ms.toDF().writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.addAndGet(df.count()): Unit)
      .start()
    try {
      ms.addData(1, 2, 3); q.processAllAvailable()
      ms.addData(4); q.processAllAvailable()
      assert(seen.get() === 4L)
    } finally q.stop()
  }

  // NOTE: the replay below is simulated by calling the sink function
  // directly with a previously-committed batchId — MemoryStream cannot
  // recover from a checkpoint (see I9 for the engine-driven restart path
  // over a file sink), so this verifies the SINK-side idempotence pattern,
  // not engine-side checkpoint replay.
  test("A9b: idempotent foreachBatch sink pattern skips an already-committed batch id") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    // the committed-batch ledger a transactional sink would keep
    val committed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val written = new java.util.concurrent.atomic.AtomicLong(0)
    def write(df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              batchId: Long): Unit =
      if (committed.add(batchId)) written.addAndGet(df.count()): Unit
      // else: replayed batch after recovery — already committed, skip
    val q = ms.toDF().writeStream.foreachBatch(write _).start()
    try {
      ms.addData(1, 2, 3); q.processAllAvailable()
      // simulate the replay a restart would produce: same batch, same id
      val replayDf = Seq(1, 2, 3).toDF()
      write(replayDf, 0L)
      ms.addData(4); q.processAllAvailable()
      assert(written.get() === 4L, "replayed batch 0 must not double-write")
      assert(committed.size === 2)
    } finally q.stop()
  }

  test("union of streams (DataStream.union analogue): one windowed agg over two sources") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val a = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Int)]
    val b = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Int)]
    val q = a.toDF().toDF("ts", "v").unionByName(b.toDF().toDF("ts", "v"))
      .groupBy(window($"ts", "1 hour").as("w")).agg(count(lit(1)).as("n"))
      .select($"w.start".as("ws"), $"n")
      .writeStream.format("memory").queryName("union_agg")
      .outputMode("complete").start()
    try {
      a.addData((ts("2024-01-01 10:05:00"), 1), (ts("2024-01-01 10:10:00"), 2),
        (ts("2024-01-01 11:05:00"), 3))
      b.addData((ts("2024-01-01 10:20:00"), 10), (ts("2024-01-01 11:40:00"), 20))
      q.processAllAvailable()
      val rows = spark.table("union_agg").as[(java.sql.Timestamp, Long)]
        .collect().toMap
      // both sources land in the same windows: 10:00 → 3 events, 11:00 → 2
      assert(rows === Map(ts("2024-01-01 10:00:00") -> 3L,
        ts("2024-01-01 11:00:00") -> 2L))
    } finally q.stop()
  }
}
