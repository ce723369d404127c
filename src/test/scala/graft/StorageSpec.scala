package graft

import org.apache.spark.sql.functions._

/** Storage-layout scale techniques, executed and plan-asserted at fixture
  * scale: bucketed co-located joins (the 100 TB fact⋈fact shape — no
  * shuffle on either side) and partitioned writes with partition pruning.
  * These back the README's scale-design claims with running evidence. */
class StorageSpec extends SparkTestBase {

  test("bucketed fact tables sort-merge join with NO exchange on either side") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed")
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcast)
    spark.conf.set(bcast, "-1") // force SMJ so the absent-shuffle claim is real
    try {
      Tables.orders(spark, sf0001).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/o_b").mode("overwrite").saveAsTable("o_b")
      Tables.lineitem(spark, sf0001).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/l_b").mode("overwrite").saveAsTable("l_b")
      val j = spark.table("o_b").join(spark.table("l_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it computes the same thing as the plain join
      val plain = Tables.orders(spark, sf0001).join(Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"))
      assert(j.count() === plain.count())
    } finally {
      spark.conf.set(bcast, prev)
      spark.sql("DROP TABLE IF EXISTS o_b")
      spark.sql("DROP TABLE IF EXISTS l_b")
    }
  }

  test("bucketed+sorted single-file-per-bucket join needs neither exchange NOR sort") {
    // The full 100 TB fact⋈fact shape: when each bucket is ONE file written
    // in sortBy order, the scan reports its sort order and the sort-merge
    // join consumes it directly — the plan has no Exchange and no Sort, so
    // the join cost is a pure streaming merge of co-located partitions.
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed1f")
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcast)
    spark.conf.set(bcast, "-1")
    try {
      // repartition on the bucket column uses the same murmur3 pmod as
      // bucketBy, so each task holds exactly one bucket → one file each
      Tables.orders(spark, sf0001).repartition(8, col("o_orderkey")).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/o_b1").mode("overwrite").saveAsTable("o_b1")
      Tables.lineitem(spark, sf0001).repartition(8, col("l_orderkey")).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/l_b1").mode("overwrite").saveAsTable("l_b1")
      val j = spark.table("o_b1").join(spark.table("l_b1"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan
      val planStr = plan.toString()
      assert(planStr.contains("SortMergeJoin"), planStr)
      assert(!planStr.contains("Exchange"), s"must not shuffle:\n$planStr")
      val sorts = plan.collect { case s: org.apache.spark.sql.execution.SortExec => s }
      assert(sorts.isEmpty, s"single-file sorted buckets must not re-sort:\n$planStr")
      val expected = Tables.orders(spark, sf0001).join(
        Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(j.count() === expected)
    } finally {
      spark.conf.set(bcast, prev)
      spark.sql("DROP TABLE IF EXISTS o_b1")
      spark.sql("DROP TABLE IF EXISTS l_b1")
    }
  }

  test("partitioned parquet write + partition pruning in the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf0001).write
      .partitionBy("event_type").mode("overwrite").parquet(dir)
    val purchases = spark.read.parquet(dir).where(col("event_type") === "purchase")
    val plan = purchases.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)
    val expected = Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase").count()
    assert(purchases.count() === expected)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at RUNTIME") {
    // static pruning (test above) needs the literal in the query; at 100 TB
    // the selective predicate usually lives on a DIMENSION (`tier = ...`),
    // and only a runtime subquery can translate it into fact partitions.
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val s = spark
    import s.implicits._
    Tables.events(spark, sf0001).write
      .partitionBy("event_type").mode("overwrite").parquet(s"$dir/fact")
    Seq(("purchase", "money"), ("click", "engage"), ("view", "engage"),
        ("signup", "acquire"), ("error", "ops"))
      .toDF("event_type", "tier").write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").where(col("tier") === "money")
    val j = fact.join(dim, Seq("event_type"))
    val plan = j.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning"),
      s"fact scan should carry a dynamic pruning expression:\n$plan")
    assert(j.count() === Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase").count())
  }

  test("runtime bloom filter: selective dim join injects a row-level fact prune") {
    // DPP's row-level sibling: the fact is NOT partitioned by the join
    // key, so partition pruning cannot help — the optimizer builds a
    // bloom filter from the filtered dim side and pushes
    // might_contain(l_orderkey) down to the fact scan, cutting shuffle
    // input by the dim's selectivity. The 10 GiB application-side gate
    // exists because the filter only pays off on big scans; fixture scale
    // sits far under it, so the test relaxes the SIZE gates while keeping
    // the plan shape real (SMJ forced — with a broadcastable dim the rule
    // correctly declines: the BHJ probe is already the filter).
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    Tables.lineitem(spark, sf0001).write.mode("overwrite").parquet(s"$dir/fact")
    Tables.orders(spark, sf0001).write.mode("overwrite").parquet(s"$dir/dim")
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
        .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.optimizedPlan.toString()
      // the injected shape: fact Filter gains might_contain(<scalar
      // subquery building bloom_filter_agg over the filtered dim keys>)
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"fact side should carry an injected bloom filter:\n$plan")
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001)
            .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("z-order layout: 2-D file skipping where a single-dim sort reads everything") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
    // the incumbent layout: time-sorted, 32 files
    ev.repartitionByRange(32, col("ts_us")).sortWithinPartitions("ts_us")
      .write.mode("overwrite").parquet(s"$dir/by_ts")
    functions.ZOrder.writeZOrdered(ev, "user_id", "ts_us", 32, s"$dir/z")
    // "files touched" = files holding >=1 row surviving the pushed filter —
    // exactly the files a min/max skipping index would have to read
    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).where(pred)
        .select(input_file_name()).distinct().count()
    val b = ev.agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us")).head()
    val userPred = col("user_id") <= b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 8
    val bothPred = userPred &&
      col("ts_us") <= b.getLong(2) + (b.getLong(3) - b.getLong(2)) / 8
    // 1/8-of-users filter: time-sorted layout touches every file (each
    // file spans all users); z-order fixes the top 3 user bits -> ~8/32
    val tsUser = filesTouched(s"$dir/by_ts", userPred)
    val zUser = filesTouched(s"$dir/z", userPred)
    assert(tsUser >= 30, s"ts-sorted layout should touch ~all 32 files, got $tsUser")
    assert(zUser <= 16, s"z layout should skip at least half the files, got $zUser")
    // conjunctive 2-D filter: z is no worse than the best single-dim sort
    val tsBoth = filesTouched(s"$dir/by_ts", bothPred)
    val zBoth = filesTouched(s"$dir/z", bothPred)
    assert(zBoth <= tsBoth, s"2-D filter: z=$zBoth vs ts-sorted=$tsBoth")
    // and the layout is only a layout: same rows come back
    assert(spark.read.parquet(s"$dir/z").where(bothPred).count() ===
      ev.where(bothPred).count())
  }

  test("A4b: JSON-lines source roundtrip of documents, filter pushed to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sf0001)
    docs.write.mode("overwrite").json(dir)
    // explicit schema: a schema-inference pass over 100 TB of JSONL is a
    // full extra scan — never rely on it at scale
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() === docs.count())
    val filtered = back.where(col("doc_id") < 10).select("doc_id", "lang")
    val plan = filtered.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)"),
      s"doc_id bound should reach the JSON scan:\n$plan")
    assert(filtered.count() === docs.where(col("doc_id") < 10).count())
  }

  test("A4c: CSV source roundtrip of documents, filter pushed to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    // quote/escape so free-text survives the delimited format
    val docs = Tables.documents(spark, sf0001)
    docs.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").csv(dir)
    val back = spark.read.schema(docs.schema)
      .option("header", "true").csv(dir)
    assert(back.count() === docs.count())
    val filtered = back.where(col("lang") === "en").select("doc_id", "lang")
    val plan = filtered.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)"),
      s"lang predicate should reach the CSV scan:\n$plan")
    assert(filtered.count() === docs.where(col("lang") === "en").count())
    // column pruning: the wide text column must not be parsed for this
    // projection. Assert on the scan's ReadSchema fragment specifically —
    // a whole-plan substring match would trip on any incidental "text" in
    // a temp path or codec name.
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema in CSV scan plan:\n$plan"))
    assert(readSchema.contains("doc_id") && readSchema.contains("lang"), readSchema)
    assert(!readSchema.contains("text"),
      s"text should be pruned from the CSV ReadSchema: $readSchema")
  }

  test("avro wire format: failure mode pinned (spark-avro module jar absent zero-egress)") {
    // The canonical Flink-example wire format. Spark ships avro-1.12.1.jar
    // (the core library) but NOT the spark-avro module that registers
    // format("avro") / from_avro / to_avro, and this container is
    // zero-egress — so, as with kafka (SourcesSpec A2/A8), the honest
    // ceiling is pinning the format-lookup failure so the gap is explicit
    // and the wiring is exercised to the DataSource-resolution boundary.
    // On a cluster with spark-avro on the classpath the same calls
    // round-trip like the ORC/CSV/JSONL cases above.
    val dir = java.nio.file.Files.createTempDirectory("graft-avro").toString
    val e = intercept[Exception] {
      Tables.region(spark, sf0001).write.format("avro").mode("overwrite").save(dir)
    }
    assert(e.getMessage.toLowerCase.contains("avro"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.read.format("avro").load(dir)
    }
    assert(e2.getMessage.toLowerCase.contains("avro"), e2.getMessage)
  }

  test("A5/A6: ORC source/sink roundtrip preserves the lineitem table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val src = Tables.lineitem(spark, sf0001)
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    // ORC predicate pushdown works like parquet's
    val plan = back.where(col("l_returnflag") === "R")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters"), plan)
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("small-file compaction bin-packs to the byte target and publishes atomically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val table = s"$dir/events"
    // fragment: 40 tiny files, the post-streaming-ingest pathology
    val src = Tables.events(spark, sf0001)
    src.repartition(40).write.parquet(table)
    def files(suffix: String) = Option(new java.io.File(table).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(suffix)).length
    assert(files(".parquet") === 40)
    val bytes = Option(new java.io.File(table).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = bytes / 3 + 1 // force ~3-4 output files
    val stats = graft.ops.Maintenance.compactParquet(spark, table, target)
    assert(stats.filesBefore === 40)
    val expectedFiles = ((bytes + target - 1) / target).toInt
    assert(stats.filesAfter === expectedFiles, stats.toString)
    assert(files(".parquet") === expectedFiles)
    // content survives byte-for-byte (row multiset equality)
    val back = spark.read.parquet(table)
    assert(back.count() === stats.rows)
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
    // crash repair: a stale staging leftover is swept, the table untouched
    val stale = new java.io.File(s"$table.staging-999")
    assert(stale.mkdir())
    graft.streaming.Streams.recoverUpsertTable(table)
    assert(!stale.exists)
    assert(spark.read.parquet(table).count() === stats.rows)
  }
}
