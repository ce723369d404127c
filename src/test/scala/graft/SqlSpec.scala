package graft

import org.apache.spark.sql.DataFrame

/** SQL entry point (SURVEY.md §3.4): the same capabilities through
  * `spark.sql`, cross-checked against the DataFrame formulations — plus the
  * D5 shapes the rollup query key doesn't cover (CUBE, GROUPING SETS). */
class SqlSpec extends SparkTestBase {

  private def withViews[A](f: => A): A = {
    Seq("events", "orders", "customer", "nation").foreach { t =>
      val df = if (t == "events") Tables.events(spark, sf0001)
               else Tables.table(spark, sf0001, t)
      df.createOrReplaceTempView(t)
    }
    f
  }

  private def sortedRows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq

  test("SQL ≡ DataFrame: keyed aggregation") {
    withViews {
      val sql = spark.sql(
        """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(value) AS DOUBLE) AS avg_value,
           MIN(value) AS min_value, MAX(value) AS max_value
           FROM events GROUP BY event_type ORDER BY event_type""")
      assert(sortedRows(sql) === sortedRows(ops.Relational.aggValueByType(spark, sf0001)))
    }
  }

  test("SQL ≡ DataFrame: windowed top-3 per user") {
    withViews {
      val sql = spark.sql(
        """SELECT user_id, rn, event_id, value FROM (
             SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
             FROM events) WHERE rn <= 3 ORDER BY user_id, rn""")
      assert(sortedRows(sql) === sortedRows(ops.Relational.topkEventsPerUser(spark, sf0001)))
    }
  }

  test("SQL ≡ DataFrame: broadcast dim join aggregation") {
    withViews {
      val sql = spark.sql(
        """SELECT n_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
           FROM orders JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name ORDER BY n_name""")
      assert(sortedRows(sql) === sortedRows(ops.Joins.joinOrdersCustomer(spark, sf0001)))
    }
  }

  test("D5: CUBE and GROUPING SETS produce the expected group space") {
    withViews {
      val cube = spark.sql(
        """SELECT event_type, user_id, COUNT(*) AS n, GROUPING(event_type) AS ge
           FROM events GROUP BY CUBE(event_type, user_id)""")
      val types = Tables.events(spark, sf0001).select("event_type").distinct().count()
      val users = Tables.events(spark, sf0001).select("user_id").distinct().count()
      // cube = all 4 grouping combinations
      assert(cube.count() === (types * users) + types + users + 1)
      val gs = spark.sql(
        """SELECT event_type, user_id, COUNT(*) AS n
           FROM events GROUP BY GROUPING SETS ((event_type), (user_id))""")
      assert(gs.count() === types + users)
    }
  }

  test("Catalog.register exposes every table and the kernel to plain SQL") {
    Catalog.register(spark, sf0001)
    // one query touching several registered views + the normalized events ts
    val r = spark.sql(
      """SELECT (SELECT COUNT(*) FROM region) AS regions,
                (SELECT COUNT(*) FROM documents) AS docs,
                (SELECT COUNT(*) FROM events WHERE year(ts) = 2024) AS ev24,
                (SELECT round(graft_dot_product(
                   transform(embedding, x -> cast(x as double)),
                   transform(embedding, x -> cast(x as double))), 3)
                 FROM embeddings WHERE vec_id = 0) AS sq0""").head()
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) > 0L)
    assert(r.getLong(2) > 0L)
    assert(r.getDouble(3) > 0.0)
  }

  test("native kernel registered for SQL: graft_dot_product") {
    functions.ArrayMath.register(spark)
    Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS emb")
      .createOrReplaceTempView("emb")
    val r = spark.sql(
      "SELECT vec_id, graft_dot_product(emb, emb) AS sq FROM emb ORDER BY vec_id LIMIT 1")
      .collect()(0)
    assert(r.getDouble(1) > 0.0)
  }

  test("SQL ≡ DataFrame: conditional-aggregation pivot") {
    withViews {
      val arms = Seq("click", "error", "purchase", "signup", "view").map { t =>
        s"CAST(SUM(CAST(CASE WHEN event_type = '$t' THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS $t"
      }.mkString(", ")
      val sql = spark.sql(s"SELECT user_id, $arms FROM events GROUP BY user_id ORDER BY user_id")
      assert(sortedRows(sql) === sortedRows(ops.Analytics.pivotValueByType(spark, sf0001)))
    }
  }

  test("SQL ≡ DataFrame: INTERSECT ALL multiset semantics") {
    withViews {
      val sql = spark.sql(
        """SELECT CAST(floor(value / 10) AS BIGINT) AS bucket FROM events WHERE event_type = 'purchase'
           INTERSECT ALL
           SELECT CAST(floor(value / 10) AS BIGINT) AS bucket FROM events WHERE event_type = 'view'
           ORDER BY bucket""")
      assert(sortedRows(sql) === sortedRows(ops.Analytics.setopIntersectAllBuckets(spark, sf0001)))
    }
  }

  test("SQL ≡ DataFrame: exact percentiles") {
    withViews {
      val sql = spark.sql(
        """SELECT event_type, COUNT(*) AS n,
           round(percentile(value, 0.25), 6) AS p25, round(percentile(value, 0.5), 6) AS p50,
           round(percentile(value, 0.75), 6) AS p75, round(percentile(value, 0.9), 6) AS p90
           FROM events GROUP BY event_type ORDER BY event_type""")
      assert(sortedRows(sql) === sortedRows(ops.Analytics.aggPercentilesValue(spark, sf0001)))
    }
  }

  test("SQL ≡ DataFrame: CEP pattern match via lag navigation") {
    withViews {
      val sql = spark.sql(
        """WITH seq AS (
             SELECT user_id, event_id, event_type, unix_micros(ts) AS ts_us,
               lag(event_type, 2) OVER w AS t1, lag(event_type, 1) OVER w AS t2,
               lag(event_id, 2) OVER w AS id1, lag(event_id, 1) OVER w AS id2,
               lag(unix_micros(ts), 2) OVER w AS ts1
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY unix_micros(ts), event_id))
           SELECT user_id, id1, id2, event_id AS purchase_id, ts_us - ts1 AS span_us
           FROM seq
           WHERE t1 = 'click' AND t2 = 'click' AND event_type = 'purchase'
             AND ts_us - ts1 <= 3L * 24 * 3600 * 1000000
           ORDER BY purchase_id""")
      assert(sortedRows(sql) === sortedRows(ops.Joins.cepClickClickPurchase(spark, sf0001)))
    }
  }

  test("SQL ≡ DataFrame: time-series gapfill via sequence generation") {
    withViews {
      val sql = spark.sql(
        """WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS bucket FROM events),
           counts AS (SELECT user_id, bucket, COUNT(*) AS n FROM ev GROUP BY 1, 2),
           dense AS (SELECT user_id,
               explode(sequence(MIN(bucket), MAX(bucket), INTERVAL 1 HOUR)) AS bucket
             FROM ev GROUP BY user_id)
           SELECT d.user_id, unix_micros(d.bucket) AS bucket_us, coalesce(n, 0L) AS n
           FROM dense d LEFT JOIN counts c
             ON d.user_id = c.user_id AND d.bucket = c.bucket
           ORDER BY 1, 2""")
      assert(sortedRows(sql) === sortedRows(ops.Analytics.tsGapfillHourly(spark, sf0001)))
    }
  }

  test("subquery decorrelation: correlated EXISTS matches semi-join") {
    withViews {
      val sql = spark.sql(
        """SELECT c_custkey FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")
      val c = Tables.customer(spark, sf0001)
      val o = Tables.orders(spark, sf0001)
      val df = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").select("c_custkey")
      assert(sortedRows(sql) === sortedRows(df))
    }
  }

  test("SQL join hints steer the planner: BROADCAST and REPARTITION") {
    Catalog.register(spark, sf0001)
    // disable auto-broadcast so only the hint can produce a broadcast —
    // otherwise tiny fixture dims broadcast anyway and the test is vacuous
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcast)
    spark.conf.set(bcast, "-1")
    try {
      val unhinted = spark.sql(
        """SELECT o_orderkey
           FROM orders o JOIN customer c ON o_custkey = c_custkey""")
      assert(!unhinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      val hinted = spark.sql(
        """SELECT /*+ BROADCAST(c) */ o_orderkey
           FROM orders o JOIN customer c ON o_custkey = c_custkey""")
      assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally spark.conf.set(bcast, prev)
    val repart = spark.sql(
      "SELECT /*+ REPARTITION(8) */ event_id FROM events")
    assert(repart.rdd.getNumPartitions === 8)
  }
}
