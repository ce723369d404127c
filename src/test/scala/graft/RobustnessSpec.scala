package graft

/** Empty-input robustness: at warehouse scale, empty partitions, empty
  * date ranges and freshly-created tables are routine — every declared
  * query must plan and execute (to an empty or degenerate result) against
  * schema-identical EMPTY fixtures, never throw. Catches head()-on-empty,
  * null-aggregate and sequence(null,null) style bugs. */
class RobustnessSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    // raw events carries int64-nanos; readable only under this conf (the
    // empty copy is written as plain INT64, which loads under any conf).
    // Scoped: restore the session's prior value so this shared-session
    // fixture can't leak conf into suites that run after it.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val tables = Catalog.TableNames :+ "events"
      tables.foreach { t =>
        // limit(0) preserves the schema exactly as our loaders see it
        // (events keeps its raw int64-nanos ts column)
        Tables.table(spark, sf0001, t).limit(0)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    dir
  }

  test("every declared query executes against fully empty tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, emptyDir).count() // force full execution
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail on empty input:\n${failures.mkString("\n")}")
  }
}
