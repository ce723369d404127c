package graft

import org.apache.spark.sql.SparkSession

/** User-facing SQL catalog: registers every fixture table as a temp view
  * (events with the ns→µs timestamp normalization already applied) so the
  * whole engine surface is reachable from `spark.sql("...")` — the
  * migration target for a Flink Table-API/SQL user. Idempotent; safe to
  * call per session. */
object Catalog {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  /** Register all fixture tables from `dir` as temp views, plus the
    * custom SQL kernel (`graft_dot_product`). */
  def register(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
    functions.ArrayMath.register(spark)
  }
}
