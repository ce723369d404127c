package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 17): does a predicate above Tables.fanout still
  * reach the parquet scan (PushedFilters), and does column pruning
  * still hold (ReadSchema)? Decides whether fanout may sit in a loader.
  * Usage: runMain graft.PushProbe [sfDir]
  */
object PushProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("== filter+project ABOVE fanout ==")
    Tables.fanout(Tables.events(spark, dir))
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
      .explain("formatted")
    println("== control: no fanout ==")
    Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
      .explain("formatted")
    spark.stop()
  }
}
