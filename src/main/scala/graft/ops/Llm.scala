package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM training-data pipeline operators (SURVEY.md §2.J) — filled in
  * incrementally: dedup (exact/MinHash/SimHash/Jaccard/embedding),
  * similarity search, text analysis, multimodal plumbing. */
object Llm {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
