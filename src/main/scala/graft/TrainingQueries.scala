package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Large-scale training-data pipeline operators (dedup, similarity search,
  * text analysis, multimodal) over the `documents` / `embeddings` tables.
  * Filled in incrementally; see graft.operators.*. */
object TrainingQueries {
  type Q = (SparkSession, String) => DataFrame
  val all: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
