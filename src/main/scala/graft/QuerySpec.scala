package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark-first implementation plus (where
  * expressible) equivalent ANSI SQL the driver runs in DuckDB as an oracle.
  * `oracle = None` ⇒ the driver records a weaker rows-only check (used for
  * ops whose hashing primitives have no portable SQL equivalent).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle))

  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}
