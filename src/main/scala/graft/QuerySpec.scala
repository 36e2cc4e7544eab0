package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark-first implementation plus
  * equivalent ANSI SQL the driver runs in DuckDB as an oracle.
  * `oracle = None` would fall back to the driver's weaker rows-only
  * check — since round 7 every registered query carries an oracle
  * (ops without a portable value image, like the sketches, are oracled
  * through certified contract verdicts instead of raw values).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle))
}
