package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality readout a publisher runs before
  * (and a consumer after) every 100-TB table hand-off: per column, row
  * count, null count, exact distinct count, and canonical min/max.
  *
  * Shape at scale: ONE scan. All per-column aggregates fold into a
  * single global aggregation; the multi-column exact-distinct is
  * Spark's standard Expand-based rewrite (rows × (#distinct-cols + 1)
  * before partial aggregation — each expanded stream map-side combines
  * on its own column's values, so the shuffle carries near-distinct
  * cardinality, not row count). The alternative — one pass per column —
  * re-reads the table #columns times; 6× the scan bytes for the same
  * answer. min/max are computed on the NATIVE type and canonicalized
  * only at the end (string min ≠ min of strings for numerics), with
  * the portability casts the oracle conventions already use: integers
  * via CAST, doubles via exact cents, timestamps via formatted strings.
  */
object Profiling {

  private val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** One-pass profile of `cols` of `df`: each entry is (column name,
    * canonicalizer applied to the native min/max). Returns one row per
    * column: (col_name, n_rows, n_null, n_distinct, min_repr, max_repr).
    */
  def profile(df: DataFrame, cols: Seq[(String, Column => Column)]): DataFrame = {
    val aggs = cols.flatMap { case (name, repr) =>
      Seq(
        count(col(name)).as(s"${name}__n"),
        countDistinct(col(name)).as(s"${name}__nd"),
        repr(min(col(name))).as(s"${name}__min"),
        repr(max(col(name))).as(s"${name}__max"))
    }
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val rows = cols.map { case (name, _) =>
      struct(
        lit(name).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"${name}__n")).as("n_null"),
        col(s"${name}__nd").as("n_distinct"),
        col(s"${name}__min").as("min_repr"),
        col(s"${name}__max").as("max_repr"))
    }
    one.select(explode(array(rows: _*)).as("m")).select(col("m.*"))
  }

  private def asString(c: Column): Column = c.cast("string")
  /** Doubles canonicalize through exact cents (round-to-int of x·100):
    * double formatting is NOT portable across engines, integer strings
    * are. */
  private def asCents(c: Column): Column =
    round(c * 100).cast("long").cast("string")
  private def asStamp(c: Column): Column = date_format(c, fmt)

  /** First 8 md5-digest bytes of `c` composed little-endian — equals
    * DuckDB's `md5_number_upper(c)` reinterpreted as a signed 64-bit
    * value (same contract as `SimHashAgg.tokenHash`, here as a pure
    * Column expression so it aggregates under `bit_xor`).
    */
  private def md5Num(c: Column): Column =
    (0 until 8).map(i =>
      shiftleft(conv(substring(md5(c), 2 * i + 1, 2), 16, 10).cast("long"),
        8 * i))
      .reduce((a, b) => a.bitwiseOR(b))

  val specs: Seq[QuerySpec] = Seq(

    // Partition-level content checksum: per language, row count + the
    // XOR-fold of a 64-bit md5-derived row fingerprint (doc_id, lang,
    // source, n_chars, md5(text)) — the cross-replica / migration /
    // backup-restore verification primitive. XOR is the right fold:
    // order-independent (any partitioning, any merge order gives the
    // same checksum), incrementally maintainable (XOR a row in or out
    // in O(1)), and map-side combinable — the shuffle carries one
    // 8-byte word per (partition, group). The top bit is masked so
    // the value transports as BIGINT on both engines (DuckDB's
    // md5_number_upper is UBIGINT); XOR commutes with masking, so
    // per-row masking equals post-fold masking.
    QuerySpec(
      "q_checksum",
      """SELECT lang, count(*) AS n_rows,
        |  CAST(bit_xor(md5_number_upper(
        |    CAST(doc_id AS VARCHAR) || '|' || lang || '|' || source || '|'
        |    || CAST(n_chars AS VARCHAR) || '|' || md5(text))
        |    & 9223372036854775807::UBIGINT) AS BIGINT) AS checksum
        |FROM documents GROUP BY lang""".stripMargin) { (s, d) =>
      val row = concat_ws("|",
        col("doc_id").cast("string"), col("lang"), col("source"),
        col("n_chars").cast("string"), md5(col("text")))
      Tables.documents(s, d)
        .select(col("lang"),
          md5Num(row).bitwiseAND(lit(Long.MaxValue)).as("h"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("checksum"))
    },

    QuerySpec(
      "q_profile",
      """SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |  count(*) - count(o_orderkey) AS n_null,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_repr,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_repr FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |  count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |  count(DISTINCT o_totalprice),
        |  CAST(CAST(round(min(o_totalprice) * 100) AS BIGINT) AS VARCHAR),
        |  CAST(CAST(round(max(o_totalprice) * 100) AS BIGINT) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
        |  count(DISTINCT o_orderdate),
        |  strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S.%f'),
        |  strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S.%f')
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority), min(o_orderpriority),
        |  max(o_orderpriority)
        |FROM orders""".stripMargin) { (s, d) =>
      profile(Tables.load(s, d, "orders"), Seq(
        "o_orderkey" -> asString _,
        "o_custkey" -> asString _,
        "o_orderstatus" -> asString _,
        "o_totalprice" -> asCents _,
        "o_orderdate" -> asStamp _,
        "o_orderpriority" -> asString _))
    }
  )
}
