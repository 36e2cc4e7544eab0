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

  /** The profile with the per-column exact distinct swapped for the HLL
    * register sketch — the 100-TB variant: `profile`'s Expand-based
    * multi-distinct shuffles near-distinct cardinality PER COLUMN
    * (superlinear in shuffle bytes as columns approach key-like
    * cardinality), where this pass carries a constant 2^12 = 4 KiB
    * register file per (column, partition), merged bytewise-max
    * map-side — the shuffle is one register file per map task however
    * wide the table. Everything else (counts, nulls, native min/max +
    * canonicalizers) is identical. The estimate (standard HLL formula
    * with the linear-counting small-range correction, ~1.6% at p=12 —
    * a 5% certification bound is ~3 standard errors) is
    * computed as an in-row fold over the occupied-register array —
    * no driver collect. Still ONE scan.
    */
  def profileApprox(df: DataFrame,
      cols: Seq[(String, Column => Column)]): DataFrame = {
    val P = 12
    val m = 1 << P
    val aggs = cols.flatMap { case (name, repr) =>
      Seq(
        count(col(name)).as(s"${name}__n"),
        graft.functions.HllAgg
          .hll_registers(md5Num(col(name).cast("string")), P)
          .as(s"${name}__rs"),
        repr(min(col(name))).as(s"${name}__min"),
        repr(max(col(name))).as(s"${name}__max"))
    }
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val rows = cols.map { case (name, _) =>
      struct(
        lit(name).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"${name}__n")).as("n_null"),
        hllEst(col(s"${name}__rs"), m).as("nd_est"),
        col(s"${name}__min").as("min_repr"),
        col(s"${name}__max").as("max_repr"))
    }
    one.select(explode(array(rows: _*)).as("m")).select(col("m.*"))
  }

  /** The HLL estimate as an in-row fold over the occupied-register
    * array: z sums 2^-rho over ALL m registers (empty registers
    * contribute 2^0 = 1 each), then the bias-corrected harmonic
    * estimate with the linear-counting small-range correction. Shared
    * by [[profileApprox]] and [[profileCertified]].
    */
  private def hllEst(rs: Column, m: Int): Column = {
    val zeros = (lit(m) - size(rs)).cast("double")
    val z = zeros + aggregate(rs, lit(0.0),
      (acc, r) => acc + pow(lit(2.0), -r("max_rho").cast("double")))
    val alpha = lit(0.7213 / (1 + 1.079 / m))
    val e = alpha * m * m / z
    when(e <= 2.5 * m && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(e)
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
    * codegen'd expression — `Md5Long.md5_num` — so it aggregates under
    * `bit_xor`). Was a conv(substring(md5(...)))-chain Column; the
    * native kernel computes the identical value without the hex-string
    * round trips (bit-parity pinned in Md5LongSpec).
    */
  private def md5Num(c: Column): Column = graft.functions.Md5Long.md5_num(c)

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
    },

    // The approximate profile, certified: `profileApprox` is the
    // production shape at 100 TB (constant sketch state per column —
    // see its Scaladoc); this gate runs it NEXT TO the exact profile
    // and emits a per-column 0/1 verdict that the HLL estimate lands
    // within 5% of the exact distinct count — the q_approx
    // error-contract pattern (the estimate itself is approximate, so
    // the oracle asserts the CONTRACT, not the value; counts, nulls
    // and min/max reprs stay value-oracled). The exact branch exists
    // only to certify — a production run calls profileApprox alone.
    QuerySpec(
      "q_profile_approx",
      """SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |  count(*) - count(o_orderkey) AS n_null,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_repr,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_repr,
        |  CAST(1 AS BIGINT) AS nd_within_eps FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR),
        |  CAST(1 AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  min(o_orderstatus), max(o_orderstatus), CAST(1 AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |  CAST(CAST(round(min(o_totalprice) * 100) AS BIGINT) AS VARCHAR),
        |  CAST(CAST(round(max(o_totalprice) * 100) AS BIGINT) AS VARCHAR),
        |  CAST(1 AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
        |  strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S.%f'),
        |  strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S.%f'),
        |  CAST(1 AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |  min(o_orderpriority), max(o_orderpriority), CAST(1 AS BIGINT)
        |FROM orders""".stripMargin) { (s, d) =>
      val cols: Seq[(String, Column => Column)] = Seq(
        "o_orderkey" -> asString _,
        "o_custkey" -> asString _,
        "o_orderstatus" -> asString _,
        "o_totalprice" -> asCents _,
        "o_orderdate" -> asStamp _,
        "o_orderpriority" -> asString _)
      // NOTE (optimization round 18): fusing the exact multi-distinct
      // and the HLL sketch into ONE aggregate was tried and is ~3×
      // SLOWER, not faster — the multi-distinct's Expand rewrite drags
      // every rider aggregate (the imperative HLL, min/max) onto the
      // 7×-expanded row stream. Two separate aggregates + a 6-row join
      // is the right shape; each pass stays in its own fast path.
      val approx = profileApprox(Tables.load(s, d, "orders"), cols)
      val exact = profile(Tables.load(s, d, "orders"), cols)
        .select(col("col_name"), col("n_distinct"))
      approx.join(exact, Seq("col_name"))
        .select(col("col_name"), col("n_rows"), col("n_null"),
          col("min_repr"), col("max_repr"),
          (abs(col("nd_est") - col("n_distinct"))
            <= col("n_distinct").cast("double") * lit(0.05))
            .cast("long").as("nd_within_eps"))
    },

    // Approximate quantiles — the distribution profile a 100-TB
    // column gets instead of a global sort: Spark's percentile_approx
    // (Greenwald–Khanna sketch — bounded state, map-side mergeable,
    // rank error ≤ 1/accuracy) certified against its own contract the
    // q_profile_approx way: the gate emits the EXACT interpolated
    // quantiles (value-oracled, both engines interpolate
    // a + (b−a)·frac over identical doubles) plus a within_eps
    // verdict computed by ranking each sketch output against the
    // column in one conditional-sum pass — the oracle recomputes the
    // exact side and asserts the contract held. The sketch collect is
    // one 4-double row (the bounded-register convention).
    QuerySpec(
      "q_quantile_sketch",
      "WITH v AS (SELECT value FROM events)\n" +
        Seq(0.25, 0.5, 0.75, 0.95).map(p =>
          s"""SELECT CAST($p AS DOUBLE) AS pct,
             |  (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_rows,
             |  (SELECT round(quantile_cont(value, $p), 4) FROM v)
             |    AS exact_q,
             |  CAST(1 AS BIGINT) AS within_eps""".stripMargin)
          .mkString("\nUNION ALL\n")) {
      (s, d) =>
      val pcts = Seq(0.25, 0.5, 0.75, 0.95)
      val vals = Tables.events(s, d).select(col("value")).cache()
      val sketch = vals
        .agg(percentile_approx(col("value"),
          typedLit(pcts), lit(1000)).as("qs"))
        .head().getSeq[Double](0)
      val eps = 0.002 // GK rank-error bound 1/accuracy, plus slack
      // Tie-aware rank band: with heavy ties at the quantile the CDF
      // count(v <= q)/n can overshoot p by far more than the GK bound
      // even for a CORRECT epsilon-approximate quantile, so a two-sided
      // bound on the <= count alone fails spuriously. The contract is
      // on RANK: q is valid iff p lands (within eps) inside
      // [count(v < q)/n, count(v <= q)/n] — the whole tie block maps to
      // one rank interval.
      val verdictCols = pcts.zip(sketch).zipWithIndex.map {
        case ((p, q), i) =>
          val n = count(lit(1)).cast("double")
          val le = sum(when(col("value") <= q, 1L).otherwise(0L))
            .cast("double") / n
          val lt = sum(when(col("value") < q, 1L).otherwise(0L))
            .cast("double") / n
          ((lt - eps <= p) && (lit(p) <= le + eps))
            .cast("long").as(s"ok_$i")
      }
      val exactCols = pcts.zipWithIndex.map { case (p, i) =>
        round(expr(s"percentile(value, $p)"), 4).as(s"q_$i")
      }
      val one = vals.agg(count(lit(1)).as("n_rows"),
        exactCols ++ verdictCols: _*)
      val out = pcts.zipWithIndex.map { case (p, i) =>
        one.select(lit(p).as("pct"), col("n_rows"),
          col(s"q_$i").as("exact_q"), col(s"ok_$i").as("within_eps"))
      }.reduce(_.unionByName(_))
      vals.unpersist()
      out
    },

    // The GROUPED quantile sketch — q_quantile_sketch's per-group twin
    // (the q_hll_grouped pattern): per event type, the GK sketch keeps
    // CONSTANT state per group-partition and merges map-side, so a
    // 100-TB per-key distribution profile costs one combining pass —
    // no per-group sort, no global sort. The gate emits each group's
    // exact interpolated quantiles (value-oracled) plus a within_eps
    // verdict ranking every sketch output against ITS group's column
    // (tie-aware rank band, the q_quantile_sketch convention; the rank
    // guarantee is relative to the group size). The certification path
    // runs the exact percentile alongside — gate-only cost; production
    // is the sketch alone.
    QuerySpec(
      "q_quantile_grouped",
      Seq(0.25, 0.5, 0.75, 0.95).map(p =>
        s"""SELECT event_type, CAST($p AS DOUBLE) AS pct,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  round(quantile_cont(value, $p), 4) AS exact_q,
           |  CAST(1 AS BIGINT) AS within_eps
           |FROM events GROUP BY event_type""".stripMargin)
        .mkString("\nUNION ALL\n")) { (s, d) =>
      val pcts = Seq(0.25, 0.5, 0.75, 0.95)
      val eps = 0.002
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val sk = ev.groupBy(col("event_type"))
        .agg(percentile_approx(col("value"),
            typedLit(pcts), lit(1000)).as("qs"),
          expr(s"percentile(value, array(${pcts.mkString(",")}))")
            .as("eqs"),
          count(lit(1)).as("n_rows"))
      val qrows = sk.select(col("event_type"), col("n_rows"),
          posexplode(col("qs")).as(Seq("i", "q")), col("eqs"))
        .select(col("event_type"), col("n_rows"), col("i"), col("q"),
          element_at(col("eqs"), col("i") + 1).as("eq"),
          element_at(typedLit(pcts), (col("i") + 1).cast("int")).as("pct"))
      // one combining aggregate ranks all groups' sketch outputs in a
      // single pass; the ≤ |groups|·|pcts|-row qrows frame joins
      // UNHINTED (corpus-derived cardinality, the repo-wide rule)
      ev.join(qrows, Seq("event_type"))
        .groupBy(col("event_type"), col("pct"), col("n_rows"),
          col("q"), col("eq"))
        .agg(
          sum(when(col("value") < col("q"), 1L).otherwise(0L)).as("lt"),
          sum(when(col("value") <= col("q"), 1L).otherwise(0L)).as("le"))
        .select(col("event_type"), col("pct"), col("n_rows"),
          round(col("eq"), 4).as("exact_q"),
          ((col("lt").cast("double") / col("n_rows") - eps <= col("pct"))
            && (col("pct") <= col("le").cast("double") / col("n_rows")
              + eps)).cast("long").as("within_eps"))
    },

    // Hot-key detection — the pre-pass a skew-aware pipeline runs
    // before keying a 100-TB shuffle: which keys exceed 1/(c+1) of the
    // stream and need salting / capping / a skew-join hint. The
    // scale-correct shape is a SKETCH, not a groupBy: `groupBy(k).count`
    // shuffles the whole key vocabulary (billions of distinct URLs /
    // authors / session ids) to answer a ≤ c-row question, where the
    // Misra-Gries aggregate (`functions.MisraGriesAgg`) carries c
    // counters per partition, merges map-side, and GUARANTEES its ≤ c
    // candidates include every key above the N/(c+1) bar — so one
    // broadcast semi-join re-counts just the candidates exactly and the
    // final filter makes the end-to-end result EXACT and deterministic
    // (extra candidates vary with partitioning; the answer set never
    // does). Two scans of the key column total, zero vocabulary-wide
    // shuffles. The corpus's own keys flatten at scale, so the gate
    // PLANTS the skew deterministically (the construct-the-signal
    // pattern): 70% of events hash to 3 hot keys, the rest stay
    // per-user — at every SF exactly the 3 hot keys clear the c=8 bar
    // while the per-user tail (≤ ~9%) stays under it. The oracle is the
    // exact GROUP BY + HAVING semantics the sketch path must reproduce.
    QuerySpec(
      "q_hot_keys",
      """WITH ev AS (SELECT CASE WHEN user_id % 10 < 7
        |      THEN concat('hot', CAST(user_id % 3 AS VARCHAR))
        |      ELSE concat('u', CAST(user_id AS VARCHAR)) END AS k
        |    FROM events),
        |tot AS (SELECT count(*) AS n FROM ev),
        |f AS (SELECT k, count(*) AS cnt FROM ev GROUP BY k)
        |SELECT k, CAST(cnt AS BIGINT) AS cnt FROM f, tot
        |WHERE cnt * 9 > n""".stripMargin) { (s, d) =>
      val C = 8
      val ev = Tables.events(s, d).select(
        when(col("user_id") % 10 < 7,
          concat(lit("hot"), (col("user_id") % 3).cast("string")))
          .otherwise(concat(lit("u"), col("user_id").cast("string")))
          .as("k"))
      // Pass 1: one group-less partial-aggregating pass → ≤ C candidate
      // keys + the exact stream length. limit(C) is a semantic no-op
      // (the aggregate's array is ≤ C by construction) that makes the
      // bound STRUCTURAL for the broadcast below.
      val cand = ev
        .agg(graft.functions.MisraGriesAgg.misra_gries(col("k"), C)
          .as("cands"), count(lit(1)).as("n"))
        .select(explode(col("cands")).as("k"), col("n"))
        .limit(C)
      // Pass 2: exact re-count restricted to the candidates — the join
      // is a broadcast of ≤ C rows, the aggregate has ≤ C groups.
      ev.join(broadcast(cand), Seq("k"))
        .groupBy(col("k"), col("n"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * (C + 1) > col("n"))
        .select(col("k"), col("cnt"))
    },

    // Distinct-count sketch — HyperLogLog registers, value-gated: exact
    // COUNT(DISTINCT key) over a 100-TB table is an Expand plus a
    // shuffle carrying the FULL distinct key set; the HLL aggregate
    // (`functions.HllAgg`) carries a constant 2^10 = 1 KiB register
    // file per partition, merges bytewise-max map-side, and estimates
    // within ~3% (1.04/√m). The gate certifies the sketch
    // CONSTRUCTION, not a ballpark: both engines derive the same
    // md5-based 64-bit hash (the `q_checksum` fingerprint contract),
    // split it top-10-bits/register + leading-zero rank — rho's
    // bit-length arithmetic is `bin()`-string length in the oracle and
    // numberOfLeadingZeros in the aggregate, provably equal — so the
    // occupied-register rows are bit-identical, integer-exact, and
    // partitioning-independent (max is order-free). The estimate
    // itself is one driver-side formula over ≤ 1024 rows
    // (`HllAgg.estimate`; accuracy pinned in `OperatorsSpec` at 5%
    // against the exact count).
    QuerySpec(
      "q_hll_distinct",
      """WITH h AS (SELECT md5_number_upper(CAST(l_orderkey AS VARCHAR))
        |             AS h FROM lineitem),
        |reg AS (SELECT CAST(h >> 54 AS INT) AS register,
        |               CAST(h & ((1::UBIGINT << 54) - 1) AS BIGINT) AS m
        |        FROM h)
        |SELECT register,
        |  CAST(max(CASE WHEN m = 0 THEN 55
        |           ELSE 55 - length(bin(m)) END) AS INT) AS max_rho
        |FROM reg GROUP BY register""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .select(md5Num(col("l_orderkey").cast("string")).as("h"))
        .agg(graft.functions.HllAgg.hll_registers(col("h"), 10).as("rs"))
        .select(explode(col("rs")).as("r"))
        .select(col("r.register").as("register"),
          col("r.max_rho").as("max_rho"))
    },

    // The sketch as a GROUPED aggregate — distinct users per event
    // type, the "cardinality by segment" profile every warehouse
    // publishes. Per-group per-partition state is the constant 2^10
    // bytes (groups × 1 KiB map-side, merged bytewise-max like any
    // partial agg), vs the Expand + full-vocabulary shuffle an exact
    // grouped COUNT(DISTINCT) pays per group. Register rows stay
    // bit-identical to the GROUP BY (type, register) oracle; the
    // per-group estimates are the same driver-side formula over each
    // group's ≤ 1024 rows.
    QuerySpec(
      "q_hll_grouped",
      """WITH h AS (SELECT event_type,
        |  md5_number_upper(CAST(user_id AS VARCHAR)) AS h FROM events),
        |reg AS (SELECT event_type, CAST(h >> 54 AS INT) AS register,
        |               CAST(h & ((1::UBIGINT << 54) - 1) AS BIGINT) AS m
        |        FROM h)
        |SELECT event_type, register,
        |  CAST(max(CASE WHEN m = 0 THEN 55
        |           ELSE 55 - length(bin(m)) END) AS INT) AS max_rho
        |FROM reg GROUP BY event_type, register""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          md5Num(col("user_id").cast("string")).as("h"))
        .groupBy(col("event_type"))
        .agg(graft.functions.HllAgg.hll_registers(col("h"), 10).as("rs"))
        .select(col("event_type"), explode(col("rs")).as("r"))
        .select(col("event_type"), col("r.register").as("register"),
          col("r.max_rho").as("max_rho"))
    },

    // HLL sketch MERGE across shards — the cross-replica distinct
    // law: two register sets built INDEPENDENTLY on disjoint halves
    // of the table (l_orderkey parity — two separate aggregates, as
    // two replicas or two time windows would build them), merged by
    // elementwise register max, must be bit-identical to the sketch
    // built over the union in one pass. That distributive property is
    // WHY the profile store can keep one 1 KiB sketch per shard and
    // answer "distinct across any shard subset" without re-scanning:
    // at 100 TB the merge touches ≤ 1024 rows per shard, zero data.
    // The oracle builds the one-pass union sketch; the engine only
    // ever sees the two halves.
    QuerySpec(
      "q_hll_merged",
      """WITH h AS (SELECT md5_number_upper(CAST(l_orderkey AS VARCHAR))
        |             AS h FROM lineitem),
        |reg AS (SELECT CAST(h >> 54 AS INT) AS register,
        |               CAST(h & ((1::UBIGINT << 54) - 1) AS BIGINT) AS m
        |        FROM h)
        |SELECT register,
        |  CAST(max(CASE WHEN m = 0 THEN 55
        |           ELSE 55 - length(bin(m)) END) AS INT) AS max_rho
        |FROM reg GROUP BY register""".stripMargin) { (s, d) =>
      def shard(parity: Int): DataFrame =
        Tables.load(s, d, "lineitem")
          .filter(pmod(col("l_orderkey"), lit(2)) === parity)
          .select(md5Num(col("l_orderkey").cast("string")).as("h"))
          .agg(graft.functions.HllAgg.hll_registers(col("h"), 10).as("rs"))
          .select(explode(col("rs")).as("r"))
          .select(col("r.register").as("register"),
            col("r.max_rho").as("max_rho"))
      shard(0).unionByName(shard(1))
        .groupBy(col("register"))
        .agg(max(col("max_rho")).as("max_rho"))
    },

    // Count-Min frequency sketch, certified: d = 4 rows × w = 1024
    // buckets of md5-salted counters (constant 32 KiB state, map-side
    // combinable — the point-frequency twin of the HLL's distinct),
    // answering per-key count queries as min over the 4 bucket
    // counters. The gate probes data-derived hot keys (user_id % 29 =
    // 0) plus four ABSENT keys and emits, per probe, the estimate
    // next to the exact count with the two CMS laws as verdicts:
    // no-underestimate (structural — every counter includes the key's
    // own rows) and overshoot ≤ 8·N/w (Markov on the collision mass;
    // deterministic here because the hash is fixed). The oracle
    // recomputes the SAME counters — bucket-level bit parity, not
    // just verdict parity.
    QuerySpec(
      "q_cms_freq",
      """WITH seeds AS (SELECT unnest(range(0, 4)) AS seed),
        |cms AS (
        |  SELECT seed,
        |    md5_number_upper(CAST(user_id AS VARCHAR) || ':' ||
        |      CAST(seed AS VARCHAR)) & 1023 AS bucket,
        |    count(*) AS cnt
        |  FROM events CROSS JOIN seeds GROUP BY 1, 2),
        |probes AS (SELECT DISTINCT user_id FROM events
        |           WHERE user_id % 29 = 0
        |           UNION ALL
        |           SELECT * FROM (VALUES (-1), (-2), (-3), (-4))
        |             t(user_id)),
        |ex AS (SELECT user_id, count(*) AS exact FROM events GROUP BY 1),
        |est AS (
        |  SELECT p.user_id, min(coalesce(c.cnt, 0)) AS est
        |  FROM probes p CROSS JOIN seeds s
        |  LEFT JOIN cms c ON c.seed = s.seed AND c.bucket =
        |    (md5_number_upper(CAST(p.user_id AS VARCHAR) || ':' ||
        |      CAST(s.seed AS VARCHAR)) & 1023)
        |  GROUP BY 1)
        |SELECT CAST(e.user_id AS BIGINT) AS user_id,
        |  CAST(e.est AS BIGINT) AS est,
        |  CAST(coalesce(x.exact, 0) AS BIGINT) AS exact,
        |  e.est >= coalesce(x.exact, 0) AS ok_lower,
        |  e.est <= coalesce(x.exact, 0) +
        |    (8 * (SELECT count(*) FROM events)) // 1024 AS ok_upper
        |FROM est e LEFT JOIN ex x USING (user_id)""".stripMargin) {
      (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val seeds = explode(array((0 until 4).map(lit): _*)).as("seed")
      def bucket(key: Column, seed: Column): Column =
        md5Num(concat(key.cast("string"), lit(":"), seed.cast("string")))
          .bitwiseAND(lit(1023L))
      val cms = ev.select(col("user_id"), seeds)
        .groupBy(col("seed"), bucket(col("user_id"), col("seed")).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val probes = ev.select(col("user_id"))
        .filter(col("user_id") % 29 === 0).distinct()
        .unionByName(Seq(-1L, -2L, -3L, -4L).toDF("user_id"))
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact"))
      val est = probes.select(col("user_id"), seeds)
        .withColumn("bucket", bucket(col("user_id"), col("seed")))
        .join(cms, Seq("seed", "bucket"), "left")
        .groupBy(col("user_id"))
        .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      val bound = ev.agg(
        ((count(lit(1)) * 8).cast("long") / 1024).cast("long").as("bound"))
      est.join(exact, Seq("user_id"), "left")
        .crossJoin(broadcast(bound))
        .select(col("user_id"), col("est"),
          coalesce(col("exact"), lit(0L)).as("exact"),
          (col("est") >= coalesce(col("exact"), lit(0L))).as("ok_lower"),
          (col("est") <= coalesce(col("exact"), lit(0L)) + col("bound"))
            .as("ok_upper"))
    },

    // Bloom-filter membership, certified: the build side's keys
    // (BUILDING-segment custkeys) hash to k = 5 salted bit positions
    // in an m = 65536-bit filter represented as its ≤ m distinct
    // set-bit rows — a ~100 KB frame the planner broadcasts by size
    // (hash-mod-bounded, never hinted), which is the whole point at
    // 100 TB: a semi-join against a 3 k-key dimension costs a
    // broadcast of KILOBYTES instead of shuffling the fact table.
    // Probes are every ordering customer; per segment the gate emits
    // probe/reported counts with an id-sum checksum of the reported
    // keys, plus the two Bloom laws as verdicts: ZERO false negatives
    // on the member segment (structural) and bounded false positives
    // elsewhere (deterministic for the fixed hash). The oracle
    // rebuilds the same bit set.
    QuerySpec(
      "q_bloom_join",
      """WITH ks AS (SELECT unnest(range(0, 5)) AS k),
        |build AS (SELECT c_custkey FROM customer
        |          WHERE c_mktsegment = 'BUILDING'),
        |bits AS (
        |  SELECT DISTINCT
        |    md5_number_upper(CAST(c_custkey AS VARCHAR) || '#' ||
        |      CAST(k AS VARCHAR)) & 65535 AS pos
        |  FROM build CROSS JOIN ks),
        |probes AS (
        |  SELECT DISTINCT o_custkey AS key FROM orders),
        |hits AS (
        |  SELECT p.key, count(b.pos) AS n_set
        |  FROM probes p CROSS JOIN ks
        |  LEFT JOIN bits b ON b.pos =
        |    (md5_number_upper(CAST(p.key AS VARCHAR) || '#' ||
        |      CAST(ks.k AS VARCHAR)) & 65535)
        |  GROUP BY 1),
        |cls AS (
        |  SELECT c.c_mktsegment AS segment, h.key,
        |    CASE WHEN h.n_set = 5 THEN 1 ELSE 0 END AS reported
        |  FROM hits h JOIN customer c ON c.c_custkey = h.key)
        |SELECT segment,
        |  CAST(count(*) AS BIGINT) AS n_probes,
        |  CAST(sum(reported) AS BIGINT) AS n_reported,
        |  CAST(sum(CASE WHEN reported = 1 THEN key ELSE 0 END)
        |    AS BIGINT) AS id_sum_reported,
        |  CASE WHEN segment = 'BUILDING'
        |       THEN sum(reported) = count(*)
        |       ELSE sum(reported) <= 32 END AS ok
        |FROM cls GROUP BY segment""".stripMargin) { (s, d) =>
      val ks = explode(array((0 until 5).map(lit): _*)).as("k")
      def pos(key: Column, k: Column): Column =
        md5Num(concat(key.cast("string"), lit("#"), k.cast("string")))
          .bitwiseAND(lit(65535L))
      val cust = Tables.load(s, d, "customer")
      val bits = cust.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), ks)
        .select(pos(col("c_custkey"), col("k")).as("pos"))
        .distinct()
      val probes = Tables.load(s, d, "orders")
        .select(col("o_custkey").as("key")).distinct()
      val hits = probes.select(col("key"), ks)
        .withColumn("pos", pos(col("key"), col("k")))
        .join(bits, Seq("pos"), "left_semi")
        .groupBy(col("key")).agg(count(lit(1)).as("n_set"))
      // left-semi drops missing positions, so re-join probes to keep
      // keys whose every position missed (n_set = 0)
      val clsBase = probes.join(hits, Seq("key"), "left")
        .select(col("key"),
          when(coalesce(col("n_set"), lit(0L)) === 5, 1L).otherwise(0L)
            .as("reported"))
      clsBase
        .join(cust.select(col("c_custkey").as("key"),
          col("c_mktsegment").as("segment")), Seq("key"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_probes"),
          sum(col("reported")).as("n_reported"),
          sum(when(col("reported") === 1, col("key")).otherwise(0L))
            .as("id_sum_reported"))
        .select(col("segment"), col("n_probes"), col("n_reported"),
          col("id_sum_reported"),
          when(col("segment") === "BUILDING",
            col("n_reported") === col("n_probes"))
            .otherwise(col("n_reported") <= 32).as("ok"))
    }
  )
}
