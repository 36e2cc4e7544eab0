package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second ring of the relational surface: operators beyond the
  * reference's needs that a complete engine exposes (SURVEY.md §2.9's
  * fence, deliberately crossed as engine extensions): as-of join, skew-
  * safe aggregation, cube, full/cross joins, lateral explode, ordered
  * array agg, min_by/max_by, string functions, approximate sketches,
  * pivot, ranking windows.
  */
object Extended {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** Whole-row upsert (MERGE latest-wins): rows of `changes` replace
    * base rows sharing their key; unmatched change rows insert. The
    * snapshot-maintenance kernel of every CDC apply. ONE anti join +
    * union at any scale — and because a CDC batch is normally ≪ the
    * base, the anti join's build side is the CHANGE KEY SET (narrow:
    * keys only, never change payloads), which AQE broadcasts while
    * small and shuffles when a backfill-sized batch outgrows that.
    */
  def upsert(base: org.apache.spark.sql.DataFrame,
      changes: org.apache.spark.sql.DataFrame,
      keys: Seq[String]): org.apache.spark.sql.DataFrame =
    base.join(changes.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(changes)

  val specs: Seq[QuerySpec] = Seq(

    // As-of join: for every click event, the most recent error event of
    // the same user at or before it. Spark lacks a native as-of join;
    // per the custom-op preference order we COMPOSE it: tag + union both
    // streams, one window pass carrying the last error forward, filter
    // back to clicks. One shuffle on (user_id), no range explosion.
    // Oracle: DuckDB's native ASOF JOIN — two independent formulations
    // agreeing is exactly what the hash-compare is for.
    QuerySpec(
      "q_asof_join",
      """WITH e AS (SELECT event_id, user_id, ts, event_type, value FROM events),
        |clicks AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'click'),
        |errors AS (SELECT user_id, ts, max_by(value, event_id) AS err_value
        |           FROM e WHERE event_type = 'error' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id,
        |       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |       c.value AS click_value, err.err_value
        |FROM clicks c ASOF JOIN errors err
        |  ON c.user_id = err.user_id AND c.ts >= err.ts""".stripMargin) {
      (s, d) =>
        val ev = Tables.events(s, d)
        // right side deduped to one row per (user_id, ts): max_by event_id
        val errors = ev.filter(col("event_type") === "error")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("err_value"))
          .select(col("user_id"), col("ts"), col("err_value"),
            lit(0).as("src")) // errors sort before same-ts clicks
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"),
            lit(1).as("src"))
        val unioned = errors
          .select(col("user_id"), col("ts"), col("src"),
            lit(null).cast("long").as("event_id"),
            lit(null).cast("double").as("value"), col("err_value"))
          .unionByName(clicks.withColumn("err_value", lit(null).cast("double")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("src"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned
          .withColumn("last_err", last(col("err_value"), ignoreNulls = true).over(w))
          .filter(col("src") === 1 && col("last_err").isNotNull)
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
            col("value").as("click_value"),
            col("last_err").as("err_value"))
    },

    // The SAME as-of semantics through the native whole-operator path:
    // graft.plans.AsOfJoin plants a custom logical node that the injected
    // strategy plans as AsOfJoinExec — one hash exchange per side, sorted
    // (user_id, ts), then a single streaming merge with O(1) state: no
    // union materialization, no window buffering. Shares q_asof_join's
    // oracle SQL verbatim: three formulations (composed window, native
    // merge, DuckDB ASOF) must agree row-for-row.
    QuerySpec(
      "q_asof_native",
      """WITH e AS (SELECT event_id, user_id, ts, event_type, value FROM events),
        |clicks AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'click'),
        |errors AS (SELECT user_id, ts, max_by(value, event_id) AS err_value
        |           FROM e WHERE event_type = 'error' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id,
        |       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |       c.value AS click_value, err.err_value
        |FROM clicks c ASOF JOIN errors err
        |  ON c.user_id = err.user_id AND c.ts >= err.ts""".stripMargin) {
      (s, d) =>
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        // right side deduped to one row per (user_id, ts) — as-of ties on
        // the time column would otherwise be order-dependent
        val errors = ev.filter(col("event_type") === "error")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("err_value"))
          .withColumnRenamed("ts", "err_ts")
        graft.plans.AsOfJoin.asof(clicks, errors,
            keys = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "err_ts")
          .select(col("event_id"), clicks("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
            col("value").as("click_value"),
            col("err_value"))
    },

    // The SAME as-of semantics through the SQL surface (asof_join TVF →
    // AsOfJoinPlan → AsOfJoinExec): q_asof_native's oracle, verbatim, so
    // the gate proves SQL callers reach the identical native operator.
    QuerySpec(
      "q_asof_sql",
      """WITH e AS (SELECT event_id, user_id, ts, event_type, value FROM events),
        |clicks AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'click'),
        |errors AS (SELECT user_id, ts, max_by(value, event_id) AS err_value
        |           FROM e WHERE event_type = 'error' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id,
        |       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |       c.value AS click_value, err.err_value
        |FROM clicks c ASOF JOIN errors err
        |  ON c.user_id = err.user_id AND c.ts >= err.ts""".stripMargin) {
      (s, d) =>
        graft.plans.AsOfJoin.ensureSqlRegistered(s)
        val ev = Tables.events(s, d)
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .createOrReplaceTempView("g_asof_clicks")
        ev.filter(col("event_type") === "error")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("err_value"))
          .withColumnRenamed("ts", "err_ts")
          .createOrReplaceTempView("g_asof_errors")
        s.sql(
          """SELECT event_id, user_id,
            |  date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS click_ts,
            |  value AS click_value, err_value
            |FROM asof_join('g_asof_clicks', 'g_asof_errors',
            |               'user_id', 'ts', 'err_ts')""".stripMargin)
    },

    // Skew-safe two-stage aggregation: event_type has 5 hot keys — a
    // plain groupBy funnels everything through ≤5 reducers. Salting
    // fans the partial stage out 16× and folds the salt back in stage
    // two. Result-identical to the plain GROUP BY the oracle runs
    // (counts exact, sums via exact decimals).
    QuerySpec(
      "q_skew_agg",
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("pv"))
        .groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"),
          sum(col("pv")).cast("double").as("total_value"))
    },

    // Salted JOIN — q_skew_agg's sibling for the other skewed shuffle:
    // a fact⋈dim equi-join whose hottest key carries ~23% of the fact
    // (the q_hot_keys planted distribution — exactly what that gate's
    // sketch detects). A plain hash join lands the hot key's entire
    // fact slice in ONE task; salting fans the fact out by an 8-way
    // row salt and EXPLODES the dim 8× (each dim row must meet every
    // salt), so the join key becomes (k, salt) and the hot key spreads
    // over 8 tasks. The dim side takes a shuffle_hash hint — the
    // technique targets the case where the dim is too big to broadcast
    // (here it scales with the user population) but salt-explodable;
    // AQE's runtime skew-join split covers sort-merge plans, salting
    // is the static form that also composes with the downstream
    // aggregate (which reuses the same salt for its partial stage
    // before folding it back — no row ever meets a skewed reducer).
    // Result-identical to the oracle's plain join + GROUP BY (counts
    // exact, sums via exact decimals, attr integer).
    QuerySpec(
      "q_skew_join",
      """WITH ev AS (SELECT event_id, CASE WHEN user_id % 10 < 7
        |      THEN concat('hot', CAST(user_id % 3 AS VARCHAR))
        |      ELSE concat('u', CAST(user_id AS VARCHAR)) END AS k, value
        |    FROM events),
        |dim AS (SELECT k, length(k) AS attr FROM
        |        (SELECT DISTINCT k FROM ev))
        |SELECT ev.k, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        |  CAST(max(attr) AS INT) AS attr
        |FROM ev JOIN dim ON ev.k = dim.k GROUP BY ev.k""".stripMargin) {
      (s, d) =>
        val ev = Tables.events(s, d).select(
          col("event_id"),
          when(col("user_id") % 10 < 7,
            concat(lit("hot"), (col("user_id") % 3).cast("string")))
            .otherwise(concat(lit("u"), col("user_id").cast("string")))
            .as("k"),
          col("value"))
        val dim = ev.select(col("k")).distinct()
          .select(col("k"), length(col("k")).as("attr"))
        val salted = ev
          .withColumn("salt", pmod(xxhash64(col("event_id")), lit(8)))
        val dimx = dim
          .withColumn("salt", explode(sequence(lit(0L), lit(7L))))
        salted.join(dimx.hint("shuffle_hash"), Seq("k", "salt"))
          .groupBy(col("k"), col("salt"))
          .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("pv"),
            max(col("attr")).as("pa"))
          .groupBy(col("k"))
          .agg(sum(col("pn")).as("n"),
            sum(col("pv")).cast("double").as("total_value"),
            max(col("pa")).cast("int").as("attr"))
    },

    // Change-data-capture delta: per-user latest (event_type, value)
    // state inside two adjacent 12 h activity windows, diffed into
    // added / removed / changed rows — the snapshot-diff primitive of
    // every incremental warehouse load. The oracle materialises the two
    // states separately and FULL-JOINs them; the engine form is ONE
    // scan and ONE shuffle: both windows filter into the same
    // user_id-grouped aggregate as FILTERed max_by's (ordered by
    // (ts, event_id) — event_id is unique, so the "latest" pick is
    // deterministic), and the full-outer semantics fall out of the
    // aggregate's null slots. At 100 TB the windows prune at the scan
    // (ts is the natural partition/sort column) and no join exists at
    // all — the diff costs exactly one pass over two windows of the
    // fact stream.
    QuerySpec(
      "q_cdc_delta",
      """WITH olds AS (
        |  SELECT user_id, last(event_type ORDER BY ts, event_id) AS old_type,
        |         last(value ORDER BY ts, event_id) AS old_value
        |  FROM events
        |  WHERE ts > TIMESTAMP '2024-01-01 00:00:00'
        |    AND ts <= TIMESTAMP '2024-01-01 12:00:00'
        |  GROUP BY user_id),
        |news AS (
        |  SELECT user_id, last(event_type ORDER BY ts, event_id) AS new_type,
        |         last(value ORDER BY ts, event_id) AS new_value
        |  FROM events
        |  WHERE ts > TIMESTAMP '2024-01-01 12:00:00'
        |    AND ts <= TIMESTAMP '2024-01-02 00:00:00'
        |  GROUP BY user_id)
        |SELECT coalesce(o.user_id, n.user_id) AS user_id,
        |  CASE WHEN o.user_id IS NULL THEN 'added'
        |       WHEN n.user_id IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change_type,
        |  o.old_type, n.new_type, o.old_value, n.new_value
        |FROM olds o FULL JOIN news n ON o.user_id = n.user_id
        |WHERE o.user_id IS NULL OR n.user_id IS NULL
        |   OR o.old_type <> n.new_type OR o.old_value <> n.new_value""".stripMargin) {
      (s, d) =>
        val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
        val t1 = lit("2024-01-01 12:00:00").cast("timestamp")
        val t2 = lit("2024-01-02 00:00:00").cast("timestamp")
        val st = Tables.events(s, d)
          .withColumn("in_old", col("ts") > t0 && col("ts") <= t1)
          .withColumn("in_new", col("ts") > t1 && col("ts") <= t2)
          .filter(col("in_old") || col("in_new"))
          .groupBy(col("user_id"))
          .agg(
            expr("max_by(named_struct('t', event_type, 'v', value), " +
              "named_struct('o', ts, 'i', event_id)) FILTER (WHERE in_old)")
              .as("o"),
            expr("max_by(named_struct('t', event_type, 'v', value), " +
              "named_struct('o', ts, 'i', event_id)) FILTER (WHERE in_new)")
              .as("n"))
        st.select(col("user_id"),
            when(col("o").isNull, "added")
              .when(col("n").isNull, "removed")
              .otherwise("changed").as("change_type"),
            col("o.t").as("old_type"), col("n.t").as("new_type"),
            col("o.v").as("old_value"), col("n.v").as("new_value"))
          .filter(col("o").isNull || col("n").isNull ||
            col("old_type") =!= col("new_type") ||
            col("old_value") =!= col("new_value"))
    },

    // CUBE: all grouping-set combinations over two dimensions.
    QuerySpec(
      "q_cube",
      """SELECT coalesce(event_type, 'ALL') AS etype,
        |       coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL') AS user_bucket,
        |       n
        |FROM (SELECT event_type, user_id % 10 AS user_id_mod, count(*) AS n
        |      FROM events GROUP BY CUBE (event_type, user_id % 10)) x(event_type, user_id, n)""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .cube(col("event_type"), (col("user_id") % 10).as("user_id_mod"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("event_type"), lit("ALL")).as("etype"),
            coalesce(col("user_id_mod").cast("string"), lit("ALL")).as("user_bucket"),
            col("n"))
    },

    // The classic OLAP shape: fact table joined through two broadcast
    // dimension chains, filtered, with exact-decimal revenue rollup —
    // the plan every 100 TB star-schema query wants (pruned fact scan,
    // all-broadcast dims, single agg exchange). customer grows linearly
    // with scale factor, so it carries NO broadcast() hint (a hint
    // bypasses AQE's size check and the 8 GB broadcast cap — OOM at
    // sf100); size stats still plan it as a broadcast at bench scale,
    // and nation/region are constant-size so their hints stay.
    QuerySpec(
      "q_star_join",
      """SELECT n_name AS nation, r_name AS region,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY n_name, r_name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name").as("nation"), col("r_name").as("region"))
        .agg(
          sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // Explicit GROUPING SETS (beyond rollup/cube's fixed lattices),
    // through the SQL front-end on both engines.
    QuerySpec(
      "q_grouping_sets",
      """SELECT coalesce(event_type, 'ALL') AS etype,
        |       coalesce(CAST(user_id AS VARCHAR), 'ALL') AS user_key,
        |       count(*) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id), ())""".stripMargin) {
      (s, d) =>
        Tables.registerAll(s, d)
        s.sql(
          """SELECT coalesce(event_type, 'ALL') AS etype,
            |       coalesce(CAST(user_id AS STRING), 'ALL') AS user_key,
            |       count(*) AS n
            |FROM events
            |GROUP BY GROUPING SETS ((event_type), (user_id), ())""".stripMargin)
    },

    // FULL OUTER + CROSS joins (completing the join-type surface; inner/
    // left/semi/anti live in Relational.scala).
    QuerySpec(
      "q_full_join",
      """SELECT coalesce(c.nk, s.nk) AS nk, c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |USING (nk)""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, Seq("nk"), "full")
    },
    QuerySpec(
      "q_cross_join",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |WHERE r_regionkey <> n_regionkey""".stripMargin) { (s, d) =>
      Tables.region(s, d).crossJoin(broadcast(Tables.nation(s, d)))
        .filter(col("r_regionkey") =!= col("n_regionkey"))
        .select(col("r_name"), col("n_name"))
    },

    // Lateral explode (LATERAL VIEW / unnest): one row per token.
    QuerySpec(
      "q_explode",
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |FROM documents WHERE doc_id < 50""".stripMargin) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    },

    // Ordered array aggregation round-trip.
    QuerySpec(
      "q_array_agg",
      """SELECT doc_id,
        | array_to_string(list_sort(list_distinct(string_split(text,' '))), '|') AS vocab
        |FROM documents WHERE doc_id < 100""".stripMargin) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"),
          array_join(array_sort(array_distinct(split(col("text"), " "))), "|")
            .as("vocab"))
    },

    // min_by / max_by (argmin/argmax) aggregates.
    QuerySpec(
      "q_minmax_by",
      """SELECT o_custkey,
        | arg_max(o_orderkey, o_totalprice) AS best_order,
        | arg_min(o_orderkey, o_totalprice) AS worst_order,
        | max(o_totalprice) AS best_price
        |FROM orders GROUP BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(
          max_by(col("o_orderkey"), col("o_totalprice")).as("best_order"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("worst_order"),
          max(col("o_totalprice")).as("best_price"))
    },

    // Scalar string-function surface.
    QuerySpec(
      "q_string_funcs",
      """SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
        | substring(p_name, 1, 8) AS name_prefix,
        | length(p_name) AS name_len, replace(p_type, ' ', '_') AS type_us,
        | lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        | reverse(p_brand) AS brand_rev, trim('  x  ') AS trimmed
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"), upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        reverse(col("p_brand")).as("brand_rev"),
        trim(lit("  x  ")).as("trimmed"))
    },

    // Approximate sketches: HLL distinct count + quantile sketch. Sketch
    // STATES differ across engines ⇒ the raw approximations have no
    // value-level oracle; what IS oracled is the error CONTRACT. The
    // query computes both the sketches and their exact companions in one
    // job and emits per group: the exact row count plus two certified
    // 0/1 verdicts —
    //   parts_within_eps : |hll − exact| ≤ 3·rsd·exact (rsd = 0.05,
    //     approx_count_distinct's default relative standard deviation,
    //     so the bound is the sketch's own 3σ envelope);
    //   median_within_eps: the approx median's exact RANK is within
    //     ±0.01·n of the true median rank. The GK/KLL guarantee at
    //     accuracy=10000 is rank error ≤ 1e-4·n — the ±1% window is
    //     that guarantee with 100× slack, still tight enough that a
    //     broken sketch cannot pass.
    // The DuckDB oracle recomputes the exact counts and asserts the
    // verdict columns are literal 1 — putting the ε-gate INSIDE the
    // driver's hash-compare contract instead of a rows-only check.
    QuerySpec(
      "q_approx",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(1 AS BIGINT) AS parts_within_eps,
        |  CAST(1 AS BIGINT) AS median_within_eps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      // Pass 1: the sketches themselves (one grouped object agg).
      val sk = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("median_approx"),
          count(lit(1)).as("n"))
      // Pass 2 certifies by RANK, not by exact percentile: counting the
      // rows ≤ / < the approx median is a codegen'd conditional sum —
      // no second object-hash percentile buffer — and checks the
      // sketch's actual contract (rank error) directly. The per-group
      // sketch frame joins back unhinted (it is a grouped aggregate
      // over a corpus scan — grows with group cardinality, so AQE must
      // size it; at any scale it is |groups| rows and broadcasts).
      // The approx median m sits at rank interval (#<m, #≤m]; the gate
      // asserts that interval overlaps [0.49n, 0.51n].
      li.select(col("l_returnflag"), col("l_partkey"), col("l_extendedprice"))
        .join(sk, "l_returnflag")
        .groupBy(col("l_returnflag"), col("approx_parts"),
          col("median_approx"), col("n"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          sum(when(col("l_extendedprice") <= col("median_approx"), 1L)
            .otherwise(0L)).as("rank_le"),
          sum(when(col("l_extendedprice") < col("median_approx"), 1L)
            .otherwise(0L)).as("rank_lt"))
        .select(
          col("l_returnflag"), col("n"),
          (abs(col("approx_parts") - col("exact_parts"))
            <= col("exact_parts").cast("double") * lit(0.15))
            .cast("long").as("parts_within_eps"),
          (col("rank_le").cast("double") >= lit(0.49) * col("n") &&
            col("rank_lt").cast("double") <= lit(0.51) * col("n"))
            .cast("long").as("median_within_eps"))
    },

    // Exact companion to q_approx: the same readout with exact distinct
    // count and exact interpolated median, fully oracled — the
    // value-level reference the ε-verdicts above are certified against
    // (ExtendedSpec additionally asserts the numeric bound end-to-end).
    QuerySpec(
      "q_approx_exact",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS median_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      // Split formulation: mixing count(DISTINCT) with percentile in one
      // agg makes Catalyst thread the percentile buffers through a
      // two-level (flag, partkey) aggregation — object buffers per FINE
      // group through the first exchange. Two independent single-purpose
      // aggs joined on the tiny group set benched 2.3× faster at sf0.1
      // and shuffle strictly less at any scale.
      val li = Tables.lineitem(s, d)
      val pd = li.groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 2).as("median_price"),
          count(lit(1)).as("n"))
      val cd = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      pd.join(cd, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"),
          col("median_price"), col("n"))
    },

    // Pivot: event counts per user bucket × event type. Spark's pivot
    // relational op vs the oracle's manual CASE aggregation.
    QuerySpec(
      "q_pivot",
      """SELECT user_id % 10 AS user_bucket,
        | count(*) FILTER (WHERE event_type = 'click')    AS click,
        | count(*) FILTER (WHERE event_type = 'error')    AS error,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase
        |FROM events GROUP BY user_id % 10""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select((col("user_id") % 10).as("user_bucket"), col("event_type"))
        .groupBy(col("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "error", "purchase"))
    },

    // Ranking-window surface: rank, dense_rank, ntile, lead.
    QuerySpec(
      "q_window_rank",
      """SELECT o_custkey, o_orderkey,
        | rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        | ntile(4) OVER w AS quartile, lead(o_orderkey, 1) OVER w AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"))
    },

    // Null-propagation surface (P12 as a query): missing JSON key →
    // null → null-safe aggregation + explicit null bucketing.
    QuerySpec(
      "q_null_handling",
      """SELECT coalesce(CAST(json_extract_string(props, '$.missing') AS BIGINT), -1) AS missing_bucket,
        | count(*) AS n,
        | count(json_extract_string(props, '$.missing')) AS n_nonnull
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val missing = get_json_object(col("props"), "$.missing")
      Tables.events(s, d)
        .groupBy(coalesce(missing.cast("long"), lit(-1L)).as("missing_bucket"))
        .agg(count(lit(1)).as("n"), count(missing).as("n_nonnull"))
    },

    // Unpivot (wide → long): four measure columns melt into (metric,
    // value) rows, then a per-metric rollup. Unpivot is a per-row
    // projection (1 row → 4 rows, no shuffle); only the small rollup
    // exchanges — the cheap direction of reshaping at any scale.
    QuerySpec(
      "q_unpivot",
      """SELECT metric, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM (UNPIVOT lineitem
        |      ON l_quantity, l_extendedprice, l_discount, l_tax
        |      INTO NAME metric VALUE value)
        |GROUP BY metric""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
    },

    // Distribution windows: ntile / percent_rank / cume_dist over a
    // tie-broken ordering (unique (price, orderkey) sort keeps rank ==
    // row_number so the rationals match bit-for-bit across engines).
    // Scale note: the 5 priority groups each order ~20% of the table in
    // one task — inherent to the NATIVE window form, which is this
    // query's purpose. q_dist_scaled below computes the identical
    // result (same oracle) with value-range blocking — the shape a
    // 100-TB table needs.
    QuerySpec(
      "q_window_dist",
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pr,
        |  round(cume_dist() OVER w, 4) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.load(s, d, "orders").select(
          col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"))
    },

    // The SAME distribution functions computed scale-safe — and gated on
    // the SAME oracle as q_window_dist, proving value-identity. Exact
    // rank without a group-wide ordering: block the sort key by VALUE
    // ranges (blk = floor(price) div 1024 is monotone in the sort
    // order), rank locally within (group, blk), then add cumulative
    // block-count offsets (the doc_pack two-level pattern). From the
    // unique tie-broken rank, the distribution functions are closed
    // forms: pr = (rank-1)/(n-1), cd = rank/n, and SQL ntile's
    // first-(n mod k)-buckets-get-one-extra rule as integer CASE
    // arithmetic. No task ever orders more than one value-block of one
    // group.
    QuerySpec(
      "q_dist_scaled",
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pr,
        |  round(cume_dist() OVER w, 4) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin) {
      (s, d) =>
        val t = Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority").as("grp"),
            col("o_totalprice").as("p"))
          .withColumn("blk", expr("CAST(floor(p) AS BIGINT) div 1024"))
        val wIn = Window.partitionBy(col("grp"), col("blk"))
          .orderBy(col("p"), col("o_orderkey"))
        val local = t.withColumn("lr", row_number().over(wIn).cast("long"))
        val wBlk = Window.partitionBy(col("grp")).orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = t.groupBy(col("grp"), col("blk"))
          .agg(count(lit(1)).as("bc"))
          .withColumn("off", coalesce(sum(col("bc")).over(wBlk), lit(0L)))
          .select(col("grp"), col("blk"), col("off"))
        val n = t.groupBy(col("grp")).agg(count(lit(1)).as("n"))
        local.join(offs, Seq("grp", "blk")).join(n, Seq("grp"))
          .withColumn("rnk", col("off") + col("lr"))
          .select(
            col("o_orderkey"),
            expr("""CASE WHEN rnk <= (n % 4) * ((n div 4) + 1)
                    THEN (rnk - 1) div ((n div 4) + 1) + 1
                    ELSE (n % 4) + (rnk - (n % 4) * ((n div 4) + 1) - 1)
                         div (n div 4) + 1 END""").cast("long").as("quartile"),
            round((col("rnk") - 1).cast("double") /
              (col("n") - 1).cast("double"), 4).as("pr"),
            round(col("rnk").cast("double") /
              col("n").cast("double"), 4).as("cd"))
    },

    // Range-framed window (event-time sliding aggregate): per-user
    // 10-minute trailing sum/count where the frame is defined by VALUE
    // distance (RANGE), not row count — the declarative batch form of a
    // sliding stream aggregate. Frames run on epoch MILLISECONDS: both
    // engines floor the nanos-origin timestamp identically, where raw
    // epoch() would be fractional in DuckDB but integral in Spark. Equal
    // timestamps are frame PEERS (all included) in both engines, so tie
    // order can't perturb values. One shuffle on user_id.
    QuerySpec(
      "q_range_frame",
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |                  CAST(value AS DECIMAL(12,2)) AS v FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ms
        |       RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS v10m,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ms
        |       RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW) AS n10m
        |FROM e""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
        .rangeBetween(-600000L, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ms"), dec(col("value")).as("v"))
        .select(col("event_id"), col("user_id"),
          sum(col("v")).over(w).cast("double").as("v10m"),
          count(lit(1)).over(w).as("n10m"))
    },

    // Correlated scalar subquery semantics: orders strictly above their
    // customer's average order value. The comparison is cross-multiplied
    // (price·n > Σprice) in DECIMAL so no engine ever divides — exact
    // integer-scaled arithmetic on both sides of the oracle. Spark-first
    // formulation: one partial-aggregated shuffle + a same-key join,
    // which is exactly what Catalyst decorrelates such subqueries into.
    QuerySpec(
      "q_scalar_correlated",
      """SELECT o.o_orderkey, o.o_custkey
        |FROM orders o
        |WHERE CAST(o.o_totalprice AS DECIMAL(12,2))
        |    * (SELECT count(*) FROM orders o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |  > (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(12,2)))
        |     FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin) {
      (s, d) =>
        val orders = Tables.load(s, d, "orders")
        val perCust = orders.groupBy(col("o_custkey")).agg(
          count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).as("total"))
        orders.join(perCust, Seq("o_custkey"))
          .filter(dec(col("o_totalprice")) * col("cnt") > col("total"))
          .select(col("o_orderkey"), col("o_custkey"))
    },

    // Statistical aggregates: sample stddev/variance, covariance and
    // Statistical outlier detection (the data-QC sweep a pipeline runs
    // before trusting a batch): events whose value exceeds their
    // type's mean + 3σ. The per-type moments are a tiny aggregate
    // (5 rows) joined back unhinted; the flagging comparison runs
    // against the 4-dp-ROUNDED mean and stddev — exact arithmetic on
    // identical doubles in both engines, so no accumulation-order ulp
    // can flip a borderline verdict (the q_stats convention, applied
    // to a predicate). One scan + one broadcast-sized join; emitted
    // rows are the outliers only.
    QuerySpec(
      "q_anomaly",
      """WITH m AS (SELECT event_type,
        |    round(avg(value), 4) AS mu, round(stddev_samp(value), 4) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  round(m.mu + 3 * m.sd, 4) AS threshold
        |FROM events e JOIN m ON e.event_type = m.event_type
        |WHERE e.value > m.mu + 3 * m.sd""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val m = ev.groupBy(col("event_type"))
        .agg(round(avg(col("value")), 4).as("mu"),
          round(stddev_samp(col("value")), 4).as("sd"))
      ev.join(m, Seq("event_type"))
        .filter(col("value") > col("mu") + lit(3) * col("sd"))
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("mu") + lit(3) * col("sd"), 4).as("threshold"))
    },

    // Pearson correlation per group. Both engines accumulate central
    // co-moments; 4-dp rounding absorbs the accumulation-order ulps.
    QuerySpec(
      "q_stats",
      """SELECT o_orderpriority,
        |  round(stddev_samp(o_totalprice), 4) AS sd,
        |  round(var_samp(o_totalprice), 4) AS vr,
        |  round(covar_samp(o_totalprice, o_custkey), 4) AS cv,
        |  round(corr(o_totalprice, o_custkey), 4) AS cr
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(stddev_samp(col("o_totalprice")), 4).as("sd"),
          round(var_samp(col("o_totalprice")), 4).as("vr"),
          round(covar_samp(col("o_totalprice"), col("o_custkey")), 4).as("cv"),
          round(corr(col("o_totalprice"), col("o_custkey")), 4).as("cr"))
    },

    // Lateral join: per-nation top-2 suppliers by account balance — the
    // correlated-subquery-in-FROM operator. Spark plans the correlated
    // LIMIT as a partitioned top-k (no per-row re-execution), same as
    // the window formulation, but the LATERAL surface is what a SQL
    // user migrating from the reference's warehouse would write.
    QuerySpec(
      "q_lateral",
      """SELECT n.n_name, t.s_name, t.s_acctbal
        |FROM nation n, LATERAL (
        |  SELECT s_name, s_acctbal FROM supplier s
        |  WHERE s.s_nationkey = n.n_nationkey
        |  ORDER BY s_acctbal DESC, s_name LIMIT 2) t""".stripMargin) {
      (s, d) =>
        Tables.load(s, d, "nation").createOrReplaceTempView("graft_nation")
        Tables.load(s, d, "supplier").createOrReplaceTempView("graft_supplier")
        s.sql(
          """SELECT n.n_name, t.s_name, t.s_acctbal
            |FROM graft_nation n, LATERAL (
            |  SELECT s_name, s_acctbal FROM graft_supplier s
            |  WHERE s.s_nationkey = n.n_nationkey
            |  ORDER BY s_acctbal DESC, s_name LIMIT 2) t""".stripMargin)
    },

    // The TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    // this schema's columns: a returned line (l_returnflag = 'R') plays
    // the late-delivery role. The trap is the pair of correlated
    // multi-condition subqueries against the SAME fact table —
    //   EXISTS     (another supplier on the order)
    //   NOT EXISTS (another supplier with a returned line on the order)
    // — which a naive decorrelation turns into THREE full lineitem scans
    // (l1 + a semi-join scan + an anti-join scan). The engine form scans
    // lineitem ONCE: aggregate to the (order, supplier) grain carrying
    // the returned-line count, then derive both existence predicates
    // from per-order counts over that aggregated frame — n_supps >= 2 ⟺
    // the EXISTS; n_ret_supps = 1 (with this supplier's ret_lines > 0) ⟺
    // the NOT EXISTS. The window runs at the (order, supplier) grain,
    // whose per-order group is bounded by lines-per-order (~7 in TPC-H),
    // so no key can concentrate; numwait sums the carried line counts,
    // restoring l1-row semantics without a second scan. Plan-pinned in
    // PlanSpec: exactly one lineitem scan, final top-100 a TakeOrdered.
    QuerySpec(
      "q_tpch21_waiting",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |  AND s_nationkey = n_nationkey
        |  AND n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin) { (s, d) =>
      val ret = col("l_returnflag") === "R"
      val per = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(sum(when(ret, 1L).otherwise(0L)).as("ret_lines"))
      val w = Window.partitionBy(col("l_orderkey"))
      val culprit = per
        .withColumn("n_supps", count(lit(1)).over(w))
        .withColumn("n_ret_supps",
          sum(when(col("ret_lines") > 0, 1).otherwise(0)).over(w))
        .filter(col("ret_lines") > 0 &&
          col("n_supps") >= 2 && col("n_ret_supps") === 1)
      culprit
        .join(Tables.load(s, d, "orders")
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, d, "supplier"), // scaling dim: no hint
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, d, "nation")
            .filter(col("n_name")
              .isInCollection(Seq("NATION_3", "NATION_7", "NATION_11")))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("ret_lines")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // The TPC-H Q20 shape (suppliers with excess stock of promo parts),
    // adapted: no partsupp table here, so the supplies relation is
    // lineitem aggregated to the (part, supplier) grain, and "excess" =
    // the supplier shipped more than 2× the part's per-supplier average
    // — the nested-IN chain (supplier IN dominant-pairs, part IN
    // name-filtered parts) over a correlated per-part aggregate. The
    // comparison q·n > tot·2 stays in DECIMAL × integer arithmetic:
    // exact in both engines, no 0.5 double ever materializes. Engine
    // form: one lineitem scan → (part, supplier) partial-aggregated
    // groupBy → per-part window (group size = suppliers-per-part,
    // bounded) → semi-join chain (part filter, then supplier) — IN
    // subqueries become LeftSemi joins, never row-duplicating inner
    // joins (plan-pinned).
    QuerySpec(
      "q_tpch20_excess",
      """WITH supplies AS (
        |  SELECT l_partkey, l_suppkey,
        |         sum(CAST(l_quantity AS DECIMAL(12,2))) AS q
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |dominant AS (
        |  SELECT DISTINCT l_suppkey FROM (
        |    SELECT l_partkey, l_suppkey, q,
        |           sum(q) OVER (PARTITION BY l_partkey) AS tot,
        |           count(*) OVER (PARTITION BY l_partkey) AS n
        |    FROM supplies) x
        |  WHERE q * n > tot * 2
        |    AND l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE 'red%'))
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
        |  AND n_name IN ('NATION_2', 'NATION_9', 'NATION_17')""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy(col("l_partkey"))
        val dominant = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(dec(col("l_quantity"))).as("q"))
          .withColumn("tot", sum(col("q")).over(w))
          .withColumn("n", count(lit(1)).over(w))
          .filter(col("q") * col("n") > col("tot") * 2)
          .join(Tables.load(s, d, "part")
              .filter(col("p_name").like("red%")).select(col("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_suppkey")).distinct()
        Tables.load(s, d, "supplier")
          .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(Tables.load(s, d, "nation")
              .filter(col("n_name")
                .isInCollection(Seq("NATION_2", "NATION_9", "NATION_17")))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"))
    },

    // Incremental aggregate maintenance — the materialized-view /
    // streaming-state contract: a per-group aggregate STATE (count,
    // decimal sum, min, max) computed on the history merges with the
    // state of a new delta batch, and the merge must equal the full
    // recompute (which is exactly what the oracle runs). This is the
    // algebra every incremental pipeline stands on (count/sum merge by
    // +, min/max by min/max; avg derives at read time — never stored,
    // or it stops merging). DECIMAL sums make + associative across the
    // regroup, so merged-vs-recomputed is EXACT equality, not ε-close.
    // At scale: each side aggregates map-side to |groups| rows, the
    // merge shuffles only state rows — the delta never re-touches
    // history data, which is the entire point.
    QuerySpec(
      "q_incr_agg",
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        |  min(value) AS min_value, max(value) AS max_value,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
        |       / count(*) AS DOUBLE) AS avg_value
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val cut = to_timestamp(lit("2024-01-20 00:00:00"))
      def state(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"), sum(dec(col("value"))).as("sv"),
          min(col("value")).as("mn"), max(col("value")).as("mx"))
      val ev = Tables.events(s, d)
      state(ev.filter(col("ts") < cut))
        .unionByName(state(ev.filter(col("ts") >= cut)))
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
          min(col("mn")).as("min_value"), max(col("mx")).as("max_value"))
        .select(col("event_type"), col("n"),
          col("sv").cast("double").as("total_value"),
          col("min_value"), col("max_value"),
          (col("sv").cast("double") / col("n")).cast("double").as("avg_value"))
    },

    // Incremental maintenance of an aggregate-over-JOIN view (the
    // DBToaster delta rule, next to q_incr_agg's plain aggregate
    // states): with old states A, B and increments dA, dB,
    // d(A JOIN B) = dA JOIN B  ∪  A JOIN dB  ∪  dA JOIN dB — three
    // joins whose smaller side is DELTA-sized, never a recompute of
    // A JOIN B (whose agg state the view already holds; here the base
    // term is computed once to stand in for the materialized view).
    // The merged count/DECIMAL-sum states then fold exactly like
    // q_incr_agg's. At 100 TB this is the difference between joining
    // tonight's increment against the bucketed base and re-joining two
    // full tables; the oracle IS the full recompute, so the gate
    // certifies the delta algebra lands bit-identically on it.
    QuerySpec(
      "q_incr_join",
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS total_spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_custkey""".stripMargin) { (s, d) =>
      val orders = Tables.load(s, d, "orders")
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"))
      val oB = orders.filter(col("o_orderkey") % 11 =!= 5)
      val oD = orders.filter(col("o_orderkey") % 11 === 5)
      val cB = cust.filter(col("c_custkey") % 13 =!= 6)
      val cD = cust.filter(col("c_custkey") % 13 === 6)
      def state(o: org.apache.spark.sql.DataFrame,
          c: org.apache.spark.sql.DataFrame) =
        o.join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("sv"))
      state(oB, cB) // the materialized view's state (computed once here)
        .unionByName(state(oD, cB)) // dA ⋈ B
        .unionByName(state(oB, cD)) // A ⋈ dB
        .unionByName(state(oD, cD)) // dA ⋈ dB
        .groupBy(col("o_custkey"))
        .agg(sum(col("n")).as("n_orders"),
          sum(col("sv")).cast("double").as("total_spend"))
    },

    // MERGE / upsert (CDC apply): a deterministic change batch —
    // updates for keys ≡ 3 (mod 7) (status 'X', price +100), inserts
    // keyed past the base id space for keys ≡ 0 (mod 31) — lands on the
    // orders snapshot latest-wins. Timestamps stay out of the output
    // (oracle convention); +100.0 on a double is exact in both engines.
    QuerySpec(
      "q_upsert",
      """WITH ch AS (
        |  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
        |         o_totalprice + 100.0 AS o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N',
        |         o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 31 = 0)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderpriority
        |FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ch)
        |UNION ALL
        |SELECT * FROM ch""".stripMargin) { (s, d) =>
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"))
      val changes = base.filter(col("o_orderkey") % 7 === 3)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("o_totalprice", col("o_totalprice") + 100.0)
        .unionByName(base.filter(col("o_orderkey") % 31 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
          .withColumn("o_orderstatus", lit("N")))
      upsert(base, changes, Seq("o_orderkey"))
    }
  )
}
