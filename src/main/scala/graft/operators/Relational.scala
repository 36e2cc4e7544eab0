package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator surface (SURVEY.md §2.3–§2.8 plus the engine-
  * completeness fence of §2.9), expressed Spark-first over the driver's
  * synthetic tables.
  *
  * Oracle-parity conventions (the driver hash-compares against DuckDB):
  *  - Double SUMs go through DECIMAL(12,2) (exact) and are cast back to
  *    DOUBLE at the end, so partial-aggregation order can't perturb bits.
  *  - Timestamps are emitted as formatted strings (Spark writes
  *    isAdjustedToUTC parquet timestamps, DuckDB writes naive ones).
  *  - Sorted/limited queries always carry a unique tie-break key.
  */
object Relational {

  /** TPC-H Q3/Q5 shapes (adapted to the driver schema — orders carries
    * no o_shippriority, so Q3 groups on (orderkey, orderdate)): the two
    * canonical multi-join analytics patterns — selective dimension
    * filters reaching every scan, small sides broadcast, one
    * partial-aggregated shuffle for the revenue rollup.
    */
  private def tpchSpecs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q_tpch3_shipping",
      """SELECT l.l_orderkey,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
        |         * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val customer = Tables.load(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val orders = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val lineitem = Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      // customer grows linearly with scale factor, so no broadcast()
      // hint: a hint bypasses the size check and would force a multi-GB
      // build side at sf100+. Size stats / AQE pick BHJ while the dim is
      // small (pinned by PlanSpec) and fall back to SMJ when it isn't.
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    QuerySpec(
      "q_tpch5_local_volume",
      """SELECT n.n_name,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
        |         * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |              AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'EUROPE'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n.n_name""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      val orders = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val joined = Tables.load(s, d, "lineitem")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        // supplier scales with sf — leave broadcast-vs-SMJ to size
        // stats / AQE; only the fixed-cardinality nation/region keep hints
        .join(Tables.load(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.load(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
      joined.groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
    },

    // TPC-H Q6 shape (forecast revenue change): the canonical
    // filter-pushdown showcase — a scan-only aggregate whose THREE
    // predicates all reach PushedFilters, no join, no wide shuffle: the
    // single exchange carries one partial-agg row per task. At 100 TB
    // this query is pure scan bandwidth × predicate selectivity.
    QuerySpec(
      "q_tpch6_forecast",
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            col("l_discount").cast("decimal(4,2)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q12 shape (priority-class line counts; the driver schema has
    // no l_shipmode, so the CASE classifier runs on o_orderpriority):
    // conditional-count aggregation over a fact-to-fact join — orders is
    // the smaller side but beyond broadcast at real scale, so the plan
    // is the shuffle join both sides partial-aggregate into. Counts are
    // exact integers; no float parity surface at all.
    QuerySpec(
      "q_tpch12_priority",
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus""".stripMargin) { (s, d) =>
      val urgent = col("o_orderpriority").isInCollection(
        Seq("1-URGENT", "2-HIGH"))
      Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.load(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(urgent, 1L).otherwise(0L)).as("high_count"),
          sum(when(!urgent, 1L).otherwise(0L)).as("low_count"))
    },

    // TPC-H Q10 shape (top returning customers): revenue of 'R'-flagged
    // lines per customer over a quarter, top-20. The selective filters
    // (returnflag, order date) reach both fact scans before the joins;
    // customer is a broadcast dimension; revenue partial-aggregates into
    // one shuffle keyed by the group, and the top-20 runs as a
    // TakeOrdered, never a global sort.
    QuerySpec(
      "q_tpch10_returns",
      """SELECT c.c_custkey, c.c_name,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
        |         * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c.c_custkey, c.c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val orders = Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      Tables.load(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        // scaling dim: no forced broadcast (see q_tpch3 comment)
        .join(Tables.load(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("revenue"))
    },

    // TPC-H Q18 shape (large-volume orders): IN over an aggregated
    // HAVING subquery. Spark-first: the subquery is a partial-aggregated
    // groupBy reused as a LEFT SEMI join on the order key — the same
    // decorrelation Catalyst performs for the SQL form — so the big
    // fact aggregates once, map-side first. Quantities are integral
    // doubles; sums stay exact in DECIMAL.
    QuerySpec(
      "q_tpch18_volume",
      """SELECT c.c_custkey, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(tq.total_qty AS DOUBLE) AS total_qty
        |FROM orders o
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN (SELECT l_orderkey,
        |        sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250) tq
        |  ON tq.l_orderkey = o.o_orderkey""".stripMargin) { (s, d) =>
      val bigOrders = Tables.load(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("total_qty"))
        .filter(col("total_qty") > 250)
      Tables.load(s, d, "orders")
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        // scaling dim: no forced broadcast (see q_tpch3 comment)
        .join(Tables.load(s, d, "customer"),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("total_qty").cast("double").as("total_qty"))
    },

    // TPC-H Q7 shape (volume shipping between two nations): the nation
    // dim joins TWICE under different roles (supplier's vs customer's
    // nation) — fixed-cardinality, so both keep broadcast hints per the
    // broadcast policy — and the two-direction predicate reduces to
    // supp_nation <> cust_nation once both sides are restricted to the
    // pair. Nation filters reach the supplier/customer side BEFORE the
    // fact joins, so the big joins see ~2/25ths of each dimension.
    QuerySpec(
      "q_tpch7_volume",
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(rev) AS DOUBLE) AS revenue FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) x
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      val pair = Seq("NATION_1", "NATION_2")
      val nat = Tables.load(s, d, "nation")
      val sup = Tables.load(s, d, "supplier")
        .join(broadcast(nat.filter(col("n_name").isInCollection(pair))
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = Tables.load(s, d, "customer")
        .join(broadcast(nat.filter(col("n_name").isInCollection(pair))
          .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cnk"))
        .select(col("c_custkey"), col("cust_nation"))
      Tables.load(s, d, "lineitem")
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.load(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1) - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
    },

    // TPC-H Q13 shape (customer order-count distribution): LEFT join so
    // zero-order customers keep c_count = 0, then a histogram of the
    // per-customer counts — double aggregation, both partial-aggregated;
    // the second groupBy's key space is tiny (distinct order counts).
    QuerySpec(
      "q_tpch13_custdist",
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) x
        |GROUP BY c_count""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer")
        .join(Tables.load(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // TPC-H Q17 shape (small-quantity revenue): a correlated AVG
    // subquery per part. Spark-first decorrelation: the per-part mean
    // quantity is ONE partial-aggregated pass over lineitem joined back
    // on the part key — the same rewrite Catalyst applies to the SQL
    // form. Quantities are integral doubles, so the mean is bit-exact
    // in both engines (exact integer sum < 2^53, same division) and the
    // 0.2·avg comparison can't flip between them.
    QuerySpec(
      "q_tpch17_smallqty",
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |             / 7.0, 2) AS avg_yearly
        |FROM lineitem l JOIN part p ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p.p_partkey)""".stripMargin) {
      (s, d) =>
        val li = Tables.load(s, d, "lineitem")
        val brandParts = Tables.load(s, d, "part")
          .filter(col("p_brand") === "Brand#1")
          .select(col("p_partkey"))
        val avgQty = li.groupBy(col("l_partkey").as("a_partkey"))
          .agg(avg(col("l_quantity")).as("aq"))
        li.join(brandParts, col("l_partkey") === col("p_partkey"))
          .join(avgQty, col("l_partkey") === col("a_partkey"))
          .filter(col("l_quantity") < lit(0.2) * col("aq"))
          .agg(round(sum(dec(col("l_extendedprice"))).cast("double") /
            lit(7.0), 2).as("avg_yearly"))
    },

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    // OR-of-ANDs mixing columns from BOTH join sides. The planner
    // CNF-converts the disjunction to extract the single-side conjuncts
    // (the brand/size disjunction reaches the part scan, the quantity
    // disjunction the lineitem scan) while the mixed residual stays on
    // the join — the difference between scanning 2 brands' worth of
    // parts and scanning all of them.
    QuerySpec(
      "q_tpch19_disjunct",
      """SELECT CAST(sum(rev) AS DOUBLE) AS revenue FROM (
        |  SELECT CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |         AND l_quantity BETWEEN 1 AND 20)
        |     OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |         AND l_quantity BETWEEN 10 AND 40)) x""".stripMargin) {
      (s, d) =>
        val li = Tables.load(s, d, "lineitem")
        val part = Tables.load(s, d, "part")
        val cond1 = col("p_brand") === "Brand#1" &&
          col("p_size").between(1, 15) && col("l_quantity").between(1, 20)
        val cond2 = col("p_brand") === "Brand#2" &&
          col("p_size").between(10, 30) && col("l_quantity").between(10, 40)
        li.join(part, col("p_partkey") === col("l_partkey"))
          .filter(cond1 || cond2)
          .agg(sum(dec(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"))
    },

    // TPC-H Q22 shape (global sales opportunity): customers above the
    // average positive balance with no LARGE order (every synthetic
    // customer has some order, so the anti-condition keys on high-value
    // orders to stay non-trivial) — a scalar aggregate comparison plus
    // NOT EXISTS, grouped on a low-cardinality key.
    // The balance-above-average predicate is cross-multiplied
    // (bal·n > sum) so both engines compare EXACT decimals instead of a
    // float average whose partial-sum order could flip a boundary row.
    // Plan: the (n, sum) scalar broadcasts as one row; NOT EXISTS is a
    // left-anti join on the customer key.
    QuerySpec(
      "q_tpch22_noorders",
      """WITH s AS (SELECT count(*) AS n,
        |             sum(CAST(c_acctbal AS DECIMAL(12,2))) AS tot
        |           FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer c, s
        |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * s.n > s.tot
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000)
        |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      val cust = Tables.load(s, d, "customer")
      val scalar = cust.filter(col("c_acctbal") > 0)
        .agg(count(lit(1)).as("n"), sum(dec(col("c_acctbal"))).as("tot"))
      cust
        .join(broadcast(scalar)) // 1-row scalar: broadcast is exact-size
        .filter(dec(col("c_acctbal")) * col("n") > col("tot"))
        .join(Tables.load(s, d, "orders")
          .filter(col("o_totalprice") > 400000).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
    },

    // TPC-H Q14 shape (promo revenue share): conditional revenue over a
    // part-dimension join. Both the promo slice and the total are exact
    // DECIMAL sums; only the final share divides — identical doubles on
    // both engines, rounded at 6 dp. Part joins by size stats / AQE
    // (BHJ while small, SMJ at scale) — no forced hint.
    QuerySpec(
      "q_tpch14_promo",
      """WITH r AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev,
        |       p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)
        |    AS promo_revenue,
        |  CAST(sum(rev) AS DOUBLE) AS total_revenue,
        |  round(CAST(100 * sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)
        |        / CAST(sum(rev) AS DOUBLE), 6) AS promo_share_pct
        |FROM r""".stripMargin) {
      (s, d) =>
        val rev = col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(4,2)"))
        val promoRev = sum(when(col("p_type") === "PROMO", rev).otherwise(
          lit(0).cast("decimal(14,4)")))
        Tables.load(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          // part scales with sf: no forced broadcast (see q_tpch3 comment)
          .join(Tables.load(s, d, "part"),
            col("l_partkey") === col("p_partkey"))
          .agg(
            promoRev.cast("double").as("promo_revenue"),
            sum(rev).cast("double").as("total_revenue"),
            round((promoRev * 100).cast("double") / sum(rev).cast("double"), 6)
              .as("promo_share_pct"))
    },

    // TPC-H Q2 shape (min-cost supplier): the correlated-MIN-over-a-
    // multi-join planner trap — for each part, the probe must match the
    // MINIMUM supply cost among the part's EUROPE offers, where the
    // correlated subquery itself spans a 4-table subtree (offers ⋈
    // supplier ⋈ nation ⋈ region). The schema has no partsupp table, so
    // the supply relation is derived from lineitem: one (partkey,
    // suppkey) offer per observed pair at min observed price — same
    // shape, same trap. The Spark side is the decorrelated form written
    // directly: ONE offers frame (derived once) feeds BOTH the per-part
    // MIN aggregate and the equality probe, so the planner sees the
    // shared subtree instead of re-deriving the 4-table join per side
    // (ReusedExchange — pinned in PlanSpec). The part filter semi-reduces
    // offers BEFORE the MIN: a part's min is unchanged by filtering
    // WHICH parts are asked about, and at 100 TB the 6%-selective filter
    // cuts the aggregate's input proportionally. Costs compare as exact
    // DECIMAL(12,2) (double equality across engines would be fragile);
    // the output cost casts to double only at the edge.
    QuerySpec(
      "q_tpch2_mincost",
      """WITH partsupp AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
        |       CAST(ps.ps_supplycost AS DOUBLE) AS ps_supplycost
        |FROM part p
        |JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
        |JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
        |  AND r.r_name = 'EUROPE'
        |  AND ps.ps_supplycost = (
        |    SELECT min(ps2.ps_supplycost)
        |    FROM partsupp ps2
        |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      val part = Tables.load(s, d, "part")
        .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
      // Semi-reduce the fact BEFORE the pair aggregate: a pair's min
      // cost is unaffected by which parts are asked about, so
      // restricting to the ~6%-selective filtered part keys up front
      // cuts the aggregate's input proportionally — at 100 TB that is
      // the difference between aggregating the whole supply relation
      // and only the probed slice. Unhinted (part scales with sf).
      val ps = Tables.load(s, d, "lineitem")
        .join(part.select(col("p_partkey").as("pk")),
          col("l_partkey") === col("pk"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(dec(col("l_extendedprice"))).as("ps_supplycost"))
        .select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"), col("ps_supplycost"))
      // nation/region are fixed-cardinality (25/5 rows at ANY sf) —
      // hints allowed; supplier scales: size stats / AQE decide.
      val eur = Tables.load(s, d, "supplier")
        .join(broadcast(Tables.load(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
      val offers = ps
        .join(eur, col("ps_suppkey") === col("s_suppkey"))
        .join(part, col("ps_partkey") === col("p_partkey"))
      val minCost = offers.groupBy(col("ps_partkey"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      offers
        .join(minCost, Seq("ps_partkey"))
        .filter(col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"),
          col("ps_supplycost").cast("double").as("ps_supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // TPC-H Q15 shape (top supplier by quarterly revenue): the
    // reused-view planner trap — the `revenue` view appears twice, once
    // under the scalar MAX and once as the probe side, and must plan
    // ONCE (shared aggregate subtree → ReusedExchange, pinned in
    // PlanSpec), not re-scan lineitem per reference. Revenue stays
    // exact DECIMAL through the MAX-equality (double equality would be
    // engine-order-dependent) and casts to double only at the edge. The
    // scalar MAX frame is a group-less scalar aggregate — structurally
    // bounded at ANY corpus size, so the explicit broadcast is safe
    // (same policy as q_snapshot_latest).
    QuerySpec(
      "q_tpch15_topsupplier",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, s.s_acctbal,
        |       CAST(r.total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin) { (s, d) =>
      val rev = Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1) - col("l_discount").cast("decimal(4,2)")))
          .as("total_revenue"))
        // No-op semantically (suppkey is a key; the probe's equality and
        // join drop null revenue anyway) but load-bearing for the plan:
        // WITHOUT it, the probe side's joins push isnotnull constraints
        // into ITS copy of the view only, the two view subtrees stop
        // canonicalizing equal, and ReuseExchange re-plans (and
        // re-scans!) the whole revenue aggregate per reference. With the
        // constraints satisfied up front, both consumers share one
        // exchange (pinned in PlanSpec).
        .filter(col("l_suppkey").isNotNull && col("total_revenue").isNotNull)
      val maxRev = broadcast(
        rev.agg(max(col("total_revenue")).as("max_revenue")))
      rev
        .join(maxRev, col("total_revenue") === col("max_revenue"))
        // supplier scales with sf: no forced broadcast (see q_tpch3)
        .join(Tables.load(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("total_revenue").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // TPC-H Q4 shape (order priority checking): EXISTS with a MIXED
    // equi + non-equi correlated predicate — the semi join must carry
    // the `l_shipdate > o_orderdate + 60 days` comparison as a join
    // residual (both columns live on different sides), not as a
    // pushable filter. The schema lacks commit/receipt dates, so "late
    // line" is shipped >60 days after order date. Plan: LeftSemi on the
    // orderkey equi pair with the interval comparison as condition —
    // the fact table never duplicates order rows (no inner + distinct).
    QuerySpec(
      "q_tpch4_priority",
      """SELECT o.o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate")),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // TPC-H Q8 shape (national market share): the widest join in the
    // suite — lineitem ⋈ part ⋈ supplier ⋈ orders ⋈ customer ⋈ nation
    // ⋈ region ⋈ nation(again) — with a conditional-share two-level
    // readout. nation joins TWICE under different roles (customer's
    // nation prunes to EUROPE; supplier's nation labels the share),
    // which exercises alias-disambiguation through a reused dimension.
    // Share = double division of two exact decimal sums, rounded at
    // 6 dp — identical op order in both engines.
    QuerySpec(
      "q_tpch8_marketshare",
      """WITH an AS (
        |  SELECT year(o.o_orderdate) AS o_year,
        |    CAST(l.l_extendedprice AS DECIMAL(12,2))
        |      * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer cu ON o.o_custkey = cu.c_custkey
        |  JOIN nation n1 ON cu.c_nationkey = n1.n_nationkey
        |  JOIN region r ON n1.n_regionkey = r.r_regionkey
        |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |  WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
        |    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_8' THEN volume
        |                 ELSE 0 END) AS DOUBLE)
        |        / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        |FROM an GROUP BY o_year""".stripMargin) { (s, d) =>
      val volume = dec(col("l_extendedprice")) *
        (lit(1) - col("l_discount").cast("decimal(4,2)"))
      val natSupp = Tables.load(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      Tables.load(s, d, "lineitem")
        // part/supplier/customer scale with sf: stats/AQE pick the join
        // side; only fixed-cardinality nation/region carry hints.
        .join(Tables.load(s, d, "part").filter(col("p_type") === "ECONOMY"),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.load(s, d, "supplier"),
          col("s_suppkey") === col("l_suppkey"))
        .join(Tables.load(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(natSupp), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_8", volume)
            .otherwise(lit(0).cast("decimal(14,4)"))).cast("double") /
            sum(volume).cast("double"), 6).as("mkt_share"))
    },

    // TPC-H Q9 shape (product-type profit): LIKE-filtered part drives a
    // 6-table join including the DERIVED partsupp (same derivation as
    // Q2 — no partsupp table in the schema), and the profit arithmetic
    // mixes two fact columns with the joined supply cost. All exact
    // DECIMAL until the output cast. Group by (nation, year): the
    // aggregate's key set comes from two different dimension tables.
    QuerySpec(
      "q_tpch9_profit",
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
        |        * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
        |      - ps.ps_supplycost * CAST(l.l_quantity AS DECIMAL(12,2)))
        |    AS DOUBLE) AS profit
        |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE p.p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      // The derived partsupp is a WINDOW over the fact, not an
      // aggregate-and-join-back: min(price) partitioned by the
      // (partkey, suppkey) pair rides the same shuffle the fact needs
      // anyway and the plan scans lineitem ONCE (pinned) — the
      // aggregate form scanned it twice and joined a corpus-sized
      // derived frame back to itself. Pair groups are lines-per-pair
      // (single digits), so the window exposes no skew. The part
      // filter joins AFTER the window: a pair's min is defined over
      // ALL its lines, unaffected by which parts are asked about.
      val wPair = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_partkey"), col("l_suppkey"))
      Tables.load(s, d, "lineitem")
        .withColumn("ps_supplycost", min(dec(col("l_extendedprice"))).over(wPair))
        .join(Tables.load(s, d, "part").filter(col("p_name").like("%red%")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.load(s, d, "supplier"),
          col("s_suppkey") === col("l_suppkey"))
        .join(Tables.load(s, d, "orders"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.load(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1) - col("l_discount").cast("decimal(4,2)")) -
          col("ps_supplycost") * dec(col("l_quantity")))
          .cast("double").as("profit"))
    },

    // TPC-H Q11 shape (important stock): GROUP BY ... HAVING against a
    // scalar subquery over the SAME filtered view — the Q15 lesson
    // squared: the nation-filtered partsupp value view feeds both the
    // per-part aggregate and the global threshold, and must plan once.
    // The threshold compare stays in exact DECIMAL by scaling with an
    // integer literal (×1000) instead of multiplying by a 0.001 double,
    // so borderline parts can't flip between engines.
    QuerySpec(
      "q_tpch11_stock",
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost,
        |         sum(CAST(l_quantity AS DECIMAL(12,2))) AS ps_availqty
        |  FROM lineitem GROUP BY 1, 2),
        |gps AS (
        |  SELECT ps_partkey, ps_supplycost * ps_availqty AS value
        |  FROM ps JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_name = 'NATION_8')
        |SELECT ps_partkey, CAST(sum(value) AS DOUBLE) AS total_value
        |FROM gps GROUP BY ps_partkey
        |HAVING sum(value) * 1000 > (SELECT sum(value) FROM gps)""".stripMargin) {
      (s, d) =>
      // Semi-reduce the fact to the target nation's suppliers BEFORE
      // the pair aggregate (the Q2 trick): only 1/|nations| of the
      // supply relation can reach gps, so aggregating the rest is pure
      // waste at any scale. Unhinted — the supplier set scales with sf.
      val natSupp = Tables.load(s, d, "supplier")
        .join(broadcast(Tables.load(s, d, "nation")
          .filter(col("n_name") === "NATION_8")),
          col("s_nationkey") === col("n_nationkey"))
      val ps = Tables.load(s, d, "lineitem")
        .join(natSupp.select(col("s_suppkey").as("sk")),
          col("l_suppkey") === col("sk"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(dec(col("l_extendedprice"))).as("ps_supplycost"),
          sum(dec(col("l_quantity"))).as("ps_availqty"))
        .select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"),
          col("ps_supplycost"), col("ps_availqty"))
      val gps = ps
        .join(natSupp, col("ps_suppkey") === col("s_suppkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost") * col("ps_availqty")).as("value"))
        // Q15 lesson: satisfy the constraints BOTH references need up
        // front, or the probe side's pushed isnotnull de-canonicalizes
        // the shared view and the whole partsupp join plans twice.
        .filter(col("ps_partkey").isNotNull && col("value").isNotNull)
      val total = broadcast(gps.agg(sum(col("value")).as("total")))
      gps.groupBy(col("ps_partkey"))
        .agg(sum(col("value")).as("sum_value"))
        .join(total, col("sum_value") * 1000 > col("total"))
        .select(col("ps_partkey"),
          col("sum_value").cast("double").as("total_value"))
    },

    // TPC-H Q16 shape (supplier count by part attributes): NOT IN with
    // a subquery — Spark's null-aware anti join — composed with a
    // count(DISTINCT) over the join result and an IN-list scan filter.
    // The supplier exclusion ("complaints" stand-in: negative account
    // balance) anti-joins BEFORE the distinct count so excluded
    // suppliers never inflate the aggregate's key space.
    QuerySpec(
      "q_tpch16_suppcnt",
      """WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
        |                   l_suppkey AS ps_suppkey FROM lineitem)
        |SELECT p_brand, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'MEDIUM'
        |  AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
        |  AND ps.ps_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val ps = Tables.load(s, d, "lineitem")
        .select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .distinct()
      val excluded = Tables.load(s, d, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      ps
        .join(excluded, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(Tables.load(s, d, "part")
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "MEDIUM" &&
            col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)),
          col("p_partkey") === col("ps_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
    })

  /** Exact decimal image of a 2-dp double column (parity helper).
    * Precision 12 keeps sums and products on Spark's Long-backed Decimal
    * fast path (results ≤ precision 18 avoid the BigDecimal slow path,
    * which benched ~3× slower on the 600k-row aggregations); every data
    * column here is < 10^10 so the narrowing is lossless.
    */
  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  val specs: Seq[QuerySpec] = tpchSpecs ++ Seq(

    // A1 (+ groupBy extension): pricing summary — partial/final hash agg.
    QuerySpec(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) *
              (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
    },

    // F1/J2/A1: latest-snapshot — scalar MAX broadcast back as a filter.
    // 100 TB shape: 1-row agg + broadcast join, never a global sort/window.
    QuerySpec(
      "q_snapshot_latest",
      """SELECT event_id, user_id, event_type, value,
        | strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        |FROM events WHERE ts = (SELECT max(ts) FROM events)""".stripMargin) {
      (s, d) =>
        val ev = Tables.events(s, d)
        val mx = ev.agg(max(col("ts")).as("max_ts"))
        ev.join(broadcast(mx), col("ts") === col("max_ts"))
          .select(
            col("event_id"), col("user_id"), col("event_type"), col("value"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
    },

    // J1: multi-key USING join (join keys deduped in output).
    QuerySpec(
      "q_join_using",
      """SELECT user_id, event_type, n_events, total_value
        |FROM (SELECT user_id, event_type, count(*) AS n_events
        |      FROM events GROUP BY user_id, event_type) c
        |JOIN (SELECT user_id, event_type,
        |        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |      FROM events GROUP BY user_id, event_type) v
        |USING (user_id, event_type)""".stripMargin) {
      (s, d) =>
        val ev = Tables.events(s, d)
        val counts = ev.groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
        val sums = ev.groupBy(col("user_id"), col("event_type"))
          .agg(sum(dec(col("value"))).cast("double").as("total_value"))
        counts.join(sums, Seq("user_id", "event_type"), "inner")
    },

    // The flagship shape end-to-end on the synthetic tables: two derived
    // observation streams joined on their natural key, filtered to the
    // latest hour *of the left stream only* (faithful to
    // bigquery_scheduled_query.sql:12-16 — the MAX never looks at the join).
    QuerySpec(
      "q_flagship_snapshot",
      """WITH base AS (
        |  SELECT event_id, user_id, event_type, value,
        |         strftime(ts, '%Y-%m-%d') AS d, strftime(ts, '%H') AS h
        |  FROM events),
        |t AS (SELECT d, h, user_id AS err_user, value AS err_value, event_id AS err_id
        |      FROM base WHERE event_type = 'error'),
        |w AS (SELECT d, h, user_id AS click_user, value AS click_value, event_id AS click_id
        |      FROM base WHERE event_type = 'click')
        |SELECT d, h, err_user, err_value, err_id, click_user, click_value, click_id
        |FROM t JOIN w USING (d, h)
        |WHERE strptime(d || ' ' || h, '%Y-%m-%d %H') =
        |      (SELECT max(strptime(d || ' ' || h, '%Y-%m-%d %H')) FROM t)""".stripMargin) {
      (s, d) =>
        val base = Tables.events(s, d)
          .withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
          .withColumn("h", date_format(col("ts"), "HH"))
        val t = base.filter(col("event_type") === "error")
          .select(col("d"), col("h"), col("user_id").as("err_user"),
            col("value").as("err_value"), col("event_id").as("err_id"))
        val w = base.filter(col("event_type") === "click")
          .select(col("d"), col("h"), col("user_id").as("click_user"),
            col("value").as("click_value"), col("event_id").as("click_id"))
        val tsExpr = to_timestamp(concat_ws(" ", col("d"), col("h")), "yyyy-MM-dd HH")
        val mx = t.agg(max(tsExpr).as("mts"))
        t.join(w, Seq("d", "h"), "inner")
          .join(broadcast(mx), tsExpr === col("mts"))
          .select(col("d"), col("h"), col("err_user"), col("err_value"),
            col("err_id"), col("click_user"), col("click_value"), col("click_id"))
    },

    // P1/P4/P12: nested JSON scalar extraction with null-safe cast.
    QuerySpec(
      "q_json_extract",
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events""".stripMargin) {
      (s, d) =>
        Tables.events(s, d).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"))
    },

    // P2/P3: array head + negative-index last element.
    QuerySpec(
      "q_array_headlast",
      """SELECT doc_id, string_split(text, ' ')[1] AS first_tok,
        | string_split(text, ' ')[-1] AS last_tok,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents""".stripMargin) {
      (s, d) =>
        val w = split(col("text"), " ")
        Tables.documents(s, d).select(
          col("doc_id"),
          element_at(w, 1).as("first_tok"),
          element_at(w, -1).as("last_tok"),
          size(w).cast("long").as("n_tokens"))
    },

    // P5/P6/P7/P8: Kelvin-style subtraction, cast, concat_ws, literal stamp.
    QuerySpec(
      "q_scalar_ops",
      """SELECT c_custkey, concat_ws(',', c_name, c_mktsegment) AS name_seg,
        | c_acctbal - 273.15 AS acctbal_c,
        | CAST(c_nationkey AS VARCHAR) AS nation_str,
        | '2026-01-01' AS run_date
        |FROM customer""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d).select(
          col("c_custkey"),
          concat_ws(",", col("c_name"), col("c_mktsegment")).as("name_seg"),
          (col("c_acctbal") - lit(273.15)).as("acctbal_c"),
          col("c_nationkey").cast("string").as("nation_str"),
          lit("2026-01-01").as("run_date"))
    },

    // D1–D3/P10: string↔timestamp round-trip with pinned zero-padded formats.
    QuerySpec(
      "q_datetime",
      """SELECT l_orderkey, l_linenumber,
        | strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        | strftime(l_shipdate, '%H:%M') AS ship_time,
        | strftime(strptime(strftime(l_shipdate, '%Y-%m-%d') || ' ' || strftime(l_shipdate, '%H:%M'),
        |   '%Y-%m-%d %H:%M'), '%Y-%m-%d %H:%M:%S') AS ship_ts_str
        |FROM lineitem""".stripMargin) {
      (s, d) =>
        val shipDate = date_format(col("l_shipdate"), "yyyy-MM-dd")
        val shipTime = date_format(col("l_shipdate"), "HH:mm")
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber"),
          shipDate.as("ship_date"), shipTime.as("ship_time"),
          date_format(
            to_timestamp(concat_ws(" ", shipDate, shipTime), "yyyy-MM-dd HH:mm"),
            "yyyy-MM-dd HH:mm:ss").as("ship_ts_str"))
    },

    // Sort + limit (top-k) with unique tie-break.
    QuerySpec(
      "q_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) {
      (s, d) =>
        Tables.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // DISTINCT.
    QuerySpec(
      "q_distinct",
      "SELECT DISTINCT user_id, event_type FROM events") { (s, d) =>
      Tables.events(s, d).select(col("user_id"), col("event_type")).distinct()
    },

    // Set ops: UNION (dedup), INTERSECT, EXCEPT.
    QuerySpec(
      "q_union",
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
    },
    QuerySpec(
      "q_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
    },
    QuerySpec(
      "q_except",
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
    },

    // Window functions: row_number, running sum, lag.
    QuerySpec(
      "q_window",
      """SELECT event_id, user_id, value,
        | row_number() OVER w AS rn,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        | lag(event_type, 1) OVER w AS prev_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("value"),
          row_number().over(w).as("rn"),
          sum(dec(col("value")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_value"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
    },

    // Outer join + null handling.
    QuerySpec(
      "q_left_join",
      """SELECT o_orderkey, coalesce(c_name, 'unknown') AS cust_name, o_totalprice
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin) {
      (s, d) =>
        // scaling dim: no forced broadcast (see q_tpch3 comment)
        Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"), "left")
          .select(col("o_orderkey"),
            coalesce(col("c_name"), lit("unknown")).as("cust_name"),
            col("o_totalprice"))
    },

    // Semi / anti joins (EXISTS / NOT EXISTS).
    QuerySpec(
      "q_semi_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
    },
    QuerySpec(
      "q_anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
    },

    // ROLLUP over a 3-table dimension chain (broadcast both dims).
    QuerySpec(
      "q_rollup",
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |       coalesce(n_name, 'ALL') AS nation_name, total_bal, n_cust
        |FROM (SELECT r_name, n_name,
        |        CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
        |        count(*) AS n_cust
        |      FROM customer
        |      JOIN nation ON c_nationkey = n_nationkey
        |      JOIN region ON n_regionkey = r_regionkey
        |      GROUP BY ROLLUP (r_name, n_name)) x""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(sum(dec(col("c_acctbal"))).cast("double").as("total_bal"),
            count(lit(1)).as("n_cust"))
          .select(
            coalesce(col("r_name"), lit("ALL")).as("region_name"),
            coalesce(col("n_name"), lit("ALL")).as("nation_name"),
            col("total_bal"), col("n_cust"))
    },

    // GROUP BY + HAVING.
    QuerySpec(
      "q_having",
      """SELECT l_suppkey,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
        | count(*) AS n_lines
        |FROM lineitem GROUP BY l_suppkey
        |HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) > 25.5""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_suppkey"))
          .agg(sum(dec(col("l_quantity"))).cast("double").as("total_qty"),
            count(lit(1)).as("n_lines"))
          .filter(col("total_qty") / col("n_lines") > 25.5)
    },

    // Correlated EXISTS through the SQL front-end (Catalyst subquery rewrite).
    QuerySpec(
      "q_exists_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""".stripMargin) {
      (s, d) =>
        Tables.registerAll(s, d)
        s.sql(
          """SELECT o_orderkey, o_totalprice FROM orders o
            |WHERE EXISTS (SELECT 1 FROM lineitem l
            |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""".stripMargin)
    },

    // CASE WHEN + LIKE + regexp_replace.
    QuerySpec(
      "q_case_when",
      """SELECT p_partkey,
        | CASE WHEN p_retailprice > 1500 THEN 'premium'
        |      WHEN p_retailprice > 900 THEN 'mid'
        |      ELSE 'budget' END AS price_band,
        | p_name LIKE '%green%' AS is_green,
        | regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel
        |FROM part""".stripMargin) {
      (s, d) =>
        Tables.part(s, d).select(
          col("p_partkey"),
          when(col("p_retailprice") > 1500, "premium")
            .when(col("p_retailprice") > 900, "mid")
            .otherwise("budget").as("price_band"),
          col("p_name").like("%green%").as("is_green"),
          regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"))
    }
  )
}
