package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Classic TPC-H query shapes (Q1 pricing summary, Q3 shipping priority,
  * Q6 forecasting revenue) adapted to the corpus date ranges — the standard
  * analytic-throughput probes for an OLAP engine, and the shapes the
  * 100 TB design cares about: Q1 = full-scan partial aggregation (map-side
  * combine carries 4 groups, not 600k rows), Q3 = star join + topk
  * (broadcast dims, TakeOrderedAndProject), Q6 = pushed-filter scan with a
  * 1-row result.
  *
  * Money math is decimal-exact end-to-end (products of DECIMAL(18,2) stay
  * decimal until the final double cast) so both engines bit-agree — the
  * SURVEY §5.1 discipline applied to multi-factor products.
  */
object Tpch {

  private val extD: Column = col("l_extendedprice").cast("decimal(18,2)")
  private val discD: Column = col("l_discount").cast("decimal(18,2)")
  private val taxD: Column = col("l_tax").cast("decimal(18,2)")

  /** Q1: pricing summary report. */
  def qTpchQ1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
           sum(extD).cast("double").as("sum_base_price"),
           sum(extD * (lit(BigDecimal("1.00")) - discD)).cast("double").as("sum_disc_price"),
           sum(extD * (lit(BigDecimal("1.00")) - discD) * (lit(BigDecimal("1.00")) + taxD))
             .cast("double").as("sum_charge"),
           count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q3: shipping priority — unshipped revenue per order, top 10. */
  def qTpchQ3(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1998-03-15 00:00:00").cast("timestamp"))
      .groupBy(col("l_orderkey"),
               date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .agg(sum(extD * (lit(BigDecimal("1.00")) - discD)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  /** Q4 shape: EXISTS correlated subquery through the SQL frontend
    * ([[graft.Views]]) — Catalyst DECORRELATES the EXISTS into a left
    * semi join on l_orderkey (RewriteCorrelatedScalarSubquery /
    * RewritePredicateSubquery), so the physical plan is one shuffle-free
    * broadcast or one keyed shuffle, never a per-row subquery execution.
    * Adapted to the corpus schema: "late shipment" = any line shipped
    * more than 60 days after the order date. */
  def qTpchQ4(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** Q17 shape: scalar correlated subquery (per-part average) — Catalyst
    * decorrelates the scalar agg into a grouped aggregate joined back on
    * l_partkey. avg runs over integer-valued doubles (exact in binary FP,
    * so both engines agree bit-for-bit); revenue sums in decimal. */
  def qTpchQ17(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |       COUNT(*) AS n_lines
        |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l1.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
        |                       FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
  }

  /** Q22 shape: NOT EXISTS correlated subquery → decorrelated to a left
    * ANTI join — customers with no big-ticket order. */
  def qSqlNotExists(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** SQL-frontend RECURSIVE CTE (Spark 4.1's `WITH RECURSIVE` →
    * UnionLoopExec): bounded-hop reachability from the seed hosts over
    * the fixture link graph, written as the SAME ANSI recursive SQL a
    * DuckDB/Postgres user would write — the declarative form of the
    * engine's iterative frontier loops ([[graft.operators.Graph
    * .harmonic]] et al.). UNION ALL + explicit hop bound keeps the
    * recursion finite on a cyclic graph in BOTH engines (path
    * enumeration, reduced by the outer MIN(d) GROUP BY to first-
    * discovery hops); the oracle runs the identical statement. The
    * value of the row: the SQL surface users bring from warehouse
    * engines runs on this engine unchanged, planned as an iterative
    * union loop rather than a hand-built driver loop. */
  def qSqlRecursive(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """WITH RECURSIVE r(node, d) AS (
        |  SELECT DISTINCT CAST(doc_id % 997 AS BIGINT), 0
        |  FROM documents WHERE (doc_id % 997) % 100 = 0
        |  UNION ALL
        |  SELECT e.dst, r.d + 1
        |  FROM r JOIN (
        |    SELECT DISTINCT (doc_id % 997) AS src,
        |                    ((doc_id * 31 + k * 7) % 997) AS dst
        |    FROM documents
        |    LATERAL VIEW explode(sequence(1, 1 + CAST(doc_id % 3 AS INT))) AS k
        |    WHERE (doc_id % 997) <> ((doc_id * 31 + k * 7) % 997)
        |  ) e ON e.src = r.node
        |  WHERE r.d < 4
        |)
        |SELECT node, CAST(MIN(d) AS BIGINT) AS hops
        |FROM r GROUP BY node ORDER BY node""".stripMargin)
  }

  /** Q5: local supplier volume — the canonical JOIN-ORDER benchmark: six
    * tables (three broadcastable dims, two fact-fact equi-joins) plus the
    * c_nationkey = s_nationkey theta edge. Catalyst's cost-based reorder
    * + broadcast thresholds plan the dims as broadcast hash joins and
    * keep the lineitem-orders shuffle as the only big exchange. */
  def qTpchQ5(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)
  }

  /** Q12 shape (shipmode priority): conditional aggregation — SUM(CASE)
    * pairs inside one grouped pass over a fact-fact join, the
    * pivot-without-pivot pattern. Adapted to the corpus schema (no
    * l_shipmode column): grouped by l_returnflag, classifying by order
    * priority. Map-side partial aggregation carries 3 groups x 2
    * counters, never rows. */
  def qTpchQ12(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT l_returnflag,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
        |  SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Q18 (large-volume customers): grouped-HAVING semi join — the IN
    * subquery's grouped aggregate becomes a left semi join on
    * l_orderkey, then the 3-way join re-aggregates only qualifying
    * orders. Quantities are integer-valued; the DECIMAL sum keeps the
    * partial-order-independence discipline anyway. Top-100 with the
    * o_orderkey tiebreak keeps the LIMIT deterministic. */
  def qTpchQ18(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT c_name, c_custkey, o_orderkey,
        |       date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate,
        |       o_totalprice,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 212)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)
  }

  /** Q2 shape (minimum-cost supplier): the classic correlated scalar MIN
    * rewritten as a window MIN — `MIN(s_acctbal) OVER (PARTITION BY
    * l_partkey)` on the one ps⋈supplier frame, filter equality. Same
    * semantics as the correlated subquery Catalyst would decorrelate, but
    * the expensive input — DISTINCT (l_partkey, l_suppkey) from lineitem,
    * the corpus's partsupp surrogate — is computed ONCE instead of twice
    * (the subquery form repeats it inside the correlation). The window
    * shuffles the same partkey-keyed rows the decorrelated join-back
    * would, so the rewrite strictly removes one full lineitem distinct.
    * s_acctbal stands in for ps_supplycost; the equality is an exact
    * copy-compare (no arithmetic), so both engines agree bit-for-bit. */
  def qTpchQ2(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_type
        |FROM (SELECT ps.l_partkey, s_acctbal, s_name, s_nationkey,
        |             MIN(s_acctbal) OVER (PARTITION BY ps.l_partkey) AS min_bal
        |      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |      JOIN supplier ON s_suppkey = ps.l_suppkey) best
        |JOIN part ON p_partkey = best.l_partkey AND p_size = 15
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_acctbal = min_bal
        |ORDER BY s_acctbal DESC, s_name, p_partkey""".stripMargin)
  }

  /** Q13 (customer distribution): LEFT OUTER join with a non-key join-side
    * predicate (kept in the join condition, NOT the WHERE — the TPC-H trap
    * that silently turns an outer join inner), then a two-level aggregate:
    * orders-per-customer, customers-per-count. The outer join preserves
    * order-less customers as c_count = 0. */
  def qTpchQ13(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  /** Q16 (parts/supplier relationship): NOT IN over a subquery — Spark
    * plans a null-aware ANTI join (BroadcastNestedLoop degenerates to a
    * broadcast hash anti here because s_suppkey is non-nullable) — plus
    * COUNT(DISTINCT) under GROUP BY, which Catalyst expands to a two-phase
    * distinct-then-count aggregate. */
  def qTpchQ16(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = ps.l_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
        |  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
  }

  /** Q19 (discounted revenue): the disjunctive-predicate probe — three
    * brand/size/quantity AND-groups OR'd together. Catalyst extracts the
    * common p_partkey = l_partkey equi-key for the join and keeps the
    * OR-of-ANDs as a post-join filter; the per-branch p_size/p_brand
    * bounds are NOT individually pushable, which is exactly what the
    * shape tests (an engine that tries to push the disjunction per-table
    * returns wrong rows). */
  def qTpchQ19(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
           col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
           col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
           col("l_quantity").between(20, 30)))
      .agg(sum(extD * (lit(BigDecimal("1.00")) - discD)).cast("double").as("revenue"),
           count(lit(1)).as("n"))

  /** Q21 (suppliers who kept orders waiting): the double-correlation
    * probe. The textbook form carries one EXISTS (another supplier
    * touched the same order) and one NOT EXISTS referencing TWO outer
    * tables (l1 + o_orderdate), which decorrelates to a semi join plus an
    * anti join — THREE lineitem scans and three orderkey shuffles. Both
    * correlations are per-order set facts, so this form computes them
    * with per-order window counts over the single lineitem⋈orders frame:
    * EXISTS ⇔ the order has ≥2 distinct suppliers; NOT EXISTS ⇔ the
    * order's LATE-supplier set is exactly {l1's supplier}. One lineitem
    * scan, and the window's hash partitioning on l_orderkey REUSES the
    * join exchange — no extra shuffle. (collect_set skips NULLs, so the
    * CASE gives the late-only distinct count.) The correlated original
    * stays as the DuckDB oracle — two independent formulations must
    * hash-agree. Q4/q_sql_not_exists keep the decorrelation demos.
    * Adapted to the corpus (no commit/receipt dates): "late" = shipped
    * more than a year after the order date. */
  def qTpchQ21(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM (
        |  SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAYS
        |              THEN l_suppkey END AS late_supp,
        |         SIZE(collect_set(l_suppkey)
        |              OVER (PARTITION BY l_orderkey)) AS n_supp,
        |         SIZE(collect_set(CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAYS
        |                               THEN l_suppkey END)
        |              OVER (PARTITION BY l_orderkey)) AS n_late_supp
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F') t
        |JOIN supplier ON s_suppkey = late_supp
        |WHERE n_supp >= 2 AND n_late_supp = 1
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
  }

  /** Q22 (global sales opportunity): UNCORRELATED scalar subquery (the
    * global positive-balance average computes once and broadcasts as a
    * literal-after-first-job) + NOT EXISTS anti join + final rollup.
    * The threshold averages DECIMAL(18,2) values so the aggregation is
    * partial-order-independent on the Spark side; the corpus has no
    * phone column, so the country-code grouping becomes c_nationkey and
    * "no orders" (empty here — every customer ordered) becomes "no
    * order placed in 1998". */
  def qTpchQ22(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT c_nationkey, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT AVG(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  }

  /** Q7 (volume shipping): the symmetric nation-pair probe — two aliases
    * of the SAME dimension table (supplier's nation vs customer's nation)
    * with an OR'd pair predicate, grouped by derived year. Both nation
    * sides broadcast; the fact-fact lineitem-orders shuffle is the only
    * big exchange. */
  def qTpchQ7(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
        |             CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume
        |      FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |        AND c_nationkey = n2.n_nationkey
        |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
  }

  /** Q8 (national market share): an 8-table join whose aggregate is a
    * RATIO of conditional to total volume per year. Both sums stay
    * DECIMAL until a final double cast, and the division happens on the
    * two identical doubles in both engines, so the 1e-6-rounded share
    * hash-agrees. */
  def qTpchQ8(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT o_year,
        |  ROUND(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
        |        / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        |FROM (SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |             CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume,
        |             n2.n_name AS nation
        |      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        |        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |        AND p_type = 'STANDARD') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin)
  }

  /** Q10 (returned items): revenue lost to returns per customer, top 20 —
    * the Q3 star shape plus a selective fact-side flag filter and a wide
    * grouping key carrying customer attributes through the aggregate. */
  def qTpchQ10(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
  }

  /** Q14 (promotion effect): single-row conditional-ratio aggregate over a
    * month of shipments — the percent-of-total pattern with the same
    * decimal-until-the-end discipline as Q8. */
  def qTpchQ14(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """SELECT
        |  ROUND(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
        |        / CAST(SUM(volume) AS DOUBLE), 6) AS promo_revenue,
        |  COUNT(*) AS n
        |FROM (SELECT p_type,
        |             CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume
        |      FROM lineitem JOIN part ON l_partkey = p_partkey
        |      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00') pr""".stripMargin)
  }

  /** Q15 (top supplier): argmax-over-aggregate — a CTE computes quarterly
    * revenue per supplier, reused TWICE (join probe + scalar MAX);
    * equality is on the identical decimal-summed double, so the winner
    * set hash-agrees. The TPC-H view becomes a plain CTE. */
  def qTpchQ15(s: SparkSession, d: String): DataFrame = {
    graft.Views.register(s, d)
    s.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** Deterministic partsupp: the one TPC-H relation the driver corpus does
    * not ship, generated identically here and in the DuckDB oracle CTE so
    * Q9/Q11/Q20 get real hash gates instead of n/a.
    *
    * Formula (dbgen's supplier-spread rule, `tpch-dbgen/build.c` PS_SUPP
    * published in the TPC-H spec §4.2.3, adapted to the corpus's 0-based
    * keys): for each part p and i ∈ 0..3,
    *   ps_suppkey = (p + i·(S DIV 4) + (p DIV S)) mod S
    * with S = |supplier|. dbgen keeps the (p DIV S) term INSIDE the
    * multiplicand; that relies on S/4 ≫ p/S (true at SF ≥ 1 where
    * S = 10 000·SF) — at the test corpus's S = 10 a step of 5 or 10 would
    * collapse the four offsets onto two or one suppkey, so the term moves
    * outside the multiplier, making the four offsets {0, S/4, 2·S/4,
    * 3·S/4} distinct for every S ≥ 4 while keeping the per-part-block
    * rotation. availqty/supplycost replace dbgen's RNG streams with pure
    * key hashes (exact 2-decimal values, so the double division by 100 is
    * bit-identical across engines):
    *   ps_availqty   = (p·7 + s·11) mod 9999 + 1          ∈ [1, 9999]
    *   ps_supplycost = ((p·31 + s·17) mod 90000 + 10000)/100 ∈ [100, 1000)
    *
    * Plan shape: map-side generate — part scan × broadcast 1-row supplier
    * count × a 4-element explode. No shuffle; at 100 TB partsupp is never
    * materialized, it streams out of the part scan (4 rows out per row
    * in), and the downstream joins shuffle on the SAME ps_partkey/
    * ps_suppkey keys they would with a stored table. */
  def partsupp(s: SparkSession, d: String): DataFrame = {
    val sCnt = Tables.supplier(s, d).agg(count(lit(1)).as("s_cnt"))
    Tables.part(s, d).select("p_partkey")
      .crossJoin(broadcast(sCnt))
      .select(col("p_partkey"), col("s_cnt"),
              explode(array((0 to 3).map(i => lit(i.toLong)): _*)).as("i"))
      .select(col("p_partkey").as("ps_partkey"),
              ((col("p_partkey") + col("i") * expr("s_cnt DIV 4")
                 + expr("p_partkey DIV s_cnt")) % col("s_cnt")).as("ps_suppkey"))
      .select(col("ps_partkey"), col("ps_suppkey"),
              (((col("ps_partkey") * 7 + col("ps_suppkey") * 11) % 9999) + 1)
                .cast("int").as("ps_availqty"),
              ((((col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 90000) + 10000)
                .cast("double") / 100.0).as("ps_supplycost"))
  }

  /** Shared DuckDB CTE prefix generating the same partsupp relation —
    * `//` is DuckDB integer division (Spark's DIV); all arithmetic is
    * BIGINT in both engines. */
  private val partsuppCte: String =
    """WITH ps0 AS (
      |  SELECT p_partkey AS ps_partkey,
      |         (p_partkey + i * (s_cnt // 4) + (p_partkey // s_cnt)) % s_cnt AS ps_suppkey
      |  FROM part, (SELECT COUNT(*) AS s_cnt FROM supplier) sc, generate_series(0,3) g(i)
      |), partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |         CAST((ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS INT) AS ps_availqty,
      |         CAST((ps_partkey * 31 + ps_suppkey * 17) % 90000 + 10000 AS DOUBLE) / 100.0 AS ps_supplycost
      |  FROM ps0
      |)""".stripMargin

  /** Register corpus views + the generated partsupp for the SQL-form
    * partsupp queries. View creation is catalog-only (no files), so the
    * unmemoized partsupp rebind is free. */
  private def registerWithPartsupp(s: SparkSession, d: String): Unit = {
    graft.Views.register(s, d)
    partsupp(s, d).createOrReplaceTempView("partsupp")
  }

  /** Q9 (product-type profit): the 6-table fact-heavy join — lineitem
    * shuffles ONCE on l_orderkey for orders and hits partsupp on the
    * composite (partkey, suppkey) key; part/supplier/nation broadcast.
    * partsupp only matches the lineitem pairs dbgen WOULD have generated
    * (~4/S of pairs), which both engines agree on exactly. amount stays
    * DECIMAL until the post-agg double cast. Name filter '%bolt%' stands
    * in for the spec's '%green%' (corpus color-noun vocabulary). */
  def qTpchQ9(s: SparkSession, d: String): DataFrame = {
    registerWithPartsupp(s, d)
    s.sql(
      """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |             CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |             - CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
        |      FROM part, supplier, lineitem, partsupp, orders, nation
        |      WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
        |        AND p_partkey = l_partkey AND o_orderkey = l_orderkey
        |        AND s_nationkey = n_nationkey AND p_name LIKE '%bolt%') profit
        |GROUP BY nation, o_year ORDER BY nation, o_year""".stripMargin)
  }

  /** Q11 (important stock): grouped value per partkey vs an uncorrelated
    * scalar threshold — the threshold subquery runs once and broadcasts
    * as a literal; both sides aggregate the SAME decimal product before
    * one double cast, so the > compare sees bit-identical doubles.
    * NATION_3 has suppliers at every corpus SF (sparse nations at
    * sf0.001 would make the spec's single-nation filter empty). */
  def qTpchQ11(s: SparkSession, d: String): DataFrame = {
    registerWithPartsupp(s, d)
    s.sql(
      """SELECT ps_partkey,
        |  CAST(SUM(CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(ps_availqty AS DECIMAL(18,2))) AS DOUBLE) AS value
        |FROM partsupp, supplier, nation
        |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |GROUP BY ps_partkey
        |HAVING CAST(SUM(CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(ps_availqty AS DECIMAL(18,2))) AS DOUBLE) >
        | (SELECT CAST(SUM(CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(ps_availqty AS DECIMAL(18,2))) AS DOUBLE) * 0.0005
        |  FROM partsupp, supplier, nation
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3')
        |ORDER BY value DESC, ps_partkey""".stripMargin)
  }

  /** Q20 (excess stock): the nested-semi-join probe — IN(part names) →
    * IN(partsupp) → correlated scalar half-year-sales threshold, which
    * Catalyst decorrelates into an aggregate joined back on the composite
    * key. An empty sales group yields NULL → excluded, identically in
    * both engines. The spec's selective nation filter is dropped (1
    * supplier per nation at sf0.001 → 0/1-row fixture); the nation dim
    * join is kept for the output column, preserving the plan shape. */
  def qTpchQ20(s: SparkSession, d: String): DataFrame = {
    registerWithPartsupp(s, d)
    s.sql(
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT ps_suppkey FROM partsupp
        |  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    AND ps_availqty > (SELECT 0.5 * SUM(l_quantity) FROM lineitem
        |                       WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |                         AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |                         AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'))
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** Q6: forecasting revenue change — pushed range filters, 1-row result. */
  def qTpchQ6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01 00:00:00").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24.0)
      .agg(sum(extD * discD).cast("double").as("revenue"),
           count(lit(1)).as("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q1" -> (qTpchQ1 _),
    "q_tpch_q2" -> (qTpchQ2 _),
    "q_tpch_q3" -> (qTpchQ3 _),
    "q_tpch_q4" -> (qTpchQ4 _),
    "q_tpch_q5" -> (qTpchQ5 _),
    "q_tpch_q6" -> (qTpchQ6 _),
    "q_tpch_q7" -> (qTpchQ7 _),
    "q_tpch_q8" -> (qTpchQ8 _),
    "q_tpch_q9" -> (qTpchQ9 _),
    "q_tpch_q10" -> (qTpchQ10 _),
    "q_tpch_q11" -> (qTpchQ11 _),
    "q_tpch_q12" -> (qTpchQ12 _),
    "q_tpch_q13" -> (qTpchQ13 _),
    "q_tpch_q14" -> (qTpchQ14 _),
    "q_tpch_q15" -> (qTpchQ15 _),
    "q_tpch_q16" -> (qTpchQ16 _),
    "q_tpch_q17" -> (qTpchQ17 _),
    "q_tpch_q18" -> (qTpchQ18 _),
    "q_tpch_q19" -> (qTpchQ19 _),
    "q_tpch_q20" -> (qTpchQ20 _),
    "q_tpch_q21" -> (qTpchQ21 _),
    "q_tpch_q22" -> (qTpchQ22 _),
    "q_sql_not_exists" -> (qSqlNotExists _),
    "q_sql_recursive"  -> (qSqlRecursive _),
  )

  val oracle: Map[String, String] = Map(
    // Q1's decimal→double casts go through VARCHAR (r14 sf1 scale-gate
    // find): DuckDB's direct DECIMAL(38,s)→DOUBLE cast rounds the
    // unscaled HUGEINT to double FIRST, so it mis-rounds once the
    // unscaled value crosses 2^53 — sum_charge's scale-6 sum does at
    // sf1 (2.8e16). The VARCHAR bridge is DuckDB's correctly-rounded
    // strtod, bit-equal to Spark's BigDecimal.doubleValue. The (1±x)
    // factors also stay NARROW (DECIMAL(4,2)) so the triple product
    // keeps decimal precision ≤ 38 on the DuckDB side.
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_tpch_q17" ->
      """SELECT CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |       COUNT(*) AS n_lines
        |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l1.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
        |                       FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    "q_sql_not_exists" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    // the identical recursive statement, DuckDB dialect (UNNEST for the
    // link fan-out instead of LATERAL VIEW explode)
    "q_sql_recursive" ->
      """WITH RECURSIVE r(node, d) AS (
        |  SELECT DISTINCT CAST(doc_id % 997 AS BIGINT), 0
        |  FROM documents WHERE (doc_id % 997) % 100 = 0
        |  UNION ALL
        |  SELECT e.dst, r.d + 1
        |  FROM r JOIN (
        |    SELECT DISTINCT (doc_id % 997) AS src,
        |                    ((doc_id * 31 + k * 7) % 997) AS dst
        |    FROM documents CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS k)
        |    WHERE k <= 1 + doc_id % 3
        |      AND (doc_id % 997) <> ((doc_id * 31 + k * 7) % 997)
        |  ) e ON e.src = r.node
        |  WHERE r.d < 4
        |)
        |SELECT node, CAST(MIN(d) AS BIGINT) AS hops
        |FROM r GROUP BY node ORDER BY node""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       o_totalprice,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 212)
        |GROUP BY c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_tpch_q6" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24.0""".stripMargin,
    "q_tpch_q2" ->
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_type
        |FROM part, (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps, supplier, nation
        |WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
        |  AND s_nationkey = n_nationkey AND p_size = 15
        |  AND s_acctbal = (SELECT MIN(s2.s_acctbal)
        |                   FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps2
        |                   JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        |                   WHERE ps2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, s_name, p_partkey""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = ps.l_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
        |  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q19" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_tpch_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 365 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 365 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q_tpch_q22" ->
      """SELECT c_nationkey, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT AVG(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
        |             CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume
        |      FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |        AND c_nationkey = n2.n_nationkey
        |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_tpch_q8" ->
      """SELECT o_year,
        |  ROUND(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
        |        / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        |FROM (SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |             CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume,
        |             n2.n_name AS nation
        |      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        |        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |        AND p_type = 'STANDARD') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_tpch_q14" ->
      """SELECT
        |  ROUND(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
        |        / CAST(SUM(volume) AS DOUBLE), 6) AS promo_revenue,
        |  COUNT(*) AS n
        |FROM (SELECT p_type,
        |             CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume
        |      FROM lineitem JOIN part ON l_partkey = p_partkey
        |      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00') pr""".stripMargin,
    "q_tpch_q9" -> (partsuppCte +
      """
        |SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |             CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |             - CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
        |      FROM part, supplier, lineitem, partsupp, orders, nation
        |      WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
        |        AND p_partkey = l_partkey AND o_orderkey = l_orderkey
        |        AND s_nationkey = n_nationkey AND p_name LIKE '%bolt%') profit
        |GROUP BY nation, o_year ORDER BY nation, o_year""".stripMargin),
    "q_tpch_q11" -> (partsuppCte +
      """
        |SELECT ps_partkey,
        |  CAST(SUM(CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(ps_availqty AS DECIMAL(18,2))) AS DOUBLE) AS value
        |FROM partsupp, supplier, nation
        |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |GROUP BY ps_partkey
        |HAVING CAST(SUM(CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(ps_availqty AS DECIMAL(18,2))) AS DOUBLE) >
        | (SELECT CAST(SUM(CAST(ps_supplycost AS DECIMAL(18,2)) * CAST(ps_availqty AS DECIMAL(18,2))) AS DOUBLE) * 0.0005
        |  FROM partsupp, supplier, nation
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3')
        |ORDER BY value DESC, ps_partkey""".stripMargin),
    "q_tpch_q20" -> (partsuppCte +
      """
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT ps_suppkey FROM partsupp
        |  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    AND ps_availqty > (SELECT 0.5 * SUM(l_quantity) FROM lineitem
        |                       WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |                         AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |                         AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'))
        |ORDER BY s_suppkey""".stripMargin),
    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
  )
}
