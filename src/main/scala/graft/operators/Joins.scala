package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Join operators.
  *
  * The reference's joins are spatial/positional (SURVEY §2.3): barycentric
  * point-in-triangle containment (`run/adcircTime2cogs.py:199-200`), the
  * ones-mask semi/anti join (`:177-185`), meshgrid cross products (`:76,81`)
  * and node-id positional alignment (`:171`). Here each is generalized to
  * its relational form, planned by Catalyst:
  *
  *  - equi joins -> shuffled hash / sort-merge; dimension sides below the
  *    broadcast threshold (or hinted) -> BroadcastHashJoinExec. At 100 TB,
  *    fact-fact joins shuffle on the join key; co-locate with bucketing.
  *  - semi/anti  -> LeftSemi/LeftAnti (no payload columns move).
  *  - range/theta -> equi prefilter + residual predicate, so only the
  *    equi-key shuffle happens and the theta term is evaluated post-match.
  *  - cross      -> generated-axes cartesian (BroadcastNestedLoopJoin); only
  *    ever used on tiny generated relations, as in the reference.
  *  - as-of      -> no Spark built-in for DataFrames: expressed as a
  *    running `last(..., ignoreNulls)` window over the event stream,
  *    which is a single shuffle on the partition key (SURVEY §7.5.3).
  */
object Joins {

  /** J5: hash equi join orders-customer (both large at scale -> sort-merge/
    * shuffled-hash on the key; AQE picks at runtime). */
  def qJoinHashEqui(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")

  /** J5: explicit broadcast of the dimension side — part is the small dim
    * (200 rows/sf-unit); at 100 TB still O(10^6) rows, broadcastable.
    * ORDER BY must be TOTAL over the projected row: (l_orderkey,
    * l_linenumber) is not unique in the corpus (118k pairs carry
    * distinct partkeys at sf0.1), and tie order only looked stable
    * because both engines kept file order on a single-file input — the
    * multi-file sf1 corpus exposed it (r14). p_brand completes the key:
    * any remaining ties are identical rows, so order is immaterial. */
  def qJoinBroadcastDim(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
      .orderBy("l_orderkey", "l_linenumber", "p_brand")

  /** J5: multiway star join region->nation->customer->orders; Catalyst
    * broadcast-chains the three dims, one shuffle for the fact agg. */
  def qJoinMultiwayStar(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"),
           graft.Num.moneySum(col("o_totalprice")).as("revenue"))
      .orderBy("r_name")

  /** J2 (range core): equi key + residual range predicate
    * (l_shipdate > o_orderdate evaluated post-match, no extra shuffle). */
  def qJoinRangeTheta(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("om"))
      .agg(count(lit(1)).as("n"))
      .orderBy("om")

  /** J3: the wet-cell mask as a LEFT SEMI join (reference ones-mask,
    * run/adcircTime2cogs.py:177-185: "grid cell has a containing triangle"). */
  def qJoinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** J3: the dry-cell mask as a LEFT ANTI join. The right side is
    * prefiltered (pushdown below the join) so the result is non-empty in the
    * corpus — every customer has *some* order, not every customer a big one. */
  def qJoinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000.0),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** J4+O1: meshgrid — cartesian product of two generated axis relations
    * (reference np.meshgrid, run/adcircTime2cogs.py:76,81). */
  def qJoinCrossGrid(s: SparkSession, d: String): DataFrame = {
    // one split per axis: a default range(10) inherits defaultParallelism
    // (32) splits, so every stage schedules 32 near-empty tasks and the
    // query's cost is pure scheduler overhead; the meshgrid itself is the
    // PRODUCT of the axes, so parallelism belongs to the joined result
    // (AQE re-splits it), not the axis relations
    val xs = s.range(0, 10, 1, 1).toDF("i")
    val ys = s.range(0, 10, 1, 1).toDF("j")
    xs.crossJoin(ys)
      .select(col("i"), col("j"),
              (lit(BigDecimal("-98.0")) + col("i") * lit(BigDecimal("0.005")))
                .cast("double").as("x"),
              (lit(BigDecimal("45.0"))  - col("j") * lit(BigDecimal("0.005")))
                .cast("double").as("y"))
      .orderBy("i", "j")
  }

  /** J6 (EXT): as-of join — for each purchase event, the most recent signup
    * event by the same user at-or-before it (ordered by event_id, which is
    * the stream order). One window = one shuffle on user_id; no join blowup. */
  def qJoinAsof(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("signup_id",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "signup_id")
      .orderBy("event_id")
  }

  /** Outer-join family: FULL OUTER customer vs big-spender orders — both
    * unmatched sides survive with nulls (left-only customers, and no
    * right-only rows in this corpus, but the operator handles both). */
  def qJoinFullOuter(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
              .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
            col("c_custkey") === col("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("o_orderkey"),
              coalesce(col("o_totalprice"), lit(0.0)).as("price0"))
      .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)

  /** EXT: blocked fuzzy join — the entity-resolution/record-linkage shape:
    * candidate pairs come from an EQUI-join on a blocking key (here the
    * name's noun), then a bounded edit-distance verify on candidates only —
    * never an all-pairs comparison. Spark's thresholded `levenshtein`
    * (3-arg form) early-exits the DP band once the bound is exceeded, so
    * the verify cost is O(threshold·len) per candidate, and at 100 TB the
    * shuffle carries (block, name) pairs while each block's quadratic is
    * bounded by block size — the same contract as the LSH band joins and
    * [[graft.operators.Similarity.qDedupSemantic]]'s clusters. Blocking
    * trades recall for scale: cross-block near-matches are invisible by
    * design (the spec quantifies it against unblocked ground truth). */
  def qJoinFuzzy(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy("p_name").agg(count(lit(1)).as("n_parts"))
      // one-token names: element_at yields NULL (row would silently drop
      // from the equi-join) — coalesce to '' so they share a block, the
      // same convention as the oracle's split_part (which returns '')
      .withColumn("block", coalesce(element_at(split(col("p_name"), " "), 2), lit("")))
    names.as("a").join(names.as("b"),
        col("a.block") === col("b.block") && col("a.p_name") < col("b.p_name"))
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name"), 3))
      .filter(col("dist") >= 0)
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
              col("a.block").as("block"), col("dist").cast("long").as("dist"),
              (col("a.n_parts") + col("b.n_parts")).as("n_parts_both"))
      .orderBy("name_a", "name_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_fuzzy"         -> (qJoinFuzzy _),
    "q_join_full_outer"    -> (qJoinFullOuter _),
    "q_join_hash_equi"     -> (qJoinHashEqui _),
    "q_join_broadcast_dim" -> (qJoinBroadcastDim _),
    "q_join_multiway_star" -> (qJoinMultiwayStar _),
    "q_join_range_theta"   -> (qJoinRangeTheta _),
    "q_join_semi"          -> (qJoinSemi _),
    "q_join_anti"          -> (qJoinAnti _),
    "q_join_cross_grid"    -> (qJoinCrossGrid _),
    "q_join_asof"          -> (qJoinAsof _),
  )

  val oracle: Map[String, String] = Map(
    // DuckDB has no thresholded levenshtein; the plain distance filtered
    // at the same bound returns identical values on every kept row
    "q_join_fuzzy" ->
      """WITH names AS (SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name),
        |blocked AS (SELECT p_name, n_parts, split_part(p_name, ' ', 2) AS block FROM names)
        |SELECT a.p_name AS name_a, b.p_name AS name_b, a.block,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
        |  a.n_parts + b.n_parts AS n_parts_both
        |FROM blocked a JOIN blocked b
        |  ON a.block = b.block AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,
    "q_join_full_outer" ->
      """SELECT c_custkey, o_orderkey, COALESCE(o_totalprice, 0.0) AS price0
        |FROM customer
        |FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |                 WHERE o_totalprice > 400000.0) o
        |ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_hash_equi" ->
      """SELECT o_orderkey, c_name, o_totalprice FROM orders
        |JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""".stripMargin,
    "q_join_broadcast_dim" ->
      """SELECT l_orderkey, l_linenumber, p_brand FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, p_brand""".stripMargin,
    "q_join_multiway_star" ->
      """SELECT r_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_join_range_theta" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS om, COUNT(*) AS n
        |FROM lineitem JOIN orders
        |ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        |GROUP BY 1 ORDER BY om""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross_grid" ->
      """SELECT i, j, CAST(-98.0 + i * 0.005 AS DOUBLE) AS x, CAST(45.0 - j * 0.005 AS DOUBLE) AS y
        |FROM range(0, 10) t1(i) CROSS JOIN range(0, 10) t2(j) ORDER BY i, j""".stripMargin,
    "q_join_asof" ->
      """SELECT e.event_id, e.user_id,
        |  (SELECT MAX(s.event_id) FROM events s
        |   WHERE s.user_id = e.user_id AND s.event_type = 'signup'
        |     AND s.event_id <= e.event_id) AS signup_id
        |FROM events e WHERE e.event_type = 'purchase' ORDER BY e.event_id""".stripMargin,
  )
}
