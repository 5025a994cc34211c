package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Num, Tables}

/** Aggregations, window functions, and the tumbling-window (streaming-
  * equivalent) query.
  *
  * Reference analogues:
  *  - global bbox min/max       (`run/adcircTime2cogs.py:155-158`)
  *  - global mean               (`adcirc_dask_utilities.py:20`)
  *  - per-timestep group loop   (`run/adcircTime2cogs.py:190-209`)
  *  - adjacent-pair centroids   (`run/adcircTime2cogs.py:79-80`) -> lag window
  *  - sequential index counter  (`run/adcircTime2cogs.py:187,209`) -> row_number
  *
  * All aggregates are partial+final hash aggregates (map-side combine), so
  * at 100 TB only the per-group partials cross the shuffle. Window queries
  * shuffle once on their partition key; the one intentionally-global window
  * (q_win_centroid, the reference's axis-centroid computation) is documented
  * as such — its input is an axis-sized relation, never the fact table.
  */
object Aggregates {

  /** A1: bounding box — min/max in one pass (reference grid corners). */
  def qAggBbox(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(min(col("l_extendedprice")).as("min_price"),
           max(col("l_extendedprice")).as("max_price"),
           date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_ship"),
           date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship"))

  /** A2: grouped mean (exact decimal sum / count, SURVEY §5.1). */
  def qAggMean(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(Num.moneyAvg(col("c_acctbal"), 4).as("avg_bal"),
           count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  /** A3+O2: per-timestep reduction — the reference's raster-per-timestep
    * loop as a groupBy over truncated event time. */
  def qAggGroupbyTime(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hr"))
      .agg(count(lit(1)).as("n"), Num.moneySum(col("value")).as("sum_value"))
      .orderBy("hr")

  /** A5: distinct aggregation. */
  def qAggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  /** EXT: ordered funnel — the event-analytics staple: how many users
    * signup → then click AFTER the signup → then purchase AFTER that
    * click. Each stage's anchor is the MIN event time satisfying the
    * stage predicate given the previous anchor; the three anchors are
    * CHAINED whole-partition windows over the SAME user_id partitioning,
    * so Catalyst plans ONE events scan and ONE shuffle (three Window
    * nodes back to back, no re-exchange — each stage's conditional MIN
    * can reference the previous stage's column because a whole-partition
    * window value is a constant within the user). The per-user collapse
    * reuses the same partitioning; stage ordering is enforced by the
    * time comparisons, not by joins. Deterministic: min over
    * timestamps. The oracle states the same logic as three sequential
    * grouped CTEs — two formulations, one hash. */
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val perUser = Tables.events(s, d).select("user_id", "event_type", "ts")
      .withColumn("s_ts",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("c_ts",
        min(when(col("event_type") === "click" && col("ts") >= col("s_ts"),
                 col("ts"))).over(w))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" && col("ts") >= col("c_ts"),
                 col("ts"))).over(w))
      .groupBy("user_id")
      .agg(first("s_ts").as("s_ts"), first("c_ts").as("c_ts"),
           first("p_ts").as("p_ts")) // whole-partition windows: constant per user
    perUser.agg(
      count(lit(1)).as("n_users"),
      sum(col("s_ts").isNotNull.cast("long")).as("n_signup"),
      sum(col("c_ts").isNotNull.cast("long")).as("n_click_after"),
      sum(col("p_ts").isNotNull.cast("long")).as("n_purchase_after"))
  }

  /** EXT: cohort retention — users bucketed by FIRST-seen day, activity
    * counted per whole-week offset from that day (day arithmetic, not
    * calendar weeks, so no engine week-start convention can drift).
    * COUNT(DISTINCT user) per (cohort_day, week_offset) is exact on both
    * engines. Scale shape: two shuffles — the per-user first-day
    * aggregate, then the (cohort, offset) rollup of (user, day) distinct
    * pairs; both keys are bounded (users, days). */
  def qCohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("c_day"))
    ev.join(cohort, Seq("user_id"))
      .select(col("user_id"), col("c_day"),
              expr("CAST(datediff(day, c_day) DIV 7 AS BIGINT)").as("wk"))
      .groupBy(col("c_day"), col("wk"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .filter(col("wk") <= 4)
      .orderBy("c_day", "wk")
      .limit(200)
  }

  /** A2 variant: EQUI-DEPTH histogram (deciles by population, the
    * profiling partner of the equi-width [[qAggHistogram]]): NTILE(10)
    * semantics over a total order (price, key tiebreak —
    * engine-deterministic), then per-bucket count/min/max. Computed
    * DISTRIBUTED (r15 verdict #1): an unpartitioned `ntile().over(w)`
    * makes WindowExec move EVERY row to one task — measured 3.9× wall at
    * 10× data — so global positions come from the range-partitioned
    * `sortBy + zipWithIndex` pattern (the Similarity rank-map precedent)
    * and the bucket is NTILE's closed form over (rank, n): the first
    * `n mod 10` buckets hold `ceil(n/10)` rows, the rest `floor(n/10)` —
    * bit-identical to both engines' NTILE, so the declared hash is
    * unchanged. The sketch path ([[qApproxQuantile]]) remains the
    * unbounded-input form; this is the exact profile. */
  def qAggHistogramEqdepth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
    val n = rows.count()
    val quot = n / 10L
    val rem = n % 10L
    val ranked = rows
      .select(col("o_totalprice"), col("o_orderkey"))
      .as[(Double, Long)].rdd
      .sortBy(identity)
      .zipWithIndex()
      .map { case ((price, _), rank) => (price, rank) }
      .toDF("o_totalprice", "rank")
    ranked
      .withColumn("bucket",
        when(lit(rem) > 0L && col("rank") < lit(rem * (quot + 1L)),
             expr(s"rank DIV ${quot + 1L} + 1"))
          .otherwise(expr(s"$rem + (rank - ${rem * (quot + 1L)}) DIV ${math.max(quot, 1L)} + 1"))
          .cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
           min("o_totalprice").as("lo"),
           max("o_totalprice").as("hi"))
      .orderBy("bucket")
  }

  /** A6: rollup — grouping-set expansion (Catalyst Expand); null grouping
    * keys normalized to 'ALL' on both engines. */
  def qAggRollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
              coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
              col("sum_qty"), col("n"))
      .orderBy("rf", "ls")

  /** A6: cube over order status/priority. */
  def qAggCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
              col("n"))
      .orderBy("st", "pri")

  /** W1: the reference's adjacent-pair axis centroid `(x[1:]+x[:-1])/2`
    * (run/adcircTime2cogs.py:79-80) as a lag window over a GENERATED axis
    * relation. The global window is safe because the input is an axis —
    * O(10^4) rows by construction (raster width), never the fact table.
    * Decimal sum + exact binary halving keeps Spark/DuckDB bit-equal. */
  def qWinCentroid(s: SparkSession, d: String): DataFrame = {
    val axis = s.range(0, 8192).toDF("k")
      .select(col("k"),
              (lit(BigDecimal("-98.0")) + col("k") * lit(BigDecimal("0.005"))).as("x"))
    val w = Window.orderBy("k")
    axis
      .select(col("k"),
              ((col("x") + lag(col("x"), 1).over(w)).cast("double") / lit(2.0)).as("centroid"))
      .filter(col("centroid").isNotNull)
      .orderBy("k")
  }

  /** W2+W4: ranking — top-3 orders per customer by totalprice. */
  def qWinRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rk", rank().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rk", "o_orderkey")
  }

  /** W3: running (frame) aggregate per user — exact decimal prefix sums. */
  def qWinRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
              sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("running"))
      .orderBy("event_id")
  }

  /** §2.9: tumbling event-time window — batch-equivalent of the streaming
    * aggregation (one raster per timestep in the reference). */
  def qStreamTumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), Num.moneySum(col("value")).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
              col("n"), col("sum_value"))
      .orderBy("ws")

  /** §2.9: BATCH form of the stream-stream interval join
    * ([[graft.streaming.Streams.clickToPurchase]] is the watermarked
    * streaming twin; StreamingSpec proves the two match row-for-row, and
    * this entry puts the semantics under the DuckDB hash gate). Clicks
    * join the purchases that follow within one hour for the same user —
    * an equi-join on user_id with the interval bound as a residual
    * predicate, so the plan is one keyed shuffle (or zero, bucketed by
    * user_id), never a time-range nested loop; in the streaming form the
    * same bound is what keeps the join STATE finite. The gap lands as
    * whole seconds (timestamp→long floors identically to DuckDB's
    * date_diff boundary count); value is a copy — no FP arithmetic. */
  def qStreamJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
              col("ts").as("p_ts"), col("value"))
    clicks.join(purchases, "user_id")
      .filter(col("p_ts") >= col("c_ts") &&
              col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
              (col("p_ts").cast("long") - col("c_ts").cast("long")).as("gap_s"),
              col("value"))
      .orderBy("click_id", "purchase_id")
  }

  /** A7 (mergeable form): Apache DataSketches HLL with an explicit
    * pre-aggregate → re-aggregate split — THE 100 TB sketch pattern. A
    * petabyte pipeline never recomputes distincts from raw events: it
    * stores a per-partition (here per-day) sketch ONCE, then any rollup
    * (weekly, per-type, global) is a cheap union of kilobyte sketches —
    * no second pass over the fact table. `approx_count_distinct`'s HLL++
    * state never leaves its one aggregation; `hll_sketch_agg` makes the
    * state a first-class column. Oracle: same checked-bound shape as
    * [[qApproxDistinct]] — exact count hashed, the sketch pinned within
    * 5% of it (lgK=12 → rsd ≈ 1.6%). */
  def qSketchMerge(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
           countDistinct(col("user_id")).as("exact_daily"))
    // downstream rollup reads ONLY the daily sketch relation
    daily.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"),
           sum(col("exact_daily")).as("sum_daily_users"))
      .join(Tables.events(s, d).groupBy("event_type")
              .agg(countDistinct(col("user_id")).as("exact_users")),
            Seq("event_type"))
      .select(col("event_type"), col("exact_users"), col("sum_daily_users"),
              (abs(col("approx") - col("exact_users")).cast("double") /
                 col("exact_users").cast("double") <= lit(0.05)).as("within_bound"))
      .orderBy("event_type")
  }

  /** A7: HLL++ sketch distinct. The sketch ESTIMATE is engine-specific
    * (DuckDB's approx_count_distinct is a different sketch), so the raw
    * number can never hash-match an oracle — but its ERROR BOUND can
    * (r7 verdict #7): the query emits |approx − exact| / exact <= 0.05
    * (5× the requested 1% rsd) as a boolean next to the exact count, and
    * the oracle pins the boolean TRUE. The artifact then carries a CHECKED
    * accuracy bound instead of a rows-only row. Spark's HLL++ is
    * hash-based with no RNG and register-merge is commutative, so the
    * boolean is deterministic across partitionings. */
  def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx"),
           countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
              (abs(col("approx") - col("exact_users")).cast("double") /
                 col("exact_users").cast("double") <= lit(0.05)).as("within_bound"))
      .orderBy("event_type")

  /** A7 variant: approximate quantiles via the KLL-style percentile_approx
    * sketch — fixed-size mergeable state per group (the unbounded-input
    * partner to the exact interpolated median in q_agg_stats). Same
    * checked-bound oracle shape as [[qApproxDistinct]] (r7 verdict #7):
    * the sketch VALUES are engine-specific, so the hash carries the exact
    * discrete percentiles plus booleans pinning the sketch inside a RANK
    * bracket — the observed values at p±0.01. A value-relative tolerance
    * would be data-dependent (a gap in the distribution at the rank
    * boundary could flip it on a regenerated corpus); the rank bracket is
    * what GK actually guarantees (rank error ≤ n/accuracy = n/10000,
    * orders of magnitude inside the ±0.01·n margin), so the boolean is
    * deterministic for ANY data. */
  def qApproxQuantile(s: SparkSession, d: String): DataFrame = {
    def disc(p: Double): Column =
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY n_chars)").cast("double")
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(percentile_approx(col("n_chars"), array(lit(0.5), lit(0.9)), lit(10000))
             .as("ap"),
           disc(0.5).as("exact_p50"), disc(0.9).as("exact_p90"),
           disc(0.49).as("p50_lo"), disc(0.51).as("p50_hi"),
           disc(0.89).as("p90_lo"), disc(0.91).as("p90_hi"))
      .select(col("lang"), col("exact_p50"), col("exact_p90"),
              element_at(col("ap"), 1).cast("double")
                .between(col("p50_lo"), col("p50_hi")).as("p50_within"),
              element_at(col("ap"), 2).cast("double")
                .between(col("p90_lo"), col("p90_hi")).as("p90_within"))
      .orderBy("lang")
  }

  /** A7 partner: EXACT per-group percentiles via the inverse-distribution
    * PERCENTILE_DISC — returns an actual data value (the smallest with
    * cumulative fraction >= p), so there is NO interpolation arithmetic to
    * drift between engines; the only FP step is the final decimal→double
    * cast of a stored value. Scale shape: percentile_disc is a sort-based
    * aggregate — per-group sort of the group's values; with group-by keys
    * of reasonable cardinality each group sorts locally after one shuffle
    * on the key (same cost class as any orderBy-within-group), and the
    * KLL sketch [[qApproxQuantile]] remains the unbounded-cardinality
    * fallback. */
  def qAggPercentileExact(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
          .cast("double").as("p50_qty"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity)")
          .cast("double").as("p95_qty"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
          .cast("double").as("p50_price"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)")
          .cast("double").as("p99_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** A2 variant: fixed-width histogram — the profiling/binning primitive
    * (width_bucket): 10 equal bins over [min, max] of order totals, edges
    * from a broadcast 1-row bounds aggregate, the top edge clamped into
    * the last bin. Bin arithmetic is the identical IEEE expression in
    * both engines, so assignments hash-agree; two scans of the input
    * (bounds + binning) is the canonical two-pass histogram — at 100 TB
    * the first pass is a columnar min/max that parquet row-group
    * statistics largely answer. */
  def qAggHistogram(s: SparkSession, d: String): DataFrame = {
    val bounds = Tables.orders(s, d)
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    Tables.orders(s, d)
      .select(col("o_totalprice").as("x"))
      .crossJoin(broadcast(bounds))
      .withColumn("bin", // degenerate single-valued column: everything in bin 0
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit(9L),
            floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / 10.0)).cast("long"))))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
           min(col("x")).as("min_price"), max(col("x")).as("max_price"))
      .orderBy("bin")
  }

  /** A7 variant: Count-Min sketch — the mergeable heavy-hitter counter
    * (Cormode & Muthukrishnan 2005), and unlike HLL/KLL it is EXACTLY
    * engine-portable: every cell is a SUM over deterministic md5-derived
    * buckets, so partial aggregation, partition order, and merge order
    * cannot change a single counter — the oracle hashes the whole
    * pipeline, not a tolerance band. depth 4 × width 16 (deliberately
    * narrow so the 31-word vocabulary collides and the estimate-vs-truth
    * gap is exercised); estimate = min over rows, always ≥ the true count.
    *
    * Scale shape: the build is one explode + partial-agg shuffle whose
    * output is AT MOST depth×width = 64 cells no matter the corpus size —
    * the sketch IS the map-side combiner. The probe side (vocabulary)
    * joins the 64-cell sketch by broadcast. */
  def qSketchCountMin(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
    def bucket(r: Int): Column =
      expr(s"instr('0123456789abcdef', substring(md5(concat('$r|', word)), 1, 1)) - 1")
    // one scan: the sketch's counters are sums, so they aggregate exactly
    // from the per-word truth counts (cell = Σ true_n over colliding
    // words) — the corpus is read once and everything downstream is
    // vocabulary-sized
    val truth = words.groupBy("word").agg(count(lit(1)).as("true_n"))
      .transform(graft.Fence.cut)
    // ONE (word, true_n, r, b) projection feeds both the sketch build and
    // the probe side — the md5-bucket expression exists in exactly one place
    val rb = truth
      .select(col("word"), col("true_n"),
              explode(array((0 until 4).map(r =>
                struct(lit(r).as("r"), bucket(r).as("b"))): _*)).as("rb"))
      .select(col("word"), col("true_n"), col("rb.r").as("r"), col("rb.b").as("b"))
    val sketch = rb.groupBy("r", "b").agg(sum(col("true_n")).as("c"))
    val probes = rb
    probes.join(broadcast(sketch), Seq("r", "b"))
      .groupBy("word", "true_n")
      .agg(min(col("c")).as("est_n"))
      .withColumn("overest", (col("est_n") > col("true_n")).cast("long"))
      .orderBy("word")
  }

  /** W1+O1 variant: time-series gap-fill with linear interpolation — the
    * `time_bucket_gapfill` shape (TimescaleDB/InfluxDB): densify the
    * hourly per-type event counts onto the full regular grid, then fill
    * each gap from its bracketing observations. The reference's domain is
    * exactly this — irregular model timesteps resampled onto a regular
    * cadence before rasterization.
    *
    * Shape: the grid is types × sequence(min_hour, max_hour) from a
    * broadcast 1-row bounds aggregate; prev/next observations come from
    * ignoreNulls last/first over per-type ordered windows (two narrow
    * window passes, partitioned by type — no global window, no self-join);
    * gap edges (before first / after last observation) stay null and are
    * flagged. At 100 TB the heavy input collapses to the hourly aggregate
    * first; everything downstream is grid-sized. */
  def qTsGapfill(s: SparkSession, d: String): DataFrame = {
    val hh = date_trunc("hour", col("ts"))
    // hourly is consumed three times (type list, bounds, the grid join);
    // localCheckpoint materializes the grid-sized aggregate so the raw
    // events table is scanned ONCE, not once per consumer
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), hh.as("hh"))
      .agg(count(lit(1)).as("n"))
      .transform(graft.Fence.cut)
    // min/max of truncated ts == min/max over hourly's keys: derive the
    // bounds from the grid-sized aggregate, not a second raw-table scan
    val bounds = hourly.agg(min("hh").as("h0"), max("hh").as("h1"))
    val grid = hourly.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
              explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hh"))
    val hnum = (unix_timestamp(col("hh")) / 3600L).cast("long")
    val wPrev = Window.partitionBy("event_type").orderBy("hh")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy("event_type").orderBy("hh")
      .rowsBetween(1, Window.unboundedFollowing)
    val joined = grid.join(hourly, Seq("event_type", "hh"), "left")
      .withColumn("h", hnum)
      .withColumn("ph", last(when(col("n").isNotNull, hnum), ignoreNulls = true).over(wPrev))
      .withColumn("pn", last(col("n"), ignoreNulls = true).over(wPrev))
      .withColumn("nh", first(when(col("n").isNotNull, hnum), ignoreNulls = true).over(wNext))
      .withColumn("nn", first(col("n"), ignoreNulls = true).over(wNext))
    joined.select(
        col("event_type"),
        date_format(col("hh"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n").as("n_actual"),
        when(col("n").isNotNull, col("n").cast("double"))
          .when(col("ph").isNotNull && col("nh").isNotNull,
                round(col("pn") + (col("nn") - col("pn")) * (col("h") - col("ph")) /
                      (col("nh") - col("ph")), 4))
          .as("n_filled"),
        when(col("n").isNotNull, "actual")
          .when(col("ph").isNotNull && col("nh").isNotNull, "interp")
          .otherwise("edge").as("src"))
      .orderBy("event_type", "hour")
  }

  /** W3 variant: RANGE frame — all orders within ±1000.00 of the current
    * price per customer (value-based frame vs the row-based q_win_running).
    * Prices ordered as integer cents: the DataFrame rangeBetween API takes
    * long offsets, and integer frames are engine-portable anyway. */
  def qWinRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("pc"))
      .rangeBetween(-100000L, 100000L)
    Tables.orders(s, d)
      .withColumn("pc", round(col("o_totalprice") * 100).cast("long"))
      .select(col("o_orderkey"), col("o_custkey"), col("pc"),
              count(lit(1)).over(w).as("n_near"),
              sum(col("pc")).over(w).as("sum_near_cents"))
      .orderBy("o_orderkey")
  }

  /** W3 variant: TIME-range rolling window — the "events in the trailing
    * hour" shape (rate limiting, rolling MAU, anomaly baselines): a RANGE
    * frame over epoch seconds, [-3599, 0] from each event. Distinct from
    * [[qWinRangeFrame]]'s value-range frame: the frame key here is event
    * TIME, so out-of-order arrival density directly widens/narrows each
    * row's peer set. One shuffle on the partition key; at 100 TB the frame
    * scan is bounded by the hour's event density per type, not the table. */
  def qWinTimeRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("es"))
      .rangeBetween(-3599L, 0L)
    Tables.events(s, d)
      .filter(col("event_id") < 2000)
      .withColumn("es", unix_timestamp(col("ts")))
      .select(col("event_id"), col("event_type"), col("es"),
              count(lit(1)).over(w).as("n_trailing_hour"),
              sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
                .as("sum_trailing_hour"))
      .orderBy("event_id")
  }

  /** A6 variant: explicit GROUPING SETS — (returnflag), (linestatus), () —
    * a shape rollup/cube can't express. */
  def qAggGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
              coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
              col("n"), col("sum_qty"))
      .orderBy("rf", "ls")

  /** Pivot: event counts per user-bucket × event_type — long-to-wide. At
    * scale this is one hash aggregate (pivot values are known up front, no
    * second pass). */
  def qPivotEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("bucket", (col("user_id") % 10).cast("long"))
      .groupBy("bucket")
      .pivot("event_type", Seq("click", "purchase", "signup", "view", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("bucket")

  /** Unpivot (wide→long, the inverse of q_pivot_events): per-lineitem money
    * columns melted into (measure, amount) rows. */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
               Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
               "measure", "amount")
      // (l_orderkey, l_linenumber) is NOT unique in the corpus (see
      // qJoinBroadcastDim) — amount completes a total order over the
      // projected row so multi-file inputs can't reorder ties (r14)
      .orderBy("l_orderkey", "l_linenumber", "measure", "amount")

  /** §2.9 sliding window, batch form — window(1h, 30min): each event lands
    * in 2 overlapping windows (Spark's window() is a generator here). */
  def qStreamSliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), Num.moneySum(col("value")).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
              col("n"), col("sum_value"))
      .orderBy("ws")

  /** Gaps-and-islands sessionization (batch form of the streaming
    * flatMapGroupsWithState sessionizer): a new session starts when the gap
    * to the previous event exceeds 1 hour; session id = running count of
    * session starts. Two windows + one aggregate, all on the user_id
    * shuffle — the standard analytic sessionization at any scale. Gap math
    * on integer epoch seconds so nanosecond-vs-microsecond timestamp
    * precision can't flip a boundary between engines. */
  def qSessionizeBatch(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("new_s",
        when(col("sec") - lag(col("sec"), 1).over(byUser) > 3600 ||
             lag(col("sec"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min(col("event_id")).as("first_id"),
           max(col("event_id")).as("last_id"),
           Num.moneySum(col("value")).as("total"))
      .orderBy("user_id", "session_id")
  }

  /** Statistical aggregates with DETERMINISTIC cross-engine results: stddev
    * from exact decimal moments (sum, sum-of-squares are decimal-exact on
    * 2-decimal money, so the double math is one fixed expression), and the
    * exact interpolated median. Built-in stddev_samp would be Welford-merge
    * order-dependent across partitions — never oracle-safe. */
  def qAggStats(s: SparkSession, d: String): DataFrame = {
    val p = col("o_totalprice").cast("decimal(18,2)")
    val ssq = sum(p * p).cast("double")
    val sm = sum(p).cast("double")
    val n = count(lit(1)).cast("double")
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
           round(sqrt((ssq - sm * sm / n) / (n - lit(1.0))), 4).as("sd"),
           round(expr("percentile(o_totalprice, 0.5)"), 4).as("median"))
      .orderBy("o_orderstatus")
  }

  /** EXT: correlation + covariance profiling — the two-column moment
    * family (does quantity track price inside a return class?). Built-in
    * corr()/covar_samp() accumulate with engine-specific Welford updates
    * whose FP error differs between Spark and DuckDB, so this computes
    * the MOMENTS exactly (decimal sums of 2-dp values and their products
    * — the Num.moneySum discipline) and combines them in one fixed-order
    * double expression: identical inputs, identical operation order,
    * bit-identical result on both engines. Scale shape: a single partial
    * aggregate — five decimal sums + a count per group — nothing about
    * the two-pass textbook formula survives; this IS the one-pass form
    * with exact partials. */
  def qAggCorr(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,2)")
    val y = col("l_extendedprice").cast("decimal(18,2)")
    val n   = count(lit(1)).cast("double")
    val sx  = sum(x).cast("double")
    val sy  = sum(y).cast("double")
    val sxx = sum(x * x).cast("double")
    val syy = sum(y * y).cast("double")
    val sxy = sum(x * y).cast("double")
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           round((n * sxy - sx * sy) /
                 sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("corr_qp"),
           round((sxy - sx * sy / n) / (n - lit(1.0)), 4).as("covar_qp"))
      .orderBy("l_returnflag")
  }

  /** W4 completion: ntile / percent_rank / cume_dist — the distribution
    * ranking family over a bounded key set. */
  def qWinDistribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"), col("o_orderstatus"),
              ntile(4).over(w).cast("long").as("quartile"),
              round(percent_rank().over(w), 4).as("pr"),
              round(cume_dist().over(w), 4).as("cd"))
      .orderBy("o_orderkey")
  }

  /** EXT: robust per-group anomaly screen — median/MAD z-scores, the
    * data-quality outlier rule that survives the outliers themselves
    * (mean/stddev are dragged by the very points being hunted; the median
    * and the median absolute deviation both have a 50% breakdown point —
    * Leys et al. 2013, the standard ingest screen before a metric feeds a
    * training-data pipeline). The classic cutoff is |x−med| > 3·1.4826·MAD
    * (1.4826 rescales MAD to σ under normality); the two constants are
    * pre-multiplied into the single literal 4.4478 so both engines compare
    * against the SAME double — no cross-engine FP-ordering seam.
    *
    * Both quantile layers use the DISCRETE percentile (percentile_disc ↔
    * DuckDB quantile_disc, the [[qAggPercentileExact]] convention pinned
    * by its boundary fixture spec), so every derived number is copy-or-
    * subtract arithmetic on corpus doubles — no interpolation to drift.
    *
    * Scale shape: two sort-based grouped aggregates over the SAME
    * event_type key (bounded cardinality — the per-group medians are a
    * KB-sized relation, broadcast back), then one map-side flag pass
    * folded into the final count aggregate. The fact shuffles on
    * event_type once per quantile layer; nothing else moves. */
  def qAnomalyMad(s: SparkSession, d: String): DataFrame = {
    val (dev, model) = madModel(s, d)
    dev.join(broadcast(model.select("event_type", "mad")), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           min(col("med")).as("med"),
           min(col("mad")).as("mad"),
           sum(when(col("dev") > col("mad") * lit(4.4478), 1L).otherwise(0L))
             .as("n_outliers"))
      .withColumn("outlier_ppm", expr("n_outliers * 1000000 DIV n"))
      .select("event_type", "n", "med", "mad", "n_outliers", "outlier_ppm")
      .orderBy("event_type")
  }

  /** EXT: the ROW-LEVEL half of the anomaly screen — the actual
    * drop-list a pipeline consumes (which events violate the robust
    * cutoff), putting the per-row semantics under the hash gate next to
    * [[qAnomalyMad]]'s grouped counts. Every output column is a copy of
    * a corpus double or the model's discrete quantiles — zero derived
    * FP in the result. */
  def qAnomalyFlags(s: SparkSession, d: String): DataFrame = {
    val (dev, model) = madModel(s, d)
    dev.join(broadcast(model.select("event_type", "mad")), "event_type")
      .filter(col("dev") > col("mad") * lit(4.4478))
      .select("event_id", "event_type", "value", "med", "mad")
      .orderBy("event_id")
  }

  /** A-family completion: deterministic per-group MODE — the most
    * frequent o_orderpriority per o_orderstatus. Native `mode()` (Spark
    * 3.4+/DuckDB) leaves TIES engine-defined, so the operator is the
    * window form with the tie pinned by (count DESC, value ASC) — the
    * q_topk_group discipline applied to a 1-row-per-group argmax. Scale:
    * one grouped count (map-side combined — the shuffle carries
    * group × distinct-value rows, not the fact), then a window over that
    * tiny relation. */
  def qAggMode(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.orders(s, d)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rk", row_number().over(
        Window.partitionBy("o_orderstatus")
          .orderBy(col("n").desc, col("o_orderpriority"))))
      .filter(col("rk") === 1)
      .select("o_orderstatus", "o_orderpriority", "n")
      .orderBy("o_orderstatus")
  }

  /** The trained half of the anomaly screen, shared with the STREAMING
    * scorer ([[graft.streaming.Streams.anomalyStream]] — train offline,
    * score online): returns the deviation frame and the per-type
    * (med, mad) model relation (bounded by event-type cardinality —
    * KB-sized, the broadcast side everywhere it is consumed). */
  private[graft] def madModel(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d).select("event_id", "event_type", "value")
    val med = ev.groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)").as("mad"))
    (dev, mad.join(broadcast(med), "event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_mode"         -> (qAggMode _),
    "q_anomaly_mad"      -> (qAnomalyMad _),
    "q_anomaly_flags"    -> (qAnomalyFlags _),
    "q_sketch_countmin"  -> (qSketchCountMin _),
    "q_agg_histogram"    -> (qAggHistogram _),
    "q_ts_gapfill"       -> (qTsGapfill _),
    "q_win_time_range"   -> (qWinTimeRange _),
    "q_agg_stats"        -> (qAggStats _),
    "q_win_distribution" -> (qWinDistribution _),
    "q_stream_sliding"   -> (qStreamSliding _),
    "q_sessionize_batch" -> (qSessionizeBatch _),
    "q_unpivot"          -> (qUnpivot _),
    "q_approx_distinct"  -> (qApproxDistinct _),
    "q_approx_quantile"  -> (qApproxQuantile _),
    "q_sketch_merge"     -> (qSketchMerge _),
    "q_agg_percentile_exact" -> (qAggPercentileExact _),
    "q_agg_corr"         -> (qAggCorr _),
    "q_funnel"           -> (qFunnel _),
    "q_cohort_retention" -> (qCohortRetention _),
    "q_agg_histogram_eqdepth" -> (qAggHistogramEqdepth _),
    "q_win_range_frame"  -> (qWinRangeFrame _),
    "q_agg_grouping_sets" -> (qAggGroupingSets _),
    "q_pivot_events"     -> (qPivotEvents _),
    "q_agg_bbox"         -> (qAggBbox _),
    "q_agg_mean"         -> (qAggMean _),
    "q_agg_groupby_time" -> (qAggGroupbyTime _),
    "q_agg_distinct"     -> (qAggDistinct _),
    "q_agg_rollup"       -> (qAggRollup _),
    "q_agg_cube"         -> (qAggCube _),
    "q_win_centroid"     -> (qWinCentroid _),
    "q_win_rank"         -> (qWinRank _),
    "q_win_running"      -> (qWinRunning _),
    "q_stream_tumbling"  -> (qStreamTumbling _),
    "q_stream_join"      -> (qStreamJoin _),
  )

  val oracle: Map[String, String] = Map(
    // discrete quantiles both layers (quantile_disc = stored values, no
    // interpolation); 4.4478 = 3 * 1.4826 pre-multiplied so both engines
    // compare against the identical double literal
    "q_anomaly_flags" ->
      """WITH med AS (SELECT event_type, quantile_disc(value, 0.5) AS med
        |             FROM events GROUP BY event_type),
        |dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
        |               ABS(e.value - m.med) AS dev
        |        FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
        |        FROM dev GROUP BY event_type)
        |SELECT d.event_id, d.event_type, d.value, d.med, a.mad
        |FROM dev d JOIN mad a USING (event_type)
        |WHERE d.dev > a.mad * 4.4478
        |ORDER BY d.event_id""".stripMargin,
    "q_agg_mode" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |           FROM orders GROUP BY 1, 2),
        |r AS (SELECT c.*, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |        ORDER BY n DESC, o_orderpriority) AS rk FROM c)
        |SELECT o_orderstatus, o_orderpriority, n
        |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,
    "q_stream_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts, value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT click_id, purchase_id, c.user_id,
        |       date_diff('second', c_ts, p_ts) AS gap_s, value
        |FROM c JOIN p ON c.user_id = p.user_id
        | AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    "q_anomaly_mad" ->
      """WITH med AS (SELECT event_type, quantile_disc(value, 0.5) AS med
        |             FROM events GROUP BY event_type),
        |dev AS (SELECT e.event_type, m.med, ABS(e.value - m.med) AS dev
        |        FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
        |        FROM dev GROUP BY event_type)
        |SELECT d.event_type, COUNT(*) AS n, MIN(d.med) AS med, MIN(a.mad) AS mad,
        |  CAST(SUM(CASE WHEN d.dev > a.mad * 4.4478 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(SUM(CASE WHEN d.dev > a.mad * 4.4478 THEN 1 ELSE 0 END) * 1000000
        |       // COUNT(*) AS BIGINT) AS outlier_ppm
        |FROM dev d JOIN mad a USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // the exact count is hash-compared; the HLL estimate itself is
    // engine-specific, so what the oracle pins is the CHECKED 5%-of-exact
    // accuracy bound (TRUE on the DuckDB side, computed on the Spark side).
    // TRIAGE NOTE (r8 advice): the 5% bound is deterministic for a FIXED
    // corpus but data-dependent — if the driver regenerates testdata and
    // one of these queries hash-fails ONLY on a within_bound column, that
    // is a sketch-accuracy miss on the new data (a rare >5% HLL/GK
    // deviation), NOT an engine correctness bug; re-check the exact_*
    // columns before burning time on the engine
    "q_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // mergeable-sketch rollup: the exact counts (global + summed daily)
    // hash; the day-sketch union is pinned within 5% of exact
    "q_sketch_merge" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |         COUNT(DISTINCT user_id) AS exact_daily
        |  FROM events GROUP BY day, event_type)
        |SELECT e.event_type, e.exact_users,
        |       CAST(d.sum_daily_users AS BIGINT) AS sum_daily_users,
        |       TRUE AS within_bound
        |FROM (SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        |      FROM events GROUP BY event_type) e
        |JOIN (SELECT event_type, SUM(exact_daily) AS sum_daily_users
        |      FROM daily GROUP BY event_type) d USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // same pattern: exact discrete percentiles hashed, sketch accuracy
    // bounds pinned TRUE
    "q_approx_quantile" ->
      """SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS DOUBLE) AS exact_p50,
        |  CAST(quantile_disc(n_chars, 0.9) AS DOUBLE) AS exact_p90,
        |  TRUE AS p50_within, TRUE AS p90_within
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // percentile_disc picks an ACTUAL stored value (no interpolation), so
    // the only FP step is the final decimal->double cast on both engines
    "q_agg_percentile_exact" ->
      """SELECT l_returnflag,
        |  CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS p50_qty,
        |  CAST(quantile_disc(l_quantity, 0.95) AS DOUBLE) AS p95_qty,
        |  CAST(quantile_disc(l_extendedprice, 0.5) AS DOUBLE) AS p50_price,
        |  CAST(quantile_disc(l_extendedprice, 0.99) AS DOUBLE) AS p99_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // stage anchors = conditional MINs given the previous anchor; same
    // three-pass CTE shape
    "q_funnel" ->
      """WITH s AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
        |  FROM events GROUP BY user_id),
        |c AS (SELECT e.user_id, s.s_ts,
        |    MIN(CASE WHEN e.event_type = 'click' AND e.ts >= s.s_ts THEN e.ts END) AS c_ts
        |  FROM events e JOIN s ON e.user_id = s.user_id GROUP BY e.user_id, s.s_ts),
        |p AS (SELECT e.user_id, c.s_ts, c.c_ts,
        |    MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= c.c_ts THEN e.ts END) AS p_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id GROUP BY e.user_id, c.s_ts, c.c_ts)
        |SELECT COUNT(*) AS n_users,
        |  CAST(SUM(CASE WHEN s_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN c_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after,
        |  CAST(SUM(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after
        |FROM p""".stripMargin,
    // day-offset weeks (no calendar week-start conventions); exact
    // COUNT(DISTINCT) both sides
    "q_cohort_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (SELECT user_id, MIN(day) AS c_day FROM ev GROUP BY user_id)
        |SELECT c_day, CAST(date_diff('day', c_day, day) // 7 AS BIGINT) AS wk,
        |       COUNT(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN cohort ON ev.user_id = cohort.user_id
        |WHERE date_diff('day', c_day, day) // 7 <= 4
        |GROUP BY c_day, wk ORDER BY c_day, wk LIMIT 200""".stripMargin,
    "q_agg_histogram_eqdepth" ->
      """WITH b AS (SELECT o_totalprice,
        |    CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // exact decimal moments -> one fixed-order double expression: the
    // engines' Welford corr()/covar() accumulations differ, the moments
    // do not
    "q_agg_corr" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND((COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))
        |    / sqrt((COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |            - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
        |           * (COUNT(*) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |              - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))), 6) AS corr_qp,
        |  ROUND((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1.0), 4) AS covar_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // identical md5-nibble buckets; every cell is a SUM, so the sketch is
    // bit-identical across engines — the estimate is exact arithmetic
    "q_sketch_countmin" ->
      """WITH words AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |cells AS (SELECT r, strpos('0123456789abcdef',
        |            substring(md5(CAST(r AS VARCHAR) || '|' || word), 1, 1)) - 1 AS b
        |          FROM words, generate_series(0, 3) AS t(r)),
        |sketch AS (SELECT r, b, COUNT(*) AS c FROM cells GROUP BY r, b),
        |truth AS (SELECT word, COUNT(*) AS true_n FROM words GROUP BY word),
        |probes AS (SELECT word, true_n, r, strpos('0123456789abcdef',
        |             substring(md5(CAST(r AS VARCHAR) || '|' || word), 1, 1)) - 1 AS b
        |           FROM truth, generate_series(0, 3) AS t(r))
        |SELECT word, true_n, MIN(c) AS est_n,
        |  CAST(CASE WHEN MIN(c) > true_n THEN 1 ELSE 0 END AS BIGINT) AS overest
        |FROM probes JOIN sketch USING (r, b)
        |GROUP BY word, true_n ORDER BY word""".stripMargin,
    "q_agg_histogram" ->
      """WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders)
        |SELECT CASE WHEN hi = lo THEN 0
        |            ELSE LEAST(9, CAST(floor((o_totalprice - lo) / ((hi - lo) / 10.0)) AS BIGINT))
        |       END AS bin,
        |  COUNT(*) AS n, MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders, b
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_win_time_range" ->
      """SELECT event_id, event_type,
        |  CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS es,
        |  COUNT(*) OVER w AS n_trailing_hour,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing_hour
        |FROM events WHERE event_id < 2000
        |WINDOW w AS (PARTITION BY event_type
        |             ORDER BY CAST(epoch_ns(ts) // 1000000000 AS BIGINT)
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_ts_gapfill" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hh, COUNT(*) AS n
        |                FROM events GROUP BY 1, 2),
        |bounds AS (SELECT min(hh) AS h0, max(hh) AS h1 FROM hourly),
        |grid AS (SELECT t.event_type, g.hh
        |         FROM (SELECT DISTINCT event_type FROM hourly) t,
        |              (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hh
        |               FROM bounds) g),
        |j AS (SELECT grid.event_type, grid.hh, hourly.n,
        |        CAST(epoch(grid.hh) / 3600 AS BIGINT) AS h
        |      FROM grid LEFT JOIN hourly USING (event_type, hh)),
        |w AS (SELECT *,
        |  last_value(CASE WHEN n IS NOT NULL THEN h END IGNORE NULLS) OVER
        |    (PARTITION BY event_type ORDER BY hh
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph,
        |  last_value(n IGNORE NULLS) OVER
        |    (PARTITION BY event_type ORDER BY hh
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pn,
        |  first_value(CASE WHEN n IS NOT NULL THEN h END IGNORE NULLS) OVER
        |    (PARTITION BY event_type ORDER BY hh
        |     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh,
        |  first_value(n IGNORE NULLS) OVER
        |    (PARTITION BY event_type ORDER BY hh
        |     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nn
        |  FROM j)
        |SELECT event_type, strftime(hh, '%Y-%m-%d %H:%M:%S') AS hour,
        |  n AS n_actual,
        |  CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
        |       WHEN ph IS NOT NULL AND nh IS NOT NULL
        |       THEN ROUND(pn + (nn - pn) * CAST(h - ph AS DOUBLE) / (nh - ph), 4)
        |       END AS n_filled,
        |  CASE WHEN n IS NOT NULL THEN 'actual'
        |       WHEN ph IS NOT NULL AND nh IS NOT NULL THEN 'interp'
        |       ELSE 'edge' END AS src
        |FROM w ORDER BY event_type, hour""".stripMargin,
    "q_agg_stats" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  ROUND(SQRT((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |    / (CAST(COUNT(*) AS DOUBLE) - 1.0)), 4) AS sd,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_win_distribution" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 4) AS pr,
        |  ROUND(CUME_DIST() OVER w, 4) AS cd
        |FROM orders WHERE o_orderkey <= 2000
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_stream_sliding" ->
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS ws,
        |         value
        |  FROM events CROSS JOIN (VALUES (0), (1)) t(o)
        |  WHERE ts >= time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes'
        |    AND ts <  time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' + INTERVAL '1 hour')
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1 ORDER BY ws""".stripMargin,
    "q_sessionize_batch" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |flagged AS (SELECT *,
        |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 3600
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |sess AS (SELECT *,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(event_id) AS first_id, MAX(event_id) AS last_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, amount FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS amount
        |  FROM lineitem WHERE l_orderkey <= 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey <= 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |  FROM lineitem WHERE l_orderkey <= 100)
        |ORDER BY l_orderkey, l_linenumber, measure, amount""".stripMargin,
    "q_win_range_frame" ->
      """SELECT o_orderkey, o_custkey, pc,
        |  COUNT(*) OVER w AS n_near,
        |  CAST(SUM(pc) OVER w AS BIGINT) AS sum_near_cents
        |FROM (SELECT o_orderkey, o_custkey,
        |        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY pc
        |             RANGE BETWEEN 100000 PRECEDING AND 100000 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    "q_pivot_events" ->
      """SELECT user_id % 10 AS bucket,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view,
        |  COUNT(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_agg_bbox" ->
      """SELECT MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        |  strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
        |  strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
        |FROM lineitem""".stripMargin,
    "q_agg_mean" ->
      """SELECT c_mktsegment,
        |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal), 4) AS avg_bal,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_agg_groupby_time" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr,
        |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hr""".stripMargin,
    "q_agg_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin,
    "q_agg_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st, COALESCE(o_orderpriority, 'ALL') AS pri,
        |  COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY st, pri""".stripMargin,
    "q_win_centroid" ->
      """SELECT k, centroid FROM (
        |  SELECT k, CAST(x + LAG(x, 1) OVER (ORDER BY k) AS DOUBLE) / 2.0 AS centroid
        |  FROM (SELECT k, -98.0 + k * 0.005 AS x FROM range(0, 8192) t(k)))
        |WHERE centroid IS NOT NULL ORDER BY k""".stripMargin,
    "q_win_rank" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk, o_orderkey""".stripMargin,
    "q_win_running" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM events ORDER BY event_id""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
        |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY ws""".stripMargin,
  )
}
