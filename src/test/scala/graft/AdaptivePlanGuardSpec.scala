package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins._

/** AQE-on plan guard (VERDICT r8 #6): [[PlanGuardSpec]] pins the STATIC
  * planner's output with AQE disabled — but at runtime AQE re-plans
  * stage-by-stage (that's its job), and nothing pinned the FINAL adaptive
  * plans. This spec executes the headline queries at sf0.1 with AQE ON
  * (the shared session default — the configuration production runs) and
  * asserts the invariants that must survive ANY legitimate re-plan:
  *
  *   - no nested-loop / cartesian join materializes at runtime
  *     (the one tolerated BroadcastNestedLoopJoin is the meshgrid
  *     product, which IS the operator);
  *   - parquet pushdown is not lost (the scans inside the final stages
  *     still carry non-empty PushedFilters);
  *   - broadcast joins are never DEMOTED (AQE may promote SMJ→BHJ from
  *     runtime stats, never the reverse, so a bhj lower bound is stable).
  *
  * Mechanism: the action must run the query's OWN QueryExecution — a
  * `df.write` builds a fresh QueryExecution for the write command and
  * leaves the df's adaptive plan untouched — so we drive
  * `queryExecution.toRdd` directly (`foreachPartition` consuming rows on
  * executors; nothing reaches the driver). `AdaptiveSparkPlanExec
  * .doExecute` materializes every intermediate stage and commits the
  * final plan, after which `executedPlan` IS the plan that ran
  * (`isFinalPlan=true`); a QueryExecutionListener would hand us the same
  * object, minus its async-bus race. AQE wraps materialized stages in
  * leaf `QueryStageExec` nodes that `collect` does not descend into —
  * [[flatten]] recurses through stages, reused exchanges, and nested
  * adaptive plans so the census sees every operator that actually ran.
  */
class AdaptivePlanGuardSpec extends SparkSpec {

  def sf1: String = "/root/testdata/sf0.1"

  case class FinalSig(bhj: Int, smj: Int, shj: Int, nlj: Int, cartesian: Int,
                      pushedScans: Int, adaptive: Boolean)

  /** Execute the query end-to-end (rows consumed on executors — full
    * materialization, no driver collect), then census its FINAL adaptive
    * plan. */
  private def finalSignature(df: DataFrame): FinalSig = {
    val nodes = PlanWalk.executeAndFlatten(df)
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    FinalSig(
      bhj       = nodes.count(_.isInstanceOf[BroadcastHashJoinExec]),
      smj       = nodes.count(_.isInstanceOf[SortMergeJoinExec]),
      shj       = nodes.count(_.isInstanceOf[ShuffledHashJoinExec]),
      nlj       = nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      cartesian = nodes.count(_.isInstanceOf[CartesianProductExec]),
      pushedScans = scans.count(_.metadata.get("PushedFilters").exists(_ != "[]")),
      adaptive = nodes.exists {
        case a: AdaptiveSparkPlanExec => a.isFinalPlan
        case _                        => false
      })
  }

  private def run(name: String, dir: String = sf1): FinalSig = {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "this guard exists to pin the ADAPTIVE final plans")
    val s = finalSignature(SparkEntry.queries(name)(spark, dir))
    info(s"$name: $s")
    assert(s.adaptive, s"$name: expected an executed AdaptiveSparkPlanExec (isFinalPlan)")
    s
  }

  test("q_tpch_q5 final adaptive plan: star stays broadcast, pushdown survives") {
    val s = run("q_tpch_q5")
    assert(s.nlj === 0 && s.cartesian === 0, s"no nested-loop in the star at runtime: $s")
    assert(s.bhj >= 4, s"AQE must not demote the broadcast dims: $s")
    assert(s.pushedScans >= 4, s"pushdown lost in a final stage: $s")
  }

  test("q_interp_barycentric final adaptive plan: containment never degrades to a product") {
    val s = run("q_interp_barycentric")
    assert(s.nlj === 0 && s.cartesian === 0,
      s"bucket equi-join must hold under AQE re-plan: $s")
  }

  test("q_text_decontam final adaptive plan: no all-pairs, eval side still hash-joined") {
    val s = run("q_text_decontam")
    assert(s.nlj === 0 && s.cartesian === 0, s"no all-pairs at runtime: $s")
  }

  test("q_text_bigram_lm final adaptive plan: model join never a product") {
    val s = run("q_text_bigram_lm")
    assert(s.nlj === 0 && s.cartesian === 0, s"no all-pairs at runtime: $s")
  }

  test("q_join_cross_grid final adaptive plan: the product is broadcast-driven, never cartesian") {
    val s = run("q_join_cross_grid")
    // the meshgrid NLJ over broadcast(tiny axes) IS the operator; what
    // must never appear is a non-broadcast CartesianProduct
    assert(s.cartesian === 0, s"meshgrid must stay broadcast-driven: $s")
  }

  test("q_dedup_minhash_xx final adaptive plan: banded candidate join stays equi") {
    val s = run("q_dedup_minhash_xx")
    assert(s.nlj === 0 && s.cartesian === 0,
      s"LSH banding must never degrade to all-pairs: $s")
  }

  test("q_join_asof final adaptive plan: no join blowup") {
    val s = run("q_join_asof")
    assert(s.nlj === 0 && s.cartesian === 0, s"as-of is a window, not a product: $s")
  }

  test("q_tpch_q9 final adaptive plan: 6-table profit join stays hash-based, pushdown survives") {
    val s = run("q_tpch_q9")
    // the one tolerated BNLJ is Tpch.partsupp's crossJoin(broadcast(1-row
    // supplier count)) — the generated-relation scaffold, not a join
    // strategy regression; a CartesianProduct must still never appear
    assert(s.nlj <= 1 && s.cartesian === 0, s"no non-broadcast product in the profit join: $s")
    assert(s.pushedScans >= 1, s"pushdown lost in a final stage: $s")
  }

  test("q_dedup_incremental final adaptive plan: index probe stays equi, batch broadcast survives") {
    val s = run("q_dedup_incremental")
    assert(s.nlj === 0 && s.cartesian === 0, s"band probe must stay an equi-join: $s")
    assert(s.bhj >= 1, s"batch side must broadcast below the gate: $s")
  }

  test("q_dedup_ppjoin final adaptive plan: prefix candidate join stays equi") {
    val s = run("q_dedup_ppjoin")
    assert(s.nlj === 0 && s.cartesian === 0,
      s"prefix filtering must never degrade to all-pairs: $s")
  }

  test("q_dedup_bloom final adaptive plan: map-side prefilter, confirm join never a product") {
    val s = run("q_dedup_bloom")
    assert(s.nlj === 0 && s.cartesian === 0, s"confirm join must stay equi: $s")
  }

  test("q_interp_idw final adaptive plan: kNN candidates stay bucket-equi-joined") {
    val s = run("q_interp_idw")
    assert(s.nlj === 0 && s.cartesian === 0,
      s"the radius-bounded kNN must never degrade to a distance cross join: $s")
  }

  test("q_curate_dsir final adaptive plan: 256-row LLR model stays broadcast, no product") {
    val s = run("q_curate_dsir")
    // the model join-back must survive as a broadcast hash join (the
    // model is ≤256 rows by construction — if AQE ever planned it as a
    // shuffle the per-doc frame would re-key on the bucket, the exact
    // movement the operator exists to avoid at 100 TB)
    assert(s.bhj >= 1, s"LLR model join-back must broadcast: $s")
    assert(s.nlj === 0 && s.cartesian === 0, s"no unbounded product in DSIR: $s")
  }

  test("q_ann_ivfpq final adaptive plan: every product broadcast-driven, corpus re-reads dedup via exchange reuse") {
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val nodes = PlanWalk.executeAndFlatten(
      SparkEntry.queries("q_ann_ivfpq")(spark, sf1))
    val cartesian = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])
    val nlj = nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec])
    val reused = nodes.count(_.isInstanceOf[ReusedExchangeExec])
    info(s"q_ann_ivfpq: nlj=$nlj cartesian=$cartesian reusedExchanges=$reused")
    // the tolerated NLJs are the broadcast(8-row centroid) products —
    // cell assignment for candidates and probe selection for queries;
    // a CartesianProduct would mean a product went non-broadcast
    assert(cartesian === 0, "no non-broadcast product in IVF-PQ")
    assert(nlj <= 8, s"only the centroid-broadcast products may be NLJ: $nlj")
    // the operator references the corpus ~8 times (centroids, cell
    // assignment, residuals, codebook donors, queries, re-rank); the
    // (scan → repartition) Exchange subtrees are identical, so AQE must
    // dedup them — at 100 TB this is the difference between one corpus
    // read and eight
    assert(reused >= 1,
      "identical corpus-scan exchanges must be reused, not re-read")
  }

  test("q_mine_hard_negatives final adaptive plan: one broadcast scoring pass, nothing unbounded") {
    val s = run("q_mine_hard_negatives")
    // the ONE tolerated BNLJ is the broadcast(5-row anchor set) scoring
    // product — it IS the brute-topk operator; a second product or a
    // cartesian would mean the label join degraded
    assert(s.nlj <= 1 && s.cartesian === 0,
      s"only the broadcast anchor scoring pass may be a product: $s")
  }

  test("q_sample_proportional final adaptive plan: allocation joins broadcast, no product") {
    val s = run("q_sample_proportional")
    assert(s.nlj === 0 && s.cartesian === 0,
      s"allocation must join by key, never product: $s")
    assert(s.bhj >= 1, s"the |sources|-row allocation must broadcast: $s")
  }
}
