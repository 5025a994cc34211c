package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins._

/** Plan-drift guard (r7 verdict #4): PLANS.md is a snapshot that nothing
  * defended — a regression (new Exchange, lost pushdown, a join strategy
  * flipping to nested-loop) would land silently and only surface as a
  * bench number two rounds later. This spec pins a STRUCTURAL signature
  * of each headline query's physical plan:
  *
  *   shuffles / broadcast joins / sort-merge joins / nested-loop joins /
  *   parquet scans / scans with non-empty PushedFilters
  *
  * AQE is disabled for the signature (the static planner's output is
  * deterministic; AQE's runtime re-plan can only improve on it), so the
  * guard asserts the plan we SHIP, not the plan the runtime happens to
  * pick. Bounds are committed expectations: exact where the structure is
  * the point (no SMJ in a star join, zero nested-loop in the containment
  * join), <= where sf-dependent planning may legitimately tighten.
  */
class PlanGuardSpec extends SparkSpec {

  case class Sig(shuffles: Int, bhj: Int, smj: Int, shj: Int, nlj: Int,
                 cartesian: Int, scans: Int, pushedScans: Int, generates: Int)

  private def signature(name: String): Sig = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan: SparkPlan =
        SparkEntry.queries(name)(spark, sf01).queryExecution.executedPlan
      val scans = plan.collect { case s: FileSourceScanExec => s }
      Sig(
        shuffles  = plan.collect { case e: ShuffleExchangeExec => e }.size,
        bhj       = plan.collect { case j: BroadcastHashJoinExec => j }.size,
        smj       = plan.collect { case j: SortMergeJoinExec => j }.size,
        shj       = plan.collect { case j: ShuffledHashJoinExec => j }.size,
        nlj       = plan.collect { case j: BroadcastNestedLoopJoinExec => j }.size,
        cartesian = plan.collect { case j: CartesianProductExec => j }.size,
        scans     = scans.size,
        pushedScans = scans.count(_.metadata.get("PushedFilters").exists(_ != "[]")),
        generates = plan.collect { case g: GenerateExec => g }.size)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q_tpch_q5: all dims broadcast, no sort-merge, shuffles only for agg+sort") {
    val s = signature("q_tpch_q5")
    info(s.toString)
    assert(s.smj === 0 && s.shj === 0, s"star join must stay broadcast: $s")
    assert(s.nlj === 0 && s.cartesian === 0, s"no nested-loop in the star: $s")
    assert(s.bhj >= 4, s"expected >=4 broadcast dims: $s")
    assert(s.shuffles <= 3, s"agg (2-phase) + sort only: $s")
    assert(s.pushedScans >= 4, s"filters must reach the scans: $s")
  }

  test("q_interp_barycentric: containment is an equi-join — zero nested-loop, zero cartesian") {
    val s = signature("q_interp_barycentric")
    info(s.toString)
    assert(s.nlj === 0 && s.cartesian === 0,
      s"bucket rewrite must keep containment an equi-join: $s")
    assert(s.smj === 0, s"toy shape must stay broadcast: $s")
    // window tie-break + final orderBy; the containment join itself is
    // broadcast at this sf and exchange-free
    assert(s.shuffles <= 3, s"window + sort only: $s")
  }

  test("q_text_decontam: eval-side shingles broadcast, corpus never re-shuffled as text") {
    val s = signature("q_text_decontam")
    info(s.toString)
    assert(s.nlj === 0 && s.cartesian === 0, s"no all-pairs: $s")
    assert(s.smj === 0, s"eval side must broadcast: $s")
  }

  test("q_join_cross_grid: axis product is the one intentional nested-loop (broadcast(tiny))") {
    val s = signature("q_join_cross_grid")
    info(s.toString)
    assert(s.cartesian === 0, s"product must be broadcast-driven, not cartesian: $s")
    assert(s.smj === 0 && s.shuffles <= 2, s"axis relations are tiny: $s")
  }

  test("global plan hygiene: every declared query — cross joins only against stats-tiny sides, zero UDFs") {
    // The repo-wide invariants the r7 audit verified by hand ("every
    // crossJoin is broadcast(tiny) by construction; zero UDFs anywhere"),
    // promoted to an executable sweep over ALL declared queries so a
    // future operator can't silently regress them. Logical-plan level:
    // cheap (no physical planning), and stats-based so the whitelist is
    // self-maintaining — a condition-less join is fine iff its smaller
    // side is bounded tiny (generated axes, broadcast codebooks).
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val TinyBytes = BigInt(32L << 20)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      plan.collect { case j: Join if j.condition.isEmpty => j }.foreach { j =>
        val minSide = j.left.stats.sizeInBytes.min(j.right.stats.sizeInBytes)
        assert(minSide <= TinyBytes,
          s"$name: condition-less join whose smaller side is $minSide bytes — unbounded product risk")
      }
      val udfs = plan.collect { case p =>
        p.expressions.flatMap(_.collect { case u: ScalaUDF => u }) }.flatten
      assert(udfs.isEmpty, s"$name: ScalaUDF in plan — hot paths must stay codegen'd: $udfs")
    }
  }

  test("q_text_bigram_lm: size-gated model join, no all-pairs, bounded shuffles") {
    val s = signature("q_text_bigram_lm")
    info(s.toString)
    assert(s.nlj === 0 && s.cartesian === 0, s"no all-pairs: $s")
    // corpus explode → bigram agg; model is checkpoint-pinned, join
    // broadcast below the gate
    assert(s.smj === 0, s"model join must stay broadcast below the gate: $s")
  }
}
