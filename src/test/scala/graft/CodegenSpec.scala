package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.debug

/** Whole-stage-codegen audit of the biggest expression trees — the
  * Snyder series expansions behind the CRS projection queries
  * (operators/Crs.scala) produce large generated methods, and Spark
  * silently falls back to interpreted execution when a compiled method
  * exceeds `spark.sql.codegen.hugeMethodLimit` (the JVM's 64KB method
  * ceiling is the hard bound behind it). These tests compile every
  * whole-stage subtree of each projection query and assert (a) the
  * Project sits inside a codegen stage, (b) compilation succeeds, and
  * (c) no generated method approaches the fallback limit — so the hot
  * path provably executes generated code at any scale. */
class CodegenSpec extends SparkSpec {

  private val projQueries = Seq(
    "q_proj_mercator", "q_proj_epsg", "q_proj_utm", "q_proj_lcc", "q_proj_albers")

  /** AQE wraps the unexecuted plan in AdaptiveSparkPlan (whose codegen
    * stages only materialize per query stage at runtime); the audit wants
    * the statically planned codegen tree, so plan these scan+project
    * shapes without AQE — it changes nothing else about them. */
  private def staticPlan[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  projQueries.foreach { q =>
    test(s"$q: whole-stage codegen compiles, no huge-method fallback") {
      staticPlan {
        val df = SparkEntry.queries(q)(spark, sf)
        val plan = df.queryExecution.executedPlan
        val stages = plan.collect { case w: WholeStageCodegenExec => w }
        assert(stages.nonEmpty, s"$q planned no WholeStageCodegen stage:\n$plan")
        // every Project (the projection math lives there) must be INSIDE a
        // codegen stage: codegen'd operators print with a "*(stage)"
        // prefix, so a bare "Project" line means the expression was
        // ejected from codegen at planning time
        val bare = plan.toString.linesIterator
          .filter(l => l.contains("Project") && !l.contains("*(")).toSeq
        assert(bare.isEmpty,
          s"$q has a Project outside whole-stage codegen: $bare\n$plan")
        // compile each generated subtree the way WholeStageCodegenExec.doExecute
        // does and inspect the bytecode stats the fallback decision reads
        debug.codegenStringSeq(plan).foreach { case (subtree, _, stats) =>
          assert(stats.maxMethodCodeSize >= 0,
            s"$q: a codegen stage failed to compile:\n$subtree")
          // stricter than Spark's hugeMethodLimit fallback bound (65535):
          // HotSpot refuses to JIT methods past -XX:DontCompileHugeMethods'
          // 8000-bytecode limit, so a method in (8000, 65535] would run
          // codegen'd but INTERPRETED by the JVM — a silent ~10x on the
          // hot path
          assert(stats.maxMethodCodeSize < 8000,
            s"$q: ${stats.maxMethodCodeSize}-bytecode generated method would " +
              s"not JIT (and past ${spark.sessionState.conf.hugeMethodLimit} " +
              "Spark itself falls back to interpreted)")
        }
      }
    }
  }
}
