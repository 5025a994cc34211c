package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, HammingDistance, ShingleGenerator}

/** Session extension point (SURVEY §2.10): registers the engine's custom
  * Catalyst expressions as SQL functions.
  *
  * Two installation paths:
  *  - deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the documented SparkSessionExtensions contract);
  *  - embedded: `GraftExtensions.install(spark)` on a live session
  *    (test harnesses, notebooks), via the sql-package shim because the
  *    function registry is `private[sql]`.
  *
  * After either, `spark.sql("SELECT vec_dot(a, b)")` plans the codegen'd
  * [[graft.functions.DotProduct]] — the SQL and DataFrame surfaces expose
  * the identical expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptions.foreach(ext.injectFunction)
    // §2.10 tier (c): whole-operator extension (logical node + strategy)
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopKStrategy)
    // group-key filters commute with per-group top-k; injected into the
    // operator-optimization batch so the standard pushdown rules then
    // carry them from below the custom node all the way to the scan
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughGroupTopK)
  }
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functionDescriptions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("vec_dot"),
     new ExpressionInfo(classOf[DotProduct].getCanonicalName, "vec_dot"),
     (args: Seq[Expression]) => {
       require(args.length == 2, "vec_dot takes exactly 2 arguments")
       DotProduct(args.head, args(1))
     }),
    (FunctionIdentifier("hamming"),
     new ExpressionInfo(classOf[HammingDistance].getCanonicalName, "hamming"),
     (args: Seq[Expression]) => {
       require(args.length == 2, "hamming takes exactly 2 arguments")
       HammingDistance(args.head, args(1))
     }),
    (FunctionIdentifier("shingles"),
     new ExpressionInfo(classOf[ShingleGenerator].getCanonicalName, "shingles"),
     (args: Seq[Expression]) => {
       require(args.length == 2, "shingles takes (text, n)")
       val n = args(1) match {
         case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
         case other => throw new IllegalArgumentException(s"n must be an INT literal, got $other")
       }
       ShingleGenerator(args.head, n)
     }),
  )

  /** Register the functions into an already-running session. */
  def install(spark: SparkSession): Unit =
    functionDescriptions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.GraftSqlShim.registerFunction(spark, ident, info, builder)
    }
}
