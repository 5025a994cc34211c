package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** SURVEY §2.10 tier (c): a whole-operator extension — custom LogicalPlan
  * + SparkStrategy + SparkPlan, registered through SparkSessionExtensions.
  *
  * Top-k per group is the one O3 shape the built-ins express only
  * wastefully: `row_number().over(partitionBy(g).orderBy(o)) <= k` plans a
  * WindowExec, which SORTS every group's every row (O(n log n) per
  * partition, full shuffle of all rows). This operator keeps a bounded
  * heap per group instead — O(n log k) — and runs in two phases like an
  * aggregate: a PARTIAL pass before the exchange cuts each input
  * partition to ≤k rows per group, so the shuffle carries at most
  * (partitions × groups × k) rows instead of everything; the FINAL pass
  * (child clustered on the group keys, enforced by
  * `requiredChildDistribution`, so EnsureRequirements inserts the
  * exchange) merges the survivors. At 100 TB with k=3 and bounded group
  * counts, the exchange drops from the full fact table to KBs — the same
  * map-side-combine argument as partial aggregation, applied to ranking.
  */
case class GroupTopK(groupExprs: Seq[Expression], order: Seq[SortOrder],
                     k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

/** Two-phase bounded-heap execution. `partial` keeps ≤k per group per
  * input partition with no distribution requirement; the final phase
  * requires clustering on the group keys. */
case class GroupTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(groupExprs))
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val (groupE, orderE, kk, out) = (groupExprs, order, k, child.output)
    child.execute().mapPartitions({ iter =>
      val toUnsafe = UnsafeProjection.create(out.map(_.dataType).toArray)
      val keyProj = UnsafeProjection.create(groupE, out)
      val ord = GenerateOrdering.generate(orderE, out)
      // per group, a reverse-ordered heap whose head is the WORST kept row
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        def compare(a: UnsafeRow, b: UnsafeRow): Int = -ord.compare(a, b)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next() match {
          case u: UnsafeRow => u
          case r => toUnsafe(r)
        }
        val key = keyProj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[UnsafeRow](kk + 1, worstFirst)
          heaps.put(key.copy(), h)
        }
        if (h.size < kk) h.add(row.copy())
        else if (ord.compare(row, h.peek()) < 0) { h.poll(); h.add(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap { h =>
        val arr = h.toArray(new Array[UnsafeRow](h.size))
        java.util.Arrays.sort(arr, ord)
        arr.iterator
      }
    }, preservesPartitioning = true)
  }
}

/** Plans GroupTopK as partial→(exchange)→final. Registered by
  * [[graft.GraftExtensions]] (`injectPlannerStrategy`) or live via
  * [[GroupTopK.ensureInstalled]]. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopK(g, o, k, child) =>
      GroupTopKExec(g, o, k, partial = false,
        GroupTopKExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object GroupTopK {
  /** Idempotent live registration (Verify/Bench sessions are built
    * without `spark.sql.extensions`). */
  def ensureInstalled(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(GroupTopKStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ GroupTopKStrategy

  /** API: top `k` rows per `group`, ranked by `order` — (columnName,
    * descending?) pairs. Attributes are resolved HERE against the
    * analyzed child (Column objects would smuggle lazily-resolved
    * connect-layer nodes into a custom plan, which the analyzer treats
    * as resolved and the codegen then rejects); pre-project any computed
    * ordering expression into a column first. Ties break only by the
    * order columns, so include a unique tiebreaker for determinism. */
  def topKPerGroup(df: DataFrame, group: Seq[String],
                   order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val s = df.sparkSession
    ensureInstalled(s)
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"no column '$n' in ${child.output.map(_.name).mkString(", ")}"))
    val orderExprs = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.GraftSqlShim.ofRows(s,
      GroupTopK(group.map(attr), orderExprs, k, child))
  }
}
