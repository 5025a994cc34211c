package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{GroupTopK, GroupTopKExec}

/** The custom whole-operator extension (SURVEY §2.10 tier c): logical
  * GroupTopK planned by GroupTopKStrategy into a partial/final bounded-heap
  * pair. Checks result equivalence with the window form AND the plan facts
  * that justify the operator's existence. */
class GroupTopKSpec extends SparkSpec {

  private def inner(df: org.apache.spark.sql.DataFrame) = {
    // force execution so AQE finalizes the plan
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** collect() does not descend into AQE query stages — walk them too. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val within = p match {
      case q: QueryStageExec => allNodes(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children.flatMap(allNodes) ++ within)
  }

  test("matches the row_number window form exactly") {
    val viaOp = operators.Relational.qTopkGroup(spark, sf).collect()
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3 && col("o_custkey") < 300)
      .drop("rk")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(viaOp.map(_.toString).toSeq === viaWindow.map(_.toString).toSeq)
  }

  test("plans as partial+final heap pair with one exchange and no WindowExec") {
    val df = GroupTopK.topKPerGroup(
      Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      group = Seq("o_custkey"), order = Seq("o_totalprice" -> true, "o_orderkey" -> false), k = 3)
    val nodes = allNodes(inner(df))
    val topks = nodes.collect { case t: GroupTopKExec => t }
    assert(topks.map(_.partial).sorted === Seq(false, true),
           s"expected partial+final GroupTopKExec pair:\n${inner(df)}")
    assert(nodes.collect { case w: WindowExec => w }.isEmpty, "no WindowExec")
    assert(nodes.collect { case e: ShuffleExchangeExec => e }.size === 1,
           s"exactly one exchange (between partial and final):\n${inner(df)}")
  }

  test("partial phase bounds shuffled rows at groups x partitions x k") {
    val df = GroupTopK.topKPerGroup(
      Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      group = Seq("o_custkey"), order = Seq("o_totalprice" -> true, "o_orderkey" -> false), k = 2)
    // every group in the final output has min(k, group_size) rows
    val sizes = df.groupBy("o_custkey").count().collect()
    assert(sizes.forall(_.getAs[Long]("count") <= 2))
    val nGroups = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(sizes.length.toLong === nGroups, "every group survives")
  }

  test("over a bucketed table, top-k per group plans with ZERO exchanges") {
    // The final phase's ClusteredDistribution(group) is already satisfied
    // by the bucketed layout's HashPartitioning — the layout + operator
    // combination eliminates the shuffle entirely (the 100 TB shape:
    // bucket the fact table once, every per-group ranking after is free).
    // the catalog is in-memory per JVM: drop leftovers from previous runs
    spark.sql("DROP TABLE IF EXISTS orders_bucketed_topk")
    val leftover = new java.io.File("/tmp/graft_warehouse/orders_bucketed_topk")
    if (leftover.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(leftover)
    }
    graft.plans.Layout.writeBucketed(
      Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      "orders_bucketed_topk", "o_custkey", 8)
    val df = GroupTopK.topKPerGroup(spark.table("orders_bucketed_topk"),
      group = Seq("o_custkey"), order = Seq("o_totalprice" -> true, "o_orderkey" -> false), k = 3)
    val nodes = allNodes(inner(df))
    assert(nodes.collect { case e: ShuffleExchangeExec => e }.isEmpty,
           s"bucketed top-k must be exchange-free:\n${inner(df)}")
    assert(nodes.collect { case t: GroupTopKExec => t }.nonEmpty)
  }

  test("k larger than every group degrades to identity per group") {
    val base = Tables.orders(spark, sf)
      .filter(col("o_custkey") < 20).select("o_custkey", "o_orderkey")
    val out = GroupTopK.topKPerGroup(base, Seq("o_custkey"),
      Seq("o_orderkey" -> false), k = 1000000).collect()
    assert(out.length === base.count())
  }

  test("unknown column name fails fast with the available names") {
    val e = intercept[IllegalArgumentException] {
      GroupTopK.topKPerGroup(Tables.orders(spark, sf), Seq("nope"), Seq("o_orderkey" -> false), 1)
    }
    assert(e.getMessage.contains("no column 'nope'"))
    assert(e.getMessage.contains("o_orderkey"))
  }
}
