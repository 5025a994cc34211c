package graft

import org.apache.spark.sql.functions._
import graft.operators.Tpch

/** Spot checks for the TPC-H shapes (the oracle hash-verifies full results;
  * these assert the semantic invariants a refactor could silently break). */
class TpchSpec extends SparkSpec {

  test("Q1 partitions all filtered rows across exactly the flag x status groups") {
    val rows = Tpch.qTpchQ1(spark, sf).collect()
    val filtered = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp")).count()
    assert(rows.map(_.getAs[Long]("count_order")).sum === filtered)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
      assert(r.getAs[Double]("sum_base_price") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("Q3 revenue is positive and strictly rank-ordered") {
    val rows = Tpch.qTpchQ3(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.forall(_ > 0))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("Q12 counters partition the joined row set; plan is one keyed shuffle") {
    val rows = Tpch.qTpchQ12(spark, sf).collect()
    val joined = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp")).count()
    assert(rows.map(r => r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count"))
      .sum === joined)
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).sorted.toSeq)
  }

  test("Q18: IN-subquery decorrelates to a join, every group clears the threshold") {
    val df = Tpch.qTpchQ18(spark, sf)
    // the grouped-HAVING IN must plan as a join against the aggregated
    // subquery — no per-row subquery execution shape exists in Spark, but
    // assert no CartesianProduct snuck in and a join on l_orderkey did
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getAs[Double]("total_qty") > 212.0))
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("Q2: scalar MIN subquery decorrelates; every surviving row IS its part's minimum") {
    val df = Tpch.qTpchQ2(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the partsupp surrogate (DISTINCT l_partkey, l_suppkey) must be
    // aggregated once — two HashAggregate nodes (partial + final), not the
    // four the old self-repeating correlated-subquery form planned
    val distincts = "HashAggregate\\(keys=\\[l_partkey".r.findAllIn(plan).length
    assert(distincts <= 2, s"lineitem distinct planned $distincts times:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // recompute each part's min acctbal independently and cross-check
    val minByPart = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(Tables.supplier(spark, sf), col("s_suppkey") === col("l_suppkey"))
      .groupBy("l_partkey").agg(min("s_acctbal").as("mn"))
      .collect().map(r => r.getAs[Long]("l_partkey") -> r.getAs[Double]("mn")).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("s_acctbal") === minByPart(r.getAs[Long]("p_partkey")))
    }
  }

  test("Q13: outer join keeps every customer; distribution totals the customer count") {
    val rows = Tpch.qTpchQ13(spark, sf).collect()
    val nCust = Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("custdist")).sum === nCust)
    // weighted count total = number of non-urgent orders (each counted once)
    val nOrders = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum === nOrders)
  }

  test("Q16: NOT IN plans as an anti join and excluded suppliers never appear") {
    // sf0.01: the smallest corpus whose exclusion set (negative-balance
    // suppliers) is non-empty, so the anti join actually removes rows
    val df = Tpch.qTpchQ16(spark, sf01)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Anti"), plan)
    val bad = Tables.supplier(spark, sf01).filter(col("s_acctbal") < 0.0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(bad.nonEmpty)
    val withSupp = Tables.lineitem(spark, sf01)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(Tables.part(spark, sf01), col("p_partkey") === col("l_partkey"))
      .filter(col("p_brand") =!= "Brand#45" &&
              col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49) &&
              !col("l_suppkey").isin(bad.toSeq: _*))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .count()
    assert(df.count() === withSupp)
  }

  test("Q19: disjunction stays a post-join filter — branch sums add up") {
    val row = Tpch.qTpchQ19(spark, sf).collect().head
    val joined = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("p_partkey") === col("l_partkey"))
    def branch(b: String, sz: (Int, Int), q: (Int, Int)) =
      joined.filter(col("p_brand") === b && col("p_size").between(sz._1, sz._2) &&
                    col("l_quantity").between(q._1, q._2)).count()
    val total = branch("Brand#12", (1, 5), (1, 11)) +
      branch("Brand#23", (1, 10), (10, 20)) + branch("Brand#34", (1, 15), (20, 30))
    // branches are disjoint on p_brand, so counts must add exactly
    assert(row.getAs[Long]("n") === total)
  }

  test("Q21: window form scans lineitem once and matches the correlated semi+anti original") {
    val df = Tpch.qTpchQ21(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("numwait") > 0))
    // plan shape: the rewrite's whole point — ONE lineitem scan feeding a
    // per-order window, instead of semi+anti joins over three scans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Semi") && !plan.contains("Anti"), plan)
    // count actual scan NODES over lineitem (the string form repeats the
    // path in Location/ReadSchema lines)
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p match {
        case q: QueryStageExec => flatten(q.plan)
        case r: ReusedExchangeExec => flatten(r.child)
        case _ => p.children.toSeq.flatMap(flatten)
      })
    val inner = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val liScans = flatten(inner).collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => s
    }
    assert(liScans.length === 1, s"expected one lineitem scan, plan:\n$plan")
    // equivalence: the textbook correlated form must produce the same rows
    graft.Views.register(spark, sf)
    val correlated = spark.sql(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 365 DAYS
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 365 DAYS)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin).collect()
    assert(rows.map(_.toString).toSeq === correlated.map(_.toString).toSeq)
  }

  test("Q22: threshold filter keeps only above-average balances") {
    // sf0.01: the smallest corpus where some customer both clears the
    // average-balance threshold and placed no 1998 order
    val rows = Tpch.qTpchQ22(spark, sf01).collect()
    assert(rows.nonEmpty)
    val avg = Tables.customer(spark, sf01).filter(col("c_acctbal") > 0.0)
      .select(org.apache.spark.sql.functions.avg(col("c_acctbal").cast("decimal(18,2)")))
      .collect().head.getDecimal(0).doubleValue()
    rows.foreach { r =>
      // every contributing customer's balance exceeds the global average,
      // so each group's mean must too
      assert(r.getAs[Double]("totacctbal") / r.getAs[Long]("numcust") > avg)
    }
  }

  test("Q7: only the two requested nations appear, in both directions") {
    // sf0.01: the smallest corpus where both directions of the nation
    // pair ship lineitems inside the date window
    val rows = Tpch.qTpchQ7(spark, sf01).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))).toSet
    assert(pairs.subsetOf(Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))))
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
    assert(rows.forall(r => Set(1996L, 1997L).contains(r.getAs[Long]("l_year"))))
  }

  test("Q8: market share is a valid fraction per year") {
    val rows = Tpch.qTpchQ8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("Q10: top-20 returned-revenue customers, strictly rank-ordered") {
    val rows = Tpch.qTpchQ10(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(revs.forall(_ > 0))
  }

  test("Q14: promo share is a percentage and counts every joined row") {
    val row = Tpch.qTpchQ14(spark, sf).collect().head
    val p = row.getAs[Double]("promo_revenue")
    assert(p >= 0.0 && p <= 100.0)
    assert(row.getAs[Long]("n") > 0)
  }

  test("Q15: every winner carries exactly the recomputed maximum revenue") {
    val rows = Tpch.qTpchQ15(spark, sf).collect()
    assert(rows.nonEmpty)
    val maxRev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
               (lit(BigDecimal("1.00")) - col("l_discount").cast("decimal(18,2)")))
             .cast("double").as("rev"))
      .agg(max("rev")).collect().head.getDouble(0)
    rows.foreach(r => assert(r.getAs[Double]("total_revenue") === maxRev))
  }

  test("partsupp: 4 distinct suppliers per part, keys in range, shuffle-free generate") {
    val df = Tpch.partsupp(spark, sf)
    val nPart = Tables.part(spark, sf).count()
    val nSupp = Tables.supplier(spark, sf).count()
    val rows = df.collect()
    assert(rows.length === nPart * 4)
    // PK uniqueness = the collision the dbgen-formula adaptation exists to
    // prevent at tiny S (S/4-multiples stay distinct for every S >= 4)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < nSupp)
      val qty = r.getInt(2); assert(qty >= 1 && qty <= 9999)
      val cost = r.getDouble(3); assert(cost >= 100.0 && cost < 1000.0)
      // bit-identity claim: the stored double IS integer-hash / 100.0 as
      // one IEEE division (what the DuckDB CTE computes too)
      val (p, sk) = (r.getLong(0), r.getLong(1))
      assert(cost === ((p * 31 + sk * 17) % 90000 + 10000).toDouble / 100.0)
      assert(r.getInt(2) === ((p * 7 + sk * 11) % 9999 + 1).toInt)
    }
    // map-side generate: part scan x broadcast 1-row count x explode — a
    // ShuffleExchange here would mean the 100 TB path materializes 4x part
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
  }

  test("Q9: profit totals match an independent DataFrame recomputation") {
    val rows = Tpch.qTpchQ9(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year")))
    assert(keys.distinct.length === keys.length)
    val total = rows.map(_.getAs[Double]("sum_profit")).sum
    val manual = Tables.lineitem(spark, sf)
      .join(Tpch.partsupp(spark, sf),
            col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
      .join(Tables.part(spark, sf).filter(col("p_name").like("%bolt%")),
            col("p_partkey") === col("l_partkey"))
      .select((col("l_extendedprice").cast("decimal(18,2)") *
                 (lit(BigDecimal("1.00")) - col("l_discount").cast("decimal(18,2)")) -
               col("ps_supplycost").cast("decimal(18,2)") *
                 col("l_quantity").cast("decimal(18,2)")).as("amount"))
      .agg(sum("amount").cast("double")).collect().head.getDouble(0)
    assert(math.abs(total - manual) < 1e-6, s"$total vs $manual")
  }

  test("Q11: every surviving partkey clears the recomputed threshold; below-threshold excluded") {
    val rows = Tpch.qTpchQ11(spark, sf01).collect()
    assert(rows.nonEmpty)
    val base = Tpch.partsupp(spark, sf01)
      .join(Tables.supplier(spark, sf01), col("s_suppkey") === col("ps_suppkey"))
      .join(Tables.nation(spark, sf01).filter(col("n_name") === "NATION_3"),
            col("n_nationkey") === col("s_nationkey"))
      .groupBy("ps_partkey")
      .agg(sum(col("ps_supplycost").cast("decimal(18,2)") *
               col("ps_availqty").cast("decimal(18,2)")).cast("double").as("v"))
    val all = base.collect().map(r => r.getAs[Long]("ps_partkey") -> r.getAs[Double]("v")).toMap
    val threshold = all.values.sum * 0.0005
    val survived = rows.map(_.getAs[Long]("ps_partkey")).toSet
    assert(survived === all.filter(_._2 > threshold).keySet)
    val vals = rows.map(_.getAs[Double]("value"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("Q20: exactly the suppliers holding excess red-part stock vs 1997 sales") {
    val rows = Tpch.qTpchQ20(spark, sf01).collect()
    assert(rows.nonEmpty)
    import spark.implicits._
    val sales = Tables.lineitem(spark, sf01)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .groupBy("l_partkey", "l_suppkey").agg(sum("l_quantity").as("qty"))
    val expected = Tpch.partsupp(spark, sf01)
      .join(Tables.part(spark, sf01).filter(col("p_name").like("red%")),
            col("p_partkey") === col("ps_partkey"))
      .join(sales, col("l_partkey") === col("ps_partkey") && col("l_suppkey") === col("ps_suppkey"))
      .filter(col("ps_availqty") > lit(0.5) * col("qty"))
      .select("ps_suppkey").distinct().as[Long].collect().toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet === expected)
  }

  test("Q6 equals the sum of per-row ext*disc over the filtered set") {
    val row = Tpch.qTpchQ6(spark, sf).collect().head
    val manual = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .select(sum(col("l_extendedprice").cast("decimal(18,2)") *
                  col("l_discount").cast("decimal(18,2)")).cast("double"))
      .collect().head.getDouble(0)
    assert(row.getAs[Double]("revenue") === manual)
    assert(row.getAs[Long]("n") > 0)
  }
}
