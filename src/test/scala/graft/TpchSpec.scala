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
