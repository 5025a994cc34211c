package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric helpers shared by oracle-checked queries.
  *
  * Floating-point sums are order-dependent, and the DuckDB oracle sums in
  * scan order while Spark sums in partial-aggregate order. For any input
  * column that carries fixed-scale money-like values (prices, balances,
  * event values — all 2-decimal in the corpus) we sum EXACTLY in decimal
  * and convert to double at the end; both engines then produce bit-identical
  * doubles. See SURVEY.md §5.1.
  */
object Num {
  /** Exact sum of a 2-decimal-valued double column, returned as double.
    * Oracle equivalent: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  def moneySum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Deterministic mean: exact decimal sum divided by count, as double.
    * Oracle: ROUND(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x), s). */
  def moneyAvg(c: Column, scale: Int): Column =
    round(moneySum(c) / count(c), scale)
}
