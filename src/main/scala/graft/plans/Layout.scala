package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for 100 TB operation (SURVEY §4):
  * bucketing for shuffle-free co-located joins, and key salting for skew.
  *
  * The reference hand-tunes its layout with magic chunk sizes
  * (run/adcircTime2cogs.py:39,166-168,175); the engine's equivalents are
  * declarative: bucket the two fact tables on the join key once at write
  * time, and every subsequent equi-join on that key is planned WITHOUT an
  * Exchange on either side (verified by LayoutSpec against the physical
  * plan). At 100 TB a lineitem⋈orders shuffle is the single biggest cost
  * in the plan — bucketing removes it permanently for the price of one
  * sorted write.
  */
object Layout {

  /** Write `df` bucketed by `key` into the session catalog as `table`.
    * Sorting within buckets additionally enables merge-join without sort. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for skewed keys (SURVEY §4 "AQE skew handling" manual
    * form): the large side gets a random salt in [0, salts); the small side
    * is EXPLODED `salts`× so every (key, salt) pair exists. The join key
    * becomes (key, salt) — a single hot key now spreads over `salts`
    * reducers. Result is row-identical to the unsalted join (verified in
    * LayoutSpec). Use when one key holds >~1 partition's worth of rows and
    * AQE's skew split can't help (e.g. aggregation follows). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt", (rand(42) * salts).cast("int"))
    val saltedSmall = small.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Repartition-by-range + sortWithinPartitions: the write layout that
    * gives downstream readers both partition pruning (on `partCol`) and
    * row-group min/max skipping (on `sortCol`) — the engine's version of
    * the reference's one-COG-per-timestep, tiled-within-file layout. */
  def timePartitionedLayout(df: DataFrame, partCol: String, sortCol: String): DataFrame =
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
}
