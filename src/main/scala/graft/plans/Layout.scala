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

  /** Z-order (Morton) key over two 16-bit grid coordinates — bit
    * interleaving as pure codegen'd integer expressions. Sorting a
    * raster/spatial table by this key makes every aligned 2^k x 2^k tile
    * a CONTIGUOUS key range, so a bbox read becomes a few range scans
    * over sorted row groups (parquet min/max skips the rest) instead of
    * g scattered row strides — the layout trick behind COG interior
    * tiling, applied to the relational form of the raster. */
  def mortonKey(bx: Column, by: Column): Column = {
    def spread(c: Column): Column = {
      var x = c.bitwiseAND(lit(0xFFFFL))
      x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
      x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
      x
    }
    spread(bx).bitwiseOR(shiftleft(spread(by), 1))
  }

  /** Write a raster-shaped table Z-ordered: repartition by range over the
    * morton key then sort within partitions — row groups end up spatially
    * clustered, so bbox predicates prune at the row-group level. */
  def writeZOrdered(df: DataFrame, path: String,
                    colX: String, colY: String, partitions: Int = 8): Unit =
    df.withColumn("z", mortonKey(col(colX), col(colY)))
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(path)

  /** Write `df` bucketed by `key` into the session catalog as `table`.
    * Sorting within buckets additionally enables merge-join without sort. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-key form: bucket (and sort) by ALL of a join's equi-keys.
    * This matters under Spark's default
    * `spark.sql.requireAllClusterKeysForCoPartition=true`: a layout
    * bucketed on a strict SUBSET of the join keys does not count as
    * co-partitioned (the planner shuffles both sides on the full key
    * set and disables the bucketed scan), so an Exchange-free probe
    * join needs the bucket key set to equal the join key set —
    * LayoutSpec proves both the win and this failure mode. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
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

  /** Small-file compaction — the operational fix for the classic
    * streaming/incremental-ingest failure mode: thousands of KB-sized
    * parquet files whose per-file open/footer cost dominates every scan.
    * Sizes the target partition count from the directory's ACTUAL bytes
    * (filesystem metadata, no data read), rewrites once, atomically
    * swaps. At 100 TB this runs per-partition-directory (per day/hour),
    * not whole-table. Returns the new file count. */
  def compact(s: SparkSession, dir: String, targetBytes: Long = 128L << 20): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val parts = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(dir + "._compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(dir + "._compact_old")
    // leftovers from a crashed prior run must not make the renames below
    // silently merge INTO an existing directory (HDFS/local rename-into
    // semantics) — fail fast if a backup exists, clear a stale tmp
    require(!fs.exists(bak),
      s"$bak exists — a prior compact crashed mid-swap; recover it manually")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    s.read.parquet(dir).repartition(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    // two renames with a checked window (not atomic — the sequence is
    // crash-RECOVERABLE, never silently wrong: each step verifies)
    require(fs.rename(path, bak), s"rename $path -> $bak failed")
    require(fs.rename(tmp, path), s"rename $tmp -> $path failed ($bak holds the data)")
    fs.delete(bak, true)
    // the rewrite invalidates any memoized reader of this path AND the
    // SQL frontend's registration memo — bound temp views froze their file
    // listings over the now-deleted originals; the next Views.register
    // must rebind, not early-return
    graft.Tables.invalidate(s, dir)
    graft.Views.invalidate(s)
    fs.listStatus(path).count(_.getPath.getName.endsWith(".parquet")).toLong
  }

  /** Repartition-by-range + sortWithinPartitions: the write layout that
    * gives downstream readers both partition pruning (on `partCol`) and
    * row-group min/max skipping (on `sortCol`) — the engine's version of
    * the reference's one-COG-per-timestep, tiled-within-file layout. */
  def timePartitionedLayout(df: DataFrame, partCol: String, sortCol: String): DataFrame =
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
}
