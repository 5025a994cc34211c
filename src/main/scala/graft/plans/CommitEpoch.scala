package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}

/** Naming + sizing for the compaction commit protocol shared by
  * [[graft.operators.Dedup.compactBandIndex]] and
  * [[graft.streaming.Streams.compactEdges]] (write hidden
  * `_compact_<epoch>.tmp` inside the state dir, same-dir rename to
  * `compacted_<epoch>`, delete superseded).
  */
object CommitEpoch {

  /** Next generation name suffix: `<seq>_<nonce>`. `seq` is monotonic
    * over the generations already committed in `dir` (listing-derived,
    * so it survives restarts with no extra state file); the random
    * nonce keeps two writers that raced to the same seq from colliding
    * on the commit rename (r13 ADVICE: two `currentTimeMillis` epochs
    * in the same millisecond shared a name). The name never carries
    * meaning beyond uniqueness — readers list ALL visible dirs. */
  def next(fs: FileSystem, dir: Path): String = {
    val seq = 1L + fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("compacted_"))
      .map(_.stripPrefix("compacted_").takeWhile(_.isDigit))
      .collect { case digits if digits.nonEmpty => BigInt(digits).min(Long.MaxValue - 1).toLong }
      .foldLeft(0L)(math.max)
    s"${seq}_${java.util.UUID.randomUUID().toString.take(8)}"
  }

  /** Write width for a compacted relation, derived from the INPUT size
    * over the scan-split target (`spark.sql.files.maxPartitionBytes`):
    * the rewritten files come back at full scan parallelism instead of
    * being capped at whatever the session's shuffle width was when the
    * compaction happened to run (r13 verdict: a conf-width write bakes
    * a parallelism cap into the file layout at 100 TB). Slightly
    * overestimates (pre-distinct bytes) — harmless, the splitter
    * coalesces small files. */
  def widthFor(fs: FileSystem, inputs: Seq[Path], spark: org.apache.spark.sql.SparkSession): Int = {
    val bytes = inputs.map(p => fs.getContentSummary(p).getLength).sum
    val target = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    math.max(1L, math.min(1 << 20, (bytes + target - 1) / math.max(1L, target))).toInt
  }

  /** Test seam: invoked with `"pre-rename"` after the hidden tmp write
    * and `"post-rename"` after the commit rename but before superseded
    * deletes — lets a spec read the state dir mid-commit and prove the
    * old-or-both-or-new visibility claim. No-op in production. */
  @volatile private[graft] var midCommitHook: String => Unit = _ => ()
}
