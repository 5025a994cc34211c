package graft

import org.apache.spark.sql.DataFrame

/** The engine's multi-consumer lineage fence (SURVEY §7: exchange reuse
  * dedupes shuffles, not per-row compute — a relation with 2+ consumers
  * must be materialized once or Catalyst replans its subtree per
  * consumer).
  *
  * Two implementations, selectable per session via `spark.graft.fence`:
  *  - `pin` (DEFAULT, r10): [[org.apache.spark.sql.GraftSqlShim
  *    .pinMemory]] — MEMORY_ONLY materialization + a LogicalRDD leaf.
  *    Chosen because localCheckpoint's forced MEMORY_AND_DISK level pays
  *    an eager local-disk write whose cost swings with box state (the r9
  *    driver bench recorded q_curate_dsir at 0.80 s and 5.84 s across
  *    runs of the same binary; ScaleProbe `fencevar` measures the 5-run
  *    spread of both modes — SCALE.md records the result).
  *  - `local`: plain `localCheckpoint()` — kept selectable so the A/B
  *    stays runnable forever.
  * Both truncate Catalyst lineage to a leaf, so iterative callers
  * (label propagation, k-means) keep O(1) plan depth per round either
  * way. */
object Fence {
  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.fence") match {
      case Some("local") => df.localCheckpoint()
      case _             => org.apache.spark.sql.GraftSqlShim.pinMemory(df)
    }
}
