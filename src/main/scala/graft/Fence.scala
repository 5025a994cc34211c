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

  /** RDD-lineage CUT: a raw `localCheckpoint` for the one caller class
    * that needs the PHYSICAL lineage truncated, not just the Catalyst
    * plan — sealing the survivor of a persist-mode iterative loop
    * before its superseded round pins are unpersisted (qDedupClusters'
    * A/B branch). Everything else uses [[apply]]; FenceGateSpec greps
    * main source so this file stays the only raw `.localCheckpoint()`
    * call site in the engine (r10 verdict #2). */
  def cut(df: DataFrame): DataFrame = df.localCheckpoint()

  /** Unpersist a [[apply]]-fenced frame's pinned blocks once it is
    * SUPERSEDED — the iterative-loop discipline (r10 advice): without
    * this, round r's pin keeps rounds 1..r-1's MEMORY_ONLY blocks
    * reachable and cache usage grows per round. Caller contract:
    * release `prev` only after the superseding fence has materialized
    * (apply is eager) and `prev` will not be read again; an eviction of
    * the LIVE pin then recomputes through the released round's plan —
    * correct under [[org.apache.spark.sql.GraftSqlShim.pinMemory]]'s
    * documented determinism assumption, just slower. No-op in `local`
    * mode, where the checkpointed blocks ARE the data (lineage is
    * truncated, so dropping them would lose it). */
  def release(df: DataFrame): Unit =
    if (!df.sparkSession.conf.getOption("spark.graft.fence").contains("local"))
      org.apache.spark.sql.GraftSqlShim.releasePin(df)
}
