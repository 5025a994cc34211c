package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The fence-discipline gates (r10 verdict #2 / r11 verdict #1):
  *
  *  1. GREP GATE — `graft.Fence` is the engine's ONLY spelling of a raw
  *     `.localCheckpoint()`. Every other main-source call site goes
  *     through `Fence.apply` (mode-selectable pin) or `Fence.cut`
  *     (unconditional checkpoint), so the fence A/B
  *     (`spark.graft.fence`) and the release discipline stay
  *     enforceable from one file.
  *  2. PIN LIFECYCLE — `Fence.apply` (pin mode) sets EXACTLY
  *     MEMORY_ONLY on the leaf RDD; `Fence.release` clears it; a
  *     re-read after release is row-identical (recompute through
  *     lineage — the documented determinism contract).
  *  3. RELEASE SAFETY — releasing a `local`-mode (localCheckpoint-
  *     backed) frame is a no-op: its MEMORY_AND_DISK blocks ARE the
  *     data and must never match releasePin's MEMORY_ONLY filter.
  */
class FenceGateSpec extends SparkSpec {

  test("main source has no raw .localCheckpoint() outside Fence.scala and the shim") {
    // since r15 the one real checkpoint call is the RDD-level one inside
    // GraftSqlShim.localCheckpointCapped (the stats-capped cut
    // implementation Fence.cut delegates to); graft code still has
    // exactly one sanctioned spelling — graft.Fence.cut
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root), s"run from repo root: $root")
    val allowed = Set("Fence.scala", "GraftSqlShim.scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => allowed.contains(p.getFileName.toString))
      .filter(p => new String(java.nio.file.Files.readAllBytes(p))
        .contains(".localCheckpoint("))
      .map(_.toString).toList
    assert(offenders.isEmpty,
      s"raw .localCheckpoint() call sites outside graft.Fence/shim: $offenders")
  }

  /** The pinned leaf's RDD, or None if the frame has no LogicalRDD leaf. */
  private def leafLevel(df: org.apache.spark.sql.DataFrame): Option[StorageLevel] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.getStorageLevel
    }

  test("pin lifecycle: fence sets MEMORY_ONLY, release clears it, re-read identical") {
    val base = spark.range(0, 1000).select(col("id"),
      (col("id") * 7 % 13).as("v"))
    val expected = base.collect().map(_.toSeq).toSet
    val fenced = Fence(base) // default mode = pin
    assert(leafLevel(fenced).contains(StorageLevel.MEMORY_ONLY),
      "fenced leaf must be pinned MEMORY_ONLY")
    assert(fenced.collect().map(_.toSeq).toSet == expected)
    Fence.release(fenced)
    assert(leafLevel(fenced).contains(StorageLevel.NONE),
      "released leaf must have no storage level")
    // recompute-through-lineage after release: still row-identical
    assert(fenced.collect().map(_.toSeq).toSet == expected,
      "post-release re-read must reproduce the pinned rows")
  }

  test("deep-loop rule: cut keeps RDD lineage depth CONSTANT per round, the pin does not") {
    // The r12 HyperBall finding, pinned as a falsifiable invariant: a
    // depth-proportional loop fenced with the memory PIN accumulates RDD
    // lineage (the pin does not truncate it — each round's tasks
    // serialize an ever-deeper parent chain; measured as 16 s -> 64 s
    // round walls at 10M nodes), while Fence.cut's localCheckpoint hard-
    // truncates, so lineage depth is round-count-INDEPENDENT.
    def lineageDepth(df: org.apache.spark.sql.DataFrame): Int = {
      def walk(r: org.apache.spark.rdd.RDD[_]): Int =
        1 + (if (r.dependencies.isEmpty) 0
             else r.dependencies.map(d => walk(d.rdd)).max)
      walk(df.queryExecution.toRdd)
    }
    def loop(rounds: Int, cut: Boolean): Int = {
      var r = spark.range(0, 100).select(col("id"), lit(0L).as("x"))
      (1 to rounds).foreach { i =>
        val nxt = r.groupBy(col("id") % 10).agg(sum("x").as("x"))
          .select((col("(id % 10)") + i).as("id"), col("x"))
        val prev = r
        r = if (cut) Fence.cut(nxt) else Fence(nxt)
        Fence.release(prev)
      }
      lineageDepth(r)
    }
    val cut3 = loop(3, cut = true); val cut6 = loop(6, cut = true)
    assert(cut3 === cut6,
      s"cut lineage depth must not grow with rounds: $cut3 vs $cut6")
    val pin3 = loop(3, cut = false); val pin6 = loop(6, cut = false)
    assert(pin6 > pin3,
      s"pin lineage depth is expected to grow ($pin3 -> $pin6); if this " +
        "ever stops holding, the deep-loop guidance on Fence should be revisited")
  }

  test("release is a no-op on a local-mode (checkpoint-backed) fence") {
    spark.conf.set("spark.graft.fence", "local")
    try {
      val fenced = Fence(spark.range(0, 100).toDF())
      val lvl = leafLevel(fenced)
      assert(lvl.isDefined && lvl.get != StorageLevel.NONE,
        s"localCheckpoint leaf should hold its blocks, got $lvl")
      Fence.release(fenced) // MEMORY_AND_DISK != MEMORY_ONLY -> must not drop
      assert(leafLevel(fenced) == lvl,
        "release must never unpersist a checkpoint-backed leaf")
      assert(fenced.count() == 100)
    } finally spark.conf.unset("spark.graft.fence")
  }

  test("releaseCut guard: leaf releases, unfenced derived no-ops, fenced derived THROWS") {
    // r15 advice: releaseCut walked the WHOLE analyzed plan, so calling
    // it on a frame merely DERIVED from a cut silently dropped leaves
    // shared with live siblings — an unrecoverable failure far from the
    // cause. The guard turns that misuse into a loud error at the site.
    val base = Fence.cut(spark.range(0, 100).toDF())
    val lvl = leafLevel(base)
    assert(lvl.isDefined && lvl.get != StorageLevel.NONE)

    // (1) derived frame still holding the fenced leaf: must THROW, and
    // must NOT have dropped the blocks (the sibling stays readable)
    val derived = base.filter(col("id") % 2 === 0)
    val ex = intercept[IllegalArgumentException](Fence.releaseCut(derived))
    assert(ex.getMessage.contains("own-cut-first"))
    assert(leafLevel(base) == lvl, "a refused release must not touch the blocks")
    assert(base.count() == 100)

    // (2) never-fenced derived frame: unconditional-release convenience
    Fence.releaseCut(spark.range(0, 10).toDF().filter(col("id") > 3)) // no-op, no throw

    // (3) the leaf itself: destructive release drops the blocks
    Fence.releaseCut(base)
    assert(leafLevel(base).contains(StorageLevel.NONE) || leafLevel(base).isEmpty,
      s"releaseCut on the leaf must drop its blocks, got ${leafLevel(base)}")
  }
}
