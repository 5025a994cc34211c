package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.plans.Layout

/** Plan-level assertions for the 100 TB layout strategies: bucketed joins
  * must plan with zero shuffles; salted joins must be row-identical to the
  * plain join. */
class LayoutSpec extends SparkSpec {

  private def countShuffles(plan: SparkPlan): Int = {
    val inner = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    inner.collectWithSubqueries { case _: ShuffleExchangeExec => 1 }.sum
  }

  test("bucketed fact-fact join plans with NO shuffle exchange") {
    // the catalog is in-memory per JVM: drop leftovers from previous runs
    for (t <- Seq("li_b", "or_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Layout.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "li_b", "l_orderkey", 8)
    Layout.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "or_b", "o_orderkey", 8)
    val joined = spark.table("li_b")
      .join(spark.table("or_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(sum("l_quantity"), max("o_totalprice"))
    joined.collect() // materialize so AQE finalizes the plan
    val shuffles = countShuffles(joined.queryExecution.executedPlan)
    assert(shuffles === 0,
      s"bucketed join+agg should be shuffle-free, found $shuffles:\n${joined.queryExecution.executedPlan}")
  }

  test("bucketed band index: dedupIncremental probes the index Exchange-free (Dedup.scala claim)") {
    // r10 verdict #5: minhashBands' doc claims the persisted index,
    // bucketed on bh, joins every future batch Exchange-free. Prove it
    // on the EXECUTED adaptive plan: force the shuffled (non-broadcast)
    // join form, then assert the index side of the probe join has no
    // ShuffleExchange between the bucketed scan and the join.
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    spark.sql("DROP TABLE IF EXISTS band_idx_b")
    val dir = new java.io.File("/tmp/graft_warehouse/band_idx_b")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // the FULL probe key (b, bh): under the default
    // requireAllClusterKeysForCoPartition, bucketing on bh alone is
    // NOT co-partitioning for the (b, bh) join — the planner shuffles
    // both sides and disables the bucketed scan (verified: that layout
    // plans "Bucketed: false (disabled by query planner)" + Exchange)
    Layout.writeBucketed(
      Dedup.minhashBands(docs.filter(col("doc_id") % 5 =!= 0)),
      "band_idx_b", Seq("b", "bh"), 8)
    val batch = Dedup.minhashBands(docs.filter(col("doc_id") % 5 === 0))
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hits = Dedup.dedupIncremental(spark.table("band_idx_b"), batch)
      val nodes = PlanWalk.executeAndFlatten(hits)
      def scansOf(p: SparkPlan): Seq[FileSourceScanExec] =
        PlanWalk.flatten(p).collect { case f: FileSourceScanExec => f }
      def readsIndex(p: SparkPlan): Boolean = scansOf(p).exists(
        _.relation.location.rootPaths.exists(_.toString.contains("band_idx_b")))
      val probe = nodes.collect {
        case j: SortMergeJoinExec if readsIndex(j.left) || readsIndex(j.right) => j
        case j: ShuffledHashJoinExec if readsIndex(j.left) || readsIndex(j.right) => j
      }
      assert(probe.nonEmpty,
        s"expected a shuffled equi-join over the bucketed index, plan:\n${nodes.head}")
      probe.foreach { j =>
        val side = if (readsIndex(j.children.head)) j.children.head else j.children(1)
        val shuffles = PlanWalk.flatten(side).count(_.isInstanceOf[ShuffleExchangeExec])
        assert(shuffles === 0,
          s"index side of the probe join must be Exchange-free, found $shuffles:\n$side")
        assert(scansOf(side).exists(_.bucketedScan),
          s"index side must read through the bucketed scan:\n$side")
      }
      assert(hits.count() > 0, "fixture must produce duplicate hits")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("the same join unbucketed DOES shuffle (the cost bucketing removes)") {
    val joined = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
              .repartition(64), // defeat the broadcast threshold at toy scale
            col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() > 0)
  }

  test("bucketed interp layout: series join is Exchange-free at the 79k-triangle production shape") {
    // r7 verdict #3: SURVEY §4 prescribes bucketing cell_map corners and
    // series by node_id for an Exchange-free barycentric series join;
    // LayoutSpec proved the pattern generically but never on the interp
    // relations. k=200/g=500: 79,202 triangles, 250k cells, 750k corner
    // rows — the production mesh magnitude of the scale test.
    import graft.operators.Interp
    val k = 200; val g = 500; val t = 2
    for (tb <- Seq("interp_corners_b", "interp_series_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      val dir = new java.io.File(s"/tmp/graft_warehouse/$tb")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    // materialize both relations as plain parquet ONCE (cellMap is the
    // expensive part); bucket from the parquet so the comparison below
    // isolates the join Exchange, not recomputation
    val base = java.nio.file.Files.createTempDirectory("graft_interp_layout").toString
    Interp.cornersOf(Interp.cellMap(spark, k, g))
      .write.mode("overwrite").parquet(s"$base/corners")
    Interp.series(spark, k, t).write.mode("overwrite").parquet(s"$base/series")
    Layout.writeBucketed(spark.read.parquet(s"$base/corners"), "interp_corners_b", "node_id", 8)
    Layout.writeBucketed(spark.read.parquet(s"$base/series"), "interp_series_b", "node_id", 8)
    // the downstream pivot of joinSeriesGated's scale path
    def pivot(c: org.apache.spark.sql.DataFrame, sv: org.apache.spark.sql.DataFrame) =
      c.join(sv, Seq("node_id"))
        .groupBy(col("ts"), col("grow"), col("gcol"))
        .agg(max(when(col("corner") === 1, col("w") * col("value"))).as("wv1"),
             max(when(col("corner") === 2, col("w") * col("value"))).as("wv2"),
             max(when(col("corner") === 3, col("w") * col("value"))).as("wv3"))
    // production planning: nothing fits broadcast at 3e7 series rows, so
    // disable it here — the comparison is shuffled-join vs bucket-join
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // pure join on the bucket key: ZERO shuffles end to end
      val keyAgg = spark.table("interp_corners_b")
        .join(spark.table("interp_series_b"), Seq("node_id"))
        .groupBy("node_id").agg(count(lit(1)).as("n"))
      keyAgg.collect()
      assert(countShuffles(keyAgg.queryExecution.executedPlan) === 0,
        s"bucketed corners⋈series must be Exchange-free:\n${keyAgg.queryExecution.executedPlan}")
      // full scale-path pivot: the ONLY exchange left is the (ts,grow,gcol)
      // re-key the algorithm genuinely needs — the join itself is free
      val t0 = System.nanoTime()
      val shuffled = pivot(spark.read.parquet(s"$base/corners"),
                           spark.read.parquet(s"$base/series"))
      val n1 = shuffled.count()
      val secsShuffled = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val bucketed = pivot(spark.table("interp_corners_b"), spark.table("interp_series_b"))
      val n2 = bucketed.count()
      val secsBucketed = (System.nanoTime() - t1) / 1e9
      assert(n1 === t.toLong * g * g)
      assert(n2 === n1, "bucketing must never change results")
      val sShuf = countShuffles(shuffled.queryExecution.executedPlan)
      val sBuck = countShuffles(bucketed.queryExecution.executedPlan)
      assert(sBuck === 1, s"bucketed pivot should keep only the agg exchange, found $sBuck")
      assert(sShuf > sBuck, s"unbucketed pivot should shuffle the join sides (found $sShuf vs $sBuck)")
      info(f"pivot at 79k triangles: unbucketed $secsShuffled%.1fs ($sShuf shuffles) vs bucketed $secsBucketed%.1fs ($sBuck shuffle)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("salted join is row-identical to the plain join") {
    val large = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val small = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = large.join(small, Seq("l_orderkey"))
      .orderBy("l_orderkey", "l_partkey", "o_totalprice").collect()
    val salted = Layout.saltedJoin(large, small, "l_orderkey", salts = 4)
      .orderBy("l_orderkey", "l_partkey", "o_totalprice").collect()
    assert(salted.length === plain.length)
    assert(salted.map(_.toString).toSeq === plain.map(_.toString).toSeq)
  }

  test("runtime bloom-filter pruning injects into the big side of a shuffle join") {
    // The 100 TB join-pruning mechanism: a selective filter on one join
    // side makes Catalyst inject might_contain(bloom(keys)) into the OTHER
    // side's scan, so the big table drops non-matching rows before the
    // shuffle. Tiny corpora fail the size heuristics, so lower them (and
    // disable broadcast — runtime filters only apply to shuffle joins);
    // at production scale the defaults trigger on their own.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // one builder for both sides of the with/without comparison — the
      // transparency check is only valid on the identical query
      def mkJoin() = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        .join(Tables.orders(spark, sf)
                .filter(col("o_orderpriority") === "1-URGENT")
                .select("o_orderkey", "o_totalprice"),
              col("l_orderkey") === col("o_orderkey"))
      val joined = mkJoin()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom filter on the lineitem side:\n$optimized")
      // and the filter is transparent: row set identical with it disabled
      val withFilter = joined.count()
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(withFilter === mkJoin().count())
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("dynamic partition pruning: a dim-side filter prunes the fact's date partitions at runtime") {
    // The 100 TB date-partition mechanism: fact partitioned by day on
    // disk, dim filtered at runtime — Catalyst injects a dynamic pruning
    // subquery into the fact scan's PartitionFilters, so only the dim's
    // surviving days are ever listed/read. This is what makes
    // "join the last forecast cycle against a year of history" read one
    // day, not the year.
    val out = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(s"$out/fact")
    // partition-column type inference reads the yyyy-MM-dd strings back
    // as DATE — keep the whole test in dates so the join key types match
    val fact = spark.read.parquet(s"$out/fact")
    val someDay = fact.select(col("day").cast("string")).orderBy("day").limit(1)
      .collect().head.getString(0)
    spark.createDataFrame(Seq(
        (java.sql.Date.valueOf(someDay), "keep"),
        (java.sql.Date.valueOf("1900-01-01"), "drop")))
      .toDF("day", "tag").write.mode("overwrite").parquet(s"$out/dim")
    val dim = spark.read.parquet(s"$out/dim").filter(col("tag") === "keep")
    val joined = fact.join(dim, "day").groupBy("day").agg(count(lit(1)).as("n"))
    val rows = joined.collect()
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"fact scan should carry a dynamic pruning subquery on day:\n$planStr")
    // pruning is transparent: same rows as the static filter
    assert(rows.map(_.getAs[Long]("n")).sum ===
      fact.filter(col("day") === someDay).count())
  }

  test("compaction rewrites a many-small-files dir into size-targeted files, row-identical") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val dir = s"$base/t.parquet"
    // 64 tiny files — the streaming-sink debris shape
    Tables.orders(spark, sf).repartition(64).write.parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before === 64)
    // memoize a reader of this path BEFORE compacting — the in-place
    // rewrite must invalidate it (a frozen file listing would throw
    // FileNotFound on the deleted originals)
    val n0 = Tables.table(spark, base, "t").count()
    val sum0 = Tables.table(spark, base, "t")
      .agg(sum(col("o_orderkey"))).collect().head.getLong(0)
    val after = Layout.compact(spark, dir, targetBytes = 512L << 10)
    assert(after < before, s"$after files after compacting $before")
    // rewrite is transparent AND the memoized reader was refreshed
    assert(Tables.table(spark, base, "t").count() === n0)
    assert(Tables.table(spark, base, "t")
      .agg(sum(col("o_orderkey"))).collect().head.getLong(0) === sum0)
  }

  test("SQL views survive in-place compaction (Views memo invalidated with the reader memo)") {
    // r7 advice (medium): compact() invalidated the Tables reader memo but
    // not Views — the registration memo turned the defensive re-register
    // into a no-op, leaving temp views with frozen listings over deleted
    // pre-compaction files (FileNotFoundException on the SQL frontend).
    val base = java.nio.file.Files.createTempDirectory("graft_compact_views").toString
    // clone the smallest corpus so Views.register finds every table
    new java.io.File(sf).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(base, f.getName))
    }
    Views.register(spark, base)
    val n0 = spark.sql("SELECT count(*) AS n FROM documents").collect().head.getLong(0)
    assert(n0 > 0)
    Layout.compact(spark, s"$base/documents.parquet", targetBytes = 256L << 10)
    // every SQL-frontend query re-registers defensively; post-compaction
    // that call must REBIND (memo invalidated), not early-return
    Views.register(spark, base)
    assert(spark.sql("SELECT count(*) AS n FROM documents").collect().head.getLong(0) === n0)
  }

  test("time-partitioned layout: one output partition per time key") {
    val df = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val laid = Layout.timePartitionedLayout(df, "day", "event_id")
    val nDays = df.select("day").distinct().count()
    val nonEmpty = laid.rdd.mapPartitions(it => Iterator(it.nonEmpty)).collect().count(identity)
    assert(nonEmpty <= nDays, "each day's rows should co-locate into one partition")
  }

  test("morton key: bijective on the grid, aligned tiles are contiguous ranges") {
    import graft.plans.Layout
    val g = 64
    val cells = spark.range(0, g.toLong * g).toDF("id")
      .select((org.apache.spark.sql.functions.col("id") % g).as("bx"),
              org.apache.spark.sql.functions.expr(s"id DIV $g").as("by"))
      .withColumn("z", Layout.mortonKey(
        org.apache.spark.sql.functions.col("bx"),
        org.apache.spark.sql.functions.col("by")))
      .collect().map(r => (r.getAs[Long]("bx"), r.getAs[Long]("by"), r.getAs[Long]("z")))
    // bijective: g*g distinct keys
    assert(cells.map(_._3).distinct.length === g * g)
    // every aligned 16x16 tile occupies one contiguous z range
    def zOf(x: Long, y: Long) = cells.find(c => c._1 == x && c._2 == y).get._3
    for (tx <- Seq(0L, 16L, 48L); ty <- Seq(0L, 32L)) {
      val inTile = cells.filter(c =>
        c._1 >= tx && c._1 < tx + 16 && c._2 >= ty && c._2 < ty + 16)
      val lo = zOf(tx, ty); val hi = zOf(tx + 15, ty + 15)
      assert(inTile.forall(c => c._3 >= lo && c._3 <= hi))
      // nothing OUTSIDE the tile falls inside its z range
      assert(cells.count(c => c._3 >= lo && c._3 <= hi) === 256,
             s"tile ($tx,$ty) z-range must contain exactly its 256 cells")
    }
  }

  test("z-ordered write clusters a bbox query into few row-group files") {
    import graft.plans.Layout
    import org.apache.spark.sql.functions._
    val g = 64
    val raster = spark.range(0, g.toLong * g).toDF("id")
      .select((col("id") % g).as("bx"), expr(s"id DIV $g").as("by"),
              (col("id") * 2).as("value"))
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.writeZOrdered(raster, s"$out/z", "bx", "by", partitions = 8)
    val back = spark.read.parquet(s"$out/z")
      .filter(col("bx") >= 16 && col("bx") < 32 && col("by") >= 16 && col("by") < 32)
    assert(back.count() === 256)
    // spatial clustering: the 256 bbox rows came from at most 2 of the 8
    // range partitions (files), not scattered across all of them
    val files = back.select(org.apache.spark.sql.functions
      .input_file_name().as("f")).distinct().count()
    assert(files <= 2, s"bbox rows scattered over $files files")
  }

  test("AQE splits a skewed join partition (the automatic half of skew handling)") {
    import org.apache.spark.sql.functions._
    // fresh session state: aggressive skew thresholds so a test-sized skew
    // triggers the optimizer (defaults are tuned for 256MB partitions)
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 90% of left rows share ONE key; right side is uniform
      val left = spark.range(0, 200000).toDF("id")
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
                col("id").as("payload"))
      val right = spark.range(0, 100).toDF("k").withColumn("tag", col("k") * 2)
      val joined = left.join(right, "k")
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
             s"AQE should mark the skewed join side:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v match { case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k) }
    }
  }

  test("fanout width is conf-derived (spark.graft.fanout.partitions), not a literal 32 cap") {
    // round-13 verdict: `repartition(32, key)` on the text/ANN/streaming hot
    // paths caps every downstream stage at 32 tasks on ANY cluster. The
    // width now follows the session: default = shuffle partitions, explicit
    // override via spark.graft.fanout.partitions — and the executed plan's
    // exchange obeys it (set 7, observe 7). Results must not move: the
    // partition count is a pure parallelism dial under the integer/fixed-
    // point discipline.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dflt = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(Fanout.partitions(docs) === dflt)
    assert(Fanout.byKey(docs, col("doc_id")).rdd.getNumPartitions === dflt)
    val base = operators.TextOps.qTextTfidf(spark, sf).collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.fanout.partitions", "7")
    try {
      assert(Fanout.byKey(docs, col("doc_id")).rdd.getNumPartitions === 7)
      val q = operators.TextOps.qTextTfidf(spark, sf) // hot path: fanout feeds the token explode
      assert(q.collect().map(_.toString).toSeq === base)
      // AQE materializes exchanges inside QueryStageExec LEAVES — a plain
      // collect stops at the stage boundary, so walk into each stage's plan
      def widthsOf(p: SparkPlan): Seq[Int] = p.collect {
        case e: ShuffleExchangeExec => Seq(e.outputPartitioning.numPartitions)
        case st: org.apache.spark.sql.execution.adaptive.QueryStageExec => widthsOf(st.plan)
        case a: AdaptiveSparkPlanExec => widthsOf(a.executedPlan)
      }.flatten
      val widths = widthsOf(q.queryExecution.executedPlan)
      assert(widths.contains(7), s"expected a 7-wide fanout exchange, saw widths: $widths")
    } finally spark.conf.unset("spark.graft.fanout.partitions")
  }

  test("fanout conf parsing is defensive: junk overrides fail by key name, 'auto' falls back") {
    // r14 advice: a junk/<=0 override used to surface as a bare
    // NumberFormatException deep inside planning on every hot path
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    for (bad <- Seq("auto", "0", "-3", "")) {
      spark.conf.set("spark.graft.fanout.partitions", bad)
      try {
        val ex = intercept[IllegalArgumentException](Fanout.partitions(docs))
        assert(ex.getMessage.contains("spark.graft.fanout.partitions"),
          s"error must name the key for '$bad': ${ex.getMessage}")
      } finally spark.conf.unset("spark.graft.fanout.partitions")
    }
    // the shuffle-partitions "auto" fallback (some vendor platforms) is
    // unreachable on stock Spark — conf.set validates the int type at
    // write time (SparkIllegalArgumentException), so the branch stays as
    // defensive armor for platforms whose defaults bypass validation;
    // pin here that stock Spark can't even plant the value
    val planted = intercept[Exception](
      spark.conf.set("spark.sql.shuffle.partitions", "auto"))
    assert(planted.getMessage.contains("spark.sql.shuffle.partitions"))
  }

  test("persisted graph index: query-time walk never exchanges the edge relation") {
    // r14 verdict #1: graphSearch used to rebuild the undirected relation
    // (2|E|-row distinct) and the hub set (full-graph degree agg) per
    // call. With the index persisted, the walk's edge join must stream
    // the edges scan into a broadcast hash join (frontier = build side)
    // with NO ShuffleExchange between the scan and the join — only the
    // query-sized join OUTPUT may shuffle (the candidate distinct).
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import graft.functions.VectorMath.vecDot
    import java.nio.file.Files

    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(vecDot(col("v"), col("v"))))
    val idx = Files.createTempDirectory("graft_gidx_spec").toString
    operators.Similarity.buildGraphIndex(e, idx, kRand = 4, kBuild = 8,
      rounds = 1, sigBits = 8, nEntries = 4, corpusMin = 5L)
    val (gu, hubs, buckets) = operators.Similarity.loadGraphIndex(spark, idx)
    assert(hubs.count() === 4L && buckets.count() === e.count())

    // the production round expression over the PERSISTED edges
    val frontier = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("vec_id").as("cid"))
      .localCheckpoint()
    val cand = operators.Similarity.walkCandidates(gu, frontier, corpusMin = 5L)
    cand.collect()

    // every root->edges-scan path must cross a BroadcastHashJoin, with
    // neither a ShuffleExchange nor a BroadcastExchange between the join
    // and the scan (the latter would mean the EDGES were the broadcast
    // side — a 2|E| driver ship)
    def paths(p: SparkPlan, acc: List[SparkPlan]): Seq[List[SparkPlan]] = p match {
      case a: AdaptiveSparkPlanExec => paths(a.executedPlan, acc)
      case st: QueryStageExec => paths(st.plan, st :: acc)
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("edges")) =>
        Seq((f :: acc).reverse)
      case other => other.children.flatMap(c => paths(c, other :: acc))
    }
    val scanPaths = paths(cand.queryExecution.executedPlan, Nil)
    assert(scanPaths.nonEmpty, "expected the walk plan to scan the persisted edges")
    scanPaths.foreach { path =>
      val joinAt = path.lastIndexWhere(_.isInstanceOf[BroadcastHashJoinExec])
      assert(joinAt >= 0,
        s"edge scan must feed a broadcast hash join:\n${path.map(_.nodeName).mkString(" -> ")}")
      val below = path.drop(joinAt + 1)
      assert(!below.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"no exchange may sit between the edges scan and its join:\n${path.map(_.nodeName).mkString(" -> ")}")
      assert(!below.exists(_.isInstanceOf[BroadcastExchangeExec]),
        s"the edges must be the STREAMED side, not the broadcast side:\n${path.map(_.nodeName).mkString(" -> ")}")
    }

    // and the indexed search equals the inline composition row-for-row
    // (same parameters; the oracle gates this at every SF — this is the
    // fast structural cross-check)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val viaIdx = operators.Similarity
      .graphSearchIndexed(e, idx, q, k = 5, beam = 8, rounds = 4, corpusMin = 5L)
      .orderBy("qid", "rk").collect().map(_.toString).toSeq
    val g = operators.Similarity.knnGraphEdges(e, kRand = 4, kBuild = 8, rounds = 1)
    val inline = operators.Similarity
      .graphSearch(e, g, q, k = 5, beam = 8, rounds = 4, nEntries = 4, corpusMin = 5L)
      .orderBy("qid", "rk").collect().map(_.toString).toSeq
    assert(viaIdx === inline,
      "indexed search must equal the inline composition on the same substrate")
  }

  test("no declared query plans a single-partition window over a corpus-scaled scan") {
    // r15 verdict #1 asked for the CLASS gate, not the instance fix: an
    // unpartitioned Window over a fact-table scan makes WindowExec move
    // every row to ONE task (the q_agg_histogram_eqdepth pathology —
    // measured 3.9x wall at 10x data before the distributed rank
    // rewrite). Sweep every declared query's physical plan: a WindowExec
    // with an empty partitionSpec may only sit above a BOUNDED relation —
    // one where every path from the window to a file scan crosses an
    // aggregate or a limit (generated axes, per-group model relations,
    // merge tables). Plan-only (no execution): the window's partitionSpec
    // and its subtree shape are fixed before AQE runs.
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.{FileSourceScanExec, GlobalLimitExec, RDDScanExec, TakeOrderedAndProjectExec}
    def boundedBelow(p: SparkPlan): Boolean = p match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
      case w: WindowGroupLimitExec if w.partitionSpec.nonEmpty => true
      case f: FileSourceScanExec => false
      // r17 (verdict #1): a fence leaf (LogicalRDD → "Scan ExistingRDD")
      // carries whatever the fenced relation held — for the loop-family
      // outputs that is the full corpus-scaled node set, so it is as
      // unbounded as a file scan. The old childless-leaf => bounded
      // default let the pagerank family's single-partition rank window
      // through this sweep.
      case r: RDDScanExec => false
      case leaf if leaf.children.isEmpty => true
      case other => other.children.forall(boundedBelow)
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.sparkPlan
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !boundedBelow(w.child) => w
      }
      if (bad.nonEmpty) Seq(s"$name: ${bad.head.nodeName} over unbounded scan") else Nil
    }
    assert(offenders.isEmpty,
      s"single-partition window over a corpus-scaled scan in:\n${offenders.mkString("\n")}")
  }
}
