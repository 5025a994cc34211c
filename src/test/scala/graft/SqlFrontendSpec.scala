package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorMath.vecDot

/** SQL surface tests: temp-view catalog, spark.sql equivalence with the
  * DataFrame plans, the vec_dot SQL registration, and the typed Aggregator. */
class SqlFrontendSpec extends SparkSpec {

  test("spark.sql over registered views matches the DataFrame plan") {
    Views.register(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    val viaDf = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(Num.moneySum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(viaSql.nonEmpty)
    assert(viaSql.map(_.toString).toSeq === viaDf.map(_.toString).toSeq)
  }

  test("Graft facade: session + corpus + SQL in three calls") {
    val s = Graft.session("facade-test") // getOrCreate reuses the shared session
    Graft.openCorpus(s, sf)
    val n = s.sql(
      "SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .collect().head.getLong(0)
    assert(n > 0)
    assert(s.sql("SELECT vec_dot(array(1.0d), array(2.0d))").collect().head.getDouble(0) === 2.0)
    assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
  }

  test("vec_dot registered via GraftExtensions.install is usable from SQL") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r === 32.0)
    // SQL and DataFrame surfaces plan the same expression
    val viaDf = spark.range(1)
      .select(vecDot(array(lit(1.0), lit(2.0), lit(3.0)),
                     array(lit(4.0), lit(5.0), lit(6.0))).as("d"))
      .collect().head.getDouble(0)
    assert(viaDf === r)
  }

  test("VectorCentroid aggregator: exact centroid on literal vectors") {
    import spark.implicits._
    val ds = Seq(
      (1, Array(1.0, 2.0)), (1, Array(3.0, 4.0)),
      (2, Array(10.0, 0.0))
    ).toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.VectorCentroid.toColumn.name("c"))
      .collect().toMap
    assert(out(1).toSeq === Seq(2.0, 3.0))
    assert(out(2).toSeq === Seq(10.0, 0.0))
  }

  test("q_vec_centroid covers every label with full dimensionality") {
    val rows = operators.Similarity.qVecCentroid(spark, sf).collect()
    assert(rows.length === 10 * 64) // long-form: one row per (label, pos)
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    assert(byLabel.size === 10)
    assert(byLabel.values.forall(_.map(_.getAs[Int]("pos")).sorted.toSeq === (1 to 64)))
  }

  test("quantized centroid is identical at 1 and 32 partitions") {
    // the whole point of quantize-before-sum: integer-valued doubles sum
    // exactly, so partition order cannot move the result and the hash
    // oracle is sound at any parallelism
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500)(i =>
      (i % 3, Array.fill(16)(math.floor(rnd.nextDouble() * 2e4 - 1e4 + 0.5))))
    def centroid(parts: Int) =
      rows.toDS().repartition(parts)
        .groupByKey(_._1).mapValues(_._2)
        .agg(graft.functions.VectorCentroid.toColumn.name("c"))
        .collect().toMap.view.mapValues(_.toSeq).toMap
    assert(centroid(1) === centroid(32))
  }

  test("TPC-H Q5 six-table join: dims broadcast, no cartesian products") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
    val df = operators.Tpch.qTpchQ5(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty) // the oracle (sf0.01) pins the exact answer
    assert(rows.forall(_.getAs[Double]("revenue") > 0.0))
    // joins live inside materialized AQE query stages (leaf wrappers
    // collectWithSubqueries does not descend into) — flatten explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p match {
        case q: QueryStageExec => flatten(q.plan)
        case r: ReusedExchangeExec => flatten(r.child)
        case _ => p.children.toSeq.flatMap(flatten)
      })
    val all = flatten(df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    })
    val broadcasts = all.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(broadcasts >= 3,
      s"region/nation/supplier should broadcast, got $broadcasts")
    assert(!all.exists(_.isInstanceOf[CartesianProductExec]),
      "comma-join syntax must still plan as equi-joins")
  }

  test("TPC-H Q7/Q8: self-aliased and regioned dims all broadcast, one fact-fact exchange family") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.SparkPlan
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p match {
        case q: QueryStageExec => flatten(q.plan)
        case r: ReusedExchangeExec => flatten(r.child)
        case _ => p.children.toSeq.flatMap(flatten)
      })
    // Q7 joins nation TWICE (supplier's vs customer's nation) — both
    // aliases must broadcast independently; Q8 adds part + region on top.
    // The lineitem-orders(-customer) chain is the only non-broadcast join.
    // sf0.01: the smallest corpus where Q7's nation pair ships in-window
    for ((df, minBroadcasts) <- Seq((operators.Tpch.qTpchQ7(spark, sf01), 3),
                                    (operators.Tpch.qTpchQ8(spark, sf01), 4))) {
      assert(df.collect().nonEmpty)
      val all = flatten(df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      })
      val broadcasts = all.count(_.isInstanceOf[BroadcastHashJoinExec])
      assert(broadcasts >= minBroadcasts,
        s"dimension sides should broadcast, got $broadcasts")
      assert(!all.exists(_.isInstanceOf[CartesianProductExec]),
        "comma-join syntax must still plan as equi-joins")
    }
  }

  test("percentile curation: the NTILE window receives doc-level rows, never the exploded corpus") {
    // the CCNet split ranks DOCUMENTS; if the per-token explode ever
    // leaked above the doc-level aggregate, the window would shuffle the
    // whole token stream — at 100 TB the difference between a doc-count
    // window and a corpus-sized one. Assert the optimized plan orders
    // Window above the doc-level Aggregate above the Generate (explode).
    val plan = operators.TextOps.qCuratePercentile(spark, sf)
      .queryExecution.optimizedPlan.toString
    val winAt = plan.indexOf("Window [")
    val genAt = plan.indexOf("Generate explode")
    assert(winAt >= 0, s"no Window in plan:\n$plan")
    assert(genAt >= 0, s"no explode in plan:\n$plan")
    val aggBetween = plan.substring(winAt, genAt).contains("Aggregate [")
    assert(winAt < genAt && aggBetween,
      s"NTILE window is not above the doc-level aggregate:\n$plan")
  }

  test("DSIR weights: exact vs first-principles reimplementation, target skew, broadcast model join") {
    import java.security.MessageDigest
    val out = operators.TextOps.qCurateDsir(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)

    // First-principles reimplementation (pure JVM, no Spark expressions):
    // md5-hex bucket, smoothed 256-bucket LLR quantized to 1e-6 longs,
    // integer per-doc dot product — must match the engine EXACTLY.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(tok: String): String = {
      val dig = MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
      f"${dig(0) & 0xff}%02x".take(2)
    }
    val perDoc: Map[Long, (String, Map[String, Long])] = docs.map { case (id, lang, text) =>
      val cs = text.split(" ", -1).groupBy(bucket).map { case (b, ts) => b -> ts.length.toLong }
      id -> (lang, cs)
    }.toMap
    val cR = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cT = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    perDoc.foreach { case (_, (lang, cs)) =>
      cs.foreach { case (b, c) =>
        cR(b) += c; if (lang == "en") cT(b) += c
      }
    }
    val nR = cR.values.sum.toDouble; val nT = cT.values.sum.toDouble
    def llrQ(b: String): Long =
      math.floor((math.log((cT(b) + 1.0) / (nT + 256.0)) -
                  math.log((cR(b) + 1.0) / (nR + 256.0))) * 1e6 + 0.5).toLong
    val expected = perDoc.map { case (id, (lang, cs)) =>
      id -> (lang, cs.map { case (b, c) => c * llrQ(b) }.sum, cs.values.sum)
    }
    out.foreach { case (id, lang, w, n) =>
      val (eLang, eW, eN) = expected(id)
      assert(lang == eLang && w == eW && n == eN,
        s"doc $id: engine ($lang,$w,$n) != reimpl ($eLang,$eW,$eN)")
    }

    // Target skew — per TOKEN, because the raw DSIR weight is a sum over
    // tokens and so length-dominated (the toy corpus shares most of its
    // vocabulary across languages; doc length is the largest raw-weight
    // factor). English documents must carry a higher mean per-token LLR
    // than non-target ones, and the top-k selection must OVERREPRESENT
    // the target language vs its corpus share — the point of importance
    // resampling.
    val en = out.filter(_._2 == "en").map(r => r._3.toDouble / r._4)
    val other = out.filter(_._2 != "en").map(r => r._3.toDouble / r._4)
    assert(en.nonEmpty && other.nonEmpty)
    assert(en.sum / en.size > other.sum / other.size,
      s"en per-token mean ${en.sum / en.size} not above non-target ${other.sum / other.size}")
    val corpusEnShare = docs.count(_._2 == "en").toDouble / docs.length
    val selectedEnShare = out.count(_._2 == "en").toDouble / out.length
    assert(selectedEnShare > corpusEnShare,
      s"selection en share $selectedEnShare not above corpus share $corpusEnShare")

    // Plan: the 256-row model joins back by BROADCAST (never a shuffle of
    // the per-doc frame on the bucket key), and nothing plans cartesian.
    val phys = operators.TextOps.qCurateDsir(spark, sf)
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), s"model join not broadcast:\n$phys")
    assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoop"),
      s"unexpected unbounded join:\n$phys")
  }

  test("correlated EXISTS decorrelates to a semi join (no per-row subquery)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    val qe = operators.Tpch.qTpchQ4(spark, sf).queryExecution
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joins = plan.collectWithSubqueries { case j: BaseJoinExec => j }
    assert(joins.exists(_.joinType.sql == "LEFT SEMI"),
           s"EXISTS should decorrelate to LeftSemi:\n$plan")
    assert(!joins.exists(j => j.isInstanceOf[CartesianProductExec] ||
                              j.isInstanceOf[BroadcastNestedLoopJoinExec]),
           s"decorrelated plan must not nest loops:\n$plan")
  }

  test("correlated NOT EXISTS decorrelates to an anti join") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val qe = operators.Tpch.qSqlNotExists(spark, sf).queryExecution
    val plan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joins = plan.collectWithSubqueries { case j: BaseJoinExec => j }
    assert(joins.exists(_.joinType.sql == "LEFT ANTI"),
           s"NOT EXISTS should decorrelate to LeftAnti:\n$plan")
  }

  test("correlated scalar subquery (Q17) decorrelates and agrees with manual two-phase plan") {
    Views.register(spark, sf)
    val viaSubquery = operators.Tpch.qTpchQ17(spark, sf).collect()
    val avgs = Tables.lineitem(spark, sf).groupBy("l_partkey")
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg"))
    val viaManual = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#23"),
            col("l_partkey") === col("p_partkey"))
      .join(avgs, Seq("l_partkey"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg(Num.moneySum(col("l_extendedprice")).as("total_price"),
           count(lit(1)).as("n_lines")).collect()
    assert(viaSubquery.map(_.toString).toSeq === viaManual.map(_.toString).toSeq)
  }

  test("shingles generator: SQL LATERAL VIEW path matches the expression construction") {
    Views.register(spark, sf)
    GraftExtensions.install(spark)
    val viaSql = spark.sql(
      """SELECT doc_id, s.pos, s.shingle
        |FROM documents LATERAL VIEW shingles(text, 3) s
        |WHERE doc_id < 20 ORDER BY doc_id, s.pos""".stripMargin).collect()
    assert(viaSql.nonEmpty)
    // agreement with the dedup family's explode(transform(sequence)) form
    val viaExpr = Tables.documents(spark, sf).filter(col("doc_id") < 20)
      .select(col("doc_id"), expr(
        """posexplode(transform(sequence(1, size(split(text, ' ')) - 2),
          |           i -> concat_ws(' ', slice(split(text, ' '), i, 3))))""".stripMargin)
        .as(Seq("pos", "shingle")))
      .orderBy("doc_id", "pos").collect()
    assert(viaSql.map(_.toString).toSeq === viaExpr.map(_.toString).toSeq)
  }

  test("shingles generator: empty and short inputs produce no rows, null-safe") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val df = Seq((1L, "a b"), (2L, "a b c d"), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
    df.createOrReplaceTempView("short_docs")
    val out = spark.sql(
      "SELECT id, s.pos, s.shingle FROM short_docs LATERAL VIEW shingles(t, 3) s")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet ===
      Set((2L, 0, "a b c"), (2L, 1, "b c d")))
  }

  test("Views.register isolates per-table failure: broken events leaves TPC-H views usable") {
    // round-6 regression class: events' schema drifted and its eager load
    // threw inside register(), killing all 15 TPC-H queries that never
    // touch events. Build a corpus dir whose events.parquet is garbage and
    // assert the SQL frontend still serves the healthy tables.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("views-isolation")
    Views.names.foreach { n =>
      Files.copy(Paths.get(s"$sf/$n.parquet"), dir.resolve(s"$n.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    Files.write(dir.resolve("events.parquet"), "not a parquet file".getBytes)
    Views.register(spark, sf) // healthy corpus first — binds a good events view
    Views.register(spark, dir.toString) // must not throw
    val n = spark.sql(
      """SELECT n_name, COUNT(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin).count()
    assert(n > 0)
    // the failed table must NOT silently serve the previously-registered
    // corpus — its stale view is dropped, so the next use fails loudly
    val err = intercept[Exception](spark.sql("SELECT COUNT(*) FROM events").collect())
    assert(err.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
           err.getMessage.contains("events"), err.getMessage)
    // and the memo was invalidated by the partial failure: re-registering
    // the original corpus is NOT a no-op — events comes back
    Views.register(spark, sf)
    assert(spark.sql("SELECT COUNT(*) FROM events").collect().head.getLong(0) > 0)
  }

  test("WITH RECURSIVE plans as a UnionLoop, and hops are true BFS depths") {
    val df = operators.Tpch.qSqlRecursive(spark, sf)
    // the recursion must be the ITERATIVE loop operator, not an unroll
    assert(df.queryExecution.executedPlan.toString.contains("UnionLoop"),
      "recursive CTE must plan as UnionLoopExec")
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hop-0 rows are exactly seeds (sources ≡ 0 mod 100 drawn from
    // doc_id residues — a %100 node reached only as a link TARGET is
    // not a seed and correctly carries a positive hop)
    val hop0 = rows.filter(_._2 == 0L).keys
    assert(hop0.nonEmpty && hop0.forall(_ % 100 == 0))
    assert(rows.values.forall(h => h >= 0L && h <= 5L))
    // monotone reachability: hop-k nodes only exist if hop-(k-1) nodes do
    val byHop = rows.values.groupBy(identity).view.mapValues(_.size).toMap
    (1L to rows.values.max).foreach(k =>
      assert(byHop.contains(k - 1), s"hop $k present without hop ${k - 1}"))
  }

  test("IVF assignment partitions the non-codebook vectors") {
    val rows = operators.Similarity.qAnnIvf(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_assigned")).sum
    val expected = Tables.embeddings(spark, sf).filter(col("vec_id") >= 8).count()
    assert(total === expected)
    assert(rows.forall(_.getAs[Long]("centroid") < 8))
  }
}
