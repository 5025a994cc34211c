package graft

import org.apache.spark.sql.functions._
import graft.operators.{Joins, Relational}

/** Sharp-edge semantics from the reference (SURVEY §5.2): the 1-based index
  * shift, descending raster axis, regex dispatch, NaN-vs-null masking, and
  * the as-of join ordering. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("index shift: 1-based connectivity becomes 0-based (reference -1)") {
    val out = Relational.qProjIndexShift(spark, sf).limit(5).collect()
    out.foreach(r => assert(r.getAs[Long]("n0") === r.getAs[Int]("l_linenumber") - 1))
  }

  test("mask-null: masked values are excluded from count and mean") {
    val out = Relational.qMaskNull(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_wet") <= r.getAs[Long]("n_total"))
    }
  }

  test("descending y-axis generation (raster row order)") {
    val rows = Relational.qMathGrid(spark, sf).collect()
    val ys = rows.map(_.getAs[Double]("y"))
    assert(ys.zip(ys.tail).forall { case (a, b) => a > b }, "y must strictly decrease")
    val xs = rows.map(_.getAs[Double]("x"))
    assert(xs.zip(xs.tail).forall { case (a, b) => a < b }, "x must strictly increase")
  }

  test("as-of join: signup_id is the latest signup at-or-before each purchase") {
    val events = Seq(
      (1L, 10L, "signup"), (2L, 10L, "purchase"), (3L, 10L, "signup"),
      (4L, 10L, "purchase"), (5L, 20L, "purchase")
    ).toDF("event_id", "user_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    val out = events
      .withColumn("signup_id",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .orderBy("event_id")
      .collect()
    assert(out.map(r => Option(r.getAs[Any]("signup_id"))).toSeq ===
           Seq(Some(1L), Some(3L), None))
  }

  test("semi plus anti join partitions the left side") {
    val nSemi = Joins.qJoinSemi(spark, sf).count()
    val nAnti = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
            col("c_custkey") === col("o_custkey"), "left_anti").count()
    val nAll = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(nSemi + nAnti === nAll)
  }

  test("regex dispatch filter matches only the flagged names") {
    val out = Relational.qFilterRegexMax(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[String]("p_type").matches(".*(MEDIUM|LARGE).*")))
  }

  test("approx sketches (HLL distinct, KLL quantile) land within tolerance of exact") {
    // the 5%-of-exact bound now travels IN the query output (and the
    // oracle pins it TRUE, so the driver hash checks it at sf0.01 too);
    // here: both bounds hold at sf0.001, plus ordering sanity
    val hll = graft.operators.Aggregates.qApproxDistinct(spark, sf).collect()
    assert(hll.nonEmpty)
    hll.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), s"HLL bound failed: $r")
      assert(r.getAs[Long]("exact_users") > 0)
    }
    val q = graft.operators.Aggregates.qApproxQuantile(spark, sf).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getAs[Boolean]("p50_within") && r.getAs[Boolean]("p90_within"),
        s"quantile bound failed: $r")
      assert(r.getAs[Double]("exact_p90") >= r.getAs[Double]("exact_p50"), "p90 >= p50")
    }
    // mergeable-sketch rollup: union-of-day-sketches within bound, and
    // sum-of-daily-distincts dominates the global distinct (re-visitors
    // count once globally, once per visited day in the daily sum)
    val sm = graft.operators.Aggregates.qSketchMerge(spark, sf).collect()
    assert(sm.nonEmpty)
    sm.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), s"sketch-merge bound failed: $r")
      assert(r.getAs[Long]("sum_daily_users") >= r.getAs[Long]("exact_users"))
    }
  }

  test("histogram: bins partition all rows, edges ordered, extremes in end bins") {
    val out = graft.operators.Aggregates.qAggHistogram(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(out.map(_.getAs[Long]("n")).sum === total)
    assert(out.map(_.getAs[Long]("bin")).forall(b => b >= 0 && b <= 9))
    // per-bin [min,max] ranges are disjoint and ordered by bin
    val sorted = out.sortBy(_.getAs[Long]("bin"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("max_price") <= b.getAs[Double]("min_price"))
      case _ =>
    }
    val (lo, hi) = (sorted.head.getAs[Double]("min_price"),
                    sorted.last.getAs[Double]("max_price"))
    val bounds = Tables.orders(spark, sf)
      .agg(min("o_totalprice"), max("o_totalprice")).collect().head
    assert(lo === bounds.getDouble(0) && hi === bounds.getDouble(1))
  }

  test("count-min sketch: estimates dominate truth, collisions overestimate, mass conserves") {
    val out = graft.operators.Aggregates.qSketchCountMin(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (t, e) = (r.getAs[Long]("true_n"), r.getAs[Long]("est_n"))
      assert(e >= t, s"CMS must never underestimate: ${r.getAs[String]("word")} $e < $t")
      assert(r.getAs[Long]("overest") === (if (e > t) 1L else 0L))
    }
    // width 16 < vocabulary size forces collisions on this corpus
    assert(out.exists(_.getAs[Long]("overest") === 1L), "expected at least one collision")
    // exact words whose estimate equals truth must also exist (d=4 rescues most)
    assert(out.exists(_.getAs[Long]("overest") === 0L))
    // determinism: the sketch is pure sums over md5 buckets
    assert(out.toSeq === graft.operators.Aggregates.qSketchCountMin(spark, sf).collect().toSeq)
  }

  test("fuzzy join: blocked pairs equal the same-noun subset of unblocked ground truth") {
    val out = graft.operators.Joins.qJoinFuzzy(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("dist") >= 1 && r.getAs[Long]("dist") <= 3)
      assert(r.getAs[String]("name_a") < r.getAs[String]("name_b"))
    }
    // unblocked ground truth, driver-side (64 distinct names — bounded)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sf).select("p_name").distinct()
      .collect().map(_.getString(0)).sorted
    val truth = for {
      a <- names; b <- names if a < b && lev(a, b) <= 3
    } yield (a, b, a.split(" ")(1) == b.split(" ")(1))
    val sameBlock = truth.filter(_._3).map(t => (t._1, t._2)).toSet
    val got = out.map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"))).toSet
    assert(got === sameBlock, "blocked join must find exactly the same-noun near-pairs")
    // and the blocking recall on this corpus is documented-high, not degenerate
    assert(sameBlock.size * 2 >= truth.length, s"recall ${sameBlock.size}/${truth.length}")
  }

  test("time-range window: trailing-hour peer sets match brute-force recomputation") {
    val out = graft.operators.Aggregates.qWinTimeRange(spark, sf).collect()
    assert(out.nonEmpty)
    val events = out.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("es"),
                               r.getAs[Long]("event_id")))
    out.foreach { r =>
      val (ty, es) = (r.getAs[String]("event_type"), r.getAs[Long]("es"))
      val expected = events.count(e => e._1 == ty && e._2 >= es - 3599 && e._2 <= es)
      assert(r.getAs[Long]("n_trailing_hour") === expected.toLong,
        s"event ${r.getAs[Long]("event_id")} trailing count")
    }
    // the frame is genuinely sliding: counts vary across the stream
    assert(out.map(_.getAs[Long]("n_trailing_hour")).distinct.length > 1)
  }

  test("SCD2 intervals tile each user's history; one open interval; point-in-time lookups agree") {
    val out = graft.operators.Relational.qScd2Intervals(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("valid_from"))
      // exactly one current (null valid_to), and it is the last interval
      assert(sorted.count(_.getAs[Long]("is_current") === 1L) === 1)
      assert(sorted.last.getAs[Long]("is_current") === 1L)
      // consecutive intervals abut exactly and change value
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to") === b.getAs[Long]("valid_from") - 1)
          assert(a.getAs[String]("event_type") !== b.getAs[String]("event_type"))
        case _ =>
      }
    }
    // point-in-time: every raw event falls inside an interval of its own type
    val events = Tables.events(spark, sf).filter(col("user_id") < 100)
      .select("user_id", "event_id", "event_type").collect()
    val byUser = out.groupBy(_.getAs[Long]("user_id"))
    events.foreach { e =>
      val iv = byUser(e.getAs[Long]("user_id")).find { r =>
        val from = r.getAs[Long]("valid_from")
        val to = if (r.isNullAt(r.fieldIndex("valid_to"))) Long.MaxValue
                 else r.getAs[Long]("valid_to")
        e.getAs[Long]("event_id") >= from && e.getAs[Long]("event_id") <= to
      }
      assert(iv.isDefined && iv.get.getAs[String]("event_type") === e.getAs[String]("event_type"))
    }
  }

  test("merge upsert: row count and balance mass shift exactly by the delta") {
    val out = graft.operators.Relational.qMergeUpsert(spark, sf).collect()
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long").as("cents"))
      .collect()
    val nRerated = base.count(_.getLong(0) % 10 === 0)
    assert(out.map(_.getAs[Long]("n")).sum === base.length + 5L)
    assert(out.map(_.getAs[Long]("sum_cents")).sum ===
      base.map(_.getLong(1)).sum + 10000L * nRerated)
    assert(out.map(_.getAs[Long]("max_key")).max >= 1000000L, "fresh keys inserted")
  }

  test("percentile_disc convention fixture: exact rank boundaries, independent of corpus data") {
    // r8 advice: q_approx_quantile/q_agg_percentile_exact equate Spark's
    // percentile_disc ("smallest value with cume_dist >= p") with DuckDB's
    // quantile_disc. The r8 hashes matched at all SFs, but only on the
    // corpus's data; this fixture pins the mapping at the EXACT rank
    // boundaries where conventions could diverge. DuckDB 1.0 verified by
    // hand for the same fixtures: n=10 p=0.5 -> 5 (not 6), p=0.9 -> 9;
    // n=4 p=0.25/0.5/0.75 -> 1/2/3. A failure here after a Spark upgrade
    // means the oracle convention broke, not the corpus.
    import spark.implicits._
    val ten = (1 to 10).toDF("x")
    val r10 = ten.select(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").as("p50"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY x)").as("p90")).collect().head
    assert(r10.getAs[Int]("p50") === 5, "even n at p*n integral: smallest with cume_dist >= p")
    assert(r10.getAs[Int]("p90") === 9)
    val four = (1 to 4).toDF("x")
    val r4 = four.select(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY x)").as("q1"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").as("q2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY x)").as("q3")).collect().head
    assert((r4.getAs[Int]("q1"), r4.getAs[Int]("q2"), r4.getAs[Int]("q3")) === ((1, 2, 3)))
  }

  test("anomaly screen: engine output matches a first-principles median/MAD recomputation") {
    // recompute per-type median, MAD, and outlier counts from the raw
    // events rows in plain Scala — the same independence anchor the DSIR
    // spec uses, so the operator is gated even without the DuckDB oracle
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // percentile_disc(0.5): smallest value with cume_dist >= 0.5 — index
    // ceil(n/2)-1 in a 0-based sorted array (the pinned convention)
    def disc(sorted: Array[Double]): Double = sorted((sorted.length + 1) / 2 - 1)
    val expected = raw.map { case (t, vs) =>
      val med = disc(vs)
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = disc(devs)
      val nOut = vs.count(v => math.abs(v - med) > mad * 4.4478)
      (t, (vs.length.toLong, med, mad, nOut.toLong))
    }
    val got = operators.Aggregates.qAnomalyMad(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (n, med, mad, nOut) = expected(r.getString(0))
      assert(r.getLong(1) === n, s"${r.getString(0)}: n")
      assert(r.getDouble(2) === med, s"${r.getString(0)}: median")
      assert(r.getDouble(3) === mad, s"${r.getString(0)}: MAD")
      assert(r.getLong(4) === nOut, s"${r.getString(0)}: outlier count")
      assert(r.getLong(5) === nOut * 1000000L / n, s"${r.getString(0)}: ppm")
    }
  }

  test("bloom sizing: optimal bits at small n, fpp-degrading cap at corpus scale") {
    import graft.operators.Dedup
    // optimal m = ceil(-n ln(0.01) / ln^2 2) ≈ 9.585 bits/key below the cap
    assert(Dedup.bloomBits(1000L) === math.ceil(
      -1000L * math.log(0.01) / (math.log(2.0) * math.log(2.0))).toLong)
    assert(Dedup.bloomBits(1L) === 64L, "floor for degenerate corpora")
    // the 100 MB ceiling binds above ~8.8e7 keys: bits stop growing (fpp
    // degrades instead of splitting the filter — correctness unaffected,
    // the confirm join owns exactness)
    val cap = (100L << 20) * 8L
    assert(Dedup.bloomBits(100000000L) === cap)
    assert(Dedup.bloomBits(10000000000L) === cap, "1e10 keys: still one capped filter")
    assert(Dedup.bloomBits(87000000L) < cap, "just below the binding point: optimal sizing")
  }

  test("gap-fill densifies to the full grid; interpolated values sit between their brackets") {
    val out = graft.operators.Aggregates.qTsGapfill(spark, sf01).collect()
    val types = out.map(_.getAs[String]("event_type")).distinct
    // dense: every type spans the identical full hour grid
    val hoursPerType = out.groupBy(_.getAs[String]("event_type")).values.map(_.length).toSet
    assert(hoursPerType.size === 1, s"all types must densify to one grid: $hoursPerType")
    assert(out.length === types.length * hoursPerType.head)
    val srcs = out.map(_.getAs[String]("src")).toSet
    assert(srcs.contains("actual") && srcs.contains("interp"), s"corpus has gaps: $srcs")
    out.groupBy(_.getAs[String]("event_type")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[String]("hour"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        r.getAs[String]("src") match {
          case "actual" =>
            assert(r.getAs[Double]("n_filled") === r.getAs[Long]("n_actual").toDouble)
          case "interp" =>
            assert(r.isNullAt(r.fieldIndex("n_actual")))
            // bracketing observations exist on both sides
            val prev = sorted.take(i).reverse.find(_.getAs[String]("src") == "actual")
            val next = sorted.drop(i + 1).find(_.getAs[String]("src") == "actual")
            assert(prev.isDefined && next.isDefined)
            val (lo, hi) = (prev.get.getAs[Double]("n_filled"), next.get.getAs[Double]("n_filled"))
            val v = r.getAs[Double]("n_filled")
            assert(v >= math.min(lo, hi) - 1e-9 && v <= math.max(lo, hi) + 1e-9,
              s"interpolant $v outside [$lo, $hi]")
          case "edge" =>
            assert(r.isNullAt(r.fieldIndex("n_filled")))
        }
      }
    }
  }
}
