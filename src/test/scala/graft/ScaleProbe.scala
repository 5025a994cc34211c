package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: linearity probe for the substring-window dedup at synthetic
  * corpus multiples — the SCALE.md evidence that the (doc_id, hash)
  * shuffle scales linearly in windows, not quadratically in docs.
  * Usage: ScaleProbe <sfDir> [multiples...] (default 1 4 16). Each
  * multiple M unions the documents table M times with disjoint doc_id
  * ranges (cross-copy duplicates INCLUDED — every window is duplicated
  * at M >= 2, the worst case for the counting join). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")  // legacy events encodings readable from session build (no loader conf mutation)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val multiples = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16)

    val base = Tables.documents(spark, sf).select("doc_id", "text")
    val n = base.count()
    multiples.foreach { m =>
      val corpus = (0 until m).map(i =>
        base.select((col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"), col("text")))
        .reduce(_ union _)
      def wins = corpus
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .where(size(col("tk")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(tk) - 7), i -> substring(md5(array_join(slice(tk, i, 8), ' ')), 1, 16))"))
          .as("h"))
      def runWindow(): (Double, Long) = {
        val t0 = System.nanoTime()
        val dup = wins
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_win"),
               sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup"))
          .where(col("n_dup") > 0)
          .count()
        ((System.nanoTime() - t0) / 1e9, dup)
      }
      def runJoin(): (Double, Long) = {
        val t0 = System.nanoTime()
        val w = wins
        val freq = w.groupBy("h").agg(count(lit(1)).as("cnt"))
        val dup = w.join(freq, "h")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_win"),
               sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup"))
          .where(col("n_dup") > 0)
          .count()
        ((System.nanoTime() - t0) / 1e9, dup)
      }
      runJoin(); val (tj, dj) = runJoin()
      runWindow(); val (tw, dw) = runWindow()
      require(dj == dw, s"forms disagree: $dj vs $dw")
      println(f"SCALEPROBE multiple=$m docs=${n * m}%d dup_docs=$dw window=$tw%.2f s join=$tj%.2f s")
    }
    spark.stop()
  }
}
