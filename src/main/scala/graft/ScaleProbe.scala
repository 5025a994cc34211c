package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run the interpolation pipeline at an arbitrary scale and print
  * wall-clock — evidence for SCALE.md's bucket-join claims.
  * Usage: tools/run_verify.sh <k> <g,t> graft.ScaleProbe  (e.g. 600 2000,4) */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args(0).toInt
    val Array(g, t) = args(1).split(",").map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tris = 2L * (k - 1) * (k - 1)
    val cells = g.toLong * g
    val t0 = System.nanoTime()
    val n = operators.Interp.interpolate(spark, k, g, t).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"interp k=$k g=$g t=$t: $tris%,d triangles x $cells%,d cells x $t ts -> $n%,d rows in $secs%.1f s (naive pairs: ${tris * cells}%,d)")
    spark.stop()
  }
}
