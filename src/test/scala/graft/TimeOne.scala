package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")  // legacy events encodings readable from session build (no loader conf mutation)
      .getOrCreate()
    
    val sf = args(0); val names = args.drop(1)
    names.foreach { n => SparkEntry.queries(n)(spark, sf).count() } // warm
    names.foreach { n =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); SparkEntry.queries(n)(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-24s ${ts.min}%.3f s")
    }
    spark.stop()
  }
}
