package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan for declared queries.
  * Usage: tools/run_verify.sh <sfDir> <q1,q2,...|all> graft.Explain */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, which) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (which == "all") SparkEntry.queries.keys.toSeq.sorted
      else which.split(",").toSeq
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
