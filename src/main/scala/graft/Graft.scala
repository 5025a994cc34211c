package graft

import org.apache.spark.sql.SparkSession

/** Library front door. A user of the reference pipeline switches by doing:
  *
  * {{{
  * val spark = Graft.session("my-app")          // tuned session, UTC, AQE,
  *                                              // vec_dot/hamming SQL fns
  * Graft.openCorpus(spark, "/data/sf100")       // tables as temp views
  * spark.sql("SELECT ... FROM lineitem ...")    // or the operators.* API
  * }}}
  *
  * Session defaults follow the 100 TB guidance (SURVEY §4): AQE on (skew
  * splits, runtime coalescing), UTC timezone (oracle + CF-convention time
  * handling), shuffle width sized to the machine rather than the 200
  * default. On a real cluster pass the master/shuffle explicitly.
  */
object Graft {

  def session(appName: String = "graft",
              master: String = s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]",
              shufflePartitions: Int = math.min(32, Runtime.getRuntime.availableProcessors())): SparkSession = {
    val s = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")  // legacy events encodings readable from session build (no loader conf mutation)
      .getOrCreate()
    GraftExtensions.install(s)
    plans.GroupTopK.ensureInstalled(s)
    s
  }

  /** Register the corpus tables as temp views for the SQL surface. */
  def openCorpus(spark: SparkSession, dir: String): Unit =
    Views.register(spark, dir)

  /** The reference's full workflow: fort.63.nc → per-timestep COGs.
    * Returns the number of COGs written. */
  def runPipeline(spark: SparkSession, ncPath: String, outDir: String,
                  gridSize: Int = 1000): Long =
    Pipeline.run(spark, ncPath, outDir, gridSize)
}
