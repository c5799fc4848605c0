package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time individual queries by name-prefix without running the
  * whole Bench suite. `runMain graft.TimeOne <sfDir> <prefix>[,<prefix>...]
  * [reps]` — prints per-query seconds for each rep (first rep includes
  * footer/codegen warm-up; read the later reps).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefixes = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    for (r <- 1 to reps; (name, fn) <- picked) {
      val t0 = System.nanoTime()
      val n =
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          println(f"[time] $name rep$r FAILED: ${e.getMessage}"); -1L
        }
      if (n >= 0)
        println(f"[time] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
