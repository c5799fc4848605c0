package graft.tools

import org.apache.spark.sql.SparkSession

/** Gate-scale evidence for the q9n (HITS) half-step exchange pattern.
  *
  * The superstep plans in PLANS_r11 are STATIC explains at sf0.01 — they
  * show AdaptiveSparkPlan's initial SMJ shape, and the claim "AQE
  * broadcasts the rank-vector side at gate scale" stayed prose. This tool
  * EXECUTES one auth and one hub half-step on a real gate-scale fixture
  * (run it against an sf1+/sf100-grade dir) and prints the FINAL adaptive
  * plan (isFinalPlan=true), so the exchange pattern the 50-of-80-seconds
  * transpose attribution rests on is committed plan evidence: what the
  * incidence side does (reused cached partitioning vs exchange), what the
  * rank side does (BroadcastExchange vs shuffle), and where the
  * partial→final aggregate exchanges sit.
  *
  * Run: sbt "runMain graft.tools.GatePlanHits <sfDir>"
  */
object GatePlanHits {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.GraphOps.superstepPlans(spark, dir)
      .filter(_._1.startsWith("q9n_hits"))
      .foreach { case (name, df) =>
        val t0 = System.nanoTime()
        val n = df.count() // executes => AQE finalizes every stage
        val secs = (System.nanoTime() - t0) / 1e9
        println(s"\n===== $name @ $dir (EXECUTED: $n rows, " +
          f"$secs%.1f s) — final adaptive plan =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    spark.stop()
  }
}
