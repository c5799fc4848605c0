package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-13 plan evidence: writes `.explain("formatted")` for named queries
  * to `<outDir>/<query>_<suffix>.txt`, one file per query, under the SAME
  * session config the bench runs (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus, 256 KB openCostInBytes) so the dumped plan is the plan
  * the bench times. The special name `supersteps` additionally dumps the
  * iterative graph family's per-superstep plans (the faces' own final plans
  * end at a localCheckpoint scan — see [[graft.operators.GraphOps.superstepPlans]]).
  *
  *   sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> q1 q2 …"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", 262144L)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, txt: String): Unit = {
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${name}_$suffix.txt")
    }
    args.drop(3).foreach {
      case "supersteps" =>
        graft.operators.GraphOps.superstepPlans(spark, dir).foreach {
          case (name, df) =>
            dump(name, df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        }
      case name =>
        val df = graft.SparkEntry.queries(name)(spark, dir)
        dump(name, df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
