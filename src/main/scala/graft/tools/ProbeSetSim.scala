package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the exact set-similarity family (qad/qb2):
  * times the AdaptJoin ℓ=2 candidate stage and the full face SEPARATELY
  * per rep, so a rep-to-rep swing can be attributed to a stage instead of
  * guessed at. History this tool produced: GC ruled out (7.2 s of GC
  * across ~190 s of swinging reps at sf10p), then the ℓ=2 window+count
  * measurement (17.38M distinct candidates → 313k at sf10p) that replaced
  * the per-row positional filter; the residual swing tracks host
  * writeback (load ~15 from ext4 kworkers at in-VM idle), not a stage.
  *
  * `runMain graft.tools.ProbeSetSim <sfDir> [reps]`
  */
object ProbeSetSim {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup

    def time[A](what: String, r: Int)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[probe] $what rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }

    for (r <- 1 to reps) {
      // qb2's candidate stage as shipped (AdaptJoin l=2 window + count)
      val threshold = 0.8
      val tf = threshold - 1e-6
      val m = ceil(col("p.la") * lit(tf))
      val cand = Dedup.prefixAtExt(spark, dir, threshold, 2).as("p")
        .join(Dedup.prefixToks(spark, dir).as("i"),
          col("p.h") === col("i.h") && col("p.cid") =!= col("i.cid") &&
          col("i.lb") >= m &&
          col("i.pb") <= col("i.lb") - m + lit(1))
        .groupBy(col("p.cid").as("ca"), col("i.cid").as("cb"), col("p.la"))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= least(lit(2), ceil(col("la") * lit(tf))))
      val nCand = time("qb2_cand_l2", r)(cand.count())
      val nFull = time("qb2_full", r)(
        Dedup.containmentJoin(spark, dir).count())
      println(s"[probe] counts rep$r candidates=$nCand out=$nFull")
    }
    spark.stop()
  }
}
