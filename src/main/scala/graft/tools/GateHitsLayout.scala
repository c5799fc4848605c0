package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 follow-up to [[GatePlanHits]]: the round-12 EXECUTED gate
  * plans showed each q9n half-step SortMergeJoining the 500M-row
  * incidence against a 15–20M-row rank vector — the rank side is far
  * past any broadcast threshold, so the per-half-step cost is the SMJ
  * SORT of the big side (the incidence is already hash-partitioned by
  * the cached `repartition(c)`, so there is no per-round exchange to
  * kill — only the sort). Round 11 probed BUCKETING at sf10 and lost 3×,
  * but sf10's incidence fits the sort in cheap in-memory runs; at the
  * gate fixture the sort is the dominant term and the question reopens.
  *
  * This probe times ONE auth half-step under three layouts on the same
  * fixture, same JVM:
  *   smj_baseline   — `repartition(c).cache()` (the shipped layout)
  *   smj_presorted  — `repartition(c).sortWithinPartitions(c).cache()`:
  *                    InMemoryTableScan reports the cached ordering, so
  *                    SMJ's big-side sort should plan away; the sort is
  *                    paid ONCE at build, amortized over all 20 half-steps
  *   shuffle_hash   — rank side hinted SHUFFLE_HASH: no sort on either
  *                    side; builds a ~(rank/parts)-row hash map per task
  * and prints each layout's build time, two step executions (cold/warm),
  * and the final adaptive plan's join/sort inventory.
  *
  * Run: sbt "runMain graft.tools.GateHitsLayout <sfDir> [cpus]"
  */
object GateHitsLayout {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "lz4"))
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val inc = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    // the rank vector every layout joins: materialized once up front so
    // layout timings measure the half-step, not hub0 construction
    val hub0 = inc.select(col("c")).distinct()
      .withColumn("h", lit(1.0)).localCheckpoint()
    println(s"[gate] hub0 ${hub0.count()} rows")

    def authStep(incC: DataFrame, hubSide: DataFrame): DataFrame =
      incC.join(hubSide, "c").groupBy("p").agg(sum("h").as("a"))

    def planInventory(df: DataFrame): String = {
      val s = df.queryExecution.executedPlan.toString
      Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin", "Sort ")
        .map(k => s"$k=${s.sliding(k.length).count(_ == k)}")
        .mkString(" ")
    }

    val layouts: Seq[(String, () => (DataFrame, DataFrame))] = Seq(
      "smj_baseline" -> (() => {
        val v = inc.repartition(col("c")).cache()
        (v, authStep(v, hub0))
      }),
      "smj_presorted" -> (() => {
        val v = inc.repartition(col("c")).sortWithinPartitions("c").cache()
        (v, authStep(v, hub0))
      }),
      "shuffle_hash" -> (() => {
        val v = inc.repartition(col("c")).cache()
        (v, authStep(v, hub0.hint("shuffle_hash")))
      }))

    for ((name, mk) <- layouts) {
      val t0 = System.nanoTime()
      val (cached, step) = mk()
      val n = cached.count() // materialize the layout
      val build = (System.nanoTime() - t0) / 1e9
      println(f"[gate] $name build $build%.1f s ($n incidence rows)")
      for (r <- 1 to 2) {
        val t1 = System.nanoTime()
        val m = step.count()
        val secs = (System.nanoTime() - t1) / 1e9
        println(f"[time] q9n_auth_$name rep$r $secs%.3f s ($m rows)")
      }
      println(s"[gate] $name plan: ${planInventory(step)}")
      cached.unpersist(true)
    }
    spark.stop()
  }
}
