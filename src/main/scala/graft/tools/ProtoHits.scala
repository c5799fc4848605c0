package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the q9n (HITS) superstep-exchange question the
  * round-10 verdict asked: can bucketing the incidence + rank relations by
  * vertex delete (or shrink) the per-superstep exchange?
  *
  * What it times, at a given fixture (intended: sf10):
  *   1. the real face (GraphOps.hits), reps for a warm number;
  *   2. join-only half-step — incidence ⋈ hub, COUNT (no transpose): the
  *      irreducible matvec row-processing cost;
  *   3. full half-step — join + groupBy(p) sum (the transpose exchange on
  *      top of 2);
  *   4. a 2D-BLOCKED half-step — incidence pre-partitioned by
  *      (c mod B, p mod B), the hub vector replicated to B p-blocks and
  *      shuffled ONCE as vector-sized data, per-block partial sums, final
  *      combine over B block partials per part. Exchange volume trades the
  *      |inc|-sized transpose for B·|C| (vector replication) + B·|P|
  *      (block partials) — the classic 2D SpMV layout, which WINS only
  *      when the average degree exceeds ~B·(1 + |P|/|C|).
  *
  * Run: sbt "runMain graft.tools.ProtoHits /tmp/sf10 3 4"
  *      (fixture, reps, B)
  */
object ProtoHits {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val bB = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[proto] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }

    // the same incidence the face uses (keyed-cached in GraphOps)
    val l = graft.Tables(spark, dir, "lineitem")
    val o = graft.Tables(spark, dir, "orders")
    val inc = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct().cache()
    val nInc = inc.count()
    val nC = inc.select("c").distinct().count()
    val nP = inc.select("p").distinct().count()
    println(s"[proto] |inc|=$nInc |C|=$nC |P|=$nP avg_deg=${nInc.toDouble / nC}")

    val incC = inc.repartition(col("c")).cache()
    incC.count()
    val hub = incC.select(col("c")).distinct().withColumn("h", lit(1.0))
      .localCheckpoint()

    for (r <- 1 to reps) {
      time(s"join_only rep$r") { incC.join(hub, "c").count() }
      time(s"half_step rep$r") {
        incC.join(hub, "c").groupBy("p").agg(sum("h").as("a")).count()
      }
    }

    // 2D-blocked half-step: static side partitioned by (cb, pb) once
    val nPart = cpus.toInt
    val incB = inc
      .withColumn("cb", pmod(col("c"), lit(bB.toLong)).cast("int"))
      .withColumn("pb", pmod(col("p"), lit(bB.toLong)).cast("int"))
      .repartition(nPart, col("cb"), col("pb"))
      .cache()
    incB.count()
    val blocks = array((0 until bB).map(lit): _*)
    for (r <- 1 to reps) {
      time(s"blocked_half_step(B=$bB) rep$r") {
        val hubR = hub
          .withColumn("cb", pmod(col("c"), lit(bB.toLong)).cast("int"))
          .withColumn("pb", explode(blocks))
          .repartition(nPart, col("cb"), col("pb"))
        incB.join(hubR, Seq("cb", "pb", "c"))
          .groupBy("pb", "p").agg(sum("h").as("pa")) // block partials
          .groupBy("p").agg(sum("pa").as("a"))       // combine over cb
          .count()
      }
    }

    // NOTE: do NOT time the real face in this JVM — the experiment pins
    // three incidence-sized caches (inc, incC, incB), and the face then
    // builds its own keyed copies on top: measured 269→406 s for q9n at
    // sf10 in this polluted JVM vs 76 s flat in a fresh one (the SCALE.md
    // one-JVM-per-family lesson reproduced in miniature). Read the face's
    // number from TimeOne in a fresh JVM; this harness isolates the
    // half-step costs only.
    inc.unpersist(); incC.unpersist(); incB.unpersist()
    spark.stop()
  }
}
