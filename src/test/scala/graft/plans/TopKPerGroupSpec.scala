package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

class TopKPerGroupSpec extends AnyFunSuite with SparkSuite
    with AdaptiveSparkPlanHelper {

  test("plan is partial heap -> exchange -> final heap (no full sort)") {
    val df = TopKPerGroup(Tables(spark, sfDir, "events"),
      Seq("user_id"), Seq(("ts", true), ("event_id", true)), 3)
    df.collect() // finalize adaptive plan
    val execs = collect(df.queryExecution.executedPlan) {
      case e: TopKPerGroupExec => e
    }
    assert(execs.length == 2, s"expected partial+final, got:\n${df.queryExecution.executedPlan}")
    assert(execs.count(_.rankAttr.isDefined) == 1)
    val hasExchange = collect(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.nonEmpty
    assert(hasExchange, "final tier must be fed by an exchange on the group key")
    val hasSort = collect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.nonEmpty
    assert(!hasSort, "top-k-per-group must not sort the full input")
  }

  test("matches the window row_number formulation on the events fixture") {
    val native = graft.operators.Events.rankedNative(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val window = graft.operators.Events.ranked(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(native.nonEmpty && native == window)
  }

  test("TopKRewrite replaces row_number+filter windows with the native node") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 7L, (i * 37) % 101, i.toLong))
      .toDF("g", "score", "id")
    val q = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .where(col("rn") <= 3)
    val physical = q.queryExecution.executedPlan
    assert(collect(physical) { case e: TopKPerGroupExec => e }.nonEmpty,
      s"expected native operator, got:\n${physical.treeString.take(1500)}")
    assert(collect(physical) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "Window should have been rewritten away")
    // driver-side truth (independent of any Spark window machinery)
    val expect = (0 until 1000).map(i => (i % 7L, (i * 37) % 101, i.toLong))
      .groupBy(_._1).flatMap { case (g, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
          .map { case (r, idx) => (g, idx + 1, r._3) }
      }.toSet
    val got = q.select("g", "rn", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expect)
    // compound filter: the rank conjunct feeds the node, the rest survive
    // as a Filter above it
    val compound = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .where(col("rn") <= 3 && col("score") > 50 && col("rn") > 1)
    val cPhys = compound.queryExecution.executedPlan
    assert(collect(cPhys) { case e: TopKPerGroupExec => e }.nonEmpty)
    assert(collect(cPhys) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty)
    val cExpect = (0 until 1000).map(i => (i % 7L, (i * 37) % 101, i.toLong))
      .groupBy(_._1).flatMap { case (g, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
          .map { case (r, idx) => (g, idx + 1, r._2, r._3) }
      }.filter(r => r._3 > 50 && r._2 > 1).toSet
    assert(compound.select("g", "rn", "score", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet == cExpect)
    // rn = 1 (the mode / arg-max idiom, q9a) IS a prefix and rewrites;
    // rn = 2 is NOT a prefix and must keep its Window
    val eq1 = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .where(col("rn") === 1)
    assert(collect(eq1.queryExecution.executedPlan) {
      case e: TopKPerGroupExec => e }.nonEmpty, "rn = 1 should rewrite")
    val eq1Expect = (0 until 1000).map(i => (i % 7L, (i * 37) % 101, i.toLong))
      .groupBy(_._1).map { case (g, rows) =>
        (g, rows.minBy(r => (-r._2, r._3))._3) }.toSet
    assert(eq1.select("g", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == eq1Expect)
    val eq2 = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .where(col("rn") === 2)
    assert(collect(eq2.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.nonEmpty, "rn = 2 is not a prefix and should keep the window")
    // a filter on something other than the rank must NOT be rewritten
    val other = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .where(col("score") > 50)
    assert(collect(other.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.nonEmpty, "non-rank filter should keep the window")
    // rank() must NOT be rewritten either: on ties `rank() <= k` returns
    // MORE than k rows — only row_number's exactly-k contract matches the
    // operator's
    val tied = Seq(("a", 1, 1L), ("a", 1, 2L), ("a", 1, 3L)).toDF("g", "score", "id")
    val viaRank = tied.withColumn("rk", rank().over(
        Window.partitionBy("g").orderBy(col("score").desc)))
      .where(col("rk") <= 2)
    assert(collect(viaRank.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.nonEmpty, "rank() should keep the window")
    assert(viaRank.count() == 3, "rank ties must all survive")
  }

  test("groups smaller than k, ties broken by the tie-break column, k=1") {
    import spark.implicits._
    val df = Seq(
      ("a", 10, 1L), ("a", 10, 2L), ("a", 5, 3L),        // tie on score
      ("b", 7, 4L),                                      // group smaller than k
      ("c", 1, 5L), ("c", 2, 6L), ("c", 3, 7L), ("c", 4, 8L)
    ).toDF("g", "score", "id").repartition(4)
    def viaNative(k: Int) =
      TopKPerGroup(df, Seq("g"), Seq(("score", true), ("id", false)), k)
        .select("g", "rn", "id").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    def viaWindow(k: Int) = {
      val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
      df.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
        .select("g", "rn", "id").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    }
    Seq(1, 2, 3, 10).foreach { k =>
      assert(viaNative(k) == viaWindow(k), s"mismatch at k=$k")
    }
  }
}
