package graft.operators

import org.apache.spark.ml.fpm.FPGrowth
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

class BasketsSpec extends AnyFunSuite with SparkSuite {

  test("localApriori equals brute-force enumeration on a hand case") {
    val baskets: Array[Seq[Long]] = Array(
      Seq(1L, 2L, 3L), Seq(1L, 2L), Seq(1L, 2L, 4L), Seq(2L, 3L), Seq(1L, 3L))
    val got = Baskets.localApriori(baskets, 2).toSet
    // brute force: count every subset of every basket
    val counts = scala.collection.mutable.Map.empty[Seq[Long], Int]
    baskets.foreach { b =>
      (1 to b.size).foreach(k => b.sorted.combinations(k).foreach(c =>
        counts.update(c, counts.getOrElse(c, 0) + 1)))
    }
    val expect = counts.filter(_._2 >= 2).keySet
    assert(got == expect)
  }

  test("SON matches FPGrowth at the same support") {
    import spark.implicits._
    val support = 3
    val son = Baskets.son(spark, sfDir, Some(support))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val baskets = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_partkey"))).as("items"))
    val n = baskets.count().toDouble
    val fp = new FPGrowth().setItemsCol("items")
      .setMinSupport((support - 0.5) / n) // just below, filter exactly after
      .fit(baskets)
    val expect = fp.freqItemsets
      .where(col("freq") >= support)
      .as[(Seq[Long], Long)]
      .collect().map { case (is, f) => (is.sorted.mkString(","), f) }.toSet
    assert(son == expect)
  }

  test("A-priori monotonicity holds on SON output") {
    val rows = Baskets.son(spark, sfDir, Some(3)).collect()
      .map(r => (r.getString(0).split(",").map(_.toLong).toSeq, r.getLong(2)))
    val bySet = rows.toMap
    rows.foreach { case (is, n) =>
      if (is.size > 1) is.combinations(is.size - 1).foreach { sub =>
        assert(bySet.contains(sub), s"subset $sub of $is missing")
        assert(bySet(sub) >= n, s"support of $sub < support of $is")
      }
    }
  }

  test("freqPairs agrees with SON size-2 itemsets") {
    val pairs = Baskets.freqPairs(spark, sfDir, 3).collect()
      .map(r => (s"${r.getLong(0)},${r.getLong(1)}", r.getLong(2))).toSet
    val son2 = Baskets.son(spark, sfDir, Some(3)).where(col("size") === 2)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(pairs == son2)
  }

  test("SON fails fast when the candidate set exceeds the driver budget") {
    // the guard must fire BEFORE the collect, with a message naming the
    // relative-support default — not OOM mid-collect at scale
    val e = intercept[IllegalArgumentException] {
      Baskets.son(spark, sfDir, Some(3), maxCandidates = 1L)
    }
    assert(e.getMessage.contains("candidate itemsets") &&
      e.getMessage.contains("0.02%"), e.getMessage)
  }
}
