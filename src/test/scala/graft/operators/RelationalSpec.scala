package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

class RelationalSpec extends AnyFunSuite with SparkSuite {

  test("groupavg counts roll up to the joined row count") {
    val df = Relational.groupAvgBrandFlag(spark, sfDir)
    val total = df.agg(sum("cnt")).head.getLong(0)
    val expected = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(total == expected)
  }

  test("avg is bounded by min/max of the measure") {
    val row = Relational.groupAvgBrandFlag(spark, sfDir)
      .agg(min("avg_price"), max("avg_price")).head
    val b = Tables(spark, sfDir, "lineitem")
      .agg(min("l_extendedprice"), max("l_extendedprice")).head
    assert(row.getDouble(0) >= b.getDouble(0) && row.getDouble(1) <= b.getDouble(1))
  }

  test("semi and anti joins partition customers with F-orders correctly") {
    val c = Tables(spark, sfDir, "customer")
    val withF = c.join(
      Tables(spark, sfDir, "orders").where(col("o_orderstatus") === "F"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = Relational.joinAnti(spark, sfDir).count()
    assert(withF + anti == c.count())
  }

  test("top-k is ordered desc and k-sized") {
    val rows = Relational.topK(spark, sfDir).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("left outer join keeps all customers") {
    assert(Relational.joinLeftOuter(spark, sfDir).count() ==
      Tables(spark, sfDir, "customer").count())
  }

  test("group collect basket is sorted numerically") {
    val r = Relational.groupCollect(spark, sfDir)
      .where(col("n_items") >= 3).head
    val items = r.getAs[String]("basket").split(",").map(_.toLong)
    assert(items.sorted.sameElements(items))
  }

  test("11dp format matches String.format semantics") {
    val r = Relational.fmt11dp(spark, sfDir).head
    assert(r.getAs[String]("avg_qty_11dp").matches("""\d+\.\d{11}"""))
  }

  test("sketch aggregates land within tolerance of exact answers") {
    val exact = Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    Relational.sketches(spark, sfDir).collect().foreach { r =>
      val (d, p50) = exact(r.getString(0))
      assert(math.abs(r.getLong(1) - d).toDouble / d < 0.05,
        s"HLL distinct off by >5%: ${r.getLong(1)} vs $d")
      assert(math.abs(r.getDouble(3) - p50) / p50 < 0.05,
        s"approx p50 off by >5%: ${r.getDouble(3)} vs $p50")
    }
  }

  test("pivot cells reconcile with the unpivoted totals") {
    val orders = Tables(spark, sfDir, "orders")
    val total = orders.count()
    val out = Relational.pivotByStatus(spark, sfDir).collect()
    assert(out.map(r => r.getLong(1) + r.getLong(3) + r.getLong(5)).sum == total)
  }

  test("exact percentiles are monotone and bracket the median") {
    Relational.percentiles(spark, sfDir).collect().foreach { r =>
      val ps = (1 to 4).map(r.getDouble)
      assert(ps == ps.sorted, s"non-monotone percentiles for ${r.getString(0)}")
    }
  }

  test("column stats agree with direct per-column aggregates") {
    val li = Tables(spark, sfDir, "lineitem")
    val n = li.count()
    val stats = Relational.columnStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats.size == 4)
    stats.values.foreach { r =>
      assert(r.getLong(1) == n && r.getLong(2) == 0L)
      assert(r.getLong(3) <= n && r.getDouble(4) <= r.getDouble(5))
    }
    val ndvQty = li.select(count_distinct(col("l_quantity"))).head.getLong(0)
    assert(stats("l_quantity").getLong(3) == ndvQty)
  }

  test("hash split is deterministic, exhaustive, and near the target weights") {
    val a = Sampling.trainValTest(spark, sfDir).collect()
    val b = Sampling.trainValTest(spark, sfDir).collect()
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)))
    val n = Tables(spark, sfDir, "documents").count()
    assert(a.length == n)
    val frac = a.groupBy(_.getString(1)).map { case (s, rs) => (s, rs.length.toDouble / n) }
    assert(math.abs(frac("train") - 0.9) < 0.05, frac.toString)
    assert(frac.keySet == Set("train", "val", "test"))
  }

  test("upsert replaces matched keys wholesale and inserts new ones") {
    import spark.implicits._
    val snapshot = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "s", "v")
    val changes = Seq((2L, "B", 99), (4L, "d", 40)).toDF("id", "s", "v")
    val out = Mutations.upsert(snapshot, changes, "id").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    assert(out == Map(1L -> ("a", 10), 2L -> ("B", 99),
      3L -> ("c", 30), 4L -> ("d", 40)))
    // row-replacement semantics: a NULL in the change row WINS (it is the
    // new version), unlike a column-wise coalesce merge
    val nullChange = Seq((1L, null.asInstanceOf[String], 7)).toDF("id", "s", "v")
    val out2 = Mutations.upsert(snapshot, nullChange, "id").collect()
      .map(r => (r.getLong(0), (Option(r.getString(1)), r.getInt(2)))).toMap
    assert(out2(1L) == ((None, 7)))
  }

  test("sql surface answers the same as the DataFrame surface") {
    val viaSql = Relational.sqlApi(spark, sfDir).collect().map(_.toSeq)
    val viaDf = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(round(avg("l_extendedprice"), 6).as("avg_price"), count(lit(1)).as("cnt"))
      .orderBy("p_brand").collect().map(_.toSeq)
    assert(viaSql.sameElements(viaDf))
  }
}
