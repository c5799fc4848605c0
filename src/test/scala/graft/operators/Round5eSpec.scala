package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSuite, Tables}

/** Brute-force / property checks for the qb4–qb7 batch, independent of the
  * DuckDB oracles the driver runs. */
class Round5eSpec extends AnyFunSuite with SparkSuite {

  test("adamic-adar equals a driver brute force over the same edge list") {
    val edges = GraphOps.coPurchaseEdges(spark, sfDir).select("u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edgeSet = edges.toSet
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.ArrayBuffer.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.ArrayBuffer.empty) += u
    }
    val score = scala.collection.mutable.HashMap.empty[(Long, Long), (Long, Double)]
    adj.foreach { case (z, nbrs) =>
      val w = 1.0 / math.log(nbrs.size.toDouble)
      val s = nbrs.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) {
        val key = (s(i), s(j))
        val (c0, w0) = score.getOrElse(key, (0L, 0.0))
        score(key) = (c0 + 1, w0 + w)
      }
    }
    val expect = score.toSeq
      .filterNot { case (k, _) => edgeSet.contains(k) }
      .map { case ((a, b), (c, s)) =>
        (a, b, c, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }
      .sortBy { case (a, b, _, s) => (-s, a, b) }
      .take(50)
    val got = GraphOps.adamicAdar(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-9, s"$g vs $e")
    }
  }

  test("rolling median matches a per-frame sort on exact cents") {
    val daily = Tables(spark, sfDir, "orders")
      .select(col("o_orderdate").cast("string").as("d"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    def medianOf(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2).toDouble
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val got = Relational.rollingMedianRevenue(spark, sfDir).collect()
    assert(got.length == daily.length)
    got.zipWithIndex.foreach { case (r, i) =>
      val frame = daily.slice(math.max(0, i - 6), i + 1).map(_._2)
      assert(r.getString(0) == daily(i)._1)
      assert(r.getLong(3) == frame.size)
      val m = BigDecimal(medianOf(frame) / 100.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("med7") - m) < 1e-9,
        s"day ${daily(i)._1}: got ${r.getAs[Double]("med7")} want $m")
    }
  }

  test("time-weighted average equals a driver trapezoid integration") {
    val evs = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("t"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val s = rows.sortBy(r => (r._3, r._2))
      val span = s.last._3 - s.head._3
      if (s.size < 2 || span == 0) None
      else {
        val area = s.sliding(2).map { case Array(p, c) =>
          (c._4 + p._4) / 2.0 * (c._3 - p._3)
        }.sum
        Some(u -> (s.size.toLong, span, area / span))
      }
    }
    val got = Round5eSpec.rowsByLongKey(
      Events.timeWeightedAvg(spark, sfDir).collect())
    assert(got.size == expect.size)
    expect.foreach { case (u, (n, span, twa)) =>
      val r = got(u)
      assert(r.getLong(1) == n && r.getLong(2) == span)
      assert(math.abs(r.getDouble(3) - twa) < 1e-5, s"user $u")
    }
  }

  test("fingerprint is order-independent and matches a driver md5-xor") {
    import java.security.MessageDigest
    val rows = Tables(spark, sfDir, "orders")
      .select(col("o_orderstatus"),
        concat_ws("|", col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), round(col("o_totalprice") * 100).cast("long"),
          col("o_orderdate").cast("string"), col("o_orderpriority")).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def le32(d: Array[Byte], off: Int): Long =
      (0 until 4).map(i => (d(off + i).toLong & 0xffL) << (8 * i)).sum
    val expect = rows.groupBy(_._1).view.mapValues { grp =>
      var lo = 0L; var hi = 0L
      grp.foreach { case (_, s) =>
        val d = MessageDigest.getInstance("MD5").digest(
          s.getBytes("UTF-8"))
        lo ^= le32(d, 8); hi ^= le32(d, 12)
      }
      (grp.size.toLong, lo, hi)
    }.toMap
    val got = Relational.tableFingerprint(spark, sfDir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, lo, hi) = expect(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == lo, s"xor_lo for ${r.getString(0)}")
      assert(r.getLong(3) == hi, s"xor_hi for ${r.getString(0)}")
    }
  }
}

object Round5eSpec {
  def rowsByLongKey(rows: Array[org.apache.spark.sql.Row])
      : Map[Long, org.apache.spark.sql.Row] =
    rows.map(r => r.getLong(0) -> r).toMap
}
