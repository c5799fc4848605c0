package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

/** Round-5 closing batch: interval-overlap join vs brute force,
  * snapshot-as-of version semantics, incremental-refresh equality, and
  * the sampled estimate's statistical contract.
  */
class Round5cSpec extends AnyFunSuite with SparkSuite {

  test("binned overlap join equals the brute-force interval check") {
    val got = Events.overlapJoin(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_purch")).toMap
    val ev = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
    val errors = ev.filter(_.getString(1) == "error")
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(2) + 3600L * 1000000L))
    val purch = ev.filter(_.getString(1) == "purchase")
      .map(r => (r.getLong(2), r.getLong(2) + 1800L * 1000000L))
    assert(got.size == errors.length)
    errors.foreach { case (id, lo, hi) =>
      val n = purch.count { case (plo, phi) => lo < phi && plo < hi }
      assert(got(id) == n.toLong, s"error $id: engine ${got(id)} vs brute $n")
    }
  }

  test("snapshot-as-of is monotone in the commit sequence") {
    val byAsOf = (0 to 3).map { k =>
      k -> Mutations.snapshotAt(spark, sfDir, asOf = k).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("version"), r.getAs[String]("h"))).toMap
    }.toMap
    val n = byAsOf(0).size
    byAsOf.values.foreach(m => assert(m.size == n, "snapshot loses keys"))
    // asOf=0 is the unmodified base corpus
    assert(byAsOf(0).values.forall(_._1 == 0))
    for (k <- 1 to 3; (id, (ver, h)) <- byAsOf(k)) {
      assert(ver <= k, s"doc $id at asOf=$k reports version $ver")
      // versions only ever advance with the sequence, and an unchanged
      // version means an unchanged fingerprint
      val (pv, ph) = byAsOf(k - 1)(id)
      assert(ver >= pv, s"doc $id regressed $pv -> $ver at asOf=$k")
      if (ver == pv) assert(h == ph, s"doc $id changed content at same version")
      // a doc reports version k iff batch k touches it
      val touched = k match {
        case 1 => id % 3 == 0
        case 2 => id % 5 == 0
        case 3 => id % 7 == 0
      }
      if (touched) assert(ver == k, s"doc $id untouched by visible batch $k")
    }
  }

  test("incremental refresh equals the from-scratch aggregate in-engine") {
    val incr = Events.incrementalHourly(spark, sfDir).collect()
    val scratch = Tables(spark, sfDir, "events")
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_s"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"),
        round(sum("value") / count(lit(1)), 6).as("avg_value"))
      .orderBy("hour_s", "event_type").collect()
    assert(incr.length == scratch.length)
    incr.zip(scratch).foreach { case (a, b) =>
      assert(a.getAs[Long]("hour_s") == b.getAs[Long]("hour_s"))
      assert(a.getAs[Long]("n") == b.getAs[Long]("n"))
      assert(math.abs(a.getAs[Double]("sum_value") - b.getAs[Double]("sum_value")) < 1e-6)
    }
  }

  test("sampled estimate brackets the true mean at realistic rates") {
    val est = Sampling.sampledEstimate(spark, sfDir).head
    val truth = Tables(spark, sfDir, "lineitem")
      .agg(avg("l_extendedprice")).head.getDouble(0)
    val (lo, hi) = (est.getAs[Double]("avg_lo"), est.getAs[Double]("avg_hi"))
    assert(lo < hi)
    // a 95% CI can legitimately miss 1-in-20 fixtures; allow one extra
    // half-width of slack so the test pins the SCALE of the interval,
    // not the coin flip
    val slack = (hi - lo) / 2
    assert(truth > lo - slack && truth < hi + slack,
      s"true mean $truth far outside [$lo, $hi]")
  }
}
