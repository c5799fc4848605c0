package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed skyline (Pareto frontier) — the multi-criteria shortlist
  * operator ("no other point is at least as good on every axis and better
  * on one"). The engine shape is the classic two-phase distributed
  * skyline: a LOCAL frontier sweep inside each partition (`mapPartitions`,
  * no shuffle) reduces every partition to its own frontier, then the union
  * of local frontiers — bounded by partitions × frontier size, tiny
  * relative to the input — is swept once more on a single partition for
  * the exact global answer. Correctness of the phase split: a global
  * skyline point can never be dominated inside its own partition, so phase
  * 1 loses nothing; phase 2 removes cross-partition dominance. At 100 TB
  * the heavy input is consumed entirely in phase 1's narrow (shuffle-free)
  * pass; only frontiers move.
  *
  * The sweep is the standard 2-D sort-based skyline: sort by the maximized
  * axis descending (ties: minimized axis ascending), keep a row iff its
  * minimized axis strictly improves the best seen — O(n log n), one pass.
  * Inputs are rounded to 6 dp BEFORE the sweep so dominance comparisons
  * are identical across engines (the DuckDB oracle replays the same
  * definition as a NOT EXISTS dominance query). Equal points (both axes
  * tied) are all frontier members — strict-in-one-axis is required to
  * dominate.
  */
object Skyline {

  /** One sweep over (id, maximize, minimize) tuples; exact skyline of the
    * iterator's contents. Duplicate frontier points are all kept. */
  private[operators] def sweep(
      it: Iterator[(Long, Double, Double)]): Iterator[(Long, Double, Double)] = {
    val sorted = it.toArray.sortBy { case (id, q, p) => (-q, p, id) }
    var minP = Double.PositiveInfinity
    var qAtMin = Double.NaN
    sorted.iterator.filter { case (_, q, p) =>
      if (p < minP) { minP = p; qAtMin = q; true }
      else p == minP && q == qAtMin
    }
  }

  /** Exact skyline of an (id, maximize, minimize) dataset: local frontier
    * per partition, then one global sweep over the union of frontiers. */
  def skyline(points: org.apache.spark.sql.Dataset[(Long, Double, Double)])
      : org.apache.spark.sql.Dataset[(Long, Double, Double)] = {
    import points.sparkSession.implicits._
    points.mapPartitions(sweep).repartition(1).mapPartitions(sweep)
  }

  /** q8v: part-level Pareto frontier "high volume, low price" — parts
    * where no other part moves at least the same quantity for at most the
    * same average price (strictly better on one axis). */
  def skylineQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val metrics = Tables(spark, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(round(sum("l_quantity"), 6).as("qty"),
        round(avg("l_extendedprice"), 6).as("price"))
      .select(col("l_partkey").cast("long"), col("qty").cast("double"),
        col("price").cast("double"))
      .as[(Long, Double, Double)]
    skyline(metrics).toDF("l_partkey", "qty", "price").orderBy("l_partkey")
  }
}
