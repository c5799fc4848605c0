package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed user-defined aggregate — the UDAF registration surface the
  * reference lacks (SURVEY.md §2.10; its "UDFs" are all plain closures
  * inside map/flatMap). An `Aggregator` is the Spark-native shape: a
  * constant-size, MERGEABLE buffer (partial aggregation on the map side,
  * merge at the exchange — the same partial/final split Catalyst gives
  * built-in aggregates), usable from `DataFrame.agg` via
  * `functions.udaf` and from SQL after `spark.udf.register`.
  *
  * Geometric mean via sum-of-logs: exp(Σ ln x / n) over positive inputs —
  * numerically stable where Π x would overflow, and exactly the form a
  * DuckDB oracle can replay (`exp(avg(ln(x)))`), which is what pins the
  * whole partial/merge/finish path cross-engine in q1e.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
