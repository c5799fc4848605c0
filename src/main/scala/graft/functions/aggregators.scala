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
/** Element-wise vector sum over `array<double>` columns — the aggregation
  * shape embedding pooling needs at scale: the shuffle carries ONE
  * dim-length buffer per group (partial sums merge associatively), not
  * |rows| × dim exploded (group, dim, value) tuples. The buffer starts
  * empty and adopts the first vector's length, so the aggregator is
  * dimension-agnostic; mixed lengths within a group are a data error and
  * fail fast. */
object VecSum extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray
  override def reduce(b: Array[Double], x: Seq[Double]): Array[Double] =
    if (b.isEmpty) x.toArray
    else {
      require(b.length == x.length, s"vector length ${x.length} != ${b.length}")
      var i = 0
      while (i < b.length) { b(i) += x(i); i += 1 }
      b
    }
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b else if (b.isEmpty) a else reduce(a, b.toSeq)
  override def finish(b: Array[Double]): Seq[Double] = b.toSeq
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Gramian accumulator: Σ v vᵀ over `array<double>` vectors, the
  * distributed half of PCA/whitening (Spark MLlib's RowMatrix does the
  * same split: cluster-side Gramian, driver-side eigen — the d×d result
  * is tiny for any embedding dim while the row count is the 100 TB axis).
  * The buffer is ONE d² double array per partition, merged associatively
  * at the exchange — the shuffle carries partial matrices, never rows.
  * Like [[VecSum]], the buffer adopts the first vector's dimension. */
object GramSum extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray
  override def reduce(b: Array[Double], x: Seq[Double]): Array[Double] = {
    val v = x.toArray
    val d = v.length
    val buf = if (b.isEmpty) new Array[Double](d * d)
      else { require(b.length == d * d,
        s"vector length $d incompatible with buffer ${b.length}"); b }
    var i = 0
    while (i < d) {
      val vi = v(i); val off = i * d
      var j = 0
      while (j < d) { buf(off + j) += vi * v(j); j += 1 }
      i += 1
    }
    buf
  }
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b else if (b.isEmpty) a
    else {
      require(a.length == b.length)
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  override def finish(b: Array[Double]): Seq[Double] = b.toSeq
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

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
