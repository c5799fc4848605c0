package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed linear algebra over the embedding corpus — the PCA /
  * whitening front half of an embedding pipeline. The split follows
  * Spark MLlib's RowMatrix design: the CLUSTER computes the d×d Gramian
  * Σ v vᵀ with a mergeable custom aggregate
  * ([[graft.functions.GramSum]] — one d² buffer per partition, partials
  * merge at the exchange, rows never shuffle), and the DRIVER runs the
  * O(d²)-per-step eigen iteration on the tiny result — at embedding dims
  * the matrix is kilobytes while the row count is the 100 TB axis, so
  * collecting it is the correct scale shape, not a driver-loop smell.
  */
object Linalg {

  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** The flattened d×d Gramian with dimension decoded from the linear
    * index; upper triangle only (it is symmetric by construction). */
  private def gramFlat(spark: SparkSession, dir: String): (Array[Double], Int) = {
    val g = vectors(spark, dir)
      .agg(udaf(graft.functions.GramSum).apply(col("v")).as("g"))
      .head.getSeq[Double](0).toArray
    (g, math.round(math.sqrt(g.length.toDouble)).toInt)
  }

  /** q9s: Gramian entries (i ≤ j) at 6 dp — cross-engine pinned by a
    * DuckDB parallel-unnest pairwise sum. */
  def gramian(spark: SparkSession, dir: String): DataFrame = {
    val d = vectors(spark, dir).select(size(col("v"))).head.getInt(0)
    vectors(spark, dir)
      .agg(udaf(graft.functions.GramSum).apply(col("v")).as("g"))
      .select(posexplode(col("g")).as(Seq("k", "value")))
      .select((col("k") / d).cast("int").as("i"),
        pmod(col("k"), lit(d)).cast("int").as("j"),
        round(col("value"), 6).as("g"))
      .where(col("i") <= col("j"))
      .orderBy("i", "j")
  }

  /** q9t: the corpus's top principal direction — `iters` rounds of power
    * iteration G^k v₀ from the fixed v₀ = 1/√d, normalized once at the
    * end (per-round normalization is pure rescaling — the q9n lesson).
    * Deterministic by construction (fixed init, fixed round count), so
    * the DuckDB oracle replays the identical arithmetic: the same
    * pairwise-sum Gramian, ten unrolled matvec CTEs, one final
    * normalization, 6 dp. */
  def pcaPower(spark: SparkSession, dir: String, iters: Int = 10): DataFrame = {
    val (g, d) = gramFlat(spark, dir)
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to iters) {
      val next = new Array[Double](d)
      var i = 0
      while (i < d) {
        val off = i * d
        var s = 0.0; var j = 0
        while (j < d) { s += g(off + j) * v(j); j += 1 }
        next(i) = s; i += 1
      }
      v = next
    }
    val nrm = math.sqrt(v.map(x => x * x).sum)
    import spark.implicits._
    v.zipWithIndex
      .map { case (x, i) => (i, BigDecimal(x / nrm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toSeq.toDF("dim", "loading")
      .orderBy("dim")
  }

  /** qa0: PCA projection scores — [[pcaPower]] made actionable: every
    * vector's coordinate along the top principal direction, ranked by
    * magnitude (the "most extreme along the dominant axis" shortlist an
    * outlier/diversity pass consumes). The direction is the ROUNDED
    * 6-dp loading vector — both engines therefore project onto the
    * bit-identical v — applied as one per-row zip_with/aggregate dot
    * product: a map over the corpus, no shuffle until the bounded top-k.
    * Ranking uses the 5-dp-rounded score with vec_id tie-break (the q8k
    * discipline), so the top-k SET is deterministic cross-engine. */
  def pcaScores(spark: SparkSession, dir: String, k: Int = 25): DataFrame = {
    val loadings = pcaPower(spark, dir).collect()
      .sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("loading"))
    val vlit = typedLit(loadings)
    vectors(spark, dir)
      .select(col("vec_id"),
        round(aggregate(zip_with(col("v"), vlit, (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x), 5).as("score"))
      .orderBy(abs(col("score")).desc, col("vec_id"))
      .limit(k)
  }

  /** qae: per-vector affine int8 quantization round trip — the embedding
    * compression every vector store applies (4× smaller than float32,
    * 8× than the double working type), with its reconstruction-error
    * audit: q_i = ⌊(x_i − min)/scale + 0.5⌋ on a per-vector [min, max]
    * range, error = x − (min + q·scale). Reported per vector: the range,
    * worst absolute error and MSE — the numbers that decide whether int8
    * is safe for a given corpus. Pure per-row lambda math (no shuffle at
    * all before the output sort), and deterministic cross-engine: the
    * quantizer uses ⌊z+0.5⌋ (identical in IEEE doubles everywhere)
    * rather than engine-specific round(), and each vector's error
    * reduction folds in list order, so even summation order is pinned. */
  def int8Quant(spark: SparkSession, dir: String): DataFrame = {
    val scale = (col("mx") - col("mn")) / lit(255.0)
    val err = expr(
      "transform(v, x -> x - (mn + floor((x - mn) / scale + 0.5) * scale))")
    vectors(spark, dir)
      .select(col("vec_id"), col("v"),
        array_min(col("v")).as("mn"), array_max(col("v")).as("mx"))
      .where(col("mx") > col("mn")) // constant vectors quantize losslessly
      .withColumn("scale", scale)
      .withColumn("e", err)
      .select(col("vec_id"), round(col("mn"), 6).as("mn"),
        round(col("mx"), 6).as("mx"),
        round(aggregate(col("e"), lit(0.0),
          (acc, x) => greatest(acc, abs(x))), 8).as("max_abs_err"),
        // squared errors are ~1e-5 with fp noise ~1e-19: rounding at 1e-9
        // is far above any summation-order wobble
        round(aggregate(col("e"), lit(0.0), (acc, x) => acc + x * x)
          / size(col("e")), 9).as("mse"))
      .orderBy("vec_id")
  }

  /** qam: per-label embedding centroids + nearest-other-centroid cosine —
    * the class-separation audit run before training a classifier head
    * (labels whose centroids nearly coincide are candidates for merging
    * or relabeling). Centroids come from one dimension-keyed average
    * (rows shuffle once, as (label, dim) partial sums); the pairwise
    * centroid comparison is labels² rows of dim-length arrays —
    * diagnostic-table-sized, never corpus-sized. Centroid components are
    * rounded to 6 dp BEFORE the cosine so both engines fold identical
    * inputs; the cosine is rounded once more on output. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .toDF("label", "dim", "x")
    val cent = x.groupBy("label", "dim").agg(round(avg("x"), 6).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        s => s.getField("c")).as("cv"))
    val nv = Tables(spark, dir, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("n_vecs"))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), (acc, t) => acc + t)
    val pairs = cent.as("a")
      .join(cent.as("b"), col("a.label") =!= col("b.label"))
      .select(col("a.label").as("label"), col("b.label").as("nearest_label"),
        round(dot(col("a.cv"), col("b.cv"))
          / (sqrt(dot(col("a.cv"), col("a.cv")))
            * sqrt(dot(col("b.cv"), col("b.cv")))), 6).as("centroid_cosine"))
    graft.plans.TopKPerGroup(pairs, Seq("label"),
        Seq(("centroid_cosine", true), ("nearest_label", false)), 1, "rank")
      .join(nv, "label")
      .select("label", "n_vecs", "nearest_label", "centroid_cosine")
      .orderBy("label")
  }
}
