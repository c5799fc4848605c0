package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine function registration. Two routes:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build (the SparkSessionExtensions contract), or
  *  - `GraftFunctions.register(spark)` on a live session.
  * Registered: `array_dot(a, b)` and `combinations(arr, k)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => FloatDotRewrite)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftFunctions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val all: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (es: Seq[Expression]) => ArrayDotProduct(es(0), es(1))),
    (FunctionIdentifier("combinations"),
      new ExpressionInfo(classOf[Combinations].getName, "combinations"),
      (es: Seq[Expression]) => Combinations(es(0), es(1))),
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))),
    (FunctionIdentifier("sign_buckets"),
      new ExpressionInfo(classOf[HyperplaneSignBuckets].getName, "sign_buckets"),
      (es: Seq[Expression]) => {
        // planes + nBits are compile-time constants of the query (the
        // hyperplane matrix is generated driver-side); extract them here so
        // the expression codegens against a primitive double[]
        require(es(1).foldable && es(2).foldable,
          "sign_buckets: planes and nBits must be literals")
        val planes = es(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        HyperplaneSignBuckets(es(0), planes, es(2).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sigs"),
      (es: Seq[Expression]) => {
        require(es(1).foldable, "minhash_sigs: numHashes must be a literal")
        MinHashSignature(es(0), es(1).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("minhash_sigs_portable"),
      new ExpressionInfo(classOf[PortableMinHash].getName, "minhash_sigs_portable"),
      (es: Seq[Expression]) => {
        require(es(1).foldable, "minhash_sigs_portable: numHashes must be a literal")
        PortableMinHash(es(0), es(1).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    (FunctionIdentifier("oph_sig"),
      new ExpressionInfo(classOf[OphSignature].getName, "oph_sig"),
      (es: Seq[Expression]) => {
        require(es(1).foldable, "oph_sig: k must be a literal")
        OphSignature(es(0), es(1).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (es: Seq[Expression]) => {
        require(es(1).foldable && es(2).foldable && es(3).foldable,
          "pq_encode: codebooks, m, k must be literals")
        val cb = es(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        PqEncode(es(0), cb, es(2).eval().asInstanceOf[Int], es(3).eval().asInstanceOf[Int])
      }),
    // Spark's own runtime-filter machinery (BloomFilterAggregate /
    // BloomFilterMightContain) exposed as callable functions, so a library
    // user can build the bloom side once and push it into any scan — the
    // semi-join pre-filter pattern (see ScaleOps.bloomSemiJoin). Values are
    // hashed with xxhash64 on both build and probe, matching what Spark's
    // InjectRuntimeFilter rule itself plants.
    (FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(es(0))), es(1))
          .toAggregateExpression()),
    (FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_contains"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0),
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(es(1))))),
    // Count-Min sketch: build side is Spark's own CountMinSketchAgg (a
    // mergeable TypedImperativeAggregate — partial sketches merge at the
    // exchange); probe side is the custom CmsEstimate codegen expression.
    (FunctionIdentifier("cms_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg].getName,
        "cms_agg"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg(
          es(0), es(1), es(2), es(3)).toAggregateExpression()),
    (FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (es: Seq[Expression]) => {
        require(es(0).foldable, "cms_estimate: sketch must be a literal")
        CmsEstimate(es(1), es(0).eval().asInstanceOf[Array[Byte]])
      }),
    (FunctionIdentifier("nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "nearest_cells"),
      (es: Seq[Expression]) => {
        require(es(2).foldable && es(3).foldable,
          "nearest_cells: cents, nprobe must be literals")
        val ct = es(2).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        NearestCells(es(0), es(1), ct, es(3).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (es: Seq[Expression]) => {
        require(es(2).foldable && es(3).foldable && es(4).foldable,
          "pq_adc: codebooks, m, k must be literals")
        val cb = es(2).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        PqAdc(es(0), es(1), cb, es(3).eval().asInstanceOf[Int], es(4).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("band_hashes"),
      new ExpressionInfo(classOf[BandHashes].getName, "band_hashes"),
      (es: Seq[Expression]) => {
        require(es(1).foldable, "band_hashes: bands must be a literal")
        BandHashes(es(0), es(1).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (es: Seq[Expression]) => {
        require(es(1).foldable, "shingle_hashes: k must be a literal")
        ShingleHashes(es(0), es(1).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("md5_quad64"),
      new ExpressionInfo(classOf[Md5Quad64].getName, "md5_quad64"),
      (es: Seq[Expression]) => Md5Quad64(es(0))),
    (FunctionIdentifier("portable_gram_hashes"),
      new ExpressionInfo(classOf[PortableGramHashes].getName, "portable_gram_hashes"),
      (es: Seq[Expression]) => {
        require(es(1).foldable, "portable_gram_hashes: k must be a literal")
        PortableGramHashes(es(0), es(1).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("edit1_dist"),
      new ExpressionInfo(classOf[EditDistanceLe1].getName, "edit1_dist"),
      (es: Seq[Expression]) => EditDistanceLe1(es(0), es(1))),
    (FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      (es: Seq[Expression]) => {
        require(es(1).foldable && es(2).foldable && es(3).foldable,
          "cdc_chunks: mask, minLen, maxLen must be literals")
        CdcChunks(es(0), es(1).eval().asInstanceOf[Long],
          es(2).eval().asInstanceOf[Int], es(3).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("cdc_boundaries"),
      new ExpressionInfo(classOf[CdcBoundaries].getName, "cdc_boundaries"),
      (es: Seq[Expression]) => {
        require(es(1).foldable && es(2).foldable && es(3).foldable,
          "cdc_boundaries: mask, minLen, maxLen must be literals")
        CdcBoundaries(es(0), es(1).eval().asInstanceOf[Long],
          es(2).eval().asInstanceOf[Int], es(3).eval().asInstanceOf[Int])
      }))

  def register(spark: SparkSession): Unit = all.foreach { case (id, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
