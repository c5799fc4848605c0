package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Forced-codegen gate for every custom expression in the engine.
  *
  * Why this exists: a broken `doGenCode` template does NOT fail any
  * functional test — Spark catches the janino CompileException and falls
  * back to interpreted eval, so every oracle, golden, and bit-parity spec
  * stays green while each task silently pays a failed compile and loses
  * whole-stage codegen (the `nearest_cells` mis-parse shipped exactly this
  * way for a round). This suite closes that hole: one session runs with
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` and
  * `spark.sql.codegen.fallback=false`, so a template that fails to compile
  * is a thrown exception, not a swallowed log line. A sibling NO_CODEGEN
  * session evaluates the identical menu interpreted and the results must be
  * bit-identical — catching both compile failures AND codegen/interpreted
  * divergence in one pass.
  *
  * Menu = every expression registered in [[GraftFunctions.all]] plus
  * `float_array_dot` (reached only through the [[FloatDotRewrite]] optimizer
  * rule) and the [[Combinations]] generator (CodegenFallback by design — it
  * must still ANALYZE and RUN under the strict session). Inputs come from
  * `range()` (never a LocalRelation, so nothing constant-folds on the
  * driver) and row 0 carries empty arrays / empty strings to force the
  * empty-input branches through the generated code too.
  */
class CodegenOnlySpec extends AnyFunSuite with SparkSuite {

  private def derived(factoryMode: String, wholeStage: Boolean): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.factoryMode", factoryMode)
    s.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
    s.conf.set("spark.sql.codegen.fallback", "false")
    GraftFunctions.register(s)
    s
  }

  // strict: every projection/predicate MUST compile, WSC failures throw
  private lazy val codegenOnly = derived("CODEGEN_ONLY", wholeStage = true)
  // reference: pure interpreted eval of the same expressions
  private lazy val interpreted = derived("NO_CODEGEN", wholeStage = false)

  private val rnd = new scala.util.Random(42)
  private val dim = 8
  private val planes = Array.fill(4 * dim)(rnd.nextGaussian())  // nBits=4
  private val cents  = Array.fill(4 * dim)(rnd.nextGaussian())  // 4 cells
  private val cb     = Array.fill(2 * 4 * (dim / 2))(rnd.nextGaussian()) // m=2,k=4

  // one CMS sketch literal, built once on the shared session (build side is
  // Spark's own CountMinSketchAgg — the probe expression is what's under test)
  private lazy val sketch: Array[Byte] = {
    GraftFunctions.register(spark)
    inputs(spark).agg(call_function("cms_agg", col("id"),
      lit(0.001), lit(0.99), lit(42)).as("sk")).head.getAs[Array[Byte]]("sk")
  }

  /** Deterministic typed columns covering every input signature; row 0 is
    * the empty-collections row. */
  private def inputs(s: SparkSession): DataFrame =
    s.range(0, 48).select(
      col("id"),
      when(col("id") === 0, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(0L), pmod(col("id"), lit(17))),
          j => xxhash64(lit("h"), j, col("id")))).as("hs"),
      array_sort(array_distinct(transform(sequence(lit(0L), pmod(col("id"), lit(11))),
        j => pmod(xxhash64(j, col("id")), lit(37L))))).as("sa"),
      array_sort(array_distinct(transform(sequence(lit(0L), pmod(col("id") + 3, lit(11))),
        j => pmod(xxhash64(j, col("id") + 1), lit(37L))))).as("sb"),
      transform(sequence(lit(1L), lit(dim.toLong)),
        j => sin(j.cast("double") * (col("id") + 1))).as("vec"),
      transform(sequence(lit(1L), lit(dim.toLong)),
        j => cos(j.cast("double") * (col("id") + 2))).as("vec2"),
      when(col("id") === 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0L), pmod(col("id"), lit(9))),
          j => concat(lit("w"), pmod(j * 7 + col("id"), lit(13)).cast("string"))))
        .as("tokens"))
      .withColumn("vecf", col("vec").cast("array<float>"))
      .withColumn("vecf2", col("vec2").cast("array<float>"))
      .withColumn("norm", sqrt(call_function("array_dot", col("vec"), col("vec"))))
      .withColumn("txt", concat_ws(" ", col("tokens")))
      .withColumn("txt2", when(pmod(col("id"), lit(3)) === 0, col("txt"))
        .otherwise(concat(col("txt"), lit("x"))))
      .withColumn("bin", col("txt").cast("binary"))

  /** One projection exercising every registered scalar expression. */
  private def menu(df: DataFrame): DataFrame = df.select(
    col("id"),
    call_function("array_dot", col("vec"), col("vec2")).as("c_dot"),
    call_function("sorted_intersect_count", col("sa"), col("sb")).as("c_sic"),
    call_function("sign_buckets", col("vec"), lit(planes), lit(4)).as("c_sb"),
    call_function("minhash_sigs", col("hs"), lit(8)).as("c_mh"),
    call_function("minhash_sigs_portable", col("hs"), lit(8)).as("c_mhp"),
    call_function("md5_quad64", col("bin")).as("c_md5"),
    call_function("portable_gram_hashes", col("tokens"), lit(3)).as("c_pgh"),
    call_function("simhash64", col("hs")).as("c_sim"),
    call_function("oph_sig", col("hs"), lit(8)).as("c_oph"),
    call_function("nearest_cells", col("vec"), col("norm"),
      lit(cents), lit(2)).as("c_nc"),
    call_function("pq_encode", col("vec"), lit(cb), lit(2), lit(4)).as("c_pqe"),
    call_function("pq_adc", col("vec"),
      call_function("pq_encode", col("vec2"), lit(cb), lit(2), lit(4)),
      lit(cb), lit(2), lit(4)).as("c_adc"),
    call_function("cms_estimate", lit(sketch), col("id")).as("c_cms"),
    call_function("cdc_chunks", col("hs"), lit(7L), lit(2), lit(9)).as("c_cdc"),
    call_function("cdc_boundaries", col("hs"), lit(7L), lit(2), lit(9)).as("c_cdb"),
    call_function("edit1_dist", col("txt"), col("txt2")).as("c_ed"),
    call_function("shingle_hashes", col("tokens"), lit(3)).as("c_shh"),
    call_function("band_hashes",
      call_function("minhash_sigs", col("hs"), lit(16)), lit(4)).as("c_bh"))

  private def assertSameRows(got: Array[org.apache.spark.sql.Row],
      ref: Array[org.apache.spark.sql.Row]): Unit = {
    assert(got.length == ref.length)
    got.zip(ref).foreach { case (g, r) =>
      assert(g.toSeq == r.toSeq, s"codegen/interpreted divergence:\n  cg=$g\n  in=$r")
    }
  }

  test("every custom scalar expression compiles under CODEGEN_ONLY and is " +
      "bit-identical to interpreted eval") {
    val got = menu(inputs(codegenOnly)).orderBy("id").collect()
    val ref = menu(inputs(interpreted)).orderBy("id").collect()
    assert(got.length == 48)
    assertSameRows(got, ref)
  }

  test("combinations generator analyzes and runs under the strict session") {
    def q(s: SparkSession) = inputs(s)
      .select(col("id"), expr("combinations(sa, 2)").as("c"))
      .orderBy(col("id"), col("c"))
    assertSameRows(q(codegenOnly).collect(), q(interpreted).collect())
  }

  test("float_array_dot fires via FloatDotRewrite and compiles strict") {
    def q(s: SparkSession) = inputs(s).select(col("id"),
      call_function("array_dot",
        col("vecf").cast("array<double>"),
        col("vecf2").cast("array<double>")).as("fd")).orderBy("id")
    val cg = q(codegenOnly)
    val plan = cg.queryExecution.optimizedPlan.toString()
    assert(plan.contains("float_array_dot"),
      s"FloatDotRewrite did not fire on the derived session; plan:\n${plan.take(1500)}")
    assertSameRows(cg.collect(), q(interpreted).collect())
  }
}
