package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ExpressionsSpec extends AnyFunSuite with SparkSuite {

  test("array_dot matches the HOF formulation and survives codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val rows = df.select(
      call_function("array_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.head.getDouble(0) == 32.0)
  }

  test("array_dot agrees with HOF on real embeddings (whole fixture)") {
    GraftFunctions.register(spark)
    val e = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = e.select((call_function("array_dot", col("v"), col("v")) -
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)).as("diff"))
      .where(abs(col("diff")) > 1e-12).count()
    assert(n == 0)
  }

  test("combinations generator enumerates sorted k-subsets") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Seq(1L, 2L, 3L, 4L)).toDF("items")
    val combos = df.select(expr("combinations(items, 2)").as("c"))
      .collect().map(_.getSeq[Long](0).toList)
    assert(combos.toList == List(List(1L, 2L), List(1L, 3L), List(1L, 4L),
      List(2L, 3L), List(2L, 4L), List(3L, 4L)))
    val empty = df.select(expr("combinations(items, 5)")).count()
    assert(empty == 0)
  }

  test("FloatDotRewrite collapses cast+array_dot into float_array_dot") {
    val q = graft.operators.Similarity.cosineTopKNative(spark, sfDir)
    val optimized = q.queryExecution.optimizedPlan.toString()
    assert(optimized.contains("float_array_dot"),
      s"rule did not fire; plan:\n${optimized.take(2000)}")
    assert(!optimized.contains("array_dot(cast"), "cast+dot survived the rewrite")
    // bit-identical to the un-rewritten double path
    val viaDouble = graft.operators.Similarity.cosineTopK(spark, sfDir)
      .collect().map(_.toSeq)
    assert(q.collect().map(_.toSeq).sameElements(viaDouble))
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted arrays") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted,
      Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        call_function("sorted_intersect_count", col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(bad == 0)
    // empty arrays
    val z = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
      .select(call_function("sorted_intersect_count", col("a"), col("b"))).head.getInt(0)
    assert(z == 0)
  }

  test("SQL surface can use the injected functions directly") {
    // session built with spark.sql.extensions=GraftExtensions
    val r = spark.sql("SELECT array_dot(array(1D, 2D), array(3D, 4D)) AS d").head
    assert(r.getDouble(0) == 11.0)
  }

  test("minhash_sigs_portable matches the driver-side affine-map reference") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val golden = graft.functions.PortableMinHash.Golden
    // unsigned min of h*(2i+1) + i*golden over the input, per permutation —
    // the exact integer semantics the DuckDB q41 oracle replays in HUGEINT
    def ref(hs: Seq[Long], n: Int): Seq[Long] =
      (0 until n).map { i =>
        hs.map(h => h * (2L * i + 1L) + i * golden)
          .reduceOption((a, b) => if (java.lang.Long.compareUnsigned(a, b) < 0) a else b)
          .getOrElse(-1L)
      }
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)(Seq.fill(rnd.nextInt(30))(rnd.nextLong())) :+ Seq.empty[Long]
    val got = rows.toDF("hs")
      .select(call_function("minhash_sigs_portable", col("hs"), lit(16)).as("sig"))
      .collect().map(_.getSeq[Long](0).toSeq)
    rows.zip(got).foreach { case (hs, sig) =>
      assert(sig == ref(hs, 16), s"portable minhash diverges for input $hs")
    }
  }

  test("portable_gram_hashes is bit-parity with the HOF md5-per-gram tree") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def word() = Seq.fill(1 + rnd.nextInt(8))(
      ('a' + rnd.nextInt(26)).toChar).mkString
    // lengths straddle every clamp branch: 0 (empty-string gram), 1, 2
    // (truncated windows), k, and > k
    val rows = Seq(Seq.empty[String], Seq(word()), Seq(word(), word())) ++
      Seq.fill(50)(Seq.fill(rnd.nextInt(12))(word()))
    for (k <- Seq(3, 5)) {
      val got = rows.toDF("tokens").select(
        call_function("portable_gram_hashes", col("tokens"), lit(k)).as("native"),
        transform(sequence(lit(0), greatest(size(col("tokens")) - k, lit(0))),
          i => call_function("md5_quad64",
            concat_ws(" ", slice(col("tokens"), i + 1, lit(k))).cast("binary")))
          .as("hof")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"portable_gram_hashes diverges from the HOF tree at k=$k")
      }
    }
  }
}
