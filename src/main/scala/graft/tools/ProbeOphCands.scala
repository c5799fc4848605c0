package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attribution probe for the q42-vs-q4c warm gap at unique-heavy
  * fixtures: both faces run the SAME banding (32 bands), candidate
  * distinct, and exact-Jaccard verify over the SAME shingle relation —
  * the only difference is the signature estimator (dense 128-hash
  * MinHash vs one-permutation with rotation densification). This prints,
  * per estimator, the band-bucket collision mass Σ C(n,2) over
  * (band, bh) buckets — the candidate-join output BEFORE the distinct —
  * so the "OPH densification admits more false candidates" claim in
  * SCALE.md is a measured number, not an inference.
  *
  * `runMain graft.tools.ProbeOphCands <sfDir>`
  */
object ProbeOphCands {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val sh = graft.operators.Dedup.corpusShingles(spark, dir).cache()
    println(s"[probe] distinct contents: ${sh.count()}")
    def collisionMass(sig: DataFrame): Long =
      sig.select(col("cid"), posexplode(call_function("band_hashes",
          col("sig"), lit(32))))
        .groupBy(col("pos"), col("col")).count()
        .agg(sum(expr("count * (count - 1) DIV 2")))
        .head().getLong(0)
    val dense = sh.select(col("cid"),
      call_function("minhash_sigs", col("sh"), lit(128)).as("sig"))
    val oph = sh.select(col("cid"),
      call_function("oph_sig", col("sh"), lit(128)).as("sig"))
    println(s"[probe] dense band-collision mass: ${collisionMass(dense)}")
    println(s"[probe] oph   band-collision mass: ${collisionMass(oph)}")
    spark.stop()
  }
}
