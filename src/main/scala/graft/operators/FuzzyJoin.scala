package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fuzzy (edit-distance) self-join via deletion-neighborhood blocking —
  * the SymSpell/FastSS family: every string emits itself plus its
  * |s| single-character-deletion variants; two strings at Levenshtein
  * distance ≤ 1 ALWAYS share a variant (substitution at position p ⇒ both
  * minus char p are equal; insertion/deletion ⇒ the shorter string IS one
  * of the longer's variants), so joining on the variant key is a complete
  * candidate generator — no O(N²) compare. The exact `levenshtein` check
  * afterwards removes the false positives (distinct variants can collide
  * across distance-2 pairs).
  *
  * Scale shape: the exploded relation is |rows| × (len+1) keys — linear —
  * and block sizes are bounded by how many strings share a variant
  * (near-unique keys on real identifier-like data), so the equi-join is
  * candidate-bounded the same way the MinHash band join is. Naive
  * prefix/segment blocking degenerates on shared-prefix data (every
  * "Customer#..." lands in one block); deletion neighborhoods do not,
  * because the key is the (almost) whole string. Cost grows as
  * O(Σ len · k) for distance k (variants = all k-deletion combinations);
  * k ≤ 2 is the practical envelope, which is exactly the dedup use case.
  */
object FuzzyJoin {

  /** All pairs of customer names within Levenshtein distance `maxDist`
    * (default 1). Candidates from the deletion neighborhood, verified with
    * Spark's threshold form of `levenshtein` (early-exits past the bound).
    * Oracle: DuckDB's exact all-pairs `levenshtein` — a hash match proves
    * the blocking lost nothing on the fixture. */
  def customerNamePairs(spark: SparkSession, dir: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist == 1, "deletion neighborhood implemented for k = 1")
    val c = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val nbh = c.select(col("id"), col("name"),
      explode(array_distinct(expr(
        """array_append(
          |  transform(sequence(1, length(name)),
          |    i -> concat(substr(name, 1, i - 1), substr(name, i + 1, length(name)))),
          |  name)""".stripMargin))).as("variant"))
    val cand = nbh.as("a")
      .join(nbh.as("b"),
        col("a.variant") === col("b.variant") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.name").as("name_a"),
        col("b.id").as("id_b"), col("b.name").as("name_b"))
      .distinct()
    cand
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
      .orderBy("id_a", "id_b")
  }
}
