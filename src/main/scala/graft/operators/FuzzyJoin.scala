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
    * the blocking lost nothing on the fixture.
    *
    * Plan notes (vs the first-cut HOF formulation): the variant list is
    * built by exploding a POSITION range and deriving each deletion with
    * plain `substring`/`concat` — scalar expressions that stay inside
    * WholeStageCodegen, where `transform(sequence(...), i -> ...)` ran
    * interpreted lambdas (2.3 s → ~0.2 s on the sf0.1 neighborhood build).
    * The join key is `xxhash64(variant)` (8 bytes) rather than the variant
    * string, both join sides are the same plan so the shuffle is written
    * once and read twice (ReusedExchange), and the exact-distance filter
    * runs BEFORE deduplication so the final `distinct` shuffles only true
    * pairs with a narrow (id, id, dist) key instead of every wide
    * candidate row. Hash collisions cannot create false accepts (the
    * levenshtein verify rejects them); they can only add candidates.
    */
  def customerNamePairs(spark: SparkSession, dir: String,
      maxDist: Int = 1): DataFrame =
    // presentation face: the global sort exists for the query contract
    // only — internal consumers ([[entities]]) take the unsorted relation,
    // since feeding a sorted stream into CC's shuffle throws the sort away
    namePairs(spark, dir, maxDist).orderBy("id_a", "id_b")

  /** Distinct-name match edges (name_a < name_b, dist ∈ {0?, 1}): the
    * blocked fuzzy kernel at NAME level — everything record-level
    * (pair faces, entity labels) derives from this relation, which is
    * bounded by the distinct-name universe regardless of how many records
    * share a name. */
  private[operators] def nameEdges(spark: SparkSession, dir: String,
      maxDist: Int = 1, maxBucket: Option[Int] = None): DataFrame = {
    require(maxDist == 1, "deletion neighborhood implemented for k = 1")
    // ER-standard duplicate collapse: the fuzzy stage runs over DISTINCT
    // name STRINGS, not records — g exact copies of one name would
    // otherwise multiply every variant bucket's occupancy by g and the
    // candidate pair count by g² (measured: a 10×-replicated corpus took
    // the id-level join from 1.2 s to 67 s).
    val names = Tables(spark, dir, "customer")
      .select(col("c_name").as("name")).distinct()
    // p = 0 keeps the string itself; p >= 1 deletes character p. Deleting
    // ANY character of a run of equal characters yields the same variant
    // ("…000…" has one deletion variant, not three) — emitting them all
    // would square per-variant multiplicity through the self-join — so
    // only the LAST position of each run emits: each distinct variant
    // exactly once, as a filter instead of an array_distinct pass.
    val nbhAll = names
      .select(col("name"),
        explode(sequence(lit(0), length(col("name")))).as("p"))
      .where(col("p") === 0 || col("p") === length(col("name")) ||
        col("name").substr(col("p"), lit(1)) =!=
          col("name").substr(col("p") + 1, lit(1)))
      .select(col("name"),
        xxhash64(when(col("p") === 0, col("name")).otherwise(concat(
          col("name").substr(lit(1), col("p") - 1),
          col("name").substr(col("p") + 1, length(col("name")))))).as("vh"))
    // Pair-budget guard (the qb8 hot-item discipline): a variant bucket of
    // occupancy g contributes ~g² candidate pairs, so one pathological
    // bucket — a boilerplate name family, a template string — can square
    // the join. With a cap, hot buckets are semi-joined away BEFORE pair
    // enumeration; matches only discoverable through a hot bucket are
    // knowingly dropped (bounded recall loss, the same trade qb8 makes),
    // everything else still surfaces through its other variants.
    val nbh = maxBucket match {
      case None => nbhAll
      case Some(cap) =>
        val hot = nbhAll.groupBy("vh").agg(count(lit(1)).as("occ"))
          .where(col("occ") > cap).select("vh")
        nbhAll.join(hot, Seq("vh"), "left_anti")
    }
    graft.functions.GraftFunctions.register(spark)
    // edit1_dist == levenshtein(a, b, 1) by contract (0 / 1 / -1), but
    // O(len) two-pointer instead of the banded DP — the verify stage was
    // ~4.5 µs/pair of levenshtein over every candidate
    nbh.as("a")
      .join(nbh.as("b"), col("a.vh") === col("b.vh") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .withColumn("dist",
        call_function("edit1_dist", col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** Record-level pair expansion of [[nameEdges]]: same-name groups emit
    * their C(g,2) dist-0 pairs, cross-name matches the g_a×g_b product —
    * joins linear in OUTPUT size, the quadratic floor no PAIR-emitting
    * query can undercut (entity labels avoid it entirely — see
    * [[entities]]). */
  private[operators] def namePairs(spark: SparkSession, dir: String,
      maxDist: Int = 1, maxBucket: Option[Int] = None): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val sameName = c.as("x")
      .join(c.as("y"), col("x.name") === col("y.name") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), lit(0L).as("dist"))
    val crossName = nameEdges(spark, dir, maxDist, maxBucket)
      .join(c.as("x"), col("x.name") === col("name_a"))
      .join(c.as("y"), col("y.name") === col("name_b"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"), col("dist"))
    // the two legs are disjoint (equal vs unequal names) and each is
    // duplicate-free, so a plain union suffices — no final distinct shuffle
    sameName.unionAll(crossName)
  }

  /** q9q: entity resolution — the full record-linkage pipeline composed
    * from verified kernels: blocked fuzzy matching ([[customerNamePairs]])
    * emits the match edges, connected components
    * ([[GraphOps.componentsAuto]], min-id labels) clusters transitively
    * linked records, and every record maps to its canonical entity id
    * (the cluster's minimum custkey; unmatched records stay their own
    * entity) with the cluster size alongside. Transitivity is the point:
    * pairwise matching alone leaves A~B, B~C unresolved as one entity.
    * Scale: the edge relation is candidate-bounded by the deletion-
    * neighborhood blocking, CC is the tiered driver/distributed kernel,
    * and the size join is an aggregation of the labels relation — nothing
    * here is quadratic in records. Oracle: DuckDB recursive-CTE reachable
    * closure over the exact all-pairs levenshtein edges, min per record. */
  def entities(spark: SparkSession, dir: String): DataFrame =
    entitiesByName(spark, dir, maxBucket = None)

  /** qba: [[entities]] with the pair-budget guard engaged — the face a
    * duplicate-heavy 100 TB corpus runs, where an unbounded variant bucket
    * would square the candidate join (the q9q sf1 lesson: the 13.6× curve
    * was pair-count-bound). `maxBucket` bounds per-bucket candidate fan-in;
    * on clean fixtures no bucket is hot, so the output equals q9q's and the
    * oracle mirrors the cap on the variant STRINGS (hashing is a bucket-
    * preserving relabeling at fixture scale). */
  def entitiesCapped(spark: SparkSession, dir: String,
      maxBucket: Int = 64): DataFrame =
    entitiesByName(spark, dir, maxBucket = Some(maxBucket))

  /** Label assignment WITHOUT record-level pair expansion — the shape that
    * keeps q9q linear in records under heavy duplication (the sf1 run
    * measured 13.6× wall at 10×-replicated names, entirely in the C(g,2)/
    * g_a×g_b pair materialization, which labels never needed): CC runs on
    * the distinct-NAME graph (vertex = a name's minimum custkey, edges =
    * [[nameEdges]] matches), and records join their name's component label
    * back in one linear pass. The induced record partition is identical to
    * CC over the expanded record graph (same-name records are a clique
    * there; cross-name edges connect whole name groups), and so is the
    * label: every record's custkey ≥ its name's minimum, so the min nid of
    * a component IS the min custkey of its records. */
  private def entitiesByName(spark: SparkSession, dir: String,
      maxBucket: Option[Int]): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val nameId = c.groupBy("name").agg(min("id").as("nid"))
    val edges = nameEdges(spark, dir, maxBucket = maxBucket)
      .join(nameId.as("na"), col("name_a") === col("na.name"))
      .join(nameId.as("nb"), col("name_b") === col("nb.name"))
      .select(col("na.nid").as("u"), col("nb.nid").as("v"))
    val comp = GraphOps.componentsAuto(spark, edges)
    val recNid = c.join(nameId, "name").select(col("id"), col("nid"))
    val labeled = recNid.join(comp, recNid("nid") === comp("vertex"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("nid")).as("entity"))
    val sizes = labeled.groupBy("entity").agg(count(lit(1)).as("n_members"))
    labeled.join(sizes, "entity")
      .select(col("id"), col("entity"), col("n_members"))
      .orderBy("id")
  }
}
