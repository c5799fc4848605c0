package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deterministic sampling / dataset-splitting operators — the
  * train/val/test assignment step of a training-data pipeline. The split
  * must be a pure function of a stable id (never `rand()`): reruns,
  * retries and incremental appends all have to land every row in the
  * same split, and two engines must agree on it, which is also what
  * makes the assignment DuckDB-oracle-able.
  */
object Sampling {

  /** Knuth's multiplicative hash → [0, 1): cheap, stains no engine-
    * specific hash (plain BIGINT arithmetic reproduces anywhere), and
    * decorrelates the split from id order so range-correlated features
    * don't leak into one split. Ids must be non-negative. */
  private[operators] def hashFraction(id: Column): Column =
    pmod(id * lit(2654435761L), lit(4294967296L)) / lit(4294967296.0)

  /** Assign each row to a named split by cumulative weight over
    * [[hashFraction]]. `weights` are (name, weight), weight sum ≤ 1;
    * any residue falls into the last split. */
  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    val frac = hashFraction(col(idCol))
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    val expr = weights.zip(cum).init.foldRight(
        lit(weights.last._1): Column) { case (((name, _), hi), els) =>
      when(frac < hi, name).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** Stratified deterministic sample: per-stratum keep-fractions (e.g.
    * downsample an over-represented language), same pure-arithmetic
    * [[hashFraction]] — reproducible, append-stable, oracle-able. Strata
    * not in `fractions` keep `default`. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (els, (s, f)) =>
      when(col(strataCol) === s, f).otherwise(els)
    }
    df.where(hashFraction(col(idCol)) < frac)
  }

  /** q76: rebalance the corpus — keep 50% of English, 10% of everything
    * else, deterministically by doc_id. */
  def rebalanceByLang(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables(spark, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.5), default = 0.1)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** q57: the 90/5/5 train/val/test assignment of the document corpus —
    * full per-doc assignment (not just counts), so the oracle pins every
    * row's placement. */
  def trainValTest(spark: SparkSession, dir: String): DataFrame =
    hashSplit(Tables(spark, dir, "documents").select("doc_id"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select("doc_id", "split")
      .orderBy("doc_id")

  /** q8k: deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-Res): each row draws key = u^(1/w) from the
    * SAME pure-arithmetic uniform as [[hashFraction]] (so the draw is a
    * function of the row id — rerun/append-stable and oracle-able), and
    * the sample is the global top-k by key. Expected composition is
    * proportional to the per-source weights WITHOUT a shuffle per source:
    * the plan is scan → map (key) → TakeOrderedAndProject (per-partition
    * k-heaps + driver merge of k rows) — at 100 TB the only thing that
    * moves is partitions × k rows. Ranking uses the 6-dp-rounded key with
    * doc_id tie-break (cross-engine stable, same discipline as the ANN
    * rank shape). */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val w = when(col("source") === "src0", 4.0)
      .when(col("source") === "src1", 2.0)
      .otherwise(1.0)
    docs.select(col("doc_id"), col("source"), w.as("w"),
        round(pow(hashFraction(col("doc_id")), lit(1.0) / w), 6).as("skey"))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(k)
  }

  /** q8u: source-mixture (temperature) sampling weights — w_s ∝ n_s^α,
    * the standard multi-source rebalance (α<1 upweights small sources,
    * α=1 is proportional): per-source weight and expected docs for one
    * epoch of `epochDocs`. One source-keyed count (map-side combined),
    * then a broadcast scalar normalizer — the corpus itself never
    * shuffles, and the weights relation is sources-sized (tiny) at any
    * corpus scale. These weights FEED [[weightedSample]] (q8k) as the
    * per-source `w`. */
  /** q9u: deterministic negative sampling — the contrastive-training
    * primitive: each document draws `k` pseudo-random negatives, as a
    * pure function of (doc_id, k) via [[hashFraction]] so reruns,
    * appends and both engines agree. The draw is an OFFSET in
    * [1, n−1] added mod n, which can never land on the document itself —
    * no rejection loop, no second pass. One broadcast scalar (the corpus
    * count) and a k-row generator per document: linear, shuffle-free,
    * and the output is exactly |docs| × k rows at any scale.
    * (Contract note: ids are assumed dense 0..n−1, as the fixture's are;
    * sparse ids would first map through a rank relation.) */
  def negativePairs(spark: SparkSession, dir: String, k: Int = 4): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id")
    val n = docs.agg(count(lit(1)).as("n"))
    docs.crossJoin(broadcast(n))
      .select(col("doc_id"),
        explode(sequence(lit(0L), lit(k - 1L))).as("k"), col("n"))
      .withColumn("u", hashFraction(col("doc_id") * k + col("k")))
      .select(col("doc_id"), col("k").cast("int").as("k"),
        pmod(col("doc_id") + 1L + floor(col("u") * (col("n") - 1)),
          col("n")).as("neg_id"))
      .orderBy("doc_id", "k")
  }

  /** q9v: leave-one-out temporal split — the standard recsys/eval
    * protocol: each user's LAST event (by ts, event_id tie-break) is the
    * eval item, everything earlier is train. Splitting on time per user
    * (never randomly across a user's history) is what keeps future
    * interactions out of the training side. One window per user
    * partition — a single shuffle by user_id, no global ordering. */
  def leaveOneOutSplit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .select(col("user_id"), col("event_id"),
        when(col("rn") === 1, "eval").otherwise("train").as("split"))
      .orderBy("user_id", "event_id")
  }

  /** qa4: approximate aggregation by deterministic sampling — the
    * interactive-speed estimate pattern: a p-fraction Bernoulli sample
    * (keyed by [[hashFraction]], so both engines draw the IDENTICAL
    * sample and the result is exactly replayable), the Horvitz–Thompson
    * scale-up for the total, and a normal-approximation 95% interval
    * from the in-sample variance. At 100 TB the sample predicate sits in
    * the scan (no shuffle until the scalar agg), and the estimate reads
    * p of the data for a 1/√(pN) relative error — the knob a real
    * engine's APPROXIMATE clause turns. */
  def sampledEstimate(spark: SparkSession, dir: String,
      p: Double = 0.05): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .where(hashFraction(col("l_orderkey") * 7L + col("l_linenumber")) < p)
    li.agg(count(lit(1)).as("n_sample"),
        sum("l_extendedprice").as("s"),
        sum(col("l_extendedprice") * col("l_extendedprice")).as("s2"))
      .select(col("n_sample"),
        round(col("s") / p, 2).as("est_total"),
        round((col("s") / col("n_sample")) -
          lit(1.96) * sqrt((col("s2") / col("n_sample") -
            (col("s") / col("n_sample")) * (col("s") / col("n_sample"))) /
            col("n_sample")), 2).as("avg_lo"),
        round((col("s") / col("n_sample")) +
          lit(1.96) * sqrt((col("s2") / col("n_sample") -
            (col("s") / col("n_sample")) * (col("s") / col("n_sample"))) /
            col("n_sample")), 2).as("avg_hi"))
  }

  def mixtureWeights(spark: SparkSession, dir: String, alpha: Double = 0.7,
      epochDocs: Long = 10000L): DataFrame = {
    val n = Tables(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
    val z = n.agg(sum(pow(col("n"), lit(alpha))).as("z"))
    n.crossJoin(broadcast(z))
      .select(col("source"), col("n"),
        round(pow(col("n"), lit(alpha)) / col("z"), 6).as("weight"),
        round(pow(col("n"), lit(alpha)) / col("z") * epochDocs, 2)
          .as("expected_docs"))
      .orderBy("source")
  }

  /** qap: two-sample Kolmogorov–Smirnov drift statistic between the
    * hash-split halves of the order-total distribution — the continuous
    * counterpart of the categorical JSD drift check (q8w): D = max over
    * x of |F_a(x) − F_b(x)|. Evaluated EXACTLY: group by distinct value
    * (ties collapse before the CDF, the textbook treatment), one global
    * ordered window for the two running CDFs, one max. The window runs
    * over the distinct-value relation, not the rows; at 100 TB you'd
    * quantize x into ~1e6 bins first (same plan, bounded axis) — the
    * statistic is insensitive to binning far below the noise floor. The
    * split replays the q57 portable hash arithmetic. */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    val side = ((col("o_orderkey") * lit(2654435761L)) % lit(4294967296L))
      .cast("double") / lit(4294967296.0) < 0.5
    val perValue = Tables(spark, dir, "orders")
      .select(col("o_totalprice").as("x"), side.as("is_a"))
      .groupBy("x")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("is_a"), 0L).otherwise(1L)).as("nb"))
    val w = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perValue
      .select(col("x"), sum("na").over(w).as("ca"), sum("nb").over(w).as("cb"))
      .crossJoin(broadcast(perValue.agg(sum("na").as("ta"), sum("nb").as("tb"))))
      .agg(min("ta").as("n_a"), min("tb").as("n_b"),
        round(max(abs(col("ca").cast("double") / col("ta")
          - col("cb").cast("double") / col("tb"))), 6).as("ks_stat"))
  }

  /** qak: deterministic epoch shuffle + sharding — the global permutation
    * a training run applies each epoch, as a DATAFLOW: the multiplicative
    * hash is the permutation key, shard = hash mod nShards spreads docs
    * uniformly WITHOUT a global sort, and each shard's read order is a
    * per-shard window rank (partition-parallel — no cross-shard
    * coordination, which is what makes this the 100 TB shape; a global
    * row_number would serialize on one partition). Different seed →
    * different permutation, same code path. */
  def epochShuffle(spark: SparkSession, dir: String, nShards: Int = 8,
      seed: Long = 1L): DataFrame = {
    val h = ((col("doc_id") + lit(seed)) * lit(2654435761L)) % lit(4294967296L)
    Tables(spark, dir, "documents").select(col("doc_id"))
      .withColumn("h", h)
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy("h", "doc_id"))
          .cast("long") - 1L)
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")
  }

  /** qbc: NEAR-DUP-AWARE train/val/test split — the leakage guard q57
    * alone cannot give: hash-splitting documents independently puts two
    * near-identical documents on opposite sides of the train/test wall
    * (the classic eval-contamination path), so the split key must be the
    * near-dup GROUP, not the document. Composes two oracle-checked
    * kernels: [[Dedup.dedupGroups]] labels every grouped doc with its
    * connected-component group id (ungrouped docs are their own group),
    * and [[hashSplit]]'s pure-arithmetic fraction assigns the GROUP —
    * every member inherits the group's split, so no near-dup pair ever
    * straddles splits (spec-pinned). Scale: one left join of the corpus
    * against the (small) grouped relation + the stateless split
    * arithmetic; the dedup-group build is q56's own bounded shape. */
  def groupAwareSplit(spark: SparkSession, dir: String,
      weights: Seq[(String, Double)] = Seq(
        "train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id")
    val groups = Dedup.dedupGroups(spark, dir)
      .select(col("doc_id"), col("group_id"))
    val keyed = docs.join(groups, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("group_id"), col("doc_id")).as("group_id"))
    hashSplit(keyed, "group_id", weights)
      .select("doc_id", "group_id", "split")
      .orderBy("doc_id")
  }

  /** Per-source quota cap (domain balancing): keep at most `k` documents
    * per source, chosen deterministically as the k smallest portable
    * hashes of the doc id — a pure function of (source, doc_id), so
    * reruns and incremental appends keep every surviving doc stable
    * until its source's quota actually fills with smaller hashes. The
    * sort key is the md5 quadword mod 2^32 (power of two, so the signed
    * pmod equals DuckDB's unsigned modulo) with doc_id as tie-break.
    *
    * Runs through the custom [[graft.plans.TopKPerGroup]] physical
    * operator, not a window: per-partition bounded heaps mean only
    * `partitions × k` rows per source reach the exchange — at 100 TB a
    * window formulation would shuffle and sort every row of the corpus,
    * this shuffles ~k rows per (source, partition). */
  def sourceQuota(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val qk = pmod(call_function("md5_quad64",
        concat(lit("quota:"), col("doc_id").cast("string")).cast("binary")),
      lit(4294967296L))
    val keyed = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"), qk.as("qk"))
    graft.plans.TopKPerGroup(keyed, Seq("source"),
        Seq(("qk", false), ("doc_id", false)), k)
      .select(col("source"), col("doc_id"), col("rn").cast("long").as("rn"))
      .orderBy("source", "rn")
  }
}
