package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text analysis over `documents` (SURVEY.md §7 M5): per-document stats +
  * quality score, corpus token frequencies (the reference's own word-count
  * pattern, `SON.scala:261-262` A2), n-gram language identification, and
  * winnowing document fingerprints. All native column expressions.
  */
object TextOps {

  /** Per-document stats + a composite quality score. SQL-oracle-able: the
    * token definition (lowercase, split on \s+, drop empties) and the
    * arithmetic are mirrored exactly in DuckDB. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    textStatsOf(Tables(spark, dir, "documents"))

  /** [[textStats]] over any (doc_id, text) relation — the same plan serves
    * the parquet table and the binaryFile ingest path (q84), which is the
    * point: sources are interchangeable under the operator surface. */
  private[graft] def textStatsOf(documents: DataFrame): DataFrame = {
    val stop = Seq("the", "a", "of", "to", "and", "in", "is")
    documents
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        Dedup.tokensCol(col("text")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
      // token-less docs would divide by zero (NULL in Spark, inf in
      // DuckDB — engines disagree); stats are undefined for them anyway
      .where(col("n_tokens") > 0)
      .withColumn("n_uniq", size(array_distinct(col("tokens"))))
      .withColumn("n_stop", size(filter(col("tokens"),
        t => t.isin(stop.map(lit(_)): _*))))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("n_uniq"),
        round(col("n_stop").cast("double") / col("n_tokens"), 6).as("stop_ratio"),
        round(col("n_uniq").cast("double") / col("n_tokens"), 6).as("uniq_ratio"),
        round(
          least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.4 +
            (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) * 0.3 +
            col("n_uniq").cast("double") / col("n_tokens") * 0.3, 6).as("quality"))
      .orderBy("doc_id")
  }

  /** qa1: Zipf rank–frequency fit — the corpus-health diagnostic: a
    * natural corpus has log(freq) ≈ a − s·log(rank) with s near 1;
    * template/synthetic/boilerplate-heavy corpora bend the head or tail.
    * One token-keyed count, a rank over the VOCABULARY relation (≪
    * corpus — the aggregate-before-window discipline), and a single
    * regr_slope/intercept pass over the capped head where the law holds.
    * All arithmetic (ln, OLS aggregates) replays exactly in DuckDB. */
  def zipfFit(spark: SparkSession, dir: String, topN: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables(spark, dir, "documents")
      .select(explode(Dedup.tokensCol(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val ranked = counts.withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("token"))))
      .where(col("rank") <= topN)
    ranked.agg(
      round(regr_slope(log(col("freq")), log(col("rank"))), 6).as("zipf_slope"),
      round(regr_intercept(log(col("freq")), log(col("rank"))), 6)
        .as("zipf_intercept"),
      count(lit(1)).as("n_terms"))
  }

  /** Corpus token frequency top-k (word count = reference A2 pattern). */
  def tokenTopK(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(Dedup.tokensCol(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** GPT-2-style pre-tokenizer: a token is an optionally-space-prefixed
    * letter run, digit run, or punctuation run (the byte-BPE pre-split —
    * " fast" and a document-initial "fast" are distinct vocabulary
    * entries, exactly as in BPE vocabularies). Kept lookahead-free so the
    * same pattern runs identically under Java regex (Spark codegen) and
    * RE2 (DuckDB oracle). The merge step of real BPE needs a learned
    * vocabulary — out of scope; this is the tokenizer's distributed,
    * measurable half (corpus token statistics at training-data scale). */
  val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+"

  /** Corpus top-k under the BPE-ish pre-tokenizer: occurrences + document
    * frequency per token. */
  def bpeTokenTopK(spark: SparkSession, dir: String, k: Int = 25): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(expr(s"regexp_extract_all(lower(text), '$BpePattern', 0)"))
          .as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"), countDistinct("doc_id").as("docs"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Marker stopword lists for [[langId]] — shared with the q52 oracle
    * generator (SparkEntry builds the DuckDB SQL from this same map, so
    * engine and oracle can never drift). */
  private[graft] val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "que"))

  /** Language-ID heuristic: score each language by marker-token hit rate
    * (top stopwords per language) plus a CJK-codepoint ratio for zh.
    * Deterministic; oracled by SQL generated from [[LangMarkers]]. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val markers = LangMarkers
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), Dedup.tokensCol(col("text")).as("tokens"))
      .withColumn("n_tokens", greatest(size(col("tokens")), lit(1)))
    val scored = markers.foldLeft(base) { case (df, (lang, ws)) =>
      df.withColumn(s"score_$lang",
        size(filter(col("tokens"), t => t.isin(ws.map(lit(_)): _*)))
          .cast("double") / col("n_tokens"))
    }.withColumn("score_zh",
      (length(col("text")) - length(regexp_replace(col("text"), "[\\u4e00-\\u9fff]", "")))
        .cast("double") / greatest(length(col("text")), lit(1)))
    val langs = markers.keys.toSeq.sorted :+ "zh"
    // argmax over the per-language scores, ties broken alphabetically
    val best = langs.map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
      .reduce((a, b) => when(b("s") > a("s"), b).otherwise(a))
    scored.select(col("doc_id"), best.getField("l").as("lang_pred"),
        round(best.getField("s"), 6).as("score"))
      .orderBy("doc_id")
  }

  /** Training-data pipeline composition (the end-to-end shape this engine
    * exists for): exact-dedup to keeper docs → quality gate → per-language
    * corpus stats. Each stage is one of the standalone operators; the
    * composition stays a single declarative plan (no materialization
    * between stages), so Catalyst fuses the dedup semi-join with the
    * quality filter scan. */
  def cleanCorpusStats(spark: SparkSession, dir: String,
      minQuality: Double = 0.64): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val keepers = docs.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val quality = textStats(spark, dir).where(col("quality") >= minQuality)
      .select("doc_id", "n_tokens", "quality")
    docs.join(keepers, "doc_id").join(quality, "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        round(avg("quality"), 6).as("avg_quality"))
      .orderBy("lang")
  }

  /** Winnowing fingerprints (Schleimer et al.): rolling hash over word
    * 5-grams, keep the min of each 4-window, distinct. Output per doc:
    * fingerprint count + xor-fold (deterministic content signature). The
    * gram hash is [[Dedup.portableHash64]] (md5 low quadword) — winnowing
    * only needs SOME uniform hash, and the portable one makes the whole
    * face a DuckDB EQUALITY oracle (`md5_number_lower` replays the grams,
    * window mins, and xor-fold bit-for-bit) instead of a rows-only check. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("tokens"))
      // codegen'd gram pass (same strings/clamps/hashes as the HOF tree —
      // see [[graft.functions.PortableGramHashes]])
      .withColumn("grams",
        call_function("portable_gram_hashes", col("tokens"), lit(5)))
      .withColumn("fps", expr(
        "array_distinct(transform(sequence(0, greatest(size(grams) - 4, 0)), i -> " +
          "array_min(slice(grams, i + 1, 4))))"))
      .select(col("doc_id"), size(col("fps")).as("n_fp"),
        expr("aggregate(fps, 0L, (a, x) -> a ^ x)").as("fp_xor"))
      .orderBy("doc_id")
  }

  /** TF-IDF top-`k` terms per document: tf = in-doc count, df = number of
    * docs containing the term, score = tf · ln(N/df). Ranking ties are
    * broken on the INTEGER triple (tf desc, df asc, term asc), never on the
    * float score — ranks stay bit-identical cross-engine even where two
    * libm `ln`s disagree in the last ulp; the score column itself travels
    * rounded to 6 dp. Three aggregations and one broadcast of the corpus
    * count; df is a term-keyed aggregate of the tf relation (no second
    * corpus scan). At 100 TB the tf relation shuffles on (doc, term) once
    * and everything else derives from it. */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("tokens"))
      .where(size(col("tokens")) > 0)
    val tf = docs.select(col("doc_id"), explode(col("tokens")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** qaw: emerging/receding terms — smoothed log-odds of each token's
    * frequency between two corpus epochs (the drift detector that says
    * WHICH tokens moved, where q8w's JSD says only HOW MUCH). Epochs are
    * the doc_id parity halves (documents carry no timestamp; the split
    * is the deterministic stand-in for ingestion batches). Add-one
    * smoothing keeps epoch-exclusive tokens finite; a min-total floor
    * keeps the tail noise out. Two token-keyed counts + one join; the
    * top movers in each direction, tagged. */
  def emergingTerms(spark: SparkSession, dir: String, minTotal: Int = 30,
      k: Int = 10): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select((col("doc_id") % 2 === 1).as("is_new"),
        explode(Dedup.tokensCol(col("text"))).as("token"))
    val counts = toks.groupBy("token")
      .agg(sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("is_new"), 0L).otherwise(1L)).as("n_old"))
      .where(col("n_new") + col("n_old") >= minTotal)
    val totals = counts.agg(sum("n_new").as("t_new"), sum("n_old").as("t_old"),
      count(lit(1)).as("v"))
    val scored = counts.crossJoin(broadcast(totals))
      .select(col("token"), col("n_old"), col("n_new"),
        round(log((col("n_new") + lit(1.0)) / (col("t_new") + col("v"))
          / ((col("n_old") + lit(1.0)) / (col("t_old") + col("v")))), 6)
          .as("log_odds"))
    val rising = graft.plans.TopKPerGroup(scored.withColumn("g", lit(1)),
        Seq("g"), Seq(("log_odds", true), ("token", false)), k, "rank")
      .select(lit("rising").as("direction"), col("rank"), col("token"),
        col("n_old"), col("n_new"), col("log_odds"))
    val falling = graft.plans.TopKPerGroup(scored.withColumn("g", lit(1)),
        Seq("g"), Seq(("log_odds", false), ("token", false)), k, "rank")
      .select(lit("falling").as("direction"), col("rank"), col("token"),
        col("n_old"), col("n_new"), col("log_odds"))
    rising.unionByName(falling).orderBy("direction", "rank")
  }

  /** qb1: bigram-LM cross-entropy / perplexity of the held-out split —
    * the data-quality scorer one tier above q8g's unigram model: train
    * counts (even doc_ids) smooth with add-½ over the train vocabulary,
    * eval docs (odd) score every adjacent pair, unseen contexts fall
    * out of the same formula via coalesce(0). High-perplexity docs are
    * boilerplate/garbled/wrong-language candidates. The model relations
    * are vocabulary-sized (broadcast); the eval side shuffles once on
    * the bigram key. */
  def bigramPerplexity(spark: SparkSession, dir: String,
      k: Double = 0.5): DataFrame = {
    val grams2 = docNgrams(spark, dir, 2, distinctPerDoc = false)
    val train2 = grams2.where(col("doc_id") % 2 === 0)
      .groupBy("gram").agg(count(lit(1)).as("c_ab"))
    val train1 = docNgrams(spark, dir, 1, distinctPerDoc = false)
      .where(col("doc_id") % 2 === 0)
      .groupBy("gram").agg(count(lit(1)).as("c_a"))
    val vocab = train1.agg(count(lit(1)).as("v"))
    val scored = grams2.where(col("doc_id") % 2 === 1)
      .join(broadcast(train2), Seq("gram"), "left")
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .join(broadcast(train1.withColumnRenamed("gram", "w1")), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log((coalesce(col("c_ab"), lit(0L)) + lit(k))
          / (coalesce(col("c_a"), lit(0L)) + lit(k) * col("v"))).as("lp"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum("lp") / count(lit(1)), 6).as("cross_entropy"),
        round(exp(-sum("lp") / count(lit(1))), 4).as("perplexity"))
      .orderBy("doc_id")
  }

  /** qay: dedup savings report — what exact dedup (q40's md5 groups)
    * would save, per source: docs and characters removed if every
    * non-keeper is dropped. The economics view of the dedup family; one
    * hash-keyed aggregate (keeper = min doc_id per digest, the q40
    * policy) joined back to the corpus, then a source-keyed rollup. */
  def dedupSavings(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("h"))
    val keepers = docs.groupBy("h").agg(min("doc_id").as("keeper"))
    docs.join(keepers, "h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L))
          .as("n_dupes"),
        sum("n_chars").as("chars_total"),
        sum(when(col("doc_id") =!= col("keeper"), col("n_chars"))
          .otherwise(0L)).as("chars_saved"))
      .withColumn("savings_ratio",
        round(col("chars_saved").cast("double") / col("chars_total"), 6))
      .orderBy("source")
  }

  /** qao: BM25 ranked retrieval — the lexical-search scoring function
    * (Robertson/Okapi) over the corpus, for a deterministic 5-term query
    * (document-frequency ranks 11–15, mid-frequency terms that actually
    * discriminate). Classic engine shape: the query-term relation (5
    * rows, with df + idf precomputed) broadcasts against the (doc, term)
    * tf relation, so only matching postings are scored — the corpus
    * never shuffles on anything wider than its own tf aggregate. The
    * k1/b length normalization uses the corpus average doc length, a
    * broadcast scalar. Score = Σ idf·tf·(k1+1)/(tf + k1·(1−b+b·len/avg)),
    * idf = ln((N − df + 0.5)/(df + 0.5) + 1) — one rounded output. */
  def bm25(spark: SparkSession, dir: String, k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("tokens"))
      .where(size(col("tokens")) > 0)
    val lens = docs.select(col("doc_id"), size(col("tokens")).as("len"))
    val tf = docs.select(col("doc_id"), explode(col("tokens")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(lens.agg(avg("len").as("avg_len")))
    val qterms = df
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("df").desc, col("term"))))
      .where(col("r").between(11, 15))
      .crossJoin(broadcast(stats))
      .select(col("term"), col("df"),
        log((col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5)) + lit(1.0)).as("idf"),
        col("avg_len"))
    tf.join(broadcast(qterms), "term")
      .join(lens, "doc_id")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"),
        round(sum(col("idf") * col("tf") * (lit(k1) + 1)
          / (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("len")
            / col("avg_len")))), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** (doc_id, gram) word n-gram relation; docs shorter than `n` contribute
    * nothing (`sequence` is only reached behind the size guard — Spark's
    * `sequence(0, -1)` would count DOWN, not return empty). */
  private def docNgrams(spark: SparkSession, dir: String, n: Int,
      distinctPerDoc: Boolean): DataFrame = {
    val grams = transform(
      sequence(lit(0), size(col("tokens")) - n),
      i => concat_ws(" ", slice(col("tokens"), i + 1, lit(n))))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("tokens"))
      .where(size(col("tokens")) >= n)
      .select(col("doc_id"),
        explode(if (distinctPerDoc) array_distinct(grams) else grams).as("gram"))
  }

  /** Train/benchmark decontamination — the pre-training hygiene pass: any
    * training document sharing a word `n`-gram with the benchmark split is
    * flagged with its overlap count and ratio. Split is doc_id mod 10
    * (scale-invariant; a real run would join against the actual benchmark
    * corpus). Grams travel as strings so the oracle is hash-free; at 100 TB
    * you'd xxhash64 them (same join shape, 8-byte keys) and broadcast the
    * benchmark side — real benchmark suites are tiny next to the corpus,
    * so the corpus-side relation never shuffles. */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val grams = docNgrams(spark, dir, n, distinctPerDoc = true)
    val bench = grams.where(col("doc_id") % 10 === 0)
      .select("gram").distinct()
    val train = grams.where(col("doc_id") % 10 =!= 0)
    val perDoc = train.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val contam = train.join(broadcast(bench), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    perDoc.join(contam, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") / col("n_grams"), 6)
          .as("contamination"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition quality gate: top-token fraction, duplicate-
    * token fraction, top-bigram fraction, and the keep flag. Mechanically:
    * two (doc, gram)-keyed counts, each collapsed per doc with max+sum —
    * the same partial-aggregate shape as word count, so the corpus text is
    * read once and nothing beyond the (doc, gram) shuffle moves. Docs with
    * a single token carry no bigram and are excluded (gate undefined).
    * Thresholds sit at the observed corpus medians so both outcomes are
    * exercised; production values come from the paper, not the fixture. */
  def repetitionQuality(spark: SparkSession, dir: String,
      maxTopTokenFrac: Double = 0.10, maxTopBigramFrac: Double = 0.04): DataFrame = {
    val tokCounts = docNgrams(spark, dir, 1, distinctPerDoc = false)
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
    val tokStats = tokCounts.groupBy("doc_id").agg(
      sum("c").as("n_tokens"), max("c").as("top_c"), count(lit(1)).as("n_uniq"))
    val bgCounts = docNgrams(spark, dir, 2, distinctPerDoc = false)
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
    val bgStats = bgCounts.groupBy("doc_id").agg(
      sum("c").as("n_bg"), max("c").as("top_bg_c"))
    tokStats.join(bgStats, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        round(col("top_c").cast("double") / col("n_tokens"), 6)
          .as("top_token_frac"),
        round(lit(1.0) - col("n_uniq").cast("double") / col("n_tokens"), 6)
          .as("dup_token_frac"),
        round(col("top_bg_c").cast("double") / col("n_bg"), 6)
          .as("top_bigram_frac"))
      .withColumn("keep",
        col("top_token_frac") <= maxTopTokenFrac &&
          col("top_bigram_frac") <= maxTopBigramFrac)
      .orderBy("doc_id")
  }

  /** Corpus bigram top-k (occurrences + document frequency) — vocabulary /
    * collocation statistics, the 2-gram tier of [[tokenTopK]]. */
  def bigramTopK(spark: SparkSession, dir: String, k: Int = 25): DataFrame =
    docNgrams(spark, dir, 2, distinctPerDoc = false)
      .groupBy("gram")
      .agg(count(lit(1)).as("n"), countDistinct("doc_id").as("docs"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)

  /** qac: pointwise mutual information of adjacent word pairs — the
    * collocation detector ("new york" scores high, "of the" scores ~0)
    * that vocabulary induction and phrase-mining passes run on a corpus.
    * PMI(a,b) = ln( P(ab) / (P(a)·P(b)) ) with bigram/unigram MLE
    * probabilities; a min-count floor keeps the estimate out of the
    * noisy tail. Three token-keyed aggregates + two joins of the bigram
    * relation against the (vocabulary-sized, hence broadcastable) unigram
    * counts; the corpus text is scanned twice and nothing larger than
    * (grams × 1 row) shuffles. Only the final PMI is rounded. */
  def bigramPmi(spark: SparkSession, dir: String, minCount: Int = 20,
      k: Int = 50): DataFrame = {
    val uni = docNgrams(spark, dir, 1, distinctPerDoc = false)
      .groupBy("gram").agg(count(lit(1)).as("n_tok"))
    val nTok = uni.agg(sum("n_tok").as("total_tok"))
    val bg = docNgrams(spark, dir, 2, distinctPerDoc = false)
      .groupBy("gram").agg(count(lit(1)).as("n_bg"))
      .where(col("n_bg") >= minCount)
    val nBg = bg.agg(sum("n_bg").as("total_bg"))
    val w = split(col("gram"), " ")
    bg.select(col("gram"), w.getItem(0).as("w1"), w.getItem(1).as("w2"),
        col("n_bg"))
      .join(broadcast(uni.select(col("gram").as("w1"), col("n_tok").as("n1"))),
        "w1")
      .join(broadcast(uni.select(col("gram").as("w2"), col("n_tok").as("n2"))),
        "w2")
      .crossJoin(broadcast(nBg)).crossJoin(broadcast(nTok))
      .select(col("gram"), col("n_bg"), col("n1"), col("n2"),
        round(log(col("n_bg").cast("double") / col("total_bg")
          / (col("n1").cast("double") / col("total_tok"))
          / (col("n2").cast("double") / col("total_tok"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("gram"))
      .limit(k)
  }

  /** qaj: tokenizer fertility per language — BPE-ish subword tokens
    * emitted per whitespace word, the metric that decides whether a
    * tokenizer (and hence a context window) is efficient for a given
    * language mix. Corpus-level fertility uses the sum/sum form (never
    * avg-of-ratios) beside the per-doc average; both engines evaluate
    * the same RE2-safe pattern ([[BpePattern]]) so counts are identical
    * and only the final ratios are rounded. Pure per-row regex work +
    * one lang-keyed aggregate: one shuffle of 25 rows per language. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang"),
        size(expr(s"regexp_extract_all(lower(text), '$BpePattern', 0)"))
          .cast("double").as("bpe"),
        size(Dedup.tokensCol(col("text"))).cast("double").as("words"))
      .where(col("words") > 0)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("bpe").cast("long").as("n_bpe_tokens"),
        sum("words").cast("long").as("n_words"),
        round(sum("bpe") / sum("words"), 6).as("corpus_fertility"),
        round(avg(col("bpe") / col("words")), 6).as("avg_doc_fertility"))
      .orderBy("lang")

  /** Fixed-size token chunking with overlap (stride < size) — the RAG /
    * context-window preparation shape: chunk c covers tokens
    * [c·stride, c·stride + size). Emits (doc_id, chunk_id, n_chunk_tokens,
    * md5-of-chunk); md5 so the oracle can recompute the text content
    * without hauling whole chunks through the compare. Pure per-row
    * explode: embarrassingly parallel, no shuffle before the output sort. */
  def chunkDocs(spark: SparkSession, dir: String, chunkSize: Int = 64,
      stride: Int = 48): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("tokens"))
      .where(size(col("tokens")) > 0)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("tokens")) - 1,
          lit(stride)),
        s => concat_ws(" ", slice(col("tokens"), s + 1, lit(chunkSize))))))
      .select(col("doc_id"), col("pos").as("chunk_id"),
        size(split(col("col"), " ")).as("n_chunk_tokens"),
        md5(col("col").cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  /** Cross-document repeated n-gram spans — the exact-substring face of
    * dedup (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): every distinct word `n`-gram window of every document,
    * counted across the corpus; a window seen in ≥ 2 documents is a
    * repeated span. Per document: window count, how many of its windows
    * recur elsewhere, and the repeated fraction (the doc's verbatim-overlap
    * exposure). Mechanically a two-level aggregation — (doc, window) →
    * window df → join back — in which windows travel ONLY as xxhash64
    * keys: the shuffle moves 8-byte hashes, never window text, so the
    * shape is the word-count shuffle at any scale (collisions at 64 bits
    * are ~n²/2⁶⁵ — immaterial against corpus-level fractions, and the
    * DuckDB oracle, which compares on the true strings, agrees on the
    * fixture). The df side is (distinct windows) rows — for a corpus with
    * real repetition it concentrates exactly where the data does. */
  def repeatedNgrams(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val wins = Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("tokens"))
      .where(size(col("tokens")) >= n)
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(0), size(col("tokens")) - n),
        i => xxhash64(concat_ws(" ", slice(col("tokens"), i + 1, lit(n))))))).as("wh"))
    val df = wins.groupBy("wh").agg(count(lit(1)).as("nd"))
    wins.join(df, "wh")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_repeated"),
        round(avg(when(col("nd") > 1, 1.0).otherwise(0.0)), 6).as("repeated_frac"))
      .orderBy("doc_id")
  }

  /** Corpus-unigram language-model scoring — the classic cheap quality /
    * outlier signal: p(token) is its corpus relative frequency, a document
    * scores the mean log₁₀ p of its tokens (more negative ⇒ rarer
    * vocabulary). Two passes over the same exploded tokens: a frequency
    * aggregation (map-side combined word count), then a broadcast join of
    * the frequency table back onto the token stream — the frequency
    * relation is VOCABULARY-sized, orders of magnitude smaller than the
    * corpus, which is why the scoring join broadcasts and the corpus never
    * shuffles at all. At 100 TB the vocabulary table would be built once
    * and reused across scoring runs (same lifecycle as the IVF centroids).
    * Oracle: identical arithmetic in DuckDB (sum of log10 over doubles,
    * rounded to 6dp after the divide). */
  def unigramLogProb(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(Dedup.tokensCol(col("text"))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    // total token count folded in as a literal-free cross join of a 1-row
    // aggregate (broadcast, not collected — keeps the plan lazy/composable)
    val total = freq.agg(sum("c").as("tot"))
    toks.join(broadcast(freq), "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        round(sum(log10(col("c").cast("double") / col("tot"))) / count(lit(1)), 6)
          .as("avg_log10p"))
      .orderBy("doc_id")
  }

  /** Content-defined chunk dedup statistics: tokens → PORTABLE md5-quadword
    * hash stream → [[graft.functions.CdcBoundaries]] boundary positions
    * (mask 7 ⇒ ~11-token expected chunks, clamped to [4, 32]) → chunk
    * identity = md5 of the chunk's raw token text → per-document chunk
    * count plus how many of its chunks also occur in ANOTHER document. The
    * CDC twin of [[repeatedNgrams]]: variable-width spans that survive
    * insertions (boundaries re-synchronize on content), against the same
    * two-level hash-keyed aggregation shape.
    *
    * Everything here is cross-engine replayable — the boundary hash is
    * md5_number_lower, the boundary scan is a recursive length-carrying
    * walk, and the chunk key hashes the chunk's own text — so the face
    * carries a FULL DuckDB equality oracle (the xxhash64-fold form it
    * replaces could only be spec-checked: its chunk identity was an
    * engine-private hash chain). The boundary scanner is a single-pass
    * codegen'd expression sharing [[graft.functions.CdcChunks]]'s rule
    * bit-for-bit (TextOpsSpec asserts the two scans agree); nothing wider
    * than (doc_id, chunk_hash) ever shuffles. */
  def cdcChunkStats(spark: SparkSession, dir: String, mask: Long = 7L,
      minLen: Int = 4, maxLen: Int = 32): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val bounded = Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("tokens"))
      .where(size(col("tokens")) > 0)
      .withColumn("ends", call_function("cdc_boundaries",
        transform(col("tokens"),
          t => call_function("md5_quad64", t.cast("binary"))),
        lit(mask), lit(minLen), lit(maxLen)))
    // chunk spans: starts = 0 ++ ends[:-1]; chunk c covers token positions
    // (start, end] — the key hashes the SPAN TEXT, so equal spans match
    // across documents regardless of which boundaries framed them
    val chunks = bounded
      .select(col("doc_id"), col("tokens"), explode(zip_with(
        concat(array(lit(0)),
          slice(col("ends"), lit(1), greatest(size(col("ends")) - 1, lit(0)))),
        col("ends"),
        (s, e) => struct(s.as("s"), e.as("e")))).as("c"))
      .select(col("doc_id"), call_function("md5_quad64",
        concat_ws(" ", slice(col("tokens"), col("c.s") + 1,
          col("c.e") - col("c.s"))).cast("binary")).as("ch"))
      .distinct()
    val df = chunks.groupBy("ch").agg(count(lit(1)).as("nd"))
    chunks.join(df, "ch")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
      .orderBy("doc_id")
  }

  /** Token-offset packing: documents in doc_id order are laid into
    * fixed-budget token bins by their global start offset — the
    * deterministic sharding step before sequence packing. The global
    * prefix sum is the two-level scan: per-block sums (one tiny relation)
    * prefix-summed on the driver-sized side, then within-block running
    * sums under a partitioned window — no single-partition window over the
    * corpus, so the shape survives 100 TB. */
  def packSequences(spark: SparkSession, dir: String, budget: Int = 256,
      blockSize: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("tokens"))
      .select(col("doc_id"),
        size(col("tokens")).as("n_tokens"),
        (col("doc_id") / blockSize).cast("long").as("blk"))
    // block offsets: |corpus|/blockSize rows — the only global window, over
    // a relation that is tiny by construction
    val blkOff = base.groupBy("blk").agg(sum("n_tokens").as("blk_sum"))
      .withColumn("blk_off", coalesce(
        sum("blk_sum").over(Window.orderBy("blk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("blk", "blk_off")
    val w = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(blkOff), "blk")
      .withColumn("start_off",
        col("blk_off") + coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        floor(col("start_off") / budget).as("bin"))
      .orderBy("doc_id")
  }

  /** q8q: PII scrubbing — redact email addresses and long digit runs, the
    * hygiene pass a training corpus gets before anything else. Patterns
    * are lookahead-free so the SAME regex runs under Java regex (Spark
    * codegen'd `regexp_replace`) and RE2 (DuckDB oracle). The fixture
    * text contains no PII, so a deterministic synthetic email + numeric id
    * is planted on every 5th doc as a pure function of doc_id — mirrored
    * exactly in the oracle — and the scrub then has real matches to find.
    * Redaction order is pinned (emails first, then digit runs) so the
    * digit-run count never double-counts digits inside an address.
    * Per-row map over the corpus: no shuffle, trivially 100 TB-safe. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val email = "[a-z0-9._-]+@[a-z0-9-]+\\.[a-z]{2,}"
    val digits = "[0-9][0-9][0-9]+"
    val planted = when(pmod(col("doc_id"), lit(5)) === 0,
      concat(lit("contact user"), col("doc_id"), lit("@example.com ref "),
        col("doc_id") * lit(7919L), lit(" "), col("text")))
      .otherwise(col("text"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), planted.as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(email), lit(0))).as("n_emails"),
        regexp_replace(col("t"), email, "<EMAIL>").as("t2"))
      .select(col("doc_id"), col("n_emails"),
        size(regexp_extract_all(col("t2"), lit(digits), lit(0))).as("n_digit_runs"),
        regexp_replace(col("t2"), digits, "<NUM>").as("clean_text"))
      .orderBy("doc_id")
  }

  /** q8r: per-document token-distribution Shannon entropy (bits) — the
    * information-density quality signal (degenerate low-entropy docs are
    * boilerplate/spam; see also the repetition gate q81). Two token-keyed
    * aggregates + one doc-keyed join; every stage is map-side-combinable
    * and keyed by doc_id, so the shape is one shuffle wave at any scale.
    * Σ-of-doubles is order-insensitive far below the 6-dp rounding. */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(Dedup.tokensCol(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val tot = tf.groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("vocab"))
    tf.join(tot, "doc_id")
      .groupBy(col("doc_id"), col("n"), col("vocab"))
      .agg(round(-sum(col("c") / col("n") * log2(col("c") / col("n"))), 6)
        .as("entropy_bits"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("vocab"),
        col("entropy_bits"))
      .orderBy("doc_id")
  }

  /** q9h: vocabulary-growth (Heaps) curve — cumulative corpus tokens vs
    * cumulative distinct vocabulary at each document, in doc_id order.
    * The sub-linear growth is the curve capacity/tokenizer planning reads
    * off. Each token's vocabulary contribution is its FIRST document
    * (one token-keyed min), so the curve is two prefix sums over a
    * docs-sized relation. The single global window here is the fixture
    * form; at corpus scale the identical prefix sums run as q86's
    * two-level block scan ([[packSequences]]). */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val firstDoc = docs
      .select(col("doc_id"), explode(Dedup.tokensCol(col("text"))).as("token"))
      .groupBy("token").agg(min("doc_id").as("first_doc"))
    val newPerDoc = firstDoc.groupBy("first_doc")
      .agg(count(lit(1)).as("new_terms"))
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.select(col("doc_id"), size(Dedup.tokensCol(col("text"))).as("n_tokens"))
      .join(newPerDoc, col("doc_id") === col("first_doc"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .select(col("doc_id"),
        sum("n_tokens").over(w).as("cum_tokens"),
        sum("new_terms").over(w).as("cum_vocab"))
      .orderBy("doc_id")
  }

  /** q9j: per-document token-length morphology via HIGHER-ORDER array
    * functions — `transform`/`aggregate`/`filter` lambdas evaluated
    * per-row with no explode (the array never leaves the row), mirrored
    * exactly by DuckDB's list_transform/list_sum/list_filter. The HOF
    * surface was exercised inside operators; this pins it cross-engine
    * as a query. Pure map over the scan — no shuffle. */
  def tokenLengthStats(spark: SparkSession, dir: String): DataFrame = {
    val lens = transform(col("t"), x => length(x))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("t"))
      .where(size(col("t")) > 0)
      .select(col("doc_id"),
        size(col("t")).as("n_tokens"),
        round(aggregate(lens, lit(0), (a, x) => a + x).cast("double") /
          size(col("t")), 6).as("avg_len"),
        array_max(lens).as("max_len"),
        size(filter(col("t"), x => length(x) >= 7)).as("n_long"))
      .orderBy("doc_id")
  }

  /** q8w: train/validation token-distribution drift as Jensen–Shannon
    * divergence (bits) — the dataset-shift monitor run between corpus
    * snapshots or split halves. Split is the q57 pure-arithmetic hash (so
    * the oracle reproduces it bit-for-bit); both distributions come out of
    * ONE token-keyed aggregate (conditional sums), the totals relation is
    * a broadcast scalar, and the JSD reduce is a global agg over the
    * vocabulary — corpus text is read once and never re-shuffled. */
  def jsdDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .withColumn("part",
        when(Sampling.hashFraction(col("doc_id")) < 0.9, "train")
          .otherwise("val"))
    val counts = docs
      .select(col("part"), explode(Dedup.tokensCol(col("text"))).as("token"))
      .groupBy("token").agg(
        sum(when(col("part") === "train", 1L).otherwise(0L)).as("ca"),
        sum(when(col("part") === "val", 1L).otherwise(0L)).as("cb"))
    val tot = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    counts.crossJoin(broadcast(tot))
      .select(col("ca"), col("cb"), col("na"), col("nb"),
        (col("ca") / col("na")).as("p"), (col("cb") / col("nb")).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .agg(count(lit(1)).as("vocab"),
        max("na").as("n_train"), max("nb").as("n_val"),
        round((sum(when(col("p") > 0, col("p") * log2(col("p") / col("m")))
            .otherwise(0.0)) +
          sum(when(col("q") > 0, col("q") * log2(col("q") / col("m")))
            .otherwise(0.0))) / 2, 6).as("jsd_bits"))
  }

  /** qbd: concat-and-cut packing manifest — GPT-style pretraining packs
    * the corpus by concatenating token streams in a fixed order and
    * cutting fixed-`budget` windows; a document's tokens land at a global
    * START OFFSET and may straddle window boundaries (the attention-mask
    * segment ids handle that downstream). This face emits the manifest:
    * per doc, its token count, global start offset, first/last window
    * and windows spanned. The prefix sum is the scalable two-phase shape,
    * NOT a global-order window (which would move the corpus to one
    * partition): range-repartition by doc_id, per-partition partial sums,
    * a partitions-sized offset relation (32 rows) cumulated and broadcast
    * back, local window per partition. All-integer output — bit-identical
    * cross-engine, so the DuckDB oracle replays the global cumsum
    * directly. */
  def packingManifest(spark: SparkSession, dir: String,
      budget: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(Dedup.tokensCol(col("text"))).as("n_tokens"))
      .repartitionByRange(32, col("doc_id"))
      .withColumn("pid", spark_partition_id())
    // partition totals -> cumulative offset per partition (32 rows: the
    // single-partition window here is over the PARTITION COUNT, not data)
    val offs = docs.groupBy("pid").agg(sum("n_tokens").as("ptot"))
      .withColumn("off",
        coalesce(sum("ptot").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "off")
    val local = Window.partitionBy("pid").orderBy("doc_id")
    docs.join(broadcast(offs), "pid")
      .withColumn("start",
        col("off") + sum("n_tokens").over(local) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start"),
        floor(col("start") / budget).as("seq_first"),
        floor((col("start") + col("n_tokens") - 1) / budget).as("seq_last"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1L)
      .orderBy("doc_id")
  }

  /** qbi: cross-document boilerplate detection — the word n-grams shared
    * by the most DISTINCT document contents (headers, footers, license
    * blocks, templated passages: the repeated-passage mass that inflates
    * a training corpus without adding signal; [[repeatedNgrams]] is the
    * WITHIN-document twin of this signal). Emits the top `k` grams by
    * (distinct contents containing it, then total docs, then gram), with
    * both counts: `n_contents` ignores exact copies, `n_docs` weights
    * them back in — a gram carried only by exact duplicates of one
    * content is q40's business, not boilerplate.
    *
    * Scale shape: the exact-dup collapse runs FIRST (groupBy md5 of the
    * content — q40's hash), so gram explosion happens once per distinct
    * content no matter how duplicate-heavy the corpus is; per-content
    * grams are deduped BEFORE the corpus-wide shuffle (array_distinct on
    * the window list, map-side); the gram aggregation is a partial-agged
    * groupBy with a top-k cut (TakeOrderedAndProject — no global sort
    * materializes). Grams travel as strings here so the oracle is
    * hash-free; at 100 TB they'd travel as [[graft.functions
    * .PortableGramHashes]] 8-byte keys with `min(gram)` carried for
    * display — same plan, narrower shuffle. */
  def boilerplateGrams(spark: SparkSession, dir: String, n: Int = 8,
      minContents: Long = 2, k: Int = 50): DataFrame = {
    val contents = Tables(spark, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("ch"))
      .agg(count(lit(1)).as("n_copies"), min("text").as("text"))
    val grams = contents
      .select(col("n_copies"), Dedup.tokensCol(col("text")).as("tokens"))
      .where(size(col("tokens")) >= n)
      .select(col("n_copies"), explode(array_distinct(transform(
          sequence(lit(0), size(col("tokens")) - n),
          i => concat_ws(" ", slice(col("tokens"), i + 1, lit(n))))))
        .as("gram"))
    grams.groupBy("gram")
      .agg(sum("n_copies").as("n_docs"), count(lit(1)).as("n_contents"))
      .where(col("n_contents") >= minContents)
      .orderBy(col("n_contents").desc, col("n_docs").desc, col("gram"))
      .limit(k)
  }

  /** qbk: per-document duplicated-span fraction — for each doc, the share
    * of its distinct word 8-grams that also occur in at least one OTHER
    * distinct content (the doc-level twin of [[boilerplateGrams]]: qbi
    * names the corpus's repeated passages, this scores each document by
    * how much of it is repeated passage — the "fraction of duplicated
    * spans" curation signal used to drop template-heavy pages that exact
    * and near dedup both keep, since no single pair is similar enough).
    *
    * Scale shape: everything runs at the DISTINCT-CONTENT level (q40's
    * md5 collapse first, re-expanded to docs by one hash join at the
    * end), grams travel as portable 8-byte [[graft.functions
    * .PortableGramHashes]] keys, per-content grams are deduped map-side
    * BEFORE the corpus shuffle, and the share test is a count-join on
    * the gram-hash key (co-partitioned with the counting groupBy, so AQE
    * reuses the exchange). No all-pairs anywhere; linear in distinct
    * content. The ratio is emitted as an integer permille (floor), so
    * the DuckDB oracle is exact-equality, no float summation order.
    *
    * Reference anchor: the corpus-frequency discipline of
    * `SON.scala:260-263` (count globally, then judge each member against
    * the global count). */
  def dupSpanRatio(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("ch"))
    val contents = Tables(spark, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("ch"))
      .agg(min("text").as("text"))
    // window clamp matches PortableGramHashes/the q53 oracle: a doc with
    // < n tokens still contributes one truncated gram (empty text → the
    // hash of ""), so every doc_id appears in the output
    val grams = contents
      .select(col("ch"), explode(array_distinct(call_function(
          "portable_gram_hashes",
          Dedup.tokensCol(col("text")), lit(n)))).as("g"))
    val counts = grams.groupBy("g").agg(count(lit(1)).as("nc"))
    val perContent = grams.join(counts, "g")
      .groupBy("ch")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nc") >= 2, 1L).otherwise(0L)).as("n_shared"))
    docs.join(perContent, "ch")
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        floor(col("n_shared") * 1000L / col("n_grams")).as("dup_permille"))
      .orderBy("doc_id")
  }

  /** qbm: cross-document repeated-span SCRUB — rewrites each document with
    * every token covered by a shared word 8-gram removed (a gram is shared
    * when it occurs in ≥ 2 DISTINCT contents, [[dupSpanRatio]]'s
    * definition). This is the transform counterpart of qbk's score: qbk
    * decides which docs are template-heavy, this produces the cleaned
    * token stream for the docs that stay — the "remove duplicated
    * substrings" step of exact-substring dedup pipelines, over the
    * normalized (lowercased, whitespace-split) token stream like every
    * gram face.
    *
    * Scale shape: all heavy work at the DISTINCT-CONTENT level. Window
    * enumeration is one codegen'd [[graft.functions.PortableGramHashes]]
    * pass (positional, so coverage is reconstructible); the shared-gram
    * test is the same count-join as qbk (8-byte keys, partial-agged); the
    * coverage set and the token re-assembly are per-content group-bys
    * whose group width is bounded by document length, never corpus size.
    * Re-expansion to doc_ids is one content-hash join. Everything is
    * linear in token count — the same budget as tokenization itself. */
  def spanScrub(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("ch"))
    val contents = Tables(spark, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("ch"))
      .agg(min("text").as("text"))
      .select(col("ch"), Dedup.tokensCol(col("text")).as("tokens"))
      .select(col("ch"), col("tokens"), size(col("tokens")).as("n_tokens"))
    // positional windows (0-based), duplicates kept — coverage needs the
    // positions; the short-doc clamp emits one truncated window at pos 0
    val wins = contents
      .select(col("ch"), col("n_tokens"), posexplode(call_function(
        "portable_gram_hashes", col("tokens"), lit(n))))
      .toDF("ch", "n_tokens", "pos", "g")
    val shared = wins.select("ch", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("nc"))
      .where(col("nc") >= 2).select("g")
    // covered token positions: i .. min(i+n-1, n_tokens-1); the greatest()
    // clamp keeps sequence() ascending on empty-token docs (harmless
    // phantom position 0 — no token row exists to match it)
    val covered = wins.join(shared, "g")
      .select(col("ch"), explode(sequence(col("pos"),
        greatest(least(col("pos") + (n - 1), col("n_tokens") - 1),
          col("pos")))).as("p"))
      .distinct()
    val toks = contents
      .select(col("ch"), posexplode(col("tokens"))).toDF("ch", "p", "tok")
    val kept = toks.join(covered, Seq("ch", "p"), "left_anti")
      .groupBy("ch")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("p"),
          col("tok")))), s => s.getField("tok")), " ").as("clean_text"))
    docs.join(contents.select(col("ch"), col("n_tokens")), "ch")
      .join(kept, Seq("ch"), "left")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        (col("n_tokens").cast("long") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** qbl: model-based quality scoring — a linear text classifier over
    * hashed token features with PINNED integer weights, the
    * fasttext-style "quality model" gate of LLM data pipelines expressed
    * as pure column arithmetic. Each token hashes ([[graft.functions
    * .Md5Quad64]]) into one of 256 feature buckets; each bucket carries a
    * deterministic weight in [-1000, 1000] (an LCG over the bucket id —
    * standing in for trained coefficients, which would arrive as a
    * 256-entry broadcast map with the identical plan); a document's score
    * is the frequency-weighted integer sum, and `keep` is the
    * positive-score gate. Integer end-to-end: no float summation order,
    * so the DuckDB oracle is exact equality — and at 100 TB the same
    * property makes the score reproducible across partitionings.
    *
    * Scale shape: one narrow projection, one codegen'd per-token pass,
    * one partial-agged groupBy on doc_id (map-side combine does almost
    * all the work since tokens of a doc are co-located by construction).
    * No shuffle wider than (doc_id, two longs). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(call_function("md5_quad64",
      col("token").cast("binary")), lit(256L))
    val weight = pmod(bucket * 1103515245L + 12345L, lit(2001L)) - 1000L
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(Dedup.tokensCol(col("text"))).as("token"))
      .select(col("doc_id"), weight.as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("qscore"))
      .withColumn("keep", col("qscore") > 0L)
      .orderBy("doc_id")
  }

  /** Pinned-hash Count-Min register table over the corpus token stream:
    * `depth` independent rows, bucket_i(token) = md5_quad64(i ‖ ':' ‖
    * token) mod `width`. This is the CMS *construction* made exactly
    * SQL-replayable — width a power of two so the signed pmod equals
    * DuckDB's unsigned `md5_number_lower % width` (2^64 ≡ 0), the same
    * identity the q43/qbl portable-hash faces rest on. The production
    * sketch tier (q19/q8b, Spark's mergeable CountMinSketchAgg) stays as
    * is; this face shrinks the "sketches are non-SQL" exemption by
    * proving the register arithmetic end-to-end against DuckDB.
    *
    * Scale shape: the depth-explode is map-local and the groupBy has at
    * most depth×width (1024) cells, so partial aggregation collapses the
    * whole token stream map-side — bytes crossing the exchange are
    * O(partitions × cells), independent of corpus size. */
  def cmsPinned(spark: SparkSession, dir: String,
      depth: Int = 4, width: Long = 256L): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(Dedup.tokensCol(col("text"))).as("token"))
      .select(explode(sequence(lit(0L), lit(depth - 1L))).as("row_i"),
        col("token"))
      .select(col("row_i"),
        pmod(call_function("md5_quad64",
          concat(col("row_i").cast("string"), lit(":"), col("token"))
            .cast("binary")), lit(width)).as("bucket"))
      .groupBy("row_i", "bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("row_i", "bucket")

  /** Pinned-hash HyperLogLog register table (p = 8, 256 registers) over
    * the corpus token stream: register = top p bits of the unsigned
    * md5_quad64, rank = position of the first 1-bit in the remaining
    * 64−p bits (all-zero remainder ⇒ 64−p+1). The rank is computed by
    * the same string route in both engines — `bin()` of the nonnegative
    * remainder is minimal-length binary in Spark and DuckDB, so
    * `(64−p+1) − length(bin(rem))` is exact integer arithmetic with no
    * float log2 near-boundary risk. Like [[cmsPinned]], this proves the
    * sketch construction in SQL while q19's approx_count_distinct
    * remains the production estimator; the register table is what a
    * 1000-executor merge actually exchanges (max per register is
    * associative/commutative — partial agg collapses map-side to ≤ 256
    * cells per partition). */
  def hllRegisters(spark: SparkSession, dir: String, p: Int = 8): DataFrame = {
    val remBits = 64 - p
    Tables(spark, dir, "documents")
      .select(explode(Dedup.tokensCol(col("text"))).as("token"))
      // h materialized once per token; reg/rem derive from the projected
      // column so the md5 never evaluates twice on the hot token stream
      .select(call_function("md5_quad64", col("token").cast("binary")).as("h"))
      .select(shiftrightunsigned(col("h"), remBits).as("reg"),
        col("h").bitwiseAND(lit((1L << remBits) - 1)).as("rem"))
      .select(col("reg"),
        when(col("rem") === 0L, lit(remBits + 1L))
          .otherwise(lit(remBits + 1L) - length(bin(col("rem"))))
          .cast("long").as("rank"))
      .groupBy("reg")
      .agg(max("rank").as("max_rank"))
      .orderBy("reg")
  }
}
