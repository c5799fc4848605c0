package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Round-9 faces: cross-document boilerplate grams (qbi) and the
  * SemDeDup-style semantic-dedup decision table (qbj). Both are full
  * DuckDB-oracle faces; these specs pin the semantics the oracle can't
  * see from the fixture alone — the brute-force recompute for qbi, and
  * for qbj a staged two-pole corpus where the copy-group resolution,
  * within-cell NN, and keep-lowest-id verdicts are all hand-checkable. */
class Round9Spec extends AnyFunSuite with SparkSuite {

  test("boilerplateGrams matches a driver-side brute-force recompute") {
    val out = TextOps.boilerplateGrams(spark, sfDir).collect()
      .map(r => (r.getAs[String]("gram"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_contents"))).toSeq
    assert(out.nonEmpty && out.forall(_._3 >= 2))
    val texts = graft.Tables(spark, sfDir, "documents").collect()
      .map(_.getAs[String]("text")).toSeq
    val byContent = texts.groupBy(identity).map { case (t, c) => (t, c.size.toLong) }
    def grams(t: String): Set[String] = t.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).sliding(8).filter(_.length == 8)
      .map(_.mkString(" ")).toSet
    val agg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    byContent.foreach { case (t, copies) =>
      grams(t).foreach { g =>
        val (nd, nc) = agg.getOrElse(g, (0L, 0L))
        agg(g) = (nd + copies, nc + 1)
      }
    }
    val expect = agg.toSeq.collect { case (g, (nd, nc)) if nc >= 2 => (g, nd, nc) }
      .sortBy { case (g, nd, nc) => (-nc, -nd, g) }.take(50)
    assert(out == expect)
  }

  test("semanticDedup on the fixture: total, no false dups, sane NNs") {
    val n = graft.Tables(spark, sfDir, "embeddings").count()
    val rows = Similarity.semanticDedup(spark, sfDir).collect()
    assert(rows.length == n.toInt) // one decision row per vector
    // the fixture's embeddings are near-orthogonal (max pairwise cosine
    // ~0.48), so nothing may be flagged at tau = 0.9
    assert(rows.forall(!_.getAs[Boolean]("is_semdup")))
    rows.filter(!_.isNullAt(2)).foreach { r =>
      assert(r.getAs[Long]("nn_id") != r.getAs[Long]("vec_id"))
    }
  }

  /** Two poles A=(1,0,0,0), B=(0,1,0,0); rotations at known angles give
    * hand-computable cosines. vecs 0,1,2 = A exactly (a copy group);
    * 3 = A rotated 18deg (cos .951); 4 = 45deg (cos .707, and .891 to 3);
    * 5 = B; 6 = B rotated 18deg; 7 = 45deg; 8 = 80deg; 9 = -10deg
    * (cos .985 to 5). nCells=2 makes the stride-sample centroids exactly
    * vec 0 (pole A) and vec 5 (pole B). */
  private lazy val stagedDir: String = {
    val dir = Files.createTempDirectory("semdedup").toString
    def rotA(deg: Double) = { val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, 0f, math.sin(r).toFloat, 0f) }
    def rotB(deg: Double) = { val r = math.toRadians(deg)
      Array(0f, math.cos(r).toFloat, 0f, math.sin(r).toFloat) }
    val vecs: Seq[(Long, Array[Float])] = Seq(
      0L -> rotA(0), 1L -> rotA(0), 2L -> rotA(0), 3L -> rotA(18),
      4L -> rotA(45), 5L -> rotB(0), 6L -> rotB(18), 7L -> rotB(45),
      8L -> rotB(80), 9L -> rotB(-10))
    import spark.implicits._
    vecs.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("semanticDedup staged poles: copy groups, NN, keep-lowest verdicts") {
    val rows = Similarity.semanticDedup(spark, stagedDir, nCells = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cell"), if (r.isNullAt(2)) -1L else r.getAs[Long]("nn_id"),
          r.getAs[Double]("nn_cos"), r.getAs[Boolean]("is_semdup")))).toMap
    assert(rows.size == 10)
    // copy group {0,1,2}: min pairs with second-lowest at cosine 1.0 and
    // survives; the copies pair with the min and are flagged
    assert(rows(0L) == ((0L, 1L, 1.0, false)))
    assert(rows(1L) == ((0L, 0L, 1.0, true)))
    assert(rows(2L) == ((0L, 0L, 1.0, true)))
    // 3 is a near-dup of the A group (cos 18deg = .951 >= .9, nn_id 0 < 3)
    assert(rows(3L)._2 == 0L && rows(3L)._3 > 0.9 && rows(3L)._4)
    // 4's best neighbor is 3 (cos 27deg = .891) - under the threshold
    assert(rows(4L)._2 == 3L && rows(4L)._3 < 0.9 && !rows(4L)._4)
    // 5 is pole B's keeper: its nn is 9 at cos 10deg = .985 but 9 > 5
    assert(rows(5L)._2 == 9L && rows(5L)._3 > 0.9 && !rows(5L)._4)
    assert(rows(6L)._2 == 5L && rows(6L)._3 > 0.9 && rows(6L)._4)
    assert(rows(7L)._2 == 6L && rows(7L)._3 < 0.9 && !rows(7L)._4)
    assert(!rows(8L)._4)
    assert(rows(9L)._2 == 5L && rows(9L)._3 > 0.9 && rows(9L)._4)
    // both cells materialized under the two-pole quantizer
    assert(rows.values.map(_._1).toSet == Set(0L, 1L))
    assert((0L to 4L).forall(rows(_)._1 == 0L) && (5L to 9L).forall(rows(_)._1 == 1L))
  }

  /** Distinct 8-grams with the PortableGramHashes clamp: full windows for
    * docs of >= 8 tokens, ONE truncated gram (possibly "") otherwise. */
  private def gramSet(t: String): Set[String] = {
    val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.length >= 8) toks.sliding(8).map(_.mkString(" ")).toSet
    else Set(toks.mkString(" "))
  }

  test("dupSpanRatio matches a driver-side brute-force recompute") {
    val docs = graft.Tables(spark, sfDir, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toSeq
    val contentGrams = docs.map(_._2).distinct.map(t => t -> gramSet(t)).toMap
    val share = contentGrams.values.flatten
      .groupBy(identity).map { case (g, o) => g -> o.size }
    val expect = docs.map { case (id, t) =>
      val gs = contentGrams(t)
      val shared = gs.count(share(_) >= 2).toLong
      (id, gs.size.toLong, shared, shared * 1000 / gs.size)
    }.sortBy(_._1)
    val out = TextOps.dupSpanRatio(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("dup_permille"))).toSeq
    assert(out == expect)
    // the fixture plants exact-duplicate contents, but shared SPANS across
    // different contents must also exist for the face to mean anything
    assert(out.exists(r => r._3 > 0 && r._3 < r._2))
  }

  test("spanScrub matches a driver-side brute-force recompute") {
    val docs = graft.Tables(spark, sfDir, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toSeq
    // positional windows (duplicates kept) with the truncation clamp
    def windows(toks: Seq[String]): Seq[(Int, String)] =
      if (toks.length >= 8)
        (0 to toks.length - 8).map(i => i -> toks.slice(i, i + 8).mkString(" "))
      else Seq(0 -> toks.mkString(" "))
    val contentToks = docs.map(_._2).distinct
      .map(t => t -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val shared = contentToks.values.toSeq
      .flatMap(toks => windows(toks).map(_._2).distinct)
      .groupBy(identity).collect { case (g, o) if o.size >= 2 => g }.toSet
    val expect = docs.map { case (id, t) =>
      val toks = contentToks(t)
      val covered = windows(toks).filter(w => shared(w._2))
        .flatMap { case (i, _) => i to math.min(i + 7, toks.length - 1) }.toSet
      val kept = toks.zipWithIndex.collect { case (tok, p) if !covered(p) => tok }
      (id, toks.length.toLong, (toks.length - kept.length).toLong, kept.mkString(" "))
    }.sortBy(_._1)
    val out = TextOps.spanScrub(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))).toSeq
    assert(out == expect)
    // the fixture's planted near-dups must actually lose spans, and
    // scrubbing must not be total
    assert(out.exists(_._3 > 0) && out.exists(r => r._3 == 0 && r._2 > 0))
  }

  test("qualityScore matches the pinned-weight brute force; gate is sane") {
    val docs = graft.Tables(spark, sfDir, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toSeq
    def weight(tok: String): Long = {
      val h = graft.functions.Md5Quad64.hash(
        tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val b = java.lang.Math.floorMod(h, 256L)
      java.lang.Math.floorMod(b * 1103515245L + 12345L, 2001L) - 1000L
    }
    val expect = docs.flatMap { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.isEmpty) None
      else Some((id, toks.length.toLong, toks.map(weight).sum))
    }.map { case (id, n, s) => (id, n, s, s > 0L) }.sortBy(_._1)
    val out = TextOps.qualityScore(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("qscore"), r.getAs[Boolean]("keep"))).toSeq
    assert(out == expect)
    // pinned pseudo-weights are sign-balanced: the gate must actually
    // split the corpus, not rubber-stamp it
    val kept = out.count(_._4)
    assert(kept > 0 && kept < out.length)
  }

  private def corpusTokens: Seq[String] =
    graft.Tables(spark, sfDir, "documents").collect()
      .map(_.getAs[String]("text"))
      .flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty)).toSeq

  private def md5(s: String): Long = graft.functions.Md5Quad64.hash(
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("cmsPinned register table == brute force; estimates dominate counts") {
    val toks = corpusTokens
    val brute = toks.flatMap(t => (0L until 4L).map(i =>
        (i, java.lang.Math.floorMod(md5(s"$i:$t"), 256L))))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq.sortBy(r => (r._1, r._2))
    val out = TextOps.cmsPinned(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("row_i"), r.getAs[Long]("bucket"),
        r.getAs[Long]("cnt"))).toSeq
    assert(out == brute)
    // the CMS contract: every key's min-over-rows register count is an
    // over-estimate of its exact count
    val reg = out.map(r => (r._1, r._2) -> r._3).toMap
    val exact = toks.groupBy(identity).map { case (t, c) => t -> c.size.toLong }
    exact.foreach { case (t, n) =>
      val est = (0L until 4L)
        .map(i => reg((i, java.lang.Math.floorMod(md5(s"$i:$t"), 256L)))).min
      assert(est >= n, s"CMS under-estimated '$t': $est < $n")
    }
  }

  test("hllRegisters == brute force; estimate tracks exact distinct count") {
    val toks = corpusTokens
    def rank(h: Long): Long = {
      val rem = h & ((1L << 56) - 1)
      if (rem == 0L) 57L else 57L - java.lang.Long.toBinaryString(rem).length
    }
    val brute = toks.map(md5).map(h => (h >>> 56, rank(h)))
      .groupBy(_._1).map { case (r, v) => (r, v.map(_._2).max) }
      .toSeq.sortBy(_._1)
    val out = TextOps.hllRegisters(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("reg"), r.getAs[Long]("max_rank"))).toSeq
    assert(out == brute)
    assert(out.forall { case (r, k) => r >= 0 && r < 256 && k >= 1 && k <= 57 })
    // the standard HLL estimator off the register table (linear counting
    // in the small-range regime) should land near the exact distinct
    // count — loose 25% tolerance; this is a sanity bound, the register
    // equality above is the exact pin
    val m = 256
    val regs = out.toMap
    val zeros = m - out.length
    val exact = toks.distinct.length.toDouble
    val raw = 0.7213 / (1 + 1.079 / m) * m * m /
      (0 until m).map(r => math.pow(2.0, -regs.getOrElse(r.toLong, 0L).toDouble)).sum
    val est = if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
    assert(math.abs(est - exact) / exact < 0.25, s"HLL estimate $est vs exact $exact")
  }

  test("sourceQuota == brute force at a binding cap; keeps the k smallest hashes") {
    val docs = graft.Tables(spark, sfDir, "documents").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSeq
    val k = 3
    val expect = docs
      .map { case (s, id) =>
        (s, id, java.lang.Math.floorMod(md5(s"quota:$id"), 4294967296L)) }
      .groupBy(_._1).toSeq.flatMap { case (s, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(k).zipWithIndex
          .map { case ((src, id, _), i) => (src, id, i + 1L) }
      }.sortBy(r => (r._1, r._3))
    val out = Sampling.sourceQuota(spark, sfDir, k).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rn"))).toSeq
    assert(out == expect)
    // the cap must actually bind on the fixture
    assert(out.length < docs.length)
    assert(out.groupBy(_._1).values.forall(_.length <= k))
  }
}
