package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

/** Round-5 session-3 batch: interval-union coverage, bitmap distinct,
  * decayed popularity, ordered sequential pairs — each checked against a
  * brute-force recompute on the sf0.001 fixture.
  */
class Round5dSpec extends AnyFunSuite with SparkSuite {

  private def eventTimes(): Array[(Long, Long, String, Long)] =
    Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("interval coverage equals a brute-force sweep merge") {
    val len = 1800L * 1000000L
    val got = Events.intervalCoverage(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("n_islands"),
          r.getAs[Long]("covered_us"))).toMap
    val byUser = eventTimes().groupBy(_._1)
    assert(got.size == byUser.size)
    byUser.foreach { case (u, evs) =>
      val ivs = evs.map(e => (e._4, e._4 + len)).sortBy(identity)
      // sweep: extend the open island while the next interval starts
      // inside it, otherwise close and open a new one
      var islands = 0; var covered = 0L
      var curLo = ivs.head._1; var curHi = ivs.head._2
      ivs.tail.foreach { case (lo, hi) =>
        if (lo > curHi) { islands += 1; covered += curHi - curLo
          curLo = lo; curHi = hi
        } else curHi = math.max(curHi, hi)
      }
      islands += 1; covered += curHi - curLo
      assert(got(u) == ((ivs.length.toLong, islands.toLong, covered)),
        s"user $u: engine ${got(u)} vs brute ($islands, $covered)")
    }
  }

  test("bitmap distinct equals count(distinct) in-engine") {
    val got = Relational.bitmapDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_buyers")).toMap
    val exact = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(got == exact)
  }

  test("decayed popularity replays per-line exp sums and ranks stably") {
    val rows = Relational.decayedPopularity(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Double]("decay_score"),
        r.getAs[Long]("n_lines")))
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), date_trunc("day", col("o_orderdate")).as("d"))
    val maxDay = o.agg(max("d")).collect()(0).getTimestamp(0).getTime
    val brute = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
      .join(o, col("l_orderkey") === col("o_orderkey")).collect()
      .map(r => (r.getAs[Long]("l_partkey"),
        (maxDay - r.getAs[java.sql.Timestamp]("d").getTime) / 86400000L))
      .groupBy(_._1)
      .map { case (p, ages) =>
        (p, ages.map(a => math.exp(-0.05 * a._2)).sum, ages.length.toLong)
      }
    val top = brute.toSeq
      .map { case (p, s, n) =>
        (p, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, n)
      }
      .sortBy { case (p, s, _) => (-s, p) }.take(100)
    assert(rows.length == top.length)
    rows.zip(top).foreach { case (got, want) =>
      assert(got._1 == want._1 && got._3 == want._3 &&
        math.abs(got._2 - want._2) < 1e-9, s"got $got want $want")
    }
  }

  test("sequential pairs equal the quadratic exists-before check") {
    val sessions = eventTimes()
      .groupBy(e => (e._1, e._4 / 1000000L / 86400L * 86400L))
    val counts = collection.mutable.Map.empty[(String, String), Int]
    sessions.values.foreach { evs =>
      val pairs = for {
        e1 <- evs; e2 <- evs
        if e1._3 != e2._3 && e1._4 < e2._4
      } yield (e1._3, e2._3)
      pairs.distinct.foreach(p => counts(p) = counts.getOrElse(p, 0) + 1)
    }
    val want = counts.filter(_._2 >= 20).toMap
    val got = Events.seqPairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_sessions"))
      .toMap
    assert(got == want.map { case (k, v) => k -> v.toLong })
  }

  test("bigram PMI replays from raw token counts") {
    val texts = Tables(spark, sfDir, "documents").select("text").collect()
      .map(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty))
    val uni = texts.flatten.groupBy(identity).view.mapValues(_.length).toMap
    val nTok = uni.values.sum.toLong
    val bg = texts.flatMap(w => w.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length).filter(_._2 >= 20).toMap
    val nBg = bg.values.sum.toLong
    val got = TextOps.bigramPmi(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val Array(w1, w2) = r.getString(0).split(" ")
      val want = math.log(bg(r.getString(0)).toDouble / nBg /
        (uni(w1).toDouble / nTok) / (uni(w2).toDouble / nTok))
      assert(math.abs(r.getAs[Double]("pmi") - want) < 1e-6)
      assert(r.getAs[Long]("n_bg") == bg(r.getString(0)).toLong)
    }
  }

  test("prefix-filtered join finds exactly the brute-force pairs") {
    val got = Dedup.prefixJaccardJoin(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) ->
        r.getAs[Double]("jaccard")).toMap
    // brute force over the same shingle sets (engine tokenizer semantics)
    val sets = Tables(spark, sfDir, "documents").select("doc_id", "text")
      .collect().map { r =>
        val w = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        r.getLong(0) -> w.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
    val want = (for {
      (u, a) <- sets; (v, b) <- sets
      if u < v
      j = (a & b).size.toDouble / (a | b).size
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= 0.5
    } yield (u, v) -> jr).toMap
    assert(got.keySet == want.keySet,
      s"missing ${want.keySet -- got.keySet}, extra ${got.keySet -- want.keySet}")
    want.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-6) }
  }

  test("int8 quantization error respects the half-step bound") {
    val rows = Linalg.int8Quant(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = (r.getAs[Double]("mx") - r.getAs[Double]("mn")) / 255.0
      val maxErr = r.getAs[Double]("max_abs_err")
      // ⌊z+0.5⌋ rounds to the nearest level: error ≤ scale/2 (+ rounding slack)
      assert(maxErr <= scale / 2 + 1e-6, s"vec ${r.getLong(0)}: $maxErr > ${scale / 2}")
      assert(r.getAs[Double]("mse") <= maxErr * maxErr + 1e-9)
      assert(r.getAs[Double]("mse") >= 0)
    }
  }

  test("winsorized averages replay against interpolated percentiles") {
    val byNation = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_totalprice")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
    def pct(xs: Array[Double], p: Double): Double = {
      val s = xs.sorted
      val rank = p * (s.length - 1)
      val lo = rank.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) + (rank - lo) * (s(lo + 1) - s(lo))
    }
    val got = Relational.winsorize(spark, sfDir).collect()
    assert(got.length == byNation.size)
    got.foreach { r =>
      val xs = byNation(r.getString(0)).map(_._2)
      val (lo, hi) = (pct(xs, 0.05), pct(xs, 0.95))
      val wins = xs.map(x => math.min(math.max(x, lo), hi))
      assert(r.getAs[Long]("n") == xs.length.toLong)
      assert(math.abs(r.getAs[Double]("wins_avg") - wins.sum / wins.length) < 1e-5)
      assert(r.getAs[Long]("n_clipped") == xs.count(x => x < lo || x > hi).toLong)
    }
  }

  test("activity streaks equal a brute-force consecutive-day scan") {
    val days = eventTimes()
      .map(e => (e._1, e._4 / 1000000L / 86400L)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Events.activityStreaks(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("longest_streak"), r.getAs[Long]("n_active_days"),
          r.getAs[Long]("n_streaks"))).toMap
    assert(got.size == days.size)
    days.foreach { case (u, ds) =>
      val runs = collection.mutable.ArrayBuffer(1L)
      ds.sliding(2).filter(_.length == 2).foreach { w =>
        if (w(1) == w(0) + 1) runs(runs.length - 1) += 1 else runs += 1L
      }
      assert(got(u) == ((runs.max, ds.length.toLong, runs.length.toLong)),
        s"user $u: ${got(u)} vs (${runs.max}, ${ds.length}, ${runs.length})")
    }
  }

  test("hourly autocorrelation equals brute Pearson on the lagged series") {
    val series = eventTimes().map(_._4 / 1000000L / 3600L)
      .groupBy(identity).view.mapValues(_.length.toDouble)
      .toSeq.sortBy(_._1).map(_._2).toArray
    def pearson(lag: Int): Double = {
      val pairs = (lag until series.length).map(i => (series(i), series(i - lag)))
      val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
      val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
      val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum
      val (sx, sy) = (math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum),
        math.sqrt(ys.map(y => (y - my) * (y - my)).sum))
      cov / (sx * sy)
    }
    val r = Events.hourlyAutocorr(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_hours") == series.length.toLong)
    assert(math.abs(r.getAs[Double]("lag1_corr") - pearson(1)) < 1e-5)
    assert(math.abs(r.getAs[Double]("lag24_corr") - pearson(24)) < 1e-5)
  }

  test("session paths equal brute first-3 sequences") {
    val counts = eventTimes()
      .groupBy(e => (e._1, e._4 / 1000000L / 86400L))
      .values.map(evs => evs.sortBy(e => (e._4, e._2)).take(3)
        .map(_._3).mkString(">"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Events.sessionPathTopK(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_sessions"))
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    assert(got.toSeq == want)
  }

  test("epoch shuffle is a permutation with dense per-shard positions") {
    val rows = Sampling.epochShuffle(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
        r.getAs[Long]("pos")))
    val nDocs = Tables(spark, sfDir, "documents").count()
    assert(rows.length.toLong == nDocs)
    assert(rows.map(_._1).distinct.length.toLong == nDocs)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
        s"shard $shard positions not dense")
    }
    rows.foreach { case (id, shard, _) =>
      val h = ((id + 1L) * 2654435761L) % 4294967296L
      assert(shard == (h % 8).toInt)
    }
    // a different seed permutes differently but covers the same docs
    val other = Sampling.epochShuffle(spark, sfDir, seed = 2L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
        r.getAs[Long]("pos")))
    assert(other.map(_._1).sorted.toSeq == rows.map(_._1).sorted.toSeq)
    assert(other.map(r => (r._1, r._2, r._3)).toSet !=
      rows.map(r => (r._1, r._2, r._3)).toSet)
  }

  test("hard negatives equal the brute argmax over other-label vectors") {
    val vecs = Tables(spark, sfDir, "embeddings").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray,
        r.getAs[Int]("label")))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Similarity.hardNegatives(spark, sfDir).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    val queries = vecs.filter(_._1 < 100)
    assert(got.size == queries.length)
    queries.foreach { case (qid, qv, qlabel) =>
      val best = vecs.filter(_._3 != qlabel)
        .map { case (id, v, _) => (id, cos(qv, v)) }
        .minBy { case (id, c) => (-c, id) }
      assert(got(qid)._1 == best._1 && math.abs(got(qid)._2 - best._2) < 1e-6,
        s"query $qid: ${got(qid)} vs $best")
    }
  }

  test("label centroids and separation replay brute-force") {
    val vecs = Tables(spark, sfDir, "embeddings").collect()
      .map(r => (r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    val cents = vecs.groupBy(_._1).view.mapValues { vs =>
      val dim = vs.head._2.length
      Array.tabulate(dim) { i =>
        BigDecimal(vs.map(_._2(i)).sum / vs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = Linalg.labelCentroids(spark, sfDir).collect()
    assert(got.length == cents.size)
    got.foreach { r =>
      val l = r.getAs[Int]("label")
      val best = cents.keys.filter(_ != l)
        .map(o => (o, BigDecimal(cos(cents(l), cents(o)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .minBy { case (o, c) => (-c, o) }
      assert(r.getAs[Int]("nearest_label") == best._1)
      assert(math.abs(r.getAs[Double]("centroid_cosine") - best._2) < 1e-5)
      assert(r.getAs[Long]("n_vecs") == vecs.count(_._1 == l).toLong)
    }
  }

  test("key-skew Gini replays the rank-weighted formula") {
    val counts = Tables(spark, sfDir, "lineitem").groupBy("l_partkey")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("cnt")))
    val sorted = counts.sortBy { case (k, c) => (c, k) }.map(_._2)
    val n = sorted.length.toLong
    val total = sorted.sum
    val iw = sorted.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    val gini = (2.0 * iw - (n + 1) * total) / (n.toDouble * total)
    val r = ScaleOps.keySkew(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_keys") == n)
    assert(r.getAs[Long]("total") == total)
    assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-5)
    val top10 = counts.sortBy { case (k, c) => (-c, k) }.take(10).map(_._2).sum
    assert(math.abs(r.getAs[Double]("top10_share") - top10.toDouble / total) < 1e-5)
  }

  test("bm25 replays the Okapi formula from raw counts") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, o) => (id, t, o.length.toLong) } }
    val df = tf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    val avgLen = docs.map(_._2.length.toLong).sum.toDouble / n
    val qterms = df.toSeq.sortBy { case (t, d) => (-d, t) }
      .slice(10, 15).map(_._1).toSet
    val scores = docs.map { case (id, ts) =>
      val len = ts.length
      val s = tf.filter(e => e._1 == id && qterms(e._2)).map { case (_, t, f) =>
        val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        idf * f * (1.2 + 1) / (f + 1.2 * (1.0 - 0.75 + 0.75 * len / avgLen))
      }
      (id, s.size, s.sum)
    }.filter(_._2 > 0)
    val want = scores
      .map { case (id, m, s) => (id, m.toLong,
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, _, s) => (-s, id) }.take(20)
    val got = TextOps.bm25(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_matched"),
        r.getAs[Double]("bm25")))
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && math.abs(g._3 - w._3) < 1e-6,
        s"got $g want $w")
    }
  }

  test("KS statistic equals the brute two-sample sweep") {
    val vals = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val (a, b) = vals.partition { case (k, _) =>
      (k * 2654435761L % 4294967296L).toDouble / 4294967296.0 < 0.5 }
    val xs = vals.map(_._2).distinct.sorted
    val d = xs.map { x =>
      math.abs(a.count(_._2 <= x).toDouble / a.length -
        b.count(_._2 <= x).toDouble / b.length)
    }.max
    val r = Sampling.ksDrift(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    assert(math.abs(r.getAs[Double]("ks_stat") - d) < 1e-5)
  }

  test("MAD outliers replay the robust band from brute medians") {
    def pct50(xs: Array[Double]): Double = {
      val s = xs.sorted
      val rank = 0.5 * (s.length - 1)
      val lo = rank.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) + (rank - lo) * (s(lo + 1) - s(lo))
    }
    val groups = Tables(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    val got = Relational.madOutliers(spark, sfDir).collect()
    assert(got.length == groups.size)
    got.foreach { r =>
      val xs = groups(r.getString(0)).map(_._2)
      val med = pct50(xs)
      val mad = pct50(xs.map(x => math.abs(x - med)))
      assert(math.abs(r.getAs[Double]("med") - med) < 1e-4)
      assert(math.abs(r.getAs[Double]("mad") - mad) < 1e-4)
      assert(r.getAs[Long]("n_outliers") ==
        xs.count(x => math.abs(x - med) > 3.0 * 1.4826 * mad).toLong)
    }
  }

  test("truncated EWMA replays the weighted-lag recursion") {
    val series = eventTimes()
      .map(e => (e._3, e._4 / 1000000L / 3600L * 3600L))
      .groupBy(identity).view.mapValues(_.size.toDouble)
      .toSeq.map { case ((t, h), n) => (t, h, n) }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val got = Events.hourlyEwma(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getAs[Long]("hour_s")) ->
        r.getAs[Double]("ewma")).toMap
    assert(got.size == series.values.map(_.size).sum)
    series.foreach { case (t, hs) =>
      hs.zipWithIndex.foreach { case ((_, h, _), i) =>
        val lags = (0 to 12).flatMap { k =>
          if (i - k >= 0) Some(math.pow(0.7, k) -> hs(i - k)._3) else None }
        val want = lags.map { case (w, x) => w * x }.sum /
          lags.map(_._1).sum
        assert(math.abs(got((t, h)) - want) < 1e-5,
          s"type $t hour $h: ${got((t, h))} vs $want")
      }
    }
  }

  test("clustering coefficients replay from brute adjacency sets") {
    val edges = GraphOps.coPurchaseEdges(spark, sfDir, 3)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    val triPerVertex = adj.map { case (x, ns) =>
      x -> ns.toSeq.combinations(2).count { case Seq(a, b) => adj(a)(b) }
    }
    val sumT = triPerVertex.values.map(_.toLong).sum
    val sumW = adj.values.map(ns => ns.size.toLong * (ns.size - 1) / 2).sum
    val locals = adj.collect { case (x, ns) if ns.size >= 2 =>
      triPerVertex(x).toDouble / (ns.size.toLong * (ns.size - 1) / 2.0) }
    val r = GraphOps.clusteringCoeff(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_vertices") == adj.size.toLong)
    assert(r.getAs[Long]("n_edges") == edges.length.toLong)
    assert(r.getAs[Long]("n_triangles") == sumT / 3)
    assert(math.abs(r.getAs[Double]("global_cc") - sumT.toDouble / sumW) < 1e-5)
    assert(math.abs(r.getAs[Double]("avg_local_cc") -
      locals.sum / locals.size) < 1e-5)
  }

  test("Pareto curve allocates every customer once, cumulating to 1") {
    val rows = Relational.paretoCurve(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("decile"), r.getAs[Long]("n_customers"),
        r.getAs[Double]("decile_rev"), r.getAs[Double]("cum_rev_share")))
    val nCust = Tables(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_._1).toSeq == (1 to 10))
    assert(rows.map(_._2).sum == nCust)
    assert(math.abs(rows.last._4 - 1.0) < 1e-6)
    // shares are monotone and deciles are revenue-sorted (top decile first)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 > a._4)
      assert(a._3 / a._2 >= b._3 / b._2 - 1e-6,
        s"decile ${a._1} avg below ${b._1}")
    }
  }

  test("churn flags replay per-user last-activity arithmetic") {
    val byUser = eventTimes().groupBy(_._1)
    val maxDay = eventTimes().map(_._4 / 1000000L / 86400L).max
    val got = Events.churnFlags(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_events"),
        r.getAs[Int]("days_inactive"), r.getAs[Boolean]("churned"))).toMap
    assert(got.size == byUser.size)
    byUser.foreach { case (u, evs) =>
      val lastDay = evs.map(_._4 / 1000000L / 86400L).max
      val inactive = (maxDay - lastDay).toInt
      assert(got(u) == ((evs.length.toLong, inactive, inactive > 7)),
        s"user $u: ${got(u)} vs (${evs.length}, $inactive)")
    }
  }

  test("dow-hour profile covers the dense axis and replays chi2 terms") {
    val rows = Events.dowHourProfile(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("dow"), r.getAs[Int]("hr"),
        r.getAs[Long]("n"), r.getAs[Double]("chi2_term")))
    assert(rows.length == 168)
    assert(rows.map(r => (r._1, r._2)).toSet ==
      (for (d <- 0 to 6; h <- 0 to 23) yield (d, h)).toSet)
    val total = rows.map(_._3).sum
    assert(total == eventTimes().length.toLong)
    val e = total / 168.0
    rows.foreach { r =>
      val want = math.pow(r._3 - e, 2) / e
      assert(math.abs(r._4 - want) < 1e-4, s"cell (${r._1},${r._2})")
    }
  }

  test("emerging terms replay the smoothed log-odds from raw counts") {
    val toks = Tables(spark, sfDir, "documents").select("doc_id", "text")
      .collect().flatMap { r =>
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
          .map(t => (r.getLong(0) % 2 == 1, t))
      }
    val counts = toks.groupBy(_._2).view.mapValues { es =>
      (es.count(_._1).toLong, es.count(!_._1).toLong)
    }.filter { case (_, (nn, no)) => nn + no >= 30 }.toMap
    val (tNew, tOld, v) =
      (counts.values.map(_._1).sum, counts.values.map(_._2).sum,
        counts.size.toLong)
    val scored = counts.map { case (t, (nn, no)) =>
      (t, BigDecimal(math.log((nn + 1.0) / (tNew + v) /
        ((no + 1.0) / (tOld + v))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq
    val got = TextOps.emergingTerms(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Int]("rank"), r.getString(2),
        r.getAs[Double]("log_odds")))
    val rising = scored.sortBy { case (t, s) => (-s, t) }.take(10)
    val falling = scored.sortBy { case (t, s) => (s, t) }.take(10)
    val wantOrder = falling.zipWithIndex.map { case ((t, s), i) =>
      ("falling", i + 1, t, s) } ++
      rising.zipWithIndex.map { case ((t, s), i) => ("rising", i + 1, t, s) }
    assert(got.length == 20)
    got.zip(wantOrder).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 &&
        math.abs(g._4 - w._4) < 1e-6, s"got $g want $w")
    }
  }

  test("join-cardinality estimate is exact against the executed join") {
    val r = ScaleOps.joinCardinality(spark, sfDir).collect()(0)
    assert(r.getAs[Boolean]("estimate_exact"))
    assert(r.getAs[Long]("predicted") == r.getAs[Long]("actual"))
    assert(r.getAs[Long]("max_key_pairs") <= r.getAs[Long]("predicted"))
  }

  test("dedup savings replay from md5 groups") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val keeper = docs.groupBy(_._4).view.mapValues(_.map(_._1).min).toMap
    val got = TextOps.dedupSavings(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dupes"), r.getAs[Long]("chars_saved"))).toMap
    val bySource = docs.groupBy(_._2)
    assert(got.size == bySource.size)
    bySource.foreach { case (src, ds) =>
      val dupes = ds.filter(d => keeper(d._4) != d._1)
      assert(got(src) == ((ds.length.toLong, dupes.length.toLong,
        dupes.map(_._3).sum)), s"source $src")
    }
  }

  test("degree distribution sums to the vertex count with monotone ccdf") {
    val rows = GraphOps.degreeDistribution(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("degree"), r.getAs[Long]("n_vertices"),
        r.getAs[Double]("ccdf")))
    val nVertices = GraphOps.degrees(spark, sfDir).count()
    assert(rows.map(_._2).sum == nVertices)
    // ccdf at the smallest degree covers everyone; decreasing in degree
    assert(math.abs(rows.head._3 - 1.0) < 1e-6)
    rows.sliding(2).foreach { case Array(a, b) => assert(b._3 < a._3)
      case _ => }
  }

  test("cart abandonment replays the strictly-after reduction") {
    val sessions = eventTimes()
      .groupBy(e => (e._1, e._4 / 1000000L / 86400L * 86400L))
      .filter(_._2.exists(_._3 == "click"))
    val abandonedByDay = sessions.groupBy(_._1._2).view.mapValues { ss =>
      val abandoned = ss.count { case (_, evs) =>
        val cMin = evs.filter(_._3 == "click").map(_._4).min
        !evs.exists(e => e._3 == "purchase" && e._4 > cMin)
      }
      (ss.size.toLong, abandoned.toLong)
    }.toMap
    val got = Events.cartAbandonment(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_click_sessions"), r.getAs[Long]("n_abandoned")))
      .toMap
    assert(got == abandonedByDay)
  }

  test("bigram perplexity replays the add-half LM from raw counts") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty))
    val train = docs.filter(_._1 % 2 == 0)
    val c2 = train.flatMap(d => d._2.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = train.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val v = c1.size.toLong
    val got = TextOps.bigramPerplexity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("cross_entropy")))
    val evalDocs = docs.filter(d => d._1 % 2 == 1 && d._2.length >= 2)
    assert(got.length == evalDocs.length)
    val gotMap = got.map(g => g._1 -> (g._2, g._3)).toMap
    evalDocs.foreach { case (id, w) =>
      val lps = w.sliding(2).filter(_.length == 2).map { bg =>
        math.log((c2.getOrElse(bg.mkString(" "), 0L) + 0.5) /
          (c1.getOrElse(bg(0), 0L) + 0.5 * v))
      }.toSeq
      assert(gotMap(id)._1 == lps.length.toLong)
      assert(math.abs(gotMap(id)._2 - (-lps.sum / lps.length)) < 1e-5,
        s"doc $id")
    }
  }

  test("containment join finds exactly the brute directed pairs") {
    val sets = Tables(spark, sfDir, "documents").select("doc_id", "text")
      .collect().map { r =>
        val w = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        r.getLong(0) -> w.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a != b
      c = (sa & sb).size.toDouble / sa.size
      cr = BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cr >= 0.8
    } yield (a, b) -> cr).toMap
    val got = Dedup.containmentJoin(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Double]("containment")).toMap
    assert(got.keySet == want.keySet,
      s"missing ${want.keySet -- got.keySet}, extra ${got.keySet -- want.keySet}")
    want.foreach { case (k, c) => assert(math.abs(got(k) - c) < 1e-6) }
  }

  test("session-duration histogram conserves sessions with exact bins") {
    val durations = eventTimes()
      .groupBy(e => (e._1, e._4 / 1000000L / 86400L))
      .values.map { evs =>
        val ts = evs.map(_._4 / 1000000L)
        ts.max - ts.min
      }.toSeq
    val want = durations.groupBy(_.toString.length).view.mapValues(g =>
      (g.size.toLong, g.min, g.max)).toMap
    val got = Events.sessionDurationHist(spark, sfDir).collect()
      .map(r => r.getAs[Int]("digits") -> (r.getAs[Long]("n_sessions"),
        r.getAs[Long]("min_dur_s"), r.getAs[Long]("max_dur_s"))).toMap
    assert(got == want)
  }

  test("tokenizer fertility replays under Java regex") {
    val pat = TextOps.BpePattern.r
    val per = Tables(spark, sfDir, "documents").select("lang", "text").collect()
      .map { r =>
        val t = r.getString(1).toLowerCase
        (r.getString(0), pat.findAllIn(t).size.toLong,
          t.split("\\s+").count(_.nonEmpty).toLong)
      }.groupBy(_._1)
    val got = TextOps.tokenizerFertility(spark, sfDir).collect()
    assert(got.length == per.size)
    got.foreach { r =>
      val docs = per(r.getString(0))
      assert(r.getAs[Long]("n_bpe_tokens") == docs.map(_._2).sum)
      assert(r.getAs[Long]("n_words") == docs.map(_._3).sum)
      assert(math.abs(r.getAs[Double]("corpus_fertility") -
        docs.map(_._2).sum.toDouble / docs.map(_._3).sum) < 1e-5)
    }
  }
}
