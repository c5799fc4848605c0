package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

/** Round-8 composites: the near-dup-aware split's leakage guarantee and
  * the packing manifest's offset arithmetic. */
class Round8Spec extends AnyFunSuite with SparkSuite {

  test("group-aware split never puts a near-dup pair across the wall") {
    val rows = Sampling.groupAwareSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val split = rows.map(r => (r._1, r._3)).toMap
    // every LSH near-dup pair lands in ONE split — the guarantee q57's
    // independent per-doc hashing cannot give
    val pairs = Dedup.minhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"near-dups $a,$b straddle splits")
    }
    // group members share the split by construction too
    rows.groupBy(_._2).foreach { case (g, members) =>
      assert(members.map(_._3).distinct.length == 1, s"group $g splits")
    }
    // ungrouped docs key on their own id — identical arithmetic to q57,
    // so their assignment matches the plain hash split
    val grouped = rows.filter(r => r._2 != r._1 ||
      rows.exists(o => o._2 == r._1 && o._1 != r._1)).map(_._1).toSet
    val plain = Sampling.trainValTest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    rows.filterNot(r => grouped(r._1)).foreach { r =>
      assert(r._3 == plain(r._1), s"ungrouped doc ${r._1} diverges from q57")
    }
    // and the split is a partition of the corpus
    assert(rows.length == Tables(spark, sfDir, "documents").count())
  }

  test("packing manifest: offsets are the exact global running sum") {
    val budget = 512L
    val rows = TextOps.packingManifest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // driver replay of the concat-and-cut arithmetic
    var cum = 0L
    rows.sortBy(_._1).foreach { case (id, n, start, sf, sl, ns) =>
      assert(start == cum, s"doc $id start $start != running sum $cum")
      assert(sf == start / budget, s"doc $id seq_first")
      assert(sl == (start + n - 1) / budget, s"doc $id seq_last")
      assert(ns == sl - sf + 1 && ns >= 1, s"doc $id n_seqs")
      cum += n
    }
    // some docs must straddle a window boundary on this fixture (token
    // counts are not multiples of the budget)
    assert(rows.exists(_._6 > 1), "expected at least one straddling doc")
  }
}
