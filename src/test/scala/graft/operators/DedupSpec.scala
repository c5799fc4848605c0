package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

class DedupSpec extends AnyFunSuite with SparkSuite {

  test("exact dedup partitions all documents") {
    val df = Dedup.exact(spark, sfDir)
    val total = df.agg(sum("n_copies")).head.getLong(0)
    assert(total == Tables(spark, sfDir, "documents").count())
  }

  test("minhash pairs report true Jaccard (recomputed in driver)") {
    val pairs = Dedup.minhashPairs(spark, sfDir).limit(5).collect()
    assert(pairs.nonEmpty, "expected planted near-dups in fixture")
    val docs = Tables(spark, sfDir, "documents").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    def shingles(t: String): Set[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .sliding(3).map(_.mkString(" ")).toSet
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (shingles(docs(a)), shingles(docs(b)))
      val truth = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(truth - r.getDouble(2)) < 1e-4,
        s"pair ($a,$b): engine=${r.getDouble(2)} truth=$truth")
    }
  }

  test("minhash candidate generation finds all high-jaccard pairs (recall)") {
    // brute-force exact jaccard over shingle sets for pairs >= 0.5
    val sh = Tables(spark, sfDir, "documents").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").toLowerCase.split("\\s+").filter(_.nonEmpty)
          .sliding(3).map(_.mkString(" ")).toSet))
    val truth = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= 0.5
    } yield (a, b)).toSet
    val got = Dedup.minhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(got),
      s"missed ${truth.diff(got).size} of ${truth.size} true pairs")
  }

  test("simhash pairs are within the claimed hamming distance") {
    val fp = Dedup.simhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    Dedup.simhashPairs(spark, sfDir).collect().foreach { r =>
      val h = java.lang.Long.bitCount(fp(r.getLong(0)) ^ fp(r.getLong(1)))
      assert(h == r.getInt(2) && h <= 3)
    }
  }

  test("ngram jaccard top-k is sorted and within [0,1]") {
    val rows = Dedup.ngramJaccardTopK(spark, sfDir).collect()
    val js = rows.map(_.getDouble(2))
    assert(js.forall(j => j >= 0 && j <= 1))
    assert(js.zip(js.tail).forall { case (a, b) => a >= b })
  }
}
