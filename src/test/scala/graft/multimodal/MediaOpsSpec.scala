package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

class MediaOpsSpec extends AnyFunSuite with SparkSuite {

  test("media table carries binary payloads with typed metadata") {
    val m = MediaOps.mediaTable(spark, sfDir)
    val row = m.head()
    assert(row.media.nonEmpty)
    assert(row.width >= 64 && row.height >= 64)
    assert(m.count() == Tables(spark, sfDir, "documents").count())
  }

  test("feature extraction is batched, deterministic, fixed-dim") {
    val m = MediaOps.mediaTable(spark, sfDir)
    val f1 = MediaOps.extractFeatures(m, dim = 8).collect().sortBy(_.media_id)
    val f2 = MediaOps.extractFeatures(m, dim = 8).collect().sortBy(_.media_id)
    assert(f1.forall(_.features.length == 8))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    // payload length propagates
    val bytes = m.collect().map(r => r.media_id -> r.media.length).toMap
    f1.foreach(f => assert(f.n_bytes == bytes(f.media_id)))
  }

  test("resize preserves aspect ratio cap") {
    val resized = MediaOps.resizeMeta(MediaOps.mediaTable(spark, sfDir), 128).collect()
    resized.foreach { r =>
      assert(math.max(r.width, r.height) <= 128)
      assert(r.width >= 1 && r.height >= 1)
    }
  }

  test("frame sampling explodes strided fixed-size slices") {
    val m = MediaOps.mediaTable(spark, sfDir)
    val frames = MediaOps.frameSample(m, frameBytes = 64, stride = 4)
    val perDoc = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
      max(length(col("frame"))).as("maxlen"))
    val r = perDoc.agg(min("n"), max("maxlen")).head
    assert(r.getLong(0) >= 1)
    assert(r.getInt(1) <= 64)
    // stride 4 keeps ~1/4 of the full-frame count
    val full = MediaOps.frameSample(m, frameBytes = 64, stride = 1).count()
    assert(math.abs(frames.count() - full / 4.0) <= full * 0.1)
  }

  test("media nearest-neighbor search runs over decoded features") {
    val nn = MediaOps.mediaNearest(spark, sfDir).collect()
    assert(nn.nonEmpty)
    val byQuery = nn.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      assert(rs.length <= 3)
      val cs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("feature query face is deterministic and complete") {
    val q1 = MediaOps.mediaFeatureQuery(spark, sfDir).collect()
    assert(q1.length == Tables(spark, sfDir, "documents").count())
    assert(q1.forall(_.getAs[Double]("feat_sq_norm") > 0))
  }
}
