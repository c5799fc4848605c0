package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

class MediaOpsSpec extends AnyFunSuite with SparkSuite {

  test("media table carries REAL PNG payloads with typed metadata") {
    val m = MediaOps.mediaTable(spark, sfDir)
    val row = m.head()
    assert(row.media.nonEmpty)
    // PNG magic: every payload must be a genuine encoded image
    assert((row.media.take(8).map(_ & 0xff) sameElements
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)),
      "payload is not PNG-encoded")
    assert(row.width >= 8 && row.height >= 8)
    assert(m.count() == Tables(spark, sfDir, "documents").count())
  }

  test("decodeImage recovers known pixel values from a hand-built PNG") {
    // 2x1 image: pure white and pure black — bucket means are exact
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff)
    img.setRGB(1, 0, 0x000000)
    val png = MediaOps.encodePng(img)
    assert(MediaOps.decodeImage(png, 2).toSeq == Seq(1.0, 0.0))
    // one bucket: mean of the two pixels
    assert(MediaOps.decodeImage(png, 1).toSeq == Seq(0.5))
    // 3x1 with a mid-gray: (128+128+128)/3/255 rounded to 6dp
    val img3 = new BufferedImage(3, 1, BufferedImage.TYPE_INT_RGB)
    img3.setRGB(0, 0, 0xffffff); img3.setRGB(1, 0, 0x808080); img3.setRGB(2, 0, 0x000000)
    val f3 = MediaOps.decodeImage(MediaOps.encodePng(img3), 3).toSeq
    assert(f3 == Seq(1.0, math.rint(128.0 / 255.0 * 1e6) / 1e6, 0.0))
  }

  test("rasterize handles an empty payload (deterministic, no crash)") {
    val a = MediaOps.rasterize(Array.empty[Byte], 4, 3)
    val b = MediaOps.rasterize(Array[Byte](0), 4, 3)
    for (y <- 0 until 3; x <- 0 until 4)
      assert(a.getRGB(x, y) == b.getRGB(x, y),
        "empty payload must rasterize like the single-zero-byte payload")
  }

  test("PNG encode∘decode round-trips rasterized pixels exactly") {
    val raster = MediaOps.rasterize("the quick brown fox".getBytes, 11, 7)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaOps.encodePng(raster)))
    for (y <- 0 until 7; x <- 0 until 11)
      assert((back.getRGB(x, y) & 0xffffff) == (raster.getRGB(x, y) & 0xffffff))
  }

  test("feature extraction decodes pixels, batched, deterministic, fixed-dim") {
    val m = MediaOps.mediaTable(spark, sfDir)
    val f1 = MediaOps.extractFeatures(m, dim = 8).collect().sortBy(_.media_id)
    val f2 = MediaOps.extractFeatures(m, dim = 8).collect().sortBy(_.media_id)
    assert(f1.forall(_.features.length == 8))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    // luminance means are in [0, 1]
    assert(f1.forall(_.features.forall(v => v >= 0.0 && v <= 1.0)))
    // payload length propagates
    val bytes = m.collect().map(r => r.media_id -> r.media.length).toMap
    f1.foreach(f => assert(f.n_bytes == bytes(f.media_id)))
  }

  test("resize re-encodes under the aspect cap and stays decodable") {
    val resized = MediaOps.resize(MediaOps.mediaTable(spark, sfDir), 16).collect()
    resized.foreach { r =>
      assert(math.max(r.width, r.height) <= 16)
      assert(r.width >= 1 && r.height >= 1)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
      assert(img.getWidth == r.width && img.getHeight == r.height)
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
      val cs = rs.map(_.getAs[Double]("cosine")).sorted.reverse
      assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("feature query face is deterministic and complete") {
    val q1 = MediaOps.mediaFeatureQuery(spark, sfDir).collect()
    assert(q1.length == Tables(spark, sfDir, "documents").count())
    assert(q1.forall(_.getAs[Double]("feat_sq_norm") > 0))
  }
}
