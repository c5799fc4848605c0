package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class DelimitedTextSpec extends AnyFunSuite with SparkSuite {

  private val schema = StructType(Seq(
    StructField("uid", IntegerType), StructField("mid", IntegerType),
    StructField("rating", DoubleType), StructField("ts", LongType)))

  test("multi-char :: delimiter round-trips typed rows") {
    val dir = Files.createTempDirectory("graft-src").toFile
    val f = new java.io.File(dir, "ratings.dat")
    Files.writeString(f.toPath, "1::31::2.5::1260759144\n7::1061::3.0::1260759179\n")
    val df = DelimitedText.read(spark, f.getAbsolutePath, "::", schema)
    val rows = df.collect()
    assert(df.schema == schema)
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 7))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(2.5, 3.0))
  }

  test("header CSV skips the header and types columns") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "r.csv")
    Files.writeString(f.toPath, "userId,movieId,rating\n1,31,2.5\n7,1061,3.0\n")
    val df = DelimitedText.readHeaderCsv(spark, f.getAbsolutePath)
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("userId", "movieId", "rating"))
  }

  test("json-lines roundtrip preserves rows; malformed lines drop or surface") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val out = Files.createTempDirectory("graft-json").resolve("docs").toString
    JsonLines.write(docs, out)
    val back = JsonLines.read(spark, out, docs.schema)
    assert(back.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    // corrupt line handling
    val dirty = Files.createTempDirectory("graft-json-dirty")
    Files.write(dirty.resolve("part-0.json"),
      java.util.Arrays.asList("""{"doc_id": 1, "text": "ok", "lang": "en"}""",
        """not json at all"""))
    val strict = JsonLines.read(spark, dirty.toString, docs.schema)
    assert(strict.count() == 1, "DROPMALFORMED must drop the bad line")
    // Spark disallows querying only the corrupt column off a raw file scan
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first
    val permissive = JsonLines.read(spark, dirty.toString,
      docs.schema.add("_corrupt_record", "string"), keepCorrupt = true).cache()
    assert(permissive.where(
      org.apache.spark.sql.functions.col("_corrupt_record").isNotNull).count() == 1)
    permissive.unpersist()
  }

  test("single-file sink writes exactly one part file with delimited lines") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-sink").resolve("out").toString
    DelimitedText.writeSingleFile(Seq((1, "a", 2.5), (2, "b", 3.0)).toDF("i", "s", "d"), out, ",")
    val parts = new java.io.File(out).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    val lines = Files.readAllLines(parts.head.toPath)
    assert(lines.contains("1,a,2.5") && lines.contains("2,b,3.0"))
  }
}
