package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-file ingest via Spark's `binaryFile` datasource — the multimodal
  * lake-ingest shape: one opaque blob per file (image, audio, or here a
  * text document), identity carried in the path, decode as a column
  * expression. The writer side stages one file per document from the
  * executors (`foreachPartition`), the reader side is the stock
  * `binaryFile` source, so both directions are distributed.
  *
  * Staging goes to a JVM-local temp dir — correct under local[*]; on a
  * real cluster the stage path would be shared storage (the source itself
  * is storage-agnostic, the demo fixture is not).
  */
object BinaryDocs {

  /** documents → one `.txt` file each → `binaryFile` scan → (doc_id, text).
    * doc_id is recovered from the file name; content is decoded UTF-8. */
  def stageAndRead(spark: SparkSession, dir: String): DataFrame = {
    val stage = Staging.once("bindocs", dir) { d =>
      graft.Tables(spark, dir, "documents").select("doc_id", "text")
        .foreachPartition { (it: Iterator[Row]) =>
          it.foreach { r =>
            Files.write(Paths.get(d, f"doc_${r.getLong(0)}%07d.txt"),
              r.getString(1).getBytes(UTF_8)): Unit
          }
        }
    }
    spark.read.format("binaryFile").option("pathGlobFilter", "*.txt")
      .load(stage)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.txt$", 1).cast("long")
          .as("doc_id"),
        decode(col("content"), "UTF-8").as("text"))
  }

  /** q84: q50's per-document stats computed from the file-staged corpus —
    * shares q50's oracle, proving the binary ingest path end-to-end
    * (payload fidelity + identity recovery), and that sources swap freely
    * under the operator surface. */
  def textStatsFromFiles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps.textStatsOf(stageAndRead(spark, dir))
}
