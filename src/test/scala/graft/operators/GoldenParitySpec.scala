package graft.operators

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.sources.DelimitedText

/** Golden-parity against the reference's own data and committed output
  * (SURVEY.md §5): ml-latest-small ratings.csv → co-rating graph (users
  * sharing ≥ 3 movies) → compute-once betweenness → the reference's exact
  * GN search → diff against `communities.txt` (22 communities). */
class GoldenParitySpec extends AnyFunSuite with SparkSuite {

  private val refDir = "/root/reference/3-Graph Community Detection"

  private def goldenAvailable = Files.exists(Paths.get(s"$refDir/communities.txt"))

  test("co-rating graph + reference GN search reproduce communities.txt") {
    assume(goldenAvailable)
    import spark.implicits._
    // ingest through our header-CSV source (dogfooding S3)
    val ratings = DelimitedText.readHeaderCsv(spark, s"$refDir/ratings.csv")
      .select(col("userId").cast("long").as("u"), col("movieId").cast("long").as("m"))
      .distinct()
    val edges = ratings.as("a")
      .join(ratings.as("b"), col("a.m") === col("b.m") && col("a.u") < col("b.u"))
      .groupBy(col("a.u").as("u"), col("b.u").as("v"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 3)
      .select("u", "v").as[(Long, Long)].collect()
    assert(edges.length == 154331, "edge construction must match the reference graph")

    val got = GraphOps.referenceCommunities(spark, edges, step0 = 2500, zoom = 5)
      .map(_.mkString(","))
    val golden = Files.readAllLines(Paths.get(s"$refDir/communities.txt")).asScala
      .map(_.trim.stripPrefix("[").stripSuffix("]")).filter(_.nonEmpty).toSeq
    assert(got.size == golden.size,
      s"community count ${got.size} != golden ${golden.size}")
    assert(got == golden)
  }
}
