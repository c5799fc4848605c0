package graft.apps

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Reference-lifecycle app faces over the COMMITTED ml-1m-shaped fixture
  * (`src/test/resources/ml1m/`, deterministic LCG synthesis — the real
  * ml-1m inputs are missing blobs in the reference checkout, so the format
  * contract is pinned on a same-shaped corpus instead): every app must
  * reproduce its committed golden byte-for-byte, and the formats must
  * match the reference's committed outputs structurally
  * (`result_task1.txt` `mid,gender,avg11dp`; `SON.case1_1200.txt`
  * size-grouped `(a, b)` lines; `communities.txt` `[v1,v2,…]` lines). */
class AppsSpec extends AnyFunSuite with SparkSuite {

  private val fx = "src/test/resources/ml1m"
  private val goldenDir = Paths.get("src/test/resources/golden/apps")

  /** Compare against a committed golden; first run writes it (commit it). */
  private def assertGolden(name: String, content: String): Unit = {
    Files.createDirectories(goldenDir)
    val p = goldenDir.resolve(name)
    if (!Files.exists(p)) {
      Files.writeString(p, content)
      info(s"golden written to $p — commit it")
    }
    assert(content == Files.readString(p), s"$name drifted from its golden")
  }

  private def singlePartFile(dir: Path): String = {
    val part = Files.list(dir).iterator.asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(part.size == 1, s"expected exactly one part file in $dir")
    Files.readString(part.head)
  }

  test("AvgRatingApp reproduces the result_task1 format and its golden") {
    val out = Files.createTempDirectory("task1").resolve("movieAvgRating")
    AvgRatingApp.writeOutput(
      AvgRatingApp.movieAvgByGender(spark, s"$fx/ratings.dat", s"$fx/users.dat"),
      out.toString)
    val content = singlePartFile(out)
    val lines = content.split("\n").toSeq
    // reference format: mid,gender,double — sorted by (mid, gender)
    lines.foreach(l => assert(l.matches("""\d+,[MF],\d+(\.\d+)?(E-?\d+)?"""), l))
    val keys = lines.map { l =>
      val a = l.split(","); (a(0).toInt, a(1))
    }
    assert(keys == keys.sorted, "rows must sort by (mid, gender)")
    // spot-check one average against a driver recompute
    val (mid, gender) = keys.head
    val expect = AvgRatingApp.movieAvgByGender(
        spark, s"$fx/ratings.dat", s"$fx/users.dat")
      .where(col("mid") === mid && col("gender") === gender)
      .head.getDouble(2)
    assert(lines.head == s"$mid,$gender,${Apps.fmt11(expect)}")
    assertGolden("movieAvgRating.txt", content)
  }

  test("GenreAvgRatingApp keeps genre strings unsplit and matches its golden") {
    val out = Files.createTempDirectory("task2").resolve("genreAvgRating")
    GenreAvgRatingApp.writeOutput(
      GenreAvgRatingApp.genreAvgByGender(spark,
        s"$fx/ratings.dat", s"$fx/users.dat", s"$fx/movies.dat"),
      out.toString)
    val content = singlePartFile(out)
    val lines = content.split("\n").toSeq
    lines.foreach(l =>
      assert(l.matches("""[A-Za-z'|]+,[MF],\d+(\.\d+)?(E-?\d+)?"""), l))
    // the multi-genre string must surface as-is (reference keeps `A|B`)
    assert(lines.exists(_.startsWith("Action|Adventure,")),
      "unsplit multi-genre rows expected")
    val keys = lines.map { l => val a = l.split(","); (a(0), a(1)) }
    assert(keys == keys.sorted, "rows must sort by (genres, gender)")
    assertGolden("genreAvgRating.txt", content)
  }

  test("SonApp writes the reference's size-grouped itemset lines (case 1)") {
    val outDir = Files.createTempDirectory("son")
    val out = SonApp.run(spark, 1, s"$fx/ratings.dat", s"$fx/users.dat",
      support = 12, outDir.toString)
    assert(out.getFileName.toString == "SON.case1_12.txt",
      "reference file naming: SON.case<case>_<support>.txt")
    val content = Files.readString(out)
    val lines = content.split("\n").toSeq
    assert(lines.nonEmpty && content.endsWith("\n"),
      "every line newline-terminated as the reference writes it")
    // line k holds only size-k itemsets: "(a)", then "(a, b)", …
    lines.zipWithIndex.foreach { case (l, i) =>
      val sets = l.split("\\), \\(").toSeq
      sets.foreach { s =>
        val items = s.replaceAll("[()]", "").split(", ").map(_.trim.toLong)
        assert(items.length == i + 1, s"line ${i + 1} itemset size: $s")
        assert(items.toSeq == items.sorted.toSeq, s"items ascend within: $s")
      }
    }
    assert(lines.size >= 2, "fixture must yield at least singletons + pairs")
    assertGolden("SON.case1_12.txt", content)
  }

  test("SonApp case 2 buckets female raters per movie") {
    val outDir = Files.createTempDirectory("son2")
    val out = SonApp.run(spark, 2, s"$fx/ratings.dat", s"$fx/users.dat",
      support = 8, outDir.toString)
    val content = Files.readString(out)
    assert(content.nonEmpty && content.endsWith("\n"))
    // all items are female user ids (uid % 3 == 0 in the fixture)
    val items = content.split("[^0-9]+").filter(_.nonEmpty).map(_.toLong)
    assert(items.nonEmpty && items.forall(_ % 3 == 0),
      "case-2 itemsets must contain only female user ids")
    assertGolden("SON.case2_8.txt", content)
  }

  test("CommunityApp writes both reference files with parity to GraphOps") {
    val dir = Files.createTempDirectory("comm")
    val commOut = dir.resolve("communities.txt")
    val btwOut = dir.resolve("betweenness.txt")
    CommunityApp.run(spark, s"$fx/ratings.csv",
      commOut.toString, btwOut.toString)
    val btwLines = Files.readAllLines(btwOut).asScala.toSeq
    btwLines.foreach(l =>
      assert(l.matches("""\(\d+,\d+,\d+(\.\d+)?(E-?\d+)?\)"""), l))
    val commLines = Files.readAllLines(commOut).asScala.toSeq
    commLines.foreach(l => assert(l.matches("""\[\d+(,\d+)*\]"""), l))
    // communities partition the co-rating graph's vertex set
    val verts = CommunityApp.coRatingEdges(spark, s"$fx/ratings.csv")
      .flatMap(e => Seq(e._1, e._2)).toSet
    val members = commLines.flatMap(
      _.stripPrefix("[").stripSuffix("]").split(",").map(_.toLong))
    assert(members.size == members.distinct.size, "no overlap")
    assert(members.toSet == verts, "communities must cover all vertices")
    assertGolden("communities.txt", Files.readString(commOut))
    assertGolden("betweenness.txt", Files.readString(btwOut))
  }

  test("coRatingEdges refuses to collect past driverEdgeLimit and names the alternative") {
    val e = intercept[IllegalArgumentException] {
      CommunityApp.coRatingEdges(spark, s"$fx/ratings.csv", driverEdgeLimit = 1L)
    }
    assert(e.getMessage.contains("communitiesLpa"), e.getMessage)
  }
}
