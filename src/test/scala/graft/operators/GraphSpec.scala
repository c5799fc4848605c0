package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class GraphSpec extends AnyFunSuite with SparkSuite {

  private def btwMap(edges: Array[(Long, Long)]): Map[(Long, Long), Double] =
    GraphOps.betweennessOfEdges(spark, edges).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("edge betweenness on a path graph 1-2-3") {
    // pairs: (1,2) uses e12; (1,3) uses both; (2,3) uses e23 → each edge 2.0
    assert(btwMap(Array((1L, 2L), (2L, 3L))) ==
      Map((1L, 2L) -> 2.0, (2L, 3L) -> 2.0))
  }

  test("edge betweenness on a star K1,3") {
    // leaf i: pairs (i,0),(i,j),(i,k) all cross edge (0,i) → 3.0 each
    val m = btwMap(Array((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(m == Map((0L, 1L) -> 3.0, (0L, 2L) -> 3.0, (0L, 3L) -> 3.0))
  }

  test("BFS sssp: hand graphs with known hop distances") {
    import spark.implicits._
    // run BOTH tiers (driver array BFS / distributed frontier joins) and
    // assert they agree before returning
    def distances(edges: Seq[(Long, Long)]): Map[Long, Int] = {
      val driver = GraphOps.ssspOf(edges.toDF("u", "v"), maxIters = 50)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val dist = GraphOps.ssspOf(edges.toDF("u", "v"), maxIters = 50,
          driverEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(driver == dist, s"tier mismatch: $driver vs $dist")
      driver
    }
    // path 1-2-3-4: distances from 1 are 0,1,2,3
    assert(distances(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
    // star from center 0: all leaves at 1
    assert(distances(Seq((0L, 1L), (0L, 2L), (0L, 3L))) ==
      Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 1))
    // cycle 1-2-4-3-1: opposite corner at 2 via either route
    assert(distances(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))) ==
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // disconnected: component of the min vertex only — 5,6 absent
    assert(distances(Seq((1L, 2L), (5L, 6L))) == Map(1L -> 0, 2L -> 1))
  }

  test("k-core peeling: hand graphs with known cores") {
    import spark.implicits._
    // run BOTH tiers (driver bucket peel / distributed semi-join rounds)
    // and assert they agree before returning
    def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
      val driver = GraphOps.kCoreOf(edges.toDF("u", "v"), k, maxRounds = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = GraphOps.kCoreOf(edges.toDF("u", "v"), k, maxRounds = 30,
          driverEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(driver == dist, s"tier mismatch: $driver vs $dist")
      driver
    }
    // triangle + pendant: 2-core is the triangle (pendant peeled, which
    // does NOT drop vertex 3 below degree 2)
    val triPend = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(core(triPend, 2) == Map(1L -> 2, 2L -> 2, 3L -> 2))
    // path graph has no 2-core: peeling the endpoints cascades until empty
    assert(core(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 2) == Map.empty)
    // K4 is its own 3-core
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(core(k4, 3) == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
    // two triangles joined by one bridge edge: 2-core keeps both triangles
    // (bridge endpoints have degree 3) but the bridge itself survives too,
    // so degrees reflect the bridged subgraph
    val bridged = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L))
    assert(core(bridged, 2) ==
      Map(1L -> 2, 2L -> 2, 3L -> 3, 4L -> 3, 5L -> 2, 6L -> 2))
  }

  test("edge betweenness splits shortest-path credit on a 4-cycle") {
    // 1-2, 1-3, 2-4, 3-4: by symmetry each edge carries 1 (adjacent pair)
    // + 0.5 (split from (1,4)) + 0.5 (split from (2,3)) = 2.0
    val m = btwMap(Array((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
    assert(m.values.forall(v => math.abs(v - 2.0) < 1e-9))
  }

  test("sparse betweenness tier equals the dense tier") {
    // hand graph with asymmetric structure (bridge + cycle + pendant)
    val edges = Array((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (3L, 5L),
      (5L, 6L), (6L, 7L), (7L, 5L), (7L, 8L))
    val dense = btwMap(edges)
    val sparse = GraphOps.betweennessOfEdgesSparse(spark, edges).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(sparse.keySet == dense.keySet)
    dense.foreach { case (k, v) =>
      assert(math.abs(sparse(k) - v) < 1e-9, s"edge $k: sparse=${sparse(k)} dense=$v")
    }
    // and the auto dispatch routes to the sparse tier above the threshold
    val viaDispatch = GraphOps.betweennessOfEdges(spark, edges, sparseEdgeThreshold = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(viaDispatch == sparse)
  }

  test("distributed connected components equals driver union-find on fixture") {
    import spark.implicits._
    val edgeDf = GraphOps.coPurchaseEdges(spark, sfDir).select("u", "v")
    val edges = edgeDf.as[(Long, Long)].collect()
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val uf = GraphOps.unionFind(vertices, edges)
    // force the DISTRIBUTED path (the auto path would pick driver here)
    val dist = GraphOps.componentsOfEdges(edgeDf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == uf)
    // and the auto path (driver tier at this size) agrees too
    val auto = GraphOps.componentsAuto(spark, edgeDf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(auto == uf)
    // auto with limit 0 must route to the distributed tier
    val forced = GraphOps.componentsAuto(spark, edgeDf, driverEdgeLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(forced == uf)
  }

  test("connected components agree with GraphX (third-party cross-check)") {
    import spark.implicits._
    import org.apache.spark.graphx.{Edge, Graph}
    val edgeDf = GraphOps.coPurchaseEdges(spark, sfDir).select("u", "v")
    val gx = Graph.fromEdges(
        edgeDf.as[(Long, Long)].rdd.map { case (u, v) => Edge(u, v, ()) }, ())
      .connectedComponents().vertices.collect().toMap // label = min vid
    val ours = GraphOps.componentsOfEdges(edgeDf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ours == gx)
  }

  test("modularity closed form equals the reference pairwise formula") {
    // residual graph = whatever edge set is passed in (reference computes
    // A_ij, degrees AND m from the post-removal subgraph)
    val edges = Array((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val degree = vertices.map(v =>
      v -> edges.count(e => e._1 == v || e._2 == v)).toMap
    val comp = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
    val m2 = 2.0 * edges.length
    // reference formula: sum over unordered same-community pairs of
    // (A_ij - d_i*d_j/2m), normalized by 2m (Community.scala:16-48)
    val edgeSet = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val pairwise = (for {
      i <- vertices; j <- vertices if i < j && comp(i) == comp(j)
      a = if (edgeSet((i, j))) 1.0 else 0.0
    } yield a - degree(i) * degree(j) / m2).sum / m2
    val closed = GraphOps.modularityOf(comp, edges)
    assert(math.abs(closed - pairwise) < 1e-12)
    assert(GraphOps.modularityOf(comp, Nil).isNaN)
  }

  test("communities are a partition of the graph vertices") {
    import spark.implicits._
    val edges = GraphOps.coPurchaseEdges(spark, sfDir)
      .select("u", "v").as[(Long, Long)].collect()
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct.toSet
    val rows = GraphOps.communities(spark, sfDir).collect()
    val members = rows.flatMap(_.getAs[String]("members").split(",").map(_.toLong))
    assert(members.length == members.distinct.length, "overlapping communities")
    assert(members.toSet == vertices, "communities must cover all vertices")
    rows.foreach(r => assert(r.getAs[String]("members").split(",").length == r.getAs[Int]("size")))
  }

  test("sampled betweenness ranks correlate with exact betweenness") {
    val exact = GraphOps.betweenness(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val est = GraphOps.betweennessSampled(spark, sfDir, 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(est.keySet == exact.keySet)
    // estimator is unbiased: totals should agree within sampling noise
    val (te, ts) = (exact.values.sum, est.values.sum)
    assert(math.abs(ts - te) / te < 0.2, s"total est $ts vs exact $te")
    // estimates track exact values (Pearson; rank recall would be noise-
    // dominated here — the dense fixture graph has tightly clustered
    // betweenness, so per-edge sampling noise reshuffles ranks)
    val keys = exact.keys.toSeq
    val (xs, ys) = (keys.map(exact), keys.map(est))
    val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
    val cov = keys.indices.map(i => (xs(i) - mx) * (ys(i) - my)).sum
    val corr = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
    // measured ≈0.49 on this graph: values cluster so tightly that per-edge
    // noise dominates; the guaranteed property is positive correlation plus
    // the unbiased total above, not high rank fidelity
    assert(corr > 0.35, s"est/exact correlation $corr too low for 50% sampling")
  }

  test("betweenness total equals sum of pairwise distances-through-edges invariant") {
    // Σ_e btw(e) = Σ_{s<t reachable} (#edges on shortest s-t paths weighted)
    // = Σ_{s<t} d(s,t) for unit-weight BFS credit — check on the path graph
    val m = btwMap(Array((1L, 2L), (2L, 3L), (3L, 4L)))
    // d(1,2)+d(1,3)+d(1,4)+d(2,3)+d(2,4)+d(3,4) = 1+2+3+1+2+1 = 10
    assert(math.abs(m.values.sum - 10.0) < 1e-9)
  }

  test("betweennessAuto guard routes above-limit edge lists to the distributed tier") {
    import spark.implicits._
    // asymmetric hand graph: bridge + cycle + pendant (same as sparse-tier test)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (3L, 5L),
      (5L, 6L), (6L, 7L), (7L, 5L), (7L, 8L))
    val exact = btwMap(edges.toArray)
    // limit 0 forces the guard: the edge list must never be collected, the
    // distributed join-based Brandes must produce the same credits at
    // fraction 1.0 (all sources)
    val guarded = GraphOps.betweennessAuto(spark, edges.toDF("u", "v"),
        driverEdgeLimit = 0L, fraction = 1.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(guarded.keySet == exact.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(guarded(k) - v) < 1e-9, s"edge $k: dist=${guarded(k)} exact=$v")
    }
    // and below the limit the same call takes the exact driver tier
    val under = GraphOps.betweennessAuto(spark, edges.toDF("u", "v"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(under == exact)
  }

  test("distributed betweenness source-sampling rescales by 1/fraction on a symmetric graph") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // 4-cycle: each source's BFS deposits a total of Σ_t d(s,t) = 4 credit
    // (before the ÷2), so the rescaled TOTAL is exactly k·4/2/fraction,
    // where k replays the estimator's own deterministic source hash
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val k = Seq(1L, 2L, 3L, 4L).toDF("s")
      .where(expr("pmod(xxhash64(s, 42), 1000000) < 500000")).count()
    val est = GraphOps.betweennessDistributed(spark, edges.toDF("u", "v"),
        fraction = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(est.size == 4)
    val expectedTotal = k * 4.0 / 2.0 / 0.5
    assert(math.abs(est.values.sum - expectedTotal) < 1e-9,
      s"$est total ${est.values.sum} vs expected $expectedTotal (k=$k)")
  }

  test("GnProber equals the boxed unionFind + modularityOf reference at every probe") {
    import spark.implicits._
    // fixture-ranked edges (real betweenness order) + a hand graph
    val fixtureRanked = GraphOps.betweenness(spark, sfDir)
      .select("u", "v").as[(Long, Long)].collect()
    val hand = Array((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (3L, 5L),
      (5L, 6L), (6L, 7L), (7L, 5L), (7L, 8L))
    for (ranked <- Seq(hand, fixtureRanked)) {
      val prober = new GraphOps.GnProber(ranked)
      val vertices = ranked.iterator.flatMap(e => Iterator(e._1, e._2)).toArray.distinct
      val ks = (0 to ranked.length by math.max(1, ranked.length / 7)) ++ Seq(ranked.length)
      ks.distinct.foreach { k =>
        val resid = ranked.drop(k)
        val comp = GraphOps.unionFind(vertices, resid)
        val qRef = GraphOps.modularityOf(comp, resid)
        val qFast = prober.modularityAt(k)
        assert((qRef.isNaN && qFast.isNaN) || math.abs(qRef - qFast) < 1e-12,
          s"k=$k: boxed=$qRef fast=$qFast")
        assert(prober.componentsAt(k) == comp, s"k=$k component labels differ")
        assert(prober.nCommunitiesAt(k) == comp.values.toSet.size)
      }
    }
  }

  test("GN communities and modularity curve refuse above-limit graphs with a named alternative") {
    val eC = intercept[IllegalArgumentException] {
      GraphOps.communities(spark, sfDir, driverEdgeLimit = 0L)
    }
    assert(eC.getMessage.contains("communitiesLpa"))
    val eM = intercept[IllegalArgumentException] {
      GraphOps.modularityCurve(spark, sfDir, driverEdgeLimit = 0L)
    }
    assert(eM.getMessage.contains("communitiesLpa"))
  }
}
