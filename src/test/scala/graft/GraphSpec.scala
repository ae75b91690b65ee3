package graft

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference fixed-point PageRank: the same integer recurrence the
    * operator distributes, computed sequentially over in-memory maps.
    */
  private def refPagerank(ids: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = ids.size.toLong
    val base = (Graph.PR_SCALE - Graph.PR_DAMP_NUM * Graph.PR_SCALE / Graph.PR_DAMP_DEN) / n
    var r = ids.map(_ -> Graph.PR_SCALE / n).toMap
    (1 to iters).foreach { _ =>
      val contribs = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        Graph.PR_DAMP_NUM * r(s) / (Graph.PR_DAMP_DEN * outDeg(s))
      }.sum).toMap
      r = ids.map(id => id -> (base + contribs.getOrElse(id, 0L))).toMap
    }
    r
  }

  test("pagerank matches the sequential fixed-point recurrence exactly") {
    // a hub (1), a cycle (2<->3), a feeder chain (4->5->1), a dangling
    // node (6, no out-edges) and an isolated node (7)
    val ids = (1L to 7L)
    val edges = Seq(2L -> 1L, 3L -> 1L, 2L -> 3L, 3L -> 2L,
      4L -> 5L, 5L -> 1L, 6L -> 1L)
    val got = Graph.pageRank(
      ids.toDF("id"),
      edges.toDF("src", "dst"))
      .select("id", "rank_ppb").as[(Long, Long)].collect().toMap
    val want = refPagerank(ids, edges, Graph.PR_ITERS)
    assert(got == want)
    // the hub outranks everything; the isolated node sits at the floor
    assert(got(1L) == got.values.max)
    assert(got(7L) == got.values.min)
  }

  test("pagerank conserves no more than the full fixed-point mass") {
    val ids = (1L to 5L)
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 1L)
    val got = Graph.pageRank(ids.toDF("id"), edges.toDF("src", "dst"))
      .select("id", "rank_ppb").as[(Long, Long)].collect()
    // a pure cycle loses only integer-truncation dust
    val total = got.map(_._2).sum
    assert(total <= Graph.PR_SCALE && total > Graph.PR_SCALE - 100L)
    // symmetric cycle -> identical ranks
    assert(got.map(_._2).distinct.length == 1)
  }

  /** Planted triangle graph: K4 on 1–4 (four triangles, every K4 node in
    * three), a pendant 5–1 (stretches node 1's degree without adding
    * triangles), and a star hub 10→11..16 (big degree, ZERO triangles —
    * the orientation stress case: all its edges must orient INTO the
    * leaves' order or out, but never produce a wedge that closes).
    */
  private val plantedUnd: Seq[(Long, Long)] = Seq(
    1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L, // K4
    1L -> 5L,                                                    // pendant
    10L -> 11L, 10L -> 12L, 10L -> 13L, 10L -> 14L, 10L -> 15L, 10L -> 16L)

  test("triangles: K4 counts exactly; star hub and pendant count zero") {
    val (e, deg) = Graph.orient(plantedUnd.toDF("u", "v"))
    // every triangle exactly once
    val tris = Graph.triangleSet(e)
      .as[(Long, Long, Long)].collect().map { case (x, y, z) =>
        Set(x, y, z) }.toSeq
    assert(tris.length == 4 && tris.distinct.length == 4,
      s"K4 has exactly 4 triangles, each found once; got $tris")
    assert(tris.forall(_.subsetOf(Set(1L, 2L, 3L, 4L))))
    // per-node: brute-force reference over all triples
    val adj = plantedUnd.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ids = adj.keys.toSeq.sorted
    val refTri = ids.map { v =>
      val nbrs = adj(v).toSeq
      v -> nbrs.combinations(2).count { case Seq(p, q) => adj(p).contains(q) }
    }.toMap
    val degDf = deg.as[(Long, Long)].collect().toMap
    ids.foreach { v =>
      assert(degDf(v) == adj(v).size, s"degree of $v")
    }
    assert(refTri(1L) == 3 && refTri(5L) == 0 && refTri(10L) == 0)
  }

  test("link prediction: planted wedges score exactly; adjacent and capped pairs drop") {
    // path 20–21–22: the only wedge center is 21 (degree 2) -> predict
    // (20, 22) with cn=1, ra_ppm = 10^6 div 2
    // 4-cycle 30–31–32–33: each diagonal has TWO degree-2 common
    // neighbors -> cn=2, ra_ppm = 2 · (10^6 div 2)
    // K4 from plantedUnd: every pair adjacent -> nothing predicted
    // star hub 40 with 65 leaves: center degree 65 > LINK_CENTER_CAP=64
    // -> every leaf pair sheds with the center
    require(Graph.LINK_CENTER_CAP == 64L)
    val star = (41L to 105L).map(l => 40L -> l)
    val und = (plantedUnd ++ Seq(20L -> 21L, 21L -> 22L,
      30L -> 31L, 31L -> 32L, 32L -> 33L, 30L -> 33L) ++ star).toDF("u", "v")
    val got = Graph.linkPredictFrom(und)
      .as[(Long, Long, Long, Long)].collect().toSet
    val half = Graph.RA_SCALE / 2
    assert(got.contains((20L, 22L, 1L, half)))
    assert(got.contains((30L, 32L, 2L, 2 * half)))
    assert(got.contains((31L, 33L, 2L, 2 * half)))
    // no prediction touches the capped star's leaves or center
    assert(!got.exists(p => p._1 >= 40L && p._1 <= 105L))
    // no predicted pair is an existing edge
    val edges = (plantedUnd ++ star).toSet
    assert(got.forall(p => !edges.contains((p._1, p._2))))
    // pendant 5 shares center 1 with each of 2, 3, 4 (deg(1) = 4: the K4
    // plus the pendant edge): ra = 10^6 div 4, and nothing else predicted
    Seq(2L, 3L, 4L).foreach { x =>
      assert(got.contains((x, 5L, 1L, Graph.RA_SCALE / 4)))
    }
    // plantedUnd's own star (hub 10, SIX leaves — under the cap) predicts
    // all C(6,2)=15 leaf pairs at ra = 10^6 div 6: 6 + 15 rows total
    assert(got.contains((11L, 12L, 1L, Graph.RA_SCALE / 6)))
    assert(got.size == 21, s"exactly the 21 planted predictions; got $got")
    // order: exact integer key, descending
    val ordered = Graph.linkPredictFrom(und)
      .as[(Long, Long, Long, Long)].collect()
    assert(ordered.sliding(2).forall {
      case Array(x, y) =>
        x._4 > y._4 || (x._4 == y._4 &&
          (x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)))
      case _ => true
    })
  }

  test("incremental link prediction ≡ cold on planted splits, incl. cap crossing") {
    def diff(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).count() + b.exceptAll(a).count()
    def run(undS: Seq[(Long, Long)], undA: Seq[(Long, Long)]) = {
      val s = undS.toDF("u", "v"); val a = undA.toDF("u", "v")
      val inc = Graph.linkIncrementalOver(a, s, Graph.linkScores(s))
      val cold = Graph.linkPredictFrom((undS ++ undA).toDF("u", "v"))
      assert(diff(inc, cold) == 0, s"standing=$undS arrival=$undA")
    }
    // new wedges only (arrival pendant on the K4)
    run(plantedUnd, Seq(4L -> 20L))
    // re-weight: arrival at an existing center changes the weight of the
    // STANDING wedge pairs there (deg(1): 4 -> 5)
    run(plantedUnd, Seq(1L -> 21L))
    // a predicted pair becomes an edge (20-22 closes the 20-21-22 path)
    run(plantedUnd ++ Seq(20L -> 21L, 21L -> 22L), Seq(20L -> 22L))
    // cap crossing: standing star at EXACTLY the cap sheds all its
    // standing pairs when one arrival leaf pushes it past
    val bigStar = (1L to Graph.LINK_CENTER_CAP).map(l => 200L -> (200L + l))
    run(bigStar, Seq(200L -> 999L))
    // arrival-only component + mixed A-S wedges at a fresh center
    run(plantedUnd, Seq(30L -> 31L, 31L -> 32L, 1L -> 31L))
    // and the fixture: parity split, state built from the standing half
    val und = graft.ops.Graph.undirectedKnn(
      graft.pipeline.Tables.embeddings(spark, "/root/testdata/sf0.001"))
    val undS = und.filter($"u" % 2 === 0 && $"v" % 2 === 0)
    val undA = und.filter($"u" % 2 === 1 || $"v" % 2 === 1)
    assert(diff(Graph.linkIncrementalOver(undA, undS, Graph.linkScores(undS)),
      Graph.linkPredictFrom(und)) == 0)
  }

  test("link deltas telescope: 3-way hand batching merges to the one-shot result") {
    def diff(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).count() + b.exceptAll(a).count()
    def df(s: Seq[(Long, Long)]) = s.toDF("u", "v")
    // standing: the planted graph plus a star at cap−1 leaves
    val star = (1L until Graph.LINK_CENTER_CAP).map(l => 300L -> (300L + l))
    val standing = plantedUnd ++ star
    // b1 re-weights K4 center 1 AND takes the star exactly TO the cap;
    // b2 builds a path and pushes the star PAST the cap (retraction in a
    // LATER batch than the re-weight); b3 closes the path (prediction
    // killed only by the drain's non-adjacency filter)
    val b1 = Seq(1L -> 21L, 300L -> 998L)
    val b2 = Seq(20L -> 21L, 21L -> 22L, 300L -> 999L)
    val b3 = Seq(20L -> 22L)
    val d1 = Graph.linkDeltas(df(b1), df(standing))
    val d2 = Graph.linkDeltas(df(b2), df(standing ++ b1))
    val d3 = Graph.linkDeltas(df(b3), df(standing ++ b1 ++ b2))
    val merged = Graph.linkMerge(Graph.linkScores(df(standing)),
      d1.unionByName(d2).unionByName(d3))
    val got = Graph.linkFinish(merged, df(standing ++ b1 ++ b2 ++ b3))
    val cold = Graph.linkPredictFrom(df(standing ++ b1 ++ b2 ++ b3))
    assert(diff(got, cold) == 0)
    // and in ONE batch — same answer (batching invariance, both ways)
    val one = Graph.linkIncrementalOver(df(b1 ++ b2 ++ b3), df(standing),
      Graph.linkScores(df(standing)))
    assert(diff(one, cold) == 0)
  }

  test("graph_triangles / graph_transitivity: fixture self-consistency") {
    val per = Graph.graphTriangles(spark, "/root/testdata/sf0.001").collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      val d = r.getLong(r.fieldIndex("degree"))
      val t = r.getLong(r.fieldIndex("triangles"))
      val c = r.getLong(r.fieldIndex("coeff_ppm"))
      assert(t <= d * (d - 1) / 2, "a node's triangles cannot exceed its wedge count")
      assert(c >= 0 && c <= 1000000, s"coefficient must be a ratio, got $c ppm")
      if (d >= 2) assert(c == 2 * t * 1000000 / (d * (d - 1)))
    }
    val g = Graph.graphTransitivity(spark, "/root/testdata/sf0.001").head
    val nt = g.getLong(g.fieldIndex("n_triangles"))
    val nw = g.getLong(g.fieldIndex("n_wedges"))
    // 3·T counts each triangle's three wedges; transitivity ≤ 1
    assert(3 * nt <= nw)
    assert(nt * 3 == per.map(_.getLong(2)).sum,
      "per-node memberships must sum to 3 per triangle")
    assert(nw == per.map { r =>
      val d = r.getLong(1); d * (d - 1) / 2 }.sum)
  }

  /** Edge-level split of a planted graph for the incremental delta — the
    * seam accepts ANY standing/arrival edge decomposition, so the spec
    * plants every class the delta must count exactly once: exactly-one-A
    * ({1,3,4}, {2,3,4} via arrival K4 edge (3,4)), two-A ({6,7,8}), all-A
    * ({10,11,12}) — including positions a node-based split can never
    * produce — plus arrival pendant (1,5) and standing star hub (no
    * triangles from either).
    */
  private val incUnd: Seq[(Long, Long)] = Seq(
    1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L, // K4
    6L -> 7L, 6L -> 8L, 7L -> 8L,
    10L -> 11L, 10L -> 12L, 11L -> 12L,
    1L -> 5L,
    20L -> 21L, 20L -> 22L, 20L -> 23L, 20L -> 24L)
  private val incArr: Set[(Long, Long)] = Set(
    3L -> 4L, 6L -> 7L, 6L -> 8L,
    10L -> 11L, 10L -> 12L, 11L -> 12L, 1L -> 5L)

  test("triangle delta: every arrival-touching triangle once, none missed") {
    val undDf = incUnd.toDF("u", "v")
    val undA = incArr.toSeq.toDF("u", "v")
    val undS = incUnd.filterNot(incArr).toDF("u", "v")
    val degM = Graph.degreesOf(undDf) // merged = full-graph degrees
    val delta = Graph.triangleDelta(
        Graph.orientBy(undS, degM), Graph.orientBy(undA, degM))
      .as[(Long, Long, Long)].collect().map { case (x, y, z) => Set(x, y, z) }
    assert(delta.length == delta.distinct.length,
      s"each delta triangle exactly once; got ${delta.toSeq}")
    assert(delta.toSet == Set(
      Set(1L, 3L, 4L), Set(2L, 3L, 4L), Set(6L, 7L, 8L), Set(10L, 11L, 12L)),
      "delta = all triangles with ≥1 arrival edge, and no all-standing one")
  }

  test("triangles incremental: standing stats + delta ≡ cold on any edge split") {
    val undDf = incUnd.toDF("u", "v")
    val undA = incArr.toSeq.toDF("u", "v")
    val undS = incUnd.filterNot(incArr).toDF("u", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = rows(Graph.trianglesIncrementalOver(
      undA, Graph.nodeStats(undS), Graph.orientBy(undS, _)))
    val want = rows(Graph.withCoeff(Graph.nodeStats(undDf)))
    assert(got == want)
    // and the empty-batch degenerate: no arrivals → exactly the standing stats
    val none = Seq.empty[(Long, Long)].toDF("u", "v")
    val still = rows(Graph.trianglesIncrementalOver(
      none, Graph.nodeStats(undS), Graph.orientBy(undS, _)))
    assert(still == rows(Graph.withCoeff(Graph.nodeStats(undS))))
  }

  test("graph_triangles_incremental ≡ graph_triangles on the fixture") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows(Graph.graphTrianglesIncremental(spark, "/root/testdata/sf0.001"))
      == rows(Graph.graphTriangles(spark, "/root/testdata/sf0.001")))
  }

  test("transitivity incremental: standing Σt/3 + delta ≡ cold, on split and fixture") {
    val undA = incArr.toSeq.toDF("u", "v")
    val undS = incUnd.filterNot(incArr).toDF("u", "v")
    def row(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSeq
    // cold over the full planted graph, via the same helpers the gated
    // cold query composes
    val st = Graph.nodeStats(incUnd.toDF("u", "v"))
    val coldT = st.selectExpr("sum(t) div 3").as[Long].head
    val coldW = st.selectExpr("sum(d * (d - 1) div 2)").as[Long].head
    val got = row(Graph.transitivityIncrementalOver(
      undA, Graph.nodeStats(undS), Graph.orientBy(undS, _))).head
    assert(got._1 == coldT && got._2 == coldW)
    assert(got._3 == (if (coldW > 0) 3 * coldT * 1000000 / coldW else 0L))
    // and the gated form against the cold query on the fixture
    assert(row(Graph.graphTransitivityIncremental(spark, "/root/testdata/sf0.001"))
      == row(Graph.graphTransitivity(spark, "/root/testdata/sf0.001")))
  }

  test("tri stream: batch-owned edges partition arrivals; emissions merge to cold under any batching") {
    // odd nodes arrive in three hand-driven batches; triangles span
    // batches ({1,3,4}: arrival edges land with node 3 then close via
    // node 1's pendant? no — via (3,4); {6,7,8} closes only when 7
    // arrives; {10,11,12} all-arrival across two batches)
    val und = Seq(
      2L -> 4L, 2L -> 6L, 4L -> 6L,              // standing triangle
      3L -> 2L, 3L -> 4L,                         // odd 3 closes {2,3,4}
      7L -> 6L, 7L -> 9L, 9L -> 6L,               // {6,7,9} needs 7 AND 9
      11L -> 13L, 11L -> 15L, 13L -> 15L)         // all-odd triangle
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("u", "v").localCheckpoint()
    val undS = und.filter($"u" % 2 === 0 && $"v" % 2 === 0)
    val statsSt = Graph.nodeStats(undS)
    val batches = Seq(Seq(3L, 11L), Seq(7L, 13L), Seq(9L, 15L))
    var seen = undS.localCheckpoint()
    var arrived = Seq.empty[Long].toDF("id").localCheckpoint()
    val outs = batches.map { ids =>
      val nb = ids.toDF("id")
      val aB = Graph.batchEdges(und, nb, arrived).localCheckpoint()
      val e = Graph.triStreamEmit(seen, aB).localCheckpoint()
      seen = seen.unionByName(aB).localCheckpoint()
      arrived = arrived.unionByName(nb).localCheckpoint()
      (aB, e)
    }
    // ownership partitions the arrival edge set: disjoint, exhaustive
    val owned = outs.map(_._1.as[(Long, Long)].collect().toSet)
    assert(owned.map(_.size).sum == owned.reduce(_ ++ _).size)
    assert(owned.reduce(_ ++ _) ++ undS.as[(Long, Long)].collect().toSet
      == und.as[(Long, Long)].collect().toSet)
    // edge (11,13) waits for 13; (11,15)/(13,15) for 15; (7,9) for 9
    assert(owned(1).contains((11L, 13L)) && owned(2).contains((7L, 9L)))
    // merged emissions ≡ cold stats over the full graph
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val merged = Graph.triStreamMerge(statsSt,
      outs.map(_._2).reduce(_ unionByName _))
    assert(rows(merged) == rows(Graph.withCoeff(Graph.nodeStats(und))))
  }

  test("plan: triangle join is equi-joins over the oriented frame — no cartesian") {
    val p = Graph.graphTriangles(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "wedge build and closing-edge probe must be hash/merge equi-joins")
  }
}
