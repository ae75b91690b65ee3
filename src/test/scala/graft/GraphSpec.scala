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
}
