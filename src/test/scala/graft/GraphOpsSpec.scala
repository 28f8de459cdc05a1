package graft

import graft.operators.GraphOps

/** Connected components vs a local union-find ground truth: random graphs
  * (structure-free), a long chain (defeats any fixed-hop shortcut — the
  * alternating-star rounds must actually contract), and disjoint cliques
  * with singletons (the dup-set shape x11 serves).
  */
class GraphOpsSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // component id = min member id, matching the engine's contract
    val byRoot = nodes.groupBy(id => find(id.toInt))
    byRoot.values.flatMap { ms => val m = ms.min; ms.map(_ -> m) }.toMap
  }

  private def engine(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(20260812)
    for (trial <- 1 to 3) {
      val n = 50 + trial * 10
      val edges = Seq.fill(n) {
        val a = rnd.nextInt(n)
        var b = rnd.nextInt(n)
        while (b == a) b = rnd.nextInt(n)
        (a.toLong, b.toLong)
      }
      assert(engine(edges) === unionFind(n, edges), s"trial $trial")
    }
  }

  test("a 40-node chain collapses to a single component") {
    val edges = (0L until 39L).map(i => (i, i + 1))
    val got = engine(edges)
    assert(got.size === 40)
    assert(got.values.toSet === Set(0L))
  }

  test("disjoint cliques keep distinct minima; universe adds singletons") {
    // cliques {1,2,3}, {10,11}, singleton 20 via the universe
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L))
    val universe = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val got = GraphOps.components(universe, "doc_id", edges.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 1L)))
  }

  test("triangleCounts: K4 + pendant + isolated edge, hand-computed") {
    // K4 on {1,2,3,4}: 4 triangles, each vertex in 3; pendant 5-1 and
    // isolated edge 6-7 contribute none
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L), (6L, 7L)).toDF("u", "v")
    val got = GraphOps.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 0L, 6L -> 0L, 7L -> 0L))
    // total triangles = sum of corners / 3
    assert(got.values.sum / 3 === 4)
  }

  test("triangleCounts matches brute force on random graphs") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 30
      val es = (for {
        u <- 0L until n; v <- (u + 1) until n if rng.nextDouble() < 0.2
      } yield (u, v)).toSeq
      val adj = es.toSet
      def isEdge(a: Long, b: Long) =
        adj.contains((math.min(a, b), math.max(a, b)))
      val expect = (for {
        x <- 0L until n; y <- (x + 1) until n; z <- (y + 1) until n
        if isEdge(x, y) && isEdge(y, z) && isEdge(x, z)
      } yield Seq(x, y, z)).flatten
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = GraphOps.triangleCounts(es.toDF("u", "v")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // nodes present in edges but triangle-free must report 0
      val nodesInEdges = es.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet === nodesInEdges)
      got.foreach { case (id, c) =>
        assert(c === expect.getOrElse(id, 0L), s"node $id")
      }
    }
  }

  test("empty edge set yields all-singleton components") {
    val universe = Seq(5L, 6L).toDF("doc_id")
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    val got = GraphOps.components(universe, "doc_id", empty)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((5L, 5L, 1L), (6L, 6L, 1L)))
  }
}
