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

  test("a planted mega-star (hub owns 20% of 5k nodes) resolves exactly, " +
    "fast-fixpoint, alongside background blocks") {
    // the adversarial-skew shape the groupBy-min rounds exist for: one
    // hub-centered component holding 20% of the universe next to many
    // small blocks. Correctness companion to ScaleBench's cc_mega_star
    // timing probe.
    val n = 5000
    val edges = (1 until n).map { i =>
      if (i % 5 == 0) (0L, i.toLong) else ((i / 64) * 64L, i.toLong)
    }
    val got = engine(edges)
    // hub component = {0} ∪ {multiples of 5} ∪ block 0's members (their
    // block anchor is node 0 itself); every other block labels by its
    // anchor. Union-find is the ground truth either way.
    assert(got === unionFind(n, edges))
    val hubSize = got.values.count(_ == 0L)
    assert(hubSize > n / 5, s"mega component too small: $hubSize")
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

  test("kCore: triangle + pendant chain peels to the triangle") {
    // 0-1-2 triangle, chain 2-3-4: the 2-core is exactly the triangle;
    // peeling removes 4 (deg 1), then 3, needing >1 round — exercises the
    // iteration, the converged flag, and isolated node 9
    val nodes = (0L to 4L).toDF("doc_id").union(Seq(9L).toDF("doc_id"))
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = GraphOps.kCore(nodes, "doc_id", edges, k = 2, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toSet
    assert(got === Set(
      (0L, 2L, true, true), (1L, 2L, true, true), (2L, 2L, true, true),
      (3L, 0L, false, true), (4L, 0L, false, true), (9L, 0L, false, true)))
  }

  test("kCore: too few rounds reports converged = false") {
    // chain 0-1-2-3-4-5 needs multiple peels; 1 round only strips the ends
    val nodes = (0L to 5L).toDF("doc_id")
    val edges = (0L to 4L).map(i => (i, i + 1)).toDF("u", "v")
    val one = GraphOps.kCore(nodes, "doc_id", edges, k = 2, rounds = 1)
    assert(one.select("converged").distinct().collect().map(_.getBoolean(0)).toSeq === Seq(false))
    val enough = GraphOps.kCore(nodes, "doc_id", edges, k = 2, rounds = 5)
    assert(enough.select("converged").distinct().collect().map(_.getBoolean(0)).toSeq === Seq(true))
    // a chain has no 2-core at all
    assert(enough.filter($"in_core").count() === 0L)
  }

  test("pageRank: symmetric pair splits teleport+damping mass equally; sums conserve") {
    // two connected nodes + one isolated, 3 iterations, d=0.85: by symmetry
    // the pair's ranks are equal; isolated keeps base mass 0.15/3
    val nodes = Seq(0L, 1L, 2L).toDF("doc_id")
    val edges = Seq((0L, 1L)).toDF("u", "v")
    val got = GraphOps.pageRank(nodes, "doc_id", edges)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(0L) === got(1L))
    assert(math.abs(got(2L) - 0.05) < 1e-12)
    // connected-pair recursion: r = 0.05 + 0.85*r (deg 1 each) -> fixpoint
    // 1/3; after 3 iterations from 1/3 it stays exactly at the fixpoint
    assert(math.abs(got(0L) - (1.0 / 3)) < 1e-12)
  }

  test("pageRank: star center out-ranks leaves") {
    val nodes = (0L to 4L).toDF("doc_id")
    val edges = (1L to 4L).map(i => (0L, i)).toDF("u", "v")
    val got = GraphOps.pageRank(nodes, "doc_id", edges)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert((1L to 4L).forall(i => got(0L) > got(i)))
    assert((2L to 4L).forall(i => math.abs(got(1L) - got(i)) < 1e-15))
  }
}
