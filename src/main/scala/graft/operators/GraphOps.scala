package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the missing closure step of every
  * near-duplicate pipeline: LSH emits PAIRS, but "keep one doc per
  * duplicate cluster" needs the transitive closure of those pairs (A~B,
  * B~C puts A and C in one cluster even when LSH never compared them).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14 — public
  * literature). Each round is ONE hash-shuffle of the edge list grouped by
  * node; the edge set contracts toward stars centered on each component's
  * minimum id, converging in O(log n) rounds — unlike naive min-label
  * propagation whose round count is the graph DIAMETER (a 1M-long chain
  * of near-dup docs = 1M shuffles naive, ~20 here). At 100 TB the edge
  * list is orders of magnitude smaller than the corpus (only candidate
  * pairs), every round is a uniform hash exchange, and per-group state is
  * one running minimum — no adjacency list ever materializes in memory.
  *
  * Determinism: the fixpoint (star graphs centered on component minima) is
  * unique regardless of iteration order, so the result is oracle-checkable
  * even though the round count varies with graph shape.
  */
object GraphOps {

  /** Component id (= minimum member id) for every node of `edges`.
    *
    * @param edges undirected edge list with two long columns `u`, `v`
    *              (self-loops and duplicates tolerated)
    * @return (id, component) — one row per distinct node
    */
  /** Canonical unordered pairs (small, large), self-loops dropped; pinned
    * with localCheckpoint so iterative callers don't re-derive the scan.
    */
  private def canonicalEdges(edges: DataFrame): DataFrame =
    edges
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()

  // one round = per-node neighborhood minimum (m) re-pointing a slice of
  // the neighborhood at m; large-star re-points strictly larger neighbors,
  // small-star re-points smaller neighbors and the node itself. Both emit
  // canonical (min, max) pairs by construction (m <= u < v in large-star;
  // m <= v' for v' emitted in small-star).
  //
  // The neighborhood minimum is a groupBy(min) + join-back, NEVER
  // `min().over(Window.partitionBy("u"))`: a node-partitioned window has
  // no map-side partials and AQE cannot split it, so a mega duplicate
  // component (boilerplate pages — routine in web corpora) would funnel
  // every edge of the component through ONE WindowExec task per round,
  // ~2·log n times — the curse of the last reducer. The hash aggregate
  // keeps the min partial on the map side (the mins table is one 16-byte
  // row per node regardless of degree), and the join-back on u is a plain
  // shuffle join AQE's skew-split can divide. PlanGuardSpec pins this
  // shape; exposed private[graft] for that gate.

  private[graft] def largeStar(cur: DataFrame): DataFrame = {
    val sym = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("nmin"))
    // no trailing distinct: rows are two longs, so deduplicating here
    // costs a full extra shuffle per round just to shrink smallStar's
    // input; smallStar's own distinct restores set semantics
    // (which the sig-based fixpoint check depends on)
    sym.join(mins, "u")
      .withColumn("m", least(col("nmin"), col("u")))
      .filter(col("v") > col("u") && col("v") =!= col("m"))
      .select(col("m").as("u"), col("v"))
  }

  private[graft] def smallStar(cur: DataFrame): DataFrame = {
    // neighbors below u, plus u itself, all re-pointed at the minimum
    val down = cur.select(col("v").as("u"), col("u").as("v")) // v < u rows
    val mins = down.groupBy("u").agg(min(col("v")).as("nmin"))
    down.join(mins, "u")
      .select(col("nmin").as("m"), col("v"), col("u"))
      .select(col("m").as("u"),
        explode(array(col("v"), col("u"))).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v")).distinct()
  }

  /** Partition-local union-find contraction (the "local aggregation" /
    * local-contraction preprocessing step discussed alongside the
    * alternating-star algorithm in Kiveris et al. SoCC'14): each task
    * collapses ITS slice of the edge list to one (componentMin, member)
    * star edge per non-root node seen in the partition. This is a
    * mapPartitions kernel, never a driver collect — the per-task state is
    * one long->long map over the nodes of that partition, bounded by the
    * input split size, and the output is never larger than the input.
    *
    * Why it pays twice: (1) it replaces canonicalEdges' distinct() — a
    * full shuffle whose only purpose was set semantics — because the
    * contraction dedups implicitly; (2) the star loop starts from
    * per-partition stars instead of raw pairs, which removes most of its
    * O(log n) rounds — and each round is several chained shuffles plus a
    * checkpoint, the dominant fixed cost of every dedup-closure query (at
    * sf0.1, x11 spent 47 Spark jobs mostly in these rounds; with the
    * contraction the loop usually verifies a fixpoint in one round).
    *
    * Determinism: union-by-min makes the forest root of every
    * within-partition component its minimum id regardless of edge order,
    * so the emitted edge SET is a pure function of the partition contents,
    * and the sig()-based fixpoint check downstream is order-free.
    *
    * Per-task memory bound (ADVICE r13): the union-find holds one LongMap
    * entry per distinct node id in the split — with 128 MB splits of
    * 16-byte edge rows that is up to ~16M entries (hundreds of MB) per
    * task, a real footprint unlike the streaming-min star rounds. At
    * cluster scale, cap the effective split size of the contraction input
    * (spark.sql.files.maxPartitionBytes on the edge scan) so the map
    * stays inside the task's execution-memory share; at the bench SFs the
    * whole edge set is a single split and the map is a few MB.
    */
  private def localContract(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    edges.select(col("u"), col("v")).as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x0: Long): Long = {
          var r = x0
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x0
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          if (a != b) {
            parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
            val ra = find(a); val rb = find(b)
            if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
          }
        }
        parent.keysIterator.toArray.iterator.flatMap { n =>
          val r = find(n)
          if (r != n) Iterator((r, n)) else Iterator.empty
        }
      }
      .toDF("u", "v")
  }

  def connectedComponents(edges: DataFrame): DataFrame = {
    var e = localContract(edges).localCheckpoint()

    // edge-set signature: cheap fixpoint detector (count + order-free hash;
    // the hash is bucketed into [0, 1e9) so the sum stays overflow-safe
    // under ANSI arithmetic up to ~9e9 edges)
    def sig(cur: DataFrame): (Long, Long) = {
      val r = cur.agg(count(lit(1)),
        sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L)))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // A single-partition contraction IS the global fixpoint: the one task
    // saw every edge, so its union-find labels are component minima and
    // the emitted edge set is already the star graph the loop converges
    // to — running a verify round would only prove what holds by
    // construction. Multi-partition inputs (any real scale) take the
    // alternating-star loop below unchanged.
    if (e.rdd.getNumPartitions > 1) {
      var s = sig(e)
      var stable = false
      var rounds = 0
      while (!stable && rounds < 64) { // 64 >> log2(any corpus)
        val next = smallStar(largeStar(e)).localCheckpoint()
        val ns = sig(next)
        stable = ns == s
        s = ns
        e = next
        rounds += 1
      }
    }

    // at fixpoint every edge is (componentMin, member); centers map to
    // themselves
    val members = e.select(col("v").as("id"), col("u").as("component"))
    val centers = e.select(col("u").as("id"), col("u").as("component")).distinct()
    members.union(centers)
      .groupBy("id").agg(min("component").as("component"))
  }

  /** Per-node triangle counts over an undirected edge list — the cluster
    * -density signal of a duplicate graph (a dup set that is a clique is a
    * true duplicate cluster; a sparse chain is LSH noise).
    *
    * Algorithm: degree-ordered orientation (Suri & Vassilvitskii,
    * "Counting Triangles and the Curse of the Last Reducer", WWW'11 —
    * public literature). Each edge points at its (degree, id)-larger
    * endpoint, making a DAG in which every triangle has exactly ONE vertex
    * with two out-edges, so wedges from that vertex enumerate each
    * triangle once; the closing check is a hash join on canonical
    * (min, max) edge keys. Orientation bounds the wedge fan-out by
    * out-degree ≤ O(√m) for any graph — the hub that would explode a naive
    * neighbor self-join never owns its wedges. All stages are hash
    * shuffles on edge/node keys; nothing is all-pairs.
    *
    * @param edges undirected edges, long columns `u`, `v` (dups/loops ok)
    * @return (id, n_triangles) for every node appearing in an edge
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = canonicalEdges(edges)
    val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val dir = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"))
    val wedges = dir.select(col("src"), col("dst").as("y"))
      .join(dir.select(col("src"), col("dst").as("z")), Seq("src"))
      .filter(col("y") < col("z"))
    val closed = wedges.join(e,
        least(col("y"), col("z")) === col("u") &&
          greatest(col("y"), col("z")) === col("v"))
      .select(col("src").as("x"), col("y"), col("z"))
    val nodes = e.select(col("u").as("id"))
      .union(e.select(col("v").as("id"))).distinct()
    val corners = closed
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("c"))
    nodes.join(corners, Seq("id"), "left")
      .select(col("id"), coalesce(col("c"), lit(0L)).as("n_triangles"))
  }

  /** [[connectedComponents]] plus singleton nodes from `universe` (nodes
    * with no edges are their own component) and per-component size.
    */
  def components(universe: DataFrame, idCol: String, edges: DataFrame): DataFrame = {
    val cc = connectedComponents(edges)
    val all = universe.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    all.join(
      all.groupBy("component").agg(count(lit(1)).as("n_members")),
      Seq("component"))
      .select(col("id"), col("component"), col("n_members"))
  }

  /** PageRank (Brin & Page, "The anatomy of a large-scale hypertextual Web
    * search engine" — public literature) over an undirected edge list: the
    * graph-centrality quality signal web-corpus pipelines rank domains and
    * pages by. Fixed `iterations` power steps of
    * `r' = (1−d)/N + d·Σ_in r/deg` with d = 0.85; nodes without edges keep
    * the teleport mass `(1−d)/N` (the uniform-teleport simplification:
    * dangling mass is not redistributed — rank is a per-node score here,
    * not a probability distribution; same contract as most large-scale
    * implementations' default).
    *
    * Scale: the edge list (with out-degree attached) is computed ONCE and
    * pinned with localCheckpoint; each iteration is one hash join
    * (ranks×edges on src, both keyed) plus one aggregation keyed by dst —
    * O(E) shuffle per step, a fixed step count, no adjacency list in
    * memory. Determinism: the per-node in-sum is a FIXED-ORDER fold over
    * neighbors sorted by source id (`array_sort` + `aggregate`), so the
    * float accumulation order — normally partition-dependent — is
    * bit-identical on any cluster and any engine; a web-scale deployment
    * with million-degree hubs swaps the fold for a plain `sum()` (one
    * expression) and accepts last-ulp variance.
    *
    * @param nodes node universe (one row per node)
    * @param idCol long node-id column of `nodes`
    * @param edges undirected edges, long columns `u`, `v` (dups/loops ok)
    * @return (id, pagerank) — one row per node of `nodes`
    */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
      iterations: Int = 3): DataFrame = {
    val e = canonicalEdges(edges)
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val ed = sym.join(deg, "u")
      .select(col("u").as("src"), col("v").as("dst"), col("deg"))
      .localCheckpoint()
    var ranks = nodes.select(col(idCol).as("id"))
      .crossJoin(broadcast(nodes.agg(count(lit(1)).as("n"))))
      .select(col("id"),
        (lit(0.15) / col("n").cast("double")).as("base"),
        (lit(1.0) / col("n").cast("double")).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val sums = ed.join(ranks.select(col("id").as("src"), col("rank")), "src")
        .select(col("dst"), col("src"),
          (col("rank") / col("deg").cast("double")).as("c"))
        .groupBy("dst")
        .agg(aggregate(
          array_sort(collect_list(struct(col("src"), col("c")))),
          lit(0.0),
          (acc, x) => acc + x.getField("c")).as("s"))
      ranks = ranks.join(sums, ranks("id") === sums("dst"), "left")
        .select(ranks("id"), ranks("base"),
          (ranks("base") + lit(0.85) * coalesce(col("s"), lit(0.0))).as("rank"))
    }
    ranks.select(col("id"), col("rank").as("pagerank"))
  }

  /** k-core decomposition by iterative peeling (Batagelj & Zaversnik,
    * "An O(m) Algorithm for Cores Decomposition of Networks" — public
    * literature; the distributed form peels one degree-filter round at a
    * time): repeatedly drop nodes of degree < k and their incident edges.
    * In corpus curation the 2-core of the near-duplicate graph separates
    * densely-duplicated content (spam farms, boilerplate families — dup
    * sets are cliques, so any set of size ≥ 3 survives) from isolated
    * pairs.
    *
    * Round count is FIXED (`rounds`) rather than run-to-fixpoint, so the
    * oracle can replay the exact same rounds as chained CTEs; the
    * `converged` column (this round's survivor count == last round's)
    * reports whether the fixpoint was reached, instead of a hardcoded
    * gate that could mask an unconverged run. Each round is one
    * degree aggregation + two semi-join filters over the shrinking edge
    * list — O(E) shuffle, no adjacency list in memory; localCheckpoint
    * pins each round's edges so lineage stays flat.
    *
    * @return (id, core_deg, in_core, converged) — one row per node of
    *         `nodes`; core_deg = degree among survivors after `rounds`
    *         peels (0 if peeled), in_core = core_deg >= k.
    */
  def kCore(nodes: DataFrame, idCol: String, edges: DataFrame,
      k: Int, rounds: Int = 4): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
        .groupBy("u").agg(count(lit(1)).as("deg"))
    var e = canonicalEdges(edges)
    var prevCount = e.count()
    var converged = false
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("u").as("kid"))
      e = e
        .join(keep, e("u") === col("kid"), "left_semi")
        .join(keep, e("v") === col("kid"), "left_semi")
        .localCheckpoint()
      val c = e.count()
      converged = c == prevCount
      prevCount = c
    }
    nodes.select(col(idCol).as("id"))
      .join(degrees(e).select(col("u").as("id"), col("deg")), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("deg"), lit(0L)).as("core_deg"),
        (coalesce(col("deg"), lit(0L)) >= k).as("in_core"),
        lit(converged).as("converged"))
  }
}
