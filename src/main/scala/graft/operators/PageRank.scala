package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank (Page, Brin, Motwani, Winograd 1999) and its
  * seed-biased TrustRank variant (Gyöngyi, Garcia-Molina, Pedersen —
  * "Combating Web Spam with TrustRank", VLDB 2004) as fixed power
  * iterations over an edge list — the canonical iterative graph
  * workload next to the repo's label-propagation family
  * (Dedup.connectedComponents / starComponents). In a training-data
  * pipeline these are the link-graph curation scores: Common Crawl
  * ranks domains by centrality before sampling, and TrustRank
  * propagates "vetted source" quality onto mirrors/recrawls through
  * the duplicate graph.
  *
  * ==Exact integer arithmetic==
  * Cross-engine float summation is order-dependent, and an iterative
  * algorithm COMPOUNDS ulp drift — by iteration 3 a double-valued rank
  * can land on either side of a rounding boundary (the q03 incident,
  * amplified). So the whole computation runs on an int64 mass grid:
  * total mass = `scale` units (1e12 by default), every step is integer
  * division (truncation toward zero ≡ floor for the all-positive
  * values here):
  *
  *   u        = scale DIV |S|               (S = teleport set: all
  *                                           nodes for PageRank, the
  *                                           seeds for TrustRank)
  *   r0(v)    = u·[v ∈ S]
  *   c(e)     = rank(src) DIV deg(src)      (per-edge contribution)
  *   rank'(v) = ((15·u) DIV 100)·[v ∈ S] + (85 · Σ c) DIV 100
  *
  * Integer sums are associative, so the result is BIT-IDENTICAL in any
  * engine and any partitioning — the DuckDB oracles restate the same
  * recurrence with `//`. The deliberate truncation leaks < 1 unit of
  * mass per division (≤ deg+2 units per node per round, ~1e-9 of total
  * mass for the graphs here) — a deterministic quantization of the
  * damping model, not an approximation of this recurrence.
  *
  * ==Scale shape (100 TB posture)==
  * The adjacency list (src, dst, deg) comes out of the e⋈deg join
  * already hash-partitioned by src and is persisted in that layout —
  * iterations re-read it without re-shuffling the edges (an explicit
  * repartition here would duplicate the join's own exchange; measured
  * as one of two redundant full-edge shuffles in this operator's first
  * cut, q52 sf1 10.7 s → see SCALING.md). Each round shuffles only
  * narrow (long, long) rank rows: ranks move to the adjacency's
  * partitioning, the groupBy(dst) runs with map-side partial sums
  * (per-edge contributions collapse to ≤|V| rows per map partition),
  * and the teleport-floor left join rides the same key. Per-round cost
  * is Θ(|E|) compute with edge bytes touched in place — the
  * Pregel/GraphX discipline. Rank frames are `localCheckpoint`ed per
  * round so lineage stays flat for large `iters`; driver traffic is
  * one scalar (the teleport-set count).
  *
  * Callers needing classic dangling-mass redistribution should
  * symmetrize or self-loop sink nodes first (q52/t50 symmetrize); here
  * a node with no out-edges simply radiates nothing, and every
  * teleport-set node keeps receiving its share.
  */
object PageRank {

  /** Ranks after `iters` exact-integer power iterations, teleporting
    * to every node (classic PageRank).
    *
    * @param edges directed (src, dst) long pairs.
    * @param dedupEdges set false when the input is distinct by
    *   construction (e.g. a symmetrized distinct pair list) — the
    *   dedup is a full |E| shuffle, the single biggest avoidable cost
    *   here.
    * @param symmetrize treat the input as CANONICAL undirected pairs
    *   (each pair present once, e.g. a < b) and add the reversed
    *   edges internally, persisting the directed list first so its
    *   (possibly expensive, e.g. mined) pipeline runs once. Passing a
    *   list that already contains both directions would double edges.
    * @return (node: long, rank: long) — rank in `scale` units of mass.
    */
  def ranks(edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
      dedupEdges: Boolean = true, symmetrize: Boolean = false): DataFrame =
    run(edges, None, iters, scale, dedupEdges, symmetrize)
      .select("node", "rank")

  /** TrustRank: teleport mass goes ONLY to `seeds`, so authority flows
    * outward from vetted nodes — anything unreachable from every seed
    * scores an exact 0 and stays in the frame (dropping it would hide
    * "this doc is outside every trusted component" from the caller).
    *
    * @param seeds single-column (node) frame; rows collapse distinct.
    * @return (node, rank, is_seed) for every node in the edge
    *         universe ∪ seeds.
    */
  def trustRanks(edges: DataFrame, seeds: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dedupEdges: Boolean = true,
      symmetrize: Boolean = false): DataFrame =
    run(edges, Some(seeds), iters, scale, dedupEdges, symmetrize)

  /** HITS hubs/authorities (Kleinberg, JACM 1999) on a DIRECTED edge
    * list — the bipartite-flavored companion to [[ranks]]: hub scores
    * live on sources, authority scores on destinations, and the two
    * reinforce mutually (`a ← Σ h(in-neighbors)`, `h ← Σ a(out-
    * neighbors)`, each side L1-normalized per round). In a curation
    * pipeline this is the buyer/supplier- or page/host-shaped quality
    * signal PageRank's single score conflates.
    *
    * Same exact-integer discipline as [[ranks]], with one twist: HITS
    * normalizes by the ROUND's total, and `raw · scale` overflows int64
    * once raw sums pass ~1e9·maxdeg — so the normalization runs through
    * `DECIMAL(38,0)` (Catalyst's exact 128-bit path, still codegen'd)
    * before `DIV` truncates back to the int64 grid:
    *
    *   h0(s)   = scale DIV |hubs|
    *   araw(d) = Σ_{(s,d)∈E} h(s);  a(d) = (araw·scale) DIV Σ araw
    *   hraw(s) = Σ_{(s,d)∈E} a(d);  h(s) = (hraw·scale) DIV Σ hraw
    *
    * Integer sums are order-independent, so the DuckDB oracle's
    * unrolled recurrence (HUGEINT `//`) matches bit-for-bit.
    *
    * Scale shape: the [[ranks]] discipline, doubled — HITS joins the
    * edge list on `src` in one half-round and on `dst` in the other,
    * so the adjacency persists in BOTH hash layouts, each built by one
    * shuffle up front. Every half-round then shuffles only narrow
    * (long, long) score rows (the |E|-sized join output partial-
    * aggregates map-side down to ≤|V| rows per partition before the
    * groupBy ships it), and the round's total rides a 1-row broadcast
    * cross join (never the driver). Score frames localCheckpoint per
    * round to keep lineage flat. The first cut persisted ONE edge
    * frame and let the join planner choose: at sf0.1 it broadcast the
    * score frame, but at the 10× replica the score frame crossed the
    * broadcast threshold and every half-round re-shuffled the FULL
    * edge list — 64× shuffle growth for 10× data (9.5 MB → 610 MB,
    * RepBench) until the pinned layouts capped it.
    *
    * @return (node, side, score): side = 'hub' | 'auth'; a node
    *         appearing on both sides gets a row per side.
    */
  def hits(edges: DataFrame, iters: Int, scale: Long = 1000000000L,
      dedupEdges: Boolean = true): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    // base list persisted FIRST so the caller's (possibly expensive)
    // edge pipeline runs once, not once per layout — the symmetrize
    // discipline in run()
    val eBase = (if (dedupEdges) e0.distinct() else e0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eS = eBase.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val eD = eBase.repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    // |hubs| is the only use of the hub SET before round 1 collapses
    // into a pure aggregation (below) — one countDistinct job instead
    // of a checkpointed distinct frame + a join (round 17, §1.2)
    val nHubs = eS.agg(countDistinct(col("src"))).head.getLong(0)
    require(nHubs > 0, "HITS: empty graph")

    def normalized(raw: DataFrame): DataFrame = {
      // raw: (node, raw). DECIMAL(38,0) widening before the multiply —
      // raw ≤ total ≤ scale·maxdeg can push raw·scale past int64
      val total = raw.agg(sum("raw").cast("decimal(38,0)").as("total"))
      raw.crossJoin(broadcast(total))
        .select(col("node"),
          expr(s"CAST(CAST(raw AS DECIMAL(38,0)) * $scale DIV total AS BIGINT)")
            .as("score"))
    }

    var h: DataFrame = null
    var a: DataFrame = null
    for (i <- 1 to iters) {
      // round 1: h0 is the constant scale/|hubs| over EVERY distinct
      // src, so Σ_{(s,d)∈E} h0(s) = u · indeg(d) — a pure aggregation
      // of the cached edge list, no score join and no h0 frame at all
      // (bit-identical: integer count × u = Σ of u over the same rows)
      val araw =
        if (i == 1)
          eS.groupBy(col("dst").as("node"))
            .agg((count(lit(1)) * lit(scale / nHubs)).as("raw"))
        else
          eS.join(h.select(col("node").as("src"), col("score")), "src")
            .groupBy(col("dst").as("node")).agg(sum("score").as("raw"))
      a = normalized(araw).localCheckpoint(true)
      val hraw = eD.join(a.select(col("node").as("dst"), col("score")), "dst")
        .groupBy(col("src").as("node")).agg(sum("score").as("raw"))
      h = normalized(hraw).localCheckpoint(true)
    }
    eBase.unpersist()
    eS.unpersist()
    eD.unpersist()
    h.select(col("node"), lit("hub").as("side"), col("score"))
      .union(a.select(col("node"), lit("auth").as("side"), col("score")))
  }

  private def run(edges: DataFrame, seeds: Option[DataFrame], iters: Int,
      scale: Long, dedupEdges: Boolean, symmetrize: Boolean): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val d = if (dedupEdges) e0.distinct() else e0
    // symmetrize INSIDE the operator so the directed list is persisted
    // before the union — a union's two branches each re-run their
    // input, and for a mined pair list (t50: the whole Jaccard
    // pipeline) that doubles the dominant cost. Same discipline as
    // connectedComponents: cache the directed pairs, not the union.
    val directed = if (symmetrize)
      Some(d.persist(StorageLevel.MEMORY_AND_DISK)) else None
    val e = directed match {
      case Some(dd) =>
        dd.union(dd.select(col("dst").as("src"), col("src").as("dst")))
      case None => d
    }
    // out-degree via a window over the SAME src-hash exchange that
    // the iteration joins need — one shuffle builds the whole
    // adjacency, and persisting it here means the (possibly expensive:
    // t50 feeds a mined near-dup pair list) edge pipeline runs ONCE.
    // The first cut computed deg with a groupBy + join back and read
    // unpersisted `e` three times (deg, adj, sink discovery) — at
    // sf0.1 that re-ran t50's Jaccard mining twice over, 92 MB of
    // shuffle for a 600-edge graph.
    val adj = e.withColumn("deg",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("src")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // node universe = out-nodes plus pure sinks, both |V|-sized scans
    // of the cached adjacency; the distincts partial-aggregate
    // map-side so they ship ~|V| rows, not |E|. A SYMMETRIZED graph
    // has no pure sinks BY CONSTRUCTION (every dst is also a src of
    // the reversed edge), so the dst-distinct + anti-join pass is
    // provably empty there — skip it outright instead of running two
    // |E|-scan aggregations to compute ∅ (round 16: 2 fewer jobs per
    // call for q52/t50, identical node set)
    val outNodes = adj.select(col("src").as("node")).distinct()
    val base =
      if (symmetrize) outNodes
      else outNodes.union(
        adj.select(col("dst").as("node")).distinct()
          .join(outNodes, Seq("node"), "left_anti"))
    val nodes = (seeds match {
      case Some(sd0) =>
        val sd = sd0.toDF("node").select(col("node").cast("long").as("node"))
          .distinct()
        base.union(sd).distinct()
          .join(sd.withColumn("is_seed", lit(1L)), Seq("node"), "left")
          .select(col("node"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      case None => base.select(col("node"), lit(1L).as("is_seed"))
    }).localCheckpoint(true)

    val nTeleport = nodes.filter(col("is_seed") === 1L).count()
    require(nTeleport > 0, "PageRank: empty teleport set")
    val u = scale / nTeleport
    val teleport = (15L * u) / 100L

    var ranks = nodes.select(col("node"),
      (col("is_seed") * lit(u)).as("rank"))
    for (i <- 1 to iters) {
      // round 1 of CLASSIC PageRank (every node a seed): rank is the
      // constant u on every src, so the contribution is the pure
      // column u DIV deg — skip the rank join outright (bit-identical;
      // TrustRank keeps the join, its round-1 ranks are 0 off-seed)
      val sums = (if (i == 1 && seeds.isEmpty)
        adj.select(col("dst").as("node"),
          expr(s"CAST($u AS BIGINT) DIV deg").as("c"))
      else adj
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"), expr("rank DIV deg").as("c")))
        .groupBy("node").agg(sum("c").as("m"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (col("is_seed") * lit(teleport) +
            expr("(85 * coalesce(m, 0L)) DIV 100")).as("rank"),
          col("is_seed"))
        .localCheckpoint(true)
    }
    adj.unpersist()
    directed.foreach(_.unpersist())
    ranks.select(col("node"), col("rank"), col("is_seed"))
  }
}
