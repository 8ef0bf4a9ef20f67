package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over candidate-pair graphs (the near-dup graph being
  * the one a training-data pipeline actually owns). [[Dedup.connectedComponents]]
  * answers "which docs are the same"; PageRank answers "which copy is the
  * most CENTRAL" — a principled canonical-pick signal when clusters merge
  * many sources (the hub that everything near-duplicates is usually the
  * original).
  */
object Graph {

  private def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** One round's per-neighbor contribution stream: `sym(n,m)` joined with
    * the node-sized `prIn(n,__c)`. Extracted so the PipelineSpec pageRank
    * suite can pin both join strategies' physical shapes
    * (BroadcastHashJoin vs ShuffledHashJoin) without running a whole
    * iteration. */
  private[graft] def contribution(sym: DataFrame, prIn: DataFrame,
                                useBroadcast: Boolean): DataFrame =
    (if (useBroadcast) sym.join(broadcast(prIn), "n")
     else sym.join(prIn.hint("shuffle_hash"), "n"))
      .select(col("m").as("node"), col("__c"))

  /** PageRank over an UNDIRECTED edge list, fixed iteration count —
    * engineered for exact cross-engine reproducibility, which no floating
    * PageRank normally has:
    *  - every per-node quantity (init, out-contribution, new rank) is
    *    rounded through the portable floor(x·1e6 + 0.5)/1e6 IEEE form at
    *    the SAME points in both engines;
    *  - the neighbor-contribution sum runs through DECIMAL(27,7), so the
    *    distributed reduction is order-independent (the bucketCentroids
    *    trick) — two runs, two partitionings, or two ENGINES cannot
    *    disagree in any bit the 6-dp rounding keeps.
    * The result is a deterministic fixed-point iteration the SQL oracle
    * replays with a recursive CTE.
    *
    * Scale shape (the [[Dedup.connectedComponents]] discipline): the
    * symmetrized edge list is cached pre-partitioned on the contribution
    * key and crosses the network ONCE; each round shuffles only the
    * edge list and the node-sized rank relation, and `localCheckpoint`
    * truncates lineage per round (superseded round blocks released after
    * the next round materializes). Isolated nodes don't exist in an edge
    * list; every node has degree ≥ 1, so no dangling-mass correction is
    * needed.
    *
    * `iters` guidance: each round is one edge-join job, so cost is
    * iters × |edges|. For the canonical-pick use the ranking ORDER is
    * what matters, and on near-dup graphs — tight, dense clusters — the
    * within-cluster order stabilizes within about the cluster diameter
    * (the d73 convergence argument); 5 rounds ranks them, 10+ is for
    * rank VALUES on long-diameter graphs. Returns (node, pr).
    *
    * `broadcastMaxNodes` gates the per-round join strategy. At or below
    * it, the node-sized rank relation is BROADCAST each round and the
    * edge cache (partitioned on the contribution key `m`) never moves —
    * the fast path for graphs whose node set fits comfortably on the
    * driver and every executor (4M × ~16 B/row ≈ 64 MB serialized, but
    * re-sent to every executor every round — the real cost at cluster
    * scale is rounds × executors × size). ABOVE it — a 100 TB corpus's
    * near-dup graph can reach 10^8-10^9 nodes, where a per-round
    * node-sized broadcast is a driver OOM — the edge cache is instead
    * partitioned on the JOIN key `n` and each round shuffle-hash-joins
    * the rank relation against it: only the node-sized rank rows and the
    * node-sized partial contribution sums cross the network per round;
    * the edge list never re-shuffles after the one-time build. Both
    * paths are bit-identical (the DECIMAL(27,7) contribution sums are
    * order-independent, so partitioning cannot leak into any kept bit —
    * pinned by PipelineSpec's pageRank join-strategy tests). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, damping: Double = 0.85,
               teleport: Double = 0.15,
               broadcastMaxNodes: Long = 4000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // teleport is an EXPLICIT constant, never computed as 1 − damping:
    // 1.0 - 0.85 = 0.15000000000000002 in IEEE double, a different number
    // than the literal 0.15 the SQL oracle would write — the kind of
    // last-ulp divergence the whole design exists to exclude
    // In broadcast mode the cache is partitioned on the CONTRIBUTION-SUM
    // key `m`, not the join key `n`: the broadcast join imposes no
    // distribution on the edge list, but the per-round groupBy(m) does.
    // Partitioning the cache on m lets every round's HashAggregate reuse
    // the cached distribution (alias-aware output partitioning carries
    // m→node through the project), so after the one-time build NO round
    // shuffles the edge list at all. The mode decision needs the node
    // count, so the m-partitioned cache is built first either way (the
    // caller's edge pipeline must run exactly ONCE); the shuffle-mode
    // re-layout below reads from this cache, not from the pipeline.
    val symM0 = edges.select(col(srcCol).as("n"), col(dstCol).as("m"))
      .union(edges.select(col(dstCol).as("n"), col(srcCol).as("m")))
      .repartition(col("m")).cache()
    // Degrees are node-sized and read every round — cache them too, or
    // each round re-runs the edge-sized degree aggregation.
    val nodes0 = symM0.groupBy(col("n")).agg(count(lit(1)).as("deg"))
      .select(col("n").as("node"), col("deg")).cache()
    val nN = nodes0.count() // node-sized aggregate, one driver scalar; materializes the cache
    // ITERATIVE-CACHE PARTITION CAP (round 19, r18 verdict #3): a cached
    // repartition keeps the un-coalesced 8× initialPartitionNum width (AQE
    // cannot re-layout cached plans), so every one of the loop's per-round
    // jobs scheduled a ~256-task wave over KB-sized blocks at sf0.1 —
    // scheduling overhead in a healthy window, the storm amplifier in a
    // contended one. Both caches are re-laid to
    // min(defaultParallelism, ceil(rows/32k)) partitions when that removes
    // most of the waves; the counts are cached scans (cheap), the
    // re-layout is one edge-relation shuffle paid once at build. At
    // cluster scale f(rows) saturates the parallelism cap and full width
    // is kept — this is a small-relation fix, not a local[32] tuning.
    val par = edges.sparkSession.sparkContext.defaultParallelism
    // fires only when the rows-derived target BINDS (p < parallelism, i.e.
    // the relation is small for the session) AND the cache is ≥ 2× wider
    // than it — a big graph keeps its natural width untouched, so this can
    // never pessimize the at-scale layout
    def relayout(df: DataFrame, p: Int, key: Column): DataFrame =
      if (p >= par || df.rdd.getNumPartitions <= 2 * p) df
      else {
        val compact = df.repartition(p, key).cache()
        compact.count()
        df.unpersist(blocking = false)
        compact
      }
    val nE = symM0.count() // cached scan — cheap, and the count the cap needs
    // ONE edge-derived width for BOTH caches (r19 review): the per-round
    // `sums` aggregate inherits the edge cache's hashpartitioning(node)
    // width, and a nodes cache at a DIFFERENT width would force
    // EnsureRequirements to re-shuffle one side of the nodes⋈sums join
    // every round — a per-round exchange the old uniform-width shape never
    // paid. nodes is node-sized, so pEdge partitions of it are cheap.
    val pEdge = graft.core.Par.iterCachePartitions(nE, par)
    val useBroadcast = nN <= broadcastMaxNodes
    // in shuffle mode the m-layout is never read by any round (the rounds
    // join on the n-layout built below) — relaying it first would shuffle
    // and cache the whole edge relation just to discard it (r19 review),
    // so the m-relayout is broadcast-mode-only
    val symM = if (useBroadcast) relayout(symM0, pEdge, col("m")) else symM0
    val nodes = relayout(nodes0, pEdge, col("node"))
    val sym = if (useBroadcast) symM else {
      // one extra edge shuffle at BUILD time (m-layout → n-layout), paid
      // once so that no round pays it: the per-round join is then
      // co-located on the cached n-partitioning (capped width only when
      // the rows-derived target binds; natural width at scale)
      val s = (if (pEdge < par) symM.repartition(pEdge, col("n"))
               else symM.repartition(col("n"))).cache()
      s.count()
      symM.unpersist(blocking = false)
      s
    }
    // Shared eager-truncate discipline (see Checkpointing's scaladoc,
    // pinned by CheckpointingSpec): pageRank was the WIDER deadlock window
    // pre-fix — every round runs an explicit broadcast(prIn) exchange, and
    // all rounds' lazy checkpoints used to materialize in one cascaded
    // post-loop action right into those exchange threads.
    val truncator = new Checkpointing.Truncator(reliable = false)
    def truncate(df: DataFrame): DataFrame = truncator.truncate(df)
    var pr = truncate(nodes.select(col("node"), col("deg"),
      r6(lit(1.0) / lit(nN.toDouble)).as("pr")))
    for (_ <- 1 to iters) {
      // Fast path — explicit broadcast: the truncated rank relation is a
      // LogicalRDD with no stats, so the planner would otherwise
      // shuffle-join against the (much larger) edge cache every round.
      // The rank side is NODE-sized — the same candidate-sized-broadcast
      // contract dedupByClusters runs on — and broadcasting it keeps the
      // edge list where its cache already lives. (At sf0.1 the d128 cost
      // is dominated by building the 271k-pair graph plus ~1 s/round of
      // join+agg — the iterative floor of the CC family.)
      // Scale path — shuffle_hash hint: build the per-partition hash map
      // from the node-sized rank side, never sort (SMJ would re-sort the
      // edge cache every round); the edge side stays where the
      // n-partitioned cache put it.
      val prIn = pr.select(col("node").as("n"), r6(col("pr") / col("deg")).as("__c"))
      val contrib = contribution(sym, prIn, useBroadcast)
      val sums = contrib.groupBy(col("node"))
        .agg(sum(col("__c").cast("decimal(27,7)")).as("__s"))
      pr = truncate(nodes.join(sums, Seq("node"), "left")
        .select(col("node"), col("deg"),
          r6(lit(teleport) / lit(nN.toDouble) +
            lit(damping) * coalesce(col("__s").cast("double"), lit(0.0))).as("pr")))
    }
    // Every round already materialized and released its predecessor inside
    // truncate (the eager discipline above) — no post-loop cascade. The
    // per-round-action pacing was also the faster, lower-variance shape
    // when both were measured at sf0.1 on the 271k-edge near-dup graph
    // (per-round 13.5 s vs cascade 12.8-26.8 s); the cost is the ten
    // edge-join rounds themselves, see the iters guidance above.
    sym.unpersist()
    nodes.unpersist()
    pr.select(col("node"), col("pr"))
  }

  /** Per-node TRIANGLE COUNTS + local clustering coefficient over an
    * undirected edge list — the community-structure diagnostic on a
    * near-dup or mutual-kNN graph: a node whose neighbors all know each
    * other (coefficient → 1) sits in a tight duplicate/template clique; a
    * hub with coefficient → 0 chains unrelated regions (the thing the
    * mutual-kNN gate exists to prevent — this measures that it worked).
    *
    * Triangles via the canonical-orientation join: edges deduped to
    * a < b, then (x,y)⋈(y,z)⋈(x,z) — each triangle counted exactly once.
    * Work is Σ_v deg(v)², so the join is safe where degree is BOUNDED —
    * exactly the graphs this pipeline owns ([[Similarity.mutualKnnEdges]]
    * caps degree at k by construction; near-dup graphs are df-capped). On
    * an unbounded-degree graph, orient by (degree, id) before the wedge
    * join (bounds work by arboricity) — deliberately not done here: the
    * extra degree join costs on every call and no producer in this
    * library emits an unbounded-degree graph.
    *
    * coefficient = 2·T / (deg·(deg−1)) through the portable 6 dp floor;
    * deg < 2 → 0.0 (division-free). Output: (id, degree, triangles,
    * clustering) — one row per node WITH at least one edge. */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val e1 = e.toDF("x", "y")
    val e2 = e.toDF("y2", "z")
    val e3 = e.toDF("x3", "z3")
    val tris = e1.join(e2, col("y") === col("y2"))
      .join(e3, col("x") === col("x3") && col("z") === col("z3"))
      .select(col("x"), col("y"), col("z"))
    val triPerNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("__t"))
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    deg.join(triPerNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("__t"), lit(0L)).as("triangles"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(r6(lit(2.0) * coalesce(col("__t"), lit(0L)) /
            (col("degree") * (col("degree") - 1))))
          .as("clustering"))
  }

  /** LABEL PROPAGATION over a similarity graph — pseudo-labeling: seed
    * labels spread to unlabeled nodes by similarity-weighted neighbor
    * vote, `rounds` fixed iterations (the semi-supervised workhorse for
    * labeling the 99% of a crawl no classifier has seen, off a small
    * trusted seed set).
    *
    * `graph` is a directed edge list (node_id, neighbor_id, cosine) — the
    * [[Similarity.knnGraph]] shape: a node's vote pool is its OWN top-k
    * list. Votes are weighted by the edge's 4dp cosine carried in
    * DECIMAL(14,4) — exact sums in any reduction order, so the winner
    * (max weight, ties to the smallest label) is engine-portable with NO
    * float accumulation to disagree on. Seeds are CLAMPED (a seed never
    * re-labels); an unlabeled node with zero labeled reachables in
    * `rounds` hops stays unlabeled (absent from the output — the caller's
    * left join reads that as NULL, the honest answer).
    *
    * Scale shape per round: one edge×labels join (labels is node-sized,
    * ids+label only — AQE broadcasts while it fits, shuffles beyond), one
    * (node,label)-keyed aggregate bounded by nodes × |labels|, one
    * per-node WindowGroupLimit rank; the label map is staged per round
    * (the CC plan-growth discipline, bounded by `rounds` ≤ 5). */
  def labelPropagate(graph: DataFrame, seeds: DataFrame, idCol: String,
                     labelCol: String, rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && rounds <= 5,
      s"labelPropagate: rounds=$rounds out of [1,5] — each round is an " +
        "edge join; label quality saturates fast and plans grow per round")
    import org.apache.spark.sql.expressions.Window
    // the edge list is consumed by EVERY round's vote join — staged once,
    // or a heavy producer lineage (knnGraph: bucket join + cosine + rank)
    // would re-run per round (r17 review; the t169 staging rule)
    val g = graft.ops.Checkpointing.stage(
      graph.select(col("node_id"), col("neighbor_id"),
        col("cosine").cast("decimal(14,4)").as("__w")))
    val seedMap = seeds.select(col(idCol).as("__id"), col(labelCol).as("__lab"))
    var lab = seedMap
    for (_ <- 1 to rounds) {
      val votes = g
        .join(lab.withColumnRenamed("__id", "neighbor_id"), Seq("neighbor_id"))
        .groupBy(col("node_id"), col("__lab"))
        .agg(sum(col("__w")).as("__v"))
      val w = Window.partitionBy(col("node_id"))
        .orderBy(col("__v").desc, col("__lab").asc)
      val winners = votes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("node_id").as("__id"), col("__lab"))
      lab = graft.ops.Checkpointing.stage(seedMap.unionByName(
        winners.join(seedMap.select(col("__id")), Seq("__id"), "left_anti")))
    }
    lab.select(col("__id").as(idCol), col("__lab").as("pred_label"))
  }
}
