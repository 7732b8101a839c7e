package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Whole-graph algorithms over relationally-derived edge sets — the
  * analytics companion to [[graft.graph.GraphStore]] (which holds the
  * persisted property graph; reference builds the graph with per-batch
  * Cypher merges and leaves ranking/centrality to the warehouse).
  * Pattern shared with `dedup_clusters`' label propagation: iterative
  * DataFrame compute, `localCheckpoint` per round to truncate lineage.
  */
object GraphOps {

  /** Hub-degree guard for the bipartite-projection operators
    * ([[graphCooccur]], [[graphLinkpred]]): per-customer posting cap,
    * read from `spark.graft.graph.maxDegree` (default unlimited — the
    * oracle replays the exact expansion). Pair volume through a
    * projection is Σ_c C(d_c, 2): one 10⁶-degree hub key would emit
    * 5·10¹¹ pairs from a single posting, so at 100 TB set a finite cap
    * and each customer contributes only its `cap` SMALLEST supplier
    * ids (deterministic, same smallest-k contract as
    * [[graft.ops.DedupOps.cappedBucketPairs]]). RECALL TRADE: capped,
    * co-occurrence counts become lower bounds — pairs mediated only by
    * suppliers outside a hub's smallest-k window are missed; degrees
    * (jaccard/AA denominators) stay exact, so surviving scores are
    * conservative, never inflated. */
  private[ops] def maxDegree(s: SparkSession): Int =
    s.conf.getOption("spark.graft.graph.maxDegree").map(_.toInt)
      .getOrElse(Int.MaxValue)

  /** Per-customer sorted supplier postings, hub-capped. The cap is
    * applied BEFORE the collect (`row_number ≤ cap` right above its
    * window → Spark's WindowGroupLimit pushdown bounds each key inside
    * the sort, and the follow-up groupBy reuses the same hash
    * partitioning on `c` — no second exchange), so a hub's full
    * posting row is never materialized; uncapped, the plan is the
    * plain single-shuffle hash agg. */
  private[ops] def custPostings(s: SparkSession, cs: DataFrame): DataFrame = {
    val cap = maxDegree(s)
    val base =
      if (cap == Int.MaxValue) cs
      else cs.withColumn("rn",
          row_number().over(Window.partitionBy("c").orderBy("sk")))
        .filter(col("rn") <= cap).drop("rn")
    base.groupBy("c")
      .agg(sort_array(collect_list(col("sk"))).as("ss"))
  }

  /** The distinct customer↔supplier bipartite projection (o_custkey,
    * l_suppkey from orders ⋈ lineitem) — the shared substrate of
    * [[edgeIndex]], [[graphCooccur]] and [[graphLinkpred]]. Built once
    * per (session, dataset) and persisted, like the shingle/IVF index
    * artifacts: without the memo each graph query would re-pay the
    * fact-table join + distinct. */
  /** Shuffle width for a persisted/checkpointed iterative-loop
    * artifact, sized to the DATA instead of the session width: ~250k
    * rows per partition, floor 4, cap 2048. A session-wide 32 makes
    * every loop round's map side pay 32 task launches over a few
    * thousand rows (measured 23% of graph_cc's loop); at cluster
    * scale the width grows with the subgraph exactly like AQE sizes
    * its post-shuffle stages. Division runs in Long BEFORE narrowing
    * so an astronomically large count cannot wrap negative.
    *
    * r13 optimization (guide §2.6 idle capacity): the pure 250k-row
    * target left the MIDDLE of the size range under-parallel — a
    * 500k-row edge table got 4 partitions, so every per-round join
    * map stage ran 4-wide on a 32-core host (measured: pagerank's
    * five 430-725 ms round stages, katz/betweenness/diameter the
    * same shape). A CORE floor now applies once there is enough work
    * to feed the cores (≥ 8k rows per task — below that the round-10
    * task-launch overhead lesson still holds and the floor stays 4).
    * At cluster scale the 250k target dominates exactly as before. */
  private[graft] def dataParts(rows: Long, cores: Int): Int = {
    val coreFloor = math.min(cores.toLong, rows / 8192L)
    math.max(4L, math.max(coreFloor, math.min(2048L, rows / 250000L)))
      .toInt
  }

  private val csCache = new graft.SessionCache[DataFrame](df => {
    df.unpersist(); ()
  })

  private def csIndex(s: SparkSession, d: String): DataFrame =
    csCache.getOrCompute(s, d) {
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
        .persist()
    }

  /** The symmetrized edge+degree tables and node count are an INDEX
    * over the dataset — built once per (session, dataset), persisted,
    * reused by every ranking run (the same amortization the ANN/dedup
    * artifacts use). The NODE-sized deg table is kept alongside the
    * EDGE-sized join: node-level consumers (initial ranks, the node
    * count, the degree histogram) read deg and never pay an E-row
    * distinct on a dense graph. */
  private val edgeIndexCache =
    new graft.SessionCache[(DataFrame, DataFrame, Long)](v => {
      v._1.unpersist(); v._2.unpersist(); ()
    })

  private def edgeIndex(s: SparkSession, d: String)
      : (DataFrame, DataFrame, Long) =
    edgeIndexCache.getOrCompute(s, d) {
      // derive from the memoized bipartite projection — the fact join
      // + distinct is paid once per (session, dataset) across the
      // whole graph suite
      val pairs = csIndex(s, d)
        .select(concat(lit("c"), col("c")).as("src"),
          concat(lit("s"), col("sk")).as("dst"))
      // symmetrize: prefixes keep the two directions disjoint, so this
      // union introduces no duplicate edges
      val edges = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .persist()
      // pre-partitioned by src: every iterative consumer (pagerank,
      // LPA, BFS) joins this table on src each round. At cluster
      // scale the node table won't broadcast and the persisted hash
      // partitioning is what keeps the per-round join from
      // re-shuffling the edge table every iteration. Width is sized
      // to the DATA (the graph_cc round-10 lesson: a session-wide 32
      // makes every round's map side pay 32 task launches for a few
      // thousand rows — measured 23% of an iterative loop).
      // width stays PURELY size-based (cores=1 disables the r13 core
      // floor here): widening this index 4→32 at sf0.1 was A/B'd and
      // REGRESSED every consumer (pagerank +0.3 s, katz +1.25 s,
      // diameter +1.3 s, betweenness +0.8 s in the wave-1 bench) —
      // per-round stage walls did not shrink with 8× more tasks, so
      // the rounds are stage-latency-bound, not compute-bound, and
      // the extra 170 task launches per query were pure cost.
      val edgesDeg = edges.join(deg, "src")
        .repartition(dataParts(csIndex(s, d).count() * 2L, 1), col("src"))
        .persist()
      // bounded driver scalar (node count), like the bucket-id collects
      val n = deg.count()
      (edgesDeg, deg, n)
    }

  /** PageRank over the customer↔supplier trading graph (who-trades-
    * with-whom influence): damping 0.85, 5 fixed iterations.
    *
    * Edge derivation is itself relational: distinct (customer,
    * supplier) pairs from orders ⋈ lineitem, then symmetrized (both
    * directions), so every node has out-degree ≥ 1 and no dangling
    * mass exists — rank = (1−d)/N + d·Σ in-contribs needs no
    * global dangling-sum term (which would be a per-iteration
    * driver-side action at scale).
    *
    * 100 TB posture: the edge+degree table is built once per
    * (session, dataset), persisted, and reused across iterations AND
    * calls (the per-iteration work is one shuffle join edges⋈ranks on
    * src + one hash agg on dst — the minimal PageRank round under hash
    * partitioning); lineage is cut per round with `localCheckpoint`,
    * which measured FASTER than one lazy 5-round chain because each
    * checkpoint gives AQE an exact-size ranks table (broadcast-join
    * decision per round, no whole-chain re-planning). At cluster scale
    * swap localCheckpoint for a reliable `checkpoint` dir and
    * pre-`repartition` the edge table by src so the join side stays
    * co-partitioned across rounds.
    *
    * Cross-engine FP: the per-node in-contribution sum is a SORTED
    * fold (sort_array → aggregate), mirrored by list_sort →
    * list_reduce in the oracle, so both engines add the same doubles
    * in the same order — bit-identical ranks without rounding. In
    * production use a plain `sum` (order-free, map-side combinable);
    * the sorted fold is oracle-pinning only.
    */
  def graphPagerank(s: SparkSession, d: String): DataFrame = {
    val damping = 0.85
    val iters = 5
    val (edgesDeg, deg, nNodes) = edgeIndex(s, d)
    // literal 0.15, NOT 1.0 - 0.85: the Scala subtraction yields
    // 0.15000000000000002 while the oracle parses "0.15" — last-ulp skew
    val base = 0.15 / nNodes

    var ranks = deg.select(col("src").as("node"))
      .withColumn("rank", lit(1.0 / nNodes))
    for (i <- 1 to iters) {
      val next = edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
        .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("dst"))
        .agg(expr(
          "aggregate(sort_array(collect_list(c)), cast(0.0 as double)," +
            " (a, x) -> a + x)").as("insum"))
        .select(col("dst").as("node"),
          (lit(base) + lit(damping) * col("insum")).as("rank"))
      // per-round materialization measured FASTER than one lazy
      // 5-round chain (3.4 s vs 6-17 s at sf0.1): the checkpoint
      // hands AQE an exact-size 16k-row ranks table each round (→
      // broadcast join, no re-planning of the whole chain) and
      // bounds the re-optimization scope to one round. r14 (item 7):
      // checkpoint every OTHER round — a depth-2 segment still starts
      // from a materialized table (AQE keeps real size stats at the
      // segment base), fuses two rounds into one materializing job,
      // and the full-lazy pathology above never applies.
      ranks = if (i % 2 == 1 && i < iters) next else next.localCheckpoint()
    }
    ranks.orderBy(col("node"))
  }

  /** T213: PERSONALIZED PageRank from a 3-customer seed panel —
    * "what's relevant to THESE nodes" (the recommendation / related-
    * entity expansion), not global importance. The teleport mass
    * (0.15/|S| per round) returns only to the seeds, so the rank
    * vector stays SPARSE: round k touches only the k-hop ball, and
    * the per-round state a cluster carries is frontier-sized, never
    * node-table-sized (the decisive scale difference from global
    * PageRank). Three rounds = contribution join on the memoized
    * edge index + full-outer with the broadcast 3-row seed base;
    * in-sums use the [[graphPagerank]] sorted-fold so both engines
    * add identical doubles in identical order, and the top-20 cut
    * happens on bit-identical ranks. */
  def graphPpr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (edgesDeg, _, _) = edgeIndex(s, d)
    // Scala-double literals, NOT expr("1.0 / 3.0"): Spark parses that
    // as DECIMAL(2,1) division (= 0.333333, a 1e-6 truncation that
    // leaks 8.5e-7 of rank mass per round); the oracle's 1.0/3.0 is
    // IEEE double division, matched here by the JVM's
    val seedBase = Seq("c1", "c2", "c3").toDF("node")
      .withColumn("base", lit(0.15 / 3.0))
    var ranks = seedBase.select(col("node"),
      lit(1.0 / 3.0).as("rank"))
    for (_ <- 1 to 3) {
      val contrib = edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
        .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("dst"))
        .agg(expr(
          "aggregate(sort_array(collect_list(c)), cast(0.0 as double)," +
            " (a, x) -> a + x)").as("insum"))
        .select(col("dst").as("node"),
          (lit(0.85) * col("insum")).as("cc"))
      ranks = contrib
        .join(broadcast(seedBase), Seq("node"), "full_outer")
        .select(col("node"),
          (coalesce(col("cc"), lit(0.0)) +
            coalesce(col("base"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    // TakeOrderedAndProject (no global sort shuffle), THEN the rank
    // window over the 20 surviving rows
    val top = ranks.orderBy(col("rank").desc, col("node").asc).limit(20)
    val w = Window.orderBy(col("rank").desc, col("node").asc)
    top.withColumn("rk", row_number().over(w))
      .select(col("rk").cast("int").as("rk"), col("node"), col("rank"))
      .orderBy("rk")
  }

  /** Degree distribution of the trading graph: how many nodes have
    * each degree, split by node kind (customer/supplier) — the
    * first-look structural profile of any graph (and the skew
    * diagnostic: a heavy tail here predicts hot keys in every
    * edge-keyed shuffle). Reuses the memoized edge+degree index, so
    * the marginal cost is one hash agg over the NODE-sized degree
    * table. */
  def graphDegree(s: SparkSession, d: String): DataFrame = {
    val (_, deg, _) = edgeIndex(s, d)
    deg.groupBy(substring(col("src"), 1, 1).as("kind"), col("outdeg"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("kind"), col("outdeg"))
  }

  /** K-hop BFS shortest-path lengths from a seed node over the trading
    * graph — the multi-hop reachability query a property graph exists
    * to serve (the reference loads its graph into Neo4j exactly so
    * analysts can walk donor→committee→candidate chains; e.g.
    * federal_fec_compute_load_graph_expenditures/cypher.py builds the
    * edges, traversal happens in the warehouse). Restated as iterative
    * relational BFS: frontier ⋈ edges per hop, anti-join against the
    * visited set, `localCheckpoint` to truncate lineage per round —
    * the same fixed-round iteration pattern as [[graphPagerank]] and
    * `dedup_clusters`.
    *
    * 100 TB posture: each hop is one shuffle join (edges hash-
    * partitioned by src, reused from the memoized index) plus one
    * anti-join against the visited set — the standard distributed BFS;
    * no per-row recursion, no driver-side frontier. The visited set
    * grows monotonically and stays (node, dist)-narrow. Hop count is
    * fixed (3), so the plan is a bounded chain, not an unbounded loop.
    *
    * Distances are exact integers (no FP pinning needed); the oracle
    * replays the walk with a DuckDB `WITH RECURSIVE` CTE and takes
    * MIN(dist) — identical to first-touch BFS levels. The seed row is
    * emitted unconditionally (matching the recursive anchor) so both
    * engines agree even if the seed traded nothing. */
  /** Shared bounded-BFS engine behind [[graphPaths]],
    * [[graphCloseness]] and [[graphDiameter]] (round-6 ask: ONE
    * engine, fewer fatter jobs). State is the multi-seed (seed, node,
    * dist) visited set; each hop is one frontier⋈edges shuffle join
    * (edges pre-partitioned by src in the memoized index) + one
    * anti-join against the visited set. The per-hop lineage cut AND
    * the emptiness probe are ONE action: the frontier is lazily
    * `localCheckpoint(false)`-marked and `count()` both materializes
    * the checkpoint and returns the early-exit signal — the old
    * eager-checkpoint-then-isEmpty pair cost two jobs per hop. The
    * visited set is a union of ≤ hops checkpointed frontiers (shallow
    * lineage), so it needs no checkpoint of its own. */
  private def bfs(edges: DataFrame, seeds: DataFrame, hops: Int)
      : DataFrame = {
    var reached = seeds
    var frontier = seeds
    var k = 1
    var growing = true
    while (k <= hops && growing) {
      val next = edges
        .join(frontier.select(col("seed"), col("node")),
          edges("src") === col("node"))
        .select(col("seed"), col("dst").as("node")).distinct()
        .join(reached.select(col("seed").as("s2"),
            col("node").as("seen")),
          col("seed") === col("s2") && col("node") === col("seen"),
          "left_anti")
        .select(col("seed"), col("node"), lit(k).as("dist"))
        .localCheckpoint(false)
      growing = next.count() > 0 // materializes + probes in one job
      if (growing) { frontier = next; reached = reached.union(next) }
      k += 1
    }
    reached
  }

  /** The 6-hop multi-seed BFS ball over the fixed panel seeds c1–c5 —
    * ONE walk shared by [[graphPaths]] (seed c1, dist ≤ 3),
    * [[graphCloseness]] (all seeds, dist ≤ 3) and [[graphDiameter]]'s
    * first sweep (seed c1, full radius). BFS level sets are
    * hop-budget-independent (dist ≤ k rows of a 6-hop walk ≡ the k-hop
    * walk), so the three consumers read the same artifact instead of
    * re-walking: round-9 fuse — previously paths + closeness +
    * diameter-sweep-1 each paid their own per-hop job chain over the
    * same edge index. Memoized per (session, dataset) and persisted
    * like the edge index itself; the union of ≤ 6 checkpointed
    * frontiers is shallow-lineage, so persist (not checkpoint) is
    * enough to stop consumers re-running the hop chain. */
  private val ballCache = new graft.SessionCache[DataFrame](df => {
    df.unpersist(); ()
  })

  private def seedBall(s: SparkSession, d: String): DataFrame =
    ballCache.getOrCompute(s, d) {
      import s.implicits._
      val (edgesDeg, _, _) = edgeIndex(s, d)
      val edges = edgesDeg.select(col("src"), col("dst"))
      val seeds = Seq("c1", "c2", "c3", "c4", "c5").toDF("seed")
        .select(col("seed"), col("seed").as("node"), lit(0).as("dist"))
      bfs(edges, seeds, hops = 6).persist()
    }

  def graphPaths(s: SparkSession, d: String): DataFrame =
    seedBall(s, d).filter(col("seed") === "c1" && col("dist") <= 3)
      .select(col("node"), col("dist"))
      .orderBy(col("node"))

  /** Bounded closeness centrality for a seed panel: multi-source BFS
    * (5 customer seeds in ONE keyed frontier — (seed, node) state, not
    * one walk per seed) to 3 hops, closeness = (reached−1)/Σdist over
    * the ball. The hop bound is what makes closeness computable at
    * scale (exact closeness needs all-pairs distances); with a
    * symmetric bipartite graph diameter is small anyway, so even the
    * 3-ball is near-global (round-6 trim: the 4th round bought almost
    * no new nodes, only bench-noise cross-section) — the panel states
    * exactly what it measured.
    *
    * 100 TB posture: reads the shared [[seedBall]] artifact (one
    * [[bfs]] walk for paths/closeness/diameter — all seeds riding one
    * keyed frontier, one lazy-checkpoint+count action per hop); state
    * is (seed, node) pairs, bounded by seeds × nodes. Distances and
    * counts are exact integers; closeness is one final division. */
  def graphCloseness(s: SparkSession, d: String): DataFrame = {
    seedBall(s, d).filter(col("dist") <= 3).groupBy("seed")
      .agg((count(lit(1)) - 1).as("n_reached"),
        sum("dist").as("sum_dist"))
      .select(col("seed"), col("n_reached"), col("sum_dist"),
        // an isolated seed reaches nothing: closeness NULL, not 0/0
        expr("round(case when sum_dist = 0 then null" +
          " else cast(n_reached as double)" +
          " / cast(sum_dist as double) end, 6)").as("closeness"))
      .orderBy("seed")
  }

  /** Diameter lower bound by the classic double BFS sweep: walk 6 hops
    * from a fixed seed, restart from the farthest node found
    * (deterministic argmax tie-break), and report the second sweep's
    * eccentricity — on real graphs this is usually the exact diameter,
    * always a certified lower bound (the panel says which). Sweep 1
    * reads the shared [[seedBall]] artifact (round-9 fuse; the c1 walk
    * is paid once across paths/closeness/diameter), so only the
    * restart sweep runs a fresh [[bfs]] — one lazy-checkpoint+count
    * action per hop; the only driver-side values are the restart node
    * and the final panel (bounded scalars). */
  def graphDiameter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (edgesDeg, _, _) = edgeIndex(s, d)
    val edges = edgesDeg.select(col("src"), col("dst"))

    // sweep 1 rides the shared panel ball (round-9 fuse): the c1 walk
    // is already materialized for paths/closeness, so diameter pays
    // only the restart sweep
    val first = seedBall(s, d).filter(col("seed") === "c1")
      .select(col("node"), col("dist"))
    val far = first.orderBy(col("dist").desc, col("node").asc)
      .limit(1).collect().head.getString(0) // bounded driver scalar
    val second =
      bfs(edges, Seq((far, far, 0)).toDF("seed", "node", "dist"),
        hops = 6).select(col("node"), col("dist"))
    second.agg(max("dist").as("diameter_lb"),
        count(lit(1)).as("n_reached"))
      .select(lit("c1").as("seed1"), lit(far).as("seed2"),
        col("diameter_lb"), col("n_reached"))
  }

  /** T165: bounded-source BETWEENNESS centrality (Brandes 2001, "A
    * faster algorithm for betweenness centrality") — who sits on the
    * shortest paths between others, the broker-detection metric the
    * closeness/degree panel can't express. Exact all-pairs betweenness
    * is O(V·E); the scalable restatement is Brandes from a bounded
    * SOURCE PANEL (3 fixed customer seeds) over the bounded 3-hop ball
    * — the standard sampled-sources approximation, with the sample
    * and radius stated in the contract.
    *
    * Forward phase: level-synchronous multi-seed BFS where each level
    * carries σ(v) = number of shortest paths from the seed — an exact
    * INTEGER sum over the previous level's parents (one shuffle join +
    * one hash agg per level, the [[bfs]] shape plus an aggregate).
    * Backward phase: dependency accumulation δ(v) = Σ_w σ(v)/σ(w) ·
    * (1+δ(w)) over the successor level, with each term quantized to
    * 1e-12-scaled longs (the pagerank idiom) so the per-node sums are
    * order-free and bit-identical cross-engine; δ stays a scaled
    * BIGINT end to end and only the final report divides.
    *
    * 100 TB posture: 3 forward + 3 backward rounds, each one
    * edges-keyed shuffle join + one hash agg, lineage cut per round;
    * state is (seed, node) pairs bounded by |panel|·|ball|. No driver
    * action anywhere (fixed round count, no convergence probe). */
  def graphBetweenness(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (edgesDeg, _, _) = edgeIndex(s, d)
    val edges = edgesDeg.select(col("src"), col("dst"))
    val termExpr =
      "cast(floor(cast(sv as double) / cast(sw as double)" +
        " * (1.0 + cast(dw as double) / 1000000000000.0)" +
        " * 1000000000000.0 + 0.5) as bigint)"

    val l0 = Seq("c1", "c2", "c3").toDF("seed")
      .select(col("seed"), col("seed").as("node"), lit(1L).as("sigma"))
      .localCheckpoint()
    var levels = Vector(l0)
    for (_ <- 1 to 3) {
      val fr = levels.last
      val visited = levels.reduce(_ unionAll _)
        .select(col("seed").as("s2"), col("node").as("seen"))
      val next = edges.join(fr, edges("src") === fr("node"))
        .groupBy(fr("seed").as("seed"), edges("dst").as("node"))
        .agg(sum("sigma").as("sigma"))
        .join(visited,
          col("seed") === col("s2") && col("node") === col("seen"),
          "left_anti")
        .localCheckpoint()
      levels :+= next
    }

    var child = levels(3).withColumn("dq", lit(0L)).localCheckpoint()
    var deltas = Vector(child)
    for (k <- 2 to 0 by -1) {
      val lk = levels(k)
      val contrib = edges
        .join(lk.select(col("seed").as("sd"), col("node").as("v"),
          col("sigma").as("sv")), edges("src") === col("v"))
        .join(child.select(col("seed").as("sd2"), col("node").as("w"),
          col("sigma").as("sw"), col("dq").as("dw")),
          col("dst") === col("w") && col("sd") === col("sd2"))
        .select(col("sd").as("seed"), col("v").as("node"),
          expr(termExpr).as("term"))
        .groupBy("seed", "node").agg(sum("term").as("dq"))
      child = lk.join(contrib, Seq("seed", "node"), "left")
        .select(col("seed"), col("node"), col("sigma"),
          coalesce(col("dq"), lit(0L)).as("dq"))
        .localCheckpoint()
      deltas :+= child
    }

    deltas.reduce(_ unionAll _)
      .filter(col("node") =!= col("seed"))
      .groupBy("node").agg(sum("dq").as("dqs"))
      .select(col("node"),
        round(col("dqs").cast("double") / lit(1000000000000.0), 6)
          .as("betweenness"))
      .orderBy(col("betweenness").desc, col("node").asc)
      .limit(20)
  }

  /** T172: deterministic RANDOM WALKS over the trading graph — the
    * corpus-generation stage of DeepWalk/node2vec (Perozzi 2014 /
    * Grover 2016): embeddings train on walk sequences, and at 100 TB
    * the walk generation IS the Spark job (training happens
    * elsewhere). Walks are md5-DRIVEN, not RNG-driven (the repo's
    * no-randomness convention): at step k from node v the walk takes
    * neighbor rank (H(start,k,v) mod deg(v)) + 1, where H is the
    * first-8-hex-digit value of md5 and neighbors rank by dst ASC —
    * bit-reproducible across runs, engines, and partitionings, which
    * is what makes a 100 TB walk corpus auditable at all.
    *
    * One per-src neighbor-rank window over the memoized edge index
    * (keyed partition — scale-safe), then 4 bounded join rounds
    * (frontier is |starts| rows, the rank-match join is one hash
    * probe per walker); a start panel of 20 customers, walks die out
    * at isolated nodes (step-0 row still reported). */
  def graphWalks(s: SparkSession, d: String): DataFrame =
    walksTable(s, d).orderBy(col("start"), col("step"))

  /** The unordered walk rows behind [[graphWalks]] and
    * [[graphWalkPairs]], memoized per (session, dataset): both
    * consumers share one build, and the build itself materializes
    * aggressively — the neighbor-rank window is localCheckpoint'd
    * ONCE (lazily-referenced, it used to re-execute ~10× across the
    * unioned frontier lineage: round k's plan re-derived rounds
    * 1..k-1, ×2 again in walk_pairs' self-join), and each frontier
    * round (≤20 walker rows) cuts its lineage so the returned union
    * is a union of materialized RDDs, not a re-derivable plan. */
  private val walksCache = new graft.SessionCache[DataFrame]()

  private def walksTable(s: SparkSession, d: String): DataFrame =
    walksCache.getOrCompute(s, d) {
      import s.implicits._
      val (edgesDeg, _, _) = edgeIndex(s, d)
      val nb = edgesDeg.withColumn("rn",
        row_number().over(Window.partitionBy("src").orderBy("dst")))
        .localCheckpoint()
      val starts = (1 to 20).map(i => s"c$i").toDF("start")
      var frontier = starts
        .select(col("start"), col("start").as("node"), lit(0).as("step"))
        .localCheckpoint()
      var acc = frontier
      for (k <- 1 to 4) {
        // fresh alias per round: the frontier already carries nb lineage
        val n = s"nb$k"
        frontier = frontier.as("w")
          .join(nb.as(n), col("w.node") === col(s"$n.src")
            && (conv(substring(md5(concat(col("w.start"), lit(s":$k:"),
                col("w.node"))), 1, 8), 16, 10).cast("long")
              % col(s"$n.outdeg")) + 1 === col(s"$n.rn"))
          .select(col("w.start").as("start"),
            col(s"$n.dst").as("node"), lit(k).as("step"))
          .localCheckpoint()
        acc = acc.unionAll(frontier)
      }
      acc
    }

  /** T176: skip-gram (center, context) pair extraction from the
    * deterministic walks — the actual training corpus DeepWalk/
    * node2vec feeds to word2vec: every DIRECTED pair of walk nodes at
    * distance 1..2 within the same walk, counted. Composed on
    * [[walksTable]] by one walk-keyed self-join (walk ids are the
    * join key, so the pair expansion is per-walk bounded — window·L
    * pairs per walk, never corpus-quadratic). */
  def graphWalkPairs(s: SparkSession, d: String): DataFrame = {
    // the memoized walk panel is already a union of checkpointed
    // frontiers — both self-join sides replay only the cheap union
    val wa = walksTable(s, d)
    wa.as("a")
      .join(wa.as("b"), col("a.start") === col("b.start")
        && abs(col("a.step") - col("b.step")).between(1, 2))
      .groupBy(col("a.node").as("center"), col("b.node").as("context"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("center"), col("context"))
  }

  /** Bipartite co-occurrence projection: supplier–supplier similarity
    * through shared customers (the "entities that appear together"
    * query — the reference's graph exists to answer exactly this shape:
    * donors co-funding committees, accounts sharing domains; restated
    * relationally instead of as a Cypher path).
    *
    * Pairs are generated NARROWLY, the textPmi idiom: one hash agg
    * collects each customer's sorted supplier posting, a nested
    * transform expands the ordered pairs in-row, and the only
    * pair-side shuffle is the map-side-combined count on the
    * ≤|suppliers|² key space. A self-join of the (customer, supplier)
    * table on customer — the naive projection — never appears.
    * Degrees re-attach to the AGGREGATED pair table (node-sized join,
    * AQE's choice). Jaccard = co/(deg1+deg2−co) is one division of
    * exact integers — bit-identical cross-engine, no rounding needed.
    *
    * 100 TB posture: pair volume is Σ_c C(d_c, 2) — the classic
    * projection blowup is quadratic in the HOT LEFT NODE's degree, not
    * the corpus. The hub guard is [[custPostings]]' per-customer
    * degree cap (`spark.graft.graph.maxDegree`): capped, co-counts
    * become documented lower bounds while degrees stay exact, so
    * jaccard is conservative; default unlimited so the oracle replays
    * the exact expansion at test scale. The bipartite projection
    * itself is the memoized [[csIndex]] artifact (one build per
    * session × dataset across the graph suite). Top-k via sort+limit =
    * TakeOrdered, no full sort. */
  /** Shared supplier-pair aggregate over the capped postings: the
    * co-occurrence count AND the Adamic–Adar decimal weight sum from
    * ONE pair expansion, memoized per (session, dataset, degree cap) —
    * [[graphCooccur]] and [[graphLinkpred]] both consume it, so the
    * projection's pair volume (the single most expensive computation
    * in the graph suite) is paid once, like the shingle/IVF/edge
    * index artifacts. The AA weight 1/ln(deg_c) is quantized to the
    * 1e-12 grid ONCE per customer (per-row double op, identical both
    * engines) and summed as DECIMAL — order-free, plain map-side-
    * combinable aggregate on the ≤|suppliers|² pair key space. */
  private val pairStatsCache = new graft.SessionCache[DataFrame](df => {
    df.unpersist(); ()
  })

  private def pairStats(s: SparkSession, d: String): DataFrame = {
    val key = s"$d#cap=${maxDegree(s)}"
    val built = pairStatsCache.getOrCompute(s, key) {
      custPostings(s, csIndex(s, d))
        .filter(size(col("ss")) >= 2)
        .withColumn("w",
          round(lit(1.0) / log(size(col("ss")).cast("double")), 12)
            .cast("decimal(20,12)"))
        .select(col("w"), explode(expr(
          """flatten(transform(ss, (a, i) ->
            |  transform(slice(ss, i + 2, size(ss)), b ->
            |    struct(a AS s1, b AS s2))))""".stripMargin)).as("p"))
        .select(col("p.s1"), col("p.s2"), col("w"))
        .groupBy("s1", "s2")
        .agg(count(lit(1)).as("co"), sum(col("w")).as("aa_sum"))
        .persist()
    }
    // a cap change supersedes the old pair table — drop its blocks
    pairStatsCache.evictSiblings(s, s"$d#cap=", key)
    built
  }

  def graphCooccur(s: SparkSession, d: String): DataFrame = {
    val cs = csIndex(s, d)
    val deg = cs.groupBy("sk").agg(count(lit(1)).as("deg"))
    pairStats(s, d).select("s1", "s2", "co")
      .join(deg.select(col("sk").as("s1"), col("deg").as("deg1")), Seq("s1"))
      .join(deg.select(col("sk").as("s2"), col("deg").as("deg2")), Seq("s2"))
      .select(col("s1"), col("s2"), col("co"),
        (col("co").cast("double") /
          (col("deg1") + col("deg2") - col("co")).cast("double"))
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("s1").asc, col("s2").asc)
      .limit(20)
  }

  /** Connected components of the high-quantity trading subgraph (who
    * is transitively linked to whom through bulk orders) — the entity-
    * resolution primitive behind every "same cluster?" question the
    * reference's graph answers by walking Neo4j paths; `dedup_clusters`
    * uses the same idea over MinHash pairs, this is the general graph
    * form over a relational edge derivation.
    *
    * Algorithm: min-label propagation PLUS pointer jumping — each
    * round first takes l(v) ← min(l(v), min over neighbors l(u)) (one
    * edges⋈labels shuffle join + one hash agg), then short-circuits
    * l(v) ← l(l(v)) (one node-sized self-join), doubling the effective
    * propagation distance per round: convergence in O(log diameter)
    * rounds, not O(diameter). The loop runs to an OBSERVED fixpoint —
    * with a hard cap of 20 rounds. Convergence is detected WITHOUT a
    * dedicated per-round join: each node's previous label rides the
    * propagation agg as a `max`-folded side column (unique non-null
    * per node, so the fold is exact), and the changed-any flag is one
    * narrow `max(label != old)` scan over the round's already-
    * checkpointed node table, taken BEFORE the pointer jump (round-9:
    * a no-change propagation round proves every edge already has
    * l(u)=l(v), i.e. global convergence — so the final round exits
    * without paying its jump self-join at all).
    *
    * 100 TB posture: per round two shuffles on node keys + one
    * node-sized join; `localCheckpoint` truncates lineage per round
    * (swap for reliable checkpoint on a cluster). Labels are node ids,
    * so the label table never exceeds the node table. The component id
    * is the lexicographic min node id — canonical and engine-agnostic.
    * Exact integers + string min ⇒ no FP pinning needed; the oracle
    * replays reachability with a recursive CTE and takes MIN(label). */
  /** Degree-capped 2-hop edge expansion — the scale guard in front of
    * [[graphComponents]]' edges² composition. `edges` must be the
    * SYMMETRIC edge list (both directions present), so per-src row
    * counts ARE node degrees. Only pivots (the shared middle node)
    * with degree ≤ cap participate in the squaring: each such pivot
    * contributes ≤ cap·deg(pivot) pairs, so the whole expansion is
    * ≤ cap·|E| — linear in the edge count REGARDLESS of skew, where
    * the uncapped square is Σdeg² (quadratic in one hub's degree on a
    * power-law graph). Dropping a pivot never changes the label-
    * propagation fixpoint: 2-hop edges only accelerate convergence;
    * rows through hubs still move 1-hop per round on `edges` itself. */
  private[graft] def twoHopCapped(edges: DataFrame, cap: Int): DataFrame = {
    val okPivot = edges.groupBy(col("src").as("mid"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= cap)
      .select(col("mid"))
    edges.as("e1")
      .join(okPivot, col("e1.dst") === col("mid"))
      .join(edges.as("e2"), col("mid") === col("e2.src"))
      .select(col("e1.src").as("src"), col("e2.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** The gated bulk-subgraph propagation index behind
    * [[graphComponents]] — (hopEdges = edges ∪ capped edges²,
    * dst-keyed; the singleton label init, node-keyed) — memoized per
    * (session, dataset) like [[edgeIndex]]/[[seedBall]] (r13: the
    * corpus join + distinct + 2-hop expansion + two checkpoints were
    * rebuilt on every call — profiled ~2 s of graph_cc's 5.5 s;
    * the label-propagation LOOP itself still runs per call). */
  // onEvict keeps the cache contract uniform with csCache/hitsIndex
  // (r13 ADVICE); localCheckpoint blocks additionally fall to the
  // bench cold sweep's getPersistentRDDs pass
  private val ccIndexCache =
    new graft.SessionCache[(DataFrame, DataFrame)](v => {
      v._1.unpersist(); v._2.unpersist(); ()
    })

  private def ccIndex(s: SparkSession, d: String): (DataFrame, DataFrame) =
    ccIndexCache.getOrCompute(s, d) {
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      // full-quantity deep-discount lineitems: sparse enough to
      // fragment (65 components over 369 nodes at sf0.01) — a giant
      // component would make the canonical-label compare vacuous
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 50 && col("l_discount") >= 0.08)
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      val edges = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      // 2-hop propagation edges (round-9): the bulk subgraph chained
      // ~15 single-hop rounds at sf0.1 with per-round cost dominated by
      // fixed job latency, not data — propagating the min over
      // edges ∪ edges² moves it two hops per round and halves the round
      // count for one extra up-front join. Round-10 writes the
      // HUB-DEGREE CAP the squaring needs at cluster scale: a node of
      // degree d contributes d² two-hop pairs, so one power-law hub
      // makes edges² quadratic in its degree — [[twoHopCapped]] keeps
      // only pivots with degree ≤ 32, bounding the expansion to
      // O(cap·|E|) REGARDLESS of skew; hub rows still propagate 1-hop
      // through `edges` itself, so the fixpoint is identical (2-hop
      // edges are pure accelerators — any subset preserves the closure).
      // Probe semantics are unchanged: a zero-delta round under the
      // WIDER edge set is a fortiori stable on the 1-hop edges, which
      // is the convergence certificate.
      // The loop artifacts are BULK-SUBGRAPH-sized, not corpus-sized —
      // checkpoint them at [[dataParts]]' data-sized width. The 33x
      // factor bounds the capped 2-hop expansion (≤ cap·|E| + |E|);
      // keyed on the join columns so round 1 co-partitions both probe
      // inputs for free.
      // Width from the 33x-bounded estimate, but the r13 CORE floor
      // arms on the REALIZED edge count (r13 ADVICE: evaluating the
      // ≥8k-rows-per-task guard on the inflated estimate armed it at
      // ~250 actual rows/task, re-introducing the round-10 task-launch
      // overhead the guard exists to prevent).
      val nEdges = edges.count()
      val parts = math.max(dataParts(nEdges * 33L, 1),
        math.min(s.sparkContext.defaultParallelism.toLong,
          nEdges / 8192L).toInt)
      val hopEdges = edges.union(twoHopCapped(edges, 32))
        .distinct().repartition(parts, col("dst")).localCheckpoint()
      val l0 = hopEdges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
        .repartition(parts, col("node"))
        .localCheckpoint()
      edges.unpersist()
      (hopEdges, l0)
    }

  def graphComponents(s: SparkSession, d: String): DataFrame = {
    val (hopEdges, l0) = ccIndex(s, d)
    var labels = l0
    var changed = true
    var round = 0
    while (changed && round < 20) {
      round += 1
      // neighbor contributions carry no old label; each node's single
      // self row carries its previous label, so max(old) recovers it
      // exactly through the same agg that takes the min new label.
      // Lazy checkpoint MARK + the changed-probe as ONE action (the
      // bfs engine's fused materialize+probe): the probe runs BEFORE
      // the pointer jump, so a zero-delta propagation round — which
      // proves every edge already has l(u)=l(v), i.e. global
      // convergence — exits without paying its jump self-join at all
      // (round-9 early-exit; a deeper composed jump was tried and
      // regressed badly at sf0.1: the label-keyed probes concentrate
      // on a few hot labels as components coalesce).
      val prop = hopEdges
        .join(labels, hopEdges("dst") === labels("node"))
        .select(hopEdges("src").as("node"), col("label"),
          lit(null).cast("string").as("old"))
        .union(labels.select(col("node"), col("label"),
          col("label").as("old")))
        .groupBy("node")
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
        .localCheckpoint(false)
      changed = prop.agg(
        max((col("label") =!= col("old")).cast("int")).as("c"))
        .head().getInt(0) > 0
      if (changed) {
        // pointer jump: adopt your label's own label (always present —
        // labels only ever hold node ids). The probe above already
        // materialized prop's checkpoint, so the self-join's two
        // branches read cached blocks, not a recomputed edge join.
        // The jump checkpoints EAGERLY on purpose: the next round's
        // prop references `labels` TWICE (join side + union side), so
        // a lazy mark would recompute the jump join once per branch
        // inside the fused probe job — measured slower than paying
        // the one cheap materializing count here (round-10 A/B).
        labels = prop.as("a")
          .join(prop.select(col("node").as("ln"), col("label").as("ll")),
            col("a.label") === col("ln"))
          .select(col("a.node").as("node"), col("ll").as("label"))
          .localCheckpoint()
      } else {
        labels = prop.select(col("node"), col("label"))
      }
    }
    labels.groupBy(col("label").as("component"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("node").startsWith("c"), 1).otherwise(0))
          .as("n_customers"),
        sum(when(col("node").startsWith("s"), 1).otherwise(0))
          .as("n_suppliers"))
      .orderBy(col("component"))
  }

  /** Per-node triangle counts over the BULK supplier co-occurrence
    * graph (suppliers sharing ≥2 customers through near-full-quantity
    * lineitems) — the cohesion census behind clustering coefficients
    * and community seeds; the reference's graph warehouse answers
    * "tightly-knit funding circles" with exactly this closed-triple
    * shape.
    *
    * The quantity gate (≥ 46, the same idiom as [[graphComponents]]'
    * bulk filter) is SEMANTIC, not an optimization hack: without it
    * the co-occurrence graph converges on the complete graph as the
    * corpus grows (every supplier pair eventually shares 2 customers),
    * making "triangle" vacuous — and the wedge volume cubic in the
    * supplier count. Gated, edge density stays roughly constant in SF
    * (measured: 14k edges / 900k oriented-wedge bound at sf0.1 vs
    * 250M wedges ungated).
    *
    * Algorithm: DEGREE-ORDERED ORIENTATION (Suri–Vassilvitskii): each
    * undirected edge points from its (degree, id)-smaller endpoint to
    * the larger, bounding every out-neighborhood by O(√m); wedges are
    * then expanded IN-ROW from each node's sorted out-posting (the
    * textPmi/cooccur idiom — no self-join of the edge table on src),
    * and a single semi-join against the oriented edges closes them.
    * Each triangle is found exactly once (its rank-lowest corner owns
    * it), then exploded to its 3 corners for the per-node census.
    *
    * 100 TB posture: wedge volume is Σ_v outdeg(v)² — minimized by the
    * orientation (the whole point; an unoriented wedge join is
    * quadratic in the HUB degree). The closing join keys on the full
    * (b, c) pair — hash-partitioned, no broadcast of anything
    * edge-sized. Exact integers throughout, no FP pinning. The
    * orientation key is a (deg, id) STRUCT comparison, not an encoded
    * scalar — no id-range assumptions at scale. */
  /** The bulk co-occurrence graph's undirected edge list (s1 < s2)
    * and its triangle table (one row per triangle, corners a/b/c) —
    * memoized per (session, dataset) like [[pairStats]], shared by
    * [[graphTriangles]] and [[graphClustCoeff]] so the corpus join +
    * pair expansion + oriented wedge census is paid once. */
  private val triCache = new graft.SessionCache[(DataFrame, DataFrame)](v => {
    v._1.unpersist(); ()
  })

  private def bulkTriangles(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    triCache.getOrCompute(s, d) {
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 46)
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
      // undirected edges s1 < s2: suppliers sharing >= 2 customers,
      // pair-expanded narrowly from sorted per-customer postings
      val und = cs.groupBy("c")
        .agg(sort_array(collect_list(col("sk"))).as("ss"))
        .select(explode(expr(
          """flatten(transform(ss, (a, i) ->
            |  transform(slice(ss, i + 2, size(ss)), b ->
            |    struct(a AS s1, b AS s2))))""".stripMargin)).as("p"))
        .select(col("p.s1"), col("p.s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("co"))
        .filter(col("co") >= 2).select(col("s1"), col("s2"))
        .persist()
      (und, triangleTable(und))
    }

  /** The degree-oriented triangle census over an undirected (s1 < s2)
    * edge list — the Suri–Vassilvitskii core of [[bulkTriangles]],
    * factored so [[graphBridges]] can run it over its own (sparser)
    * edge gate. Returns one row per triangle (corners a/b/c),
    * localCheckpoint'd (triangle-sized). */
  private def triangleTable(und: DataFrame): DataFrame = {
    val deg = und.select(col("s1").as("n"))
      .union(und.select(col("s2").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("n").as("s1"), col("deg").as("d1")), Seq("s1"))
      .join(deg.select(col("n").as("s2"), col("deg").as("d2")), Seq("s2"))
    val r1 = struct(col("d1").as("dg"), col("s1").as("id"))
    val r2 = struct(col("d2").as("dg"), col("s2").as("id"))
    val fwd = r1 < r2
    val oriented = withDeg.select(
      when(fwd, col("s1")).otherwise(col("s2")).as("src"),
      when(fwd, r2).otherwise(r1).as("dst"))
    val wedges = oriented.groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("ns"))
      .select(col("src").as("a"), explode(expr(
        """flatten(transform(ns, (x, i) ->
          |  transform(slice(ns, i + 2, size(ns)), y ->
          |    struct(x.id AS b, y.id AS c))))""".stripMargin)).as("w"))
      .select(col("a"), col("w.b"), col("w.c"))
    val closing = oriented
      .select(col("src").as("b"), col("dst.id").as("c"))
    // triangle-sized (bounded by the oriented wedge census);
    // localCheckpoint materializes it once for all consumers
    wedges.join(closing, Seq("b", "c"), "left_semi")
      .localCheckpoint()
  }

  def graphTriangles(s: SparkSession, d: String): DataFrame = {
    val (_, tri) = bulkTriangles(s, d)
    tri.select(col("a").as("node"))
      .union(tri.select(col("b")))
      .union(tri.select(col("c")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("node"))
  }

  /** Local clustering coefficient per node of the bulk co-occurrence
    * graph: lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the standard
    * "how close is my neighborhood to a clique" cohesion measure
    * (Watts–Strogatz); nodes of degree < 2 have no defined coefficient
    * (NULL via try_divide, mirrored by the oracle's CASE).
    *
    * Reads the memoized [[bulkTriangles]] artifact, so the marginal
    * cost over [[graphTriangles]] is two node-sized aggregates and one
    * node-sized join. Counts are exact integers; lcc is one division
    * of exact operands, round 6 — bit-identical cross-engine. */
  def graphClustCoeff(s: SparkSession, d: String): DataFrame = {
    val (und, tri) = bulkTriangles(s, d)
    val deg = und.select(col("s1").as("node"))
      .union(und.select(col("s2")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tpn = tri.select(col("a").as("node"))
      .union(tri.select(col("b")))
      .union(tri.select(col("c")))
      .groupBy("node").agg(count(lit(1)).as("nt"))
    deg.join(tpn, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("nt"), lit(0L)).as("n_triangles"),
        round(try_divide(
          lit(2.0) * coalesce(col("nt"), lit(0L)).cast("double"),
          (col("degree") * (col("degree") - 1)).cast("double")), 6)
          .as("lcc"))
      .orderBy(col("node"))
  }

  /** T226: LOCAL BRIDGES of the bulk co-occurrence graph — edges whose
    * endpoints share NO common neighbor (span > 2), Granovetter's
    * "weak ties": the links whose removal disconnects neighborhoods,
    * and exactly the edges every triangle-based metric (clustering,
    * community seeds) is blind to. The edge set uses a TIGHTER
    * quantity gate (≥ 48) than the triangles suite: at ≥ 46 the
    * co-occurrence graph is dense enough that every edge closes a
    * triangle and the bridge set is vacuously empty (measured) — weak
    * ties only exist where the graph is sparse, so the gate choice IS
    * the operator's semantic knob. An edge is in a triangle iff its
    * endpoints share a neighbor, so local bridges = the edge list
    * ANTI-JOINED against the [[triangleTable]] corner pairs (the same
    * degree-oriented census graph_triangles runs — wedge volume
    * bounded by the orientation). Corner pairs normalize with
    * least/greatest (corner `a` is the degree-rank-lowest, not the
    * id-lowest). Totals ride as constant columns off two bounded
    * aggregates; exact integers throughout. */
  /** The ≥48-gated sparse co-occurrence edge list and its triangle
    * census for [[graphBridges]], memoized per (session, dataset) —
    * the [[bulkTriangles]] pattern at the bridges gate (r13: the
    * corpus join + pair expansion + oriented wedge census were
    * rebuilt on every call; only the anti-join/degree/panel tail is
    * per-call work). */
  private val bridgeCache =
    new graft.SessionCache[(DataFrame, DataFrame)](v => {
      v._1.unpersist(); v._2.unpersist(); ()
    })

  private def bridgeIndex(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    bridgeCache.getOrCompute(s, d) {
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 48)
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
      val und = cs.groupBy("c")
        .agg(sort_array(collect_list(col("sk"))).as("ss"))
        .select(explode(expr(
          """flatten(transform(ss, (a, i) ->
            |  transform(slice(ss, i + 2, size(ss)), b ->
            |    struct(a AS s1, b AS s2))))""".stripMargin)).as("p"))
        .select(col("p.s1"), col("p.s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("co"))
        .filter(col("co") >= 2).select(col("s1"), col("s2"))
        .localCheckpoint() // 4 consumers (census, anti, degree, totals)
      (und, triangleTable(und))
    }

  def graphBridges(s: SparkSession, d: String): DataFrame = {
    val (und, tri) = bridgeIndex(s, d)
    val te = tri.select(least(col("a"), col("b")).as("s1"),
        greatest(col("a"), col("b")).as("s2"))
      .union(tri.select(least(col("a"), col("c")),
        greatest(col("a"), col("c"))))
      .union(tri.select(least(col("b"), col("c")),
        greatest(col("b"), col("c"))))
      .distinct()
    val bridges = und.join(te, Seq("s1", "s2"), "left_anti")
    val deg = und.select(col("s1").as("n"))
      .union(und.select(col("s2").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val totals = broadcast(und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(bridges.agg(count(lit(1)).as("n_bridges"))))
    bridges
      .join(deg.select(col("n").as("s1"), col("deg").as("deg_s1")),
        Seq("s1"))
      .join(deg.select(col("n").as("s2"), col("deg").as("deg_s2")),
        Seq("s2"))
      .crossJoin(totals)
      .select(col("s1"), col("s2"), col("deg_s1"), col("deg_s2"),
        col("n_edges"), col("n_bridges"))
      .orderBy(col("s1"), col("s2"))
      .limit(20)
  }

  /** Adamic–Adar link prediction over the customer–supplier bipartite
    * projection: candidate supplier pairs score Σ 1/ln(deg(c)) over
    * their shared customers — rare shared neighbors weigh more than
    * promiscuous ones (the classic common-neighbor refinement used for
    * "who will trade next" ranking). Same scale shape as
    * [[graphCooccur]]: pair generation is the NARROW in-row expansion
    * of each customer's sorted supplier list (never a bucket
    * self-join), the weight 1/ln(deg) is computed once per customer
    * from that row's own list size, and only (s1, s2, w) rides the
    * pair shuffle. Reads the memoized [[csIndex]] projection and rides
    * [[custPostings]]' hub-degree cap (`spark.graft.graph.maxDegree`,
    * default unlimited): capped, a hub customer contributes only its
    * smallest-`cap` suppliers, so AA scores are lower bounds and the
    * per-customer weight uses the capped degree (consistent with the
    * retained posting). The FP score folds over a SORTED weight list
    * (seeded 0.0 ≡ seed-from-first, identical association order to the
    * oracle's list_reduce) and the top-20 cut sorts on the ROUNDED
    * score with a unique (s1, s2) tiebreak. */
  def graphLinkpred(s: SparkSession, d: String): DataFrame =
    // FP determinism via the exact-DECIMAL idiom, not a sorted fold
    // (order-free quantized weight sum — see [[pairStats]], which also
    // makes this query and graphCooccur share ONE pair expansion)
    pairStats(s, d)
      .select(col("s1"), col("s2"), col("co").as("n_common"),
        round(col("aa_sum").cast("double"), 6).as("aa"))
      .orderBy(col("aa").desc, col("s1").asc, col("s2").asc)
      .limit(20)

  /** Synchronous label-propagation community detection (LPA) over the
    * symmetrized trading graph — the standard near-linear community
    * baseline (Raghavan et al. 2007), made DETERMINISTIC so an oracle
    * can replay it: every node simultaneously adopts the neighbor
    * label with the highest frequency, ties broken by SMALLEST label,
    * for a FIXED 4 rounds (plain sync LPA can oscillate on bipartite
    * graphs — a fixed round count with deterministic ties is still a
    * deterministic labeling, which is what a hash-compared catalog row
    * needs). Label init = own node id.
    *
    * 100 TB posture: per round one edges⋈labels shuffle join + one
    * (node, label) hash agg + one argmax agg — the same bounded
    * iterative shape as [[graphPagerank]]; `localCheckpoint` truncates
    * lineage per round; labels stay node-sized. The argmax is
    * `min(struct(-count, label))`, a partial-aggregable single pass —
    * no per-node window. Reads the memoized [[edgeIndex]], so the
    * edge table is shared with the rest of the suite. */
  /** The 4-round sync-LPA label table (node, lab) shared by
    * [[graphCommunities]] and [[graphModularity]] — memoized per
    * (session, dataset) like the edge index so the two consumers pay
    * the 8 label-propagation joins once. localCheckpoint already
    * materialized the rounds; the cache only pins the final table. */
  private val lpaCache = new graft.SessionCache[DataFrame](_ => ())

  private def lpaLabels(s: SparkSession, d: String): DataFrame =
    lpaCache.getOrCompute(s, d) { lpaLabelsBuild(s, d) }

  private def lpaLabelsBuild(s: SparkSession, d: String): DataFrame = {
    val (edgesDeg, deg, _) = edgeIndex(s, d)
    val edges = edgesDeg.select(col("src"), col("dst"))
    var labels = deg.select(col("src").as("node"))
      .withColumn("lab", col("node"))
      .localCheckpoint()
    for (_ <- 1 to 4) {
      // join keyed on src (the index's persisted partitioning; the
      // edge set is symmetric, so collecting neighbor labels via src
      // and emitting dst is identical to the dst-keyed form)
      labels = edges.join(labels, edges("src") === labels("node"))
        .select(edges("dst").as("node"), col("lab"))
        .groupBy("node", "lab").agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(min(struct((-col("c")).as("nc"), col("lab").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("lab"))
        .localCheckpoint()
    }
    labels
  }

  def graphCommunities(s: SparkSession, d: String): DataFrame =
    lpaLabels(s, d).groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("node").startsWith("c"), 1).otherwise(0))
          .as("n_customers"))
      .orderBy(col("community"))

  /** Newman modularity of the LPA partition — the one-number "are
    * these communities real" quality gate. The pairwise definition
    * collapses to Q = E_in/m − Σ_c d_c² / (2m)², and with the
    * symmetric DIRECTED edge list (n_dir = 2m, in_dir = 2·E_in) that
    * is in_dir/n_dir − S/n_dir² — every term an exact integer sum (d_c²
    * through DECIMAL so a hub community cannot overflow), the final Q
    * ONE fixed double expression. No double is ever summed across
    * partitions, so the result is bit-stable cross-engine.
    *
    * 100 TB posture: reuses [[lpaLabels]] (memoized edge index + 4
    * checkpointed rounds), then two label joins and two aggregates —
    * all keyed shuffles on node/community ids. */
  def graphModularity(s: SparkSession, d: String): DataFrame = {
    val (edgesDeg, deg, _) = edgeIndex(s, d)
    val lbl = lpaLabels(s, d)
    val e2 = edgesDeg.select(col("src"), col("dst"))
      .join(lbl.select(col("node").as("src"), col("lab").as("lsrc")), "src")
      .join(lbl.select(col("node").as("dst"), col("lab").as("ldst")), "dst")
    val edgeStats = e2.agg(
      count(lit(1)).as("n_dir"),
      sum(when(col("lsrc") === col("ldst"), 1L).otherwise(0L)).as("in_dir"))
    val commStats = deg
      .join(lbl, deg("src") === lbl("node"))
      .groupBy(col("lab"))
      .agg(sum(col("outdeg")).as("d_c"))
      .agg(count(lit(1)).as("n_communities"),
        sum(col("d_c").cast("decimal(18,0)") *
          col("d_c").cast("decimal(18,0)")).as("s2"))
    edgeStats.join(broadcast(commStats))
      .select(
        expr("n_dir div 2").as("m_edges"),
        expr("in_dir div 2").as("e_in"),
        col("n_communities"),
        round(col("in_dir").cast("double") / col("n_dir").cast("double") -
          col("s2").cast("double") /
            (col("n_dir").cast("double") * col("n_dir").cast("double")), 6)
          .as("modularity"))
  }

  /** k-core peeling over the bulk trading subgraph (same gated edge
    * derivation as [[graphComponents]]): repeatedly drop nodes with
    * fewer than k=2 surviving neighbors — the standard graph-mining
    * densification filter (cores survive, pendant chains and stars
    * peel away). Runs a FIXED 6 peel rounds so the unrolled-CTE oracle
    * replays the identical computation; at test scale 6 rounds reach
    * the fixpoint (spec-pinned), and a production run would loop to an
    * observed fixpoint exactly like [[graphComponents]].
    *
    * Output = the last round's survivor table: (node, deg) where deg
    * counts neighbors among the PREVIOUS round's survivors (the
    * peeling invariant both engines share).
    *
    * 100 TB posture: per round one edges⋈nodes semi-join per endpoint
    * + one hash agg — node-keyed shuffles only; `localCheckpoint`
    * bounds lineage; the survivor table shrinks monotonically. */
  /** The ≥48/≥0.06-gated symmetric edge list [[graphKcore]] peels,
    * memoized per (session, dataset) (r13: the corpus join + distinct
    * + symmetrize + checkpoint were rebuilt per call; the 6 peel
    * rounds are per-call work). */
  private val kcoreEdgeCache =
    new graft.SessionCache[DataFrame](df => { df.unpersist(); () })

  private def kcoreEdges(s: SparkSession, d: String): DataFrame =
    kcoreEdgeCache.getOrCompute(s, d) {
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
      // a slightly wider gate than graphComponents' (>=50, >=0.08):
      // that graph is tree-like (empty 2-core — vacuous); this one
      // keeps a real core (sf0.01: 534 of 1033 nodes survive) and the
      // peel CONVERGES by round 6 at both test SFs (probed: n6 == n8)
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 48 && col("l_discount") >= 0.06)
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
    }

  def graphKcore(s: SparkSession, d: String): DataFrame = {
    val k = 2
    val rounds = 6
    // the edge set SHRINKS with the peel: each round restricts the
    // previous round's surviving edges (not the full graph) to the
    // current survivors — node sets are monotone decreasing, so
    // progressive restriction ≡ restricting to the latest set, and
    // later rounds scan strictly smaller checkpointed tables
    var cur = kcoreEdges(s, d)
    var nodes: DataFrame = null
    for (i <- 1 to rounds) {
      if (i > 1) {
        cur = cur
          .join(nodes.select(col("node").as("ls")), col("src") === col("ls"),
            "left_semi")
          .join(nodes.select(col("node").as("rs")), col("dst") === col("rs"),
            "left_semi")
          .localCheckpoint()
      }
      nodes = cur.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .localCheckpoint()
    }
    nodes.orderBy(col("node"))
  }

  /** Degree assortativity of the trading graph: the Pearson
    * correlation of (deg(src), deg(dst)) over the symmetrized edge
    * list — THE one-number mixing diagnostic (negative =
    * hub-and-spoke/disassortative, the usual shape of trade and web
    * graphs; positive = social-style core). Both orientations of each
    * undirected edge are present, which is exactly the standard
    * undirected definition.
    *
    * Determinism: degrees are exact integers; the six sufficient
    * statistics are DECIMAL(18,0) sums (order-free and exact; the
    * (18,0)×(18,0) product stays inside both engines' 38-digit cap
    * while holding any real degree), and r is one fixed double
    * expression over the exact sums — the [[graft.ops.CoreRelational
    * .profileCorr]] pattern on graph data. try_divide NULLs a
    * degenerate regular graph (zero degree variance).
    *
    * 100 TB posture: reads the memoized [[edgeIndex]] (deg(src)
    * already attached), one node-sized join attaches deg(dst), one
    * 1-row aggregate — no new shuffle beyond the dst join. */
  def graphAssortativity(s: SparkSession, d: String): DataFrame = {
    val (edgesDeg, deg, _) = edgeIndex(s, d)
    val dd = deg.select(col("src").as("dst"), col("outdeg").as("indeg"))
    def big(c: Column): Column = c.cast("decimal(18,0)")
    val a = edgesDeg.join(dd, Seq("dst"))
      .agg(
        count(lit(1)).as("n_edges"),
        sum(big(col("outdeg"))).cast("double").as("sx"),
        sum(big(col("indeg"))).cast("double").as("sy"),
        sum(big(col("outdeg")) * big(col("indeg"))).cast("double").as("sxy"),
        sum(big(col("outdeg")) * big(col("outdeg"))).cast("double").as("sxx"),
        sum(big(col("indeg")) * big(col("indeg"))).cast("double").as("syy"))
      .withColumn("n", col("n_edges").cast("double"))
    a.select(col("n_edges"),
      round(try_divide(col("n") * col("sxy") - col("sx") * col("sy"),
        sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
        .as("assortativity"))
  }

  /** HITS hubs & authorities over the DIRECTED bipartite graph
    * (customer → supplier): 3 mutual-reinforcement rounds — authority =
    * Σ hub of in-neighbors, hub = Σ authority of out-neighbors — each
    * normalized by the round's MAX (order-free, unlike the classic
    * L2 norm whose global double sum would be partition-order-
    * dependent). In-contribution sums are order-free exact-DECIMAL
    * sums of 1e-15-grid-quantized scores (the [[graphLinkpred]]
    * convention — scores are max-normalized into [0, 1], so the grid
    * keeps 15 significant digits; no collect_list buffering).
    *
    * 100 TB posture: reads the memoized [[csIndex]] projection; each
    * round is two key-shuffled aggregates + two joins with
    * localCheckpoint lineage cuts; the max is a 1-row broadcast. Same
    * iterative posture as pagerank — rounds are fixed (2; rank-stable
    * vs round 3 at every test SF, hand-pinned in Round6bOpsSpec),
    * state is node-sized. */
  /** Two pre-partitioned persisted copies of the directed projection
    * for [[graphHits]]: hash-partitioned by `c` (authority rounds
    * JOIN on it) and by `sk` (hub rounds) — each half-round joins the
    * copy partitioned on its JOIN key, so the edge table never
    * re-shuffles, and the cross-key aggregate relies on map-side
    * partial aggregation to shrink its exchange to node-sized
    * partials. (r13 fix, guide §2.4/§3.1: the previous orientation
    * joined the copy partitioned on the AGGREGATION key, betting the
    * node-score side would broadcast; scores descend from
    * localCheckpoint RDDs with unknown size stats, so the planner
    * chose a sort-merge join and re-shuffled the 4.7 MB edge copy
    * every half-round — and AQE then coalesced the join's reduce to
    * ONE 900 ms task. Joining on the partition key removes the edge
    * exchange under EVERY strategy the planner can pick; only the
    * node-sized score table ever shuffles.) Built once per (session,
    * dataset). */
  private val hitsIndexCache =
    new graft.SessionCache[(DataFrame, DataFrame)](v => {
      v._1.unpersist(); v._2.unpersist(); ()
    })

  private def hitsIndex(s: SparkSession, d: String): (DataFrame, DataFrame) =
    hitsIndexCache.getOrCompute(s, d) {
      val cs = csIndex(s, d)
      (cs.repartition(col("sk")).persist(),
        cs.repartition(col("c")).persist())
    }

  def graphHits(s: SparkSession, d: String): DataFrame = {
    val (csBySk, csByC) = hitsIndex(s, d)
    // FP determinism via the exact-DECIMAL idiom (the graph_linkpred
    // convention): max-normalized scores live in [0, 1], so the 1e-15
    // quantization grid keeps 15 significant digits on every score and
    // the per-node sum is a plain order-free decimal aggregate — no
    // per-node collect_list+sort+fold buffering the neighbor lists
    // through the shuffle
    // r14 (guide §1.2 per-task work): the quantization runs ONCE per
    // NODE in the score projection (the `*q` columns below), not per
    // EDGE row inside the aggregate — the old sum(round(edgeRow.score,
    // 15)) paid the double→BigDecimal→setScale conversion E times per
    // half-round (profiled: four ~11 s-CPU 32-task map stages, GC
    // spikes from BigDecimal churn). Summing the pre-quantized decimal
    // adds the IDENTICAL per-node values in an order-free aggregate —
    // bit-identical scores.
    def q15(c: org.apache.spark.sql.Column) =
      round(c, 15).cast("decimal(25,15)")
    def qsum(c: String) = sum(col(c)).cast("double")
    var hub = csByC.select(col("c")).distinct()
      .withColumn("hub", lit(1.0))
      .withColumn("hubq", q15(lit(1.0)))
    var auth: DataFrame = csByC.sparkSession.emptyDataFrame
    // hoisted: the persisted edge copy's width is loop-invariant, and
    // .rdd per iteration would re-instantiate a physical plan (r14)
    val edgeParts = csBySk.rdd.getNumPartitions
    // 2 iterations, not 3 (round-7 trim): on this bipartite projection
    // the max-normalized scores are rank-stable after round 2
    // (Round6bOpsSpec hand-pins the round-2 scores AND the round-3
    // rank identity on the star fixture); the round count is a stated
    // contract of the panel, mirrored by the oracle's unrolled chain.
    for (_ <- 1 to 2) {
      // checkpoint the AGGREGATE, not the normalized projection: the
      // max subquery and the next round's join then both read the
      // materialized node-sized table instead of re-running the
      // corpus-sized join+agg twice per round. Each half-round joins
      // the copy pre-partitioned on its JOIN key (edge side pays no
      // exchange whatever join strategy fires); the cross-key groupBy
      // shuffles only map-combined (key, partial-decimal) rows.
      // the normalized score table carries an explicit repartition on
      // the next half-round's join key, with the edge copy's EXPLICIT
      // partition count: a localCheckpoint here would erase the
      // partitioning fact (ExistingRDD reports UnknownPartitioning)
      // and a count-less repartition(col) lets AQE coalesce the tiny
      // score shuffle to ONE partition — which drags the co-
      // partitioned join (and the whole persisted edge side) into a
      // single task (measured: 1.1 s 1-task join stages). Pinned to
      // the edge copy's width, both join inputs satisfy the same
      // hash clustering and the join inserts NO exchange on either
      // side.
      // r14 (guide §2.4, fewer jobs per round): the max-normalize is
      // FUSED into the checkpoint's materializing action — the lazy
      // checkpoint MARK plus one agg(max).head() materializes the
      // node-sized aggregate AND returns the round max as a bounded
      // driver scalar (the bfs/diameter precedent), replacing the old
      // eager-checkpoint job + broadcast-exchange job + 1-row cross
      // join per half-round. The division by a literal is the same
      // double division the broadcast join evaluated — bit-identical
      // scores.
      val av = csByC.join(hub, "c").groupBy(col("sk"))
        .agg(qsum("hubq").as("v"))
        .localCheckpoint(false)
      val am = av.agg(max(col("v"))).head().getDouble(0)
      auth = av.select(col("sk"), (col("v") / lit(am)).as("auth"))
        .withColumn("authq", q15(col("auth")))
        .repartition(edgeParts, col("sk"))
      val hv = csBySk.join(auth, "sk").groupBy(col("c"))
        .agg(qsum("authq").as("v"))
        .localCheckpoint(false)
      val hm = hv.agg(max(col("v"))).head().getDouble(0)
      hub = hv.select(col("c"), (col("v") / lit(hm)).as("hub"))
        .withColumn("hubq", q15(col("hub")))
        .repartition(edgeParts, col("c"))
    }
    auth.select(lit("auth").as("side"),
        concat(lit("s"), col("sk")).as("node"),
        round(col("auth"), 6).as("score"))
      .unionAll(hub.select(lit("hub").as("side"),
        concat(lit("c"), col("c")).as("node"),
        round(col("hub"), 6).as("score")))
      .orderBy(col("side"), col("node"))
  }

  /** Rich-club profile (Zhou–Mondragón): for degree thresholds k ∈
    * {2,4,8,16,32}, the density φ(k) = E_k / (N_k·(N_k−1)) of the
    * subgraph induced by nodes with degree > k — "do the hubs trade
    * preferentially with each other?" (a rising φ(k) is the rich-club
    * effect; on this symmetrized bipartite projection the connectivity
    * is cross-side by construction, which the panel makes visible).
    *
    * ONE pass computes all five thresholds: the edge list joins the
    * node-sized degree table on both endpoints once (reusing the
    * memoized [[edgeIndex]] partitioning), then per-threshold counts
    * are CONDITIONAL SUMS in a single 1-row aggregate — no per-k
    * subgraph materialization, no loop. The directed edge count IS
    * E_k·2 on a symmetric list, matching the ordered-pair denominator
    * exactly. Exact integers; φ is one division, round 6. */
  def graphRichClub(s: SparkSession, d: String): DataFrame = {
    val ks = Seq(2, 4, 8, 16, 32)
    val (edgesDeg, deg, _) = edgeIndex(s, d)
    val dd = deg.select(col("src").as("dst"), col("outdeg").as("indeg"))
    val ej = edgesDeg.join(dd, Seq("dst"))
    val edgeSums = ej.agg(ks.map(k =>
      sum((col("outdeg") > k && col("indeg") > k).cast("long"))
        .as(s"e$k")).head, ks.tail.map(k =>
      sum((col("outdeg") > k && col("indeg") > k).cast("long"))
        .as(s"e$k")): _*)
    val nodeSums = deg.agg(ks.map(k =>
      sum((col("outdeg") > k).cast("long")).as(s"n$k")).head,
      ks.tail.map(k =>
        sum((col("outdeg") > k).cast("long")).as(s"n$k")): _*)
    val stacked = ks.map(k => s"$k, e$k, n$k").mkString(", ")
    edgeSums.crossJoin(broadcast(nodeSums))
      .select(expr(
        s"stack(${ks.size}, $stacked) as (k, e_dir, n_nodes)"))
      .select(col("k"), col("n_nodes"),
        expr("e_dir div 2").as("n_edges"),
        round(expr("case when n_nodes < 2 then null" +
          " else cast(e_dir as double)" +
          " / (cast(n_nodes as double) * cast(n_nodes - 1 as double))" +
          " end"), 6).as("phi"))
      .orderBy(col("k"))
  }

  /** One-row graph profile — the summary panel every graph service
    * exposes: node/edge counts per side, density, average and maximum
    * degree. Reads the memoized [[edgeIndex]] degree table only
    * (node-sized; the edge list is never rescanned), one aggregate. */
  def graphSummary(s: SparkSession, d: String): DataFrame = {
    val (_, deg, _) = edgeIndex(s, d)
    deg.agg(
        count(lit(1)).as("n_nodes"),
        sum(when(col("src").startsWith("c"), 1L).otherwise(0L))
          .as("n_customers"),
        sum(when(col("src").startsWith("s"), 1L).otherwise(0L))
          .as("n_suppliers"),
        sum(col("outdeg")).as("deg_sum"),
        max(col("outdeg")).as("max_degree"))
      .select(col("n_nodes"), col("n_customers"), col("n_suppliers"),
        expr("deg_sum div 2").as("n_edges"),
        round(col("deg_sum").cast("double") / col("n_nodes").cast("double"),
          6).as("avg_degree"),
        col("max_degree"),
        // bipartite density: edges over the customers×suppliers grid
        round((col("deg_sum").cast("double") / lit(2.0)) /
          (col("n_customers").cast("double") *
            col("n_suppliers").cast("double")), 6).as("density"))
  }

  /** T190: KATZ centrality — the damped all-walks influence measure
    * (pagerank without the degree normalization: a node is central if
    * many walks of ANY length reach it, geometrically discounted), 3
    * fixed rounds of x ← β + α·Σ_in x with β=1, α=1/8. α is a power
    * of two ON PURPOSE: scaling by 512 = 8³ makes every intermediate
    * an EXACT LONG (X₀=512; each round's Σ_in is divisible by 8 by
    * induction, so `div` has zero remainder) — no quantization grid,
    * no sorted fold, a plain map-side-combinable integer sum per
    * round, which is a strictly better 100 TB posture than pagerank's
    * oracle-pinning collect_list fold. One edges⋈scores join + one
    * agg per round over the memoized index; top-20 by score. */
  def graphKatz(s: SparkSession, d: String): DataFrame = {
    val (edgesDeg, deg, _) = edgeIndex(s, d)
    val edges = edgesDeg.select(col("src"), col("dst"))
    val nodes = deg.select(col("src").as("node"))
    var k = nodes.withColumn("kx", lit(512L))
    for (r <- 1 to 3) {
      val contrib = edges.join(k, edges("src") === k("node"))
        .groupBy(col("dst")).agg(sum("kx").as("insum"))
      val next = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          expr("512 + coalesce(insum, 0) div 8").as("kx"))
      // r14 (VERDICT item 7): checkpoint every OTHER round — each
      // round's table has exactly one consumer (the next round), so a
      // depth-2 lineage fuses two rounds into one materializing job
      // (halving the per-round job latency floor) while keeping the
      // plan bounded; the r13 lesson against a full lazy chain (AQE
      // loses all size stats) does not bite at depth 2 because the
      // fused segment still starts from a materialized table.
      k = if (r % 2 == 0) next else next.localCheckpoint()
    }
    k.select(col("node"),
        round(col("kx").cast("double") / 512.0, 6).as("katz"))
      .orderBy(col("katz").desc, col("node").asc)
      .limit(20)
  }

  /** Dev evidence hook (NOT a catalog entry; used by PlanDump's
    * devPlans): ONE authority half-round of [[graphHits]] — the
    * memoized c-partitioned edge copy joined with a representative
    * checkpointed-then-repartitioned hub table, exactly the per-round
    * join the loop executes — so the committed formatted plan can show
    * whether the edge side carries an exchange (r13 verdict: the
    * committed hits plans only showed the post-loop assembly). */
  private[graft] def hitsHalfRoundPlan(s: SparkSession, d: String)
      : DataFrame = {
    val (csBySk, csByC) = hitsIndex(s, d)
    val edgeParts = csBySk.rdd.getNumPartitions
    val hub = csByC.select(col("c")).distinct()
      .withColumn("hubq", round(lit(1.0), 15).cast("decimal(25,15)"))
      .localCheckpoint() // same provenance as a round's score table
      .repartition(edgeParts, col("c"))
    csByC.join(hub, "c").groupBy(col("sk"))
      .agg(sum(col("hubq")).cast("double").as("v"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_katz"      -> graphKatz _,
    "graph_summary"     -> graphSummary _,
    "graph_richclub"    -> graphRichClub _,
    "graph_hits"        -> graphHits _,
    "graph_modularity"  -> graphModularity _,
    "graph_assort"      -> graphAssortativity _,
    "graph_kcore"       -> graphKcore _,
    "graph_communities" -> graphCommunities _,
    "graph_linkpred"  -> graphLinkpred _,
    "graph_cc"        -> graphComponents _,
    "graph_triangles" -> graphTriangles _,
    "graph_bridges"  -> graphBridges _,
    "graph_clustcoeff" -> graphClustCoeff _,
    "graph_pagerank" -> graphPagerank _,
    "graph_ppr" -> graphPpr _,
    "graph_degree"   -> graphDegree _,
    "graph_cooccur"  -> graphCooccur _,
    "graph_paths"    -> graphPaths _,
    "graph_closeness" -> graphCloseness _,
    "graph_diameter" -> graphDiameter _,
    "graph_betweenness" -> graphBetweenness _,
    "graph_walks" -> graphWalks _,
    "graph_walk_pairs" -> graphWalkPairs _)

  /** The graph_walks oracle CTE chain (`wa` = all walk rows), shared
    * verbatim by the walks and skip-gram-pair oracles. */
  private lazy val walksOracleCtes: String = {
    val hash = (k: Int) =>
      s"""(CAST(list_sum(list_transform(range(1, 9), j ->
         |    (strpos('0123456789abcdef',
         |       substr(md5(w.start || ':$k:' || w.node),
         |         CAST(j AS INTEGER), 1)) - 1)
         |    * (16 ** (8 - j)))) AS BIGINT) % nb.outdeg) + 1"""
        .stripMargin
    val round = (k: Int) =>
      s"""w$k AS MATERIALIZED (
         |  SELECT w.start, nb.dst AS node, CAST($k AS INTEGER) AS step
         |  FROM w${k - 1} w JOIN nb ON nb.src = w.node
         |    AND ${hash(k)} = nb.rn)""".stripMargin
    val starts = (1 to 20).map(i => s"'c$i'").mkString(", ")
    s"""pairs AS MATERIALIZED (
       |  SELECT DISTINCT 'c' || o.o_custkey AS src,
       |                  's' || l.l_suppkey AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |edges AS MATERIALIZED (SELECT src, dst FROM pairs
       |          UNION ALL SELECT dst, src FROM pairs),
       |dg AS MATERIALIZED (
       |  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |nb AS MATERIALIZED (
       |  SELECT e.src, e.dst, d.outdeg,
       |    row_number() OVER (PARTITION BY e.src ORDER BY e.dst)
       |      AS rn
       |  FROM edges e JOIN dg d USING (src)),
       |w0 AS (
       |  SELECT seed AS start, seed AS node, CAST(0 AS INTEGER)
       |      AS step
       |  FROM (SELECT UNNEST([$starts]) AS seed)),
       |${(1 to 4).map(round).mkString(",\n")},
       |wa AS MATERIALIZED (
       |  SELECT * FROM w0 UNION ALL SELECT * FROM w1
       |  UNION ALL SELECT * FROM w2 UNION ALL SELECT * FROM w3
       |  UNION ALL SELECT * FROM w4)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // same 512-scaled exact-integer rounds; // is exact (zero
    // remainder by the same divisibility induction)
    "graph_katz" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o.o_custkey AS src,
        |                  's' || l.l_suppkey AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS MATERIALIZED (SELECT src, dst FROM pairs
        |          UNION ALL SELECT dst, src FROM pairs),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
        |k0 AS (SELECT node, CAST(512 AS BIGINT) AS kx FROM nodes),
        |k1 AS MATERIALIZED (
        |  SELECT n.node,
        |    512 + COALESCE(CAST(s.insum AS BIGINT), 0) // 8 AS kx
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS node, SUM(k.kx) AS insum
        |    FROM edges e JOIN k0 k ON e.src = k.node GROUP BY e.dst) s
        |    USING (node)),
        |k2 AS MATERIALIZED (
        |  SELECT n.node,
        |    512 + COALESCE(CAST(s.insum AS BIGINT), 0) // 8 AS kx
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS node, SUM(k.kx) AS insum
        |    FROM edges e JOIN k1 k ON e.src = k.node GROUP BY e.dst) s
        |    USING (node)),
        |k3 AS MATERIALIZED (
        |  SELECT n.node,
        |    512 + COALESCE(CAST(s.insum AS BIGINT), 0) // 8 AS kx
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS node, SUM(k.kx) AS insum
        |    FROM edges e JOIN k2 k ON e.src = k.node GROUP BY e.dst) s
        |    USING (node))
        |SELECT node, round(CAST(kx AS DOUBLE) / 512.0, 6) AS katz
        |FROM k3 ORDER BY katz DESC, node ASC LIMIT 20""".stripMargin,
    // same md5-driven next-hop rule: the first-8-hex value replays as
    // the nibble-positional fold (the dedup_embed_lsh idiom), neighbor
    // ranks by dst ASC, 4 unrolled rounds
    "graph_walks" ->
      s"""WITH $walksOracleCtes
         |SELECT start, node, step FROM wa
         |ORDER BY start, step""".stripMargin,
    // the walks CTE chain verbatim, then the directed skip-gram
    // window-2 self-join the engine runs
    "graph_walk_pairs" ->
      s"""WITH $walksOracleCtes
         |SELECT a.node AS center, b.node AS context,
         |  COUNT(*) AS n
         |FROM wa a JOIN wa b ON a.start = b.start
         |  AND abs(a.step - b.step) BETWEEN 1 AND 2
         |GROUP BY 1, 2
         |ORDER BY center, context""".stripMargin,
    // unrolled Brandes from the same 3-seed panel over the 3-hop
    // ball: integer sigma sums forward, 1e-12-quantized scaled-long
    // delta terms backward (identical expression tree to the engine),
    // one final exact BIGINT sum per node
    "graph_betweenness" -> {
      val fwd = (prev: String, vis: Seq[String], cur: String) =>
        s"""${cur}f AS MATERIALIZED (
           |  SELECT p.seed, e.dst AS node,
           |    CAST(SUM(p.sigma) AS BIGINT) AS sigma
           |  FROM edges e JOIN $prev p ON e.src = p.node
           |  GROUP BY 1, 2),
           |$cur AS MATERIALIZED (
           |  SELECT f.* FROM ${cur}f f
           |  WHERE NOT EXISTS (SELECT 1 FROM (${vis
            .map(v => s"SELECT seed, node FROM $v").mkString(
              " UNION ALL ")}) u
           |    WHERE u.seed = f.seed AND u.node = f.node))""".stripMargin
      val term =
        "CAST(floor(CAST(a.sigma AS DOUBLE) / CAST(b.sigma AS DOUBLE)" +
          " * (1.0 + CAST(b.dq AS DOUBLE) / 1000000000000.0)" +
          " * 1000000000000.0 + 0.5) AS BIGINT)"
      val back = (lk: String, chld: String, cur: String) =>
        s"""${cur}c AS MATERIALIZED (
           |  SELECT a.seed, a.node, CAST(SUM($term) AS BIGINT) AS dq
           |  FROM edges e
           |  JOIN $lk a ON e.src = a.node
           |  JOIN $chld b ON e.dst = b.node AND b.seed = a.seed
           |  GROUP BY 1, 2),
           |$cur AS MATERIALIZED (
           |  SELECT l.seed, l.node, l.sigma, coalesce(c.dq, 0) AS dq
           |  FROM $lk l LEFT JOIN ${cur}c c USING (seed, node))"""
          .stripMargin
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT 'c' || o.o_custkey AS src,
         |                  's' || l.l_suppkey AS dst
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS MATERIALIZED (SELECT src, dst FROM pairs
         |          UNION ALL SELECT dst, src FROM pairs),
         |l0 AS MATERIALIZED (
         |  SELECT seed, seed AS node, CAST(1 AS BIGINT) AS sigma
         |  FROM (SELECT UNNEST(['c1','c2','c3']) AS seed)),
         |${fwd("l0", Seq("l0"), "l1")},
         |${fwd("l1", Seq("l0", "l1"), "l2")},
         |${fwd("l2", Seq("l0", "l1", "l2"), "l3")},
         |d3 AS MATERIALIZED (
         |  SELECT seed, node, sigma, CAST(0 AS BIGINT) AS dq FROM l3),
         |${back("l2", "d3", "d2")},
         |${back("l1", "d2", "d1")},
         |${back("l0", "d1", "d0")}
         |SELECT node,
         |  round(CAST(SUM(dq) AS DOUBLE) / 1000000000000.0, 6)
         |    AS betweenness
         |FROM (SELECT * FROM d3 UNION ALL SELECT * FROM d2
         |      UNION ALL SELECT * FROM d1 UNION ALL SELECT * FROM d0)
         |WHERE node <> seed
         |GROUP BY node
         |ORDER BY betweenness DESC, node LIMIT 20""".stripMargin
    },
    // same symmetrized edges + degree join, per-k conditional sums
    "graph_richclub" -> {
      val ks = Seq(2, 4, 8, 16, 32)
      val rows = ks.map(k =>
        s"""SELECT $k AS k,
           |  (SELECT CAST(SUM(CASE WHEN outdeg > $k THEN 1 ELSE 0 END)
           |     AS BIGINT) FROM deg) AS n_nodes,
           |  CAST(SUM(CASE WHEN ds.outdeg > $k AND dd.outdeg > $k
           |    THEN 1 ELSE 0 END) AS BIGINT) AS e_dir
           |FROM edges e
           |JOIN deg ds ON ds.src = e.src
           |JOIN deg dd ON dd.src = e.dst""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT 'c' || o.o_custkey AS src,
         |                  's' || l.l_suppkey AS dst
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS MATERIALIZED (SELECT src, dst FROM pairs
         |          UNION ALL SELECT dst, src FROM pairs),
         |deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)
         |SELECT k, n_nodes, e_dir // 2 AS n_edges,
         |  round(CASE WHEN n_nodes < 2 THEN NULL
         |    ELSE CAST(e_dir AS DOUBLE)
         |      / (CAST(n_nodes AS DOUBLE) * CAST(n_nodes - 1 AS DOUBLE))
         |    END, 6) AS phi
         |FROM ($rows) ORDER BY k""".stripMargin
    },
    "graph_summary" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o.o_custkey AS src,
        |                  's' || l.l_suppkey AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS MATERIALIZED (SELECT src, dst FROM pairs
        |          UNION ALL SELECT dst, src FROM pairs),
        |deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |a AS (
        |  SELECT COUNT(*) AS n_nodes,
        |    CAST(SUM(CASE WHEN src LIKE 'c%' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_customers,
        |    CAST(SUM(CASE WHEN src LIKE 's%' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_suppliers,
        |    CAST(SUM(outdeg) AS BIGINT) AS deg_sum,
        |    CAST(MAX(outdeg) AS BIGINT) AS max_degree
        |  FROM deg)
        |SELECT n_nodes, n_customers, n_suppliers,
        |  deg_sum // 2 AS n_edges,
        |  round(CAST(deg_sum AS DOUBLE) / CAST(n_nodes AS DOUBLE), 6)
        |    AS avg_degree,
        |  max_degree,
        |  round((CAST(deg_sum AS DOUBLE) / 2.0)
        |    / (CAST(n_customers AS DOUBLE) * CAST(n_suppliers AS DOUBLE)),
        |    6) AS density
        |FROM a""".stripMargin,
    // 3 unrolled mutual-reinforcement rounds with the identical
    // sorted-fold sums and max normalization
    "graph_hits" -> {
      val round = (ha: String, aa: String, hn: String, an: String) =>
        s"""${aa}r AS MATERIALIZED (
           |  SELECT sk, CAST(SUM(CAST(round(hub, 15) AS DECIMAL(25,15)))
           |    AS DOUBLE) AS v
           |  FROM cs JOIN $ha USING (c) GROUP BY sk),
           |$an AS MATERIALIZED (
           |  SELECT sk, v / (SELECT MAX(v) FROM ${aa}r) AS auth
           |  FROM ${aa}r),
           |${hn}r AS MATERIALIZED (
           |  SELECT c, CAST(SUM(CAST(round(auth, 15) AS DECIMAL(25,15)))
           |    AS DOUBLE) AS v
           |  FROM cs JOIN $an USING (sk) GROUP BY c),
           |$hn AS MATERIALIZED (
           |  SELECT c, v / (SELECT MAX(v) FROM ${hn}r) AS hub
           |  FROM ${hn}r)""".stripMargin
      s"""WITH cs AS MATERIALIZED (
         |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |h0 AS (SELECT DISTINCT c, CAST(1.0 AS DOUBLE) AS hub FROM cs),
         |${round("h0", "a1", "h1", "a1n")},
         |${round("h1", "a2", "h2", "a2n")}
         |SELECT side, node, score FROM (
         |  SELECT 'auth' AS side, 's' || sk AS node,
         |    round(auth, 6) AS score FROM a2n
         |  UNION ALL
         |  SELECT 'hub', 'c' || c, round(hub, 6) FROM h2)
         |ORDER BY side, node""".stripMargin
    },
    // exact DECIMAL sufficient statistics over the symmetrized edge
    // list; same fixed double tree as the engine, CASE ≡ try_divide
    "graph_assort" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o.o_custkey AS src,
        |                  's' || l.l_suppkey AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS MATERIALIZED (SELECT src, dst FROM pairs
        |          UNION ALL SELECT dst, src FROM pairs),
        |deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |ed AS (
        |  SELECT CAST(d1.outdeg AS DECIMAL(18,0)) AS x,
        |         CAST(d2.outdeg AS DECIMAL(18,0)) AS y
        |  FROM edges e
        |  JOIN deg d1 ON d1.src = e.src
        |  JOIN deg d2 ON d2.src = e.dst),
        |a AS (
        |  SELECT COUNT(*) AS n_edges, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(y * y) AS DOUBLE) AS syy
        |  FROM ed)
        |SELECT n_edges,
        |  round(CASE WHEN sqrt(n * sxx - sx * sx)
        |               * sqrt(n * syy - sy * sy) = 0 THEN NULL
        |    ELSE (n * sxy - sx * sy) /
        |      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |    END, 6) AS assortativity
        |FROM a""".stripMargin,
    // unrolled 6 peel rounds; each round recounts degree among the
    // previous round's survivors and keeps deg >= 2 — the engine's
    // identical fixed-round peeling
    "graph_kcore" -> {
      val peel = (prev: String, cur: String) =>
        s"""$cur AS MATERIALIZED (
           |  SELECT src AS node, COUNT(*) AS deg FROM edges
           |  WHERE src IN (SELECT node FROM $prev)
           |    AND dst IN (SELECT node FROM $prev)
           |  GROUP BY src HAVING COUNT(*) >= 2)""".stripMargin
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT 'c' || o.o_custkey AS src,
         |                  's' || l.l_suppkey AS dst
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE l.l_quantity >= 48 AND l.l_discount >= 0.06),
         |edges AS MATERIALIZED (SELECT src, dst FROM pairs
         |          UNION ALL SELECT dst, src FROM pairs),
         |n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
         |${peel("n0", "n1")},
         |${peel("n1", "n2")},
         |${peel("n2", "n3")},
         |${peel("n3", "n4")},
         |${peel("n4", "n5")},
         |${peel("n5", "n6")}
         |SELECT node, deg FROM n6 ORDER BY node""".stripMargin
    },
    // the graph_communities LPA replay + the exact-integer modularity
    // sums (in_dir/n_dir − S/n_dir² over the symmetric directed list)
    "graph_modularity" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS MATERIALIZED (
           |  SELECT node, lab FROM (
           |    SELECT e.src AS node, p.lab, COUNT(*) AS c,
           |      ROW_NUMBER() OVER (PARTITION BY e.src
           |        ORDER BY COUNT(*) DESC, p.lab ASC) AS rn
           |    FROM edges e JOIN $prev p ON e.dst = p.node
           |    GROUP BY e.src, p.lab) WHERE rn = 1)""".stripMargin
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT 'c' || o.o_custkey AS src,
         |                  's' || l.l_suppkey AS dst
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS MATERIALIZED (SELECT src, dst FROM pairs
         |          UNION ALL SELECT dst, src FROM pairs),
         |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
         |${round("l0", "l1")},
         |${round("l1", "l2")},
         |${round("l2", "l3")},
         |${round("l3", "l4")},
         |es AS (
         |  SELECT COUNT(*) AS n_dir,
         |    CAST(SUM(CASE WHEN a.lab = b.lab THEN 1 ELSE 0 END)
         |      AS BIGINT) AS in_dir
         |  FROM edges e
         |  JOIN l4 a ON e.src = a.node
         |  JOIN l4 b ON e.dst = b.node),
         |deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
         |cs2 AS (
         |  SELECT COUNT(*) AS n_communities,
         |    SUM(CAST(d_c AS DECIMAL(18,0)) * CAST(d_c AS DECIMAL(18,0)))
         |      AS s2
         |  FROM (SELECT l4.lab, SUM(deg.outdeg) AS d_c
         |        FROM deg JOIN l4 ON deg.src = l4.node GROUP BY 1))
         |SELECT n_dir // 2 AS m_edges, in_dir // 2 AS e_in,
         |  n_communities,
         |  round(CAST(in_dir AS DOUBLE) / CAST(n_dir AS DOUBLE)
         |    - CAST(s2 AS DOUBLE)
         |      / (CAST(n_dir AS DOUBLE) * CAST(n_dir AS DOUBLE)), 6)
         |    AS modularity
         |FROM es, cs2""".stripMargin
    },
    // unrolled 4 sync LPA rounds; the ROW_NUMBER (count DESC, label
    // ASC) pick replays the engine's min(struct(-count, label)) argmax
    "graph_communities" -> {
      val round = (prev: String, cur: String) =>
        s"""$cur AS MATERIALIZED (
           |  SELECT node, lab FROM (
           |    SELECT e.src AS node, p.lab, COUNT(*) AS c,
           |      ROW_NUMBER() OVER (PARTITION BY e.src
           |        ORDER BY COUNT(*) DESC, p.lab ASC) AS rn
           |    FROM edges e JOIN $prev p ON e.dst = p.node
           |    GROUP BY e.src, p.lab) WHERE rn = 1)""".stripMargin
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT 'c' || o.o_custkey AS src,
         |                  's' || l.l_suppkey AS dst
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS MATERIALIZED (SELECT src, dst FROM pairs
         |          UNION ALL SELECT dst, src FROM pairs),
         |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
         |${round("l0", "l1")},
         |${round("l1", "l2")},
         |${round("l2", "l3")},
         |${round("l3", "l4")}
         |SELECT lab AS community, COUNT(*) AS n_nodes,
         |  CAST(SUM(CASE WHEN node LIKE 'c%' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_customers
         |FROM l4 GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // naive all-pairs restatement: equi-self-join on the shared
    // customer, weight 1/ln(customer degree); list_reduce's
    // seed-from-first fold over the sorted weights matches the
    // engine's 0.0-seeded fold bit-for-bit (0.0 + w1 ≡ w1)
    "graph_linkpred" ->
      """WITH cs AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sk
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |cd AS (SELECT c, COUNT(*) AS deg FROM cs GROUP BY 1),
        |w AS (SELECT c,
        |        CAST(round(1.0 / ln(CAST(deg AS DOUBLE)), 12)
        |          AS DECIMAL(20,12)) AS w
        |      FROM cd WHERE deg >= 2),
        |pr AS (
        |  SELECT a.sk AS s1, b.sk AS s2, w.w
        |  FROM cs a
        |  JOIN cs b ON a.c = b.c AND a.sk < b.sk
        |  JOIN w ON w.c = a.c)
        |SELECT s1, s2, COUNT(*) AS n_common,
        |  round(CAST(SUM(w) AS DOUBLE), 6) AS aa
        |FROM pr GROUP BY 1, 2
        |ORDER BY aa DESC, s1, s2 LIMIT 20""".stripMargin,
    // reachability closure via recursive CTE; MIN over reachable node
    // ids = the engine's converged min-label — identical canonical id
    "graph_cc" ->
      """WITH RECURSIVE pairs AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o.o_custkey AS src,
        |                  's' || l.l_suppkey AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 50 AND l.l_discount >= 0.08),
        |edges AS MATERIALIZED (SELECT src, dst FROM pairs
        |          UNION ALL SELECT dst, src FROM pairs),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |walk(node, lab) AS (
        |  SELECT node, node FROM nodes
        |  UNION
        |  SELECT e.src, w.lab
        |  FROM edges e JOIN walk w ON e.dst = w.node),
        |comp AS (SELECT node, MIN(lab) AS component
        |         FROM walk GROUP BY node)
        |SELECT component, COUNT(*) AS n_nodes,
        |  CAST(SUM(CASE WHEN node LIKE 'c%' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_customers,
        |  CAST(SUM(CASE WHEN node LIKE 's%' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_suppliers
        |FROM comp GROUP BY component ORDER BY component""".stripMargin,
    // same naive triple closure plus the degree table; lcc is one
    // division of exact integers, CASE degree<2 ≡ try_divide NULL
    "graph_clustcoeff" ->
      """WITH cs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 46),
        |co AS MATERIALIZED (
        |  SELECT a.sk AS s1, b.sk AS s2, COUNT(*) AS co
        |  FROM cs a JOIN cs b ON a.c = b.c AND a.sk < b.sk
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT s1, s2 FROM co WHERE co >= 2),
        |deg AS (
        |  SELECT node, COUNT(*) AS degree FROM (
        |    SELECT s1 AS node FROM e UNION ALL SELECT s2 FROM e)
        |  GROUP BY node),
        |tri AS (
        |  SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
        |  FROM e e1 JOIN e e2 ON e2.s1 = e1.s2
        |            JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2),
        |tpn AS (
        |  SELECT node, COUNT(*) AS nt FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY node)
        |SELECT d.node, d.degree,
        |  CAST(coalesce(t.nt, 0) AS BIGINT) AS n_triangles,
        |  round(CASE WHEN d.degree < 2 THEN NULL
        |    ELSE 2.0 * CAST(coalesce(t.nt, 0) AS DOUBLE)
        |      / CAST(d.degree * (d.degree - 1) AS DOUBLE) END, 6) AS lcc
        |FROM deg d LEFT JOIN tpn t USING (node)
        |ORDER BY d.node""".stripMargin,
    // the oracle closes triples naively on the a<b<c edge list — the
    // engine's oriented wedge census finds the same triangle set
    // same gated co-occurrence edges; "no common neighbor" stated
    // directly (an edge is in a triangle iff a common neighbor
    // exists, so NOT EXISTS over the symmetrized adjacency is
    // provably the engine's anti-join against triangle corner pairs)
    "graph_bridges" ->
      """WITH cs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 48),
        |co AS MATERIALIZED (
        |  SELECT a.sk AS s1, b.sk AS s2, COUNT(*) AS co
        |  FROM cs a JOIN cs b ON a.c = b.c AND a.sk < b.sk
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT s1, s2 FROM co WHERE co >= 2),
        |adj AS MATERIALIZED (
        |  SELECT s1 AS u, s2 AS v FROM e
        |  UNION ALL SELECT s2, s1 FROM e),
        |deg AS (SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM adj GROUP BY u),
        |br AS MATERIALIZED (
        |  SELECT s1, s2 FROM e
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM adj a1 JOIN adj a2 ON a1.v = a2.v
        |    WHERE a1.u = e.s1 AND a2.u = e.s2)),
        |tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e)
        |    AS n_edges,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM br) AS n_bridges)
        |SELECT b.s1, b.s2, d1.deg AS deg_s1, d2.deg AS deg_s2,
        |  t.n_edges, t.n_bridges
        |FROM br b JOIN deg d1 ON d1.n = b.s1
        |  JOIN deg d2 ON d2.n = b.s2, tot t
        |ORDER BY b.s1, b.s2 LIMIT 20""".stripMargin,
    "graph_triangles" ->
      """WITH cs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 46),
        |co AS MATERIALIZED (
        |  SELECT a.sk AS s1, b.sk AS s2, COUNT(*) AS co
        |  FROM cs a JOIN cs b ON a.c = b.c AND a.sk < b.sk
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT s1, s2 FROM co WHERE co >= 2),
        |tri AS (
        |  SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
        |  FROM e e1 JOIN e e2 ON e2.s1 = e1.s2
        |            JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2),
        |corners AS (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT node, COUNT(*) AS n_triangles
        |FROM corners GROUP BY node ORDER BY node""".stripMargin,
    // unrolled 5 iterations; list_sort → list_reduce replays the
    // engine's sorted fold so the doubles are bit-identical
    "graph_pagerank" -> {
      val iter = (prev: String, cur: String) =>
        s"""$cur AS MATERIALIZED (
           |  SELECT e.dst AS node,
           |    0.15/(SELECT nn FROM n) + 0.85 * list_reduce(
           |      list_sort(list(p.rank / e.outdeg)), (a, x) -> a + x)
           |      AS rank
           |  FROM ed e JOIN $prev p ON e.src = p.node GROUP BY e.dst)"""
          .stripMargin
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT 'c' || o.o_custkey AS src,
         |                  's' || l.l_suppkey AS dst
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS MATERIALIZED (SELECT src, dst FROM pairs
         |          UNION ALL SELECT dst, src FROM pairs),
         |deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |ed AS MATERIALIZED (SELECT e.src, e.dst, d.outdeg
         |       FROM edges e JOIN deg d USING (src)),
         |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM deg),
         |pr0 AS (SELECT src AS node, 1.0/(SELECT nn FROM n) AS rank
         |        FROM deg),
         |${iter("pr0", "pr1")},
         |${iter("pr1", "pr2")},
         |${iter("pr2", "pr3")},
         |${iter("pr3", "pr4")},
         |${iter("pr4", "pr5")}
         |SELECT node, rank FROM pr5 ORDER BY node""".stripMargin
    },
    // same sparse teleport-to-seeds walk: sorted-fold in-sums,
    // full-outer with the 3-row seed base, identical top-20 cut
    "graph_ppr" -> {
      val iter = (prev: String, cur: String) =>
        s"""$cur AS MATERIALIZED (
           |  SELECT COALESCE(c.node, sd.node) AS node,
           |    COALESCE(c.cc, 0.0) + COALESCE(sd.base, 0.0) AS rank
           |  FROM (
           |    SELECT e.dst AS node, 0.85 * list_reduce(
           |      list_sort(list(p.rank / e.outdeg)), (a, x) -> a + x)
           |      AS cc
           |    FROM ed e JOIN $prev p ON e.src = p.node
           |    GROUP BY e.dst) c
           |  FULL OUTER JOIN sd ON c.node = sd.node)""".stripMargin
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT 'c' || o.o_custkey AS src,
         |                  's' || l.l_suppkey AS dst
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS MATERIALIZED (SELECT src, dst FROM pairs
         |          UNION ALL SELECT dst, src FROM pairs),
         |deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |ed AS MATERIALIZED (SELECT e.src, e.dst, d.outdeg
         |       FROM edges e JOIN deg d USING (src)),
         |sd AS (SELECT node, 0.15 / 3.0 AS base
         |       FROM (VALUES ('c1'), ('c2'), ('c3')) s(node)),
         |pr0 AS (SELECT node, 1.0 / 3.0 AS rank FROM sd),
         |${iter("pr0", "pr1")},
         |${iter("pr1", "pr2")},
         |${iter("pr2", "pr3")}
         |SELECT CAST(row_number() OVER (ORDER BY rank DESC, node ASC)
         |    AS INTEGER) AS rk, node, rank
         |FROM pr3 ORDER BY rank DESC, node ASC LIMIT 20""".stripMargin
    },
    // the oracle takes the naive projection (self-join on customer)
    // the engine deliberately avoids; same exact integers, and the
    // jaccard division is one op over identical operands
    "graph_cooccur" ->
      """WITH cs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |deg AS (SELECT sk, COUNT(*) AS deg FROM cs GROUP BY sk),
        |co AS MATERIALIZED (
        |  SELECT a.sk AS s1, b.sk AS s2, COUNT(*) AS co
        |  FROM cs a JOIN cs b ON a.c = b.c AND a.sk < b.sk
        |  GROUP BY 1, 2)
        |SELECT co.s1, co.s2, co.co,
        |  CAST(co.co AS DOUBLE) /
        |    CAST(d1.deg + d2.deg - co.co AS DOUBLE) AS jaccard
        |FROM co JOIN deg d1 ON co.s1 = d1.sk
        |         JOIN deg d2 ON co.s2 = d2.sk
        |ORDER BY jaccard DESC, s1, s2 LIMIT 20""".stripMargin,
    // DuckDB's recursive CTE IS the reference restated: UNION-dedup'd
    // double sweep: BFS from c1, restart from the deterministic
    // farthest node, report the second eccentricity
    "graph_diameter" ->
      """WITH RECURSIVE pairs AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o.o_custkey AS src,
        |                  's' || l.l_suppkey AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS MATERIALIZED (SELECT src, dst FROM pairs
        |          UNION ALL SELECT dst, src FROM pairs),
        |w1(node, dist) AS (
        |  SELECT 'c1', 0
        |  UNION
        |  SELECT e.dst, w.dist + 1
        |  FROM edges e JOIN w1 w ON e.src = w.node WHERE w.dist < 6),
        |m1 AS (SELECT node, MIN(dist) AS dist FROM w1 GROUP BY 1),
        |far AS (SELECT node FROM m1 ORDER BY dist DESC, node ASC LIMIT 1),
        |w2(node, dist) AS (
        |  SELECT node, 0 FROM far
        |  UNION
        |  SELECT e.dst, w.dist + 1
        |  FROM edges e JOIN w2 w ON e.src = w.node WHERE w.dist < 6),
        |m2 AS (SELECT node, MIN(dist) AS dist FROM w2 GROUP BY 1)
        |SELECT 'c1' AS seed1, (SELECT node FROM far) AS seed2,
        |  CAST(MAX(dist) AS INT) AS diameter_lb,
        |  COUNT(*) AS n_reached
        |FROM m2""".stripMargin,
    // the multi-seed walk: UNION-dedup'd (seed, node) frontier to 3
    // hops, MIN(dist) per pair, then the closeness panel
    "graph_closeness" ->
      """WITH RECURSIVE pairs AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o.o_custkey AS src,
        |                  's' || l.l_suppkey AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS MATERIALIZED (SELECT src, dst FROM pairs
        |          UNION ALL SELECT dst, src FROM pairs),
        |walk(seed, node, dist) AS (
        |  SELECT s.seed, s.seed, 0
        |  FROM (SELECT UNNEST(['c1', 'c2', 'c3', 'c4', 'c5']) AS seed) s
        |  UNION
        |  SELECT w.seed, e.dst, w.dist + 1
        |  FROM edges e JOIN walk w ON e.src = w.node
        |  WHERE w.dist < 3),
        |md AS (
        |  SELECT seed, node, MIN(dist) AS dist
        |  FROM walk GROUP BY 1, 2)
        |SELECT seed, CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
        |  CAST(SUM(dist) AS BIGINT) AS sum_dist,
        |  round(CASE WHEN SUM(dist) = 0 THEN NULL
        |    ELSE CAST(COUNT(*) - 1 AS DOUBLE) / CAST(SUM(dist) AS DOUBLE)
        |    END, 6) AS closeness
        |FROM md GROUP BY seed ORDER BY seed""".stripMargin,
    // frontier expansion bounded at 3 hops, MIN(dist) = BFS level
    "graph_paths" ->
      """WITH RECURSIVE pairs AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o.o_custkey AS src,
        |                  's' || l.l_suppkey AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS MATERIALIZED (SELECT src, dst FROM pairs
        |          UNION ALL SELECT dst, src FROM pairs),
        |walk(node, dist) AS (
        |  SELECT 'c1', 0
        |  UNION
        |  SELECT e.dst, w.dist + 1
        |  FROM edges e JOIN walk w ON e.src = w.node
        |  WHERE w.dist < 3)
        |SELECT node, CAST(MIN(dist) AS INT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
    "graph_degree" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o.o_custkey AS src,
        |                  's' || l.l_suppkey AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS MATERIALIZED (SELECT src, dst FROM pairs
        |          UNION ALL SELECT dst, src FROM pairs),
        |deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)
        |SELECT substr(src, 1, 1) AS kind, outdeg,
        |  COUNT(*) AS n_nodes
        |FROM deg GROUP BY 1, 2 ORDER BY kind, outdeg""".stripMargin)
}
