package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative PageRank, quirk-faithful to the reference
  * (`assignment1/part3/task1/task1.py`) — see SURVEY.md §2.14:
  *
  *  - ranks init to 1.0 per *source* node (`task1.py:37`), not 1/N;
  *  - contribution = rank/deg to each neighbor, with duplicate edges
  *    counted at their multiplicity (`groupByKey` keeps duplicates);
  *  - new rank = 0.15 + 0.85·Σ contributions (`task1.py:52`);
  *  - after each iteration the rank vector is keyed by contribution
  *    *receivers* only: a node with out-edges but no in-edges
  *    contributes once and then drops out (inner `links.join(ranks)`
  *    at `task1.py:51`); pure-destination nodes accumulate rank but
  *    never contribute; dangling mass is lost, not redistributed;
  *  - 10 fixed iterations, no convergence test.
  *
  * Spark-first rendering: the adjacency list is never materialized as
  * arrays — edges stay flat and degrees are a count, so the widest row
  * is O(1) regardless of a node's fan-out (the 100 TB-safe shape; the
  * reference's `groupByKey` would OOM on a celebrity node). Loop
  * invariants (`edges`, `degrees`) are cached (C2, `task3/task3.py:37`)
  * and each iteration ends in `localCheckpoint` to truncate the
  * 10-deep lineage (C3, the task4 fault-tolerance experiment).
  */
object PageRank {

  /** Parse SNAP-format edge lines: tab-separated `src\tdst`,
    * `#`-comments skipped (`task1.py:28-30`). Node IDs stay strings,
    * exactly like the reference (never cast to int). */
  def parseEdgeLines(raw: DataFrame): DataFrame =
    raw.filter(!col("value").startsWith("#"))
      .select(
        split(col("value"), "\t").getItem(0).as("src"),
        split(col("value"), "\t").getItem(1).as("dst"))

  /** The iterative core. `edges(src, dst)` of any key type.
    *
    * `numPartitions > 0` reproduces the reference's partition-sweep
    * experiment (C1, `task2/task2.py:36` — `groupByKey().repartition(n)`
    * swept over {10,50,100,200,300}): the loop-invariant edge relation
    * is hash-repartitioned on `src`, which also co-locates the
    * per-iteration `edges ⋈ ranks` probe. Results are partition-count
    * invariant (PageRankSpec pins this) — only shuffle layout changes.
    *
    * Lineage is truncated every 3rd iteration rather than every one:
    * each eager `localCheckpoint` is a full materialization job, and
    * a 3-deep join/agg lineage replans cheaply — same recompute-bound
    * idea as C3, a third of the checkpoint cost. */
  /** Broadcast ceiling for the per-iteration rank vector. A rank row
    * is a key + a double (~24 B serialized): 4M nodes ≈ 100 MB
    * broadcast — a safe per-executor footprint. Under the ceiling,
    * shipping the vector beats shuffling the (much larger) edge
    * relation into a sort-merge join ×10 iterations; past it (the
    * billion-node graphs a 100 TB corpus implies) the broadcast would
    * be a 10×-repeated driver round-trip that eventually fails
    * outright, so the loop falls back to the shuffle join. */
  val BroadcastMaxNodes = 4000000L

  /** The broadcast decision: one count of distinct endpoints over the
    * (persisted) edge relation — an upper bound on every iteration's
    * rank-vector size (the init vector is src-keyed, later ones
    * dst-keyed). localCheckpoint leaves ranks with an unknown size
    * estimate, so Catalyst/AQE can't make this call on its own. */
  private[graft] def chooseBroadcast(e: DataFrame): Boolean =
    e.select(col("src").as("n")).unionByName(e.select(col("dst").as("n")))
      .distinct().count() <= BroadcastMaxNodes

  /** `broadcastRanks`: None (default) size-gates per [[chooseBroadcast]];
    * Some(b) forces the choice (spec bracketing). */
  def run(edges: DataFrame, iterations: Int = 10, numPartitions: Int = 0,
      broadcastRanks: Option[Boolean] = None): DataFrame = {
    val laidOut =
      if (numPartitions > 0) edges.repartition(numPartitions, col("src"))
      else edges
    val e = laidOut.persist()
    val doBroadcast = broadcastRanks.getOrElse(chooseBroadcast(e))
    val degrees = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // the edges ⋈ degrees join is loop-invariant: materialize it once
    // instead of recomputing it in all 10 iterations. In the broadcast
    // regime, materialize it PARTITIONED BY dst: the broadcast join
    // streams the edge side unchanged, so the per-iteration
    // groupBy(dst) finds its distribution already satisfied — the
    // loop runs 10 iterations with ZERO shuffles (one up-front
    // exchange replaces 10 per-iteration ones). In the shuffle-join
    // regime the join itself re-keys by src, so dst-layout would just
    // add a wasted exchange.
    val withDegRaw = e.join(degrees, "src")
      .select(col("src"), col("dst"), col("deg"))
    // honor the C1 sweep parameter in both regimes: under broadcast the
    // layout key switches to dst but the requested partition COUNT must
    // survive, or the sweep would silently exercise identical layouts
    val withDeg = (if (doBroadcast) {
      if (numPartitions > 0) withDegRaw.repartition(numPartitions, col("dst"))
      else withDegRaw.repartition(col("dst"))
    } else withDegRaw).persist()
    var ranks = withDeg.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1.0).as("pr"))
    for (i <- 1 to iterations) {
      val rankSide = if (doBroadcast) broadcast(ranks) else ranks
      val contribs = withDeg
        .join(rankSide, col("src") === col("node"))
        .select(col("dst"), (col("pr") / col("deg")).as("contrib"))
      ranks = contribs.groupBy(col("dst"))
        .agg((lit(0.15) + lit(0.85) * sum(col("contrib"))).as("pr"))
        .select(col("dst").as("node"), col("pr"))
      // freshLeaf: localCheckpoint preserves the source plan's stats
      // estimate into the LogicalRDD; resetting it keeps iteration
      // plans' estimates O(1)-sized (see GraftColumnBridge.freshLeaf)
      if (i % 3 == 0 || i == iterations)
        ranks = org.apache.spark.sql.GraftColumnBridge.freshLeaf(ranks.localCheckpoint())
    }
    // ranks is checkpointed (no lineage back to the invariants) —
    // release them instead of leaking cache entries per run
    e.unpersist()
    withDeg.unpersist()
    ranks
  }

  /** Textbook PageRank — the variant SURVEY §2.14 documents alongside
    * the quirk-faithful [[run]] (standard formulation, e.g. the
    * original Brin/Page paper): ranks init to 1/N over the FULL node
    * set (sources ∪ sinks); every node is keyed every iteration;
    * dangling (no-out-edge) mass is redistributed uniformly:
    * pr' = 0.15/N + 0.85·(Σ contribs + danglingMass/N), so total mass
    * is conserved at 1.0 per iteration. Same scale shape as [[run]]:
    * flat edges, O(1) rows, invariants persisted, lineage cut every
    * 3rd iteration; the dangling mass flows back as a 1-row broadcast,
    * never a collect. */
  def runTextbook(edges: DataFrame, iterations: Int = 10): DataFrame = {
    val e = edges.persist()
    val degrees = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    // the 1/N init needs |nodes| anyway, and it equals chooseBroadcast's
    // endpoint bound — one count serves both (no second distinct job)
    val n = nodes.count().toDouble
    val doBroadcast = n <= BroadcastMaxNodes
    // same dst-layout rule as [[run]]: under broadcast the streamed
    // edge side carries its partitioning through the join, so the
    // per-iteration contribs agg shuffles nothing
    val withDegRaw = e.join(degrees, "src")
      .select(col("src"), col("dst"), col("deg"))
    val withDeg =
      (if (doBroadcast) withDegRaw.repartition(col("dst")) else withDegRaw).persist()
    // sinks: nodes with no out-edges; their rank mass would otherwise
    // leak (the quirk variant deliberately loses it)
    val dangling = nodes.join(
      degrees.select(col("src").as("node")), Seq("node"), "left_anti").persist()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    for (i <- 1 to iterations) {
      val rankSide = if (doBroadcast) broadcast(ranks) else ranks
      val contribs = withDeg
        .join(rankSide, col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("pr") / col("deg")).as("c"))
      // rankSide, not ranks: under broadcast the dangling-mass probe
      // would otherwise plan a fresh two-sided shuffle join on node
      // every iteration (the checkpointed ranks has no size estimate,
      // so Catalyst can't choose broadcast on its own)
      val dm = dangling.join(rankSide, "node")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
      val contribSide = if (doBroadcast) broadcast(contribs) else contribs
      ranks = nodes
        .join(contribSide, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dm))
        .select(col("node"),
          (lit(0.15 / n) + lit(0.85) *
            (coalesce(col("c"), lit(0.0)) + col("dm") / lit(n))).as("pr"))
      // unlike the quirk loop (one consumer per iteration → checkpoint
      // every 3rd), ranks here feeds TWO consumers next iteration
      // (contribs and the dangling-mass aggregate): left lazy, the
      // shared subplan re-executes per consumer and the plan fans out
      // ~2^k between checkpoints (measured 18 s vs ~7 s at sf0.1), so
      // materialize every iteration. freshLeaf because the 2-consumer
      // shape also DOUBLES the checkpoint-inherited stats estimate per
      // iteration (see GraftColumnBridge.freshLeaf).
      ranks = org.apache.spark.sql.GraftColumnBridge.freshLeaf(ranks.localCheckpoint())
    }
    e.unpersist(); withDeg.unpersist(); nodes.unpersist(); dangling.unpersist()
    ranks
  }

  /** Personalized PageRank (r5 wave 14; Haveliwala WWW 2002, the
    * Page et al. personalization vector): the textbook loop with
    * teleport mass concentrated on ONE seed node — restart probability
    * 0.15 returns to the seed, and dangling mass restarts there too,
    * so the stationary distribution ranks the graph BY PROXIMITY TO
    * THE SEED (on the directed customer→supplier star this is the
    * seed customer's supplier-affinity profile). Same scale mechanics
    * as [[runTextbook]]: invariants persisted, size-gated rank
    * broadcast, per-iteration lineage cut with stats reset; the seed
    * indicator is a pure column expression — no extra join, no
    * collect. */
  def runPersonalized(edges: DataFrame, seed: Long, iterations: Int = 10): DataFrame = {
    val e = edges.persist()
    val degrees = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().persist()
    val doBroadcast = nodes.count() <= BroadcastMaxNodes
    val withDegRaw = e.join(degrees, "src")
      .select(col("src"), col("dst"), col("deg"))
    val withDeg =
      (if (doBroadcast) withDegRaw.repartition(col("dst")) else withDegRaw).persist()
    val dangling = nodes.join(
      degrees.select(col("src").as("node")), Seq("node"), "left_anti").persist()
    def seedInd(c: org.apache.spark.sql.Column) =
      when(c === seed, lit(1.0)).otherwise(lit(0.0))
    var ranks = nodes.select(col("node"), seedInd(col("node")).as("pr"))
    for (_ <- 1 to iterations) {
      val rankSide = if (doBroadcast) broadcast(ranks) else ranks
      val contribs = withDeg
        .join(rankSide, col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("pr") / col("deg")).as("c"))
      val dm = dangling.join(rankSide, "node")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
      val contribSide = if (doBroadcast) broadcast(contribs) else contribs
      // same two-consumer materialize-every-iteration rule as
      // runTextbook (contribs + dangling both read ranks)
      ranks = org.apache.spark.sql.GraftColumnBridge.freshLeaf(nodes
        .join(contribSide, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dm))
        .select(col("node"),
          (lit(0.15) * seedInd(col("node")) + lit(0.85) *
            (coalesce(col("c"), lit(0.0)) + col("dm") * seedInd(col("node")))).as("pr"))
        .localCheckpoint())
    }
    e.unpersist(); withDeg.unpersist(); nodes.unpersist(); dangling.unpersist()
    ranks
  }

  /** Deterministic edge table derived from the star schema: each
    * (order, lineitem) pair yields customer→supplier and
    * supplier→customer edges (supplier keys offset into a disjoint ID
    * space). Multiplicities are real — a customer ordering 5 items
    * from a supplier contributes 5 parallel edges, which is exactly
    * the duplicate-edge quirk the reference preserves. */
  def starEdges(s: SparkSession, d: String): DataFrame = {
    val ol = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), (col("l_suppkey") + 10000000L).as("supp"))
    ol.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(ol.select(col("supp").as("src"), col("cust").as("dst")))
  }

  /** One-directional star edges (customer→supplier only): suppliers
    * become pure sinks with NO out-edges — the graph shape that
    * actually exercises the textbook variant's dangling-mass
    * redistribution (the symmetric [[starEdges]] graph has none). */
  def starEdgesDirected(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))

  def pagerank(s: SparkSession, d: String): DataFrame =
    run(starEdges(s, d), 10)
      .select(col("node"), round(col("pr"), 6).as("pr"))
      .orderBy(col("node"))

  /** Graph profile (the first thing run before any iterative graph
    * job): out-degree histogram of the symmetric star graph — how many
    * nodes have each degree, with parallel edges counted (the real
    * shuffle volume per PageRank iteration is Σ degree). One groupBy
    * chain, two shuffles; at any scale this is the skew-detection
    * input that decides broadcast vs salting for the iteration loop. */
  def degreeHist(s: SparkSession, d: String): DataFrame =
    starEdges(s, d)
      .groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))

  def pagerankTextbook(s: SparkSession, d: String): DataFrame =
    runTextbook(starEdgesDirected(s, d), 10)
      .select(col("node"), round(col("pr"), 6).as("pr"))
      .orderBy(col("node"))

  /** The reference's own input format end-to-end (`task1.py:26-54`):
    * SNAP text lines `src\tdst` plus a `#` comment header, parsed by
    * [[parseEdgeLines]] — node IDs stay STRINGS through the whole loop
    * exactly like the reference. The lines are rendered from the star
    * schema so the DuckDB oracle can rebuild the identical graph. */
  def pagerankSnap(s: SparkSession, d: String): DataFrame = {
    val lines = starEdges(s, d)
      .select(concat_ws("\t", col("src"), col("dst")).as("value"))
    val header = s.range(1).select(lit("# FromNodeId\tToNodeId").as("value"))
    run(parseEdgeLines(header.unionByName(lines)), 10)
      .select(col("node"), round(col("pr"), 6).as("pr"))
      .orderBy(col("node"))
  }

  /** Seed = customer node 1 (present at every SF). */
  def pagerankPersonalized(s: SparkSession, d: String): DataFrame =
    runPersonalized(starEdgesDirected(s, d), seed = 1L, 10)
      .select(col("node"), round(col("pr"), 6).as("pr"))
      .orderBy(col("node"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> pagerank,
    "q_pagerank_textbook" -> pagerankTextbook,
    "q_pagerank_personalized" -> pagerankPersonalized,
    "q_pagerank_snap" -> pagerankSnap,
    "q_degree_hist" -> degreeHist,
  )

  private val symEdgesSql =
    """SELECT o_custkey AS src, l_suppkey + 10000000 AS dst
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       UNION ALL
       SELECT l_suppkey + 10000000 AS src, o_custkey AS dst
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""

  /** DuckDB oracle: the 10-iteration quirk loop unrolled into a CTE
    * chain — same init, same inner-join dropout, same damping.
    * `edgesSql` parameterizes the key type (BIGINT star keys vs the
    * VARCHAR keys of the SNAP-text rendering). */
  private def quirkOracle(edgesSql: String): String = {
    val base =
      s"""WITH edges AS MATERIALIZED ($edgesSql),
         degrees AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         r0 AS (SELECT src AS node, 1.0 AS pr FROM degrees)"""
    val iters = (1 to 10).map { i =>
      s""", r$i AS (
           SELECT e.dst AS node, 0.15 + 0.85 * sum(r.pr / d.deg) AS pr
           FROM edges e JOIN degrees d ON e.src = d.src
           JOIN r${i - 1} r ON e.src = r.node
           GROUP BY e.dst)"""
    }.mkString
    base + iters + " SELECT node, round(pr, 6) AS pr FROM r10 ORDER BY node"
  }

  /** Textbook oracle: 1/N init over all nodes, per-iteration dangling
    * mass (`dm_i`) redistributed uniformly, LEFT JOIN keeps every node.
    * Double literals written `…e0` — a bare `0.15` is DECIMAL in
    * DuckDB and would poison the IEEE parity with Spark's doubles.
    * Base CTEs are MATERIALIZED: DuckDB otherwise inlines them into
    * every one of the 10 unrolled iterations, re-opening the parquet
    * per reference until the file-handle limit blows. */
  private val textbookOracle: String = {
    val base =
      """WITH edges AS MATERIALIZED (
           SELECT o_custkey AS src, l_suppkey + 10000000 AS dst
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         degrees AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         nodes AS MATERIALIZED (SELECT DISTINCT node FROM
           (SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges)),
         nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         r0 AS (SELECT node, 1.0e0 / nn.n AS pr FROM nodes CROSS JOIN nn)"""
    // every per-iteration CTE is MATERIALIZED: r_{i-1} is referenced
    // TWICE per level (contribution + dangling mass), so DuckDB's
    // default inlining expands the chain ~2^10-fold — at sf1 the
    // un-materialized form deterministically exhausted 67 GB of spill
    // (r8 full-surface gate finding); materialization makes the
    // unroll linear, values unchanged
    val iters = (1 to 10).map { i =>
      s""", c$i AS MATERIALIZED (
           SELECT e.dst AS node, sum(r.pr / d.deg) AS c
           FROM edges e JOIN degrees d ON e.src = d.src
           JOIN r${i - 1} r ON e.src = r.node
           GROUP BY e.dst),
         dm$i AS MATERIALIZED (
           SELECT coalesce(sum(r.pr), 0.0e0) AS dm
           FROM r${i - 1} r LEFT JOIN degrees d ON r.node = d.src
           WHERE d.src IS NULL),
         r$i AS MATERIALIZED (
           SELECT nd.node, 0.15e0 / nn.n + 0.85e0 * (coalesce(c.c, 0.0e0) + dm.dm / nn.n) AS pr
           FROM nodes nd LEFT JOIN c$i c ON nd.node = c.node
           CROSS JOIN dm$i dm CROSS JOIN nn)"""
    }.mkString
    base + iters + " SELECT node, round(pr, 6) AS pr FROM r10 ORDER BY node"
  }

  /** Personalized oracle: the textbook unroll with the teleport (and
    * dangling restart) concentrated on the seed via a CASE indicator —
    * same e0 double literals, same MATERIALIZED base CTEs. */
  private val personalizedOracle: String = {
    val ind = "CASE WHEN nd.node = 1 THEN 1.0e0 ELSE 0.0e0 END"
    val base =
      """WITH edges AS MATERIALIZED (
           SELECT o_custkey AS src, l_suppkey + 10000000 AS dst
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         degrees AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         nodes AS MATERIALIZED (SELECT DISTINCT node FROM
           (SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges)),
         r0 AS (SELECT node, CASE WHEN node = 1 THEN 1.0e0 ELSE 0.0e0 END AS pr FROM nodes)"""
    // MATERIALIZED per-iteration CTEs — same double-reference
    // inlining blowup as textbookOracle (see there)
    val iters = (1 to 10).map { i =>
      s""", c$i AS MATERIALIZED (
           SELECT e.dst AS node, sum(r.pr / d.deg) AS c
           FROM edges e JOIN degrees d ON e.src = d.src
           JOIN r${i - 1} r ON e.src = r.node
           GROUP BY e.dst),
         dm$i AS MATERIALIZED (
           SELECT coalesce(sum(r.pr), 0.0e0) AS dm
           FROM r${i - 1} r LEFT JOIN degrees d ON r.node = d.src
           WHERE d.src IS NULL),
         r$i AS MATERIALIZED (
           SELECT nd.node, 0.15e0 * ($ind) + 0.85e0 * (coalesce(c.c, 0.0e0) + dm.dm * ($ind)) AS pr
           FROM nodes nd LEFT JOIN c$i c ON nd.node = c.node
           CROSS JOIN dm$i dm)"""
    }.mkString
    base + iters + " SELECT node, round(pr, 6) AS pr FROM r10 ORDER BY node"
  }

  val oracles: Map[String, String] = Map(
    "q_pagerank_personalized" -> personalizedOracle,
    "q_degree_hist" -> s"""WITH edges AS ($symEdgesSql),
         deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY src)
         SELECT degree, count(*) AS n_nodes FROM deg
         GROUP BY degree ORDER BY degree""",
    "q_pagerank" -> quirkOracle(symEdgesSql),
    "q_pagerank_textbook" -> textbookOracle,
    // identical graph, VARCHAR node ids (the SNAP parse keeps strings)
    "q_pagerank_snap" -> quirkOracle(
      """SELECT CAST(o_custkey AS VARCHAR) AS src,
                CAST(l_suppkey + 10000000 AS VARCHAR) AS dst
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         UNION ALL
         SELECT CAST(l_suppkey + 10000000 AS VARCHAR) AS src,
                CAST(o_custkey AS VARCHAR) AS dst
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""),
  )
}
