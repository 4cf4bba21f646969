package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Graph-centrality analytics over relational data (SURVEY.md §2.K
  * extension family). `dedup_cluster` already covers connected
  * components (min-label propagation + a GraphX Pregel twin); this
  * module adds the SCORING side of graph analytics — PageRank over a
  * graph derived from the fact tables — the other workhorse iterative
  * dataflow (PageRank is the canonical example in both the Pregel and
  * the Spark papers).
  */
object GraphOps {

  private val Scale = 1000000000000L // 1e12 fixed-point for rank mass

  /** Persisted edge aggregate for [[graphPagerankUnrolled]] only (the
    * declared `graph_pagerank` needs no cache — its single collect_list
    * consumer reads the aggregate once). Tiny (≤|nations|² rows).
    * Keyed by the FACT TABLES' [[MinHashDedup.corpusFingerprint]]
    * (ADVICE r11: a corpus rewritten in place at the same path must
    * not be served a stale edge aggregate — the cachedNgramPairs
    * discipline); stale fingerprints evict on the next access.
    * Lifecycle follows [[MinHashDedup.evictStale]]: every access sweeps
    * stopped-session entries, and unpersist is best-effort — on a
    * stopped SparkContext it can throw, but the entry REMOVAL is what
    * releases the reference (the stopped session's storage is already
    * gone), so neither the sweep nor `Lake.clearCaches` may abort on it.
    */
  private val unrolledEdgeCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String), DataFrame]()

  /** The graph's upstream tables — the fingerprint scope. */
  private val EdgeTables =
    Seq("lineitem", "orders", "customer", "supplier")

  private[graft] def clearUnrolledEdgeCache(): Int = {
    val n = unrolledEdgeCache.size()
    unrolledEdgeCache.values().forEach(df =>
      try df.unpersist() catch { case _: Throwable => })
    unrolledEdgeCache.clear()
    n
  }

  /** `graph_pagerank` — weighted PageRank over the nation-level trade
    * graph: an edge u→v with weight w means suppliers in nation u
    * shipped w lineitems to customers in nation v
    * (lineitem ⋈ orders ⋈ customer ⋈ supplier, aggregated to nation
    * pairs). Damping d = 0.85, `iters` fixed power iterations,
    * dangling mass (nations with no outgoing shipments — real at
    * sf0.001, where only 10 of 25 nations have suppliers)
    * redistributed uniformly each step, the standard correction.
    *
    * Scale shape: the ONLY corpus-sized work is the edge aggregation —
    * three keyed joins and a partial+final count that collapses to at
    * most |nations|² = 625 rows before its exchange; that part is
    * fully distributed and is what 100 TB of lineitem actually costs.
    * The graph itself is NODE-BOUNDED BY CONSTRUCTION (nation-level:
    * ≤625 edges at any corpus size), so the power iterations run
    * in-task over the collected edge aggregate — one collect_list
    * row, one exact BigInt solve — rather than as ~50 distributed
    * micro-stages over 625 rows (measured 12 s of pure stage/AQE
    * latency for the relational unrolling at sf0.1, vs ~2 s total
    * this way; the same bounded-state argument as sample_weighted's
    * superbucket fold). For a graph that does NOT fit one task (e.g.
    * customer-level), [[graphPagerankUnrolled]] below is the
    * distributed formulation of the same arithmetic — ReusedExchange
    * collapses its 5 unrolled edge subtrees to one scan — and
    * GraphMixSpec asserts the two produce bit-identical ranks.
    *
    * Determinism (SURVEY §5.3): NO floating point anywhere in the
    * iteration. Rank mass is a 1e12-scaled BIGINT; the out-degree
    * ratio is the exact integer `(w·1e12) DIV out`; per-edge
    * contributions multiply in BigInt (HUGEINT in the DuckDB oracle —
    * the simsearch_hybrid_lsh wide-integer technique) and floor-divide
    * back to scale; sums are exact integer sums — order-independent,
    * unlike double accumulation. The only double in the output is the
    * final `p / 1e12` display division of an exact integer.
    */
  def graphPagerank(spark: SparkSession, sfDir: String,
      iters: Int = 5): DataFrame = {
    val nations = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long").as("v"), col("n_name"))
    val edges = edgeAgg(spark, sfDir)
    val prUdf = udf((es: Seq[org.apache.spark.sql.Row], vs: Seq[Long]) =>
      solvePagerank(
        es.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))), vs, iters))
    val g = edges
      .agg(collect_list(struct(col("u"), col("dst"), col("w"))).as("es"))
    val ns = nations.agg(sort_array(collect_list(col("v"))).as("ns"))
    g.crossJoin(broadcast(ns))
      .select(explode(prUdf(col("es"), col("ns"))).as("pr"))
      .select(col("pr._1").as("v"), col("pr._2").as("p"))
      .join(broadcast(nations), "v")
      .select(col("n_name").as("nation"), col("p").as("pr_fp"),
        round(col("p").cast("double") / lit(Scale.toDouble), 9)
          .as("pagerank"))
      .orderBy(col("pr_fp").desc, col("nation").asc)
  }

  /** The distributed heavy pass shared by both formulations: the
    * corpus-sized 3-way join aggregated to nation-pair edge weights.
    */
  private def edgeAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").cast("long").as("u"),
        col("c_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))

  /** The in-task exact solve: same 1e12-scaled integer arithmetic as
    * the DuckDB oracle and [[graphPagerankUnrolled]] (BigInt products
    * where they use HUGEINT/DECIMAL(38,0); all operands non-negative
    * so truncating and flooring division agree).
    */
  private[graft] def solvePagerank(edges: Seq[(Long, Long, Long)],
      nodes: Seq[Long], iters: Int): Seq[(Long, Long)] = {
    val S = BigInt(Scale)
    val n = BigInt(nodes.size)
    val out = edges.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => BigInt(e._3)).sum
    }
    val ratio = edges.map { case (u, v, w) => (u, v, BigInt(w) * S / out(u)) }
    var p: Map[Long, BigInt] = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val s = scala.collection.mutable.Map[Long, BigInt]()
      ratio.foreach { case (u, v, r) =>
        s(v) = s.getOrElse(v, BigInt(0)) + p(u) * r / S
      }
      val dm = p.iterator.collect { case (u, pu) if !out.contains(u) => pu }
        .foldLeft(BigInt(0))(_ + _)
      p = nodes.map(v => v -> ((BigInt(15) * S / 100) / n +
        BigInt(85) * (s.getOrElse(v, BigInt(0)) + dm / n) / 100)).toMap
    }
    nodes.map(v => v -> p(v).toLong)
  }

  /** The fully relational formulation: 5 power iterations UNROLLED as
    * tiny keyed joins — the scale path for graphs too large for one
    * task, declared as `graph_pagerank_dist` and driver-gated on the
    * SAME oracle SQL as [[graphPagerank]] (the join_asof_split
    * precedent). Identical integer arithmetic to [[graphPagerank]]
    * (spec-asserted bit-equal); its per-iteration edge/out-degree
    * subtrees canonicalize identically and collapse to
    * ReusedExchange, so the fact tables are scanned once.
    *
    * Cost attribution (VERDICT r12 #3, measured by
    * PagerankAttribution): the r12 form ran ~56 jobs/56 stages/100
    * tasks PER CALL — each eager localCheckpoint plus every AQE query
    * stage materialized as its own one-stage job, pure fixed
    * scheduler/codegen overhead on ≤25-row iterates (the edge-cache
    * build itself is ~5 jobs). Since no iterate ever needs runtime
    * re-planning (all sides are ≤|nations|² and explicitly
    * broadcast-hinted), the iterations now plan on a CLONED session
    * (the replayMonitor discipline — nothing leaks to the caller's
    * session) with AQE off and shuffle.partitions=1: static plans,
    * 34 jobs per call (measured; the remainder are the per-iteration
    * broadcast collects + one checkpoint job each — inherently
    * sequential dataflow), same bits. Warm-edge-cache wall at sf0.1
    * (local[4] probe): 3.3 s → 3.1 s; cold 19.2 s → 14.0 s. The two
    * obvious "simpler" forms measured WORSE and are rejected with
    * numbers: lazy chain without intermediate checkpoints 8.1 s warm
    * (3-consumer lineage fan-out re-executes iterates even under
    * static planning), no-broadcast 1-partition SMJ 4.9 s warm (the
    * shuffle stages serialize inside the checkpoint job without
    * removing its barrier). ~0.6 s/iteration of scheduler floor is
    * the cost of the distributed formulation on a dust-sized graph —
    * it is iteration-fixed, not corpus-proportional; the corpus-sized
    * edge build runs on the CALLER's session with full parallelism.
    * The edge aggregate still caches in the SparkContext-shared cache
    * manager, so any session's plans resolve onto the one
    * InMemoryRelation. At a node count where the iterates stop being
    * dust, the clone's two settings are the knobs to revisit — AQE's
    * skew handling starts paying for itself once an iterate outgrows
    * one partition.
    */
  def graphPagerankUnrolled(spark: SparkSession, sfDir: String,
      iters: Int = 5): DataFrame = {
    // Execute under the clone, hand back a CALLER-session local
    // relation (review finding r13): Dataset ops execute under the
    // LEFT frame's session, so returning the clone-bound frame would
    // silently plan a consumer's downstream join with AQE off and one
    // shuffle partition. The result is |nations| rows — the rebind is
    // the stream_*_ok collect class. Plan-shape specs read the
    // clone-bound frame via [[graphPagerankUnrolledPlan]].
    val p = graphPagerankUnrolledPlan(spark, sfDir, iters)
    spark.createDataFrame(p.collectAsList(), p.schema)
  }

  /** The clone-bound executable plan behind [[graphPagerankUnrolled]]
    * (GraphMixSpec pins its one-cached-edge-aggregate shape here).
    */
  private[graft] def graphPagerankUnrolledPlan(spark: SparkSession,
      sfDir: String, iters: Int = 5): DataFrame = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    val nations = Tables.nation(s, sfDir)
      .select(col("n_nationkey").as("v"), col("n_name"))
    val nn = Tables.nation(s, sfDir)
      .agg(count(lit(1)).as("nn"))
    // Fresh subtrees per use (defs, not vals): reusing one DataFrame
    // instance across the unrolled iterations trips Spark's dataset-id
    // self-join ambiguity check (only name-based joins below keep the
    // references resolvable). ReusedExchange collapses the identical
    // shuffle subtrees, but AQE's broadcast conversions re-derive the
    // edge aggregate under BroadcastExchange shapes — so the graph-
    // sized aggregate is additionally registered in the cache manager
    // (the dedup_cluster treatment): every fresh subtree canonicalizes
    // onto ONE InMemoryRelation and the fact tables are scanned once
    // regardless of iteration count. Storage release is
    // [[clearUnrolledEdgeCache]] / `Lake.clearCaches` (the memo
    // discipline); the entry itself is ≤625 rows.
    val fp = MinHashDedup.corpusFingerprint(spark, sfDir, EdgeTables)
    def edgesF(): DataFrame = {
      MinHashDedup.evictStale(unrolledEdgeCache,
        (k: (SparkSession, String, String)) =>
          k._1 == spark && k._2 == sfDir && k._3 != fp,
        (k: (SparkSession, String, String)) => k._1)
      unrolledEdgeCache.computeIfAbsent((spark, sfDir, fp), _ => {
        val e = edgeAgg(spark, sfDir).persist()
        // materialize NOW (bench r12): the unrolled plan has ~20 AQE
        // query stages all reading this relation, and a LAZY cache lets
        // the early stages race its population — each racer recomputes
        // the corpus-sized 3-way join (measured 325 s of task time at
        // sf0.1 vs ~1 s for one build). One eager count = one build.
        e.count()
        e
      })
    }
    def outsF(): DataFrame =
      edgesF().groupBy(col("u")).agg(sum(col("w")).as("outw"))
    def ratioF(): DataFrame = edgesF().join(outsF(), "u")
      .select(col("u"), col("dst"),
        expr(s"(CAST(w AS DECIMAL(38,0)) * ${Scale}L) DIV outw").as("r"))

    def step(p: DataFrame): DataFrame = {
      // broadcast hints: every join side here is ≤|nodes|² rows, and an
      // explicit hint skips the shuffle exchange AQE would first plan
      // then convert — fewer sequential query stages per iteration
      val contrib = broadcast(p.select(col("v").as("u"), col("p")))
        .join(ratioF(), Seq("u"))
        .select(col("dst").as("vc"),
          expr(s"(CAST(p AS DECIMAL(38,0)) * r) DIV ${Scale}L").as("c"))
        .groupBy(col("vc")).agg(sum(col("c")).as("s"))
      val dangling = p.select(col("v").as("u"), col("p"))
        .join(broadcast(outsF().select(col("u"))), Seq("u"), "left_anti")
        .agg(coalesce(sum(col("p")), lit(0L)).as("dm"))
      p.select(col("v"), col("nn"))
        .join(broadcast(contrib), col("v") === col("vc"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("v"), col("nn"),
          expr(s"((15 * ${Scale}L) DIV 100) DIV nn" +
            " + (85 * (coalesce(s, 0L) + dm DIV nn)) DIV 100").as("p"))
    }

    // Each iterate is consumed THREE times (contrib, dangling, carry) —
    // under different prunings, so its exchanges don't canonicalize to
    // one reuse and a lazy chain re-plans p_{i-1} per consumer: ~3^i
    // micro-stage fan-out (measured ~20 s of pure AQE stage latency at
    // sf0.1). Eagerly localCheckpoint each ≤|nodes|-row iterate (the
    // dedup_cluster lineage-bounding treatment; what Pregel's superstep
    // barrier does) — one dust-sized job per iteration, linear total.
    // (the LAST iterate stays lazy so the returned plan is one real
    // step over the cached edge aggregate — spec-pinned shape)
    val p0 = nations.select(col("v")).crossJoin(broadcast(nn))
      .select(col("v"), col("nn"), expr(s"${Scale}L DIV nn").as("p"))
      .localCheckpoint(true)
    val pN = (1 to iters).foldLeft(p0)((p, i) =>
      if (i == iters) step(p) else step(p).localCheckpoint(true))
    pN.join(broadcast(nations), "v")
      .select(col("n_name").as("nation"), col("p").as("pr_fp"),
        round(col("p").cast("double") / lit(Scale.toDouble), 9)
          .as("pagerank"))
      .orderBy(col("pr_fp").desc, col("nation").asc)
  }

  /** `graph_triangles` — triangle enumeration over the part
    * CO-PURCHASE graph (parts co-ordered in ≥ `minCo` lineitem pairs —
    * the market-basket graph; triangles are its clustering signal),
    * via DEGREE-ORIENTED wedge counting: the MapReduce triangle
    * algorithm of Suri & Vassilvitskii (WWW'11) / Cohen's graph-twiddling
    * family. Each undirected edge orients from its lower-(degree, id)
    * endpoint to the higher; wedges form by self-joining oriented
    * edges on their SOURCE, and a wedge closes into a triangle iff its
    * two endpoints are themselves an edge — a keyed equi-join against
    * the undirected edge set. Every triangle is found exactly once (at
    * its lowest-degree corner) and emitted with its ids sorted.
    *
    * Why orientation matters at 100 TB: wedge count under degree
    * orientation is Σ outdeg² ≤ O(m^1.5) — a hub of degree d generates
    * ZERO wedges at the hub (all its edges point outward-by-degree
    * elsewhere... inward), vs d²/2 for the naive u<v orientation. The
    * oracle runs the naive 3-way self-join (fine at fixture edge
    * counts); the Spark side is the formulation that survives skew.
    * Every stage is a keyed shuffle: same-order pairs come from ONE
    * l_orderkey-keyed collect (≤7 lineitems per TPC-H order → ≤21
    * row-local pairs per key — one scan + one exchange, vs the
    * self-join formulation's two scans and two sort-merge sides,
    * measured 2× the task time at sf0.1), edge agg on (u,v), degrees
    * on endpoint, wedge join on the source, closing join on the
    * endpoint pair.
    */
  def graphTriangles(spark: SparkSession, sfDir: String,
      minCo: Long = 2L): DataFrame =
    triangleEnum(cachedCoPurchaseEdges(spark, sfDir, minCo))

  /** [[graphTriangles]] over any (ok, pk) basket frame. */
  def triangleCoPurchase(li: DataFrame, minCo: Long): DataFrame =
    triangleEnum(coPurchaseEdges(li, minCo))

  /** The co-purchase edge aggregation shared by `graph_triangles` and
    * `graph_cc` — positional i<j pairs over the sorted per-order part
    * list = the a.pk < b.pk row-pair multiset (equal-part pairs
    * filtered), kept iff co-purchased in ≥ minCo orders. The edge set
    * is graph-sized (thousands of rows) but its lineage is a corpus
    * pass, and the consumers read it repeatedly (triangleEnum four
    * times; ccEnum once per propagation round) — an eager cut makes
    * the corpus pay once (the pagerank_dist lesson: 4 recomputations
    * measured as 3.4 s wall / 19 s task time here).
    */
  private[graft] def coPurchaseEdges(li: DataFrame,
      minCo: Long): DataFrame =
    li.groupBy(col("ok"))
      .agg(sort_array(collect_list(col("pk"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |    y -> named_struct('u', x, 'v', y))))""".stripMargin))
        .as("p"))
      .filter(col("p.u") < col("p.v"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
      .select(col("u"), col("v"), col("co"))
      .localCheckpoint(true)

  /** Per-process memo of the co-purchase edge aggregate — TWO declared
    * queries (`graph_triangles`, `graph_cc`) are views of the one
    * localCheckpoint'd edge artifact, so the second consumer must not
    * re-pay the corpus pass (the BpeTrain/lm-memo discipline). Keyed
    * on the lineitem fingerprint; entries are graph-sized; checkpoint
    * blocks release with the RDD on entry removal/GC.
    */
  private val coEdgeCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String, Long), DataFrame]()

  private[graft] def clearCoEdgeCache(): Int = {
    val n = coEdgeCache.size()
    coEdgeCache.clear()
    n
  }

  private def cachedCoPurchaseEdges(spark: SparkSession, sfDir: String,
      minCo: Long): DataFrame = {
    val fp = MinHashDedup.corpusFingerprint(spark, sfDir, Seq("lineitem"))
    MinHashDedup.evictStale(coEdgeCache,
      (k: (SparkSession, String, String, Long)) =>
        k._1 == spark && k._2 == sfDir && k._3 != fp,
      (k: (SparkSession, String, String, Long)) => k._1)
    coEdgeCache.computeIfAbsent((spark, sfDir, fp, minCo), _ =>
      coPurchaseEdges(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")),
        minCo))
  }

  /** `graph_cc` — connected components of the co-purchase graph,
    * completing the graph trio (centrality `graph_pagerank`, local
    * structure `graph_triangles`, global structure: which parts form
    * one co-purchase market): hash-min label propagation to the
    * FIXPOINT — every vertex ends labeled with the MINIMUM part id
    * reachable from it. The fixpoint is a graph property independent
    * of iteration schedule, so the oracle computes the SAME labels by
    * recursive transitive closure and the hash compare is exact
    * without pinning a round count.
    *
    * Scale shape: the corpus pays ONCE (the shared
    * [[coPurchaseEdges]] aggregation); every propagation round is one
    * keyed join + min-aggregate over GRAPH-sized frames, labels
    * localCheckpoint per round (lineage one round deep), and the
    * convergence check is a 1-row count (the bounded-collect class).
    * Rounds = graph diameter — small-world co-purchase graphs converge
    * in a handful; for planetary graphs the alternating
    * large-star/small-star contraction (Kiveris et al. 2014) is the
    * drop-in round-compressor with the same per-round join shape.
    */
  def graphCc(spark: SparkSession, sfDir: String,
      minCo: Long = 2L): DataFrame =
    ccEnum(cachedCoPurchaseEdges(spark, sfDir, minCo))

  /** `graph_sssp` — MULTI-SOURCE BFS hop distances over the co-purchase
    * graph (VERDICT r14 #5: the graph trio lacked distance): distance
    * from every vertex to the nearest of a PINNED seed set (vertices
    * with id % 17 = 0 — the TrustRank shape: distance-to-seed-set, the
    * production form of SSSP over fragmented real-world graphs, where a
    * single pinned source strands in one small component — measured:
    * the max-degree source reaches 22 of 6,155 vertices at sf0.1, the
    * %17 seed set reaches 1,128 across components). Unweighted edges ⇒
    * BFS levels; `maxDepth` = 12 caps the search (every fixture
    * eccentricity is ≤ 10, so the cap never truncates here — it bounds
    * the ORACLE's cyclic recursion and is the declared k-hop contract).
    *
    * Shape: frontier BFS on the shared [[cachedCoPurchaseEdges]]
    * artifact (third declared view of the one corpus pass) — per round
    * ONE keyed join of the frontier against the edge frame + an
    * anti-join against settled vertices, all graph-sized on the cloned
    * low-latency session (the ccEnum treatment: AQE off, 4 shuffle
    * partitions, per-round localCheckpoint with superseded-block
    * reclamation, conf restore in finally). Rounds = seed-set
    * eccentricity, each touching frontier-sized frames only — at
    * planetary scale this is the textbook Pregel BFS with the frontier
    * as the message set.
    */
  def graphSssp(spark: SparkSession, sfDir: String, minCo: Long = 2L,
      seedMod: Long = 17L, maxDepth: Int = 12): DataFrame =
    ssspEnum(cachedCoPurchaseEdges(spark, sfDir, minCo), seedMod, maxDepth)

  /** `graph_widest` — MAXIMUM-CAPACITY (bottleneck / widest) path to
    * the seed set: for every vertex, the best achievable minimum edge
    * strength along any path from a % 17 seed, with strength = the
    * co-purchase count — the reliability metric (how strongly is this
    * part connected to the seed products?), the classic widest-path
    * problem and the fourth distance-flavored member of the graph
    * family (cc = reachability, sssp = hops, pagerank = centrality,
    * widest = capacity). Seeds carry a pinned sentinel capacity 1e9
    * (an "infinite" self-strength above any real co count).
    *
    * Monotone fixpoint: cap(x) = max(cap(x), max over neighbors
    * min(cap(n), co(n,x))) — capacities only rise and draw from the
    * finite co-value set, so BOTH the propagation loop and the
    * oracle's UNION recursion terminate naturally (no depth cap
    * needed, unlike hop distances where cycles inflate d forever).
    * Same per-round shape and session treatment as [[ssspEnum]].
    */
  def graphWidest(spark: SparkSession, sfDir: String, minCo: Long = 2L,
      seedMod: Long = 17L): DataFrame =
    widestEnum(cachedCoPurchaseEdges(spark, sfDir, minCo), seedMod)

  /** `graph_labelprop` — COMMUNITY detection over the co-purchase
    * graph (VERDICT r15 #3: pagerank/cc/sssp/widest/triangles are
    * declared; communities — which parts form one co-purchase MARKET
    * SEGMENT, finer than a connected component — is the one classic
    * co-purchase analysis that was absent). Synchronous weighted label
    * propagation (Raghavan et al. 2007, the LPA every graph library
    * ships), made fully deterministic and oracle-replayable by pinning
    * BOTH free choices the literature leaves open: (a) a FIXED round
    * count (4 synchronous rounds — LPA under a synchronous schedule
    * can 2-cycle on bipartite structures, so "run to convergence" is
    * not well-defined; a pinned depth is, and it is also the
    * production form: big-graph LPA jobs run k sweeps, not fixpoints)
    * and (b) a modularity-free tie rule — each vertex adopts the
    * neighbor label with the LARGEST summed co-purchase weight, ties
    * broken by MINIMUM label (the hash-min discipline of [[ccEnum]]).
    * Initial label = own id. Unlike `graph_cc` (min-REACHABLE label:
    * one weak bridge merges two dense cliques into one component),
    * the weighted majority keeps densely-linked clusters separate —
    * community, not connectivity.
    *
    * Scale shape: the corpus pays once (the shared
    * [[cachedCoPurchaseEdges]] memo — fifth declared view of the one
    * pass); each round is ONE (label-keyed join + sum-by-(vertex,
    * label) + per-vertex argmax window) over graph-sized frames on the
    * cloned low-latency session, labels localCheckpoint'd per round
    * with superseded-block release. Exactly k rounds, schedule-pinned,
    * so the oracle unrolls them as chained CTEs (the bpe_train
    * precedent) — no recursion, no convergence dependence.
    */
  def graphLabelprop(spark: SparkSession, sfDir: String,
      minCo: Long = 2L, rounds: Int = 4): DataFrame =
    labelpropEnum(cachedCoPurchaseEdges(spark, sfDir, minCo), rounds)

  /** `graph_kcore` — k-core membership over the co-purchase graph
    * (the sixth classic of the family: cc = reachability, sssp =
    * hops, pagerank = centrality, widest = capacity, labelprop =
    * community, K-CORE = density — "which parts sit in a subgraph
    * where EVERYONE has ≥ k strong co-purchase partners", the
    * engagement/robustness metric and the standard graph-ML feature).
    * Iterative peel: drop every vertex whose degree within the
    * SURVIVING set is < k, recompute, repeat. Like `graph_labelprop`
    * the declared contract pins the sweep count (4 synchronous peel
    * sweeps — the production big-graph form runs bounded sweeps; a
    * run-to-convergence contract would make the oracle's recursion
    * depth data-dependent), so the oracle unrolls exactly 4 chained
    * CTEs. Peeling is MONOTONE (the vertex set only shrinks), so a
    * sweep that removes nothing is the fixpoint and the loop
    * early-exits — the remaining pinned sweeps are provable no-ops,
    * and on every fixture SF the peel converges within the 4 (asserted
    * by GraphMixSpec's sweep-5 equality check).
    *
    * Output: surviving vertices with their within-core degree.
    *
    * Scale shape: the corpus pays once (the shared
    * [[cachedCoPurchaseEdges]] memo — sixth declared view of the one
    * pass); each sweep is TWO keyed semi-joins of the edge frame
    * against the surviving set + one count aggregate, all graph-sized
    * on the cloned low-latency session, survivors localCheckpoint'd
    * per sweep with superseded-block release — textbook distributed
    * k-core (the Pregel peel), rounds bounded by the pin.
    */
  def graphKcore(spark: SparkSession, sfDir: String, minCo: Long = 2L,
      k: Int = 3, sweeps: Int = 4): DataFrame =
    kcoreEnum(cachedCoPurchaseEdges(spark, sfDir, minCo), k, sweeps)

  /** `graph_jaccard` — neighbor-set similarity over the co-purchase
    * graph (the seventh member: item-item similarity, the classic
    * co-occurrence recommender — "customers whose baskets contain X
    * also contain Y"-adjacent parts share NEIGHBORS even when never
    * bought together themselves, which direct co-purchase strength
    * cannot see): for every part pair with at least one common
    * co-purchase partner, |N(u) ∩ N(v)| / |N(u) ∪ N(v)|, 4dp,
    * thresholded.
    *
    * Shape: candidates come from ONE wedge join keyed on the shared
    * neighbor (the graph_triangles wedge — pair work bounded by
    * Σ deg², never |V|²; the minCo floor on the edge memo is the
    * neighbor-list cap real recommenders apply), degrees attach by
    * two keyed joins, and the division is the only float (exact
    * integer counts upstream). Seventh declared view of the shared
    * [[cachedCoPurchaseEdges]] corpus pass.
    */
  def graphJaccard(spark: SparkSession, sfDir: String,
      minCo: Long = 2L, minJaccard: Double = 0.25): DataFrame =
    jaccardEnum(cachedCoPurchaseEdges(spark, sfDir, minCo), minJaccard)

  /** `graph_clustcoef` — per-vertex local clustering coefficient
    * (Watts–Strogatz), the eighth classic: of the pairs of my
    * co-purchase partners, what fraction are partners of EACH OTHER —
    * the "tight market niche vs broad hub" discriminator
    * (graph_triangles counts the closures globally; this attributes
    * them per vertex and normalizes by the wedge count deg·(deg−1)/2).
    *
    * Shape: one wedge join keyed on the CENTER vertex (u < w halves
    * the wedge set), one keyed join against the normalized edge set to
    * close wedges, two keyed aggregates — Σ deg²-bounded like
    * triangles/jaccard, never |V|². Division is the one float, 4dp.
    * Eighth declared view of the shared [[cachedCoPurchaseEdges]]
    * corpus pass. Vertices with deg < 2 have no wedges and are
    * excluded (cc undefined), the standard convention.
    */
  def graphClustcoef(spark: SparkSession, sfDir: String,
      minCo: Long = 2L): DataFrame =
    clustcoefEnum(cachedCoPurchaseEdges(spark, sfDir, minCo))

  /** `graph_closeness` — seed-sampled CLOSENESS centrality (the ninth
    * classic; VERDICT r16 #6: "centrality beyond PageRank"): for every
    * vertex, how near is it to the pinned %17 seed set — n_seeds
    * reached within `maxDepth`, the exact total hop distance, and
    * closeness = n/Σd (the classic closeness restricted to the seed
    * sample, the standard big-graph estimator: exact closeness needs
    * all-pairs BFS, sampled-seed closeness is the production form —
    * Eppstein–Wang). Counts are exact integers; the single float is
    * the final 4dp division.
    *
    * Shape: ONE multi-source BFS carrying (vertex, seed) pairs —
    * per round one keyed join of the labeled frontier against the
    * shared edge memo + an anti-join against settled pairs (the
    * ssspEnum scaffolding with the seed label threaded through), on
    * the cloned low-latency session with per-round localCheckpoint +
    * superseded-block release. State is |V|·|reached seeds| pairs —
    * the seed sample bounds it, which is exactly why the sampled
    * estimator is the one that scales. Ninth declared view of the one
    * [[cachedCoPurchaseEdges]] corpus pass. The oracle is the
    * depth-capped recursive CTE over (seed, vertex, d) triples (the
    * graph_sssp recursion with the seed kept in the row).
    */
  def graphCloseness(spark: SparkSession, sfDir: String,
      minCo: Long = 2L, seedMod: Long = 17L,
      maxDepth: Int = 12): DataFrame =
    closenessEnum(cachedCoPurchaseEdges(spark, sfDir, minCo), seedMod,
      maxDepth)

  /** Seed-labeled multi-source BFS closeness over an undirected (u, v)
    * edge frame — the planted-graph harness for GraphMixSpec.
    */
  private[graft] def closenessEnum(edges: DataFrame, seedMod: Long,
      maxDepth: Int): DataFrame = {
    val spark0 = edges.sparkSession
    val s2 = spark0.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val und = reboundUnd(s2, edges, Seq("u", "v"))
    var dists = und.select(col("u").as("x")).distinct()
      .filter(pmod(col("x"), lit(seedMod)) === 0)
      .select(col("x"), col("x").as("s"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = dists
    // the settled set accumulates as a LIST of per-round checkpointed
    // frames, unioned lazily where read (r19 opt: re-checkpointing the
    // whole union each round was a third O(settled) materialization
    // job per round — the per-level frames are already materialized,
    // and a lazy union of k in-memory blocks scans, never recomputes)
    var levels = List(dists)
    def settled() = levels.reduce(_ unionByName _)
    // no conf restore (the kcoreEnum resolution, ADVICE r16): s2 is
    // private to this call and the final aggregate below is s2-bound —
    // the whole enum runs under one declared low-latency conf
    var d = 1
    var growing = true
    while (growing && d <= maxDepth) {
      val next = und
        .join(frontier.select(col("x").as("u"), col("s")), "u")
        .select(col("v").as("x"), col("s")).distinct()
        .join(settled().select(col("x"), col("s")), Seq("x", "s"),
          "left_anti")
        .select(col("x"), col("s"), lit(d).as("dist"))
        .localCheckpoint(true)
      if (next.count() == 0) {
        unpersistCheckpoint(next)
        growing = false
      } else {
        levels ::= next
        frontier = next
        d += 1
      }
    }
    settled().filter(col("dist") > 0)
      .groupBy(col("x"))
      .agg(count(lit(1)).as("n_seeds"), sum(col("dist")).as("total_dist"))
      .select(col("x").as("part"), col("n_seeds"), col("total_dist"),
        round(col("n_seeds").cast("double")
          / col("total_dist").cast("double"), 4).as("closeness"))
      .orderBy(col("part").asc)
  }

  /** `graph_betweenness` — seed-PAIR-sampled betweenness centrality,
    * the tenth classic (VERDICT r17 #8, the last centrality gap): how
    * much shortest-path traffic between the pinned %17 seed pairs
    * routes THROUGH each vertex. Exact betweenness needs all-pairs
    * path counting; the production estimator restricts sources AND
    * targets to a pivot sample (Brandes–Pich) — with both endpoints
    * sampled, every needed path count (σ_sv, σ_tv, σ_st) comes from
    * the ONE multi-source BFS, no all-pairs σ and no backward
    * dependency recursion. Depth-capped at `maxDepth` (seed pairs
    * farther apart contribute nothing — the declared scope).
    *
    * Determinism (the graph_pagerank discipline): path counts σ are
    * exact integer level-DP (σ_d(v) = Σ σ_{d−1} over BFS parents);
    * per-(s,t,v) contributions are σ_sv·σ_tv·1e6 DIV σ_st — an exact
    * integer floor per term — and sums are integer sums, so no float
    * accumulation order anywhere. Declared per vertex: the pair count,
    * the exact STRESS centrality Σ σ_sv·σ_tv (Shimbel), the 1e6-fixed-
    * point betweenness, and its display division.
    *
    * Scale shape: the BFS carries (vertex, seed, σ) triples — the
    * closeness scaffolding with one extra groupBy-sum per round (state
    * still seed-sample-bounded); the judge joins are sp ⋈ sp keyed on
    * the VERTEX and pairs keyed on (s, t) — work is Σ_v |seeds
    * reaching v|², quadratic in the PIVOT SAMPLE by estimator design,
    * never in |V|. Tenth declared view of the one
    * [[cachedCoPurchaseEdges]] corpus pass; oracle = the closeness
    * recursion with σ level-DP CTEs and HUGEINT terms (MATERIALIZED
    * hints — the inlined chain re-evaluates 170× slower).
    */
  def graphBetweenness(spark: SparkSession, sfDir: String,
      minCo: Long = 2L, seedMod: Long = 17L,
      maxDepth: Int = 4): DataFrame =
    betweennessEnum(cachedCoPurchaseEdges(spark, sfDir, minCo), seedMod,
      maxDepth)

  /** Seed-pair betweenness over an undirected (u, v) edge frame — the
    * planted-graph harness for GraphMixSpec (path/star exact values).
    */
  private[graft] def betweennessEnum(edges: DataFrame, seedMod: Long,
      maxDepth: Int): DataFrame = {
    val Scale = 1000000L // 1e6 fixed point; with σ ≤ ~1e4 at the
    // depth cap, σ²·1e6 ≤ 1e14 stays far inside Long (oracle: HUGEINT)
    val spark0 = edges.sparkSession
    val s2 = spark0.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val und = reboundUnd(s2, edges, Seq("u", "v"))
    var sp = und.select(col("u").as("x")).distinct()
      .filter(pmod(col("x"), lit(seedMod)) === 0)
      .select(col("x"), col("x").as("s"), lit(0).as("d"),
        lit(1L).as("sig"))
      .localCheckpoint(true)
    var frontier = sp
    // per-level checkpointed frames, unioned lazily (the closenessEnum
    // r19 treatment: no O(settled) re-materialization per round)
    var levels = List(sp)
    def settled() = levels.reduce(_ unionByName _)
    var d = 1
    var growing = true
    while (growing && d <= maxDepth) {
      // level-synchronous σ: paths to a NEW vertex at depth d = the
      // integer sum of its depth-(d−1) parents' σ (one keyed join +
      // keyed aggregate; the anti-join keeps only first-reached pairs)
      val next = und
        .join(frontier.select(col("x").as("u"), col("s"), col("sig")),
          "u")
        .groupBy(col("v").as("x"), col("s"))
        .agg(sum(col("sig")).as("sig"))
        .join(settled().select(col("x"), col("s")), Seq("x", "s"),
          "left_anti")
        .select(col("x"), col("s"), lit(d).as("d"), col("sig"))
        .localCheckpoint(true)
      if (next.count() == 0) {
        unpersistCheckpoint(next)
        growing = false
      } else {
        levels ::= next
        frontier = next
        d += 1
      }
    }
    val sp2 = settled()
    val pairs = sp2
      .filter(pmod(col("x"), lit(seedMod)) === 0 && col("x") > col("s"))
      .select(col("s"), col("x").as("t"), col("d").as("dst"),
        col("sig").as("sigst"))
    val a = sp2.select(col("s"), col("x").as("part"),
      col("d").as("da"), col("sig").as("siga"))
    val b = sp2.select(col("s").as("t"), col("x").as("part"),
      col("d").as("db"), col("sig").as("sigb"))
    // v mediates (s, t) iff d(s,v) + d(v,t) = d(s,t); σ_st(v) =
    // σ_sv·σ_vt (σ_vt = σ_tv — path reversal on an undirected graph)
    a.join(b, Seq("part"))
      .join(pairs, Seq("s", "t"))
      .filter(col("da") + col("db") === col("dst")
        && col("part") =!= col("s") && col("part") =!= col("t"))
      .select(col("part"), (col("siga") * col("sigb")).as("stress_term"),
        expr(s"(siga * sigb * ${Scale}L) div sigst").as("bt_term"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("stress_term")).as("stress"),
        sum(col("bt_term")).as("bt_fp"))
      .select(col("part"), col("n_pairs"), col("stress"), col("bt_fp"),
        round(col("bt_fp").cast("double") / lit(Scale.toDouble), 6)
          .as("betweenness"))
      .orderBy(col("part").asc)
  }

  /** Clustering coefficient over an undirected (u, v, co) edge frame —
    * the planted-graph harness for GraphMixSpec.
    */
  private[graft] def clustcoefEnum(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v")) // normalized u < v
    val und = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .select(col("u").as("x"), col("v").as("w"))
    val deg = und.groupBy(col("x")).agg(count(lit(1)).as("d"))
    // wedges centered at x: unordered neighbor pairs (u < w)
    val wedges = und.select(col("x"), col("w").as("nu"))
      .join(und.select(col("x"), col("w").as("nw")), Seq("x"))
      .filter(col("nu") < col("nw"))
    val closed = wedges
      .join(e.select(col("u").as("nu"), col("v").as("nw")),
        Seq("nu", "nw"))
      .groupBy(col("x")).agg(count(lit(1)).as("n_tri"))
    deg.filter(col("d") >= 2)
      .join(closed, Seq("x"), "left_outer")
      .select(col("x").as("part"), col("d").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
        round(coalesce(col("n_tri"), lit(0L)).cast("double") * 2.0
          / (col("d") * (col("d") - 1)).cast("double"), 4)
          .as("clustcoef"))
      .orderBy(col("part").asc)
  }

  /** Neighbor-Jaccard over an undirected (u, v, co) edge frame — the
    * planted-graph harness for GraphMixSpec.
    */
  private[graft] def jaccardEnum(edges: DataFrame,
      minJ: Double): DataFrame = {
    val und = edges.select(col("u").as("x"), col("v").as("w"))
      .union(edges.select(col("v").as("x"), col("u").as("w")))
    val deg = und.groupBy(col("x")).agg(count(lit(1)).as("d"))
    val inter = und.select(col("x").as("u"), col("w"))
      .join(und.select(col("x").as("v"), col("w")), Seq("w"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("n_common"),
        round(col("n_common").cast("double")
          / (col("du") + col("dv") - col("n_common")).cast("double"), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= minJ)
      .orderBy(col("u").asc, col("v").asc)
  }

  /** Bounded-sweep peel over an undirected (u, v, co) edge frame —
    * the planted-graph harness for GraphMixSpec.
    */
  private[graft] def kcoreEnum(edges: DataFrame, k: Int,
      sweeps: Int): DataFrame = {
    val spark0 = edges.sparkSession
    val s2 = spark0.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val und = reboundUnd(s2, edges, Seq("u", "v"))
    var verts = und.select(col("u").as("x")).distinct()
      .localCheckpoint(true)
    var n = verts.count()
    // No conf restore here (ADVICE r16): s2 is private to this call and
    // the returned serve query below is BOUND to s2, so the labelprop-
    // inherited finally block restored nothing — it only flipped AQE
    // back ON for the serve join while the sweeps had run without it.
    // The serve query is the same graph-sized two-semi-join shape as a
    // sweep; it now runs under the SAME low-latency settings the sweeps
    // used, so the whole enum executes under one declared conf.
    var r = 0
    var converged = false
    while (r < sweeps && !converged) {
      // degree within the surviving set: both endpoints must survive
      val stepped = und
        .join(verts.select(col("x").as("u")), "u")
        .join(verts.select(col("x").as("v")), "v")
        .groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("u").as("x"))
        .localCheckpoint(true)
      val m = stepped.count()
      // monotone: a sweep that drops nothing is the fixpoint — the
      // remaining pinned sweeps are no-ops, skip them
      converged = m == n
      n = m
      val prev = verts
      verts = stepped
      unpersistCheckpoint(prev)
      r += 1
    }
    und
      .join(verts.select(col("x").as("u")), "u")
      .join(verts.select(col("x").as("v")), "v")
      .groupBy(col("u")).agg(count(lit(1)).as("core_degree"))
      .select(col("u").as("part"), col("core_degree"))
      .orderBy(col("part").asc)
  }

  /** Synchronous k-round weighted LPA over an undirected (u, v, co)
    * edge frame — the planted-graph harness for GraphMixSpec.
    */
  private[graft] def labelpropEnum(edges: DataFrame,
      rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark0 = edges.sparkSession
    val s2 = spark0.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val und = reboundUnd(s2, edges, Seq("u", "v", "co"))
    var labels = und.select(col("u")).distinct()
      .select(col("u").as("x"), col("u").as("lbl"))
      .localCheckpoint(true)
    try {
      var r = 0
      while (r < rounds) {
        // weighted neighbor-label vote: sum co per (vertex, label),
        // argmax by (weight DESC, label ASC) — one keyed join + agg +
        // window per round, all graph-sized
        val votes = und
          .join(labels.select(col("x").as("u"), col("lbl").as("nl")), "u")
          .groupBy(col("v").as("x"), col("nl"))
          .agg(sum(col("co")).as("w"))
        val stepped = votes
          .withColumn("rn", row_number().over(Window.partitionBy(col("x"))
            .orderBy(col("w").desc, col("nl").asc)))
          .filter(col("rn") === 1)
          .select(col("x"), col("nl").as("lbl"))
          .localCheckpoint(true)
        val prev = labels
        labels = stepped
        unpersistCheckpoint(prev)
        r += 1
      }
    } finally {
      s2.conf.set("spark.sql.adaptive.enabled",
        spark0.conf.get("spark.sql.adaptive.enabled", "true"))
      s2.conf.set("spark.sql.shuffle.partitions",
        spark0.conf.get("spark.sql.shuffle.partitions", "200"))
    }
    labels.select(col("x").as("part"), col("lbl").as("community"))
      .orderBy(col("part").asc)
  }

  /** Widest-path fixpoint over an undirected (u, v, co) edge frame —
    * the planted-graph harness for GraphMixSpec.
    */
  private[graft] def widestEnum(edges: DataFrame,
      seedMod: Long): DataFrame = {
    val SeedCap = 1000000000L
    val spark0 = edges.sparkSession
    val s2 = spark0.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val und = reboundUnd(s2, edges, Seq("u", "v", "co"))
    var caps = und.select(col("u").as("x")).distinct()
      .select(col("x"),
        when(pmod(col("x"), lit(seedMod)) === 0, lit(SeedCap))
          .otherwise(lit(0L)).as("cap"))
      .localCheckpoint(true)
    try {
      var changed = 1L
      while (changed > 0) {
        val nbrBest = und
          .join(caps.select(col("x").as("u"), col("cap").as("ncap")), "u")
          .select(col("v").as("x"),
            least(col("ncap"), col("co")).as("cand"))
          .groupBy(col("x")).agg(max(col("cand")).as("mx"))
        val stepped = caps
          .join(nbrBest, Seq("x"), "left")
          .select(col("x"), col("cap"),
            greatest(col("cap"), coalesce(col("mx"), lit(0L)))
              .as("ncap"))
          .localCheckpoint(true)
        changed = stepped.filter(col("ncap") > col("cap")).count()
        val prev = caps
        caps = stepped.select(col("x"), col("ncap").as("cap"))
        unpersistCheckpoint(prev)
      }
    } finally {
      s2.conf.set("spark.sql.adaptive.enabled",
        spark0.conf.get("spark.sql.adaptive.enabled", "true"))
      s2.conf.set("spark.sql.shuffle.partitions",
        spark0.conf.get("spark.sql.shuffle.partitions", "200"))
    }
    caps.filter(col("cap") > 0)
      .select(col("x").as("part"), col("cap").as("capacity"))
      .orderBy(col("part").asc)
  }

  /** Multi-source BFS over an undirected (u, v) edge frame — the
    * planted-graph harness for GraphMixSpec.
    */
  private[graft] def ssspEnum(edges: DataFrame, seedMod: Long,
      maxDepth: Int): DataFrame = {
    val spark0 = edges.sparkSession
    val s2 = spark0.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val und = reboundUnd(s2, edges, Seq("u", "v"))
    var dists = und.select(col("u").as("x")).distinct()
      .filter(pmod(col("x"), lit(seedMod)) === 0)
      .select(col("x"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = dists
    // per-level checkpointed frames, unioned lazily (the closenessEnum
    // r19 treatment: no O(settled) re-materialization per round)
    var levels = List(dists)
    def settled() = levels.reduce(_ unionByName _)
    try {
      var d = 1
      var growing = true
      while (growing && d <= maxDepth) {
        val next = und
          .join(frontier.select(col("x").as("u")), "u")
          .select(col("v").as("x")).distinct()
          .join(settled().select(col("x")), Seq("x"), "left_anti")
          .select(col("x"), lit(d).as("dist"))
          .localCheckpoint(true)
        if (next.count() == 0) {
          unpersistCheckpoint(next)
          growing = false
        } else {
          levels ::= next
          frontier = next
          d += 1
        }
      }
    } finally {
      s2.conf.set("spark.sql.adaptive.enabled",
        spark0.conf.get("spark.sql.adaptive.enabled", "true"))
      s2.conf.set("spark.sql.shuffle.partitions",
        spark0.conf.get("spark.sql.shuffle.partitions", "200"))
    }
    settled().select(col("x").as("part"), col("dist"))
      .orderBy(col("part").asc)
  }

  /** The undirected edge frame re-bound to the cloned low-latency
    * session, hash-partitioned by `u` and sorted ONCE (r19 opt round,
    * guide §2.4 "share one exchange"): the edge frame is the
    * loop-invariant BIG side of every fixpoint round's neighbor join,
    * and the plain RDD re-bind erased its partitioning, so every round
    * re-shuffled (and re-sorted) the whole graph to join a dust-sized
    * frontier. `localCheckpoint` preserves outputPartitioning and
    * outputOrdering through the LogicalRDD leaf, so the per-round join
    * now exchanges only the frontier/labels side. Partition count =
    * the clone's pinned shuffle.partitions (conf, not a constant).
    * `cols` = ("u", "v") plus any edge payload columns to carry.
    */
  private def reboundUnd(s2: SparkSession, edges: DataFrame,
      cols: Seq[String]): DataFrame = {
    val sel = cols.map(col)
    val swapped = col("v").as("u") +: col("u").as("v") +:
      cols.drop(2).map(col)
    val und0 = edges.select(sel: _*).union(edges.select(swapped: _*))
    s2.createDataFrame(und0.rdd, und0.schema)
      .repartition(col("u")).sortWithinPartitions(col("u"))
      .localCheckpoint(true)
  }

  /** Releases the block-manager memory behind a localCheckpoint'd frame
    * that a fixpoint loop has superseded (ADVICE r14: without this,
    * every propagation round leaves its checkpoint blocks pinned until
    * GC, accumulating across rounds and invocations). `Dataset
    * .localCheckpoint` wraps the materialized RDD in a `LogicalRDD`
    * leaf — unpersisting THAT rdd (not a freshly-derived `df.rdd`,
    * which is a new lineage-mapped RDD with no blocks of its own) is
    * what frees the storage. Only ever called on frames the loop has
    * already replaced, so nothing downstream can recompute from them.
    */
  private[graft] def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Hash-min label propagation over an undirected (u, v) edge frame,
    * with POINTER JUMPING: each round folds in both the neighbor
    * minimum AND label(label(x)) — the label edge x→label(x) is a
    * sound reachability shortcut (label(x) = m means m is reachable
    * from x; label(m) = m′ means m′ is reachable from m, hence from
    * x), so doubling only accelerates toward the same min-reachable
    * fixpoint while cutting rounds from O(diameter) to O(log n) — the
    * Shiloach–Vishkin-style hybrid every distributed CC implementation
    * uses. Measured on the 6155-vertex sf0.1 graph: 8 rounds to the
    * fixpoint at ~0.5 s/round; the per-round floor is plan-compile +
    * job latency on dust-sized frames, not data (the pagerank_dist
    * "iteration floor" finding) — it is iteration-fixed, never
    * corpus-proportional, and the corpus-sized edge build runs once
    * on the caller's session with full parallelism (memoized across
    * graph_triangles and graph_cc).
    */
  private[graft] def ccEnum(edges: DataFrame): DataFrame = {
    // Rounds run on a CLONED session (the pagerank_dist treatment):
    // AQE off + 4 shuffle partitions while the graph-sized iterates
    // execute — per-round scheduler/AQE latency dominated the wall
    // otherwise. Unlike pagerank_dist the result is VERTEX-sized
    // (unbounded at scale), so no collect-rebind: instead the clone's
    // conf is RESTORED after convergence, and the returned frame —
    // whose lineage is one localCheckpoint + sort — plans any later
    // action under the session's normal settings (SQLConf is read at
    // planning time, per action).
    val spark0 = edges.sparkSession
    val s2 = spark0.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val und = reboundUnd(s2, edges, Seq("u", "v"))
    var labels = und.select(col("u")).distinct()
      .select(col("u").as("x"), col("u").as("lbl"))
      .localCheckpoint(true)
    // One hash-min + pointer-jump application: (x, prev, lbl). The
    // und/ptr joins use fresh projections so two applications CHAIN
    // into one plan without attribute ambiguity.
    def stepOnce(lbls: DataFrame): DataFrame = {
      val nbrMin = und
        .join(lbls.select(col("x").as("u"), col("lbl").as("nl")), "u")
        .groupBy(col("v").as("x")).agg(min(col("nl")).as("mn"))
      val ptr = lbls.select(col("x").as("px"), col("lbl").as("plbl"))
      lbls.select(col("x"), col("lbl"))
        .join(nbrMin, Seq("x"), "left")
        .join(ptr, col("lbl") === col("px"), "left")
        .select(col("x"), col("lbl").as("prev"),
          least(col("lbl"), coalesce(col("mn"), col("lbl")),
            coalesce(col("plbl"), col("lbl"))).as("lbl"))
    }
    // conf restore + superseded-checkpoint reclamation in try/finally:
    // an exception mid-loop must not leave the clone mis-configured or
    // prior rounds' checkpointed blocks pinned in the block manager.
    try {
      var changed = 1L
      while (changed > 0) {
        // ONE application per materialization. (A chained double-step
        // per checkpoint was tried in r15 and REVERTED: without
        // materializing the inner step, its join+agg subtree re-executes
        // in each of the outer step's three references — measured 3×
        // the task time at local[32], a net loss over the extra action.)
        val stepped = stepOnce(labels).localCheckpoint(true)
        changed = stepped.filter(col("lbl") < col("prev")).count()
        val prev = labels
        labels = stepped.select(col("x"), col("lbl"))
        unpersistCheckpoint(prev)
      }
    } finally {
      s2.conf.set("spark.sql.adaptive.enabled",
        spark0.conf.get("spark.sql.adaptive.enabled", "true"))
      s2.conf.set("spark.sql.shuffle.partitions",
        spark0.conf.get("spark.sql.shuffle.partitions", "200"))
    }
    labels.select(col("x").as("part"), col("lbl").as("component"))
      .orderBy(col("part").asc)
  }

  /** Degree-oriented triangle enumeration over any id-ordered
    * (u < v) undirected edge frame — [[graphTriangles]]'s core,
    * property-tested against a literal triple scan on random graphs.
    */
  def triangleEnum(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient low-(degree, id) → high; (degree, id) is a total order
    val oriented = edges
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), Seq("src"))
      .filter(col("e1.dst") < col("e2.dst"))
      .select(col("src"), col("e1.dst").as("w1"), col("e2.dst").as("w2"))
    // closing-edge lookup on the undirected (id-ordered) edge set —
    // the wedge endpoint pair is id-ordered to match
    wedges.join(edges,
        col("w1") === col("u") && col("w2") === col("v"))
      .select(sort_array(array(col("src"), col("w1"), col("w2"))).as("t"))
      .select(col("t").getItem(0).as("t1"), col("t").getItem(1).as("t2"),
        col("t").getItem(2).as("t3"))
      .orderBy(col("t1").asc, col("t2").asc, col("t3").asc)
  }
}
