package graft.ops

import graft.Tables
import graft.functions.VectorFunctions.{sortedLongIntersect, sortedLongIntersectCount}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over a co-occurrence graph (SURVEY.md §2b Q26
  * adjunct): the parts bought together in one order form an undirected
  * graph; triangle counting over it is the canonical "dense cluster"
  * signal (the same computation detects template-spam cliques in a
  * near-dup similarity graph).
  *
  * Scale design — the naive triangle triple-join explodes on high-degree
  * nodes (a hub of degree d contributes d² wedge candidates). The
  * implementation uses DEGREE ORIENTATION (Chiba–Nishizeki / Suri–Vassilvitskii
  * MapReduce form): orient every edge from its lower-(degree, id) endpoint
  * to the higher one, enumerate wedges only from each node's OUT-edges
  * (out-degree is O(√m) after orientation, independent of the hub's true
  * degree), and close them against the oriented edge set. Every stage is
  * an equi-join or aggregate on a key — shuffle-partitioned, no
  * broadcast of the edge set, no driver state. The companion
  * connected-components fixpoint lives in [[DedupOps.connectedComponents]].
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** Shared basket-graph derivation for the triangle family: deduped
    * co-purchase edges, undirected degrees, and the (degree, id)-
    * oriented DAG. The basket self-join + distinct is the expensive
    * stage and every consumer references it several times (degree,
    * orientation, counts), so the edge list and the oriented list are
    * CHECKPOINTED once — per-branch column pruning otherwise defeats
    * exchange reuse and re-runs the pair join per reference (the same
    * lesson as `pmi_bigrams`). Orientation's total order: (degree, id),
    * ties on degree broken by id, so each triangle has exactly one edge
    * between its two order-smallest nodes. */
  private def basketGraph(spark: SparkSession, sfDir: String) = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val e = DedupOps.eagerCheckpoint(li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("x"), col("b.pk").as("y")).distinct())
    val deg = e.select(col("x").as("node")).unionAll(e.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = DedupOps.eagerCheckpoint(e
      .join(deg.withColumnRenamed("node", "x").withColumnRenamed("deg", "dx"), "x")
      .join(deg.withColumnRenamed("node", "y").withColumnRenamed("deg", "dy"), "y")
      .select(
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")),
          struct(col("x").as("u"), col("y").as("v")))
          .otherwise(struct(col("y").as("u"), col("x").as("v")))
          .as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v")))
    (e, deg, oriented)
  }

  /** Out-neighbor adjacency of the oriented DAG, SORTED AT BUILD TIME:
    * the per-pair intersection kernel then runs as a primitive two-pointer
    * long merge (native [[graft.functions.SortedLongIntersect]]) instead
    * of the generic `array_intersect`, which builds a hash set per row
    * pair — on the O(m^{3/2}) hits join that constant factor dominated
    * `graph_local_cc` (judge-measured ~36s steady state at sf0.1). The
    * sort is paid once per node at aggregation, not once per pair; edges
    * are distinct so no dedup pass is needed.
    *
    * CHECKPOINTED (r19): both kernels reference the adjacency twice (the
    * wedge explode and the closing join's v side), and Catalyst's
    * exchange reuse did not unify the two references — the before-plans
    * show the partial/finalize collect_list + per-array sort pair TWICE
    * with no ReusedExchange (the self-join re-aliasing makes the
    * subtrees structurally distinct). The checkpoint computes the
    * aggregate once; it also preserves the aggregate's hash(u)
    * partitioning and the explicit u-ordering below, which the closing
    * join's `u AS v` rename keeps via alias-aware partitioning — so the
    * adjacency side of that SortMergeJoin needs neither an exchange nor
    * a sort. */
  private def sortedAdjacency(oriented: DataFrame): DataFrame =
    DedupOps.eagerCheckpoint(
      oriented.groupBy("u").agg(array_sort(collect_list(col("v"))).as("nbrs"))
        .sortWithinPartitions("u"))

  /** Triangle census of the part co-purchase graph: one row with node,
    * edge and triangle counts. Edges are deduplicated (x < y) before
    * counting, so multi-order co-purchases weigh once. */
  def graphTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    val (e, deg, oriented) = basketGraph(spark, sfDir)
    // adjacency-intersection closing (instead of materializing the wedge
    // pair space and shuffle-joining it against the edge set): a triangle
    // {a,b,c} is counted exactly once, at the edge between its two
    // order-smallest nodes, as one hit of N⁺(u) ∩ N⁺(v). Out-lists are
    // O(√m) long after orientation, so the replicated-array volume is
    // the same O(m^{3/2}) the wedge join moves — but packed into one row
    // per edge rather than one row per wedge, and the closing join
    // disappears into an in-row sorted-merge intersect (native
    // SortedLongIntersectCount — see sortedAdjacency for why).
    val adj = sortedAdjacency(oriented)
    // (u, v, un) comes from EXPLODING the adjacency itself — the
    // adjacency's (u, nbrs) rows are exactly the oriented edges grouped
    // by u, so `explode(nbrs)` reproduces oriented-with-un as a narrow
    // map and the former `oriented ⋈ adj(u)` equi-join (one exchange +
    // sort of the full edge list) disappears (r18; same multiset, edges
    // are distinct). Only the v-side attach still shuffles.
    val withUn = adj.select(
      col("u"), col("nbrs").as("un"), explode(col("nbrs")).as("v"))
    val nTri = withUn
      .join(adj.select(col("u").as("v"), col("nbrs").as("vn")), Seq("v"))
      .select(sortedLongIntersectCount(col("un"), col("vn")).as("t"))
      .agg(coalesce(sum(col("t")), lit(0L)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(nTri)
  }

  /** PageRank (3 power iterations, damping 0.85) over the bipartite
    * part↔supplier sourcing graph from lineitem, node ids disambiguated
    * as 2·partkey / 2·suppkey+1. Edges run BOTH directions, so every
    * node has out-degree ≥ 1 — no dangling-mass correction term — and
    * the unnormalized 1.0-start convention keeps the initial vector
    * exact. Each iteration is one equi-join (edges ⋈ ranks on the
    * source key) and one aggregate on the destination key: the textbook
    * message-passing shape, shuffle-partitioned on node ids, nothing
    * driver-side, no broadcast of the rank vector.
    *
    * Float determinism across engines AND across executor merge orders:
    * per-edge contributions are quantized to binary fixed point —
    * `floor(x·2³⁰)` as a LONG — before summing. The 2³⁰ scale is a
    * power of two, so the multiply and the final divide are EXACT in
    * IEEE-754; the integer sum is associative (merge-order free) and
    * bounded well under 2⁶³; the one rounding step (floor) is identical
    * in any engine. This sidesteps the double→DECIMAL cast, whose
    * rounding path differs between engines (exact decimal expansion vs
    * double-multiply) at high scales. Three unrolled CTE iterations in
    * the oracle state the same arithmetic. */
  def graphPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val SCALE = 1073741824.0 // 2^30
    // the (pk, sk) distinct feeds BOTH static-table checkpoints below;
    // exchange reuse does not cross checkpoint jobs, so without its own
    // checkpoint the 600k-row scan + distinct re-ran once per consumer
    // job (measured: three 590k-record exchange writes per build at
    // sf0.1 — one for outdeg, two for eo's union branches)
    val li = DedupOps.eagerCheckpoint(Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")).distinct())
    val edges = li.select((col("pk") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .unionAll(li.select((col("sk") * 2 + 1).as("src"), (col("pk") * 2).as("dst")))
    // materialize the static (src, dst, deg) table once: every iteration
    // (and the final deg join) reuses it instead of re-deriving the
    // distinct + union + degree-agg lineage per reference — the standard
    // "cache the edge list" step of any iterative graph job
    val outdeg = DedupOps.eagerCheckpoint(
      edges.groupBy("src").agg(count(lit(1)).as("deg")))
    // ... and hash-partitioned + sorted by the ITERATION JOIN KEY at
    // checkpoint time: Dataset.checkpoint preserves outputPartitioning/
    // outputOrdering, so every power iteration (and the final deg join)
    // consumes the full edge list exchange-free and sort-free instead of
    // re-shuffling + re-sorting it per round (guide §2.4 — hoist the
    // loop-invariant shuffle out of the loop; the r18 plan showed
    // `Exchange hashpartitioning(src)` + two Sorts inside the unrolled
    // iterations, r19 deletes them)
    val eo = DedupOps.eagerCheckpoint(edges.join(outdeg, "src")
      .repartition(col("src")).sortWithinPartitions("src")) // (src, dst, deg)
    val pr0 = outdeg.select(col("src").as("node"), lit(1.0).as("pr"))
    val pr3 = (1 to 3).foldLeft(pr0) { (pr, _) =>
      eo.join(pr, eo("src") === pr("node"))
        .select(col("dst"),
          floor(col("pr") / col("deg").cast("double") * lit(SCALE))
            .cast("long").as("q"))
        .groupBy(col("dst").as("node"))
        .agg((lit(0.15) + lit(0.85) * (sum(col("q")).cast("double") / lit(SCALE)))
          .as("pr"))
        .select(col("node"), col("pr"))
    }
    pr3.join(outdeg, pr3("node") === outdeg("src"))
      .select(col("node"), col("deg"), col("pr"))
      .orderBy(col("pr").desc, col("node").asc)
      .limit(20)
  }

  /** Per-node triangle counts + local clustering coefficient over the
    * same co-purchase graph as [[graphTriangles]] — the node-level
    * "how clique-like is this neighborhood" signal (spam/template
    * cluster scoring in a near-dup graph). Same degree-oriented
    * adjacency-intersection dataflow, but the intersection ELEMENTS are
    * kept: a triangle found at oriented edge (u,v) with witness w
    * credits all three nodes — u and v once per witness (`size(ws)`),
    * each witness once (`explode`). Credits
    * then aggregate on the node key (map-side combined), join the
    * undirected degree table, and the coefficient 2T/(d(d−1)) is one
    * IEEE division of exact longs. Degree-1 nodes have no defined
    * coefficient and are filtered (both engines). */
  def graphLocalCc(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, deg, oriented) = basketGraph(spark, sfDir)
    val adj = sortedAdjacency(oriented)
    // adjacency-explode instead of `oriented ⋈ adj(u)` — see the
    // [[graphTriangles]] note (one exchange + sort of the edge list
    // deleted; identical multiset)
    val hits = adj
      .select(col("u"), col("nbrs").as("un"), explode(col("nbrs")).as("v"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("vn")), Seq("v"))
      .select(col("u"), col("v"), sortedLongIntersect(col("un"), col("vn")).as("ws"))
      .filter(size(col("ws")) > 0)
    // all three credit kinds (u and v get one credit per witness, each
    // witness gets one) emit from a SINGLE pass over the hits join — a
    // 3-branch union would re-execute the adjacency joins and the
    // array_intersect per branch (Catalyst reuses exchanges, not whole
    // subplan computations); this in-row concat halved the query's
    // steady-state wall time at sf0.1
    val credits = hits.select(explode(concat(
        array(struct(col("u").as("node"), size(col("ws")).cast("long").as("t")),
          struct(col("v").as("node"), size(col("ws")).cast("long").as("t"))),
        expr("transform(ws, w -> struct(w AS node, CAST(1 AS BIGINT) AS t))")))
        .as("c"))
      .select(col("c.node").as("node"), col("c.t").as("t"))
    credits.groupBy("node").agg(sum(col("t")).as("n_tri"))
      .join(deg, "node")
      .filter(col("deg") >= 2)
      .select(col("node"), col("deg"), col("n_tri"),
        ((col("n_tri") * 2).cast("double") /
          (col("deg") * (col("deg") - 1)).cast("double")).as("lcc"))
      .orderBy(col("n_tri").desc, col("node").asc)
      .limit(100)
  }

  /** Bounded-depth BFS: minimum hop count from a source node over the
    * part↔supplier bipartite graph of [[graphPagerank]] (source = the
    * smallest part node, derived by a 1-row aggregate so no id is
    * hardcoded; depth 3). Each round is one equi-join of the CHECKPOINTED
    * static edge table against the current frontier (only nodes first
    * discovered last round expand) plus a min-combine on the node key —
    * the textbook distributed-BFS shape: shuffle-partitioned on node
    * ids, map-side min combine, per-round checkpoint to keep lineage
    * linear, no driver state and no broadcast of the visited set. The
    * oracle states the same fixpoint as a depth-bounded recursive CTE.
    * Depth is a constant here; an unbounded variant loops until the
    * frontier count hits zero, exactly like
    * [[DedupOps.connectedComponents]]'s convergence signal. */
  def graphBfsLevels(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")).distinct()
    val edges = li.select((col("pk") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .unionAll(li.select((col("sk") * 2 + 1).as("src"), (col("pk") * 2).as("dst")))
    val e = DedupOps.eagerCheckpoint(edges)
    val dist0 = li.agg((min(col("pk")) * 2).as("node"))
      .select(col("node"), lit(0).as("hop"))
    val dist3 = (1 to 3).foldLeft(dist0) { (dist, h) =>
      val next = e.join(dist.filter(col("hop") === h - 1),
          e("src") === dist("node"))
        .select(e("dst").as("node"), lit(h).as("hop"))
      DedupOps.eagerCheckpoint(
        dist.unionAll(next).groupBy("node").agg(min(col("hop")).as("hop")))
    }
    dist3.orderBy(col("hop").asc, col("node").asc)
  }

  /** Safety cap for the convergence-driven BFS: far above any plausible
    * diameter of the small-world basket graph (the fixture converges in
    * single digits); the oracle's recursion guard uses the same bound so
    * the two sides agree even on a pathological path graph. */
  private val MaxBfsRounds = 50

  /** Convergence-driven BFS — the unbounded twin of [[graphBfsLevels]]:
    * expand until the FRONTIER (nodes first seen this round) is empty,
    * the same drive-to-fixpoint signal as
    * [[DedupOps.connectedComponents]]. Scale shape: each round joins the
    * static checkpointed edge list against only the NEW frontier (not
    * the whole distance table — the anti-join keeps re-expansion of
    * settled nodes out of the shuffle), checkpoints the result to
    * truncate lineage, and the driver holds nothing but the loop
    * counter; rounds = graph diameter, each a keyed shuffle. */
  def graphBfsConverged(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")).distinct()
    val edges = li.select((col("pk") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .unionAll(li.select((col("sk") * 2 + 1).as("src"), (col("pk") * 2).as("dst")))
    val e = DedupOps.eagerCheckpoint(edges)
    // the distance table is kept as a UNION of the per-round checkpointed
    // frontiers (disjoint by construction — each round anti-joins the
    // previous union) instead of being re-checkpointed whole every round:
    // that re-materialized O(V) rows per round for a table whose only
    // per-round use is the anti-join's build side, and it was one of the
    // two actions each round paid (r18; same fixpoint, rounds ≤ 50 keep
    // the union plan bounded).
    var distParts = List(DedupOps.eagerCheckpoint(
      li.agg((min(col("pk")) * 2).as("node")).select(col("node"), lit(0).as("hop"))))
    def dist: DataFrame = distParts.reduce(_ unionAll _)
    var frontier = distParts.head
    // the frontier-empty probe rides the checkpoint action as an
    // observed count(1) instead of a separate limit(1).count() job —
    // one action per round, not two (r19; the r18-rejected Observation
    // idea, now hang-proof: getOrEmpty never blocks, and a missing
    // metric falls back to the old probe). The seed frontier is one row
    // by construction, so the first round needs no probe.
    var frontierRows = 1L
    var h = 0
    while (frontierRows > 0 && h < MaxBfsRounds) {
      h += 1
      val next = e.join(frontier, e("src") === frontier("node"))
        .select(e("dst").as("node"), lit(h).as("hop"))
      val obs = org.apache.spark.sql.Observation()
      frontier = DedupOps.eagerCheckpoint(
        next.join(dist, Seq("node"), "left_anti")
          .groupBy("node").agg(min(col("hop")).as("hop"))
          .observe(obs, count(lit(1)).as("rows")))
      frontierRows = DedupOps.observedLong(obs, "rows") {
        frontier.limit(1).count()
      }
      distParts = distParts :+ frontier
    }
    dist.orderBy(col("hop").asc, col("node").asc)
  }

  val queries: Map[String, Q] = Map(
    "graph_triangles"     -> (graphTriangles _),
    "graph_local_cc"      -> (graphLocalCc _),
    "graph_bfs_levels"    -> (graphBfsLevels _),
    "graph_bfs_converged" -> (graphBfsConverged _),
    "graph_pagerank"      -> (graphPagerank _))

  /** One unrolled PageRank iteration as a DuckDB CTE — arithmetic stated
    * step-for-step as the Spark side: quantize each contribution to
    * binary fixed point (floor(x·2³⁰) as BIGINT), sum exactly, convert
    * back with an exact power-of-two divide. */
  private def prIterSql(cur: String, prev: String): String =
    s"""$cur AS (SELECT dst AS node,
       |  0.15 + 0.85 * (CAST(CAST(SUM(CAST(FLOOR(
       |      pr / CAST(deg AS DOUBLE) * 1073741824.0) AS BIGINT)) AS BIGINT)
       |    AS DOUBLE) / 1073741824.0) AS pr
       |  FROM eo JOIN $prev ON eo.src = $prev.node GROUP BY dst)""".stripMargin

  val oracle: Map[String, String] = Map(
    "graph_bfs_levels" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
        |e AS (SELECT pk * 2 AS src, sk * 2 + 1 AS dst FROM li
        |      UNION ALL SELECT sk * 2 + 1 AS src, pk * 2 AS dst FROM li),
        |walk(node, hop) AS (
        |  SELECT (SELECT min(pk) * 2 FROM li) AS node, 0 AS hop
        |  UNION
        |  SELECT e.dst, w.hop + 1
        |  FROM walk w JOIN e ON e.src = w.node WHERE w.hop < 3)
        |SELECT node, min(hop) AS hop FROM walk
        |GROUP BY node ORDER BY hop ASC, node ASC""".stripMargin,
    "graph_bfs_converged" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
        |e AS (SELECT pk * 2 AS src, sk * 2 + 1 AS dst FROM li
        |      UNION ALL SELECT sk * 2 + 1 AS src, pk * 2 AS dst FROM li),
        |walk(node, hop) AS (
        |  SELECT (SELECT min(pk) * 2 FROM li) AS node, 0 AS hop
        |  UNION
        |  SELECT e.dst, w.hop + 1
        |  FROM walk w JOIN e ON e.src = w.node WHERE w.hop < 50)
        |SELECT node, min(hop) AS hop FROM walk
        |GROUP BY node ORDER BY hop ASC, node ASC""".stripMargin,
    "graph_pagerank" ->
      s"""WITH li AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
         |e AS (SELECT pk * 2 AS src, sk * 2 + 1 AS dst FROM li
         |      UNION ALL SELECT sk * 2 + 1, pk * 2 FROM li),
         |d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |eo AS (SELECT e.src, e.dst, d.deg FROM e JOIN d USING (src)),
         |p0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS pr FROM d),
         |${prIterSql("p1", "p0")},
         |${prIterSql("p2", "p1")},
         |${prIterSql("p3", "p2")}
         |SELECT p3.node, d.deg, p3.pr
         |FROM p3 JOIN d ON p3.node = d.src
         |ORDER BY pr DESC, node ASC LIMIT 20""".stripMargin,
    "graph_local_cc" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |ed AS (SELECT DISTINCT a.pk AS x, b.pk AS y
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT n AS node, count(*) AS deg FROM
        |  (SELECT x AS n FROM ed UNION ALL SELECT y FROM ed) GROUP BY 1),
        |tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
        |        FROM ed e1 JOIN ed e2 ON e1.y = e2.x
        |                   JOIN ed e3 ON e3.x = e1.x AND e3.y = e2.y),
        |cr AS (SELECT a AS node FROM tri UNION ALL
        |       SELECT b FROM tri UNION ALL SELECT c FROM tri),
        |t AS (SELECT node, count(*) AS n_tri FROM cr GROUP BY 1)
        |SELECT t.node AS node, deg.deg, t.n_tri,
        |  CAST(t.n_tri * 2 AS DOUBLE)
        |    / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) AS lcc
        |FROM t JOIN deg ON t.node = deg.node
        |WHERE deg.deg >= 2
        |ORDER BY n_tri DESC, t.node ASC LIMIT 100""".stripMargin,
    "graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |ed AS (SELECT DISTINCT a.pk AS x, b.pk AS y
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |nodes AS (SELECT count(DISTINCT n) AS n_nodes FROM
        |  (SELECT x AS n FROM ed UNION ALL SELECT y FROM ed)),
        |ne AS (SELECT count(*) AS n_edges FROM ed),
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM ed e1 JOIN ed e2 ON e1.y = e2.x
        |                   JOIN ed e3 ON e3.x = e1.x AND e3.y = e2.y)
        |SELECT n_nodes, n_edges, n_triangles FROM nodes, ne, tri""".stripMargin)
}
