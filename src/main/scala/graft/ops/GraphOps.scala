package graft.ops

import graft.Tables
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

  /** Triangle census of the part co-purchase graph: one row with node,
    * edge and triangle counts. Edges are deduplicated (x < y) before
    * counting, so multi-order co-purchases weigh once. */
  def graphTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("x"), col("b.pk").as("y")).distinct()
    val deg = e.select(col("x").as("node")).unionAll(e.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // total order for orientation: (degree, id) — ties on degree broken
    // by id, so the orientation is a DAG and each triangle has exactly
    // one edge between its two order-smallest nodes
    val oriented = e
      .join(deg.withColumnRenamed("node", "x").withColumnRenamed("deg", "dx"), "x")
      .join(deg.withColumnRenamed("node", "y").withColumnRenamed("deg", "dy"), "y")
      .select(
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")),
          struct(col("x").as("u"), col("y").as("v")))
          .otherwise(struct(col("y").as("u"), col("x").as("v")))
          .as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"))
    // adjacency-intersection closing (instead of materializing the wedge
    // pair space and shuffle-joining it against the edge set): a triangle
    // {a,b,c} is counted exactly once, at the edge between its two
    // order-smallest nodes, as one hit of N⁺(u) ∩ N⁺(v). Out-lists are
    // O(√m) long after orientation, so the replicated-array volume is
    // the same O(m^{3/2}) the wedge join moves — but packed into one row
    // per edge rather than one row per wedge, and the closing join
    // disappears into an in-row array_intersect.
    val adj = oriented.groupBy("u").agg(collect_list(col("v")).as("nbrs"))
    val nTri = oriented
      .join(adj.select(col("u"), col("nbrs").as("un")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("vn")), Seq("v"))
      .select(size(array_intersect(col("un"), col("vn"))).cast("long").as("t"))
      .agg(coalesce(sum(col("t")), lit(0L)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(nTri)
  }

  val queries: Map[String, Q] = Map(
    "graph_triangles" -> (graphTriangles _))

  val oracle: Map[String, String] = Map(
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
