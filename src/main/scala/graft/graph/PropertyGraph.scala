package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Property graph over a pair of DataFrames — the reference's
  * GraphFrame surface (goodreads.py:463–683) rebuilt on vanilla Spark:
  * degree/subgraph ops stay declarative DataFrame code (one shuffle,
  * Catalyst-visible), iterative algorithms adapt to GraphX (which ships
  * with Spark; GraphFrames does not).
  *
  * `vertices` must have a Long `id` column; `edges` must have Long
  * `src`/`dst` columns. Extra columns are vertex/edge attributes.
  */
final case class PropertyGraph(vertices: DataFrame, edges: DataFrame) {

  /** G5 (goodreads.py:552): out-degree per vertex = edges.groupBy(src). */
  def outDegrees: DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outDegree"))

  /** G5 (goodreads.py:563): in-degree per vertex. */
  def inDegrees: DataFrame =
    edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("inDegree"))

  def degrees: DataFrame =
    edges.select(col("src").as("id")).unionAll(edges.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))

  /** G3 (goodreads.py:569): keep vertices satisfying `cond`; edges are
    * restricted to those with BOTH endpoints surviving (two semi-joins —
    * each broadcastable when the surviving vertex set is small). */
  def filterVertices(cond: Column): PropertyGraph = {
    val v = vertices.filter(cond)
    val ids = v.select("id")
    val e = edges
      .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    PropertyGraph(v, e)
  }

  /** G4 (goodreads.py:541,575): keep edges satisfying `cond` (vertex
    * set unchanged — GraphFrames semantics). */
  def filterEdges(cond: Column): PropertyGraph =
    PropertyGraph(vertices, edges.filter(cond))

  /** Shared unweighted GraphX view — built (and cached) once per
    * PropertyGraph instance so PageRank / label propagation / connected
    * components on the same memoized graph reuse one RDD lineage. */
  lazy val graphX: Graph[Int, Double] = toGraphX(None)

  /** Partitioning for Pregel supersteps: iterative message passing
    * wants FEWER, chunkier partitions than SQL shuffles — per-superstep
    * task scheduling plus per-partition message maps dominate at high
    * partition counts (measured at sf0.1/local[32]: label propagation
    * 27.5 s on 32 partitions vs 12.2 s on 8). Scales with cluster
    * parallelism; floor of 4 keeps small boxes busy. */
  private def graphParts: Int =
    math.max(4, spark.sparkContext.defaultParallelism / 4)

  /** Dataset ⇄ GraphX adapter. Vertex attribute = unit (algorithms
    * below don't need attributes); edge attribute = optional numeric
    * weight column. */
  def toGraphX(weightCol: Option[String] = None): Graph[Int, Double] = {
    val p = graphParts
    val eRdd = weightCol match {
      case Some(w) => edges.select(col("src").cast("long"), col("dst").cast("long"),
          col(w).cast("double"))
        .coalesce(p).rdd.map((r: Row) => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
      case None => edges.select(col("src").cast("long"), col("dst").cast("long"))
        .coalesce(p).rdd.map((r: Row) => Edge(r.getLong(0), r.getLong(1), 1.0))
    }
    val vRdd = vertices.select(col("id").cast("long"))
      .coalesce(p).rdd.map((r: Row) => (r.getLong(0): VertexId, 1))
    Graph(vRdd, eRdd, defaultVertexAttr = 1,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  private def spark: SparkSession = vertices.sparkSession

  /** G9 (goodreads.py:618): PageRank until convergence — GraphX Pregel
    * under the hood, same semantics as GraphFrames' resetProbability/tol
    * form (scores sum ≈ N, matching the reference's magnitudes). */
  def pageRank(tol: Double = 0.01, resetProb: Double = 0.15): DataFrame = {
    val ranks = graphX.pageRank(tol, resetProb).vertices
    spark.createDataFrame(ranks.map { case (id, r) => (id, r) })
      .toDF("id", "pagerank")
  }

  /** G8 (goodreads.py:594): synchronous label propagation, maxIter
    * supersteps (GraphX lib — deterministic given the graph). */
  def labelPropagation(maxIter: Int): DataFrame = {
    val labels = org.apache.spark.graphx.lib.LabelPropagation
      .run(graphX, maxIter).vertices
    spark.createDataFrame(labels.map { case (id, l) => (id, l) })
      .toDF("id", "label")
  }

  /** Connected components (undirected) via GraphX. */
  def connectedComponents(): DataFrame = {
    val cc = graphX.connectedComponents().vertices
    spark.createDataFrame(cc.map { case (id, c) => (id, c) })
      .toDF("id", "component")
  }

  /** G6 (goodreads.py:588): BFS shortest paths from vertices matching
    * `fromCond` to vertices matching `toCond`, following edge direction,
    * up to `maxPathLength` hops. Iterative frontier expansion — one join
    * per superstep, exactly how GraphFrames compiles it. Returns
    * (start, end, length, path[array<long>]) for the FIRST depth at
    * which any target is reached (shortest).
    */
  def bfs(fromCond: Column, toCond: Column, maxPathLength: Int): DataFrame = {
    val targets = vertices.filter(toCond).select(col("id").as("end"))
    var frontier = vertices.filter(fromCond)
      .select(col("id").as("start"), col("id").as("cur"),
        array(col("id")).as("path"))
    val e = edges.select(col("src"), col("dst"))

    // depth 0: source already matches target
    val hit0 = frontier.join(targets, frontier("cur") === targets("end"))
      .select(col("start"), col("end"), lit(0).as("length"), col("path"))
    if (!hit0.isEmpty) return hit0

    var depth = 0
    while (depth < maxPathLength && !frontier.isEmpty) {
      depth += 1
      frontier = frontier.join(e, frontier("cur") === e("src"))
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("start"), col("dst").as("cur"),
          concat(col("path"), array(col("dst"))).as("path"))
        .localCheckpoint() // cut lineage per superstep
      val hits = frontier.join(targets, frontier("cur") === targets("end"))
        .select(col("start"), col("end"), lit(depth).as("length"), col("path"))
      if (!hits.isEmpty) return hits
    }
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      new org.apache.spark.sql.types.StructType()
        .add("start", "long").add("end", "long").add("length", "int")
        .add("path", "array<long>"))
  }

  /** G10 (goodreads.py:500–541): the reference's graph-visualization
    * cell is driver-side matplotlib — out of engine scope; the engine
    * provides the data half: a bounded edge sample for a plotting
    * client (`take(1000)` equivalent, deterministic order). */
  def sampleEdges(n: Int): DataFrame =
    edges.orderBy("src", "dst").limit(n)

  /** G7 (goodreads.py:582): the reference's fixed 3-star motif —
    * (a)-[]->(b); (c)-[]->(b); (d)-[]->(b) with distinct spokes —
    * compiled to self-equi-joins on dst, spokes ordered a<c<d so each
    * triple appears once. Returns (hub, s1, s2, s3). */
  def threeStarMotif(): DataFrame = {
    val e1 = edges.select(col("dst").as("hub"), col("src").as("s1"))
    val e2 = edges.select(col("dst").as("hub"), col("src").as("s2"))
    val e3 = edges.select(col("dst").as("hub"), col("src").as("s3"))
    e1.join(e2, Seq("hub")).filter(col("s1") < col("s2"))
      .join(e3, Seq("hub")).filter(col("s2") < col("s3"))
      .select("hub", "s1", "s2", "s3")
  }
}

object PropertyGraph {
  /** Bipartite customer→part graph from the star schema (the testdata
    * analog of the reference's user→book ratings graph,
    * goodreads.py:473–489): one edge per (customer, part) with
    * avg-quantity weight. Vertices = customers ∪ parts, tagged. */
  def customerPartGraph(spark: SparkSession, dir: String): PropertyGraph =
    graft.Memo.obj(spark, s"customerPartGraph|$dir") {
      import graft.Tables
      val orders = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey", "l_quantity")
      // part ids shifted out of the customer id space, like the
      // reference's book_id + 100000 (goodreads.py:105)
      val edges = graft.Memo.df(spark, s"customerPartEdges|$dir") {
        li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("src"),
            (col("l_partkey") + 1000000L).as("dst"))
          .agg(round(avg("l_quantity"), 6).as("weight"), count(lit(1)).as("n_lines"))
      }
      val customers = Tables.customer(spark, dir)
        .select(col("c_custkey").cast("long").as("id"), col("c_name").as("name"),
          lit("Customer").as("type"), col("c_acctbal").as("balance"))
      val parts = Tables.part(spark, dir)
        .select((col("p_partkey") + 1000000L).as("id"), col("p_name").as("name"),
          lit("Part").as("type"), col("p_retailprice").as("balance"))
      PropertyGraph(customers.unionByName(parts), edges)
    }
}
