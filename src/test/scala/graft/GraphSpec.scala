package graft

import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  //   1 -> 10, 1 -> 11, 2 -> 10, 3 -> 12 ; 4 isolated
  private lazy val g = PropertyGraph(
    Seq((1L, "u"), (2L, "u"), (3L, "u"), (4L, "u"),
        (10L, "v"), (11L, "v"), (12L, "v")).toDF("id", "type"),
    Seq((1L, 10L, 5.0), (1L, 11L, 1.0), (2L, 10L, 3.0), (3L, 12L, 2.0))
      .toDF("src", "dst", "weight"))

  test("out/in degrees match hand counts") {
    val outD = g.outDegrees.as[(Long, Long)].collect().toMap
    val inD = g.inDegrees.as[(Long, Long)].collect().toMap
    assert(outD == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    assert(inD == Map(10L -> 2L, 11L -> 1L, 12L -> 1L))
  }

  test("filterVertices drops incident edges; filterEdges keeps vertices") {
    val sub = g.filterVertices($"id" =!= 1L)
    assert(sub.vertices.count() == 6)
    assert(sub.edges.count() == 2) // 1->10 and 1->11 dropped
    val fe = g.filterEdges($"weight" >= 3.0)
    assert(fe.vertices.count() == 7 && fe.edges.count() == 2)
  }

  test("pageRank gives the double-cited sink the top score") {
    val pr = g.pageRank(tol = 0.001).as[(Long, Double)].collect().toMap
    assert(pr(10L) > pr(11L) && pr(10L) > pr(12L))
    assert(pr.values.forall(_ > 0))
  }

  test("connectedComponents separates the two components and the isolate") {
    val cc = g.connectedComponents().as[(Long, Long)].collect().toMap
    assert(cc(1L) == cc(10L) && cc(1L) == cc(11L) && cc(1L) == cc(2L))
    assert(cc(3L) == cc(12L) && cc(3L) != cc(1L))
    assert(cc(4L) != cc(1L) && cc(4L) != cc(3L))
  }

  test("bfs finds shortest path over symmetrized edges") {
    val sym = PropertyGraph(g.vertices,
      g.edges.select("src", "dst")
        .unionAll(g.edges.select($"dst".as("src"), $"src".as("dst"))))
    // 11 -> 1 -> 10 -> 2 : length 3
    val res = sym.bfs($"id" === 11L, $"id" === 2L, 5)
      .select("length", "path").as[(Int, Seq[Long])].collect()
    assert(res.nonEmpty)
    assert(res.head._1 == 3)
    assert(res.head._2 == Seq(11L, 1L, 10L, 2L))
    // unreachable within maxPathLength
    assert(sym.bfs($"id" === 11L, $"id" === 2L, 1).isEmpty)
    // depth-0 hit: start == target
    val self = sym.bfs($"id" === 1L, $"id" === 1L, 3)
      .select("length").as[Int].collect()
    assert(self.toSeq == Seq(0))
  }

  test("threeStarMotif enumerates ordered spoke triples once") {
    val star = PropertyGraph(
      Seq((1L, ""), (2L, ""), (3L, ""), (4L, ""), (10L, "")).toDF("id", "type"),
      Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)).toDF("src", "dst"))
    val triples = star.threeStarMotif().collect()
    assert(triples.length == 4) // C(4,3)
    assert(g.threeStarMotif().count() == 0) // max in-degree 2 in g
  }

  test("labelPropagation assigns every vertex a label") {
    val lp = g.labelPropagation(4)
    assert(lp.count() == 7)
    assert(lp.filter($"label".isNull).count() == 0)
  }
}
