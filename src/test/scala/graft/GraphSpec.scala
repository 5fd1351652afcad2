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

  test("pageRank(tol) converges to pageRankFixed's fixed point (SURVEY §7.5 risk 1)") {
    import graft.graph.IterativeGraph
    // same recurrence, two engines: GraphX Pregel with tol-based
    // stopping vs the DataFrame fixed-iteration form (g05 vs g10).
    // Their common fixed point r(v) = 0.15 + 0.85·Σ r(u)/outdeg(u)
    // is unique, so a tight tol and enough supersteps must agree —
    // the attainable stand-in for the notebook's 109.789 golden,
    // which needs the real Goodreads data.
    val gx = g.pageRank(tol = 1e-8).as[(Long, Double)].collect().toMap
    val raw = IterativeGraph.pageRankFixed(g.vertices, g.edges, iters = 60)
      .as[(Long, Double)].collect().toMap
    assert(gx.keySet == raw.keySet)
    // GraphX's tol form normalizes the rank SUM to N (SPARK-18847
    // dangling-mass correction); the fixed form keeps the raw
    // recurrence values — same fixed point up to that global scale
    val scale = raw.size / raw.values.sum
    val fixed = raw.view.mapValues(_ * scale).toMap
    for ((id, r) <- fixed)
      assert(math.abs(gx(id) - r) < 1e-4, s"vertex $id: graphx=${gx(id)} fixed=$r")
    // rank ORDERING identical (the signal g05's rows-only check rides on)
    val ordGx = gx.toSeq.sortBy { case (id, r) => (-r, id) }.map(_._1)
    val ordFx = fixed.toSeq.sortBy { case (id, r) => (-r, id) }.map(_._1)
    assert(ordGx == ordFx)
  }

  test("connectedComponents separates the two components and the isolate") {
    val cc = g.connectedComponents().as[(Long, Long)].collect().toMap
    assert(cc(1L) == cc(10L) && cc(1L) == cc(11L) && cc(1L) == cc(2L))
    assert(cc(3L) == cc(12L) && cc(3L) != cc(1L))
    assert(cc(4L) != cc(1L) && cc(4L) != cc(3L))
  }

  test("largeStarSmallStar: exact components on fixtures incl. a long chain; GraphX parity") {
    import graft.graph.IterativeGraph
    // the standard fixture: component {1,2,10,11}, {3,12}, isolate 4
    val lbl = IterativeGraph.largeStarSmallStar(g.vertices, g.edges)
      .as[(Long, Long)].collect().toMap
    assert(lbl(1L) == 1L && lbl(2L) == 1L && lbl(10L) == 1L && lbl(11L) == 1L)
    assert(lbl(3L) == 3L && lbl(12L) == 3L)
    assert(lbl(4L) == 4L)
    // a 40-node chain: diameter 39 ≫ the O(log n) star rounds — the
    // converged output must still be exact (min-label at 6 supersteps
    // would NOT be), plus a parity check against GraphX CC
    val chainV = (1L to 40L).toDF("id")
    val chainE = (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val star = IterativeGraph.largeStarSmallStar(chainV, chainE)
      .as[(Long, Long)].collect().toMap
    assert(star.values.toSet == Set(1L) && star.size == 40)
    val gx = PropertyGraph(chainV.withColumn("type", lit("n")), chainE)
      .connectedComponents().as[(Long, Long)].collect().toMap
    assert(star.keySet == gx.keySet && gx.values.toSet.size == 1)
  }

  test("inNeighborhoodJaccard: hand overlaps exact; hub sources dropped by the cap") {
    // buyers 1,2,3 → parts 10,11,12; buyer 4 is a hub buying everything
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 12L), (4L, 10L), (4L, 11L), (4L, 12L))
      .toDF("src", "dst")
    val gj = PropertyGraph(
      Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L).toDF("id"), edges)
    // cap 2 drops hub 4: N(10)={1,2,3}, N(11)={1,2}, N(12)={3}
    val got = gj.inNeighborhoodJaccard(maxSrcOutDeg = 2, minJaccard = 0.01)
      .select("id_a", "id_b", "common", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got((10L, 11L)) == ((2L, 0.666667)))
    assert(got((10L, 12L)) == ((1L, 0.333333)))
    assert(!got.contains((11L, 12L))) // no shared buyer under the cap
    // without the cap the hub links everything, incl. (11,12)
    val uncapped = gj.inNeighborhoodJaccard(maxSrcOutDeg = 10, minJaccard = 0.01)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((11L, 12L)))
  }

  test("bfs finds shortest path, GraphFrames-shaped (from, e0, v1, …, to)") {
    val sym = PropertyGraph(g.vertices,
      g.edges.select("src", "dst")
        .unionAll(g.edges.select($"dst".as("src"), $"src".as("dst"))))
    // 11 -> 1 -> 10 -> 2 : length 3
    val res = sym.bfs($"id" === 11L, $"id" === 2L, 5)
    assert(res.columns.toSeq == Seq("from", "e0", "v1", "e1", "v2", "e2", "to"))
    val row = res.select($"from.id", $"e0.src", $"e0.dst", $"v1.id", $"v2.id", $"to.id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(row.toSeq == Seq((11L, 11L, 1L, 1L, 10L, 2L)))
    // vertex structs carry the full attribute row, like GraphFrames
    assert(res.select($"from.type").as[String].head() == "v") // vertex 11 is a "v"
    // unreachable within maxPathLength → empty, (from, to) schema
    val none = sym.bfs($"id" === 11L, $"id" === 2L, 1)
    assert(none.isEmpty && none.columns.toSeq == Seq("from", "to"))
    // depth-0 hit: start == target
    val self = sym.bfs($"id" === 1L, $"id" === 1L, 3)
      .select($"from.id", $"to.id").as[(Long, Long)].collect()
    assert(self.toSeq == Seq((1L, 1L)))
  }

  test("bfs prunes to one canonical shortest path on a diamond graph") {
    // 1 -> {2, 4} -> 3 : two equal-length paths; pruned BFS keeps the
    // lexicographically least (via 2) and emits exactly one row
    val diamond = PropertyGraph(
      Seq((1L, ""), (2L, ""), (3L, ""), (4L, "")).toDF("id", "type"),
      Seq((1L, 2L), (1L, 4L), (2L, 3L), (4L, 3L)).toDF("src", "dst"))
    val res = diamond.bfs($"id" === 1L, $"id" === 3L, 5)
    val rows = res.select($"from.id", $"v1.id", $"to.id")
      .as[(Long, Long, Long)].collect()
    assert(rows.toSeq == Seq((1L, 2L, 3L)))
  }

  test("threeStarMotif enumerates ordered spoke triples once") {
    val star = PropertyGraph(
      Seq((1L, ""), (2L, ""), (3L, ""), (4L, ""), (10L, "")).toDF("id", "type"),
      Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)).toDF("src", "dst"))
    val triples = star.threeStarMotif().collect()
    assert(triples.length == 4) // C(4,3)
    assert(g.threeStarMotif().count() == 0) // max in-degree 2 in g
    // hub-degree cap drops the hot hub entirely from the join form
    assert(star.threeStarMotif(maxHubDegree = 3).count() == 0)
  }

  test("threeStarCounts matches the materialized motif count, join-free") {
    val star = PropertyGraph(
      Seq((1L, ""), (2L, ""), (3L, ""), (4L, ""), (5L, ""), (10L, ""), (11L, ""))
        .toDF("id", "type"),
      Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 10L),
          (1L, 11L), (2L, 11L), (3L, 11L)).toDF("src", "dst"))
    val closed = star.threeStarCounts().as[(Long, Long)].collect().toMap
    assert(closed == Map(10L -> 10L, 11L -> 1L)) // C(5,3)=10, C(3,3)=1
    val materialized = star.threeStarMotif().groupBy("hub").count()
      .as[(Long, Long)].collect().toMap
    assert(closed == materialized)
    // the closed form is ONE aggregation — no join anywhere in the plan
    val plan = star.threeStarCounts().queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"C(d,3) path must not join:\n$plan")
  }

  test("find: motif DSL binds named vertices/edges, unifies repeats") {
    // 2-hop path over the symmetrized fixture: (a)-[e1]->(b)-[e2]->(c)
    val res = g.find("(a)-[e1]->(b); (b)-[e2]->(c)")
    assert(res.columns.toSeq == Seq("a", "e1", "b", "e2", "c"))
    // directed edges: only user->book exists, so no 2-hop path
    assert(res.count() == 0)
    val sym = PropertyGraph(g.vertices,
      g.edges.unionAll(g.edges.select($"dst".as("src"), $"src".as("dst"),
        $"weight")))
    val twoHop = sym.find("(a)-[e1]->(b); (b)-[e2]->(c)")
      .filter($"a.id" =!= $"c.id")
      .select($"a.id", $"b.id", $"c.id").as[(Long, Long, Long)].collect().toSet
    // 1-10-2, 2-10-1, 11-1-10, 10-1-11, 1->10/11 via 1's two books, etc.
    assert(twoHop.contains((11L, 1L, 10L)) && twoHop.contains((2L, 10L, 1L)))
    // edge structs carry attributes; filters work GraphFrames-style
    val heavy = sym.find("(a)-[e]->(b)").filter("e.weight >= 3.0")
    assert(heavy.count() == 4) // 1->10 (5.0) and 2->10 (3.0), both directions
    // same-vertex self-loop pattern: none in the fixture
    assert(g.find("(a)-[e]->(a)").count() == 0)
  }

  test("find: the reference's shared-book pattern and negation") {
    // 2 users sharing a book: (u1)->(b)<-(u2), canonicalized
    val shared = g.find("(u1)-[r1]->(b); (u2)-[r2]->(b)")
      .filter($"u1.id" < $"u2.id")
      .select($"u1.id", $"u2.id", $"b.id").as[(Long, Long, Long)].collect().toSet
    assert(shared == Set((1L, 2L, 10L))) // only book 10 has 2 readers
    // anonymous elements match without binding
    assert(g.find("()-[e]->(b)").columns.toSeq == Seq("e", "b"))
    // negation: open 2-paths only — the closing edge kills 1->2->3
    val tri = PropertyGraph(
      Seq((1L, ""), (2L, ""), (3L, "")).toDF("id", "type"),
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"))
    assert(tri.find("(a)-[e1]->(b); (b)-[e2]->(c)").count() == 1) // 1->2->3
    assert(tri.find("(a)-[e1]->(b); (b)-[e2]->(c); !(a)-[]->(c)").count() == 0)
    // parser/compiler reject malformed or unbound patterns
    intercept[IllegalArgumentException](g.find("(a)->(b)"))
    intercept[IllegalArgumentException](g.find("!(a)-[e]->(b)"))
    intercept[IllegalArgumentException](g.find("(a)-[e]->(b); (c)-[e]->(d)"))
    intercept[IllegalArgumentException](g.find("(a)-[e]->(b); !(a)-[]->(z)"))
    intercept[IllegalArgumentException](g.find("(a)-[b]->(b)")) // name reuse across kinds
  }

  test("powerSmoothingFixed computes v+ = D^-1 W v with degree-proportional start") {
    import graft.graph.IterativeGraph
    // path graph 1-2-3, unit weights: deg = (1,2,1), n=3, sumdeg=4
    // v0 = (0.75, 1.5, 0.75); one step: v1 = (1.5, 0.75, 1.5)
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "weight")
    val v1 = IterativeGraph.powerSmoothingFixed(edges, "weight", iters = 1)
      .as[(Long, Double)].collect().toMap
    assert(v1 == Map(1L -> 1.5, 2L -> 0.75, 3L -> 1.5))
    // the path graph is bipartite: the iteration is period-2, so two
    // steps return exactly to v0 — pins the map applied twice
    val v2 = IterativeGraph.powerSmoothingFixed(edges, "weight", iters = 2)
      .as[(Long, Double)].collect().toMap
    assert(v2 == Map(1L -> 0.75, 2L -> 1.5, 3L -> 0.75))
  }

  test("labelPropagation assigns every vertex a label") {
    val lp = g.labelPropagation(4)
    assert(lp.count() == 7)
    assert(lp.filter($"label".isNull).count() == 0)
  }

  test("triangleCounts matches hand counts and GraphX on a known graph") {
    // K4 on {1,2,3,4} (4 triangles, 3 per vertex) plus pendant 5-1 and
    // isolated 6; edges deliberately mixed-direction + one duplicate
    // to exercise canonicalization
    val tg = PropertyGraph(
      (1L to 6L).map((_, "")).toDF("id", "type"),
      Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L),
        (3L, 4L), (5L, 1L)).toDF("src", "dst"))
    val got = tg.triangleCounts().as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L, 6L -> 0L))
    // GraphX's library TriangleCount agrees (canonicalized input)
    val gx = org.apache.spark.graphx.lib.TriangleCount
      .run(tg.graphX).vertices.collect().toMap
    for ((id, n) <- got) assert(gx.getOrElse(id, 0) == n, s"vertex $id")
  }

  test("aggregateMessages sums weighted messages in both directions") {
    // msg to dst: src weight; msg to src: constant 1 → per-vertex
    // (sum, count) over the fixture graph g
    val am = tg17Fixture.aggregateMessages(
      msgToSrc = Some(lit(1.0)),
      msgToDst = Some($"edge.weight"),
      sum($"msg").as("s"), count(lit(1)).as("n"))
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // vertex 1: two to-src msgs (1+1); vertex 10: edges w=5,3 → 8
    assert(am(1L) == ((2.0, 2L)))
    assert(am(10L) == ((8.0, 2L)))
    assert(am(11L) == ((1.0, 1L)) && am(12L) == ((2.0, 1L)))
    assert(!am.contains(4L)) // isolated vertices receive no messages
    intercept[IllegalArgumentException](
      tg17Fixture.aggregateMessages(None, None, sum($"msg")))
  }
  private def tg17Fixture = g

  test("stronglyConnectedComponents: cycles group, DAG tails stay singletons") {
    // digraph: 3-cycle {1,2,3}, 2-cycle {4,5}, chain 3→4, tail 6 (6→1)
    val dg = PropertyGraph(
      (1L to 6L).map((_, "")).toDF("id", "type"),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 4L), (3L, 4L), (6L, 1L))
        .toDF("src", "dst"))
    val scc = dg.stronglyConnectedComponents(numIter = 6)
      .as[(Long, Long)].collect().toMap
    assert(scc(1L) == 1L && scc(2L) == 1L && scc(3L) == 1L) // min-id label
    assert(scc(4L) == 4L && scc(5L) == 4L)
    assert(scc(6L) == 6L) // no cycle through 6: its own SCC
    // directed ≠ undirected: one weak component, three SCCs
    assert(dg.connectedComponents().select("component").distinct().count() == 1)
    assert(scc.values.toSet.size == 3)
  }

  test("personalized PageRank keeps reset mass at its own source") {
    import graft.graph.IterativeGraph
    // path 1-2-3 symmetrized; sources 1 and 3 ranked in one loop
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pr = IterativeGraph.personalizedPageRankFixed(
        IterativeGraph.symmetrize(edges), Seq(1L, 3L), iters = 8)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    // locality: each source ranks ITSELF highest, its 1-hop neighbour
    // next, the far end lowest — and the two vectors mirror each other
    assert(pr(1L)(1L) > pr(1L)(2L) && pr(1L)(2L) > pr(1L)(3L))
    assert(pr(3L)(3L) > pr(3L)(2L) && pr(3L)(2L) > pr(3L)(1L))
    assert(math.abs(pr(1L)(3L) - pr(3L)(1L)) < 1e-12) // symmetry
    // per-source mass stays bounded by the unit injection: Σ ≤ 1/(1-d)
    pr.values.foreach(v => assert(v.values.sum <= 1.0 / 0.15 + 1e-9))
  }

  test("shortestPaths returns the GraphFrames map shape over directed edges") {
    import graft.graph.IterativeGraph
    // distances TO landmarks follow edge direction: 1->10 gives
    // dist(1, 10)=1; no path from 10 to anywhere (sinks)
    val sp = g.shortestPaths(Seq(10L, 12L), maxIter = 3)
    assert(sp.columns.toSeq == Seq("id", "type", "distances"))
    val m = sp.select($"id", $"distances").as[(Long, Option[Map[Long, Int]])]
      .collect().toMap
    assert(m(1L).get == Map(10L -> 1))
    assert(m(3L).get == Map(12L -> 1))
    assert(m(10L).get == Map(10L -> 0))
    assert(m(4L).contains(Map.empty)) // unreachable: EMPTY map (GraphFrames parity)
    // long-form core over symmetrized edges reaches 2-hop neighbours
    val d = IterativeGraph.shortestPathsLandmarks(
      IterativeGraph.symmetrize(g.edges), Seq(10L), iters = 2)
      .as[(Long, Long, Int)].collect().map(r => r._2 -> r._3).toMap
    assert(d(10L) == 0 && d(1L) == 1 && d(2L) == 1 && d(11L) == 2)
  }

  test("ssspWeighted: cheap 2-hop path beats the expensive direct edge") {
    import graft.graph.IterativeGraph
    // 1-3 direct costs 10; 1-2-3 costs 2+3=5; 4 needs 3 hops (never
    // cheaper via 1-3 direct). iters=1 sees only direct edges; iters=2
    // finds the cheap detour; iters=3 reaches 4.
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 10L), (3L, 4L, 1L))
      .toDF("src", "dst", "cost")
    def dists(iters: Int) = IterativeGraph
      .ssspWeighted(edges, sourceId = 1L, iters = iters, costCol = "cost")
      .as[(Long, Long)].collect().toMap
    val d1 = dists(1)
    assert(d1(2L) == 2L && d1(3L) == 10L && !d1.contains(4L))
    val d2 = dists(2)
    assert(d2(3L) == 5L && d2(4L) == 11L)
    val d3 = dists(3)
    assert(d3 == Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 6L))
  }

  test("hyperBallSketches: ball estimates are exact at tiny cardinality, grow with hops") {
    import graft.graph.IterativeGraph
    // path 1-2-3-4-5 (symmetrized): ball(3,1)={2,3,4}, ball(3,2)=all;
    // ball(1,2)={1,2,3} — at these cardinalities HLL is exact
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    def balls(iters: Int): Map[Long, Long] = IterativeGraph
      .hyperBallSketches(edges, iters = iters)
      .select($"id",
        round(graft.functions.PackedHll.hll5Estimate($"sk"))
          .cast("long").as("b"))
      .as[(Long, Long)].collect().toMap
    assert(balls(1) == Map(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 2L))
    assert(balls(2) == Map(1L -> 3L, 2L -> 4L, 3L -> 5L, 4L -> 4L, 5L -> 3L))
  }

  test("kcorePeel: pendant drops first, cascades peel level by level") {
    import graft.graph.IterativeGraph
    // triangle 1-2-3 + path 3-4-5: k=2 → round 1 drops 5 (deg 1);
    // round 2 drops 4 (its only surviving neighbour is 3); round 3
    // the triangle is stable (everyone deg 2)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = IterativeGraph.kcorePeel(edges, k = 2, rounds = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 4L, 4L), (2L, 3L, 3L), (3L, 3L, 3L)))
  }

  test("pageRankWeightedFixed: heavy edge outranks many light ones; uniform weights match unweighted") {
    import graft.graph.IterativeGraph
    val vs = Seq(1L, 2L, 3L, 10L, 11L).toDF("id")
    // 1 splits mass 9:1 toward 10; 2 and 3 send everything to 11 — but
    // 1's heavy edge makes 10 beat a single light full edge
    val es = Seq((1L, 10L, 9.0), (1L, 11L, 1.0), (2L, 10L, 5.0), (3L, 11L, 5.0))
      .toDF("src", "dst", "weight")
    val r = IterativeGraph.pageRankWeightedFixed(vs, es, iters = 3)
      .as[(Long, Double)].collect().toMap
    // 10 receives 0.9 of 1's mass + all of 2's; 11 gets 0.1 + all of 3's
    assert(r(10L) > r(11L))
    // uniform weights ≡ unweighted pagerank
    val uni = IterativeGraph.pageRankWeightedFixed(vs,
        es.withColumn("weight", lit(2.5)), iters = 3)
      .as[(Long, Double)].collect().toMap
    val plain = IterativeGraph.pageRankFixed(vs,
        es.select("src", "dst"), iters = 3)
      .as[(Long, Double)].collect().toMap
    uni.foreach { case (id, v) => assert(math.abs(v - plain(id)) < 1e-12) }
  }

  test("hitsFixed: unit-norm scores, the popular sink is the authority, the broad source the hub") {
    import graft.graph.IterativeGraph
    // 1,2,3 → 10; 3 → 11: node 10 is the clear authority, node 3 (the
    // only 2-out-edge hub) the top hub; pure sources get auth 0, pure
    // sinks hub 0
    val vs = Seq(1L, 2L, 3L, 10L, 11L).toDF("id")
    val es = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L)).toDF("src", "dst")
    val got = IterativeGraph.hitsFixed(vs, es, iters = 3)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap // id -> (hub, auth)
    def l2(xs: Iterable[Double]) = math.sqrt(xs.map(x => x * x).sum)
    assert(math.abs(l2(got.values.map(_._1)) - 1.0) < 1e-9)
    assert(math.abs(l2(got.values.map(_._2)) - 1.0) < 1e-9)
    assert(got(10L)._2 > got(11L)._2 && got(11L)._2 > 0)
    assert(got(3L)._1 > got(1L)._1 && got(1L)._1 == got(2L)._1)
    assert(got(1L)._2 == 0.0 && got(10L)._1 == 0.0)
  }

  test("walkCorpus: valid neighbor hops, exact length, deterministic, salt reshuffles, edgeless starts dropped") {
    import graft.graph.IterativeGraph
    // path 1-2-3-4-5 plus a star at 10; vertex 99 has no edges
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 2L), (10L, 3L), (10L, 4L)).toDF("src", "dst")
    val starts = Seq(1L, 3L, 10L, 99L).toDF("id")
    val walks = IterativeGraph.walkCorpus(es, starts, steps = 6, salt = "e0")
      .as[(Long, String)].collect().toMap
    // edgeless start emits nothing; the rest emit one walk each
    assert(walks.keySet == Set(1L, 3L, 10L))
    val sym = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 2L),
      (10L, 3L), (10L, 4L)).flatMap { case (a, b) => Seq(a -> b, b -> a) }).toSet
    walks.foreach { case (wid, seq) =>
      val ns = seq.split(" ").map(_.toLong)
      assert(ns.length == 7 && ns.head == wid)
      ns.sliding(2).foreach { case Array(a, b) => assert(sym(a -> b)) }
    }
    // deterministic across runs; a new salt gives a different epoch
    val again = IterativeGraph.walkCorpus(es, starts, steps = 6, salt = "e0")
      .as[(Long, String)].collect().toMap
    assert(again == walks)
    val fresh = IterativeGraph.walkCorpus(es, starts, steps = 6, salt = "e1")
      .as[(Long, String)].collect().toMap
    assert(fresh != walks)
  }

  test("walk-corpus artifact: round-trip equals from-scratch; key mismatch throws") {
    import graft.graph.IterativeGraph
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 2L), (10L, 3L), (10L, 4L)).toDF("src", "dst")
    val starts = Seq(1L, 3L, 10L).toDF("id")
    val path = graft.ScratchDirs.scratch("walk_corpus_spec")
    graft.Fs.deleteRecursive(spark, path)
    IterativeGraph.writeWalkCorpus(es, starts, steps = 5, salt = "e0", path)
    val served = IterativeGraph.readWalkCorpus(spark, path, "e0", steps = 5)
      .as[(Long, String)].collect().toMap
    val fresh = IterativeGraph.walkCorpus(es, starts, steps = 5, salt = "e0")
      .as[(Long, String)].collect().toMap
    assert(served == fresh)
    // downstream consumer served from the artifact ≡ from-scratch
    val viaArtifact = IterativeGraph.skipGramPairs(
      IterativeGraph.readWalkCorpus(spark, path, "e0", steps = 5), window = 2)
      .as[(Long, Long, Long)].collect().toSet
    val direct = IterativeGraph.skipGramPairs(
      IterativeGraph.walkCorpus(es, starts, steps = 5, salt = "e0"), window = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaArtifact == direct && viaArtifact.nonEmpty)
    // wrong epoch salt or wrong length must fail loudly
    intercept[IllegalArgumentException] {
      IterativeGraph.readWalkCorpus(spark, path, "e1", steps = 5)
    }
    intercept[IllegalArgumentException] {
      IterativeGraph.readWalkCorpus(spark, path, "e0", steps = 4)
    }
  }

  test("ppmiPairs: hand-computed PMI, negative-PMI rows dropped") {
    import graft.graph.IterativeGraph
    // (1,2)/(3,4) co-occur 3x each, (1,4) once: total 14, marginals
    // 1->4, 2->3, 3->3, 4->4. ppmi(1,4) = ln(14/16) < 0 -> dropped;
    // all four frequent pairs read ln(3*14/12) = ln 3.5
    val walks = Seq((1L, "1 2"), (2L, "1 2"), (3L, "1 2"),
      (4L, "3 4"), (5L, "3 4"), (6L, "3 4"), (7L, "1 4"))
      .toDF("walk_id", "seq")
    val got = IterativeGraph.ppmiPairs(walks, window = 1)
      .as[(Long, Long, Double)].collect().toSet
    val p = math.rint(math.log(3.5) * 1e6) / 1e6
    assert(got == Set((1L, 2L, p), (2L, 1L, p), (3L, 4L, p), (4L, 3L, p)))
  }

  test("ppmiTopSimilar: cosine over shared contexts, disjoint vectors silent") {
    import graft.graph.IterativeGraph
    // centers 1 and 2 share their only context (3) -> cosine 1.0 both
    // ways; center 3's vector {1, 2} overlaps neither -> no row
    val walks = Seq((1L, "1 3"), (2L, "1 3"), (3L, "2 3"), (4L, "2 3"))
      .toDF("walk_id", "seq")
    val got = IterativeGraph.ppmiTopSimilar(walks, window = 1,
        sparsify = 8, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1.0, 1), (2L, 1L, 1.0, 1)))
  }

  test("node-vector artifact: serve from parquet equals the in-session answer, unknown ids silent") {
    import graft.graph.IterativeGraph
    val walks = Seq((1L, "1 3"), (2L, "1 3"), (3L, "2 3"), (4L, "2 3"))
      .toDF("walk_id", "seq")
    val path = ScratchDirs.scratch("t_ppmi_vectors")
    Fs.deleteRecursive(spark, path)
    IterativeGraph.writeNodeVectors(walks, window = 1, sparsify = 8, path)
    val full = IterativeGraph.ppmiTopSimilar(walks, window = 1,
        sparsify = 8, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    // query {1, 99}: 1 has a vector (serve = the full answer's rows
    // for center 1), 99 was never walked (serves nothing)
    val served = IterativeGraph.similarFromArtifact(spark, path,
        Seq(1L, 99L).toDF("id"), k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served == full.filter(_._1 == 1L))
    assert(served.nonEmpty)
  }

  test("sgnsNegatives: draws follow the unigram mass via an independent md5 replay") {
    import graft.graph.IterativeGraph
    val walks = Seq((1L, "1 2 3"), (9L, "9 2 9")).toDF("walk_id", "seq")
    // mass: node1 c=1 cum=1, node2 c=2 cum=3, node3 c=1 cum=4, node9 c=2 cum=6
    val dist = Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 1L, 4L), (9L, 2L, 6L))
    def expected(center: Long, context: Long, j: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"neg|$center|$context|$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val idx = java.lang.Long.parseLong(hex, 16) % 6
      dist.find { case (_, c, cum) => idx >= cum - c && idx < cum }.get._1
    }
    val got = IterativeGraph.sgnsNegatives(walks, window = 2, negPerPair = 2,
        salt = "neg")
      .as[(Long, Long, Int, Long)].collect()
    val pairs = got.map(r => (r._1, r._2)).distinct
    // window-2 pairs over both walks, each with exactly 2 draws
    assert(got.length == pairs.length * 2)
    got.foreach { case (c, x, j, neg) => assert(neg == expected(c, x, j)) }
  }

  test("node2vecWalks: valid hops, forward bias under tiny return weight, forced endpoint backtrack") {
    import graft.graph.IterativeGraph
    // path 1-2-3-4-5; forward-bias params: returning to prev weighs
    // 2^-10 against 1024 for the distance-2 hop, so an interior node
    // always advances (picking prev needs u < ~1e-9) and only the
    // degree-1 endpoint forces a backtrack
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val starts = Seq(1L).toDF("id")
    val got = IterativeGraph.node2vecWalks(es, starts, steps = 6,
        returnWeight = 0.0009765625, outWeight = 1024.0, salt = "walk")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "1 2 3 4 5 4 3")
    // deterministic across runs
    val again = IterativeGraph.node2vecWalks(es, starts, steps = 6,
        returnWeight = 0.0009765625, outWeight = 1024.0, salt = "walk")
      .as[(Long, String)].collect().toMap
    assert(again == got)
    // return-bias flips it: after the first hop the walk oscillates
    // home (1 2 1 2 ... modulo the ~1e-9 u tail)
    val home = IterativeGraph.node2vecWalks(es, starts, steps = 6,
        returnWeight = 1024.0, outWeight = 0.0009765625, salt = "walk")
      .as[(Long, String)].collect().toMap
    assert(home(1L) == "1 2 1 2 1 2 1")
  }

  test("skipGramPairs: windowed pair counts match a hand-rolled reference") {
    import graft.graph.IterativeGraph
    // two fixed walks; window 2 pairs each position with offsets ±1, ±2
    val walks = Seq((1L, "1 2 3 4"), (9L, "9 2 9")).toDF("walk_id", "seq")
    val got = IterativeGraph.skipGramPairs(walks, window = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    def ref(seqs: Seq[Array[Long]], w: Int) = {
      val pairs = for {
        ns <- seqs; i <- ns.indices; d <- -w to w if d != 0
        j = i + d if j >= 0 && j < ns.length
      } yield (ns(i), ns(j))
      pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    val want = ref(Seq(Array(1L, 2L, 3L, 4L), Array(9L, 2L, 9L)), 2)
    assert(got == want)
    // sanity: symmetric counts for the within-walk pair (2,3)/(3,2)
    assert(got((2L, 3L)) == got((3L, 2L)))
  }

  test("co-purchase artifact: sanitize-colliding dirs get distinct paths; a stale marker rebuilds instead of wedging") {
    // two raw dirs whose non-alphanumerics collapse to the SAME
    // sanitized string must not share a scratch artifact — r13's
    // naming made the second dir's marker check fail permanently
    assert(PropertyGraph.coPurchaseScratch("/x/a.b") !=
      PropertyGraph.coPurchaseScratch("/x/a_b"))
    // a marker carrying some OTHER dir's key (stale artifact) must be
    // deleted and rebuilt for the requested dir, never served or fatal
    val d = java.nio.file.Files.createTempDirectory("copg_dir").toString
    for (t <- Seq("lineitem", "part"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/$t.parquet"),
        java.nio.file.Paths.get(s"$d/$t.parquet"))
    val path = PropertyGraph.coPurchaseScratch(d)
    Seq("/some/other/dir").toDF("dir").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/key")
    val g = PropertyGraph.partCoPurchaseGraph(spark, d)
    assert(g.edges.count() > 0)
    val key = spark.read.parquet(s"$path/key").collect()
    assert(key.length == 1 && key(0).getString(0) == d,
      s"marker must carry the requested dir after rebuild: ${key.toSeq}")
  }

  test("co-purchase artifact: a corrupt multi-row marker CONTAINING the requested dir still rebuilds (never wedges the single-row require)") {
    // ADVICE r14: the r14 check rebuilt only when ALL marker rows
    // differed from dir — a corrupt marker holding dir PLUS another
    // key skipped the rebuild and then permanently failed the
    // key.length == 1 require on every subsequent run (the exact
    // wedged-artifact mode the marker check exists to heal)
    val d = java.nio.file.Files.createTempDirectory("copg_multi").toString
    for (t <- Seq("lineitem", "part"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/$t.parquet"),
        java.nio.file.Paths.get(s"$d/$t.parquet"))
    val path = PropertyGraph.coPurchaseScratch(d)
    Seq(d, "/some/other/dir").toDF("dir").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/key")
    val g = PropertyGraph.partCoPurchaseGraph(spark, d)
    assert(g.edges.count() > 0)
    val key = spark.read.parquet(s"$path/key").collect()
    assert(key.length == 1 && key(0).getString(0) == d,
      s"corrupt multi-row marker must rebuild to one row: ${key.toSeq}")
  }
}
