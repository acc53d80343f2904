package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {

  test("bfs: layered depths on a path with a cycle and an unreachable node") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 0→1→2→3→1 (cycle back), 9→9 self-loop island; undirected not required
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (9L, 9L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = graft.ops.Graph.bfs(edges, seeds, "node", maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 9 is unreachable from 0; the cycle must not lower settled depths
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L), s"got $got")
    // depth cap: with maxDepth=1 only the first layer appears
    val g1 = graft.ops.Graph.bfs(edges, seeds, "node", maxDepth = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g1 == Map(0L -> 0L, 1L -> 1L))
    // multiple seeds: nearest seed wins
    val g2 = graft.ops.Graph.bfs(edges, Seq(0L, 3L).toDF("node"), "node", maxDepth = 3)
      .filter(col("node") === 1L).collect().head.getLong(1)
    assert(g2 == 1L)
  }
  import spark.implicits._

  test("triangleCount: known graphs") {
    // 4-clique has C(4,3)=4 triangles
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s1", "s2")
    assert(Graph.triangleCount(k4).head().getLong(0) == 4L)
    // a path has none
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s1", "s2")
    assert(Graph.triangleCount(path).head().getLong(0) == 0L)
    // two triangles sharing an edge
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("s1", "s2")
    assert(Graph.triangleCount(bowtie).head().getLong(0) == 2L)
  }

  test("degreeHistogram: star graph") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("s1", "s2")
    val h = Graph.degreeHistogram(star).as[(Long, Long)].collect().toMap
    assert(h == Map(1L -> 3L, 3L -> 1L)) // 3 leaves of degree 1, 1 hub of degree 3
  }

  test("coOccurrenceEdges: threshold and duplicate membership rows") {
    // groups g1,g2 shared by (a,b); g1 only for c; duplicate rows must not
    // inflate the shared count
    val m = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"), ("g1", "c"))
      .toDF("grp", "node")
    val e2 = Graph.coOccurrenceEdges(m, "grp", "node", 2L).as[(String, String)].collect()
    assert(e2.toSet == Set(("a", "b")))
    val e1 = Graph.coOccurrenceEdges(m, "grp", "node", 1L).as[(String, String)].collect()
    assert(e1.toSet == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("coOccurrenceEdges: a viral group is dropped, not squared") {
    // one group with 2000 members (≈2M pairs if joined) + one small group;
    // the cap must cut the hot group so only the small group's pairs emerge
    val hot = (1 to 2000).map(i => ("viral", s"n$i"))
    val small = Seq(("g", "a"), ("g", "b"))
    val m = (hot ++ small).toDF("grp", "node")
    val e = Graph.coOccurrenceEdges(m, "grp", "node", 1L, maxGroupSize = 100)
      .as[(String, String)].collect()
    assert(e.toSet == Set(("a", "b")), s"hot-group pairs leaked: ${e.length} edges")
  }

  test("pageRank: 25 iterations complete with bounded plan depth (lineage truncation)") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val und = (cyc ++ cyc.map(_.swap)).toDF("src", "dst")
    val r = Graph.pageRank(und, 25)
    // without checkpointing, 25 chained rounds make the analyzed plan
    // (and Janino input) grow linearly — the plan string alone is a fair
    // proxy: it must reflect only the rounds since the last checkpoint
    val planLines = r.queryExecution.optimizedPlan.toString.linesIterator.size
    val shallow = Graph.pageRank(und, 2).queryExecution.optimizedPlan.toString.linesIterator.size
    assert(planLines <= shallow * 4, s"plan depth grew with iters: $planLines lines vs 2-iter $shallow")
    val rc = r.as[(Long, Long)].collect().toMap
    assert(rc.values.toSet.size == 1 && math.abs(rc(1L) - Graph.Scale) <= 2L)
  }

  test("pageRank: hub of an undirected star outranks leaves; regular graph stays uniform") {
    // undirected star: hub 1, leaves 2..5 — pass both edge directions
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val und = (e ++ e.map(_.swap)).toDF("src", "dst")
    val r = Graph.pageRank(und, 3).as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L) && r(2L) == r(3L) && r(3L) == r(4L) && r(4L) == r(5L))
    // on a d-regular graph (a 4-cycle) ranks stay exactly at the fixpoint:
    // 0.15·S + 0.85·S (up to the two integer floors)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val undc = (cyc ++ cyc.map(_.swap)).toDF("src", "dst")
    val rc = Graph.pageRank(undc, 3).as[(Long, Long)].collect().toMap
    assert(rc.values.toSet.size == 1)
    assert(math.abs(rc(1L) - Graph.Scale) <= 2L) // floors lose at most 1 unit each
  }
}
