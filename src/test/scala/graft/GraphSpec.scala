package graft

import graft.operators.Graph

/** Graph-analytics operators against hand-computed ground truth. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("triangle count ignores direction, multiplicity, and self-loops") {
    // 4-clique on {1,2,3,4} (4 triangles) + pendant edge + noise:
    // a reversed duplicate and a self-loop
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L),
      (2L, 1L), // reverse duplicate of (1,2)
      (5L, 5L)  // self-loop
    ).toDF("src", "dst")
    val n = Graph.triangleCount(edges).collect().head.getAs[Long]("triangles")
    assert(n === 4L)
  }

  test("triangle count is 0 on a triangle-free graph") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangleCount(path).collect().head.getLong(0) === 0L)
  }

  test("degree-ordering collapses the wedge candidates of a star graph") {
    // star with the hub in the MIDDLE of the id order: id-ordered
    // canonicalization anchors ~ (n/2)² wedges on the hub, while the
    // degree order points every edge INTO the hub — zero wedges
    val hub = 50L
    val star = (0L until 100L).filter(_ != hub).map(l => (hub, l))
      .toDF("src", "dst")
    val dir = Graph.degreeOriented(star)
    val wedges = dir.as("e1")
      .join(dir.as("e2"),
        org.apache.spark.sql.functions.col("e1.w") ===
          org.apache.spark.sql.functions.col("e2.u"))
      .count()
    assert(wedges === 0L, s"hub must not anchor wedges, got $wedges")
    // out-degree under the orientation is the leaf side only
    val maxOut = dir.groupBy("u").count()
      .agg(org.apache.spark.sql.functions.max("count")).collect().head.getLong(0)
    assert(maxOut === 1L)
    assert(Graph.triangleCount(star).collect().head.getLong(0) === 0L)
  }

  test("integer pagerank matches a hand-computed two-round trace") {
    // 1→2, 1→3, 2→1; node 3 dangling. scale=1000, damping=85, base=150.
    // round 1: c=(1:1000, 2:500, 3:500) → r=(1:1000, 2:575, 3:575)
    // round 2: c=(1:575, 2:500, 3:500)  → r=(1:638, 2:575, 3:575)
    //   (85·575 = 48875, div 100 = 488; 488 + 150 = 638)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    val ranks = Graph.pagerankInt(edges, iters = 2, scale = 1000L)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank")).toMap
    assert(ranks === Map(1L -> 638L, 2L -> 575L, 3L -> 575L))
  }

  test("pagerank total mass never exceeds the initial mass") {
    // floor divisions only LOSE units; the damped update redistributes
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val total = Graph.pagerankInt(edges, iters = 4, scale = 1000000L)
      .agg(org.apache.spark.sql.functions.sum("rank")).first().getLong(0)
    assert(total <= 3L * 1000000L)
    assert(total > 2L * 1000000L) // and stays the right order of magnitude
  }
}
