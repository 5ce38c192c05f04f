package graft

import graft.queries.Graph

/** PageRank invariants the hash oracle can't express on its own:
  * probability-mass conservation and the hub-vs-leaf ordering the
  * damped walk must produce on the bipartite interaction graph.
  */
class GraphSpec extends SparkSpec {

  test("pagerank conserves probability mass and stays above teleport floor") {
    val rows = Graph.pageRank(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    val mass = rows.map(_.getAs[Double]("rank")).sum
    // each round redistributes mass exactly (teleport + damped in-flow);
    // the only loss is the 1e-12 contribution quantization, bounded by
    // edges × half-quantum per round
    assert(math.abs(mass - 1.0) < 1e-4, s"rank mass drifted: $mass")
    val floor = 0.15 / n.toDouble
    rows.foreach(r => assert(r.getAs[Double]("rank") >= floor - 1e-15,
      s"rank below teleport floor for node ${r.getAs[Long]("node")}"))
  }

  test("pagerank ranks hubs above leaves: suppliers out-rank customers") {
    // ~100 suppliers serve ~1500 customers: each supplier aggregates
    // in-flow from many customers, so the mean supplier rank must
    // strictly exceed the mean customer rank (hub property)
    val rows = Graph.pageRank(spark, sf).collect()
    val (sup, cust) = rows.partition(_.getAs[Long]("node") % 2 == 0)
    assert(sup.nonEmpty && cust.nonEmpty)
    val supMean = sup.map(_.getAs[Double]("rank")).sum / sup.length
    val custMean = cust.map(_.getAs[Double]("rank")).sum / cust.length
    assert(supMean > custMean * 2,
      s"supplier hubs should dominate: sup=$supMean cust=$custMean")
  }

  test("HITS: unit-norm sides, positive scores, bipartite counts") {
    val rows = Graph.hits(spark, sf).collect()
    val (auth, hub) = rows.partition(_.getAs[String]("side") == "authority")
    assert(auth.nonEmpty && hub.nonEmpty)
    // suppliers are the authority side; the synthetic schema has far
    // fewer suppliers than customers
    assert(auth.length < hub.length)
    for (side <- Seq(auth, hub)) {
      side.foreach(r => assert(r.getAs[Double]("score") > 0.0))
      val norm = side.map(r => math.pow(r.getAs[Double]("score"), 2)).sum
      assert(math.abs(norm - 1.0) < 1e-9, s"L2 norm drifted: $norm")
    }
  }
}
