package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.canon.PageRank

/** Specs for integer fixed-point PageRank: an independent scalar model
  * (Maps + sorted loops, no Spark) must agree bit-exactly, under any
  * partitioning.
  */
class PageRankSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: same integer semantics, driver-side. */
  def model(edges: Seq[(Long, Long)], iters: Int, scale: Long): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = scale * 3L / 20L
    var pr = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) in(d) += pr(s) / deg(s)
      pr = nodes.map(n => n -> (base + 17L * in(n) / 20L)).toMap
    }
    pr
  }

  test("pagerank: engine == scalar model on chain+hub with a parallel multi-edge; partition-invariant") {
    // 3 chains of 4 + hub links + one duplicated edge (multi-edge counts twice)
    val chains = for (c <- 0L until 3L; i <- 0L until 3L)
      yield (c * 10 + i, c * 10 + i + 1)
    val hub = (1L to 23L).filter(i => i % 10 <= 3).map(i => (i, 0L))
    val edges = (chains ++ hub ++ Seq((21L, 22L))).toSeq // (21,22) twice
    val expected = model(edges, 5, 1000000000000L)
    for (parts <- Seq(2, 7)) {
      val got = PageRank.run(edges.toDF("src", "dst").repartition(parts))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
    // the hub (everyone links to 0) must dominate; a chain tail
    // (fed by its predecessor) beats its unfed head
    assert(expected(0L) > expected.filter(_._1 != 0L).values.max)
    assert(expected(23L) > expected(20L))
  }

  test("pagerank: 2-cycle is an exact fixpoint of the 17/20 damping at scale 10^12") {
    val out = PageRank.run(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // base + 17*S/20 = 0.15*S + 0.85*S = S exactly (integer-exact at 10^12)
    assert(out == Map(1L -> 1000000000000L, 2L -> 1000000000000L))
  }

  test("pagerank: dangling mass leaks (documented), iteration/scale guards reject bad args") {
    val out = PageRank.run(Seq((1L, 2L)).toDF("src", "dst"), iterations = 1)
      .as[(Long, Long)].collect().toMap
    val s = 1000000000000L
    assert(out == Map(1L -> s * 3 / 20, 2L -> (s * 3 / 20 + 17L * s / 20)))
    intercept[IllegalArgumentException] {
      PageRank.run(Seq((1L, 2L)).toDF("src", "dst"), iterations = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.run(Seq((1L, 2L)).toDF("src", "dst"), scale = 10L)
    }
  }
}
