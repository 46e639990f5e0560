package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.canon.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain union-find oracle. */
  def oracle(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    edges.foreach { case (a, b) => union(a, b) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }
  }

  /** Runs BOTH execution paths (driver union-find fast path and the
    * distributed loop, forced via localThreshold = 0) and asserts they
    * agree before returning.
    */
  def runCc(edges: Seq[(String, String)]): Map[String, String] = {
    val df = edges.toDF("src", "dst")
    val local = ConnectedComponents.run(spark, df)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val dist = ConnectedComponents.run(spark, df, localThreshold = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(local == dist, "local union-find and distributed loop disagree")
    local
  }

  test("reliable checkpointing: distributed loop correct with a checkpoint dir set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val sc = spark.sparkContext
    sc.setCheckpointDir(dir)
    try {
      val edges = (0 until 40).map(i => (f"n$i%03d", f"n${(i + 3) % 40}%03d"))
      val out = ConnectedComponents.run(spark, edges.toDF("src", "dst"), localThreshold = 0)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out == oracle(edges))
      // the reliable path actually wrote checkpoint data
      val written = new java.io.File(dir).listFiles()
      assert(written != null && written.nonEmpty, "no reliable checkpoint data written")
    } finally {
      // unset so other specs keep exercising the localCheckpoint path
      sc.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("fixed shapes: chain, star, bridge, singleton edge (FIXTURES.md F3)") {
    val chain = (0 until 30).map(i => (f"c$i%03d", f"c${i + 1}%03d"))
    val star = (1 until 20).map(i => (f"s$i%03d", "s000"))
    val bridged = Seq(("a1", "a2"), ("a2", "a3"), ("b1", "b2"), ("b2", "b3"), ("a3", "b1"))
    val single = Seq(("z1", "z1")) // self loop
    val edges = chain ++ star ++ bridged ++ single
    assert(runCc(edges) == oracle(edges))
  }

  test("long chain converges within O(log n) rounds (pointer jumping)") {
    val chain = (0 until 200).map(i => (f"n$i%04d", f"n${i + 1}%04d"))
    val got = runCc(chain)
    assert(got.values.toSet == Set("n0000"))
    assert(got.size == 201)
  }

  test("property: CC == union-find oracle on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 12).foreach { trial =>
      val n = 2 + rnd.nextInt(39)
      val m = 1 + rnd.nextInt(60)
      val es = (0 until m).map { _ =>
        (f"v${rnd.nextInt(n)}%03d", f"v${rnd.nextInt(n)}%03d")
      }
      assert(runCc(es) == oracle(es), s"trial=$trial edges=$es")
    }
  }

  test("result invariant under edge-list partitioning") {
    val edges = (0 until 50).map(i => (f"x${i % 17}%03d", f"x${(i * 7) % 17}%03d"))
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df2 = edges.toDF("src", "dst").repartition(13)
    for (thr <- Seq(0L, 1000000L)) {
      val r1 = ConnectedComponents.run(spark, df1, localThreshold = thr)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val r2 = ConnectedComponents.run(spark, df2, localThreshold = thr)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(r1 == r2, s"threshold=$thr")
    }
  }
}
