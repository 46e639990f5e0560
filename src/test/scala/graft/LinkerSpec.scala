package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.link.Linker
import graft.model.Mention

/** The entity-link feature scorer: integer basis-point bands, disjoint
  * by construction (bare ≤ 6000 < 9000 ≤ corroborated), so a 0.9
  * threshold is EXACTLY "record corroborates text" and 0.5 is "any
  * textual hit" — the contract kg_pipeline's oracle depends on.
  */
class LinkerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def subjects(rows: (String, String, String)*) = {
    import spark.implicits._
    rows.toDF("url", "subj", "anchor")
  }

  private def mentions(rows: Mention*) = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  private def featMap(ms: Seq[Mention], subj: Seq[(String, String, String)]) =
    Linker.linkFeatures(spark, mentions(ms: _*), subjects(subj: _*))
      .collect()
      .map(r => (r.getAs[String]("url"), r.getAs[String]("entity_id")) ->
        (r.getAs[Long]("n_mentions"), r.getAs[Long]("first_begin"),
          r.getAs[Long]("corroborated"), r.getAs[Long]("score_bp")))
      .toMap

  test("corroborated candidate lands in the 9000+ band with evidence bonuses") {
    val f = featMap(
      Seq(
        Mention("u1", "brazil", 0, 6, "ent:brazil"),
        Mention("u1", "brazil", 200, 206, "ent:brazil"),
        Mention("u1", "brazil", 300, 306, "ent:brazil")),
      Seq(("u1", "http://s/u1", "brazil")))
    // 9000 base + 250*min(2,2) repeats + 300 lead + 200 long surface
    assert(f(("u1", "ent:brazil")) === ((3L, 0L, 1L, 10000L)))
  }

  test("bare textual hit stays in the 5000-6000 band") {
    val f = featMap(
      Seq(Mention("u2", "peru", 500, 504, "ent:peru")),
      Seq(("u2", "http://s/u2", "chile")))
    // 5000 base, no repeats, late, short surface
    assert(f(("u2", "ent:peru")) === ((1L, 500L, 0L, 5000L)))
  }

  test("bare band is capped below the corroborated floor") {
    // every bonus firing on a bare hit: 5000 + 500 + 300 + 200 = 6000
    val f = featMap(
      Seq(
        Mention("u3", "bolivia", 10, 17, "ent:bolivia"),
        Mention("u3", "bolivia", 50, 57, "ent:bolivia"),
        Mention("u3", "bolivia", 90, 97, "ent:bolivia"),
        Mention("u3", "bolivia", 130, 137, "ent:bolivia")),
      Seq(("u3", "http://s/u3", "other")))
    assert(f(("u3", "ent:bolivia"))._4 === 6000L)
    assert(6000L < Linker.CORROBORATED_BP)
  }

  test("threshold 0.9 admits exactly the corroborated candidates") {
    val ms = Seq(
      Mention("u1", "brazil", 700, 706, "ent:brazil"), // corroborated, late, 1x
      Mention("u2", "peru", 0, 4, "ent:peru"),         // bare, every bonus but repeats
      Mention("u2", "peru", 30, 34, "ent:peru"),
      Mention("u2", "peru", 60, 64, "ent:peru"))
    val sj = Seq(("u1", "http://s/u1", "brazil"), ("u2", "http://s/u2", "brazil"))
    val hi = Linker.sameAsEdges(spark, mentions(ms: _*), subjects(sj: _*), 0.9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(hi === Set(("http://s/u1", "ent:brazil")))
    val lo = Linker.sameAsEdges(spark, mentions(ms: _*), subjects(sj: _*), 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(lo === Set(("http://s/u1", "ent:brazil"), ("http://s/u2", "ent:peru")))
  }

  test("null anchor never corroborates") {
    val f = featMap(
      Seq(Mention("u4", "argentina", 0, 9, "ent:argentina")),
      Seq(("u4", "http://s/u4", null)))
    assert(f(("u4", "ent:argentina"))._3 === 0L)
  }

  test("ANN link candidates: subset of brute twin, finds the planted entity, scan-local") {
    import spark.implicits._
    // 12 entities at distinct directions; contexts = noisy copies of
    // entity directions (planted nearest) + junk
    val dim = 64
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)(r.nextFloat() - 0.5f)
    }
    def noisy(v: Array[Float], seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      v.map(x => x + (r.nextFloat() - 0.5f) * 0.05f)
    }
    val entRows = (0 until 12).map(i => (100L + i, vec(i)))
    val ctxRows = (0 until 40).map { j =>
      val e = j % 12
      (j.toLong, noisy(entRows(e)._2, 1000 + j))
    }
    val ents = entRows.toDF("entity_id", "embedding")
    val ctxs = ctxRows.toDF("ctx_id", "embedding")

    val ann = Linker.annLinkCandidates(ctxs, ents, k = 3, tables = 8, bits = 3,
      dim = dim, minSim = 0.2)
      .as[(Long, Long, Long, Double)].collect()
    val brute = Linker.annLinkBrute(ctxs, ents, k = 3, dim = dim, minSim = 0.2)
      .as[(Long, Long, Long, Double)].collect()

    // every ANN candidate appears in the brute twin with the same sim
    // (LSH can only MISS, never invent or mis-score)
    val bruteSet = brute.map(r => (r._1, r._3, r._4)).toSet
    assert(ann.forall(r => bruteSet.contains((r._1, r._3, r._4))),
      "ANN emitted a (ctx, entity, sim) absent from the brute twin")
    // the planted nearest entity (sim ≈ 1) survives bucketing for every
    // context: near-identical vectors collide in every table
    val top = ann.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap
    (0 until 40).foreach { j =>
      assert(top.get(j.toLong).contains(100L + j % 12),
        s"ctx $j lost its planted entity (got ${top.get(j.toLong)})")
    }
    // partition invariance: same rows at a different parallelism
    val ann2 = Linker.annLinkCandidates(ctxs.repartition(7), ents.repartition(3),
      k = 3, tables = 8, bits = 3, dim = dim, minSim = 0.2)
      .as[(Long, Long, Long, Double)].collect()
    assert(ann2.toSet == ann.toSet)
    // the 100 TB claim: ONE narrow stage — no Exchange anywhere in the
    // context-side plan (the gazetteer is broadcast, not joined)
    val plan = Linker.annLinkCandidates(ctxs, ents, k = 3, tables = 8, bits = 3,
      dim = dim, minSim = 0.2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ANN linking must be scan-local:\n$plan")
    // rank contract: ≤ k rows per ctx, ranks dense from 1, sims ≥ minSim
    ann.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 3 && rows.map(_._2).sorted.sameElements(1L to rows.length))
    }
    assert(ann.forall(_._4 >= 0.2))
  }
}
