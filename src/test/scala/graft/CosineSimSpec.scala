package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSim
import graft.ops.Dedup

/** The native cosine expression must be BIT-identical to both the
  * builtin higher-order-fold formulation it replaced and the
  * executor-side loop (Dedup.cosineOf) — same addition sequence per
  * accumulator, so the approximate-op oracles stay exact.
  */
class CosineSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def vecs(seed: Long, n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }

  /** The round-1 formulation, kept as the spec's reference. */
  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  test("bit-identical to the higher-order fold it replaced (random vectors)") {
    import spark.implicits._
    val left = vecs(42L, 50, 64)
    val right = vecs(7L, 50, 64)
    val df = left.zip(right).map { case ((i, a), (_, b)) => (i, a, b) }
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
        CosineSim(col("a"), col("b")).as("native"),
        hofCosine(col("a"), col("b")).as("hof"))
      .collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"id=${r.getLong(0)}: native=${r.getDouble(1)} hof=${r.getDouble(2)}")
    }
  }

  test("bit-identical to the executor-side loop on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    import spark.implicits._
    val pairs = for { (ia, a) <- emb.take(5); (ib, b) <- emb } yield (ia, ib, a, b)
    val got = pairs.toSeq.toDF("ia", "ib", "a", "b")
      .select(col("ia"), col("ib"), CosineSim(col("a"), col("b")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs.foreach { case (ia, ib, a, b) =>
      assert(java.lang.Double.doubleToLongBits(got((ia, ib))) ==
        java.lang.Double.doubleToLongBits(Dedup.cosineOf(a, b)))
    }
  }

  test("null array yields null; self-similarity is 1.0") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Option(Array(1f, 2f, 3f))), (Array(1f, 0f, 0f), None))
      .toDF("a", "b")
    val rows = df.select(CosineSim(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(1).isNullAt(0))
  }

  test("type mismatch is rejected at analysis") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(CosineSim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_cosine") ||
      e.getMessage.contains("ARRAY<FLOAT>"))
  }
}
