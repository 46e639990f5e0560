package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.Fixtures
import graft.run.{Descriptors, Pipeline}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def cfg(outDir: Option[String] = None) = Pipeline.Config(
    descriptorJson = Descriptors.imfJson,
    gazetteer = Fixtures.gazetteer,
    outDir = outDir,
    nBuckets = 8)

  def toSet(df: DataFrame): Set[(String, String, String, String, String, String, String)] =
    df.collect().map { r: Row =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6))
    }.toSet

  test("end-to-end: 64 pages, exact golden set (P=R=1.0, BASELINE.json target)") {
    val pages = Fixtures.pages(spark, 64, 5)
    val got = toSet(Pipeline.run(spark, pages, cfg()))
    val want = TestOracle.expectedAll(64)
    val missing = want -- got
    val spurious = got -- want
    val p = (got.size - spurious.size).toDouble / got.size
    val r = (want.size - missing.size).toDouble / want.size
    assert(missing.isEmpty && spurious.isEmpty,
      s"P=$p R=$r missing=${missing.take(3)} spurious=${spurious.take(3)}")
  }

  test("extraction path: pipeline output identical when text must come from html") {
    val pages = Fixtures.pages(spark, 32, 3)
    val noText = pages.map(p => p.copy(text = null))
    val a = toSet(Pipeline.run(spark, pages, cfg()))
    val b = toSet(Pipeline.run(spark, noText, cfg().copy(trustText = false)))
    assert(a == b)
  }

  test("parallelism invariance: same triple set at 2 and 23 input partitions") {
    val a = toSet(Pipeline.run(spark, Fixtures.pages(spark, 100, 2), cfg()))
    val b = toSet(Pipeline.run(spark, Fixtures.pages(spark, 100, 23), cfg()))
    assert(a == b)
  }

  test("resume-from-checkpoint ≡ single-shot (north rule resumability)") {
    val dir = Files.createTempDirectory("graft-resume").toString
    val pages = Fixtures.pages(spark, 80, 7)
    val oneShot = toSet(Pipeline.run(spark, pages, cfg()))

    // simulate an interrupted run: only buckets 0..3 got processed
    val half = pages.toDF()
      .filter(pmod(xxhash64(col("url")), lit(8)) < 4).as[graft.model.Page]
    val c = cfg(Some(dir))
    Pipeline.runResumable(spark, half, c)

    // resume with the full input: finished buckets must be skipped,
    // the rest appended, and the final set must equal one-shot
    val resumed = toSet(Pipeline.runResumable(spark, pages, c.copy(runId = "run-1")))
    assert(resumed == oneShot)

    // lineage: every bucket committed exactly once per rule-set
    val lin = spark.read.parquet(s"$dir/lineage")
    val dup = lin.groupBy("bucket", "rule_set_hash").count().filter($"count" > 1).count()
    assert(dup == 0, "bucket re-committed on resume")

    // idempotence: a third run has nothing to do and returns the same set
    val again = toSet(Pipeline.runResumable(spark, pages, c.copy(runId = "run-2")))
    assert(again == oneShot)
  }

  test("mid-write crash: triples landed, lineage not committed -> re-run converges to the identical set") {
    val dir = Files.createTempDirectory("graft-crash").toString
    val pages = Fixtures.pages(spark, 60, 5)
    val c = cfg(Some(dir))
    val oneShot = toSet(Pipeline.run(spark, pages, c))

    // simulate a run killed BETWEEN the triples append and the lineage
    // commit inside TripleEmitter.writeStage (triples for two buckets
    // on disk; no lineage row, no edges — the exact partial state that
    // write order produces)
    val crashed = pages.toDF()
      .filter(pmod(xxhash64(col("url")), lit(8)) < 2).as[graft.model.Page]
    val (triples, _) = Pipeline.stageA(spark, crashed, c)
    triples.write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("bucket").parquet(s"$dir/triples")

    // resume over the FULL input: orphaned buckets are absent from the
    // lineage index, so they re-run and append a SECOND copy; stage B's
    // content dedup collapses the duplicates — convergence, not loss
    val resumed = toSet(Pipeline.runResumable(spark, pages, c.copy(runId = "r1")))
    assert(resumed == oneShot)

    // the orphaned copies really are on disk (the re-append happened)…
    val raw = spark.read.parquet(s"$dir/triples")
    assert(raw.count() > raw.dropDuplicates(
      "s", "p", "o_kind", "o_lex", "o_datatype", "o_lang").count())
    // …and lineage holds exactly one committed row per (bucket, rule-set)
    val lin = spark.read.parquet(s"$dir/lineage")
    assert(lin.groupBy("bucket", "rule_set_hash").count().filter($"count" > 1).count() == 0)

    // a further run sees every bucket committed and changes nothing
    val again = toSet(Pipeline.runResumable(spark, pages, c.copy(runId = "r2")))
    assert(again == oneShot)
  }

  test("M2 metrics: counters persisted, resume reflected in skip counts") {
    val dir = Files.createTempDirectory("graft-metrics").toString
    val pages = Fixtures.pages(spark, 40, 4)
    val c = cfg(Some(dir))
    val (out1, m1) = Pipeline.runResumableWithMetrics(spark, pages, c)
    assert(m1.buckets_skipped == 0 && m1.buckets_done > 0)
    assert(m1.triples_out == out1.count())
    assert(m1.triples_materialized >= m1.triples_out) // pre-dedup >= post
    val (_, m2) = Pipeline.runResumableWithMetrics(spark, pages, c.copy(runId = "r2"))
    assert(m2.buckets_done == 0 && m2.buckets_skipped == m1.buckets_done)
    assert(m2.triples_out == m1.triples_out)
    assert(spark.read.parquet(s"$dir/metrics").count() == 2)
  }

  test("spark-submit surface: Submit.main runs end-to-end, resubmit resumes and converges") {
    val base = Files.createTempDirectory("graft-submit").toString
    val pages = Fixtures.pages(spark, 40, 4)
    pages.toDF().write.parquet(s"$base/pages")
    Files.writeString(java.nio.file.Paths.get(s"$base/desc.json"), Descriptors.imfJson)
    Files.writeString(java.nio.file.Paths.get(s"$base/gaz.csv"),
      Fixtures.gazetteer.map { case (s, e) => s"$s,$e" }.mkString("\n"))
    def args(runId: String) = Array(
      "--pages", s"$base/pages", "--out", s"$base/out",
      "--descriptor", s"$base/desc.json", "--gazetteer", s"$base/gaz.csv",
      "--buckets", "8", "--run-id", runId)

    Submit.main(args("r1"))
    val want = TestOracle.expectedAll(40).size
    assert(spark.read.text(s"$base/out/serialized").count() == want,
      "serialized N-Quads must equal the golden triple set size")
    assert(spark.read.parquet(s"$base/out/metrics").count() == 1)

    // resubmit: every bucket already committed — nothing reprocessed,
    // identical output (the spark-submit face of the resume contract)
    Submit.main(args("r2"))
    val m2 = spark.read.parquet(s"$base/out/metrics")
      .orderBy($"wall_ms".desc).filter($"run_id" === "r2").first()
    assert(m2.getAs[Long]("buckets_done") == 0L)
    assert(spark.read.text(s"$base/out/serialized").count() == want)
  }

  test("spark-submit surface: --pack-shards lands the shard store; resubmit is a no-op") {
    val base = Files.createTempDirectory("graft-packcli").toString
    (0L until 300L).map(i => (i, ("tok " * (1 + (i % 40).toInt)).trim))
      .toDF("doc_id", "text") // no n_tokens column -> Submit derives it
      .write.parquet(s"$base/docs")
    val args = Array("--pack-shards", "--docs", s"$base/docs",
      "--out", s"$base/store", "--budget", "700")
    Submit.main(args)
    val manifest = spark.read.parquet(s"$base/store/manifest")
    val stored = spark.read.parquet(s"$base/store/shards")
    assert(stored.count() == 300L)
    assert(manifest.agg(sum($"n_docs")).first().getLong(0) == 300L)
    // token bookkeeping equals the derived counts
    val totalToks = (0L until 300L).map(i => 1 + (i % 40)).sum
    assert(manifest.agg(sum($"n_tokens")).first().getLong(0) == totalToks)
    // resubmit: committed manifest -> no rewrite (sentinel survives)
    val sentinel = java.nio.file.Paths.get(s"$base/store/shards/.graft-sentinel")
    Files.writeString(sentinel, "untouched")
    Submit.main(args)
    assert(Files.exists(sentinel))
  }

  test("gazetteer-less resumable run: empty edge store reads back (schema inference regression)") {
    val dir = Files.createTempDirectory("graft-noedges").toString
    val c = cfg(Some(dir)).copy(gazetteer = Nil)
    val pages = Fixtures.pages(spark, 20, 2)
    // first run writes an edge-FREE edges/ dir (just _SUCCESS); both the
    // run and the resume must read it with the explicit schema instead
    // of crashing on parquet schema inference
    val n1 = Pipeline.runResumable(spark, pages, c).count()
    val n2 = Pipeline.runResumable(spark, pages, c.copy(runId = "r2")).count()
    assert(n1 > 0 && n1 == n2)
  }

  test("M3 lifecycle delete: removes the owned store, refuses foreign hashes, idempotent") {
    val base = Files.createTempDirectory("graft-delete").toString
    val pages = Fixtures.pages(spark, 30, 3)
    val c = cfg(Some(s"$base/out"))
    Pipeline.runResumable(spark, pages, c).count()
    val hash = graft.spec.TableSpec.ruleSetHash(c.descriptorJson)
    assert(new java.io.File(s"$base/out/triples").exists())

    // wrong hash: refused — triple rows aren't hash-tagged, so a mixed
    // store can't be partially deleted
    intercept[IllegalArgumentException] {
      Pipeline.delete(spark, s"$base/out", "deadbeefdeadbeef")
    }
    assert(new java.io.File(s"$base/out/triples").exists(), "refusal must not delete")

    // owned hash: store removed, lineage rows counted
    val removed = Pipeline.delete(spark, s"$base/out", hash)
    assert(removed > 0)
    assert(!new java.io.File(s"$base/out/triples").exists())
    assert(!new java.io.File(s"$base/out/lineage").exists())

    // idempotent: second delete is a 0-row no-op, not an error
    assert(Pipeline.delete(spark, s"$base/out", hash) == 0L)

    // force overrides mixed/foreign ownership
    Pipeline.runResumable(spark, pages, c.copy(runId = "r2")).count()
    assert(Pipeline.delete(spark, s"$base/out", "deadbeefdeadbeef", force = true) >= 0L)
    assert(!new java.io.File(s"$base/out/triples").exists())

    // a fresh run after delete rebuilds from scratch (full lifecycle)
    val (_, m) = Pipeline.runResumableWithMetrics(spark, pages, c.copy(runId = "r3"))
    assert(m.buckets_skipped == 0 && m.buckets_done > 0)

    // data WITHOUT a lineage table (mid-write crash leftovers, or a
    // mistyped --out): ownership unverifiable -> refuse without force
    import org.apache.commons.io.FileUtils
    FileUtils.deleteDirectory(new java.io.File(s"$base/out/lineage"))
    assert(new java.io.File(s"$base/out/triples").exists())
    intercept[IllegalArgumentException] {
      Pipeline.delete(spark, s"$base/out", hash)
    }
    assert(new java.io.File(s"$base/out/triples").exists(), "refusal must not delete")
    assert(Pipeline.delete(spark, s"$base/out", hash, force = true) == 0L)
    assert(!new java.io.File(s"$base/out/triples").exists())
  }

  test("dedup: duplicating the input does not duplicate triples") {
    val pages = Fixtures.pages(spark, 20, 3)
    val doubled = pages.union(pages)
    val a = toSet(Pipeline.run(spark, pages, cfg()))
    val b = toSet(Pipeline.run(spark, doubled, cfg()))
    assert(a == b)
  }
}
