package graft

import org.apache.spark.sql.SparkSession

/** Extra measurement harness for the optimization rounds (guide §1).
  *
  * The driver-contract [[Bench]] is frozen: it times every query once,
  * via `.count()`, in one fixed session. This main exists for the
  * measurement work the optimization guide asks for WITHOUT touching
  * the frozen harness:
  *
  *  - time a SUBSET of queries (fast iteration on one operator),
  *  - multiple reps per query (min = de-noised estimate),
  *  - optional `.explain("formatted")` dump per query (plan evidence
  *    committed under plans/r06/),
  *  - optional noop-sink timing (`--noop`): computes EVERY column of
  *    every row (guide §1.4) instead of count()'s pruned plan.
  *
  * Usage: sbt "runMain graft.BenchExtra [--reps N] [--noop]
  *             [--explain DIR] [query ...]"
  * Environment: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", 2 * cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    var reps = 1
    var noop = false
    var explainDir: Option[String] = None
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps"    => reps = args(i + 1).toInt; i += 2
        case "--noop"    => noop = true; i += 1
        case "--explain" => explainDir = Some(args(i + 1)); i += 2
        case q           => names += q; i += 1
      }
    }
    val all = SparkEntry.queries
    val selected =
      if (names.isEmpty) all.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> all(n))

    val spark = session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    val results = selected.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      explainDir.foreach { dir =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(p.resolve(s"$name.txt"),
          plan.getBytes("UTF-8"))
      }
      val secs = (1 to reps).map { _ =>
        val (_, sec) = time {
          val df = fn(spark, sfDir)
          if (noop) df.write.format("noop").mode("overwrite").save()
          else df.count()
        }
        System.gc()
        Thread.sleep(100)
        sec
      }
      println(f"$name%-28s ${secs.map(s => f"$s%.3f").mkString(" ")}")
      name -> secs.min
    }
    spark.stop()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"extra","value":${f"${results.map(_._2).sum}%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"noop":$noop}""")
  }
}
