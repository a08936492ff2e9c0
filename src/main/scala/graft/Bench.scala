package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Seconds rounded to ms so the 106-entry JSON line stays compact
    * enough for the driver's bounded tail capture (full-precision
    * doubles overflowed it and left `parsed` null for six rounds).
    */
  private def ms3(v: Double): Double = math.round(v * 1000) / 1000.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup pass at the smallest SF: JIT + codegen caches + parquet
    // footers, so timed numbers reflect steady state, not first-query
    // JVM warmup
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    // drop caches + checkpoint blocks between queries so one query's
    // leftovers (kmeans localCheckpoints, cached code tables) can't
    // inflate a later query's GC time
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // median-of-`reps` per query: the shared-JVM single-shot numbers
    // swung 3-15x run-to-run (GC + JIT noise), which made the bench
    // unable to distinguish a real regression from scheduler luck.
    // A crashed attempt aborts the query's remaining reps: sentinel -1
    // in the per-query map, a "failed" list, and NO contribution to
    // the headline total.
    val results = SparkEntry.queries.map { case (name, fn) =>
      var failed = false
      def run(): Option[Double] =
        if (failed) None
        else {
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
              failed = true; false
            }
          val dt = (System.nanoTime() - t0) / 1e9
          cleanup()
          if (ok) Some(dt) else None
        }
      // streaming_* queries run a real micro-batch stream whose cost
      // is dominated by fixed delivery-loop machinery (stream start /
      // drain / temp-dir IO), not operator throughput — one rep is
      // representative and keeps the headline total about the engine
      val repsFor = if (name.startsWith("streaming_")) 1 else reps
      var times = (1 to repsFor).flatMap(_ => run())
      // adaptive re-sample: when the spread still exceeds 2x (a GC /
      // JIT straggler got through), two more reps tighten the median
      // — only noisy queries pay the extra runs
      if (!failed && times.nonEmpty && times.max / times.min > 2.0)
        times = times ++ (1 to 2).flatMap(_ => run())
      name -> (if (failed) -1.0 else times.sorted.apply(times.size / 2))
    }
    // build/search phase split for the trained-index families: build =
    // train + encode + materialize codes (persist+count), search =
    // probe over the materialized frame — the steady-state serving
    // cost an at-rest index pays, with the one-shot training cost
    // reported separately instead of smeared into every round's total
    val splits = SparkEntry.benchSplits.flatMap { case (name, mk) =>
      try {
        val (build, search) = mk(spark, sfDir)
        val t0 = System.nanoTime()
        val codes = build().persist()
        codes.count()
        val tb = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        search(codes).count()
        val ts = (System.nanoTime() - t1) / 1e9
        codes.unpersist(false)
        cleanup()
        Some(name -> (tb, ts))
      } catch { case e: Throwable =>
        System.err.println(s"BENCH SPLIT FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
        None
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + (if (v < 0) "-1" else ms3(v).toString) }
      .mkString("{", ",", "}")
    val sp = splits.map { case (k, (b, s)) =>
      s"\"" + k + "\":{\"build\":" + ms3(b) + ",\"search\":" + ms3(s) + "}"
    }.mkString("{", ",", "}")
    val failedNames = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val failed = failedNames.mkString("[", ",", "]")
    // a crashed query must NOT shrink the headline number into a fake
    // speedup: with any failure the total is null + valid:false, so
    // cross-round total comparisons can't silently improve via a crash
    val total =
      if (failedNames.nonEmpty) "null"
      else ms3(results.values.filter(_ >= 0).sum).toString
    val valid = failedNames.isEmpty
    val line = s"""{"metric":"total","value":$total,"unit":"sec","valid":$valid,"reps":$reps,"queries":$qs,"split":$sp,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // the driver keeps only the LAST ~2000 chars of stdout, and the
    // full 114-query map no longer fits that window (round 6's parsed:
    // null was exactly this) — so after the full line, print a short
    // summary line that always survives the tail capture whole: total
    // + the slowest queries (the ones a regression check cares about).
    // A consumer that wants every query reads bench_self.json.
    val slow = results.filter(_._2 >= 0).toSeq.sortBy(-_._2).take(12)
      .map { case (k, v) => s"\"" + k + "\":" + ms3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","valid":$valid,"reps":$reps,"n_queries":${results.size},"slowest":$slow,"failed":$failed,"sf":"$sfDir"}""")
    // stdout gets wrapped in sbt chatter, so also drop the full line
    // where a consumer can read it clean
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_self.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
