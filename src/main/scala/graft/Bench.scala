package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // a crashed query must be visible as such: sentinel -1 duration in
    // the per-query map, a "failed" list, and NO contribution to the
    // headline total (previously the failed attempt's elapsed time was
    // summed in, making a crash indistinguishable from a fast success)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedNames = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val failed = failedNames.mkString("[", ",", "]")
    // a crashed query must NOT shrink the headline number into a fake
    // speedup: with any failure the total is null + valid:false, so
    // cross-round total comparisons can't silently improve via a crash
    val total =
      if (failedNames.nonEmpty) "null"
      else results.values.filter(_ >= 0).sum.toString
    val valid = failedNames.isEmpty
    val line = s"""{"metric":"total","value":$total,"unit":"sec","valid":$valid,"queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // stdout gets wrapped in sbt chatter ("[success] ..." trails the
    // JSON), so also drop the line where a consumer can read it clean
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_self.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
