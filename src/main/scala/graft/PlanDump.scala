package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for the named queries into a
  * directory, one `<query><suffix>.txt` per query — the round-15
  * optimization evidence trail (plans/r15/<query>_before.txt /
  * _after.txt). Unlike [[Explain]] (which documents the final
  * AQE-executed plan in one markdown file), this emits the FORMATTED
  * plan per query so a before/after diff shows Exchange counts, join
  * strategies and PushedFilters per operator id.
  *
  * Usage: runMain graft.PlanDump <q1,q2,...> <outDir> <suffix> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = args(1)
    val suffix = args(2)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // run the query first so AdaptiveSparkPlan prints isFinalPlan=true
      // runtime decisions (join demotions, coalesced reads)
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"$name$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"dumped $name$suffix")
    }
    spark.stop()
  }
}
