package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run a single SparkEntry query and dump it to parquet.
  * Usage: runMain graft.RunOne <queryName> <sfDir> <outDir>
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.coalesce(1).write.mode("overwrite").parquet(outDir)
    println(s"[runone] $name rows=" + spark.read.parquet(outDir).count())
    spark.stop()
  }
}
