package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.VectorSql

/** ID-lookup plan parity with the reference planner's ID_LOOKUP plan
  * type (planner.go:18: a WHERE id = ... query is a keyed lookup, not
  * a scan). The dialect's analog: WHERE conditions compile to plain
  * Column predicates, so whatever pushdown the collection's source
  * supports flows through — for a collection stored AT REST with its
  * NATIVE string id column, `WHERE id = 'x'` reaches the parquet scan
  * as a pushed EqualTo (row-group/page pruning via id min-max stats —
  * the 100 TB point-lookup shape). The spec also pins the honest
  * counterexample: deriving id by CASTING a numeric column blocks the
  * EqualTo pushdown (Spark can't invert int→string casts), which is
  * why the at-rest recommendation on VectorSql.Catalog says store the
  * serving id column natively.
  */
class IdLookupProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def collFrame() =
    Tables.load(spark, sf, "embeddings").select(
      col("vec_id").cast("string").as("id"),
      col("embedding").as("vector"),
      map(lit("label"), col("label").cast("string")).as("metadata"))

  test("WHERE id = literal pushes EqualTo on a native at-rest collection") {
    val p = java.nio.file.Files.createTempDirectory("graft_idlk").toString
    try {
      collFrame().write.mode("overwrite").parquet(s"$p/coll")
      val cat = new VectorSql.Catalog(spark)
      cat.put("vectors", spark.read.parquet(s"$p/coll"))
      val sql = "SELECT id, dimension FROM vectors WHERE id = '7'"
      val plan = VectorSql.explain(cat, sql)
      assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)]"),
        plan)
      val got = VectorSql.execute(cat, sql).collect()
      assert(got.length === 1 && got.head.getString(0) === "7")
      // the counterexample, pinned so a future "optimization" that
      // quietly reintroduces the cast fails here: id derived by
      // casting a numeric source column loses the EqualTo pushdown
      val castCat = new VectorSql.Catalog(spark)
      castCat.put("vectors", collFrame())
      val castPlan = VectorSql.explain(castCat, sql)
      assert(!castPlan.contains("EqualTo"), castPlan)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(p))
    }
  }
}
