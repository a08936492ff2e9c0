package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VectorWire

/** Byte-level pins of the reference wire format (vector.go:89-178)
  * plus distributed read/write round trips.
  */
class VectorWireSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("encode produces the reference byte layout (golden bytes)") {
    // hand-build the exact layout the reference Encode() emits:
    // [idLen u32 LE][id][dim u32 LE][float32 LE...][metaLen u32 LE][meta]
    val id = "v1".getBytes(UTF_8)
    val meta = "a=1".getBytes(UTF_8)
    val expect = ByteBuffer.allocate(4 + 2 + 4 + 8 + 4 + 3)
      .order(ByteOrder.LITTLE_ENDIAN)
    expect.putInt(2).put(id).putInt(2)
      .putFloat(1.0f).putFloat(-2.5f)
      .putInt(3).put(meta)
    val got = VectorWire.encode("v1", Array(1.0f, -2.5f), Map("a" -> "1"))
    assert(got.sameElements(expect.array()),
      s"got ${got.toSeq} expected ${expect.array().toSeq}")
  }

  test("decode(encode) round-trips, including escaped = and ; in metadata") {
    val meta = Map("k=ey" -> "v;al", "plain" -> "x=y;z", "" -> "empty-key")
    val r = VectorWire.decode(
      VectorWire.encode("doc;1=weird", Array(0.5f, 1.5f, -3f), meta))
    assert(r.id == "doc;1=weird")
    assert(r.vector.toSeq == Seq(0.5f, 1.5f, -3f))
    assert(r.metadata == meta)
  }

  test("metadata edge cases: empty keys/values, escape-only content") {
    for (m <- Seq(Map("" -> ""), Map("" -> "x"), Map("a" -> ""),
        Map(" " -> "="), Map(";" -> ";"), Map("=" -> "=="))) {
      val r = VectorWire.decode(VectorWire.encode("i", Array(1f), m))
      assert(r.metadata == m, s"$m decoded as ${r.metadata}")
    }
  }

  test("decode is lenient like the reference: missing/overrun metadata -> empty") {
    val full = VectorWire.encode("x", Array(1f), Map("a" -> "b"))
    // truncate right after the values: no metadata section at all
    val noMeta = full.take(4 + 1 + 4 + 4)
    assert(VectorWire.decode(noMeta).metadata.isEmpty)
    assert(VectorWire.decode(noMeta).vector.toSeq == Seq(1f))
    // declared metadata length overruns the buffer -> empty map
    val overrun = full.take(full.length - 1)
    assert(VectorWire.decode(overrun).metadata.isEmpty)
    // too-short buffers fail loudly
    intercept[IllegalArgumentException] { VectorWire.decode(Array[Byte](1, 2)) }
    // corrupt headers must fail the bound check cleanly, not overflow
    // Int arithmetic into a giant allocation / negative-size crash
    val hugeId = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(0x7FFFFFF8).putInt(0).putInt(0).array()
    intercept[IllegalArgumentException] { VectorWire.decode(hugeId) }
    val negId = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(0x80000000).putInt(0).putInt(0).array()
    intercept[IllegalArgumentException] { VectorWire.decode(negId) }
    val hugeDim = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(1).put('x'.toByte).putInt(0x7FFFFFFF).array()
    intercept[IllegalArgumentException] { VectorWire.decode(hugeDim) }
  }

  test("writeVecDir + readVecDir round-trip a collection (distributed read)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vec").toString
    val coll = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
      .select(
        concat(lit("vec_"), col("vec_id")).as("id"),
        col("embedding").as("vector"),
        map(lit("label"), col("label").cast("string")).as("metadata"))
    VectorWire.writeVecDir(coll, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".vec")) == 50)

    val back = VectorWire.readVecDir(spark, dir)
    assert(back.count() == 50)
    // byte-exact vector + metadata round trip, row for row
    val a = coll.select(col("id"), col("vector"),
      col("metadata")("label").as("l")).collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toSeq, r.getString(2))).sortBy(_._1)
    val b = back.select(col("id"), col("vector"),
      col("metadata")("label").as("l")).collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toSeq, r.getString(2))).sortBy(_._1)
    assert(a.sameElements(b))
    // the read is a real distributed source, not a driver loop
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("binaryFile") || plan.contains("FileScan"), plan)
  }

  test("a .vec dir loads straight into the VectorSql catalog") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vec_sql").toString
    val coll = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(20)
      .select(col("vec_id").cast("string").as("id"),
        col("embedding").as("vector"),
        map(lit("label"), col("label").cast("string")).as("metadata"))
    VectorWire.writeVecDir(coll, dir)
    val cat = new graft.sql.VectorSql.Catalog(spark)
    cat.put("imported", VectorWire.readVecDir(spark, dir))
    val n = graft.sql.VectorSql.execute(cat,
      "SELECT COUNT(*) FROM imported").head().getLong(0)
    assert(n == 20)
    val r = graft.sql.VectorSql.execute(cat,
      "SELECT id, distance FROM imported NEAREST TO " +
        "(SELECT vector FROM imported WHERE id = '0') LIMIT 1").head()
    assert(r.getString(0) == "0" && r.getDouble(1) == 0.0)
  }
}
