package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving sketch (Metwally et al. 2005) with the mergeable-
  * summaries merge (Agarwal et al. 2012): bounded-memory heavy
  * hitters over an unbounded stream of items.
  *
  * Per sketch of capacity m over N observed items:
  *  - every item with true count > N/m is GUARANTEED present;
  *  - for every kept item, exact <= est and est - err <= exact
  *    (est overcounts by at most its recorded err <= N/m).
  *
  * This is the 100 TB answer to "top tokens / domains / urls" when an
  * exact groupBy(term) shuffle (one row per DISTINCT item per
  * partition — billions for web-scale vocab) is not worth it: each
  * map task keeps m counters, the shuffle carries m rows per
  * partition, and the merged sketch preserves the guarantees above.
  * The exact form stays next to it (`ngram_topk`) — the sketch's
  * estimates depend on partition/merge order, so it is spec-bounded
  * (guarantee-checked vs the exact counts) rather than hash-oracled.
  */
final class SpaceSavingBuffer(val m: Int) {
  val counts = mutable.HashMap.empty[String, Long]
  val errs = mutable.HashMap.empty[String, Long]
  var n: Long = 0L

  private def evictMin(): (String, Long) = {
    // deterministic tie-break on item so identical buffers evict alike
    var minItem: String = null; var minCount = Long.MaxValue
    counts.foreach { case (it, c) =>
      if (c < minCount || (c == minCount && (minItem == null || it < minItem))) {
        minItem = it; minCount = c
      }
    }
    counts.remove(minItem); errs.remove(minItem)
    (minItem, minCount)
  }

  def add(item: String, by: Long = 1L, err: Long = 0L): Unit = {
    n += by
    counts.get(item) match {
      case Some(c) =>
        counts(item) = c + by
        if (err > 0) errs(item) = errs.getOrElse(item, 0L) + err
      case None =>
        if (counts.size < m) {
          counts(item) = by; if (err > 0) errs(item) = err
        } else {
          val (_, minCount) = evictMin()
          counts(item) = by + minCount
          errs(item) = err + minCount
        }
    }
  }

  /** Mergeable-summaries merge: absent items are charged the other
    * sketch's minimum count as additional error, then trim to m. */
  def merge(other: SpaceSavingBuffer): Unit = {
    if (other.counts.isEmpty) return
    val minSelf = if (counts.size < m) 0L else counts.values.min
    val minOther = if (other.counts.size < other.m) 0L else other.counts.values.min
    val items = counts.keySet ++ other.counts.keySet
    val merged = items.iterator.map { it =>
      val cA = counts.getOrElse(it, 0L); val cB = other.counts.getOrElse(it, 0L)
      val inA = counts.contains(it); val inB = other.counts.contains(it)
      val c = (if (inA) cA else minSelf) + (if (inB) cB else minOther)
      val e = errs.getOrElse(it, 0L) + other.errs.getOrElse(it, 0L) +
        (if (inA) 0L else minSelf) + (if (inB) 0L else minOther)
      (it, c, e)
    }.toArray
    counts.clear(); errs.clear()
    // keep the m largest (count, item) — deterministic tie-break
    val kept = merged.sortBy { case (it, c, _) => (-c, it) }.take(m)
    kept.foreach { case (it, c, e) =>
      counts(it) = c; if (e > 0) errs(it) = e
    }
    n += other.n
  }

  /** (item, est, err) by est desc, item asc. */
  def sorted: Array[(String, Long, Long)] =
    counts.iterator.map { case (it, c) => (it, c, errs.getOrElse(it, 0L)) }
      .toArray.sortBy { case (it, c, _) => (-c, it) }

  def serialize(): Array[Byte] = {
    val entries = sorted
    val byteArrs = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 4 + 8 + 4 + entries.indices.map(i => 4 + byteArrs(i).length + 16).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(m); bb.putLong(n); bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(byteArrs(i).length); bb.put(byteArrs(i))
      bb.putLong(entries(i)._2); bb.putLong(entries(i)._3)
    }
    bb.array()
  }
}

object SpaceSavingBuffer {
  def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SpaceSavingBuffer(bb.getInt)
    val n = bb.getLong
    val cnt = bb.getInt
    (0 until cnt).foreach { _ =>
      val len = bb.getInt; val arr = new Array[Byte](len); bb.get(arr)
      val it = new String(arr, StandardCharsets.UTF_8)
      buf.counts(it) = bb.getLong
      val e = bb.getLong; if (e > 0) buf.errs(it) = e
    }
    buf.n = n
    buf
  }
}

/** heavy_hitters(item, m): Space-Saving aggregate returning
  * array<struct<item:string, est:bigint, err:bigint>> (est desc).
  * Partial aggregation applies: each map task reduces its partition
  * to an m-counter sketch BEFORE the shuffle.
  */
case class HeavyHittersAgg(
    item: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType),
    StructField("err", LongType))), false)

  override def checkInputDataTypes(): TypeCheckResult = item.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(m)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: SpaceSavingBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (it, c, e) =>
      InternalRow(UTF8String.fromString(it), c, e)
    }.toArray[Any])

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

object HeavyHitters {
  /** Column form for agg(...): heavy_hitters(item, m). */
  def heavy_hitters(item: Column, m: Int): Column =
    Shims.column(HeavyHittersAgg(Shims.expression(item), m)
      .toAggregateExpression())
}
