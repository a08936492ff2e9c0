package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k smallest (dist, id) pairs under
  * lexicographic (dist, id) order over DISTINCT ids — deterministic
  * no matter the arrival order, so partial aggregation across
  * partitions is safe.
  *
  * Id-dedup is part of the contract: a candidate id arriving more
  * than once (graph candidate generation emits the same neighbor via
  * many paths) occupies ONE slot, keeping its smallest dist. This is
  * what lets the candidate pipelines feed raw (duplicated) candidate
  * frames straight into the aggregate instead of paying a full
  * `.distinct()` exchange first — with per-id dists unique per group
  * (every caller scores id deterministically), the result is
  * identical to distinct-then-topk by construction.
  */
final class TopKBuffer(val k: Int) {
  // max-heap on (dist, id): root = current worst of the kept k;
  // kept mirrors the heap as id -> dist for O(1) duplicate checks
  private val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(k, 1),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })
  private val kept = new java.util.HashMap[Long, java.lang.Double]()

  def add(dist: Double, id: Long): Unit = {
    if (heap.size == k) {
      // zero-allocation fast reject (the overwhelmingly common case
      // on big candidate frames): strictly worse than the kept worst
      // can neither enter nor be a kept duplicate needing an update
      // (a kept copy of this id would have an equal-or-better dist)
      val worst = heap.peek()
      if (dist > worst._1 || (dist == worst._1 && id > worst._2)) return
    }
    val cur = kept.get(id)
    if (cur != null) {
      // duplicate id: keep the better dist (equal dists are the
      // common case — same candidate reached via two paths)
      if (dist < cur.doubleValue()) {
        heap.remove((cur.doubleValue(), id)) // O(k), k is small
        heap.add((dist, id))
        kept.put(id, dist)
      }
    } else if (heap.size < k) {
      heap.add((dist, id)); kept.put(id, dist)
    } else {
      val worst = heap.peek()
      heap.poll(); kept.remove(worst._2)
      heap.add((dist, id)); kept.put(id, dist)
    }
  }

  def merge(other: TopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val (d, i) = it.next(); add(d, i) }
  }

  /** Ascending (dist, id). */
  def sorted: Array[(Double, Long)] = {
    val arr = heap.toArray(new Array[(Double, Long)](heap.size))
    scala.util.Sorting.stableSort(arr,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
    arr
  }

  def serialize(): Array[Byte] = {
    val arr = heap.toArray(new Array[(Double, Long)](heap.size))
    val bb = ByteBuffer.allocate(8 + arr.length * 16)
    bb.putInt(k); bb.putInt(arr.length)
    arr.foreach { case (d, i) => bb.putDouble(d); bb.putLong(i) }
    bb.array()
  }
}

object TopKBuffer {
  def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach(_ => buf.add(bb.getDouble, bb.getLong))
    buf
  }
}

/** topk_pairs(dist, id, k): aggregate the k smallest (dist, id) pairs
  * per group into array<struct<dist,id>> (ascending).
  *
  * The point is the partial-aggregation contract: each map task
  * reduces its partition to <= k pairs per group BEFORE the shuffle,
  * so a batch kNN over a 100 TB corpus shuffles q*k*partitions rows,
  * not q*|corpus| — the rank-window formulation it replaces shuffles
  * every candidate pair (see Knn.knnJoin).
  */
case class TopKPairs(
    dist: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(dist, id)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType), StructField("id", LongType))), false)

  override def checkInputDataTypes(): TypeCheckResult =
    (dist.dataType, id.dataType) match {
      case (DoubleType | FloatType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (d, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs expects (double, bigint), got (${d.catalogString}, ${i.catalogString})")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val d = dist.eval(input)
    val i = id.eval(input)
    if (d != null && i != null) {
      val dd = d match {
        case f: java.lang.Float => f.doubleValue()
        case x => x.asInstanceOf[Double]
      }
      val ii = i match {
        case n: java.lang.Integer => n.longValue()
        case x => x.asInstanceOf[Long]
      }
      buf.add(dd, ii)
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (d, i) =>
      InternalRow(d, i)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column form of topk_pairs for groupBy().agg(...). */
  def topk_pairs(dist: Column, id: Column, k: Int): Column =
    Shims.column(TopKPairs(
      Shims.expression(dist), Shims.expression(id), k)
      .toAggregateExpression())
}
