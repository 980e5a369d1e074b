package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `topk_by(ord, id, k)`: per-group top-k (ord, id) pairs by ord desc
  * (id asc tie-break), as a TypedImperativeAggregate with a bounded
  * binary heap buffer.
  *
  * Scale rationale: the window-function formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY ord DESC) <= k`) must
  * SORT every group in full; this aggregate keeps only k entries per
  * group per partition and merges heaps map-side, so a 10^9-row group
  * costs O(n log k) and O(k) memory — the same reason Spark plans
  * global `ORDER BY+LIMIT` as TakeOrderedAndProject.
  *
  * Output: array<struct<ord double, id bigint>> sorted ord desc, id asc.
  */
case class TopKBy(ordExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBy.Heap] {

  override def children: Seq[Expression] = Seq(ordExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKBy.Heap = new TopKBy.Heap(k)

  override def update(buf: TopKBy.Heap, input: InternalRow): TopKBy.Heap = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    if (o != null && i != null) {
      buf.offer(o.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBy.Heap, b: TopKBy.Heap): TopKBy.Heap = {
    b.foreach((o, i) => a.offer(o, i)); a
  }

  override def eval(buf: TopKBy.Heap): Any = {
    val sorted = buf.toSortedArray
    new GenericArrayData(sorted.map { case (o, i) =>
      InternalRow(o, i)
    })
  }

  override def serialize(buf: TopKBy.Heap): Array[Byte] = {
    val n = buf.size
    val bb = java.nio.ByteBuffer.allocate(8 + n * 16)
    bb.putInt(k); bb.putInt(n)
    buf.foreach((o, i) => { bb.putDouble(o); bb.putLong(i) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBy.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt
    val h = new TopKBy.Heap(kk)
    (0 until n).foreach(_ => h.offer(bb.getDouble, bb.getLong))
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKBy =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKBy =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKBy =
    copy(ordExpr = cs(0), idExpr = cs(1))
  override def prettyName: String = "topk_by"
}

object TopKBy {

  /** Bounded min-heap on (ord asc, id desc) so the ROOT is the entry
    * to evict: keeps the k largest by (ord, then smaller id wins ties).
    */
  final class Heap(k: Int) {
    private val ords = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    // true if (o1,i1) should be kept OVER (o2,i2) — i.e. ranks higher
    private def better(o1: Double, i1: Long, o2: Double, i2: Long) =
      o1 > o2 || (o1 == o2 && i1 < i2)

    def offer(o: Double, i: Long): Unit = {
      if (n < k) {
        ords(n) = o; ids(n) = i; n += 1; siftUp(n - 1)
      } else if (k > 0 && better(o, i, ords(0), ids(0))) {
        ords(0) = o; ids(0) = i; siftDown(0)
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) / 2
        if (better(ords(p), ids(p), ords(i), ids(i))) {
          swap(i, p); i = p
        } else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && better(ords(m), ids(m), ords(l), ids(l))) m = l
        if (r < n && better(ords(m), ids(m), ords(r), ids(r))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val to = ords(a); ords(a) = ords(b); ords(b) = to
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ords(i), ids(i)); i += 1 }
    }

    /** descending ord, ascending id */
    def toSortedArray: Array[(Double, Long)] = {
      val arr = new Array[(Double, Long)](n)
      var i = 0
      while (i < n) { arr(i) = (ords(i), ids(i)); i += 1 }
      arr.sortWith { case ((o1, i1), (o2, i2)) =>
        o1 > o2 || (o1 == o2 && i1 < i2)
      }
    }
  }

  /** Column API: top-k (ord,id) per group. */
  def topkBy(ord: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKBy(
      ColumnBridge.expression(ord), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
