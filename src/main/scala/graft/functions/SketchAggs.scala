package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst implementations of the sketch aggregates (guide §4 —
  * per-task work). The original `udaf(Aggregator)` forms route every
  * input row through an ExpressionEncoder (boxing + row conversion) and
  * ship the aggregation buffer between partial and final stages via
  * JAVA SERIALIZATION (the BitSet buffer's declared encoder). These
  * TypedImperativeAggregates evaluate the child directly and serialize
  * buffers as their compact byte-array wire forms — the same bytes the
  * aggregate outputs, so partial→final shuffle carries exactly the
  * sketch. Semantics identical to the Aggregator forms (SketchSpec +
  * a4/a5 oracle pin them): NULL inputs are skipped, an empty group
  * yields the empty sketch (not NULL).
  */
abstract class SketchAgg[T] extends TypedImperativeAggregate[T]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
}

/** bitmap_construct_agg(long) → exact membership bitmap bytes. */
case class BitmapConstructAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[java.util.BitSet] {
  override def prettyName: String = "bitmap_construct_agg"
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()
  override def update(b: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      if (l >= 0 && l < Int.MaxValue) b.set(l.toInt)
    }
    b
  }
  override def merge(a: java.util.BitSet, b: java.util.BitSet): java.util.BitSet = {
    a.or(b); a
  }
  override def eval(b: java.util.BitSet): Any = b.toByteArray
  override def serialize(b: java.util.BitSet): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)
  override def withNewMutableAggBufferOffset(n: Int): BitmapConstructAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapConstructAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BitmapConstructAggExpr =
    copy(child = newChild)
}

/** bitmap_or_agg(binary) → OR-merge of pre-built bitmaps. */
case class BitmapOrAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[java.util.BitSet] {
  override def prettyName: String = "bitmap_or_agg"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()
  override def update(b: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) b.or(java.util.BitSet.valueOf(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(a: java.util.BitSet, b: java.util.BitSet): java.util.BitSet = {
    a.or(b); a
  }
  override def eval(b: java.util.BitSet): Any = b.toByteArray
  override def serialize(b: java.util.BitSet): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)
  override def withNewMutableAggBufferOffset(n: Int): BitmapOrAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapOrAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BitmapOrAggExpr =
    copy(child = newChild)
}

/** hll_add(long) → dense 2^p-register HLL sketch bytes. */
case class HllAddAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[Array[Byte]] {
  override def prettyName: String = "hll_add"
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Sketches.HllM)
  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Sketches.addToRegisters(b, v.asInstanceOf[Long])
    b
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
  override def eval(b: Array[Byte]): Any = b
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(n: Int): HllAddAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllAddAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllAddAggExpr =
    copy(child = newChild)
}

/** hll_merge(binary) → register-wise max of sketches. */
case class HllMergeAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SketchAgg[Array[Byte]] {
  override def prettyName: String = "hll_merge"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Sketches.HllM)
  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[Array[Byte]]
      var i = 0
      while (i < b.length && i < arr.length) { if (arr(i) > b(i)) b(i) = arr(i); i += 1 }
    }
    b
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
  override def eval(b: Array[Byte]): Any = b
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(n: Int): HllMergeAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllMergeAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAggExpr =
    copy(child = newChild)
}
