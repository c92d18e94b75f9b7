package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Custom Catalyst AGGREGATE for the exact int8 scatter matrix (q162's
  * family): accumulates the upper-triangle second-moment sums
  * `S[i][j] = Σ_rows q_i·q_j` directly into one `long[d(d+1)/2]` buffer.
  *
  * Why an aggregate and not the declarative explode→groupBy form
  * ([[graft.engine.EmbeddingStats.intScatterExplode]], kept as the
  * differential reference): the explode amplifies every row into
  * d(d+1)/2 = 2,080 struct rows that each pass through the hash
  * aggregator's probe path — pipelined, but still ~2,000× the row
  * traffic of the scan. This aggregate does the d²/2 multiply-adds in a
  * tight loop per row with ZERO intermediate rows, and the exchange
  * carries exactly ONE ~16 KB serialized buffer per map task (keyless
  * partial → final merge), which is the optimal communication pattern
  * for a fixed-width mergeable statistic at any corpus size.
  *
  * Exactness is unchanged: the same BIGINT adds in a different
  * (associative) order. Null input rows are skipped (they contribute no
  * products, matching the explode form on non-null arrays; quantized
  * inputs never carry null elements). A wrong-dimension array fails
  * loudly — silently truncating would corrupt the matrix.
  */
case class IntScatterAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(dim >= 1, "dim must be positive")

  private val triLen = dim * (dim + 1) / 2

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType))

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(new StructType()
    .add("i", IntegerType, nullable = false)
    .add("j", IntegerType, nullable = false)
    .add("s", LongType, nullable = false), containsNull = false)

  override def prettyName: String = "graft_int_scatter"

  override def children: Seq[Expression] = child :: Nil

  override def createAggregationBuffer(): Array[Long] = new Array[Long](triLen)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim) {
        throw new IllegalArgumentException(
          s"graft_int_scatter: expected dim=$dim, got ${arr.numElements()}")
      }
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) { q(i) = arr.getInt(i).toLong; i += 1 }
      var k = 0
      i = 0
      while (i < dim) {
        val qi = q(i)
        var j = i
        while (j < dim) { buffer(k) += qi * q(j); j += 1; k += 1 }
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < triLen) { b1(k) += b2(k); k += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    val rows = new Array[Any](triLen)
    var k = 0
    var i = 1
    while (i <= dim) {
      var j = i
      while (j <= dim) {
        rows(k) = InternalRow(i, j, buffer(k))
        j += 1; k += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(triLen * 8)
    var k = 0
    while (k < triLen) { bb.putLong(buffer(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](triLen)
    var k = 0
    while (k < triLen) { out(k) = bb.getLong(); k += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): IntScatterAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): IntScatterAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Column-API surface for the scatter aggregate. */
object ScatterFunctions {

  /** Keyless scatter-triangle aggregation over an `array<int>` column:
    * one array<struct<i,j,s>> row of d(d+1)/2 exact BIGINT sums, 1-based
    * upper-triangle indices — explode it for the (i, j, s) relation. */
  def intScatterTriangle(q: Column, dim: Int): Column =
    ExpressionUtils.column(
      IntScatterAgg(ExpressionUtils.expression(q), dim)
        .toAggregateExpression())
}
