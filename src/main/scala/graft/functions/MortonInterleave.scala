package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (z-order) bit interleave of two non-negative bucket ordinals —
  * the space-filling-curve key behind multi-dimensional data clustering:
  * sorting by the interleaved key co-locates rows that are close in BOTH
  * dimensions, so per-file min/max statistics become selective for filters
  * on either column (classic z-order layout, as popularized for data
  * skipping in large lakehouse tables; the curve itself is Morton 1966).
  *
  * Takes the low 31 bits of each input (inputs are expected to be small
  * bucket ordinals — see `etl/Layout.zOrderKey`, which range-bucketizes raw
  * columns first; raw values would interleave magnitudes, not locality).
  * Codegen is one static call, so whole-stage codegen stays intact (same
  * pattern as [[SortedIntersectCount]]).
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"requires (bigint, bigint), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    MortonInterleave.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MortonInterleave.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonInterleave {

  def apply(a: Column, b: Column): Column =
    toColumn(MortonInterleave(toExpression(a), toExpression(b)))

  /** Spread the low 31 bits of v onto the even bit positions of a long —
    * standard magic-mask doubling (Warren, Hacker's Delight §7-2 / the
    * canonical "Interleave by Binary Magic Numbers" bit-hack). */
  def spread(v0: Long): Long = {
    var v = v0 & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Static entry for both interpreted eval and generated code: x's bits on
    * even positions, y's on odd — 62-bit z-key, never negative. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** The SAME interleave as portable SQL (for the DuckDB oracle): an
    * unrolled sum of single-bit shifts. `bits` must cover the bucket
    * ordinal domain; terms above it are zero anyway. Bits are disjoint, so
    * `+` is `|`. */
  def sqlDuck(x: String, y: String, bits: Int): String = {
    val xs = (0 until bits).map(i => s"((($x >> $i) & 1) << ${2 * i})")
    val ys = (0 until bits).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})")
    (xs ++ ys).mkString("(", " + ", ")")
  }
}
