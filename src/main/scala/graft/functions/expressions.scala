package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the distance kernels the reference's
  * Python UDF layer provided (`Team11-Project.py:166-183`, `:339-341`,
  * `:531-541`). Unlike the reference (opaque Python lambdas, one
  * serialization boundary per row-batch), these are native expressions with
  * `doGenCode` — they inline into whole-stage codegen as a static call into
  * [[Kernels]], so a crossJoin + distance + top-k pipeline is a single
  * generated loop.
  */
abstract class ArrayPairDoubleExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  /** Fully-qualified static method on [[Kernels]] taking two ArrayData. */
  protected def kernel: String
  protected def kernelFn(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    kernelFn(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.$kernel($a, $b)")
}

case class EuclideanDistance(left: Expression, right: Expression)
    extends ArrayPairDoubleExpression {
  override def prettyName: String = "graft_euclidean"
  protected def kernel = "euclideanAD"
  protected def kernelFn(a: ArrayData, b: ArrayData): Double = Kernels.euclideanAD(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class SquaredDistance(left: Expression, right: Expression)
    extends ArrayPairDoubleExpression {
  override def prettyName: String = "graft_sqdist"
  protected def kernel = "sqdistAD"
  protected def kernelFn(a: ArrayData, b: ArrayData): Double = Kernels.sqdistAD(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends ArrayPairDoubleExpression {
  override def prettyName: String = "graft_cosine"
  protected def kernel = "cosineAD"
  protected def kernelFn(a: ArrayData, b: ArrayData): Double = Kernels.cosineAD(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class DotProduct(left: Expression, right: Expression)
    extends ArrayPairDoubleExpression {
  override def prettyName: String = "graft_dot"
  protected def kernel = "dotAD"
  protected def kernelFn(a: ArrayData, b: ArrayData): Double = Kernels.dotAD(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class ManhattanDistance(left: Expression, right: Expression)
    extends ArrayPairDoubleExpression {
  override def prettyName: String = "graft_manhattan"
  protected def kernel = "manhattanAD"
  protected def kernelFn(a: ArrayData, b: ArrayData): Double = Kernels.manhattanAD(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Exact DTW with optional Sakoe-Chiba band (band < 0 = unconstrained).
  * Parity target: `fastdtw`'s exact recursion with 1-D |x-y| cost
  * (reference `Team11-Project.py:339-341`).
  */
case class DtwDistance(left: Expression, right: Expression, band: Int)
    extends ArrayPairDoubleExpression {
  override def prettyName: String = "graft_dtw"
  protected def kernel = "" // unused, custom codegen below
  protected def kernelFn(a: ArrayData, b: ArrayData): Double = Kernels.dtwAD(a, b, band)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dtwAD($a, $b, $band)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** FastDTW (Salvador & Chan 2007); radius=1 matches the Python package
  * default the reference relies on (`Team11-Project.py:17`, `:339`).
  */
case class FastDtwDistance(left: Expression, right: Expression, radius: Int)
    extends ArrayPairDoubleExpression {
  override def prettyName: String = "graft_fastdtw"
  protected def kernel = "" // unused, custom codegen below
  protected def kernelFn(a: ArrayData, b: ArrayData): Double = Kernels.fastdtwAD(a, b, radius)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.fastdtwAD($a, $b, $radius)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 64-bit SimHash over an array<string> of tokens (Charikar 2002):
  * per-token XXH64, bit-vote, sign -> bit. Used by near-duplicate
  * detection at training-data scale (one pass, no shuffle).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "graft_simhash64"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SimHash64.hash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

object SimHash64 {
  private final val Seed = 42L
  def hash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = xxh64(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  private def xxh64(s: UTF8String): Long = {
    val bytes = s.getBytes
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed)
  }
  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** Hamming distance between two simhash signatures, as an expression so
  * near-dup joins stay codegen'd.
  */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "graft_hamming64"
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
