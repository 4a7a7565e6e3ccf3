package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>`.
  *
  * These replace what the reference does with NumPy kernels over a
  * contiguous float32 slab (reference: vector_store.py:291). A native
  * expression (vs a Scala UDF) avoids per-row boxing/decoding and keeps
  * the operator inside whole-stage codegen; float32 accumulation matches
  * the reference goldens (test/tests.py:223-224).
  */
abstract class BinaryVectorExpression extends BinaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  protected def kernelName: String
  override def nullSafeEval(a: Any, b: Any): Any =
    evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalKernel(a: ArrayData, b: ArrayData): Any
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.Kernels.$kernelName($a, $b)")
}

/** Euclidean distance in float32 (reference vector_store.py:291). */
case class L2Distance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def dataType: DataType = FloatType
  override protected def kernelName: String = "l2"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Any = Kernels.l2(a, b)
  override def prettyName: String = "l2_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared Euclidean distance — monotone in L2, cheaper for ranking. */
case class L2SqDistance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def dataType: DataType = FloatType
  override protected def kernelName: String = "l2Sq"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Any = Kernels.l2Sq(a, b)
  override def prettyName: String = "l2_sq_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def dataType: DataType = FloatType
  override protected def kernelName: String = "dot"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Any = Kernels.dot(a, b)
  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity; 0 when either vector has zero norm. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def dataType: DataType = FloatType
  override protected def kernelName: String = "cosine"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Any = Kernels.cosine(a, b)
  override def prettyName: String = "cosine_similarity"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Element-wise vector difference in float32 — the residual `v - c`
  * of residual-encoding IVF-PQ, kept a codegen kernel so the build
  * pass (every corpus row) stays inside whole-stage codegen instead
  * of falling back to an interpreted `zip_with`.
  */
case class VecSub(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override protected def kernelName: String = "vecSub"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Any = Kernels.vecSub(a, b)
  override def prettyName: String = "vec_sub"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass sign-pattern LSH bucket over seeded hyperplanes (see
  * [[Kernels.hyperplaneBucket]]); replaces nBits composed dot-product
  * calls with a single vector read.
  */
case class HyperplaneBucket(child: Expression, dim: Int, nBits: Int, seed: Long)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  require(nBits > 0 && nBits <= 62, "bucket fits in a long")
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullSafeEval(vec: Any): Any =
    Kernels.hyperplaneBucket(vec.asInstanceOf[ArrayData], dim, nBits, seed)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.Kernels.hyperplaneBucket($v, $dim, $nBits, ${seed}L)")
  override def prettyName: String = "hyperplane_bucket"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fixed matrix × vector — the OPQ rotation apply ([[Kernels.matVec]]).
  * The matrix is carried as a codegen reference object (bounded plan
  * state, `rows × dim` floats), NOT an expression tree: a 64×64
  * rotation as composed arithmetic would be a ~4096-node plan. Not
  * SQL-registered (matrix literals have no SQL syntax); construct via
  * [[graft.functions.mat_vec]].
  */
case class MatVec(child: Expression, mat: Array[Array[Float]])
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(vec: Any): Any =
    Kernels.matVec(vec.asInstanceOf[ArrayData], mat)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVecMat", mat, "float[][]")
    defineCodeGen(ctx, ev, v => s"graft.expressions.Kernels.matVec($v, $ref)")
  }
  override def prettyName: String = "mat_vec"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Flat-codebook PQ code assignment ([[Kernels.pqEncode]]) — the
  * encode projection for codebooks too wide to unroll as literal
  * argmin structs (k=256 blew janino's method limit and fell back to
  * interpreted eval). The codebook is a codegen reference object, the
  * same bounded-plan-state move as [[MatVec]]. Not SQL-registered
  * (codebook literals have no SQL syntax); construct via
  * [[graft.functions.pq_encode]].
  */
case class PqEncodeCodes(child: Expression, cb: Array[Float], m: Int,
    k: Int, subDim: Int)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  require(m >= 1 && k >= 1 && subDim >= 1 && cb.length == m * k * subDim,
    s"flat codebook must hold m*k*subDim floats (m=$m k=$k subDim=$subDim)")
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(vec: Any): Any =
    Kernels.pqEncode(vec.asInstanceOf[ArrayData], cb, m, k, subDim)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeCb", cb, "float[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.Kernels.pqEncode($v, $ref, $m, $k, $subDim)")
  }
  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
