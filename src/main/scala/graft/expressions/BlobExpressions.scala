package graft.expressions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Binary ↔ `array<float>` codec matching the reference's on-disk vector
  * encoding: raw little-endian float32 bytes (reference:
  * vector_store.py:122-123 `ndarray.tobytes()` / :114-120 `np.frombuffer`).
  * Needed only when importing/exporting the reference's SQLite blobs —
  * graft's native format stores vectors as parquet `array<float>`.
  */
object BlobKernels {
  def decode(bytes: Array[Byte]): Array[Float] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = buf.getFloat(i * 4); i += 1 }
    out
  }

  def encode(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    val buf = ByteBuffer.allocate(n * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { buf.putFloat(i * 4, vec.getFloat(i)); i += 1 }
    buf.array()
  }

  def decodeArrayData(bytes: Array[Byte]): ArrayData = new GenericArrayData(decode(bytes))
}

/** `binary` (LE float32 bytes) → `array<float>`. */
case class FloatBlobDecode(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(b: Any): Any =
    BlobKernels.decodeArrayData(b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.BlobKernels.decodeArrayData($b)")
  override def prettyName: String = "float_blob_decode"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `array<float>` → `binary` (LE float32 bytes). */
case class FloatBlobEncode(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    BlobKernels.encode(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.BlobKernels.encode($v)")
  override def prettyName: String = "float_blob_encode"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
