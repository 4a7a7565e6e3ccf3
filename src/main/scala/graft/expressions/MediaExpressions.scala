package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Perceptual image hashes as codegen expressions over `binary` payload
  * columns — the image-dedup staple of multimodal pipelines: hash every
  * image in the scan projection, then near-dup by Hamming distance with
  * the same quarter-block LSH banding the text SimHash path uses
  * (`Dedup.hash64NearDupPairs`). The decode itself is the REAL
  * [[graft.multimodal.Multimodal.Codecs]] ImageIO path; undecodable
  * payloads degrade to a deterministic content hash (FNV-1a 64) so a
  * foreign payload can never fail a batch. Both hashes are TOTAL, so
  * codegen stays in the non-null fast path.
  */
/** Static forwarders for generated code: a NESTED Scala object
  * (`Multimodal.Codecs`) compiles to `Multimodal$Codecs$.MODULE$`,
  * which Janino cannot resolve from the `A.B.method(x)` call shape
  * `defineCodeGen` emits — only TOP-LEVEL objects get static
  * forwarder methods. (Symptom without this: every per-row call
  * silently falls back to interpreted evaluation.)
  */
object MediaKernels {
  def dHash64(b: Array[Byte]): Long =
    graft.multimodal.Multimodal.Codecs.dHash64(b)
  def pHash64(b: Array[Byte]): Long =
    graft.multimodal.Multimodal.Codecs.pHash64(b)
  def audioHash64(b: Array[Byte]): Long =
    graft.multimodal.Multimodal.Codecs.audioHash64(b)
}

case class ImageDHash64(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any): Any =
    graft.multimodal.Multimodal.Codecs.dHash64(b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"graft.expressions.MediaKernels.dHash64($b)")
  override def prettyName: String = "image_dhash64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** See [[ImageDHash64]]; the audio counterpart (65-frame energy-delta
  * fingerprint over the PCM stream — `Codecs.audioHash64`).
  */
case class AudioHash64(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any): Any =
    graft.multimodal.Multimodal.Codecs.audioHash64(b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"graft.expressions.MediaKernels.audioHash64($b)")
  override def prettyName: String = "audio_hash64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** See [[ImageDHash64]]; the DCT variant (robust to resize/blur). */
case class ImagePHash64(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any): Any =
    graft.multimodal.Multimodal.Codecs.pHash64(b.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"graft.expressions.MediaKernels.pHash64($b)")
  override def prettyName: String = "image_phash64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
