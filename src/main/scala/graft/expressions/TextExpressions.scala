package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text/fingerprint expressions for fuzzy search and dedup.
  *
  * `IndelSimilarity` reproduces rapidfuzz's `fuzz.ratio` (normalized
  * Indel similarity) used by the reference's fuzzy doc search
  * (reference: vector_store.py:377-387); Spark's built-in `levenshtein`
  * allows substitutions and does NOT match those semantics.
  */
case class IndelSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.indelSimilarity(a.toString, b.toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.Kernels.indelSimilarity($a.toString(), $b.toString())")
  override def prettyName: String = "indel_similarity"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** MinHash signature of a token array: k minima under k seeded hashes. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  require(k > 0, "minhash signature size k must be > 0")
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(tokens: Any): Any =
    new GenericArrayData(Kernels.minHashSignature(tokens.asInstanceOf[ArrayData], k))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.Kernels.minHashSignature($a, $k))")
  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of a token array (bitwise majority of token hashes). */
case class SimHash64(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any): Any =
    Kernels.simHash64(tokens.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.Kernels.simHash64($a)")
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two 64-bit hashes (SimHash comparison). */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override def prettyName: String = "hamming64"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Rolling polynomial fingerprint of a string (order-sensitive 64-bit). */
case class Fingerprint64(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    Kernels.fingerprint64(s.asInstanceOf[UTF8String].toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.Kernels.fingerprint64($a.toString())")
  override def prettyName: String = "fingerprint64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Equi-depth bucket index of a double against a sorted boundary array
  * (binary search; see [[Kernels.bucketIndex]]). The boundaries come
  * from a `percentile_approx` sketch over the distinct-value frame, so
  * the bucketed two-level prefix sum (Outliers.valueCounts) keeps its
  * per-bucket window partitions bounded under arbitrary value skew —
  * uniform-width bucketing puts a heavy-tailed column's whole mass in
  * one bucket. Boundaries ride codegen as a referenced object, keeping
  * the probe inside whole-stage codegen.
  */
case class BucketIndex(child: Expression, bounds: IndexedSeq[Double])
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  // bounds is an IndexedSeq (value equality), NOT an Array: case-class
  // equals on an Array field is reference identity, which breaks
  // semanticEquals / subexpression elimination / plan canonicalization
  // for two structurally identical bucket_index expressions.
  private lazy val boundsArr: Array[Double] = bounds.toArray
  override def declaredInputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Kernels.bucketIndex(v.asInstanceOf[Double], boundsArr)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", boundsArr, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.expressions.Kernels.bucketIndex($a, $ref)")
  }
  override def prettyName: String = "bucket_index"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode NFC normalization — the step BEFORE any text hashing when a
  * corpus mixes encodings: "é" as e+COMBINING ACUTE and precomposed
  * U+00E9 are the same document after NFC, different 16-byte hashes
  * without it. See [[Kernels.nfcNormalize]] for the engine contract.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.graftshim.GraftImplicitCasts {
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    Kernels.nfcNormalize(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.Kernels.nfcNormalize($a)")
  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
