package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.{Column, SparkSession}

import graft.expressions._

/** Column-API entry points for graft's native expressions, plus SQL
  * registration. Mirrors the layout of `org.apache.spark.sql.functions`.
  */
object functions {
  private def c(e: Expression): Column = GraftShim.column(e)
  private def e(col: Column): Expression = GraftShim.expression(col)

  /** Float32 Euclidean distance between two `array<float>` columns. */
  def l2_distance(a: Column, b: Column): Column = c(L2Distance(e(a), e(b)))

  /** Squared Euclidean distance (monotone in L2; cheaper for top-k). */
  def l2_sq_distance(a: Column, b: Column): Column = c(L2SqDistance(e(a), e(b)))

  def dot_product(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))

  def cosine_similarity(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))

  /** Element-wise `a - b` over `array<float>` (residual vectors). */
  def vec_sub(a: Column, b: Column): Column = c(VecSub(e(a), e(b)))

  /** rapidfuzz `fuzz.ratio`-compatible normalized Indel similarity ∈ [0,100]. */
  def indel_similarity(a: Column, b: Column): Column = c(IndelSimilarity(e(a), e(b)))

  /** `100 - indel_similarity` — the reference's fuzzy-search distance. */
  def indel_distance(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.lit(100.0) - indel_similarity(a, b)

  def minhash_signature(tokens: Column, k: Int): Column = c(MinHashSignature(e(tokens), k))

  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))

  def hamming64(a: Column, b: Column): Column = c(Hamming64(e(a), e(b)))

  def fingerprint64(s: Column): Column = c(Fingerprint64(e(s)))

  /** Unicode NFC normalization (see [[graft.expressions.NfcNormalize]]). */
  def nfc_normalize(s: Column): Column = c(NfcNormalize(e(s)))

  /** Equi-depth bucket index by binary search over sorted boundaries
    * (see [[graft.expressions.BucketIndex]]).
    */
  def bucket_index(v: Column, bounds: Array[Double]): Column =
    c(BucketIndex(e(v), bounds.toIndexedSeq))

  /** One-pass hyperplane LSH bucket (see [[graft.expressions.HyperplaneBucket]]). */
  def hyperplane_bucket(vec: Column, dim: Int, nBits: Int, seed: Long): Column =
    c(HyperplaneBucket(e(vec), dim, nBits, seed))

  /** Perceptual image hashes over `binary` payloads (real ImageIO
    * decode; deterministic content-hash fallback — see
    * [[graft.expressions.ImageDHash64]]).
    */
  def image_dhash64(payload: Column): Column = c(ImageDHash64(e(payload)))
  def image_phash64(payload: Column): Column = c(ImagePHash64(e(payload)))
  def audio_hash64(payload: Column): Column = c(AudioHash64(e(payload)))

  /** Reference-format blob codec: LE float32 bytes ↔ `array<float>`. */
  def float_blob_decode(b: Column): Column = c(FloatBlobDecode(e(b)))
  def float_blob_encode(v: Column): Column = c(FloatBlobEncode(e(v)))

  /** Evaluate a SQL-registry argument that must be a foldable integer
    * literal (e.g. `hyperplane_bucket(v, 16, 16, 42)`): accepts any
    * integral literal width (INT and BIGINT both appear depending on the
    * SQL writer) and raises a clear analysis-time error for non-foldable
    * arguments instead of an opaque eval-time ClassCastException.
    */
  private def foldableLong(arg: Expression, fn: String, param: String): Long = {
    def fail(): Nothing = throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> fn, "paramName" -> param, "paramType" -> "integer literal"))
    if (!arg.foldable) fail()
    // integral widths only — a fractional literal silently truncating
    // (2.9 → 2) would change results instead of failing the typo
    arg.eval() match {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
      case _ => fail()
    }
  }

  private def foldableInt(arg: Expression, fn: String, param: String): Int = {
    val l = foldableLong(arg, fn, param)
    if (l < Int.MinValue || l > Int.MaxValue) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> fn, "paramName" -> param, "paramType" -> "32-bit integer literal"))
    }
    l.toInt
  }

  /** SQL function descriptors (name → builder) for all graft expressions. */
  private[graft] val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2_distance" -> (args => L2Distance(args(0), args(1))),
    "l2_sq_distance" -> (args => L2SqDistance(args(0), args(1))),
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    "cosine_similarity" -> (args => CosineSimilarity(args(0), args(1))),
    "vec_sub" -> (args => VecSub(args(0), args(1))),
    "indel_similarity" -> (args => IndelSimilarity(args(0), args(1))),
    "minhash_signature" -> (args =>
      MinHashSignature(args(0), foldableInt(args(1), "minhash_signature", "num_hashes"))),
    "simhash64" -> (args => SimHash64(args(0))),
    "hamming64" -> (args => Hamming64(args(0), args(1))),
    "fingerprint64" -> (args => Fingerprint64(args(0))),
    "nfc_normalize" -> (args => NfcNormalize(args(0))),
    "hyperplane_bucket" -> (args => HyperplaneBucket(args(0),
      foldableInt(args(1), "hyperplane_bucket", "dim"),
      foldableInt(args(2), "hyperplane_bucket", "n_bits"),
      foldableLong(args(3), "hyperplane_bucket", "seed"))),
    "float_blob_decode" -> (args => FloatBlobDecode(args(0))),
    "float_blob_encode" -> (args => FloatBlobEncode(args(0))),
    "image_dhash64" -> (args => ImageDHash64(args(0))),
    "image_phash64" -> (args => ImagePHash64(args(0))),
    "audio_hash64" -> (args => AudioHash64(args(0))),
  )

  /** Register all graft functions in a session's function registry so they
    * are usable from `spark.sql(...)` / `expr(...)`.
    */
  def registerAll(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** Descriptors for `SparkSessionExtensions.injectFunction`. */
  private[graft] def extensionFunctions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    sqlFunctions.map { case (name, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft.expressions", name), builder)
    }
}
