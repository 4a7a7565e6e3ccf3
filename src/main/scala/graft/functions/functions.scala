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

  /** Fixed matrix × float32 vector (the OPQ rotation apply); the
    * matrix rides codegen as a reference object, not a plan tree.
    */
  def mat_vec(v: Column, mat: Array[Array[Float]]): Column = c(MatVec(e(v), mat))

  /** PQ codes over a flat codebook — the loop-kernel encode for wide
    * (k > 16) codebooks; see [[graft.expressions.PqEncodeCodes]].
    */
  def pq_encode(v: Column, cb: Array[Float], m: Int, k: Int,
      subDim: Int): Column = c(PqEncodeCodes(e(v), cb, m, k, subDim))

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

  /** Engine-stable decimal rounding for reproducible pipelines:
    * `floor(x·10^d + 0.5) / 10^d`. Every step — cast, multiply, add,
    * floor, divide — is a single correctly-rounded IEEE-754 operation,
    * so the result is bit-identical on any engine, JVM, or SIMD width
    * given the same input bits. `round(double, d)`, by contrast, is an
    * implementation choice (Spark rounds HALF_UP on the decimal
    * expansion of the binary double; other engines use libm-style
    * rounding) that diverges at `…5` decimal boundaries — a one-ULP
    * input difference, or no difference at all, can flip the last
    * digit between engines. Guards: NaN/±Inf and |x| ≥ 8·10^(17-d)
    * pass through unchanged (the scaled value must stay well inside
    * the exactly-convertible long range); for d = 0..15 the power of
    * ten and the limit are exactly representable doubles, so the
    * guard comparison itself is engine-stable too.
    */
  def hround(x: Column, d: Int): Column = {
    require(d >= 0 && d <= 15, s"digits must be in [0, 15], got $d")
    val p = math.pow(10, d)
    val lim = 8.0e17 / p
    val f = org.apache.spark.sql.functions
    val cd = x.cast("double")
    f.when(f.isnan(cd).or(f.abs(cd) >= f.lit(lim)), cd)
      .otherwise(f.floor(cd * f.lit(p) + f.lit(0.5)) / f.lit(p))
  }

  /** The SQL spelling of [[hround]] — the literally-identical IEEE op
    * sequence for oracle/replay queries on any ANSI engine.
    */
  def hroundSql(e: String, d: Int): String = {
    require(d >= 0 && d <= 15, s"digits must be in [0, 15], got $d")
    s"(CASE WHEN isnan(CAST(($e) AS DOUBLE))" +
      s" OR abs(CAST(($e) AS DOUBLE)) >= 8e${17 - d}" +
      s" THEN CAST(($e) AS DOUBLE)" +
      s" ELSE floor(CAST(($e) AS DOUBLE) * 1e$d + 0.5) / 1e$d END)"
  }

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
