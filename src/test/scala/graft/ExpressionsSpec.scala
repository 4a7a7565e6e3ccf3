package graft

import graft.expressions.Kernels
import graft.functions._
import org.apache.spark.sql.functions._

/** Golden-value parity with the reference engine's kernels.
  * Goldens from /root/reference/test/tests.py (cited per test).
  */
class ExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def eye(n: Int): Seq[Array[Float]] =
    (0 until n).map(i => Array.tabulate(n)(j => if (i == j) 1f else 0f))

  test("l2_distance reproduces float32 goldens (tests.py:195-224)") {
    val query = Array(0f, 0f, 0f, 0.5f, 0f, 0f, 0f, 0f, 0f, 1f)
    val df = eye(10).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val got = df
      .select($"id", l2_distance($"vec", lit(query)).as("d"))
      .orderBy($"d", $"id")
      .limit(2)
      .as[(Long, Float)]
      .collect()
    assert(got(0) == (9L, 0.5f))
    assert(got(1)._1 == 3L)
    assert(got(1)._2 == 1.118034f) // exact np.float32 golden
  }

  test("indel_similarity reproduces rapidfuzz goldens (tests.py:545-565)") {
    // distance = 100 - similarity; golden best distance 9.090909090909093
    val docs = (0 until 5).map(n => (n.toLong, s"""{"k$n": "v$n"}"""))
    val df = docs.toDF("id", "doc")
    val q = """{"1": "1"}"""
    val got = df
      .select($"id", (lit(100.0) - indel_similarity($"doc", lit(q))).as("dist"))
      .orderBy($"dist", $"id")
      .as[(Long, Double)]
      .collect()
    assert(got.head._1 == 1L)
    assert(got.head._2 == 9.090909090909093)
    assert(got(1)._2 == 27.272727272727266) // all others tie at this golden
    assert(got.tail.forall(_._2 == 27.272727272727266))
  }

  test("indel kernel edge cases") {
    assert(Kernels.indelSimilarity("", "") == 100.0)
    assert(Kernels.indelSimilarity("abc", "abc") == 100.0)
    assert(Kernels.indelSimilarity("abc", "") == 0.0)
    assert(Kernels.lcsLen("XMJYAUZ", "MZJAWXU") == 4) // classic LCS example
  }

  test("wordShingles edge cases (zip_with form)") {
    import org.apache.spark.sql.functions.col
    import graft.operators.TextAnalysis
    def sh(s: String, n: Int): Seq[String] =
      Seq(Tuple1(s)).toDF("text")
        .select(TextAnalysis.wordShingles(col("text"), n).as("s"))
        .as[Seq[String]].head()
    assert(sh("a b c d", 3) == Seq("a b c", "b c d"))
    assert(sh("a b c", 3) == Seq("a b c"))
    assert(sh("a b", 3) == Seq.empty) // fewer tokens than n
    assert(sh("a b c", 1) == Seq("a", "b", "c"))
    assert(sh("a b c", 2) == Seq("a b", "b c"))
    assert(sh("", 3) == Seq.empty)
    // repeated whitespace collapses into single separators
    assert(sh("a   b\t c", 2) == Seq("a b", "b c"))
    // exactly max(size - n + 1, 0) shingles on a longer input
    assert(sh((1 to 50).map("t" + _).mkString(" "), 3).size == 48)
  }

  test("vec_sub: float32 element-wise difference through column API and SQL") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Seq(1.5f, 2f, -3f), Seq(0.5f, 1f, 1f))).toDF("a", "b")
    assert(df.select(functions.vec_sub(col("a"), col("b")).as("v"))
      .head().getSeq[Float](0) == Seq(1.0f, 1.0f, -4.0f))
    // shorter side bounds the output (the kernels' permissive contract)
    val mixed = Seq((Seq(1f, 2f, 3f), Seq(1f))).toDF("a", "b")
    assert(mixed.select(functions.vec_sub(col("a"), col("b")).as("v"))
      .head().getSeq[Float](0) == Seq(0.0f))
    assert(spark.sql("SELECT vec_sub(array(1.5F, 2F), array(0.5F, 1F)) AS v")
      .head().getSeq[Float](0) == Seq(1.0f, 1.0f))
  }

  test("hyperplane_bucket kernel is bit-identical to the composed dot-product form") {
    import org.apache.spark.sql.functions.{aggregate, col, lit, when, sum, zip_with}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rnd = new scala.util.Random(42L)
    val planes = Array.fill(6)(Array.fill(64)(rnd.nextGaussian().toFloat))
    // per-plane double products + left-to-right double fold — the exact
    // arithmetic the fused kernel runs (and the ann_lsh_topk oracle replays)
    val composed = planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(col("embedding").cast("array<double>"),
          lit(p.map(_.toDouble)), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0d, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val df = emb.select(col("vec_id"),
      functions.hyperplane_bucket(col("embedding"), 64, 6, 42L).as("fused"),
      composed.as("composed"))
    assert(df.filter(col("fused") =!= col("composed")).count() == 0)
    // and through the SQL registry
    emb.createOrReplaceTempView("hb_emb")
    val viaSql = spark
      .sql("SELECT sum(hyperplane_bucket(embedding, 64, 6, 42)) AS s FROM hb_emb")
      .as[Long].head()
    assert(viaSql == df.agg(sum(col("fused"))).head().getLong(0))
  }

  test("SQL registration: graft functions callable from spark.sql") {
    val out = spark
      .sql("SELECT l2_distance(array(1.0F, 0.0F), array(0.0F, 0.0F)) AS d, " +
        "indel_similarity('ab', 'ab') AS s, fingerprint64('x') AS f, " +
        "hamming64(7L, 0L) AS h")
      .collect()
      .head
    assert(out.getFloat(0) == 1.0f)
    assert(out.getDouble(1) == 100.0)
    assert(out.getInt(3) == 3)
  }

  test("implicit casts: double arrays accepted") {
    val got = spark
      .sql("SELECT l2_distance(array(3.0D, 0.0D), array(0.0D, 4.0D)) AS d")
      .collect()
      .head
      .getFloat(0)
    assert(got == 5.0f)
  }

  test("cosine / dot / simhash / minhash kernels behave") {
    val row = spark
      .sql(
        "SELECT cosine_similarity(array(1.0F,0.0F), array(1.0F,0.0F)) AS c, " +
          "dot_product(array(1.0F,2.0F), array(3.0F,4.0F)) AS dp, " +
          "simhash64(array('a','b','a')) AS sh, " +
          "minhash_signature(array('a','b'), 4) AS mh")
      .collect()
      .head
    assert(row.getFloat(0) == 1.0f)
    assert(row.getFloat(1) == 11.0f)
    assert(row.getSeq[Long](3).length == 4)
    // minhash of identical token sets must be identical
    val Seq(m1, m2) = Seq("x", "x").map(s =>
      spark.sql(s"SELECT minhash_signature(array('$s','y'), 8) AS m").collect().head.getSeq[Long](0))
    assert(m1 == m2)
  }

  test("nfc_normalize: folds combining marks, idempotent, ASCII unchanged, null-safe") {
    import org.apache.spark.sql.functions.{col, lit}
    val decomposed = "came\u0301lia" // e + COMBINING ACUTE (U+0301)
    val precomposed = "cam\u00e9lia" // precomposed U+00E9
    val df = Seq((1L, decomposed), (2L, precomposed), (3L, "plain ascii"), (4L, null))
      .toDF("id", "s")
      .select(col("id"), graft.functions.nfc_normalize(col("s")).as("n"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == precomposed, "decomposed must fold to precomposed")
    assert(got(2L) == precomposed, "already-NFC input unchanged")
    assert(got(3L) == "plain ascii")
    assert(got(4L) == null)
    // idempotent; unicode-normalized content hash unifies the re-encodings
    val h = Seq((1L, decomposed), (2L, precomposed)).toDF("id", "text")
      .select(graft.operators.Dedup.unicodeNormalizedContentHash(col("text")).as("h"))
      .distinct().count()
    assert(h == 1L, "NFC re-encodings must share one content hash")
    // SQL registry path
    assert(spark.sql(s"SELECT nfc_normalize('$decomposed') = '$precomposed' AS ok")
      .head().getBoolean(0))
  }

  test("bucket_index: leftmost->=-v binary search, dup boundaries, column form") {
    import graft.expressions.Kernels.bucketIndex
    val b = Array(1.0, 3.0, 3.0, 7.0)
    assert(bucketIndex(0.5, b) == 0L)   // below first boundary
    assert(bucketIndex(1.0, b) == 0L)   // (lo, hi]: equal goes low
    assert(bucketIndex(2.0, b) == 1L)
    assert(bucketIndex(3.0, b) == 1L)   // leftmost of the duplicate pair
    assert(bucketIndex(3.5, b) == 3L)   // dup bucket 2 stays empty
    assert(bucketIndex(7.0, b) == 3L)
    assert(bucketIndex(9.0, b) == 4L)   // above last -> bounds.length
    assert(bucketIndex(5.0, Array.empty[Double]) == 0L)
    // column form agrees with the kernel and stays monotone
    import spark.implicits._
    val vs = Seq(0.5, 1.0, 2.0, 3.0, 3.5, 7.0, 9.0)
    val got = vs.toDF("v")
      .select(graft.functions.bucket_index(org.apache.spark.sql.functions.col("v"), b))
      .collect().map(_.getLong(0)).toSeq
    assert(got == vs.map(v => bucketIndex(v, b)))
  }
  test("hround Column == JVM model bit-for-bit over a hostile sample") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def ref(x: Double, d: Int): Double = {
      val p = math.pow(10, d)
      if (x.isNaN || math.abs(x) >= 8.0e17 / p) x
      else math.floor(x * p + 0.5) / p
    }
    // decimal-boundary halves, negatives, tiny, huge, specials — the
    // values engine round() disagrees on are exactly the ones the
    // Column expression must reproduce from the JVM model bit-for-bit
    val xs = Seq(0.12345, -0.12345, 2.5, -2.5, 0.00005, -0.00005,
      1.0 / 3.0, -1.0 / 3.0, 123456.789, 1e-12, 9.9999e11, 1e15,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0) ++ (1 to 50).map(i => math.sin(i.toDouble) * 1e4)
    for (d <- Seq(0, 2, 4, 6)) {
      val got = xs.toDF("x")
        .select(graft.functions.hround(col("x"), d)).as[Double].collect()
      xs.zip(got).foreach { case (x, g) =>
        val e = ref(x, d)
        assert(java.lang.Double.doubleToRawLongBits(g)
            == java.lang.Double.doubleToRawLongBits(e)
          || (g.isNaN && e.isNaN),
          s"hround($x, $d): column gave $g, model $e")
      }
    }
  }
}
