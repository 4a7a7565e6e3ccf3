package graft

/** Regression guard: custom-expression generated code must COMPILE, not
  * silently fall back to interpreted eval (Spark degrades per-stage with
  * only a warning, so ordinary tests would still pass on broken codegen).
  */
class CodegenStrictSpec extends SparkSuite {

  private val kernelQueries =
    Seq("vs_knn", "vs_knn_cosine", "vs_search_by_doc", "dd_minhash_lsh",
      "dd_simhash", "tx_fingerprint", "dd_embed_neardup",
      // media-hash kernels: these once compiled against a NESTED Scala
      // object and fell back to interpreted with only a warning — the
      // exact failure mode this suite exists to catch
      "mm_phash", "mm_audiohash", "mm_image_dedup")

  test("kernel-heavy queries run under CODEGEN_ONLY with fallback disabled") {
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      kernelQueries.foreach { name =>
        val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
        assert(n >= 0, s"$name failed under strict codegen")
      }
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("pq_encode loop kernel under strict codegen (the k=256 tier the literal unroll could not survive)") {
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      // m=2 subspaces, k=256 codes, subDim=2: codebook centroid c of
      // subspace s is (s*1000 + c, s*1000 + c) — every subvector's
      // nearest code is its own rounded value, checked row-wise
      val flat = Array.tabulate(2 * 256 * 2)(i =>
        ((i / 2) % 256 + (i / 512) * 1000).toFloat)
      val out = Seq((7f, 7.2f, 31f, 30.9f), (255f, 255f, 0.1f, 0f))
        .toDF("a", "b", "c", "d")
        .select(graft.functions.pq_encode(
          array(col("a"), col("b"),
            col("c") + 1000f, col("d") + 1000f), flat, 2, 256, 2).as("codes"))
        .as[Seq[Int]].collect()
      assert(out.toSeq == Seq(Seq(7, 31), Seq(255, 0)),
        s"pq_encode argmin wrong: ${out.toSeq}")
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("blob codec expressions under strict codegen") {
    val conf = spark.conf
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val row = spark.sql(
        "SELECT float_blob_decode(float_blob_encode(array(1.0F, 2.5F))) AS v").collect().head
      assert(row.getSeq[Float](0) == Seq(1.0f, 2.5f))
    } finally conf.unset("spark.sql.codegen.factoryMode")
  }
}
