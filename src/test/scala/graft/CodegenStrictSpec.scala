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
