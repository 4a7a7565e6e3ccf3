package graft

import org.apache.spark.sql.functions._

class RewriteRuleSpec extends SparkSuite {
  import spark.implicits._

  private val hofSql =
    "sqrt(aggregate(zip_with(vec, qvec, (x, y) -> (x - y) * (x - y)), " +
      "cast(0 as float), (acc, z) -> acc + z))"

  test("HOF L2 formula is rewritten to the native kernel") {
    // literal inputs constant-fold to a LocalRelation before the plan can
    // be observed — use a file-backed frame for the plan assertion
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb
      .select($"vec_id", $"embedding".as("vec"), $"embedding".as("qvec"))
      .selectExpr("vec_id", s"$hofSql AS d")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("l2_sq_distance"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("aggregate("), s"HOF survived:\n$plan")
    assert(df.filter($"d" =!= 0.0).count() == 0) // self-distance is 0
    // literal path still computes correctly (folded or not)
    val lit2 = Seq((Array(1f, 2f), Array(4f, 6f))).toDF("vec", "qvec")
      .selectExpr(s"$hofSql AS d")
    assert(lit2.as[Double].head() == 5.0)
  }

  test("rewrite is bitwise result-preserving vs the un-rewritten HOF") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val viaRule = emb
      .select($"vec_id", lit(q).as("qvec"), $"embedding".as("vec"))
      .selectExpr("vec_id", s"$hofSql AS d")
      .as[(Long, Double)].collect().toMap
    // compute the same HOF chain manually in float32 accumulation order
    val manual = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().map { case (id, v) =>
        var s = 0f
        v.indices.foreach { i => val d = v(i) - q(i); s += d * d }
        id -> math.sqrt(s.toDouble)
      }.toMap
    assert(viaRule == manual)
  }

  test("double arrays are NOT rewritten (kernel is float32) and still work") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb
      .select($"vec_id",
        $"embedding".cast("array<double>").as("vec"),
        $"embedding".cast("array<double>").as("qvec"))
      .selectExpr("vec_id",
        "sqrt(aggregate(zip_with(vec, qvec, (x, y) -> (x - y) * (x - y)), " +
          "cast(0 as double), (acc, z) -> acc + z)) AS d")
    assert(!df.queryExecution.optimizedPlan.toString.contains("l2_sq_distance"))
    assert(df.filter($"d" =!= 0.0).count() == 0) // runs fine, self-dist 0
  }

  test("mismatched lengths / null elements preserve the HOF's NULL result") {
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(4f, 6f)),                    // length mismatch
      (2L, Array(1f, 2f), Array(4f, 6f)))                        // clean
      .toDF("id", "vec", "qvec")
    // file-backed to defeat constant folding
    val dir = java.nio.file.Files.createTempDirectory("rw-null").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).selectExpr("id", s"$hofSql AS d")
    assert(back.queryExecution.optimizedPlan.toString.contains("l2_sq_distance"))
    val got = back.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).isEmpty, "mismatched lengths must stay NULL")
    assert(got(2L) == Some(5.0))
  }

  private val dotSql =
    "aggregate(zip_with(%s, %s, (x, y) -> x * y), cast(0 as float), (acc, z) -> acc + z)"

  test("HOF dot-product building block is rewritten — cosine spelling accelerates") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cosine =
      s"${dotSql.format("vec", "qvec")} / " +
        s"(sqrt(${dotSql.format("vec", "vec")}) * sqrt(${dotSql.format("qvec", "qvec")}))"
    val df = emb
      .select($"vec_id", $"embedding".as("vec"), $"embedding".as("qvec"))
      .selectExpr("vec_id", s"$cosine AS c")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("dot_product"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("aggregate("), s"HOF survived:\n$plan")
    // cosine of a vector with itself is 1 (within float rounding)
    assert(df.filter(abs($"c" - 1.0) > 1e-6).count() == 0)
  }

  test("dot rewrite is bitwise result-preserving vs the un-rewritten HOF") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" === 1).select($"embedding").as[Array[Float]].head()
    val viaRule = emb
      .select($"vec_id", lit(q).as("qvec"), $"embedding".as("vec"))
      .selectExpr("vec_id", s"${dotSql.format("vec", "qvec")} AS d")
      .as[(Long, Float)].collect().toMap
    val manual = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().map { case (id, v) =>
        var s = 0f
        v.indices.foreach(i => s += v(i) * q(i))
        id -> s
      }.toMap
    assert(viaRule == manual)
  }

  test("dot near-misses are NOT rewritten") {
    // x + y instead of x * y
    val miss = Seq((Array(1f, 2f), Array(4f, 6f))).toDF("vec", "qvec")
      .selectExpr("aggregate(zip_with(vec, qvec, (x, y) -> x + y), " +
        "cast(0 as float), (acc, z) -> acc + z) AS d")
    assert(!miss.queryExecution.optimizedPlan.toString.contains("dot_product"))
    assert(miss.as[Float].head() == 13f)
    // double accumulator — different accumulation arithmetic, keep HOF
    val dbl = Seq((Array(1f, 2f), Array(4f, 6f))).toDF("vec", "qvec")
      .selectExpr("aggregate(zip_with(vec, qvec, (x, y) -> x * y), " +
        "cast(0 as double), (acc, z) -> acc + z) AS d")
    assert(!dbl.queryExecution.optimizedPlan.toString.contains("dot_product"))
  }

  test("near-miss formulas are NOT rewritten (substitution would be wrong)") {
    // abs instead of square — must keep the HOF
    val miss = Seq((Array(1f, 2f), Array(4f, 6f))).toDF("vec", "qvec")
      .selectExpr("sqrt(aggregate(zip_with(vec, qvec, (x, y) -> abs(x - y)), " +
        "cast(0 as float), (acc, z) -> acc + z)) AS d")
    assert(!miss.queryExecution.optimizedPlan.toString.contains("l2_sq_distance"))
    assert(miss.as[Double].head() == math.sqrt(7.0))
    // non-zero seed — must keep the HOF
    val seeded = Seq((Array(1f, 2f), Array(4f, 6f))).toDF("vec", "qvec")
      .selectExpr("sqrt(aggregate(zip_with(vec, qvec, (x, y) -> (x - y) * (x - y)), " +
        "cast(1 as float), (acc, z) -> acc + z)) AS d")
    assert(!seeded.queryExecution.optimizedPlan.toString.contains("l2_sq_distance"))
    assert(seeded.as[Double].head() == math.sqrt(26.0))
  }
}
