package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pca, VectorOps}

class VectorOpsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(3f, 4f, 0f)),
    (2L, Array(-1.5f, 0.25f, 2f)),
    (3L, Array(0f, 0f, 0f)), // zero vector: must pass through / code to zeros
    (4L, Array(127f, -127f, 63.5f))).toDF("id", "vec")

  test("l2Normalize yields unit vectors; zero vector unchanged") {
    val out = VectorOps.withL2Normalized(vecs, "vec", "nv")
      .select($"id", $"nv").as[(Long, Array[Float])].collect().toMap
    assert(out(1).toSeq == Seq(0.6f, 0.8f, 0f))
    val n2 = math.sqrt(out(2).map(x => x.toDouble * x).sum)
    assert(math.abs(n2 - 1.0) < 1e-6)
    assert(out(3).toSeq == Seq(0f, 0f, 0f))
  }

  test("int8 quantization: codes in range, reconstruction within scale/2") {
    val q = VectorOps.withInt8Quantized(vecs, "vec", "codes", "scale")
    // Array[Byte] would encode as BINARY; Seq[Byte] maps to array<tinyint>
    val rows = q.select($"id", $"vec", $"codes", $"scale")
      .as[(Long, Array[Float], Seq[Byte], Double)].collect()
    rows.foreach { case (id, v, codes, scale) =>
      assert(codes.length == v.length)
      codes.foreach(c => assert(math.abs(c.toInt) <= 127, s"id=$id code $c"))
      if (scale == 0.0) assert(codes.forall(_ == 0))
      else v.zip(codes).foreach { case (x, c) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-9,
          s"id=$id x=$x c=$c scale=$scale")
      }
    }
    // the max-magnitude element always codes to ±127
    val r4 = rows.find(_._1 == 4L).get
    assert(r4._3(0) == 127 && r4._3(1) == -127)
  }

  test("dequantize round-trips within the error bound on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".as("vec"))
    // per-element error in double (the float32 recon cast would add
    // ~2^-24·|q|·scale of rounding on top of the quantization residual)
    val q = VectorOps.withInt8Quantized(emb, "vec", "codes", "scale")
      .withColumn("errs",
        zip_with($"vec", $"codes",
          (x, c) => abs(c.cast("double") * $"scale" - x.cast("double"))))
      .withColumn("max_err", aggregate($"errs", lit(0.0d), (a, e) => greatest(a, e)))
      .withColumn("mean_err",
        aggregate($"errs", lit(0.0d), (a, e) => a + e) / size($"errs"))
    assert(q.filter($"max_err" > $"scale" / 2 * 1.000001).count() == 0)
    // rounding-to-nearest leaves residuals ~uniform in [0, scale/2]:
    // the per-element MEAN error should sit near scale/4, nowhere near
    // the scale/2 worst case (catches a biased/truncating rounder)
    val meanRel = q.select(avg($"mean_err" / $"scale")).head().getDouble(0)
    assert(meanRel > 0.15 && meanRel < 0.35, s"mean residual $meanRel of scale")
  }

  test("random projection: signs deterministic; JL distance ratios bounded") {
    import graft.operators.RandomProjection
    val m1 = RandomProjection.signs("s", 8, 4)
    val m2 = RandomProjection.signs("s", 8, 4)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(RandomProjection.signs("other", 8, 4).map(_.toSeq).toSeq
      != m1.map(_.toSeq).toSeq)

    // distance preservation in the JL sense: squared-distance ratios
    // concentrate around 1; with k=16 allow a generous band and
    // require most pairs inside it
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 24)
    val proj = RandomProjection.project(emb, "embedding", "jl", 64, 16)
    val rows = proj.select(
        $"vec_id",
        $"embedding",
        array((1 to 16).map(j => col(s"rp$j")): _*).as("p"))
      .as[(Long, Seq[Float], Seq[Double])].collect()
    val ratios = for {
      a <- rows; b <- rows if a._1 < b._1
    } yield {
      val d0 = a._2.zip(b._2).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
      val dp = a._3.zip(b._3).map { case (x, y) => (x - y) * (x - y) }.sum
      dp / d0
    }
    val inBand = ratios.count(r => r > 0.3 && r < 2.5)
    assert(inBand.toDouble / ratios.length > 0.9,
      s"only $inBand/${ratios.length} pair ratios in [0.3, 2.5]")
  }

  test("labelCentroids + centroidCosines: hand-computed means and cosines") {
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(3.0f, 0.0f)),   // centroid (2, 0)
      (1, Seq(0.0f, 2.0f)),                          // centroid (0, 2)
      (2, Seq(2.0f, 2.0f)))                          // centroid (2, 2)
      .toDF("label", "vec")
    val cents = VectorOps.labelCentroids(df, "label", "vec", dim = 2)
    val got = cents.select($"label", $"centroid", $"n")
      .as[(Int, Seq[Double], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0) == ((Seq(2.0, 0.0), 2L)))
    assert(got(1) == ((Seq(0.0, 2.0), 1L)))
    assert(got(2) == ((Seq(2.0, 2.0), 1L)))

    val sims = VectorOps.centroidCosines(cents)
      .select($"label_a", $"label_b", $"sim")
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(sims.size == 3)
    assert(math.abs(sims((0, 1)) - 0.0) < 1e-12)                    // orthogonal
    assert(math.abs(sims((0, 2)) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(sims((1, 2)) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  // -------------------------------- PCA -------------------------------- //

  test("jacobi eigen: recovers a known symmetric decomposition") {
    // A = [[2,1],[1,2]] -> eigenvalues 3 (v=(1,1)/√2) and 1 (v=(1,-1)/√2)
    val (evals, evecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val pairs = evals.zip(evecs).sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-12)
    assert(math.abs(pairs(1)._1 - 1.0) < 1e-12)
    val v0 = pairs(0)._2
    assert(math.abs(math.abs(v0(0)) - 1 / math.sqrt(2)) < 1e-10)
    assert(math.abs(v0(0) - v0(1)) < 1e-10) // (1,1) direction
  }

  test("pca: eigen property and orthonormality on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Pca.fit(emb, "embedding", dim = 64, nComponents = 4)
    // recompute covariance independently from collected rows
    val rows = emb.select($"embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    val n = rows.length.toDouble
    val mean = Array.tabulate(64)(i => rows.map(_(i)).sum / n)
    def cov(i: Int, j: Int): Double =
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
    for (c <- 0 until 4) {
      val v = model.components(c)
      val cv = Array.tabulate(64)(i => (0 until 64).map(j => cov(i, j) * v(j)).sum)
      val lv = v.map(_ * model.eigenvalues(c))
      val err = cv.zip(lv).map { case (a, b) => math.abs(a - b) }.max
      assert(err < 1e-6, s"component $c violates C*v = lambda*v (max err $err)")
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9)
      for (c2 <- 0 until c) {
        val dot = v.zip(model.components(c2)).map { case (a, b) => a * b }.sum
        assert(math.abs(dot) < 1e-8, s"components $c,$c2 not orthogonal: $dot")
      }
    }
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // mean matches
    assert(model.mean.zip(mean).map { case (a, b) => math.abs(a - b) }.max < 1e-9)
  }

  test("pca: projected variance equals the eigenvalue") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Pca.fit(emb, "embedding", dim = 64, nComponents = 2)
    val proj = Pca.transform(emb, "embedding", model)
    val stats = proj.agg(
      (sum($"pc1" * $"pc1") / count(lit(1))).as("v1"),
      (sum($"pc2" * $"pc2") / count(lit(1))).as("v2"),
      (sum($"pc1") / count(lit(1))).as("m1"))
      .as[(Double, Double, Double)].head()
    // projections are centered, so E[p^2] is the population variance
    assert(math.abs(stats._3) < 1e-9)
    assert(math.abs(stats._1 - model.eigenvalues(0)) < 1e-6)
    assert(math.abs(stats._2 - model.eigenvalues(1)) < 1e-6)
    assert(model.eigenvalues(0) >= model.eigenvalues(1))
  }

  test("pca: dominant synthetic direction is recovered") {
    // points = t * d + tiny orthogonal noise, d = (3,4)/5
    val d = Array(0.6, 0.8)
    val pts = (0 until 200).map { i =>
      val t = (i % 21) - 10.0
      val e = ((i % 7) - 3.0) * 0.01
      Seq((t * d(0) - e * d(1)).toFloat, (t * d(1) + e * d(0)).toFloat)
    }.toDF("v")
    val model = Pca.fit(pts, "v", dim = 2, nComponents = 2)
    val c0 = model.components(0)
    assert(math.abs(math.abs(c0(0) * d(0) + c0(1) * d(1)) - 1.0) < 1e-4,
      s"first component ${c0.toList} not aligned with $d")
    assert(model.eigenvalues(0) > 100 * model.eigenvalues(1))
  }

  test("embeddingDrift: known mean shift, zero-variance guard, null vectors skipped") {
    val a = Seq((1L, Seq(0f, 1f)), (2L, Seq(2f, 1f)), (3L, null: Seq[Float]))
      .toDF("id", "vec")
    val b = Seq((4L, Seq(10f, 1f)), (5L, Seq(12f, 1f))).toDF("id", "vec")
    val got = VectorOps.embeddingDrift(a, b, "vec").orderBy("pos")
      .select($"pos", $"n_a", $"mean_a", $"mean_b", $"shift", $"z_shift", $"var_ratio")
      .collect()
    // dim 0: means 1 -> 11, sigma_a = 1 => z = 10; variances equal
    assert(got(0).getLong(1) == 2L) // null vector row skipped
    assert(got(0).getDouble(2) == 1.0 && got(0).getDouble(3) == 11.0)
    assert(math.abs(got(0).getDouble(5) - 10.0) < 1e-9)
    assert(math.abs(got(0).getDouble(6) - 1.0) < 1e-9)
    // dim 1: constant column — zero baseline variance yields NULL
    // z/ratio, not a division blow-up
    assert(got(1).getDouble(4) == 0.0)
    assert(got(1).isNullAt(5) && got(1).isNullAt(6))
  }

  test("signSketch packs sign bits into 32-bit words; hammingDistance counts flips") {
    // dim 5: bits 0,2 set -> word0 = 1 + 4 = 5; zero is NOT positive
    val df = Seq(
      (1L, Array(1f, -2f, 0.5f, 0f, -0.1f)),
      (2L, Array(1f, 2f, 0.5f, 0f, -0.1f)), // differs at bit 1
      (3L, Array(-1f, -2f, -0.5f, -1f, -0.1f))).toDF("id", "vec")
    val sk = df.select($"id", VectorOps.signSketch($"vec", 5).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sk(1) == Seq(5L))
    assert(sk(2) == Seq(7L))
    assert(sk(3) == Seq(0L))
    // dim 64 spans two words, 32 bits each — all-positive = two full words
    val full = Seq((1L, Array.fill(64)(1f))).toDF("id", "vec")
      .select(VectorOps.signSketch($"vec", 64).as("sig"))
      .as[Seq[Long]].head()
    assert(full == Seq(0xFFFFFFFFL, 0xFFFFFFFFL))
    // hamming: |1 xor 2| differs in one bit; self-distance 0
    val pairs = df.toDF("id", "vec")
      .crossJoin(df.toDF("id2", "vec2"))
      .select($"id", $"id2",
        VectorOps.hammingDistance(
          VectorOps.signSketch($"vec", 5),
          VectorOps.signSketch($"vec2", 5)).as("d"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    assert(pairs((1L, 1L)) == 0L && pairs((2L, 2L)) == 0L)
    assert(pairs((1L, 2L)) == 1L && pairs((2L, 1L)) == 1L)
    assert(pairs((1L, 3L)) == 2L) // bits 0 and 2 flip off
  }
}
