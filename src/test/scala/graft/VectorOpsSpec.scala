package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

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
}
