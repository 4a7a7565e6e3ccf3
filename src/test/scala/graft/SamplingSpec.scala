package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("hashSample is deterministic and partition-independent") {
    val a = Sampling.hashSample(docs, "doc_id", 0.2, salt = "s")
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.2, salt = "s")
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    // approximately the requested fraction (md5 uniformity over 500 keys)
    assert(a.size > 50 && a.size < 150, s"got ${a.size} of 500 at fraction 0.2")
    // different salts decorrelate
    val c = Sampling.hashSample(docs, "doc_id", 0.2, salt = "other")
      .select($"doc_id").as[Long].collect().toSet
    assert(c != a)
  }

  test("hashSplit is disjoint and exhaustive") {
    val (train, test) = Sampling.hashSplit(docs, "doc_id", 0.25, salt = "split")
    val tr = train.select($"doc_id").as[Long].collect().toSet
    val te = test.select($"doc_id").as[Long].collect().toSet
    assert(tr.intersect(te).isEmpty)
    assert(tr.size + te.size == docs.count())
    assert(te.nonEmpty && tr.nonEmpty)
  }

  test("stratifiedHashSample keeps only listed classes at per-class fractions") {
    val withCls = docs.withColumn("cls",
      when($"doc_id" % 3 === 0, "a").when($"doc_id" % 3 === 1, "b").otherwise("c"))
    val got = Sampling.stratifiedHashSample(
      withCls, "doc_id", "cls", Map("a" -> 1.0, "b" -> 0.2))
    val byCls = got.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(!byCls.contains("c"), "unlisted class must be dropped")
    assert(byCls("a") == withCls.filter($"cls" === "a").count(), "fraction 1.0 keeps all")
    assert(byCls.getOrElse("b", 0L) > 0 && byCls("b") < withCls.filter($"cls" === "b").count())
  }

  test("threshold edges: fraction 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == docs.count())
    assert(Sampling.thresholdHex(0.5) == "8" + "0" * 31)
  }
}
