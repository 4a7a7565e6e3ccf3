package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.sources.Sources
import graft.store.VectorStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSuite {
  import spark.implicits._

  test("blob codec round-trips and matches numpy tobytes layout") {
    // bytes produced exactly as the reference writes them
    // (vector_store.py:122-123: float32 little-endian, row-major)
    val vec = Array(1.5f, -2.25f, 0f, Float.MinPositiveValue)
    val buf = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    vec.foreach(buf.putFloat)
    val blob = buf.array()

    val df = Seq(Tuple1(blob)).toDF("vec")
    val decoded = df.select(functions.float_blob_decode($"vec").as("v"))
      .as[Array[Float]].head()
    assert(decoded.toSeq == vec.toSeq)
    val reencoded = df
      .select(functions.float_blob_encode(functions.float_blob_decode($"vec")).as("b"))
      .as[Array[Byte]].head()
    assert(reencoded.toSeq == blob.toSeq)
  }

  test("fromReferenceBlobs -> insertDF -> toReferenceBlobs round trip") {
    val vecs = Seq(Array(1f, 2f, 3f), Array(4f, 5f, 6f))
    def enc(v: Array[Float]): Array[Byte] = {
      val b = ByteBuffer.allocate(v.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      v.foreach(b.putFloat); b.array()
    }
    val refRows = Seq(
      (0L, enc(vecs(0)), """{"k": 1}"""),
      (1L, enc(vecs(1)), null.asInstanceOf[String])).toDF("id", "vec", "doc")

    val dir = Files.createTempDirectory("graft-src").toString + "/store"
    val store = VectorStore.openOrCreate(spark, dir, 3)
    store.insertDF(Sources.fromReferenceBlobs(refRows))
    assert(store.count() == 2)
    assert(store.head(2).map(_.doc) == Seq("""{"k": 1}""", "{}")) // null⇒{}
    assert(store.head(2).map(_.vec.toSeq) == vecs.map(_.toSeq))

    val exported = Sources.toReferenceBlobs(store)
      .orderBy("id").as[(Long, Array[Byte], String)].collect()
    assert(exported.map(_._2.toSeq).toSeq == vecs.map(enc(_).toSeq))
  }

  test("bucketed tables join with no Exchange on either side (co-located join)") {
    val sf = "/root/testdata/sf0.001"
    // the warehouse directory outlives the in-memory catalog between
    // JVM runs; clear both so overwrite can re-create the tables
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Sources.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet"), "b_orders", "o_orderkey", 8)
    Sources.writeBucketed(
      spark.read.parquet(s"$sf/lineitem.parquet")
        .withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), Seq("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the ONLY exchange allowed is the final tiny groupBy-priority one;
      // the join itself must read co-located buckets shuffle-free
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // sanity: same result as the plain parquet join
      val plain = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
        plain.orderBy("o_orderpriority").collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("orc round-trip and textLines raw-corpus ingestion") {
    val dir = Files.createTempDirectory("graft-orc")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    docs.write.orc(dir.resolve("docs.orc").toString)
    val back = Sources.orc(spark, dir.resolve("docs.orc").toString, docs.schema)
    assert(back.count() == 50)
    assert(back.select("doc_id").as[Long].collect().toSet ==
      docs.select("doc_id").as[Long].collect().toSet)

    Files.writeString(dir.resolve("a.txt"), "line one\nline two\n")
    Files.writeString(dir.resolve("b.txt"), "other corpus\n")
    val lines = Sources.textLines(spark, dir.toString + "/*.txt")
    assert(lines.count() == 3)
    val byFile = lines.groupBy("source_file").count()
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(1))).toMap
    assert(byFile == Map("a.txt" -> 2L, "b.txt" -> 1L))
  }

  test("csv and jsonLines ingestion with explicit schemas") {
    val dir = Files.createTempDirectory("graft-csv")
    val csvPath = dir.resolve("in.csv")
    Files.writeString(csvPath, "id,name,score\n1,alpha,0.5\n2,beta,1.5\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val fromCsv = Sources.csv(spark, csvPath.toString, schema)
    assert(fromCsv.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "alpha", 0.5), (2L, "beta", 1.5)))

    val jsonPath = dir.resolve("in.jsonl")
    Files.writeString(jsonPath, """{"id":1,"name":"alpha"}""" + "\n" + """{"id":2}""" + "\n")
    val jschema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val fromJson = Sources.jsonLines(spark, jsonPath.toString, jschema)
    assert(fromJson.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, null)))
  }
}
