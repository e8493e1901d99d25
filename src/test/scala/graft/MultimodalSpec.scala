package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world", "en", "src0", 11L),
    (1L, "bonjour", "fr", "src1", 7L),
    (2L, "hola mundo amigos", "es", "src2", 17L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("schema: payload is binary, meta is a typed struct") {
    val m = Multimodal.fromDocuments(docs)
    val f = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("payload") == "binary")
    assert(f("meta").startsWith("struct<width:int,height:int,format:string"))
  }

  test("expression features match the batched mapPartitions decode path") {
    val m = Multimodal.fromDocuments(docs)
    val expr = Multimodal.features(m)
      .select("doc_id", "byte_len", "n_pixels", "payload_hash")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val batched = Multimodal.decodeBatched(spark, m, batchSize = 2)
      .collect().map(f => (f.doc_id, (f.byte_len, f.n_pixels, f.payload_hash)))
      .toMap
    assert(expr == batched)
  }

  test("batched decode computes the stub brightness deterministically") {
    val m = Multimodal.fromDocuments(docs)
    val res = Multimodal.decodeBatched(spark, m, batchSize = 1)
      .collect().map(f => f.doc_id -> f.brightness).toMap
    val expected = "hello world".getBytes("UTF-8")
    assert(res(0L) == expected.map(_ & 0xff).sum.toDouble / expected.length)
  }

  test("column pruning: selecting features-only does not read payload") {
    // Write to parquet, read back, select a narrow projection — the
    // optimized scan schema must exclude the payload column.
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    Multimodal.fromDocuments(docs).write.mode("overwrite").parquet(dir)
    val narrow = spark.read.parquet(dir).select(col("doc_id"), col("meta.width"))
    val scans = narrow.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(!scans.head.requiredSchema.fieldNames.contains("payload"))
  }
}
