package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries opaque binary + typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    assert(media.schema("payload").dataType.typeName == "binary")
    val r = media.orderBy("media_id").head
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("media_type") == "image")
  }

  test("decode stage is deterministic, total, and schema-stable") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val f1 = Multimodal.decodeFeatures(media, bytesPerPartition = 16 << 10)
    assert(f1.schema == Multimodal.featureSchema)
    val rows = f1.orderBy("media_id").collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.getAs[Seq[Float]]("feature").length == 8))
    // determinism across runs (and partitionings)
    val f2 = Multimodal.decodeFeatures(media, bytesPerPartition = 1 << 20)
      .orderBy("media_id").collect()
    assert(rows.map(_.getLong(2)).toSeq == f2.map(_.getLong(2)).toSeq)
  }

  test("metadata-only query prunes the payload column from the scan") {
    val dir = Files.createTempDirectory("graft-media").resolve("m").toString
    Multimodal.mediaFromDocuments(spark, sf).write.parquet(dir)
    val plan = Multimodal.metaOnly(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("media_id"))
    assert(!plan.contains("payload"), s"payload not pruned:\n$plan")
  }
}
