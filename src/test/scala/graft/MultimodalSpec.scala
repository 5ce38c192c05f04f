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

  test("resize shrinks payload and scales metadata dims consistently") {
    val media = Multimodal.mediaFromDocuments(spark, sf).limit(50)
    val out = Multimodal.resize(media, factor = 2).orderBy("media_id").collect()
    val in = media.orderBy("media_id").collect()
    assert(out.length == in.length)
    in.zip(out).foreach { case (a, b) =>
      val la = a.getAs[Array[Byte]]("payload").length
      val lb = b.getAs[Array[Byte]]("payload").length
      assert(lb == (la + 1) / 2)
      val wa = a.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width")
      val wb = b.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width")
      assert(wb == wa / 2)
    }
  }

  test("frame sampling keeps every stride-th frame with exact byte slices") {
    val media = Multimodal.mediaFromDocuments(spark, sf).limit(20)
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
      .orderBy("media_id", "frame_idx").collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Int]("frame_idx") % 2 == 0))
    val byId = media.orderBy("media_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    frames.foreach { f =>
      val full = byId(f.getAs[Long]("media_id"))
      val idx = f.getAs[Int]("frame_idx")
      val expected = full.slice(idx * 64, math.min(idx * 64 + 64, full.length))
      assert(f.getAs[Array[Byte]]("frame").toSeq == expected.toSeq)
    }
  }
}
