package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct, and
  * decode / feature-extraction runs as a partition-wise batch operator.
  *
  * The Spark-side plumbing is real — schema, partitioning, batch shape,
  * and the mapPartitions pipeline are exactly what a production decode
  * would use (in PySpark the same stage is `mapInPandas` feeding the
  * decoder in Arrow batches). The codec boundary dispatches: binary
  * PPM/PGM payloads run a REAL zero-dependency codec ([[Pnm]] — header
  * parse, pixel statistics, nearest-neighbor resample); compressed
  * formats (JPEG/PNG/audio), whose libraries this container lacks, fall
  * back to a deterministic fake (`fakeDecode`) with the same contract —
  * going live for another format adds one dispatch arm.
  *
  * Scale notes: media blobs dominate bytes, so the layout keeps them in
  * their own column (parquet column pruning means metadata-only queries
  * never touch the bytes), and decode repartitions by blob size budget —
  * partitions are bounded by decoded-bytes, not row count, so a skewed
  * mix of thumbnails and 4K frames can't OOM an executor.
  */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  val mediaMeta: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image/audio/video
    StructField("format", StringType),                       // png/wav/mp4...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Media table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", mediaMeta, nullable = false)))

  /** Build a media table from the documents corpus (payload = UTF-8 bytes
    * standing in for an encoded image; deterministic, no synthetic data
    * sources). Demonstrates the ingest path: blob + metadata assembly. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        struct(
          lit("image").as("media_type"),
          lit("fake").as("format"),
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Output schema of the decode/feature stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Raster dispatch: the uncompressed family first (PNM magic is a
    * 2-byte check), then the compressed ones — [[Png]] (signature, CRC,
    * inflate, unfilter) and [[Jpeg]] (the JDK's bundled ImageIO codec).
    * None ⇒ the caller's stub path. */
  def decodeRaster(payload: Array[Byte]): Option[Pnm.Image] =
    Pnm.decode(payload).orElse(Png.decode(payload)).orElse(Jpeg.decode(payload))

  /** Decode dispatch: binary PPM/PGM payloads get the REAL uncompressed
    * codec ([[Pnm]]), PNG payloads the REAL hand-rolled compressed codec
    * ([[Png]] — zlib inflate + scanline unfilter), and JPEG payloads the
    * JDK's bundled ImageIO codec ([[Jpeg]]); only compressed-audio
    * containers still fall back to [[fakeDecode]]. The feature contract
    * (bytes in → 8 floats out) is identical on all paths. */
  def decode(payload: Array[Byte]): (Long, Array[Float]) =
    decodeRaster(payload) match {
      case Some(img) =>
        var checksum = 17L
        var i = 0
        while (i < img.pixels.length) {
          checksum = checksum * 31 + (img.pixels(i) & 0xff)
          i += 1
        }
        val Array(r, g, b) = Pnm.meanChannels(img)
        val lum = 0.299f * r + 0.587f * g + 0.114f * b
        (checksum, Array(r, g, b, lum,
          img.channels.toFloat, img.width / 4096.0f, img.height / 4096.0f,
          img.pixels.length / (64.0f * 1024 * 1024)))
      case None => fakeDecode(payload)
    }

  /** STUB — deterministic fake decoder for formats without an in-container
    * codec. Derives an 8-dim feature from the raw bytes so the pipeline
    * shape, schema and determinism stay testable; replace the body (or
    * add a [[decode]] dispatch arm) to go live with another format. */
  def fakeDecode(payload: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 17L
    val feat = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      checksum = checksum * 31 + b
      feat(i % 8) += b / 255.0f
      i += 1
    }
    (checksum, feat)
  }

  /** Partition-wise decode: one pass per partition, rows streamed through
    * the decoder (the mapPartitions batch shape `mapInPandas` gives you
    * in PySpark). `bytesPerPartition` bounds decoded volume per task. */
  def decodeFeatures(media: DataFrame, bytesPerPartition: Long = 64L << 20): DataFrame = {
    val spark = media.sparkSession
    val totalBytes = media
      .agg(coalesce(sum(length(col("payload"))), lit(0L))).head.getLong(0)
    val parts = math.max(1, math.ceil(totalBytes.toDouble / bytesPerPartition).toInt)
    val enc = ExpressionEncoder(featureSchema)
    media
      .repartition(parts, col("media_id")) // size-budgeted, key-spread
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (checksum, feat) = decode(payload)
          Row(id, payload.length.toLong, checksum, feat.toSeq)
        }
      }(enc)
  }

  /** Metadata-only projection — must not read payload bytes (parquet
    * column pruning; asserted in the spec via the physical plan). */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.media_type"), col("meta.width"),
      col("meta.height"))

  /** Resize dispatch: PPM/PGM and PNG payloads are REALLY resized
    * (decode → nearest-neighbor downsample on the pixel grid →
    * re-encode in the source format); other formats fall back to
    * [[fakeResize]]. */
  def resizePayload(payload: Array[Byte], factor: Int): Array[Byte] =
    Pnm.decode(payload) match {
      case Some(img) => Pnm.encode(Pnm.resizeNearest(img, factor))
      case None => Png.decode(payload) match {
        case Some(img) => Png.encode(Pnm.resizeNearest(img, factor))
        case None => Jpeg.decode(payload) match {
          case Some(img) => Jpeg.encode(Pnm.resizeNearest(img, factor))
          case None => fakeResize(payload, factor)
        }
      }
    }

  /** STUB — deterministic fake resize for formats without an
    * in-container codec: keep every `factor`-th byte, scaling metadata
    * dims accordingly. The operator contract (blob in → smaller blob +
    * adjusted meta out) and the partition-wise shape match the real
    * path. */
  def fakeResize(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Partition-wise resize: same mapPartitions batch shape as
    * [[decodeFeatures]]; metadata dims scale with the factor so
    * downstream metadata-only queries stay correct without touching
    * bytes. */
  def resize(media: DataFrame, factor: Int = 2): DataFrame = {
    val enc = ExpressionEncoder(mediaSchema)
    media.select("media_id", "payload", "meta")
      .mapPartitions { rows =>
        rows.map { r =>
          val meta = r.getStruct(2)
          def scaled(i: Int) = if (meta.isNullAt(i)) null
            else Int.box(meta.getInt(i) / factor)
          Row(r.getLong(0), resizePayload(r.getAs[Array[Byte]](1), factor),
            Row(meta.getString(0), meta.getString(1), scaled(2), scaled(3),
              if (meta.isNullAt(4)) null else Long.box(meta.getLong(4))))
        }
      }(enc)
  }

  /** Audio-window features over raw PCM16: payload bytes as little-endian
    * signed 16-bit samples, one row per fixed-size window with EXACT
    * integer energy (sum of squares) and peak amplitude — the loudness/
    * silence screen an audio pipeline runs before expensive transcription,
    * with RMS recoverable as sqrt(sum_sq/n) downstream. Integer outputs
    * keep the operator hash-oracle-able; the decode runs in the same
    * typed per-partition batch shape as [[decodeFeatures]]. A trailing
    * partial window is dropped (windows are the unit of comparison). */
  def pcm16Windows(media: DataFrame, windowSamples: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val bytesPerWin = windowSamples * 2
        val nWin = b.length / bytesPerWin
        (0 until nWin).map { w =>
          var i = w * bytesPerWin
          var ss = 0L
          var peak = 0L
          while (i < (w + 1) * bytesPerWin) {
            val lo = b(i) & 0xff
            val hi = b(i + 1) & 0xff
            var v = lo | (hi << 8)
            if (v >= 32768) v -= 65536
            ss += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v).toLong
            i += 2
          }
          (id, w, windowSamples, ss, peak)
        }
      }
      .toDF("media_id", "win_idx", "n_samples", "sum_sq", "peak")
  }

  /** Frame sampling, fully relational (no UDF): treat the payload as
    * fixed-size frames, keep every `stride`-th, emit one row per kept
    * frame. `substring` on binary + a bounded sequence-explode — stays
    * inside codegen, parallelizes on the scan, and at 100 TB never
    * materializes the dropped frames. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame =
    media
      .select(col("media_id"), col("payload"),
        ((length(col("payload")) + frameBytes - 1) / frameBytes).cast("int").as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
}
