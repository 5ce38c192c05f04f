package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AVI/RIFF container handling: AVI is the same RIFF chunk grammar as
  * WAV ([[Wav]]), with two twists the video path needs — chunks can be
  * LISTs (a 4-byte list type follows the size, then nested chunks) and
  * the frame directory is the `idx1` chunk: 16-byte entries of
  * (fourcc, flags, offset-from-movi, size). Walking the top level and
  * exploding `idx1` yields REAL frame offsets relationally — binary
  * `substring` + little-endian reassembly in column expressions, no
  * UDF, no mapPartitions — so frame extraction from a 100 TB video
  * corpus is a scan-side projection plus a Generate, and the frame
  * BYTES are touched only by the final slice.
  *
  * Scope: the canonical single-video AVI shape — LIST hdrl (with the
  * avih main header first), LIST movi, idx1 — with offsets counted
  * from the `movi` fourcc, which is what the spec's own example and
  * every sane muxer write. Files without an idx1, with a foreign
  * fourcc, or with the header list missing parse as invalid and are
  * filtered, never mis-sliced.
  *
  * Reference behavior: the reference pipeline has no media handling at
  * all; the parse follows the public AVI RIFF form (msdn AVI RIFF File
  * Reference) like [[Wav]] follows the WAV spec.
  */
object Avi {

  /** Unrolled top-level walk depth: hdrl/movi/idx1 must be among the
    * first K top-level chunks (JUNK padding included). */
  val MaxChunks = 6

  // ------------------------------------------------------------- encode
  // (test/fixture side — builds payloads the relational parse reads)

  /** Encode raw (uncompressed DIB) frames as a minimal standard AVI:
    * RIFF(AVI ) { LIST(hdrl){ avih }, [junk], LIST(movi){ 00db* },
    * idx1 }. `junk` inserts an ancillary chunk between hdrl and movi
    * so fixtures can exercise the aligned walk. idx1 offsets are
    * relative to the `movi` fourcc, entries point at chunk headers. */
  def encode(width: Int, height: Int, usPerFrame: Int,
             frames: Seq[Array[Byte]],
             junk: Option[Array[Byte]] = None,
             fourcc: String = "AVI "): Array[Byte] = {
    def le(out: java.io.ByteArrayOutputStream, v: Long, w: Int): Unit = {
      var i = 0
      while (i < w) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def tag(out: java.io.ByteArrayOutputStream, t: String): Unit =
      out.write(t.getBytes("US-ASCII"), 0, 4)

    val avih = new java.io.ByteArrayOutputStream()
    le(avih, usPerFrame.toLong, 4) // dwMicroSecPerFrame
    le(avih, 0L, 4); le(avih, 0L, 4); le(avih, 0L, 4) // maxBps, padding, flags
    le(avih, frames.length.toLong, 4) // dwTotalFrames
    le(avih, 0L, 4); le(avih, 1L, 4); le(avih, 0L, 4) // initial, streams, sugBuf
    le(avih, width.toLong, 4) // dwWidth
    le(avih, height.toLong, 4) // dwHeight
    le(avih, 0L, 4); le(avih, 0L, 4); le(avih, 0L, 4); le(avih, 0L, 4) // reserved

    val hdrl = new java.io.ByteArrayOutputStream()
    tag(hdrl, "hdrl")
    tag(hdrl, "avih"); le(hdrl, avih.size.toLong, 4)
    hdrl.write(avih.toByteArray, 0, avih.size)

    val movi = new java.io.ByteArrayOutputStream()
    tag(movi, "movi")
    // idx1 offsets count from the movi fourcc to each chunk HEADER
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    frames.foreach { f =>
      offsets += movi.size.toLong // == 4 for the first chunk
      tag(movi, "00db"); le(movi, f.length.toLong, 4)
      movi.write(f, 0, f.length)
      if (f.length % 2 == 1) movi.write(0) // RIFF word alignment
    }

    val idx1 = new java.io.ByteArrayOutputStream()
    frames.zip(offsets).foreach { case (f, off) =>
      tag(idx1, "00db"); le(idx1, 0x10L, 4) // AVIIF_KEYFRAME
      le(idx1, off, 4); le(idx1, f.length.toLong, 4)
    }

    val body = new java.io.ByteArrayOutputStream()
    tag(body, fourcc)
    def chunk(t: String, b: Array[Byte]): Unit = {
      tag(body, t); le(body, b.length.toLong, 4)
      body.write(b, 0, b.length)
      if (b.length % 2 == 1) body.write(0)
    }
    chunk("LIST", hdrl.toByteArray)
    junk.foreach(j => chunk("JUNK", j))
    chunk("LIST", movi.toByteArray)
    chunk("idx1", idx1.toByteArray)

    val out = new java.io.ByteArrayOutputStream()
    tag(out, "RIFF"); le(out, body.size.toLong, 4)
    out.write(body.toByteArray, 0, body.size)
    out.toByteArray
  }

  // ------------------------------------------------------------- parse

  // codegen'd bounds-checked array read; same value (incl. NULL→0 out
  // of range / null pos) as the old conv(hex(substr(...))) string
  // chain, which dominated the frame folds' wall time — see ByteAt
  private def u8(bin: Column, pos: Column): Column =
    coalesce(graft.functions.ByteFunctions.byteAt(bin, pos.cast("long")), lit(0L))

  private def le(bin: Column, pos: Column, width: Int): Column =
    (0 until width).map(i => u8(bin, pos + i) * (1L << (8 * i)))
      .reduce(_ + _)

  private def tagAt(bin: Column, pos: Column): Column =
    bin.substr(pos.cast("int"), lit(4)).cast("string")

  /** Relational AVI parse: adds `width`, `height`, `us_per_frame`,
    * `total_frames`, `movi_pos` (1-based position of the movi fourcc),
    * `idx1_off`/`idx1_len` (1-based entry table), and `avi_valid` to
    * `media` (binary `payload` column required).
    *
    * The top-level walk is the [[Wav.parseMeta]] aggregate-HOF fold
    * extended with LIST typing: a LIST hop reads the 4-byte list type
    * after the size and records hdrl/movi positions; a plain `idx1`
    * hop records the index extent. ONE fold, same rationale — a
    * per-level column form re-substitutes each level ~9× under
    * PushDownPredicates and explodes 9^K (observed 32 GB OOM). */
  def parseMeta(media: DataFrame): DataFrame = {
    val p = col("payload")
    val plen = length(p).cast("long")
    val init = struct(
      lit(13L).as("off"), // first chunk after RIFF(4)+size(4)+"AVI "(4)
      lit(null).cast("long").as("hdrl_off"), // hdrl list CONTENT (after type)
      lit(null).cast("long").as("movi_pos"), // position of the movi fourcc
      lit(null).cast("long").as("idx1_off"),
      lit(null).cast("long").as("idx1_len"))
    val walk = aggregate(
      sequence(lit(1), lit(MaxChunks)), init,
      (acc, _) => {
        val off = acc.getField("off")
        val tag = tagAt(p, off)
        val sz = least(le(p, off + 4, 4), plen)
        val fits = off + 8 + sz <= plen + 1
        val listType = tagAt(p, off + 8)
        when(off + 8 <= plen + 1,
          struct(
            (off + 8 + sz + sz % 2).as("off"),
            coalesce(acc.getField("hdrl_off"),
              when(tag === "LIST" && listType === "hdrl" && fits, off + 12))
              .as("hdrl_off"),
            coalesce(acc.getField("movi_pos"),
              when(tag === "LIST" && listType === "movi" && fits, off + 8))
              .as("movi_pos"),
            coalesce(acc.getField("idx1_off"),
              when(tag === "idx1" && fits, off + 8)).as("idx1_off"),
            coalesce(acc.getField("idx1_len"),
              when(tag === "idx1" && fits, sz)).as("idx1_len")))
          .otherwise(acc)
      })
    val hdrlOff = col("_walk").getField("hdrl_off")
    val avihData = hdrlOff + 8 // avih chunk body (tag+size skipped)
    media
      .withColumn("_walk", walk)
      .withColumn("us_per_frame", le(p, avihData, 4))
      .withColumn("total_frames", le(p, avihData + 16, 4))
      .withColumn("width", le(p, avihData + 32, 4))
      .withColumn("height", le(p, avihData + 36, 4))
      .withColumn("movi_pos", col("_walk").getField("movi_pos"))
      .withColumn("idx1_off", col("_walk").getField("idx1_off"))
      .withColumn("idx1_len", col("_walk").getField("idx1_len"))
      .withColumn("avi_valid",
        tagAt(p, lit(1)) === "RIFF" && tagAt(p, lit(9)) === "AVI " &&
          hdrlOff.isNotNull && tagAt(p, hdrlOff) === "avih" &&
          col("movi_pos").isNotNull && col("idx1_off").isNotNull)
      .drop("_walk")
  }

  /** Frame rows with the payload still attached — the shared spine of
    * [[frames]] (digest projection) and [[decodeDibRows]] (pixel
    * decode). One row per idx1 entry with fourcc, flags, 1-based
    * absolute offset and length; only the final consumers touch frame
    * content. */
  private def frameRows(media: DataFrame): DataFrame = {
    val p = col("payload")
    val nEntries = (col("idx1_len") / 16).cast("long")
    val entry = col("idx1_off") + col("frame_idx") * 16
    parseMeta(media)
      .filter(col("avi_valid"))
      .select(col("media_id"), col("width"), col("height"),
        col("us_per_frame"), col("total_frames"), col("movi_pos"),
        col("idx1_off"), p,
        explode(when(nEntries > 0, sequence(lit(0L), nEntries - 1))
          .otherwise(array().cast("array<long>"))).as("frame_idx"))
      .withColumn("frame_fourcc", tagAt(p, entry))
      .withColumn("frame_flags", le(p, entry + 4, 4))
      // idx1 offsets count from the movi fourcc to the chunk header;
      // +8 skips that header to the frame bytes
      .withColumn("frame_off", col("movi_pos") + le(p, entry + 8, 4) + 8)
      .withColumn("frame_len", le(p, entry + 12, 4))
  }

  /** Frame rows via the idx1 index: one row per index entry with the
    * frame fourcc, flags, 1-based absolute payload offset, length, and
    * the md5 digest of the frame bytes. The explode is a Generate over
    * entry ORDINALS (16 bytes each); only the final `substr` touches
    * frame content. Invalid containers are filtered by contract. */
  def frames(media: DataFrame): DataFrame = {
    val p = col("payload")
    frameRows(media)
      .withColumn("frame_md5",
        md5(p.substr(col("frame_off").cast("int"), col("frame_len").cast("int"))))
      .drop("payload", "movi_pos", "idx1_off")
  }

  /** DECODE of uncompressed DIB frame content — the step `frames`
    * stops short of. A raw DIB frame is the classic BMP pixel array
    * (public Windows BITMAPINFOHEADER layout): rows stored BOTTOM-UP,
    * pixels left-to-right as B,G,R byte triples, every row padded to a
    * 4-byte stride — all closed-form integer arithmetic, so the decode
    * is column expressions like the container walk, no UDF. Output is
    * one row per IMAGE row (top-down `y`): per-channel byte sums plus
    * a position-weighted checksum, which together pin all three layout
    * rules — `y` proves the bottom-up flip, the three sums prove BGR
    * separation and pad-byte exclusion, `wsum` proves pixel order
    * within the row. Frames whose length doesn't equal stride×height
    * (compressed or foreign content) are filtered, never mis-decoded.
    *
    * 100 TB shape: per-pixel work stays inside one projection over the
    * frame slice — no shuffle is added over `frames`; the fold result
    * is materialized ONCE per row (interpreted HOFs have no
    * subexpression elimination — the q_st_neardup lesson). */
  def decodeDibRows(media: DataFrame): DataFrame = {
    val p = col("payload")
    val stride = expr("((width * 3 + 3) DIV 4) * 4")
    val dibRow = col("height") - 1 - col("y") // bottom-up storage
    val rowOff = col("frame_off") + dibRow * stride
    // fused codegen fold (see graft.functions.DibRowSums) — the former
    // aggregate() HOF was CodegenFallback: one interpreted fold-tree
    // eval per image row, byte accessor re-run per element. Identical
    // integer arithmetic, same accumulation order, one JVM loop.
    val fold = graft.functions.DibFunctions.dibRowSums(p, rowOff, col("width"))
    frameRows(media)
      .filter(col("frame_len") === stride * col("height"))
      .withColumn("y", explode(sequence(lit(0L), col("height") - 1)))
      .withColumn("_sums", fold)
      .select(col("media_id"), col("frame_idx"), col("y"),
        col("width"), col("height"),
        col("_sums").getItem(0).as("sum_b"),
        col("_sums").getItem(1).as("sum_g"),
        col("_sums").getItem(2).as("sum_r"),
        col("_sums").getItem(3).as("wsum"))
  }

  /** Nearest-neighbor RESIZE of each decoded DIB frame to outW×outH —
    * the brief's "resize" step as pure integer column arithmetic:
    * source coords are `x_src = (x_out · w) div outW` (the classic NN
    * index map, exact floor division on non-negative ints), the row
    * lookup goes through the bottom-up flip, and the output is one row
    * per OUTPUT pixel with its BGR bytes — the fixed-size thumbnail
    * grid a vision pipeline feeds a model. No UDF, no shuffle: the
    * explode is outW·outH rows per frame, each a 3-byte slice of the
    * frame region. Frames whose length ≠ stride×height are filtered
    * like every DIB consumer. */
  def resizeDibNearest(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val p = col("payload")
    val stride = expr("((width * 3 + 3) DIV 4) * 4")
    val xs = expr(s"(x2 * width) DIV $outW")
    val ys = expr(s"(y2 * height) DIV $outH") // image orientation (top-down)
    val dibRow = col("height") - 1 - ys // bottom-up storage
    val base = col("frame_off") + dibRow * stride + xs * 3
    frameRows(media)
      .filter(col("frame_len") === stride * col("height"))
      .withColumn("y2", explode(sequence(lit(0), lit(outH - 1))))
      .withColumn("x2", explode(sequence(lit(0), lit(outW - 1))))
      .select(col("media_id"), col("frame_idx"),
        col("width"), col("height"),
        col("y2").cast("long").as("y2"), col("x2").cast("long").as("x2"),
        u8(p, base).as("b"), u8(p, base + 1).as("g"), u8(p, base + 2).as("r"))
  }

  /** Perceptual AVERAGE HASH of each decoded DIB frame — the aHash
    * fingerprint (public pHash-family baseline): pixel bit i is set iff
    * that pixel's luma is at or above the frame mean, packed
    * little-endian by pixel index (storage order: DIB row r, column x,
    * i = r·w + x). All INTEGER arithmetic — luma = B+G+R, the
    * threshold compare is `luma·npix ≥ total` (cross-multiplied, no
    * division) — so the hash is bit-reproducible in any engine, unlike
    * DCT-based pHash. Two folds per frame (total, then bits); pixel
    * count bounds the hash at 63 bits by contract. Fingerprint-grain
    * output: downstream near-dup joins band on (width, height, hash) —
    * never on pixels. */
  def frameAHash(media: DataFrame): DataFrame = {
    val p = col("payload")
    val stride = expr("((width * 3 + 3) DIV 4) * 4")
    val npix = col("width") * col("height")
    // fused codegen two-pass fold (see graft.functions.DibAHash) — the
    // former total/bits aggregate() HOFs were CodegenFallback and
    // dominated q_mm_frame_neardup's wall time. Same luma addressing,
    // same cross-multiplied threshold, same little-endian bit packing.
    frameRows(media)
      .filter(col("frame_len") === stride * col("height") &&
        col("width") * col("height") <= 63)
      .withColumn("npix", npix)
      .withColumn("ahash", graft.functions.DibFunctions.dibAHash(
        p, col("frame_off"), col("width"), col("height")))
      .select("media_id", "frame_idx", "width", "height", "npix", "ahash")
  }
}
