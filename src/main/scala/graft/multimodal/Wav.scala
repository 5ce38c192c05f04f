package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WAV/RIFF container handling: real audio corpora carry WAV framing
  * around the PCM samples, so the audio feature path needs a container
  * parse before the window pass ([[Multimodal.pcm16Windows]] consumes
  * bare PCM16). The parse is RELATIONAL — byte extraction via binary
  * `substring` + little-endian reassembly in column expressions, the
  * same technique as the frame sampler — so it runs inside codegen on
  * the scan, prunes to the payload column only, and at 100 TB never
  * leaves the executor's projection: no UDF, no mapPartitions for a
  * header decode that touches < 100 bytes per blob.
  *
  * Chunk walk: RIFF files are a chunk sequence after the 12-byte
  * header; `fmt ` and `data` may be preceded/separated by ancillary
  * chunks (LIST/INFO, fact, ...). The walk is statically unrolled to
  * [[MaxChunks]] hops — each hop is pure column arithmetic
  * (`off + 8 + size + size%2`, word-aligned per the RIFF spec) — which
  * covers every sane WAV writer; blobs whose fmt/data sit deeper
  * simply parse as invalid and are filtered, never mis-sliced.
  *
  * Scope: integer PCM (audioFormat=1) 16-bit mono is what
  * [[wavWindows]] admits; anything else (IEEE float = 3, ADPCM, ...)
  * is REJECTED relationally — rejection is part of the verified
  * contract, mirroring how the reference drops unparseable
  * observations (app/transform/normalize.py rejects before load).
  */
object Wav {

  /** Unrolled chunk-walk depth: fmt/data must be among the first K
    * chunks. 6 covers LIST+fact+cue padding around the canonical 2. */
  val MaxChunks = 6

  // ------------------------------------------------------------- encode
  // (test/fixture side — builds payloads the relational parse reads)

  /** Encode PCM bytes as a RIFF/WAVE file. `preDataChunks` are
    * ancillary (tag, body) pairs inserted between `fmt ` and `data`
    * so fixtures can exercise the chunk walk; `audioFormat` ≠ 1 builds
    * a well-formed non-PCM container the parse must reject. */
  def encode(sampleRate: Int, channels: Int, bitsPerSample: Int,
             pcm: Array[Byte], preDataChunks: Seq[(String, Array[Byte])] = Nil,
             audioFormat: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Long, w: Int): Unit = {
      var i = 0
      while (i < w) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def tag(t: String): Unit = out.write(t.getBytes("US-ASCII"), 0, 4)
    def chunk(t: String, body: Array[Byte]): Unit = {
      tag(t); le(body.length.toLong, 4)
      out.write(body, 0, body.length)
      if (body.length % 2 == 1) out.write(0) // RIFF word alignment pad
    }
    val fmt = new java.io.ByteArrayOutputStream()
    def fmtLe(v: Long, w: Int): Unit = {
      var i = 0
      while (i < w) { fmt.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    val blockAlign = channels * bitsPerSample / 8
    fmtLe(audioFormat, 2); fmtLe(channels, 2); fmtLe(sampleRate, 4)
    fmtLe(sampleRate.toLong * blockAlign, 4); fmtLe(blockAlign, 2)
    fmtLe(bitsPerSample, 2)

    val bodyLen = 4 + (8 + 16) +
      preDataChunks.map(c => 8 + c._2.length + c._2.length % 2).sum +
      (8 + pcm.length + pcm.length % 2)
    tag("RIFF"); le(bodyLen.toLong, 4); tag("WAVE")
    chunk("fmt ", fmt.toByteArray)
    preDataChunks.foreach { case (t, b) => chunk(t, b) }
    chunk("data", pcm)
    out.toByteArray
  }

  // ------------------------------------------------------------- parse

  /** Unsigned byte at 1-based `pos` of binary column `bin` (0 past
    * the end, so a truncated header parses as zeros, never errors).
    * Codegen'd array read; same value as the old conv(hex(substr(...)))
    * string chain — see [[graft.functions.ByteAt]]. */
  private def u8(bin: Column, pos: Column): Column =
    coalesce(graft.functions.ByteFunctions.byteAt(bin, pos.cast("long")), lit(0L))

  /** Little-endian unsigned integer of `width` bytes at 1-based `pos`. */
  private def le(bin: Column, pos: Column, width: Int): Column =
    (0 until width).map(i => u8(bin, pos + i) * (1L << (8 * i)))
      .reduce(_ + _)

  /** 4-char ASCII tag at 1-based `pos` (binary → string cast). */
  private def tagAt(bin: Column, pos: Column): Column =
    bin.substr(pos.cast("int"), lit(4)).cast("string")

  /** Relational RIFF parse: adds `sample_rate`, `n_channels`,
    * `bits_per_sample`, `audio_format`, `data_off` (1-based payload
    * position), `data_len`, and `wav_valid` to `media` (which must
    * carry a binary `payload`).
    *
    * The chunk walk is ONE `aggregate` HOF folding a (off, fmt_off,
    * data_off, data_len) accumulator over [[MaxChunks]] hops. The fold
    * shape is load-bearing for plan size, not just taste: expressing
    * the walk as per-level column aliases melts down in Catalyst —
    * `PushDownPredicates` substitutes aliases into pushed filter
    * conditions with no cheapness guard, each level references the
    * previous ~9×, and the condition tree grows 9^K nodes (observed:
    * 32 GB OOM in optimization at K=6). A lambda accumulator is a
    * VARIABLE — referencing it never duplicates its producer — so the
    * whole walk stays ~100 expression nodes regardless of depth.
    */
  def parseMeta(media: DataFrame): DataFrame = {
    val p = col("payload")
    val plen = length(p).cast("long")
    val init = struct(
      lit(13L).as("off"), // first chunk: after RIFF(4)+size(4)+WAVE(4)
      lit(null).cast("long").as("fmt_off"),
      lit(null).cast("long").as("data_off"),
      lit(null).cast("long").as("data_len"))
    val walk = aggregate(
      sequence(lit(1), lit(MaxChunks)), init,
      (acc, _) => {
        val off = acc.getField("off")
        val tag = tagAt(p, off)
        // a well-formed chunk can't outsize the blob: clamping keeps
        // offsets in int range even on adversarial size fields
        val sz = least(le(p, off + 4, 4), plen)
        val fits = off + 8 + sz <= plen + 1
        when(off + 8 <= plen + 1,
          struct(
            (off + 8 + sz + sz % 2).as("off"),
            coalesce(acc.getField("fmt_off"),
              when(tag === "fmt " && fits, off + 8)).as("fmt_off"),
            coalesce(acc.getField("data_off"),
              when(tag === "data" && fits, off + 8)).as("data_off"),
            coalesce(acc.getField("data_len"),
              when(tag === "data" && fits, sz)).as("data_len")))
          .otherwise(acc)
      })
    val fmtOff = col("_walk").getField("fmt_off")
    media
      .withColumn("_walk", walk)
      .withColumn("audio_format", le(p, fmtOff, 2))
      .withColumn("n_channels", le(p, fmtOff + 2, 2))
      .withColumn("sample_rate", le(p, fmtOff + 4, 4))
      .withColumn("bits_per_sample", le(p, fmtOff + 14, 2))
      .withColumn("data_off", col("_walk").getField("data_off"))
      .withColumn("data_len", col("_walk").getField("data_len"))
      .withColumn("wav_valid",
        tagAt(p, lit(1)) === "RIFF" && tagAt(p, lit(9)) === "WAVE" &&
          fmtOff.isNotNull && col("_walk").getField("data_off").isNotNull)
      .drop("_walk")
  }

  /** G.711 μ-law expansion (the standard telephony COMPANDING codec —
    * 8-bit logarithmic codewords → 14-bit linear samples): closed-form
    * integer arithmetic straight from the spec, so unlike DCT-family
    * audio codecs it is exactly reproducible in any engine — the one
    * compressed-audio decode that can be hash-oracled. */
  def ulawToLinear(code: Int): Int = {
    val u = ~code & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Audio windows over μ-law WAV blobs (audioFormat=7, 8-bit mono):
    * container parse and admission are the same relational pass as
    * [[wavWindows]]; each admitted byte expands through
    * [[ulawToLinear]] before the exact integer energy/peak window —
    * the real decode path of a telephony/call-center corpus. */
  def ulawWindows(media: DataFrame, windowSamples: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    parseMeta(media)
      .filter(col("wav_valid") && col("audio_format") === 7 &&
        col("bits_per_sample") === 8 && col("n_channels") === 1)
      .select(col("media_id"), col("sample_rate"),
        col("payload").substr(col("data_off").cast("int"),
          col("data_len").cast("int")).as("ulaw"))
      .as[(Long, Long, Array[Byte])]
      .flatMap { case (id, rate, b) =>
        val nWin = b.length / windowSamples
        (0 until nWin).map { w =>
          var i = w * windowSamples
          var ss = 0L
          var peak = 0L
          while (i < (w + 1) * windowSamples) {
            val v = ulawToLinear(b(i) & 0xff)
            ss += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v).toLong
            i += 1
          }
          (id, rate, w, windowSamples, ss, peak)
        }
      }
      .toDF("media_id", "sample_rate", "win_idx", "n_samples", "sum_sq", "peak")
  }

  /** Audio windows over WAV blobs: parse the container relationally,
    * ADMIT only integer-PCM 16-bit mono (everything else — float WAV,
    * multi-channel, truncated, non-RIFF — drops out, by contract),
    * slice the data chunk, and run the exact integer energy/peak
    * window pass. The slice is a codegen `substring`; only the window
    * arithmetic runs typed, the same split as
    * [[Multimodal.pcm16Windows]]. */
  def wavWindows(media: DataFrame, windowSamples: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    parseMeta(media)
      .filter(col("wav_valid") && col("audio_format") === 1 &&
        col("bits_per_sample") === 16 && col("n_channels") === 1)
      .select(col("media_id"), col("sample_rate"),
        col("payload").substr(col("data_off").cast("int"),
          col("data_len").cast("int")).as("pcm"))
      .as[(Long, Long, Array[Byte])]
      .flatMap { case (id, rate, b) =>
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
          (id, rate, w, windowSamples, ss, peak)
        }
      }
      .toDF("media_id", "sample_rate", "win_idx", "n_samples", "sum_sq", "peak")
  }

  /** Integer-ratio RESAMPLE — the normalize-the-rate step an audio
    * pipeline runs before featurization (16 kHz mono is the standard
    * model input): decimate by 2 with a boxcar pair average, the
    * simplest anti-aliased downsampler whose arithmetic is EXACT —
    * v'_j = floor((s_{2j} + s_{2j+1}) / 2), computed as
    * floor((a+b)/2.0) so the negative-odd case floors identically in
    * any engine (integer `/` truncates toward zero on the JVM but
    * floors in DuckDB — the q_ag_histogram lesson applied to audio).
    * Output is the exact energy/peak window pass over the HALF-RATE
    * stream, sample_rate halved — same admit contract as
    * [[wavWindows]] (integer PCM16 mono only). */
  def wavResampleWindows(media: DataFrame,
                         windowSamples: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    parseMeta(media)
      .filter(col("wav_valid") && col("audio_format") === 1 &&
        col("bits_per_sample") === 16 && col("n_channels") === 1)
      .select(col("media_id"), col("sample_rate"),
        col("payload").substr(col("data_off").cast("int"),
          col("data_len").cast("int")).as("pcm"))
      .as[(Long, Long, Array[Byte])]
      .flatMap { case (id, rate, b) =>
        def s16(i: Int): Int = {
          val v = (b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)
          if (v >= 32768) v - 65536 else v
        }
        val nSrc = b.length / 2
        val nDec = nSrc / 2
        val dec = Array.tabulate(nDec)(j =>
          math.floor((s16(2 * j) + s16(2 * j + 1)) / 2.0).toLong)
        val nWin = nDec / windowSamples
        (0 until nWin).map { w =>
          val win = dec.slice(w * windowSamples, (w + 1) * windowSamples)
          (id, rate / 2, w, windowSamples,
            win.map(v => v * v).sum, win.map(math.abs).max)
        }
      }
      .toDF("media_id", "sample_rate", "win_idx", "n_samples", "sum_sq", "peak")
  }
}
