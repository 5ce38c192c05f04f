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

  test("PNM codec: encode/decode round-trips, comments parse, non-PNM rejected") {
    import graft.multimodal.Pnm
    // 2x2 RGB gradient
    val img = Pnm.Image(3, 2, 2, Array[Byte](
      0, 0, 0,   127, 0, 0,
      0, 127, 0, -1, -1, -1)) // -1 == 0xff unsigned
    val decoded = Pnm.decode(Pnm.encode(img)).get
    assert(decoded === img.copy(pixels = decoded.pixels))
    assert(decoded.pixels.toSeq === img.pixels.toSeq)
    // header with comments and multi-whitespace, P5 grayscale
    val withComments = ("P5\n# a comment\n 3 # dims\n1\n255\n").getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30)
    val gray = Pnm.decode(withComments).get
    assert((gray.channels, gray.width, gray.height) === ((1, 3, 1)))
    assert(gray.pixels.toSeq === Seq[Byte](10, 20, 30))
    // rejects: wrong magic, truncated data, 16-bit maxval
    assert(Pnm.decode("not an image".getBytes).isEmpty)
    assert(Pnm.decode("P6\n2 2\n255\n12".getBytes).isEmpty)
    assert(Pnm.decode(("P5\n1 1\n65535\n" + "xx").getBytes).isEmpty)
  }

  test("PNM resize is real pixel resampling; decode dispatch picks the real codec") {
    import graft.multimodal.Pnm
    // 4x2 grayscale with distinct values: nearest-neighbor factor 2
    // keeps pixels at even (x, y) → [a, c] from the first row
    val img = Pnm.Image(1, 4, 2, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    val half = Pnm.resizeNearest(img, 2)
    assert((half.width, half.height) === ((2, 1)))
    assert(half.pixels.toSeq === Seq[Byte](1, 3))
    // dispatch: a PPM payload decodes via the real codec (channel means
    // reflect actual pixels), a text payload falls back to the fake
    val white = Pnm.Image(3, 2, 2, Array.fill[Byte](12)(-1))
    val (_, feat) = Multimodal.decode(Pnm.encode(white))
    assert(feat(0) === 1.0f && feat(1) === 1.0f && feat(2) === 1.0f)
    assert(feat(4) === 3.0f) // channels
    val (ck, fallback) = Multimodal.decode("plain text".getBytes)
    assert((ck, fallback.toSeq) ===
      ((Multimodal.fakeDecode("plain text".getBytes)._1,
        Multimodal.fakeDecode("plain text".getBytes)._2.toSeq)))
    // resize dispatch: PPM shrinks on the pixel grid and re-encodes
    val resized = Pnm.decode(Multimodal.resizePayload(Pnm.encode(img), 2)).get
    assert(resized.pixels.toSeq === Seq[Byte](1, 3))
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

  test("PNG codec: every filter type round-trips on goldens, incl. Paeth") {
    import graft.multimodal.{Png, Pnm}
    // 4x3 RGB with values that make each predictor distinct (gradients
    // both ways + a jump) so a wrong filter arm can't round-trip
    val px = Array.tabulate[Byte](36) { i =>
      val v = (i * 29 + (i * i) % 13) % 256
      v.toByte
    }
    val img = Pnm.Image(3, 4, 3, px)
    for (ft <- 0 to 4) {
      val back = Png.decode(Png.encode(img, _ => ft))
        .getOrElse(fail(s"filter $ft failed to decode"))
      assert((back.channels, back.width, back.height) === ((3, 4, 3)))
      assert(back.pixels.toSeq === px.toSeq, s"filter $ft")
    }
    // mixed filters per row (the parity-query shape)
    val mixed = Png.decode(Png.encode(img, y => 1 + (y % 4))).get
    assert(mixed.pixels.toSeq === px.toSeq)
    // grayscale path (colour type 0, bpp = 1 — Sub/Paeth offsets differ)
    val gimg = Pnm.Image(1, 5, 4, Array.tabulate[Byte](20)(i => (i * 41 % 251).toByte))
    for (ft <- 0 to 4) {
      val back = Png.decode(Png.encode(gimg, _ => ft)).get
      assert(back.channels === 1)
      assert(back.pixels.toSeq === gimg.pixels.toSeq, s"gray filter $ft")
    }
    // Paeth golden, hand-computed: predictor of (a=3, b=5, c=2) is
    // p=6 → pa=3, pb=1, pc=4 → b wins. Row 2 pixel 1 has exactly that
    // neighborhood; encode filters to 9-5=4, decode must re-add b=5.
    val tiny = Pnm.Image(1, 2, 2, Array[Byte](2, 5, 3, 9))
    val enc = Png.encode(tiny, _ => 4)
    val dec = Png.decode(enc).get
    assert(dec.pixels.toSeq === Seq[Byte](2, 5, 3, 9))
  }

  test("PNG codec: CRC corruption, truncation, and out-of-scope shapes rejected") {
    import graft.multimodal.{Png, Pnm}
    val img = Pnm.Image(3, 4, 2, Array.tabulate[Byte](24)(_.toByte))
    val good = Png.encode(img)
    assert(Png.decode(good).isDefined)
    // flip one byte inside IDAT (after sig+IHDR chunk = 8+25 bytes,
    // skip the IDAT length+tag): CRC check must reject
    val corrupt = good.clone()
    corrupt(8 + 25 + 8 + 2) = (corrupt(8 + 25 + 8 + 2) ^ 0x40).toByte
    assert(Png.decode(corrupt).isEmpty, "CRC corruption must be rejected")
    // truncated stream
    assert(Png.decode(good.dropRight(10)).isEmpty)
    // bad signature
    assert(Png.decode("not a png at all".getBytes).isEmpty)
    // interlaced / 16-bit / palette shapes: patch IHDR fields and re-CRC
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b)
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 4 + 13)
      val v = crc.getValue
      b(29) = (v >>> 24).toByte; b(30) = (v >>> 16).toByte
      b(31) = (v >>> 8).toByte; b(32) = v.toByte
      b
    }
    assert(Png.decode(patched(_(24) = 16)).isEmpty, "16-bit")
    assert(Png.decode(patched(_(25) = 3)).isEmpty, "palette")
    assert(Png.decode(patched(_(28) = 1)).isEmpty, "interlaced")
  }

  test("AVI container: idx1-driven frame slices recover the muxed DIB frames exactly") {
    import ss.implicits._
    import graft.multimodal.Avi
    // two frames with DIFFERENT and odd/even lengths so the alignment
    // padding and per-entry sizes are both load-bearing; a junk chunk
    // between hdrl and movi exercises the LIST-typed walk
    val f0 = Array.tabulate[Byte](23)(i => (i * 7 + 1).toByte) // odd → padded
    val f1 = Array.tabulate[Byte](30)(i => (i * 13 + 5).toByte)
    val avi = Avi.encode(320, 240, 40000, Seq(f0, f1),
      junk = Some(Array[Byte](9, 8, 7)))
    val media = Seq((1L, avi)).toDF("media_id", "payload")
    val rows = Avi.frames(media).orderBy("frame_idx").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("frame_fourcc") == "00db"))
    assert(rows.map(_.getAs[Long]("width")).toSeq == Seq(320L, 320L))
    assert(rows.map(_.getAs[Long]("height")).toSeq == Seq(240L, 240L))
    assert(rows.map(_.getAs[Long]("us_per_frame")).toSeq == Seq(40000L, 40000L))
    assert(rows.map(_.getAs[Long]("total_frames")).toSeq == Seq(2L, 2L))
    assert(rows.map(_.getAs[Long]("frame_len")).toSeq == Seq(23L, 30L))
    // digests must equal the digests of the ORIGINAL frame bytes —
    // offsets, padding, and lengths all have to line up for this
    def hex(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map(x => f"$x%02x").mkString
    assert(rows.map(_.getAs[String]("frame_md5")).toSeq == Seq(hex(f0), hex(f1)))
    // rejection: foreign fourcc, truncation, and a missing idx1 all
    // parse as invalid (zero frame rows), never mis-slice
    val bad = Seq(
      (2L, Avi.encode(8, 8, 1, Seq(f0), fourcc = "AVX ")),
      (3L, avi.dropRight(20)),
      (4L, "RIFFxxxxAVI not a container at all".getBytes))
      .toDF("media_id", "payload")
    assert(Avi.frames(bad).count() == 0)
  }

  test("AVI DIB decode: bottom-up BGR with stride padding, golden sums") {
    import ss.implicits._
    import graft.multimodal.Avi
    // width 3 (ODD): row stride pads 9 pixel bytes to 12 — the 3 pad
    // bytes are planted as 0xEE and must NOT leak into any sum
    val w = 3; val h = 2; val stride = 12
    def px(b: Int, g: Int, r: Int) = Seq(b.toByte, g.toByte, r.toByte)
    val pad = Seq(0xEE.toByte, 0xEE.toByte, 0xEE.toByte)
    // DIB storage order: BOTTOM row first. Image row y=1 (bottom) has
    // pixels (1,2,3)(4,5,6)(7,8,9); y=0 (top) has (10,20,30)(40,50,60)
    // (70,80,90).
    val bottom = px(1, 2, 3) ++ px(4, 5, 6) ++ px(7, 8, 9) ++ pad
    val top = px(10, 20, 30) ++ px(40, 50, 60) ++ px(70, 80, 90) ++ pad
    val frame = (bottom ++ top).toArray
    assert(frame.length == stride * h)
    val media = Seq((1L, Avi.encode(w, h, 1000, Seq(frame))))
      .toDF("media_id", "payload")
    val rows = Avi.decodeDibRows(media).orderBy("y").collect()
    assert(rows.length == 2)
    val y0 = rows(0); val y1 = rows(1)
    // y=0 is the IMAGE top row = the SECOND stored DIB row
    assert(y0.getAs[Long]("y") == 0L)
    assert(y0.getAs[Long]("sum_b") == 10L + 40 + 70)
    assert(y0.getAs[Long]("sum_g") == 20L + 50 + 80)
    assert(y0.getAs[Long]("sum_r") == 30L + 60 + 90)
    assert(y0.getAs[Long]("wsum") ==
      1 * (10L + 20 + 30) + 2 * (40L + 50 + 60) + 3 * (70L + 80 + 90))
    assert(y1.getAs[Long]("sum_b") == 1L + 4 + 7)
    assert(y1.getAs[Long]("sum_g") == 2L + 5 + 8)
    assert(y1.getAs[Long]("sum_r") == 3L + 6 + 9)
    assert(y1.getAs[Long]("wsum") ==
      1 * (1L + 2 + 3) + 2 * (4L + 5 + 6) + 3 * (7L + 8 + 9))
    // a frame whose length isn't stride*height must be filtered, not
    // mis-decoded (compressed/foreign frame content)
    val short = Seq((2L, Avi.encode(w, h, 1000, Seq(frame.dropRight(4)))))
      .toDF("media_id", "payload")
    assert(Avi.decodeDibRows(short).count() == 0)

    // nearest-neighbor resize to 2x2, golden: w=3 → x_src = (x2*3)//2 ∈
    // {0, 1}; h=2 → y_src = y2 through the bottom-up flip. Output
    // pixels must be exactly (10,20,30),(40,50,60) on the top row and
    // (1,2,3),(4,5,6) on the bottom — pad bytes untouched.
    {
      val rz = Avi.resizeDibNearest(media, 2, 2)
        .orderBy("y2", "x2").collect()
        .map(r => (r.getAs[Long]("y2"), r.getAs[Long]("x2"),
          r.getAs[Long]("b"), r.getAs[Long]("g"), r.getAs[Long]("r")))
      assert(rz.toSeq === Seq(
        (0L, 0L, 10L, 20L, 30L), (0L, 1L, 40L, 50L, 60L),
        (1L, 0L, 1L, 2L, 3L), (1L, 1L, 4L, 5L, 6L)))
    }

    // hot-bucket cap: a planted 200-doc mono corpus (identical constant
    // frames → one degenerate hash bucket per width, >100 frames each)
    // must emit ZERO pairs, while a small planted near-dup bucket in
    // the same corpus survives — the MaxShingleDf discipline applied
    // to frame hashes
    {
      import graft.queries.Parity
      val dir2 = java.nio.file.Files
        .createTempDirectory("graft-framecap").toString
      // 400: the %9-rejected ids all fall in the width-3 group, so the
      // smallest bucket is (400/3 − 45) · 2 ≈ 178 frames — over the cap
      val mono = (0L until 400L).map(i => (i, "a" * 70))
      val planted = Seq(10001L, 10004L) // same %3 → same dims; %9 != 0
        .map(id => (id, "AAAAAAAAzzzzzzzzAAAAAAAAzzzzzzzzAAAAAAAAzzzzzzzzAAAAAAAAzzzzzzzz"))
      (mono ++ planted).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
      val pairs = Parity.frameNearDupQ(spark, dir2).collect()
      assert(pairs.nonEmpty, "planted identical docs must pair")
      val ids = pairs.flatMap(r =>
        Seq(r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
      assert(ids.subsetOf(Set(10001L, 10004L)),
        s"mono-bucket frames must be capped out of matching, got ids $ids")
      assert(pairs.length === 6, // C(4,2) among the 2x2 planted frames
        s"expected 6 hamming-0 pairs among planted frames, got ${pairs.length}")
    }

    // perceptual average hash, golden: lumas are (6,15,24) bottom row,
    // (60,150,240) top row (pixel index = storage order r*w+x); total =
    // 495, npix = 6 → bit set iff luma*6 >= 495, i.e. luma >= 82.5 —
    // only pixels 4 (150) and 5 (240): ahash = 2^4 + 2^5 = 48. Pad
    // bytes (0xEE) must not leak into the total.
    val hrows = Avi.frameAHash(media).collect()
    assert(hrows.length == 1)
    assert(hrows.head.getAs[Long]("npix") == 6L)
    assert(hrows.head.getAs[Long]("ahash") == 48L)
  }

  test("PNG codec: CRC-valid but malformed streams return None, never throw or hang") {
    import graft.multimodal.Png
    // hand-build a PNG whose chunks are CRC-valid but whose content is bad
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u32(v: Int): Unit = {
        out.write(v >>> 24); out.write((v >>> 16) & 0xff)
        out.write((v >>> 8) & 0xff); out.write(v & 0xff)
      }
      u32(data.length)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      u32(crc.getValue.toInt)
      out.toByteArray
    }
    val sig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)
    // 2x2 grayscale IHDR
    val ihdr = Array[Byte](0, 0, 0, 2, 0, 0, 0, 2, 8, 0, 0, 0, 0)
    def png(idat: Array[Byte]): Array[Byte] =
      sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.emptyByteArray)

    // (1) invalid scanline filter type (5): must be None, not an
    //     IllegalArgumentException escaping into the Spark task
    val badFilter = {
      val raw = Array[Byte](5, 1, 2, 0, 3, 4) // filter=5 on row 0
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](64)
      val bos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }
    assert(Png.decode(png(badFilter)).isEmpty, "invalid filter byte must yield None")

    // (2) zlib stream with the FDICT preset-dictionary bit set: the
    //     inflate loop must bail (needsDictionary), not spin forever.
    //     CMF=0x78, FLG=0x20 satisfies (CMF*256+FLG) % 31 == 0 with FDICT.
    val fdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 5, 6, 7, 8)
    val res = scala.concurrent.Future(Png.decode(png(fdict)))(
      scala.concurrent.ExecutionContext.global)
    assert(scala.concurrent.Await.result(res,
      scala.concurrent.duration.Duration(10, "s")).isEmpty, "FDICT must yield None")
  }

  test("PNG dispatch: decodeFeatures routes PNG through the real codec; resize re-encodes PNG") {
    import graft.multimodal.{Png, Pnm}
    val white = Pnm.Image(3, 2, 2, Array.fill[Byte](12)(-1))
    val (_, feat) = Multimodal.decode(Png.encode(white, _ => 4))
    assert(feat(0) === 1.0f && feat(1) === 1.0f && feat(2) === 1.0f)
    assert(feat(4) === 3.0f)
    // checksum equals the PNM-payload checksum of the same raster: the
    // feature contract is format-independent
    assert(Multimodal.decode(Png.encode(white))._1 ===
      Multimodal.decode(Pnm.encode(white))._1)
    // resize: PNG in → PNG out, pixels resampled on the grid
    val img = Pnm.Image(1, 4, 2, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    val resized = Png.decode(Multimodal.resizePayload(Png.encode(img, _ => 2), 2)).get
    assert(resized.pixels.toSeq === Seq[Byte](1, 3))
  }

  test("JPEG codec: encode/decode within lossy tolerance; rejection; dispatch routing") {
    import graft.multimodal.{Jpeg, Pnm}
    // smooth gradient — the content class JPEG represents well, so a
    // tight per-pixel tolerance is meaningful (a channel-order or
    // subsampling bug produces errors far beyond it)
    val w = 32; val h = 16
    val px = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      px(base) = (x * 8).toByte
      px(base + 1) = (y * 16).toByte
      px(base + 2) = ((x + y) * 5).toByte
    }
    val img = Pnm.Image(3, w, h, px)
    val jpeg = Jpeg.encode(img, quality = 0.95f)
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8, "SOI magic")
    val back = Jpeg.decode(jpeg).getOrElse(fail("jpeg failed to decode"))
    assert((back.channels, back.width, back.height) === ((3, w, h)))
    val diffs = px.indices.map(i => math.abs((px(i) & 0xff) - (back.pixels(i) & 0xff)))
    assert(diffs.max <= 24, s"per-pixel error too large: ${diffs.max}")
    assert(diffs.sum.toDouble / diffs.size <= 4.0,
      s"mean error too large: ${diffs.sum.toDouble / diffs.size}")
    // rejection: bad magic, truncated stream, garbage behind the magic
    assert(Jpeg.decode("not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decode(jpeg.take(20).toArray).isEmpty)
    assert(Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array.fill[Byte](64)(7)).isEmpty)
    // dispatch: decodeFeatures routes JPEG through the real codec — the
    // channel means must reflect the gradient, not the byte-soup fake
    val (_, feat) = Multimodal.decode(jpeg)
    val exactMeans = Pnm.meanChannels(img)
    for (c <- 0 until 3)
      assert(math.abs(feat(c) - exactMeans(c)) < 0.02f,
        s"channel $c mean ${feat(c)} vs exact ${exactMeans(c)}")
    assert(feat(4) === 3.0f)
    // resize: JPEG in → JPEG out, dims halved
    val resized = Jpeg.decode(Multimodal.resizePayload(jpeg, 2)).get
    assert((resized.width, resized.height) === ((w / 2, h / 2)))
  }

  test("WAV parse: chunk walk, LE reassembly, odd-pad, and rejection contract") {
    import ss.implicits._
    import graft.multimodal.Wav
    val pcm = Array.tabulate[Byte](8)(i => (i + 1).toByte) // 4 samples
    // canonical; with odd-length LIST junk; float format; stereo
    val rows = Seq(
      (1L, Wav.encode(44100, 1, 16, pcm)),
      (2L, Wav.encode(8000, 1, 16, pcm, Seq(("LIST", Array[Byte](9, 9, 9))))),
      (3L, Wav.encode(16000, 1, 16, pcm, audioFormat = 3)), // IEEE float
      (4L, Wav.encode(22050, 2, 16, pcm)), // stereo: rejected by wavWindows
      (5L, "RIFFxxxxNOPE".getBytes.padTo(64, 0.toByte))) // not WAVE
    val media = rows.toDF("media_id", "payload")
    val meta = Wav.parseMeta(media).orderBy("media_id").collect()
    assert(meta(0).getAs[Long]("sample_rate") == 44100L)
    assert(meta(0).getAs[Boolean]("wav_valid"))
    assert(meta(1).getAs[Long]("sample_rate") == 8000L, "walk past odd-pad junk")
    assert(meta(1).getAs[Long]("data_len") == 8L)
    assert(meta(2).getAs[Long]("audio_format") == 3L)
    assert(!meta(4).getAs[Boolean]("wav_valid"))
    val win = Wav.wavWindows(media, windowSamples = 4)
      .orderBy("media_id").collect()
    assert(win.map(_.getAs[Long]("media_id")).toSeq == Seq(1L, 2L),
      "only valid PCM16 mono rows survive")
    // windows equal the bare-PCM pass on the same samples
    val bare = Multimodal.pcm16Windows(
      Seq((1L, pcm)).toDF("media_id", "payload"), windowSamples = 4).head
    assert(win(0).getAs[Long]("sum_sq") == bare.getAs[Long]("sum_sq"))
    assert(win(0).getAs[Long]("peak") == bare.getAs[Long]("peak"))
  }

  test("u-law expansion goldens and window pass admit only format-7 mono") {
    import ss.implicits._
    import graft.multimodal.Wav
    // spec-table goldens: extremes and the two zero codes
    assert(Wav.ulawToLinear(0x00) === -32124)
    assert(Wav.ulawToLinear(0x80) === 32124)
    assert(Wav.ulawToLinear(0xff) === 0)
    assert(Wav.ulawToLinear(0x7f) === 0)
    // sign symmetry: code and code|0x80 decode to negatives of each other
    for (c <- 0 until 128)
      assert(Wav.ulawToLinear(c) === -Wav.ulawToLinear(c | 0x80), s"code $c")
    val codes = Array[Byte](0x00, 0x80.toByte, 0xff.toByte, 0x7f,
      0x23, 0xa3.toByte, 0x55, 0xd5.toByte,
      0x10, 0x90.toByte, 0x01, 0x81.toByte, 0x42, 0xc2.toByte, 0x33, 0xb3.toByte)
    val rows = Seq(
      (1L, Wav.encode(8000, 1, 8, codes, audioFormat = 7)), // u-law: admitted
      (2L, Wav.encode(8000, 1, 8, codes)), // linear PCM8: rejected
      (3L, Wav.encode(8000, 2, 8, codes, audioFormat = 7))) // stereo: rejected
    val got = Wav.ulawWindows(rows.toDF("media_id", "payload"), windowSamples = 16)
      .collect()
    assert(got.map(_.getAs[Long]("media_id")).toSeq == Seq(1L),
      "only format-7 8-bit mono rows may pass")
    val decoded = codes.map(b => Wav.ulawToLinear(b & 0xff))
    assert(got.head.getAs[Long]("sum_sq") === decoded.map(v => v.toLong * v).sum)
    assert(got.head.getAs[Long]("peak") === decoded.map(v => math.abs(v).toLong).max)
  }

  test("PCM16 windows: little-endian sign handling, exact energy, partial tail dropped") {
    import ss.implicits._
    // constructed samples incl. negatives (the driver corpus is ASCII so
    // its samples are always positive — the sign branch must be pinned
    // here): window = [1000, -1000, -32768, 32767], one trailing byte
    // dropped
    def le(v: Int): Seq[Byte] = {
      val u = if (v < 0) v + 65536 else v
      Seq((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
    }
    val payload = (le(1000) ++ le(-1000) ++ le(-32768) ++ le(32767) ++ Seq(7.toByte)).toArray
    val media = Seq((1L, payload)).toDF("media_id", "payload")
    val rows = Multimodal.pcm16Windows(media, windowSamples = 4).collect()
    assert(rows.length == 1, "partial tail must not produce a window")
    val r = rows.head
    assert(r.getAs[Int]("win_idx") == 0)
    val expectedSs = 1000L * 1000 + 1000L * 1000 + 32768L * 32768 + 32767L * 32767
    assert(r.getAs[Long]("sum_sq") == expectedSs)
    assert(r.getAs[Long]("peak") == 32768L)
  }

  test("scene cut: identical frames stay one scene, an abrupt change opens a new one") {
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-scenecut").toString
    // 6 frames of 16 bytes each (2×2 DIB, stride 8): frames 0-2 all 'A'
    // (intensity 12×65 = 780 over the 12 non-pad bytes), frames 3-5 all
    // 'z' (12×122 = 1464) — exactly one cut, at frame 3 (delta 684).
    val text = ("A" * 48) + ("z" * 48)
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Parity.sceneCutQ(spark, dir).collect()
      .map(r => (r.getAs[Long]("frame_idx"), r.getAs[Long]("intensity"),
        r.getAs[Long]("is_cut"), r.getAs[Long]("seg_id")))
    assert(out.length === 6)
    assert(out.map(_._2).toSeq === Seq(780L, 780L, 780L, 1464L, 1464L, 1464L))
    assert(out.map(_._3).toSeq === Seq(0L, 0L, 0L, 1L, 0L, 0L))
    assert(out.map(_._4).toSeq === Seq(0L, 0L, 0L, 1L, 1L, 1L))
  }

  test("VAD: active windows merge across a one-window hangover, long gaps split") {
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-vad").toString
    // 8 windows of 16 samples (32 chars each): loud '~' windows at
    // 0, 2, 5, 6; quiet ' ' elsewhere. Gap 0→2 bridges (hangover),
    // 2→5 splits → segments [0..2] (2 active) and [5..6] (2 active).
    val loud = "~" * 32
    val quiet = " " * 32
    val text = loud + quiet + loud + quiet + quiet + loud + loud + quiet
    require(text.length == 256)
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val segs = graft.queries.Parity.vadQ(spark, dir).collect()
      .map(r => (r.getAs[Int]("start_win"), r.getAs[Int]("end_win"),
        r.getAs[Long]("n_active")))
    assert(segs.toSeq === Seq((0, 2, 2L), (5, 6, 2L)), segs.mkString(","))
  }

  test("Haar fingerprint: brute transform replay, bucket stats consistent, dup payloads collide") {
    val rows = graft.queries.Parity.haarFp(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute scalar replay of decode → Haar bands → temporal code → pack
    val texts = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), substring(col("text"), 1, 96).as("head"))
      .filter(length(col("text")) >= 96 && octet_length(col("head")) === 96)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("head"))).toMap
    def bruteFp(sx: String): Long = {
      val bytes = sx.getBytes("UTF-8")
      val wins = (0 until bytes.length / 32).map { w =>
        val v = Array.tabulate(16) { i =>
          val lo = bytes(w * 32 + 2 * i) & 0xff; val hi = bytes(w * 32 + 2 * i + 1) & 0xff
          var x = lo | (hi << 8); if (x >= 32768) x -= 65536; x.toLong
        }
        (1 to 4).map { lev =>
          val blk = 1 << lev; val half = blk >> 1
          (0 until 16 by blk).map { j =>
            val c = (j until j + blk).map(p => if (p - j < half) v(p) else -v(p)).sum
            c * c
          }.sum
        }
      }
      var fp = 0L
      var prev: Option[IndexedSeq[Long]] = None
      wins.zipWithIndex.foreach { case (e, w) =>
        val d = IndexedSeq(e(0) - e(1), e(1) - e(2), e(2) - e(3))
        val pd = prev.getOrElse(IndexedSeq(0L, 0L, 0L))
        var code = 0L
        for (m <- 0 until 3) if (d(m) - pd(m) > 0) code |= (1L << m)
        fp |= code << (3 * w)
        prev = Some(d)
      }
      fp
    }
    val byId = rows.map(r => (r.getAs[Long]("media_id"), r)).toMap
    assert(byId.keySet === texts.keySet, "one fingerprint row per eligible doc")
    texts.foreach { case (id, sx) =>
      assert(byId(id).getAs[Long]("fp") === bruteFp(sx), s"media $id fp")
    }
    // bucket stats: n_same_fp is the true bucket size, keeper its min
    rows.groupBy(_.getAs[Long]("fp")).foreach { case (fp, rs) =>
      assert(rs.forall(_.getAs[Long]("n_same_fp") === rs.length.toLong))
      assert(rs.forall(_.getAs[Long]("keeper") === rs.map(_.getAs[Long]("media_id")).min))
    }
    // identical payloads MUST collide (determinism of the whole chain)
    texts.groupBy(_._2).values.filter(_.size > 1).foreach { g =>
      assert(g.map(x => byId(x._1).getAs[Long]("fp")).toSet.size === 1,
        "equal payloads produced different fingerprints")
    }
  }
}
