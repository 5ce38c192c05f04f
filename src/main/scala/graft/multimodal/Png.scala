package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** A REAL PNG codec with zero dependencies beyond the JDK: chunk
  * framing with CRC-32 verification, zlib inflate/deflate
  * (`java.util.zip`), and the five scanline filters of the PNG spec
  * (None/Sub/Up/Average/Paeth) — actual compressed-image decode, not a
  * stub. This closes the "compressed media" gap the PNM codec left
  * open: the dispatch in [[Multimodal.decode]] now runs real pixel
  * work for both an uncompressed (PNM) and a compressed (PNG) format.
  *
  * Scope: 8-bit greyscale (colour type 0) and truecolour (colour
  * type 2), non-interlaced — the dominant shapes in a scraped-image
  * corpus after format normalization. Palette/alpha/16-bit/Adam7
  * return None and fall back to the caller's stub path, exactly like
  * non-8-bit PNM.
  *
  * Reference behavior: the reference pipeline treats media as opaque
  * payloads (it has no decoder at all); the decode contract here
  * follows the public PNG specification (RFC 2083 / ISO 15948).
  */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  // ---------------------------------------------------------------- decode

  /** Decode a PNG byte stream to the engine's raster type; None when
    * the payload is not a PNG this codec supports (bad signature, CRC
    * mismatch, palette/alpha/16-bit/interlaced, truncated stream).
    * Greyscale decodes to channels=1, truecolour to channels=3 — the
    * same contract as [[Pnm.decode]], so everything downstream
    * (featurize, resize, statistics) is format-independent.
    */
  def decode(bytes: Array[Byte]): Option[Pnm.Image] = {
    if (bytes.length < Signature.length + 12) return None
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return None
      i += 1
    }
    var pos = Signature.length
    var width = 0
    var height = 0
    var channels = 0
    var sawIhdr = false
    var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()

    def u32(p: Int): Long =
      ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)

    while (!sawIend) {
      if (pos + 8 > bytes.length) return None
      val len = u32(pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
      val n = len.toInt
      val tag = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + n)
      if (crc.getValue != u32(pos + 8 + n)) return None
      tag match {
        case "IHDR" =>
          if (sawIhdr || n != 13) return None
          sawIhdr = true
          val w = u32(pos + 8)
          val h = u32(pos + 12)
          val bitDepth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val compression = bytes(pos + 18) & 0xff
          val filterMethod = bytes(pos + 19) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          if (w < 1 || h < 1 || w > (1L << 24) || h > (1L << 24)) return None
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 ||
            interlace != 0) return None
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case _ => return None // palette/alpha out of scope
          }
          width = w.toInt
          height = h.toInt
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(bytes, pos + 8, n)
        case "IEND" => sawIend = true
        case _ => // ancillary chunk (tEXt, pHYs, ...): skip
      }
      pos += 12 + n
    }
    if (!sawIhdr) return None

    // inflate exactly height * (1 filter byte + width*channels) bytes
    val stride = width * channels
    val rawLen = height.toLong * (1 + stride)
    if (rawLen > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, off, raw.length - off)
        // Any zero-progress iteration is a failure: truncated stream
        // (needsInput) or an FDICT preset-dictionary stream
        // (needsDictionary), which would otherwise spin forever.
        if (k == 0) return None
        off += k
      }
      if (off != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // A CRC-valid chunk can still carry a malformed filter byte; treat
    // that as "not a PNG this codec supports", not a task crash.
    unfilter(raw, height, stride, channels)
      .map(px => Pnm.Image(channels, width, height, px))
  }

  /** Reverse the per-scanline filters in place-ish: `raw` is
    * height × (1 + stride) filtered bytes, result is height × stride
    * reconstructed samples, or None when a scanline carries a filter
    * type outside 0–4 (malformed stream). Byte arithmetic is mod-256
    * exactly as the spec requires; `prior` of the first row is all
    * zeros.
    */
  private def unfilter(raw: Array[Byte], height: Int, stride: Int, bpp: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xff
      val src = y * (1 + stride) + 1
      val dst = y * stride
      val prior = dst - stride // valid only when y > 0
      var x = 0
      while (x < stride) {
        val f = raw(src + x) & 0xff
        val a = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
        val b = if (y > 0) out(prior + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) out(prior + x - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + ((a + b) >> 1)
          case 4 => f + paeth(a, b, c)
          case _ => return None // invalid filter type: malformed stream
        }
        out(dst + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** Paeth predictor, straight from the spec: the neighbor (left,
    * above, upper-left) closest to the linear estimate a + b − c,
    * ties broken left → above → upper-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---------------------------------------------------------------- encode

  /** Encode the raster as a PNG, choosing the filter for each scanline
    * via `filterFor(y)` (0=None 1=Sub 2=Up 3=Average 4=Paeth). The
    * per-row filter hook exists so tests and parity queries can force
    * every filter type through the decoder — a real encoder would pick
    * per-row minimum-sum-of-absolutes, which callers can implement on
    * top of this. */
  def encode(img: Pnm.Image, filterFor: Int => Int = _ => 0): Array[Byte] = {
    val stride = img.width * img.channels
    val bpp = img.channels
    val raw = new Array[Byte](img.height * (1 + stride))
    var y = 0
    while (y < img.height) {
      val ft = filterFor(y)
      require(ft >= 0 && ft <= 4, s"filter $ft")
      raw(y * (1 + stride)) = ft.toByte
      val src = y * stride
      val dst = y * (1 + stride) + 1
      var x = 0
      while (x < stride) {
        val v = img.pixels(src + x) & 0xff
        val a = if (x >= bpp) img.pixels(src + x - bpp) & 0xff else 0
        val b = if (y > 0) img.pixels(src - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) img.pixels(src - stride + x - bpp) & 0xff else 0
        val filt = ft match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 => v - paeth(a, b, c)
        }
        raw(dst + x) = filt.toByte
        x += 1
      }
      y += 1
    }

    val ihdr = new Array[Byte](13)
    def putU32(arr: Array[Byte], p: Int, v: Int): Unit = {
      arr(p) = (v >>> 24).toByte; arr(p + 1) = (v >>> 16).toByte
      arr(p + 2) = (v >>> 8).toByte; arr(p + 3) = v.toByte
    }
    putU32(ihdr, 0, img.width)
    putU32(ihdr, 4, img.height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (img.channels == 3) 2 else 0).toByte // colour type
    // compression=0, filter=0, interlace=0 already zero

    val deflated = {
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
      try {
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](math.max(64, raw.length + raw.length / 2 + 64))
        val out = new java.io.ByteArrayOutputStream()
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      } finally d.end()
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      val hdr = new Array[Byte](4)
      putU32(hdr, 0, data.length)
      out.write(hdr, 0, 4)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(tb)
      crc.update(data)
      val cb = new Array[Byte](4)
      putU32(cb, 0, crc.getValue.toInt)
      out.write(cb, 0, 4)
    }
    chunk("IHDR", ihdr)
    chunk("IDAT", deflated)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
