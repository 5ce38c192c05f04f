package graft.multimodal

/** A REAL image codec with zero dependencies: binary PPM (P6, RGB) and
  * PGM (P5, grayscale) — the NetPBM formats every imaging toolchain can
  * emit. This moves the multimodal decode boundary from "stubbed" to
  * "real for the PNM family; stubbed only for compressed formats whose
  * codec libraries this container lacks": header parsing (with `#`
  * comments), raw-sample decode, nearest-neighbor resize, and channel
  * statistics are all actual pixel work, spec-tested on golden images.
  *
  * Scope: 8-bit samples (maxval ≤ 255), the overwhelmingly common case;
  * anything else returns None and falls back to the caller's stub path.
  */
object Pnm {

  /** Decoded raster: `channels` is 3 (P6) or 1 (P5); `pixels` is
    * row-major, `channels` bytes per pixel, unsigned samples. */
  final case class Image(channels: Int, width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == channels * width * height, "pixel buffer size mismatch")
  }

  /** Encode as binary PPM/PGM (no comments, single-space header). */
  def encode(img: Image): Array[Byte] = {
    val magic = if (img.channels == 3) "P6" else "P5"
    val header = s"$magic\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Decode P6/P5 bytes; None when the payload is not 8-bit binary PNM
    * (wrong magic, maxval > 255, or truncated data). */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 2 || bytes(0) != 'P') return None
    val channels = bytes(1) match {
      case '6' => 3
      case '5' => 1
      case _ => return None
    }
    // header tokenizer: whitespace-separated ints, '#' comments run to EOL.
    // Accumulates in a guarded Long: an adversarial digit run (or huge
    // declared dims) must yield None — never NumberFormatException — so a
    // corrupt P6/P5-magic payload falls back to the caller's stub path.
    var pos = 2
    def nextInt(): Option[Int] = {
      while (pos < bytes.length &&
        (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos).toChar.isDigit) {
        // stop growing past the bound but keep consuming the digit run
        if (v <= Int.MaxValue) v = v * 10 + (bytes(pos) - '0')
        pos += 1
      }
      if (pos == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    for {
      w <- nextInt(); h <- nextInt(); maxval <- nextInt()
      if maxval > 0 && maxval <= 255 && w > 0 && h > 0
      // exactly ONE whitespace byte separates the header from raw data
      if pos < bytes.length && bytes(pos).toChar.isWhitespace
      // payload size in Long: channels*w*h overflows Int for large
      // declared dims, and a truncation check on an overflowed Int would
      // pass spuriously
      n = channels.toLong * w * h
      if bytes.length.toLong - (pos + 1) >= n
    } yield Image(channels, w, h,
      java.util.Arrays.copyOfRange(bytes, pos + 1, pos + 1 + n.toInt))
  }

  /** Nearest-neighbor downscale by integer `factor` (dims floor-divide,
    * min 1) — real resampling on the pixel grid, the algorithm every
    * thumbnailer starts from. */
  def resizeNearest(img: Image, factor: Int): Image = {
    require(factor >= 1, s"factor $factor")
    val nw = math.max(1, img.width / factor)
    val nh = math.max(1, img.height / factor)
    val out = new Array[Byte](img.channels * nw * nh)
    var y = 0
    while (y < nh) {
      val sy = math.min(img.height - 1, y * factor)
      var x = 0
      while (x < nw) {
        val sx = math.min(img.width - 1, x * factor)
        var c = 0
        while (c < img.channels) {
          out((y * nw + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(img.channels, nw, nh, out)
  }

  /** Per-channel mean sample values in [0, 1] (grayscale replicated to
    * three so downstream feature dims are format-independent). */
  def meanChannels(img: Image): Array[Float] = {
    val sums = new Array[Long](img.channels)
    var i = 0
    while (i < img.pixels.length) {
      sums(i % img.channels) += img.pixels(i) & 0xff
      i += 1
    }
    val n = img.width.toLong * img.height
    val means = sums.map(s => (s.toDouble / (n * 255.0)).toFloat)
    if (img.channels == 3) means else Array(means(0), means(0), means(0))
  }
}
