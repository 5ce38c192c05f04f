package graft.multimodal

/** JPEG decode via the JDK's built-in ImageIO plugin — the last image
  * format the dispatch stubbed. The JDK bundles a full baseline+
  * progressive JPEG codec in `java.desktop` (no external libs, works
  * headless), so routing JFIF/EXIF payloads through it is still a
  * zero-dependency decode like [[Png]] — the difference is that JPEG
  * is LOSSY and its decoded pixels are decoder-implementation-defined
  * (IDCT rounding), so there is no header-blind cross-engine oracle:
  * the codec is spec-verified (encode→decode within a per-pixel
  * tolerance on smooth gradients, magic/garbage rejection, dispatch
  * routing) rather than hash-oracled, the same honesty split as the
  * MG sketch vs the exact top-k.
  *
  * Output contract matches [[Pnm.decode]]/[[Png.decode]]: 3-channel
  * RGB (grayscale JPEGs expand to RGB — ImageIO's raster already
  * carries them that way through getRGB), so every downstream
  * operator (featurize, resize, statistics) is format-independent.
  */
object Jpeg {

  /** JFIF/EXIF payloads start with the SOI marker 0xFFD8. */
  private def hasMagic(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8

  /** Decode a JPEG byte stream; None when the payload is not a JPEG
    * this JVM can decode (wrong magic, truncated, corrupt). */
  def decode(bytes: Array[Byte]): Option[Pnm.Image] = {
    if (!hasMagic(bytes)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w < 1 || h < 1 || w.toLong * h > (1L << 26)) return None
      val out = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val base = (y * w + x) * 3
          out(base) = ((rgb >> 16) & 0xff).toByte
          out(base + 1) = ((rgb >> 8) & 0xff).toByte
          out(base + 2) = (rgb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(Pnm.Image(3, w, h, out))
    } catch {
      case _: Exception => None // corrupt stream: fall through to the stub
    }
  }

  /** Encode the raster as JPEG at `quality` in [0,1] (test/fixture
    * side; production corpora arrive already encoded). */
  def encode(img: Pnm.Image, quality: Float = 0.9f): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val base = (y * img.width + x) * img.channels
        val (r, g, b) =
          if (img.channels == 3)
            (img.pixels(base) & 0xff, img.pixels(base + 1) & 0xff, img.pixels(base + 2) & 0xff)
          else {
            val v = img.pixels(base) & 0xff; (v, v, v)
          }
        bi.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), params)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }
}
