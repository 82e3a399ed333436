package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL JVM decoders: hand-parsed RIFF/WAVE 16-bit PCM and uncompressed
  * 24-bit BMP (chunk walks, little-endian fields, bottom-up padded pixel
  * rows), plus [[decodeImageIO]] for every compressed image container the
  * JDK's pure-Java `javax.imageio` plugins read — png/jpeg/gif/tiff/wbmp
  * need NO native library (r8's "needs native codecs" claim was wrong and
  * is corrected here). They replace [[MediaOps.StubCodec]] on all image
  * and WAV audio paths via `MediaOps.decodeImages`' format dispatch,
  * through the same `mapPartitions` plumbing a JNI codec would use. The
  * stub remains, clearly declared, only for VIDEO (mp4 frame demux/
  * decode — genuinely an ffmpeg-class native dependency).
  *
  * Determinism: the hand parsers are pure byte→float arithmetic, and the
  * ImageIO path is lossless-deterministic for the formats the fixtures
  * use (png/gif/bmp decode to exact sample values; pixels, not encoder
  * bytes, feed every feature) — so golden values in specs and gates are
  * stable across runs and machines. */
object RealCodecs {

  case class JvmImage(width: Int, height: Int, pixels: Array[Float])

  /** Decode any `javax.imageio`-supported container (png/jpeg/gif/bmp/
    * tiff/wbmp in this JDK — all pure-Java plugins). Channel-mean gray in
    * [0,1], top-down row-major — the same layout as [[decodeBmp]].
    * Throws on unrecognized bytes (quarantine path), like the hand
    * parsers. */
  def decodeImageIO(bytes: Array[Byte]): JvmImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "no ImageIO reader recognized the byte stream")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](w * h)
    val gray = img.getColorModel.getNumColorComponents == 1
    val raster = img.getRaster
    // single-component images read RAW samples: getRGB would push gray
    // values through a linear-gray→sRGB gamma conversion and silently
    // distort every pixel (caught by the committed-fixture spec)
    val grayMax = if (gray)
      ((1 << raster.getSampleModel.getSampleSize(0)) - 1).toFloat else 0f
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) =
          if (gray) raster.getSample(x, y, 0) / grayMax
          else {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            (r + g + b) / (3f * 255f)
          }
        x += 1
      }
      y += 1
    }
    JvmImage(w, h, out)
  }

  /** Encode a gray buffer as a real PNG (ImageIO's pure-Java encoder) —
    * the fixture-side inverse of [[decodeImageIO]]: PNG is lossless, so
    * decode(encode(px)) returns exactly `round(px·255)/255` regardless
    * of encoder byte layout. */
  def encodePng(width: Int, height: Int, gray: Array[Float]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = math.max(0, math.min(255,
          math.round(gray(y * width + x) * 255f)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Float])

  /** Parse a RIFF/WAVE container with a 16-bit PCM `data` chunk. Chunk
    * walk tolerates extra chunks (LIST, fact) in any order; throws
    * IllegalArgumentException on non-RIFF bytes or non-PCM encoding —
    * a real ingest pipeline routes those to quarantine, not silence. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(bytes.length >= 44, s"WAV too short: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    bb.getInt // riff payload size
    require(fourCC() == "WAVE", "not a WAVE form")
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var samples: Array[Float] = null
    while (bb.remaining() >= 8 && samples == null) {
      val id = fourCC()
      val size = bb.getInt
      id match {
        case "fmt " =>
          val audioFormat = bb.getShort
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt   // byte rate
          bb.getShort // block align
          bits = bb.getShort
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          bb.position(bb.position() + (size - 16)) // fmt extensions
        case "data" =>
          require(bits == 16, "data chunk before fmt chunk")
          val n = size / 2
          val out = new Array[Float](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort / 32768f; i += 1 }
          samples = out
        case _ => // LIST / fact / other: skip (word-aligned)
          bb.position(bb.position() + size + (size & 1))
      }
    }
    require(samples != null, "no data chunk")
    WavAudio(sampleRate, channels, samples)
  }

  case class BmpImage(width: Int, height: Int, pixels: Array[Float])

  /** Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER): bottom-up
    * 4-byte-padded rows, BGR byte order. Pixels come out top-down
    * row-major as channel-mean gray in [0,1] — the layout
    * [[MediaOps.resize]] and the feature extractors consume. */
  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length} bytes")
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    val width = bb.getInt(18)
    val heightRaw = bb.getInt(22)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    require(bpp == 24, s"only 24-bit BMP supported, got $bpp")
    require(compression == 0, s"only uncompressed BMP supported")
    val bottomUp = heightRaw > 0
    val height = math.abs(heightRaw)
    val stride = (width * 3 + 3) / 4 * 4
    val out = new Array[Float](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val base = dataOffset + srcRow * stride
      var x = 0
      while (x < width) {
        val b = bytes(base + x * 3) & 0xff
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        out(y * width + x) = (r + g + b) / (3f * 255f)
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, out)
  }
}
