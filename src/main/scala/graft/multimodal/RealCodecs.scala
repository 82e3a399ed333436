package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM decoders for the two container formats decodable without
  * native codec libraries: RIFF/WAVE 16-bit PCM audio and uncompressed
  * 24-bit BMP images. These replace [[MediaOps.StubCodec]] on the formats
  * they cover (`MediaOps.decodeImages` dispatches on `meta.format`;
  * `decodeAudio` is WAV-only), parsing actual byte layouts — chunk walks,
  * little-endian fields, bottom-up padded pixel rows — through the same
  * `mapPartitions` plumbing a JNI codec would use. The stub remains, and
  * remains clearly declared, for formats that genuinely need a native
  * library (png/jpeg/mp4).
  *
  * Determinism: both decoders are pure byte→float arithmetic, so golden
  * values in specs and gates are stable across runs and machines. */
object RealCodecs {

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
