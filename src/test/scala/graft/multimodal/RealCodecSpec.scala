package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaOps.{MediaMeta, MediaRow}

/** The REAL decoders against COMMITTED fixture files (bytes on disk, not
  * synthesized in the test): a 440 Hz 16-bit PCM WAV and an 8x4 24-bit
  * BMP with a known gradient, pushed through the same mapPartitions
  * plumbing as the stubbed formats. Expected values are recomputed
  * independently here from the format definitions. */
class RealCodecSpec extends SparkSpec {

  private def fixtureBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"fixture $name missing from test resources")
    try in.readAllBytes() finally in.close()
  }

  test("committed tone.wav decodes to the 440 Hz PCM samples") {
    val wav = RealCodecs.decodeWav(fixtureBytes("tone.wav"))
    assert(wav.sampleRate == 8000 && wav.channels == 1)
    assert(wav.samples.length == 256)
    // independent recompute: sample i = round-toward-zero of
    // 0.5 * 32767 * sin(2*pi*440*i/8000), normalized by 32768
    (0 until 256).foreach { i =>
      val want = (0.5 * 32767 * math.sin(2 * math.Pi * 440 * i / 8000)).toInt / 32768f
      assert(math.abs(wav.samples(i) - want) < 1e-6f,
        s"sample $i: ${wav.samples(i)} != $want")
    }
  }

  test("committed gradient.bmp decodes with bottom-up rows unflipped") {
    val img = RealCodecs.decodeBmp(fixtureBytes("gradient.bmp"))
    assert(img.width == 8 && img.height == 4)
    // the fixture sets r=g=b = x*16 + y*4 in TOP-DOWN coordinates; the
    // decoder must undo BMP's bottom-up storage
    for (y <- 0 until 4; x <- 0 until 8) {
      val want = (x * 16 + y * 4) / 255f
      val got = img.pixels(y * 8 + x)
      assert(math.abs(got - want) < 1e-6f, s"pixel ($x,$y): $got != $want")
    }
  }

  test("committed gradient.png decodes through the pure-Java ImageIO path") {
    // hand-built grayscale PNG (color type 0, zlib IDAT): pixel (x,y) =
    // min(255, x*16 + y) — values recomputed here from that formula, so
    // a decoder regression cannot pass by matching itself
    val img = RealCodecs.decodeImageIO(fixtureBytes("gradient.png"))
    assert(img.width == 16 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = math.min(255, x * 16 + y) / 255f
      val got = img.pixels(y * 16 + x)
      assert(math.abs(got - want) < 1e-6f, s"pixel ($x,$y): $got != $want")
    }
    // png round-trip: encode is the lossless inverse of decode
    val back = RealCodecs.decodeImageIO(
      RealCodecs.encodePng(img.width, img.height, img.pixels))
    assert(back.pixels.toSeq == img.pixels.toSeq)
  }

  test("real WAV, BMP and PNG rows flow through the Spark operators") {
    import spark.implicits._
    val wavBytes = fixtureBytes("tone.wav")
    val bmpBytes = fixtureBytes("gradient.bmp")
    val pngBytes = fixtureBytes("gradient.png")
    val media = Seq(
      MediaRow(1L, "audio", wavBytes, MediaMeta(0, 0, 8000, 1, "wav")),
      MediaRow(2L, "image", bmpBytes, MediaMeta(8, 4, 0, 1, "bmp")),
      // metadata LIES about the size here — dimensions must come from
      // the decoded container bytes, proving the dispatch is real
      MediaRow(3L, "image", pngBytes, MediaMeta(4, 4, 0, 1, "png")))
      .toDS().repartition(2)

    val audio = MediaOps.decodeAudio(media).collect()
    assert(audio.length == 1 && audio.head.media_id == 1L)
    assert(audio.head.sample_rate == 8000 && audio.head.n_samples == 256)
    val af = MediaOps.audioFeatures(MediaOps.decodeAudio(media)).collect().head
    // a half-amplitude sine has RMS ~ 0.5/sqrt(2) ~ 0.3536 and a 440 Hz
    // tone at 8 kHz crosses zero ~ 2*440/8000 ~ 0.11 of samples
    assert(math.abs(af.getFloat(3) - 0.3536f) < 0.01f, s"rms ${af.getFloat(3)}")
    assert(math.abs(af.getFloat(4) - 0.11f) < 0.02f, s"zcr ${af.getFloat(4)}")

    val images = MediaOps.decodeImages(media).collect().sortBy(_.media_id)
    assert(images.map(_.media_id).toSeq == Seq(2L, 3L))
    val bmp = images.head
    assert(bmp.width == 8 && bmp.height == 4) // dimensions FROM THE BYTES
    assert(math.abs(bmp.pixels(9) - (1 * 16 + 1 * 4) / 255f) < 1e-6f)
    val png = images(1)
    assert(png.width == 16 && png.height == 16,
      "png dimensions must come from the container, not the lying metadata")
    assert(math.abs(png.pixels(16 + 2) - math.min(255, 2 * 16 + 1) / 255f) < 1e-6f)
    // the real image resizes through the shared (non-stubbed) transform
    val resized = MediaOps.resize(
      MediaOps.decodeImages(media).filter(_.media_id == 2L), 4, 2).collect().head
    assert(resized.width == 4 && resized.height == 2)
    assert(resized.pixels.length == 8)
  }
}
