package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample transforms.
  *
  * The Spark-side plumbing is real and tested — schemas, partition-local
  * batch iteration (`mapPartitions` with one decoder instance per
  * partition, the pattern a JNI codec or ONNX runtime needs), explode
  * shapes, and partitioning. The byte-level DECODE step is REAL for every
  * IMAGE format (hand-parsed 24-bit BMP plus `javax.imageio` for
  * png/jpeg/gif/tiff — pure-Java plugins, no native library; committed
  * fixture files exercised in RealCodecSpec) and for RIFF/WAVE 16-bit PCM
  * audio ([[RealCodecs]]). A clearly marked deterministic STUB remains
  * ONLY for video (mp4 frame demux/decode — an ffmpeg-class native
  * dependency this container doesn't ship): `StubCodec` derives stable
  * pseudo-content from the payload bytes, so the frame-sampling operators
  * run against real data flow with reproducible values.
  *
  * Scale shape: all transforms are narrow (scan → mapPartitions/project);
  * frame sampling explodes rows but stays partition-local. At 100 TB the
  * only tuning is `spark.sql.files.maxPartitionBytes` vs decoded-frame
  * memory — no shuffles are introduced here.
  */
object MediaOps {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int,
      nFrames: Int, format: String)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      meta: MediaMeta)
  case class DecodedImage(media_id: Long, width: Int, height: Int,
      pixels: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, pixels: Array[Float])

  /** ======= STUB CODEC (video only) =======
    * Stands in for an ffmpeg binding on the ONE modality a pure JVM
    * cannot decode — mp4 frame demux in [[sampleFrames]]. Every image
    * format goes through [[RealCodecs]] instead (the JDK's imageio
    * plugins are pure Java). Expands payload bytes into deterministic
    * "pixel" data. PERMANENT DECLARED DEVIATION (like the V5 embedder
    * stand-in): video frame decode needs an ffmpeg-class native codec no
    * pure-JVM library provides, so the video leg ships as this stub by
    * design, not as a roadmap item — the Spark-side surface (schema,
    * partitioning, frame-sampling plan shape, feature kernels) is the
    * real, tested artifact, and a codec binding would slot in behind
    * `decodeBytes` without changing any signature. */
  object StubCodec {
    def decodeBytes(bytes: Array[Byte], w: Int, h: Int): Array[Float] = {
      val out = new Array[Float](w * h)
      var acc = 0x811c9dc5 // FNV-1a over the payload drives the fake pixels
      var i = 0
      while (i < out.length) {
        val b = if (bytes.nonEmpty) bytes(i % bytes.length) else 0
        acc = (acc ^ (b & 0xff)) * 0x01000193
        out(i) = ((acc >>> 8) & 0xff) / 255f
        i += 1
      }
      out
    }
  }

  /** Deterministic fixture table. Image rows carry REAL PNG containers
    * (a seeded gray pattern through [[RealCodecs.encodePng]] — PNG is
    * lossless, so decoded pixels are a pure function of `media_id` no
    * matter how the encoder lays out its bytes); audio/video rows carry
    * seeded pseudo-payloads for the stub/quarantine paths. */
  def fixture(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).repartition(partitions).map { id =>
      val kind = Seq("image", "audio", "video")(id.toInt % 3)
      val rnd = new scala.util.Random(id)
      val (bytes, meta) = kind match {
        case "image" =>
          val px = Array.tabulate(16 * 16)(i =>
            (((i * 31 + id * 7) % 256).toInt / 255f))
          (RealCodecs.encodePng(16, 16, px), MediaMeta(16, 16, 0, 1, "png"))
        case "audio" =>
          (Array.fill[Byte](64 + rnd.nextInt(64))(rnd.nextInt().toByte),
            MediaMeta(0, 0, 16000, 1, "wav"))
        case _ =>
          (Array.fill[Byte](64 + rnd.nextInt(64))(rnd.nextInt().toByte),
            MediaMeta(16, 16, 0, 8, "mp4"))
      }
      MediaRow(id, kind, bytes, meta)
    }
  }

  /** Decode images: one codec instance per PARTITION (not per row) — the
    * batch shape a real decoder needs. Every format decodes REAL bytes:
    * `bmp` through the hand-written parser ([[RealCodecs.decodeBmp]] —
    * actual bottom-up padded-row BGR bytes), everything else through the
    * JDK's pure-Java imageio plugins ([[RealCodecs.decodeImageIO]] —
    * png/jpeg/gif/tiff; unrecognized bytes throw, the quarantine path).
    * Decoded dimensions come from the BYTES, never the metadata — the
    * header is the truth a real pipeline trusts. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      // real codec: init once here (expensive), reuse across the iterator
      rows.map { r =>
        val img =
          if (r.meta.format == "bmp") {
            val b = RealCodecs.decodeBmp(r.bytes)
            RealCodecs.JvmImage(b.width, b.height, b.pixels)
          } else RealCodecs.decodeImageIO(r.bytes)
        DecodedImage(r.media_id, img.width, img.height, img.pixels)
      }
    }
  }

  case class DecodedAudio(media_id: Long, sample_rate: Int, n_samples: Int,
      samples: Array[Float])

  /** Decode WAV/PCM audio rows — a REAL decode path end to end
    * ([[RealCodecs.decodeWav]] parses the RIFF chunk walk from the actual
    * bytes; no stub behind it). Same per-partition batch shape as
    * [[decodeImages]]. Non-WAV audio rows are FILTERED OUT (not decoded,
    * not thrown on): only `format == "wav"` reaches decodeWav. An ingest
    * pipeline that must quarantine unsupported formats should anti-join
    * the output ids against the input rather than expect an exception. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "audio" && r.meta.format == "wav")
      .mapPartitions { rows =>
        rows.map { r =>
          val a = RealCodecs.decodeWav(r.bytes)
          DecodedAudio(r.media_id, a.sampleRate, a.samples.length, a.samples)
        }
      }
  }

  /** RMS level and zero-crossing rate per decoded audio row — the
    * audio-side analogue of [[imageFeatures]] (deterministic loops). */
  def audioFeatures(audio: Dataset[DecodedAudio]): DataFrame = {
    import audio.sparkSession.implicits._
    audio.map { a =>
      val n = a.samples.length.max(1)
      var sq = 0.0
      var zc = 0
      var i = 0
      while (i < a.samples.length) {
        sq += a.samples(i).toDouble * a.samples(i)
        if (i > 0 && (a.samples(i) >= 0) != (a.samples(i - 1) >= 0)) zc += 1
        i += 1
      }
      (a.media_id, a.sample_rate, a.n_samples,
        math.sqrt(sq / n).toFloat, zc.toFloat / n)
    }.toDF("media_id", "sample_rate", "n_samples", "rms", "zcr")
  }

  /** Nearest-neighbour resize over decoded pixel arrays (pure Spark-side
    * math — NOT stubbed). */
  def resize(images: Dataset[DecodedImage], ow: Int, oh: Int): Dataset[DecodedImage] = {
    import images.sparkSession.implicits._
    images.map { img =>
      val out = new Array[Float](ow * oh)
      var y = 0
      while (y < oh) {
        val sy = y * img.height / oh
        var x = 0
        while (x < ow) {
          out(y * ow + x) = img.pixels(sy * img.width + x * img.width / ow)
          x += 1
        }
        y += 1
      }
      DecodedImage(img.media_id, ow, oh, out)
    }
  }

  /** Sample every `everyN`-th frame of videos (explode shape: one row per
    * kept frame, partition-local). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0 until r.meta.nFrames by everyN).map { f =>
        // real codec: seek+decode frame f; stub varies content by frame index
        Frame(r.media_id, f,
          StubCodec.decodeBytes(r.bytes :+ f.toByte, r.meta.width, r.meta.height))
      }
    }
  }

  /** mean / std / edge-energy of one pixel buffer (single-threaded loop —
    * bit-deterministic, which the golden-parquet gate compare relies on). */
  private[multimodal] def feats(pixels: Array[Float]): (Float, Float, Float) = {
    val n = pixels.length.max(1)
    val mean = pixels.sum / n
    val variance = pixels.map(p => (p - mean) * (p - mean)).sum / n
    var edge = 0f
    var i = 1
    while (i < pixels.length) {
      edge += math.abs(pixels(i) - pixels(i - 1)); i += 1
    }
    (mean, math.sqrt(variance).toFloat, edge / n)
  }

  /** Feature extraction: mean/std/edge-energy per decoded image — the
    * hand-off row shape for an embedding model (runs on real pixel data,
    * deterministic given the stub decode). */
  def imageFeatures(images: Dataset[DecodedImage]): DataFrame = {
    import images.sparkSession.implicits._
    images.map { img =>
      val (mean, std, edge) = feats(img.pixels)
      (img.media_id, mean, std, edge)
    }.toDF("media_id", "px_mean", "px_std", "edge_energy")
  }

  /** Per-UNIT features across modalities: one row per image and per
    * sampled video frame (`unit_idx` = 0 for images, the frame index for
    * frames). All math is per-row (decode → features in one task), so the
    * output is bit-deterministic — the driver-checkable gate shape for the
    * multimodal pipeline. */
  def unitFeatures(media: Dataset[MediaRow], everyN: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    val imgs = decodeImages(media).map { img =>
      val (mean, std, edge) = feats(img.pixels)
      (img.media_id, "image", 0, mean, std, edge)
    }
    val frames = sampleFrames(media, everyN).map { f =>
      val (mean, std, edge) = feats(f.pixels)
      (f.media_id, "video", f.frame_idx, mean, std, edge)
    }
    imgs.union(frames)
      .toDF("media_id", "kind", "unit_idx", "px_mean", "px_std", "edge_energy")
  }
}
