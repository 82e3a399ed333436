package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaOps._

class MediaOpsSpec extends SparkSpec {

  test("fixture schema and binary column survive a parquet roundtrip") {
    import spark.implicits._
    val m = fixture(spark, 12)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val tmp = java.nio.file.Files.createTempDirectory("media").toString + "/t"
    m.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp).as[MediaRow]
    assert(back.count() == 12)
    val orig = m.collect().map(r => r.media_id -> r.bytes.toSeq).toMap
    back.collect().foreach(r => assert(r.bytes.toSeq == orig(r.media_id)))
  }

  test("independent pin: StubCodec + feats recomputed outside the JVM") {
    // Expected values come from an INDEPENDENT Python reimplementation of
    // the FNV-1a codec math and the float32 feature folds (ADVICE r3:
    // media rows previously pinned only engine output). The pixel pin is
    // EXACT (raw bucket bytes / 255f); the feature pins allow 1e-6 for
    // any residual fold-order ulp.
    val raw = Seq(91, 32, 55, 160, 213, 60, 143, 176,
      151, 62, 118, 100, 164, 61, 117, 108)
    val px = StubCodec.decodeBytes(Array[Byte](1, 2, 3), 4, 4)
    assert(px.toSeq == raw.map(_ / 255f), "codec bytes drifted vs independent math")
    val (mean, std, edge) = MediaOps.feats(px)
    assert(math.abs(mean - 0.44387263f) < 1e-6f, s"mean=$mean")
    assert(math.abs(std - 0.19578518f) < 1e-6f, s"std=$std")
    assert(math.abs(edge - 0.22769606f) < 1e-6f, s"edge=$edge")
  }

  test("gate fixture size scales with the sfDir scale factor") {
    import graft.queries.MediaQueries
    assert(MediaQueries.sizeOf("/root/testdata/sf0.001") == 12)
    assert(MediaQueries.sizeOf("/root/testdata/sf0.01") == MediaQueries.BaseN)
    assert(MediaQueries.sizeOf("/root/testdata/sf0.1") == 1200)
    assert(MediaQueries.sizeOf("/root/testdata/sf0.1/") == 1200)
    assert(MediaQueries.sizeOf("/weird/dir") == MediaQueries.BaseN)
  }

  test("decode is deterministic and partition-count-invariant") {
    val a = decodeImages(fixture(spark, 9, partitions = 1)).collect()
      .map(d => d.media_id -> d.pixels.toSeq).toMap
    val b = decodeImages(fixture(spark, 9, partitions = 4)).collect()
      .map(d => d.media_id -> d.pixels.toSeq).toMap
    assert(a == b, "decode output must not depend on partitioning")
    assert(a.values.forall(_.length == 16 * 16))
  }

  test("resize produces the target geometry from real decoded data") {
    val small = resize(decodeImages(fixture(spark, 6)), 4, 4).collect()
    assert(small.forall(i => i.width == 4 && i.pixels.length == 16))
    // resize is pure: pixel values come from the decoded source
    val src = decodeImages(fixture(spark, 6)).collect()
      .map(d => d.media_id -> d.pixels).toMap
    small.foreach { s =>
      assert(s.pixels.toSet.subsetOf(src(s.media_id).toSet)) }
  }

  test("frame sampling explodes every Nth frame per video") {
    import spark.implicits._
    val frames = sampleFrames(fixture(spark, 9), everyN = 2)
    val perVideo = frames.groupByKey(_.media_id).count().collect().toMap
    assert(perVideo.nonEmpty)
    assert(perVideo.values.forall(_ == 4), s"8 frames step 2 -> 4: $perVideo")
    val idxs = frames.collect().map(_.frame_idx).distinct.sorted.toSeq
    assert(idxs == Seq(0, 2, 4, 6))
  }

  test("feature extraction emits one stat row per image") {
    val feats = imageFeatures(decodeImages(fixture(spark, 9))).collect()
    assert(feats.length == 3, "ids 0,3,6 are images")
    feats.foreach { r =>
      val mean = r.getAs[Float]("px_mean")
      assert(mean > 0f && mean < 1f)
      assert(r.getAs[Float]("edge_energy") > 0f)
    }
  }
}
