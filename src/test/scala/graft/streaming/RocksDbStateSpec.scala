package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** SCALE.md's streaming-state section prescribes the RocksDB state store
  * once per-hash state exceeds heap ("spark.sql.streaming.stateStore
  * .providerClass RocksDB for StatefulDetector at scale") — this spec
  * proves the detector actually RUNS on RocksDB and emits byte-identical
  * anomalies vs the default HDFS-backed provider, so the knob is a
  * config flip, not a migration project. */
class RocksDbStateSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def runDetector(): Seq[String] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L
    val th = StatefulDetector.Thresholds(
      noveltyMinCount = 2, freqMinCount = 2, freqSigma = 1.0, stdFloor = 0.5)
    val events: Seq[(String, Long)] =
      Seq.tabulate(3)(i => ("h1", base + i)) ++
        Seq.tabulate(8)(i => ("h1", base + 120 + i)) ++
        Seq.tabulate(4)(i => ("h2", base + 60 + i * 10))
    val input = MemoryStream[(String, Long)]
    val sink = new scala.collection.mutable.ArrayBuffer[String]()
    val q = StatefulDetector.detect(
      input.toDF().toDF("rhythm_hash", "ts_sec"), 60L,
      watermarkDelay = "10 seconds", thresholds = th, stateTtlMs = None).toDF()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        sink.synchronized { sink ++= b.collect().map(_.toString) }; ()
      }
      .start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData(("sentinel", base + 4000)) // watermark: closes windows
      q.processAllAvailable()
    } finally q.stop()
    sink.toSeq.sorted
  }

  test("StatefulDetector on RocksDB == default provider, non-empty") {
    val saved = spark.conf.getOption(ProviderKey)
    val default = runDetector()
    assert(default.nonEmpty, "detector must emit anomalies on the fixture")
    try {
      spark.conf.set(ProviderKey, RocksDb)
      val rocks = runDetector()
      assert(rocks == default,
        s"provider changed results:\nrocksdb=$rocks\ndefault=$default")
    } finally {
      saved.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
    }
  }
}
