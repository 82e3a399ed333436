package graft.search

import graft.{SparkSpec, Tables}
import graft.queries.SimhashOps
import org.apache.spark.sql.DataFrame

/** The incremental simhash census's correctness contract (VERDICT r16
  * item 8): build on a prefix of the corpus, append the rest in shards,
  * and the FOLDED census must equal the batch `simhash_dedup_stats`
  * census over the whole corpus — same rows, same counts, same minima.
  * Also pins that physical compaction of the delta log changes nothing,
  * and that the Curation telemetry row reads the same numbers. */
class SimhashCensusSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def batchCensus(docs: DataFrame): DataFrame = {
    val bands = SimhashOps.explodeBands(SimhashOps.signatures(docs)).cache()
    try SimhashOps.censusOf(
      SimhashOps.pairsBetween(bands, bands, self = true)).cache()
    finally bands.unpersist()
  }

  private def rows(df: DataFrame): Seq[String] =
    df.orderBy("doc_id").collect().map(_.toString).toSeq

  test("build + two appends == batch census over the union") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, SfDir).select($"doc_id", $"text").cache()
    val total = docs.count()
    assert(total > 100, s"fixture too small: $total docs")
    // three disjoint slices by doc_id order — an ingest's arrival shards
    val ids = docs.select($"doc_id").orderBy($"doc_id")
      .collect().map(_.getLong(0))
    val (cut1, cut2) = (ids(ids.length / 2), ids(3 * ids.length / 4))
    val base = docs.filter($"doc_id" <= cut1)
    val shard1 = docs.filter($"doc_id" > cut1 && $"doc_id" <= cut2)
    val shard2 = docs.filter($"doc_id" > cut2)

    val path = java.nio.file.Files.createTempDirectory("shcensus").toString
    SimhashCensusIndex.build(base, path)
    // after build: census == batch census of the base slice
    assert(rows(SimhashCensusIndex.census(s, path)) == rows(batchCensus(base)),
      "post-build census != batch census of the base slice")

    SimhashCensusIndex.append(shard1, path)
    SimhashCensusIndex.append(shard2, path)
    val expected = batchCensus(docs)
    assert(rows(SimhashCensusIndex.census(s, path)) == rows(expected),
      "incremental census != batch census after two appends")
    // the corpus actually HAS near-dups at this SF or the test is vacuous
    assert(expected.count() > 0, "fixture produced an empty census")

    // physical delta-log fold: same census, fewer files
    val st = SimhashCensusIndex.compact(s, path, targetBytes = 4L << 20)
    assert(rows(SimhashCensusIndex.census(s, path)) == rows(expected),
      "compaction changed the census")
    assert(st.filesAfter <= st.filesBefore)

    // Curation telemetry row reads the same folded numbers
    val (_, report) = graft.api.Curation.curateWithReport(
      Tables.documents(s, SfDir).limit(50),
      cfg = graft.api.Curation.Config(
        dedupNear = false, scrubPii = false, sampleRates = None,
        simhashCensusPath = Some(path)))
    val tele = report.find(_.stage == "simhash_census")
    assert(tele.nonEmpty, s"no census telemetry row in: $report")
    assert(tele.get.capExcluded("near_dup_docs") == expected.count(),
      s"telemetry near_dup_docs != census rows: ${tele.get}")
    docs.unpersist()
  }
}
