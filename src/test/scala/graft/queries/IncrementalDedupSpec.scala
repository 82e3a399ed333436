package graft.queries

import graft.{SparkSpec, Tables}

/** `dedup_incremental` cross-checks on sf0.001: the exact flag against an
  * independent plain-Scala md5 fingerprint walk, and the near flag
  * against the full-corpus LSH PAIR join (a different plan — pair
  * formation — than the incremental band probe under test). */
class IncrementalDedupSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def md5fp(text: String): String = {
    val norm = text.toLowerCase.replaceAll("[^a-z0-9]", "")
    java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("incremental flags match an independent exact walk and the pair join") {
    import spark.implicits._
    val docs = Tables.documents(spark, SfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val existingFps = docs.filter(_._1 % TextOps.IncrMod != 0)
      .map(d => md5fp(d._2)).toSet
    val incoming = docs.filter(_._1 % TextOps.IncrMod == 0)

    // expected near flags: incoming docs with >=1 LSH pair whose partner
    // is on the existing side — derived from the PAIR formation plan
    val buckets = TextOps.minhashBuckets(
      Tables.documents(spark, SfDir).selectExpr("doc_id", "text"))
    val pairs = TextOps.pairsFromBuckets(buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    buckets.unpersist()
    val nearIds = pairs.flatMap { case (a, b) =>
      Seq((a, b), (b, a)).collect {
        case (i, e) if i % TextOps.IncrMod == 0 && e % TextOps.IncrMod != 0 => i
      }
    }.toSet

    val got = Registry.all.find(_.name == "dedup_incremental").get
      .fn(spark, SfDir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(got.size == incoming.length, "one verdict row per incoming doc")
    incoming.foreach { case (id, text) =>
      assert(got(id)._1 == existingFps.contains(md5fp(text)),
        s"doc $id exact flag")
      assert(got(id)._2 == nearIds.contains(id),
        s"doc $id near flag (pair-join cross-check)")
    }
    // the probe is strictly incremental: no incoming-vs-incoming flags
    // (two incoming twins stay unflagged unless an existing doc matches)
    assert(incoming.nonEmpty && got.values.exists(v => v._1 || v._2),
      "fixture should contain at least one incremental duplicate")
  }
}
