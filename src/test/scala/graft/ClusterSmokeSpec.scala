package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI gate for [[ClusterSmoke]]: the smoke needs its OWN SparkSession on
  * `local-cluster[2,8,4096]`, which cannot coexist with the suite-shared
  * local[4] context in this JVM — so it runs as a subprocess via
  * `tools/cluster_smoke.sh` (same classes dir this test JVM compiled
  * from) and the spec asserts every leg passed. ~1 min of wall time: the
  * price of catching local-mode assumptions (separate executor JVMs,
  * classpath shipping, FS visibility) before they hide until deploy. */
class ClusterSmokeSpec extends AnyFunSuite {

  test("the representative surface is green on a two-worker cluster") {
    val pb = new ProcessBuilder("bash", "tools/cluster_smoke.sh")
    pb.redirectErrorStream(true)
    val p = pb.start()
    // drain stdout on a daemon thread: a blocking readAllBytes() before
    // waitFor would make the 10-minute timeout unreachable (the pipe
    // only EOFs when the child — or a worker JVM holding it — exits)
    val buf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => {
      try p.getInputStream.transferTo(buf)
      catch { case _: Throwable => () }
    })
    drain.setDaemon(true)
    drain.start()
    val finished = p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) p.destroyForcibly()
    drain.join(5000)
    val out = buf.toString("UTF-8")
    val legs = out.linesIterator.filter(_.startsWith("{\"leg\"")).toSeq
    assert(finished, "cluster smoke timed out after 10 minutes")
    assert(p.exitValue() == 0,
      s"cluster smoke failed (exit ${p.exitValue()}):\n" +
        out.linesIterator.filter(l => l.startsWith("{") || l.contains("FAILED"))
          .mkString("\n"))
    assert(out.contains("""{"cluster_smoke":"ok"}"""), legs.mkString("\n"))
    assert(legs.count(_.contains("\"pass\":1")) >= 11,
      s"expected >=11 passing legs:\n${legs.mkString("\n")}")
  }
}
