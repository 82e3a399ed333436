package graft.control

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** C6 — eval-case generation: every operator patch writes a regression
  * case asserting the patched hash is no longer flagged.
  *
  * Reference (`/root/reference/app/services/control_service.py:37-58`)
  * writes YAML `{rhythm_hash, context_logs, expected_outcome:
  * {is_anomaly: false}}` to `evals/` but ships no runner; the engine
  * implements both the writer and the replay (EvalRunner in tests —
  * SURVEY §5).
  */
final class Evals(dir: String) {

  Files.createDirectories(Paths.get(dir))

  case class EvalCase(rhythmHash: String, contextLogs: Seq[String],
      expectedAnomaly: Boolean)

  /** Write one case as a minimal YAML document (same shape as the
    * reference's `eval_case_*.yaml`). */
  def write(hash: String, contextLogs: Seq[String]): Path = {
    val body = new StringBuilder()
    body.append(s"rhythm_hash: \"$hash\"\n")
    body.append("context_logs:\n")
    contextLogs.foreach(l =>
      body.append(s"""  - "${l.replace("\\", "\\\\").replace("\"", "\\\"")}"\n"""))
    body.append("expected_outcome:\n  is_anomaly: false\n")
    val p = Paths.get(dir, s"eval_case_${hash.replace(":", "_")}.yaml")
    Files.writeString(p, body.toString)
    p
  }

  /** Minimal reader for the cases this writer produces. */
  def readAll(): Seq[EvalCase] = {
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".yaml")).toSeq.sortBy(_.toString)
    files.map { p =>
      val lines = Files.readAllLines(p).asScala.toSeq
      val hash = lines.find(_.startsWith("rhythm_hash:"))
        .map(_.split(":", 2)(1).trim.stripPrefix("\"").stripSuffix("\"")).getOrElse("")
      val logs = lines.filter(_.startsWith("  - "))
        .map(_.drop(4).stripPrefix("\"").stripSuffix("\"")
          .replace("\\\"", "\"").replace("\\\\", "\\"))
      val expected = lines.exists(_.contains("is_anomaly: true"))
      EvalCase(hash, logs, expected)
    }
  }
}
