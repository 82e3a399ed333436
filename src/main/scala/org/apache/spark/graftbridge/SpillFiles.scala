package org.apache.spark.graftbridge

import java.io.File

import org.apache.spark.SparkEnv

/** Bridge into Spark's executor-local disk management ([[org.apache.spark.storage.DiskBlockManager]]
  * is `private[spark]`): operator spill files belong under the configured
  * `spark.local.dir` scratch disks, not `java.io.tmpdir` — on real executors
  * `/tmp` is often a small tmpfs that fills exactly when a spill triggers,
  * and files written there escape Spark's local-dir cleanup.
  */
object SpillFiles {

  /** A fresh temp file under the executor's configured local dirs (via
    * `DiskBlockManager.createTempLocalBlock`), falling back to
    * `java.io.tmpdir` only when no `SparkEnv` exists (plain-JVM unit
    * tests). No `deleteOnExit` on the Spark path: each call would add one
    * immutable entry to the JVM-global DeleteOnExitHook set — unbounded
    * growth on a long-lived executor that spills many runs — and the
    * caller's task-completion listener plus DiskBlockManager's own
    * shutdown cleanup of `spark.local.dir` already cover crash exits.
    * Only the plain-JVM fallback (bounded unit-test use) keeps it.
    */
  def create(prefix: String): File = Option(SparkEnv.get) match {
    case Some(env) => env.blockManager.diskBlockManager.createTempLocalBlock()._2
    case None =>
      val f = File.createTempFile(prefix, ".bin")
      f.deleteOnExit()
      f
  }
}
