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
    * tests). `deleteOnExit` backstops the caller's task-completion-listener
    * cleanup in case the JVM dies mid-task.
    */
  def create(prefix: String): File = {
    val f = Option(SparkEnv.get) match {
      case Some(env) => env.blockManager.diskBlockManager.createTempLocalBlock()._2
      case None => File.createTempFile(prefix, ".bin")
    }
    f.deleteOnExit()
    f
  }
}
