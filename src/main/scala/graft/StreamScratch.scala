package graft

/** Scratch location for EPHEMERAL streaming-drain checkpoints.
  *
  * Every drained replay in the engine (StreamToolOps.drain, the
  * streaming file sink, the MV fold loop) creates a checkpoint, runs a
  * bounded drain to completion, and deletes the checkpoint — the
  * checkpoint is scaffolding of the drain protocol, never resumed from,
  * so it has NO durability requirement. Spark's default temp checkpoint
  * lands under java.io.tmpdir, which on this box is disk-backed: every
  * trigger then pays offset-log + commit-log + per-partition state-store
  * delta creates/fsyncs against disk (guide §6 — I/O placement; §7.3 —
  * these are driver/commit constants, not data cost). Pointing the
  * drain checkpoints at a RAM-backed filesystem removes that I/O
  * without touching trigger/watermark semantics or any drained row.
  *
  * A LIVE deployment resumes from its checkpoint across restarts, so it
  * passes a DURABLE path — that is what `SPARK_GRAFT_STREAM_CK_DIR`
  * parameterizes (set it to the durable checkpoint root; the engine
  * only picks /dev/shm when the knob is unset and the tmpfs exists).
  * The knob scales: at 100 TB the drain queries' checkpoints are still
  * ephemeral per drain, while long-lived production streams do not go
  * through `drain` at all — they own their checkpointLocation.
  */
object StreamScratch {

  private lazy val base: String =
    sys.env.get("SPARK_GRAFT_STREAM_CK_DIR").getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) shm.getPath
      else System.getProperty("java.io.tmpdir")
    }

  /** A fresh, unique checkpoint dir for one drain. `tag` is the drain's
    * unique query name (callers already suffix with nanoTime); the pid
    * keeps concurrent JVMs (sbt test forks, bench + dev loop) apart.
    */
  def checkpointDir(tag: String): String =
    new java.io.File(base,
      s"graft_ck_${ProcessHandle.current().pid()}_$tag").getPath

  /** Delete a drain checkpoint after the query stopped (RAM hygiene —
    * tmpfs holds pages until deleted).
    */
  def cleanup(dir: String): Unit =
    graft.etl.Directory.deleteRecursively(new java.io.File(dir))
}
