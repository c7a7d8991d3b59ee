package graft.etl

/** Spark local-scratch placement for the engine's driver sessions.
  *
  * `spark.local.dir` is where Spark puts shuffle map outputs, DISK_ONLY /
  * _SER block files, and sort/aggregate spills. Left unset it resolves to
  * java.io.tmpdir, which on this host is disk-backed — the same tiny-
  * synchronous-file-ops tax the streaming state store and StageStore
  * already measured and moved off (NOTES: state stores 8→4 partitions +
  * tmpfs checkpoint cut the micro-batch floor; StageStore stages to
  * /dev/shm). On a production cluster this setting points at executor-
  * local NVMe; tmpfs is the local-mode stand-in with the same role, and
  * the memory-pressure story is unchanged (tmpfs pages are reclaimable
  * file cache, sized far below the 126 GiB mount for fixture-scale
  * shuffles).
  *
  * `SPARK_GRAFT_NO_SHM_LOCAL=1` opts out (A/B adjudication aid, same
  * convention as SPARK_GRAFT_NO_STAGE).
  */
object ScratchDirs {
  /** tmpfs-backed spark.local.dir, when /dev/shm is usable. */
  def sparkLocalDir: Option[String] =
    if (sys.env.get("SPARK_GRAFT_NO_SHM_LOCAL").contains("1")) None
    else {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft_spark_local")
        d.mkdirs()
        Some(d.getAbsolutePath)
      } else None
    }

  /** Apply to a session builder (must run before the SparkContext exists —
    * spark.local.dir is read once at DiskBlockManager init). */
  def withLocalDir(
      b: org.apache.spark.sql.SparkSession.Builder): org.apache.spark.sql.SparkSession.Builder =
    sparkLocalDir.fold(b)(d => b.config("spark.local.dir", d))
}
