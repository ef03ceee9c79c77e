package graft

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cheap source fingerprinting for derived artifacts.
  *
  * Every build-once artifact in this codebase — the bucketed layouts,
  * the IVF index, Incremental's maintained table, Txn's demo log, and
  * the per-session persisted DataFrames (signatures, dev subtree, CC
  * labels) — is a materialization of a source dataset AS OF build time.
  * If the data under the source path is regenerated, a path-keyed
  * artifact silently serves stale results. The fix is to key every
  * artifact on a fingerprint of the source's file listing
  * (name + length + mtime per data file — one `getFileStatus`/
  * `listStatus` call, no data read):
  *
  *  - on-disk artifacts carry a `_source_stamp` marker (underscore
  *    prefix → invisible to Spark's file-listing scans); the ensure*
  *    entry point rebuilds when the marker is absent or differs —
  *    the marker is written AFTER a successful build, so a crashed
  *    build self-heals into a rebuild;
  *  - in-memory caches include the stamp in their key, and
  *    [[evictStale]] unpersists superseded entries so a regenerate
  *    inside one session cannot leak executor memory.
  *
  * At 100 TB the stamp call is one object-store LIST per ensure — noise
  * against any real query — and the semantics match what production
  * formats get from snapshot ids: artifact validity is decided by the
  * source's version, not by "did someone remember to clear caches".
  */
object SourceStamp {

  /** Fingerprint of one or more source paths (files or directories):
    * sorted `name:len:mtime` of each data file. */
  def stamp(s: SparkSession, paths: Seq[String]): String = {
    val lines = paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) Seq(s"$p:absent")
      else {
        val st = fs.getFileStatus(path)
        if (st.isFile) Seq(s"${path.getName}:${st.getLen}:${st.getModificationTime}")
        else fs.listStatus(path).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      }
    }
    lines.sorted.mkString("\n")
  }

  /** Stamp of one testdata table of `sfDir`. */
  def table(s: SparkSession, sfDir: String, name: String): String =
    stamp(s, Seq(s"${sfDir.stripSuffix("/")}/$name.parquet"))

  private def marker(artifactDir: String): Path =
    new Path(s"${artifactDir.stripSuffix("/")}/_source_stamp")

  /** True iff `artifactDir` carries a marker equal to `st`. */
  def isCurrent(s: SparkSession, artifactDir: String, st: String): Boolean = {
    val m = marker(artifactDir)
    val fs = m.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.exists(m) && {
      val in = fs.open(m)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        new String(out.toByteArray, StandardCharsets.UTF_8) == st
      } finally in.close()
    }
  }

  /** The marker's recorded stamp, if any — for incremental maintainers
    * that DIFF the recorded listing against the current one (the stamp
    * is the sorted per-file listing, so set-difference of its lines IS
    * the file-level delta). */
  def recorded(s: SparkSession, artifactDir: String): Option[String] = {
    val m = marker(artifactDir)
    val fs = m.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        Some(new String(out.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Record `st` as `artifactDir`'s source version (call AFTER a
    * successful build). */
  def write(s: SparkSession, artifactDir: String, st: String): Unit = {
    val m = marker(artifactDir)
    val fs = m.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(m, true)
    try out.write(st.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Drop (and unpersist) cache entries for the same (session, dir)
    * under a DIFFERENT source stamp — a regenerate inside one session
    * must not leak the superseded persisted artifact. */
  def evictStale[V](
      map: java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), V],
      s: SparkSession, dir: String, st: String)(unpersist: V => Unit): Unit = {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val (ks, kd, kst) = e.getKey
      if (ks == s && kd == dir && kst != st) { unpersist(e.getValue); it.remove() }
    }
  }
}
