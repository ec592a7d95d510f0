package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic small-file pointer writes, shared by the three standing stores
  * ([[graft.crawl.FrontierStore]] `_LATEST`,
  * [[graft.operators.SignatureIndexStore]] `_COMPACT`,
  * [[graft.operators.AnnIndexStore]] `_CURRENT`).
  *
  * `FileSystem.create(path, overwrite = true)` over a LIVE pointer is not
  * atomic on HDFS or most object stores: a concurrent reader can observe a
  * truncated or empty file mid-write and resolve no generation at all.
  * Writing the bytes to a sibling temp file and renaming over the pointer
  * is atomic on HDFS (same-directory rename); filesystems without atomic
  * rename still only ever expose a COMPLETE file under either name.
  */
object FsAtomic {

  /** Write `value` to `dir/name` via temp-file + rename. The temp name is
    * deterministic (`.name.tmp`): stores are single-writer by protocol, so
    * a stale temp from a crashed attempt is simply overwritten. The DOT
    * prefix keeps the temp out of readers' `startsWith("_commit_")`-style
    * marker scans (and out of parquet directory listings).
    */
  def writePointer(f: FileSystem, dir: Path, name: String, value: String): Unit = {
    val tmp = new Path(dir, "." + name + ".tmp")
    val dst = new Path(dir, name)
    val out = f.create(tmp, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    if (f.exists(dst)) f.delete(dst, false)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"pointer flip failed: $tmp -> $dst")
  }
}
