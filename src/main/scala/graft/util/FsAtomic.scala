package graft.util

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path,
  UnsupportedFileSystemException}

/** Atomic small-file pointer writes, shared by the standing stores
  * ([[graft.crawl.FrontierStore]] `_LATEST`,
  * [[graft.operators.SignatureIndexStore]] `_COMPACT`,
  * [[graft.operators.AnnIndexStore]] `_CURRENT`,
  * [[graft.operators.LabelStore]] `_COMPACT`).
  *
  * `FileSystem.create(path, overwrite = true)` over a LIVE pointer is not
  * atomic on HDFS or most object stores: a concurrent reader can observe a
  * truncated or empty file mid-write and resolve no generation at all.
  * The bytes go to a sibling temp file first, then a RENAME-WITH-OVERWRITE
  * (`FileContext.rename(…, Options.Rename.OVERWRITE)`) replaces the live
  * pointer — atomic on HDFS (same-directory rename), so a reader sees
  * either the old complete file or the new complete file, never a partial
  * write and never ABSENCE (a delete-then-rename pair would expose a
  * window where the pointer does not exist at all, which readers would
  * misread as "no store state").
  */
object FsAtomic {

  /** Write `value` to `dir/name` via temp-file + overwrite-rename. The
    * temp name is deterministic (`.name.tmp`): stores are single-writer
    * by protocol, so a stale temp from a crashed attempt is simply
    * overwritten. The DOT prefix keeps the temp out of readers'
    * `startsWith("_commit_")`-style marker scans (and out of parquet
    * directory listings).
    */
  def writePointer(f: FileSystem, dir: Path, name: String, value: String): Unit = {
    val tmp = new Path(dir, "." + name + ".tmp")
    val dst = new Path(dir, name)
    val out = f.create(tmp, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    try {
      val fc = FileContext.getFileContext(f.getUri, f.getConf)
      fc.rename(tmp, dst, Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedFileSystemException =>
        // no AbstractFileSystem binding for this scheme: fall back to
        // delete+rename. Non-atomic (a reader can observe the pointer
        // absent for an instant) — but a scheme without a FileContext
        // binding has no atomic-rename contract to lose either.
        if (f.exists(dst)) f.delete(dst, false)
        if (!f.rename(tmp, dst))
          throw new java.io.IOException(s"pointer flip failed: $tmp -> $dst")
    }
  }
}
