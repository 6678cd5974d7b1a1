package graft.pipeline

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import java.nio.file.{Files, Paths}

/** Task-local carved-payload store: appends the streamed carve bytes to
  * `root/relPath` (the reference writes carved files as its primary
  * output; at cluster scale `root` is a shared/object store mount).
  * Handlers stream one file at a time per task, so a single open stream
  * with path-change rollover suffices; re-carves of the same path (task
  * retries, duplicate hits) truncate and rewrite — idempotent because
  * names are deterministic functions of the byte range.
  */
final class PayloadWriter(root: String) {
  private var currentPath: String = _
  private var out: OutputStream = _

  def sink(relPath: String, bytes: Array[Byte], len: Int): Unit = {
    if (relPath != currentPath) {
      close()
      val full = Paths.get(root, relPath)
      Files.createDirectories(full.getParent)
      out = new BufferedOutputStream(new FileOutputStream(full.toFile, false))
      currentPath = relPath
    }
    out.write(bytes, 0, len)
    // no per-write flush: the buffered stream batches carve blocks, and
    // rollover/close (incl. the pipeline's task-completion close) flush
    // the tail — a flush per block was a syscall per carve write
  }

  def close(): Unit = {
    if (out != null) { out.close(); out = null; currentPath = null }
  }
}
