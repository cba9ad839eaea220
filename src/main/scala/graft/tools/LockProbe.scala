package graft.tools

/** Cross-process twin of the reference's `bin/filelockj` / `lockf.c`
  * probe (quebic tests the writer lock across OS PROCESSES, not just
  * threads): attempt the graft writer lock from a second process and
  * report the outcome on stdout + exit code.
  *
  * Deliberately Spark-free — the 1:1 writer contract lives in a plain
  * NIO `FileLock` on `_meta/writer.lock`
  * ([[graft.queue.ParquetQueue]]), so the probe is a bare JVM with
  * this jar on the classpath, cheap enough for a spec to fork.
  *
  * Exit codes: 0 = lock ACQUIRED (no other writer), 3 = lock HELD by
  * another process, anything else = probe failure.
  */
object LockProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: LockProbe <path-to-writer.lock>")
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(args(0)),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock =
      try ch.tryLock()
      catch {
        case _: java.nio.channels.OverlappingFileLockException => null
      }
    if (lock == null) {
      ch.close()
      println("HELD")
      sys.exit(3)
    } else {
      lock.release()
      ch.close()
      println("ACQUIRED")
      sys.exit(0)
    }
  }
}
