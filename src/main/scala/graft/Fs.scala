package graft

import java.nio.file.{Files, Path}

/** Filesystem helpers shared by operators, gates, and specs.
  *
  * Every java.nio directory-stream API (`Files.walk` / `Files.list`)
  * returns a `Stream` holding an OPEN directory descriptor that is
  * reclaimed only at GC if not closed. The long-lived bench JVM runs
  * the streaming gates (d12/s17/p6) several reps each, every rep
  * spooling and deleting scratch dirs — so each use must close its
  * stream deterministically. One helper per access pattern keeps the
  * close discipline in one place.
  */
object Fs {

  /** Best-effort recursive delete of a scratch tree (deepest-first).
    * Individual delete failures are swallowed: callers clean temp
    * dirs whose partial survival is harmless, and a cleanup that
    * throws would mask the real result of the work it follows.
    */
  def deleteRecursively(root: Path): Unit =
    try {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => try Files.delete(p) catch { case _: Throwable => () })
      finally s.close()
    } catch { case _: Throwable => () }

  /** Immediate children of a directory, stream closed on return. */
  def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      val b = Seq.newBuilder[Path]
      while (it.hasNext) b += it.next()
      b.result()
    } finally s.close()
  }

  /** Recursive copy of a directory tree. The destination (and any
    * missing parents) is created; existing destination FILES are an
    * error — callers copy into fresh scratch dirs. Stream closed.
    */
  def copyRecursively(from: Path, to: Path): Unit = {
    val s = Files.walk(from)
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val p = it.next()
        val dst = to.resolve(from.relativize(p).toString)
        if (Files.isDirectory(p)) { Files.createDirectories(dst); () }
        else {
          Files.createDirectories(dst.getParent)
          Files.copy(p, dst)
          ()
        }
      }
    } finally s.close()
  }

  /** The whole tree under `root` (root included), stream closed. */
  def walkSeq(root: Path): Seq[Path] = {
    val s = Files.walk(root)
    try {
      val it = s.iterator()
      val b = Seq.newBuilder[Path]
      while (it.hasNext) b += it.next()
      b.result()
    } finally s.close()
  }
}
