package graft.ingest

import java.nio.file.{FileAlreadyExistsException, Files, Path, StandardCopyOption}

/** Atomic build-once fixture directories.
  *
  * The previous pattern — create the target dir, write files into it,
  * treat one of them as the done-sentinel — races: the sentinel can
  * exist while other files are missing or half-written (sbt runs
  * suites concurrently, and a crashed builder leaves a poisoned dir).
  * Here the DIRECTORY is the sentinel: `build` fills a temp sibling,
  * which is atomically renamed into place. A reader either sees no
  * dir (and builds) or a complete one; a concurrent builder loses the
  * rename and discards its temp copy.
  */
object FixtureDir {

  /** Return `out` ensuring it holds a complete fixture, building via
    * `build(tmp)` if absent. `out`'s existence IS completeness. */
  def ensure(out: Path)(build: Path => Unit): String = {
    if (Files.exists(out)) return out.toString
    Files.createDirectories(out.getParent)
    val tmp = Files.createTempDirectory(out.getParent, out.getFileName.toString + ".tmp")
    try {
      build(tmp)
      // same filesystem → rename(2); fails if a concurrent builder won
      Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case _: FileAlreadyExistsException | _: java.nio.file.DirectoryNotEmptyException =>
        deleteRec(tmp) // lost the race: a complete fixture is in place
      case e: Throwable =>
        deleteRec(tmp) // never leave a half-written dir behind
        throw e
    }
    out.toString
  }

  private def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRec(c)) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
