package graft.ingest

import java.nio.file.{Files, Path, Paths}

/** Invalidation tokens for the write-once artifact lifecycle
  * (`target/graft_*`): an artifact's subdir name embeds a fingerprint
  * of (a) the source table files it derives from — file name, size,
  * mtime of every parquet part — and (b) an algorithm signature (the
  * constants whose change invalidates the artifact). A changed
  * corpus, a regenerated testdata dir sharing a basename, or a
  * parameter bump then lands on a FRESH subdir and rebuilds, instead
  * of silently serving stale derived data until someone remembers to
  * delete the cache dir. Superseded tokens' subdirs become inert
  * files under target/ (cleaned with the normal target wipe) — cheap
  * insurance against wrong-but-plausible results.
  */
object ArtifactCache {

  /** PER-PATH build serialization for the write-once artifacts: the
    * bare check-then-write in each `ensure*` let two concurrent
    * first callers (parallel specs sharing one session) both miss
    * `_SUCCESS` and run overlapping overwrite writes to the same
    * path — and a reader could observe a half-overwritten dir. Same
    * class of shared-state race Staging.scopeLock serializes;
    * double-checked so the post-build fast path never contends.
    * The lock is keyed by artifact path (r9 advisory): only
    * same-path builders serialize — concurrent first builds of
    * UNRELATED artifacts (corpus index vs co-edges) proceed in
    * parallel instead of queueing behind one JVM-wide lock held
    * across multi-second Spark jobs. Entries are one lock object
    * per distinct artifact path per JVM — bounded by the artifact
    * roster, never evicted (eviction would reopen the race). */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.locks.ReentrantLock]()

  /** Run `build` (which must end by writing `path` with a _SUCCESS
    * marker) unless the artifact already exists; concurrent callers
    * of the SAME path serialize and the losers see the winner's
    * completed build. */
  def ensure(path: String)(build: => Unit): String = {
    def done = new java.io.File(s"$path/_SUCCESS").exists()
    if (!done) {
      // key by the NORMALIZED absolute path (r10 advisory): two
      // callers naming the same artifact through non-identical
      // strings (trailing slash, relative vs absolute, a ./ segment)
      // must land on the SAME lock, or the concurrent-overwrite race
      // this serializes reopens between them
      val key = Paths.get(path).toAbsolutePath.normalize.toString
      val lock = buildLocks.computeIfAbsent(key,
        _ => new java.util.concurrent.locks.ReentrantLock())
      lock.lock()
      try if (!done) build
      finally lock.unlock()
    }
    path
  }

  /** 12-hex-char fingerprint of `dir`'s named source tables plus the
    * algorithm `signature`. Tables may be single parquet files or
    * directories of part files; a missing table contributes nothing
    * (the build itself will fail loudly on a truly absent source). */
  def token(dir: String, tables: Seq[String], signature: String): String = {
    val parts = tables.sorted.flatMap { t =>
      val root = Paths.get(dir, s"$t.parquet")
      val files: Seq[Path] =
        if (Files.isDirectory(root)) {
          val s = Files.walk(root)
          try s.filter(p => Files.isRegularFile(p)).sorted()
            .toArray.toSeq.map(_.asInstanceOf[Path])
          finally s.close()
        } else if (Files.exists(root)) Seq(root)
        else Seq.empty
      files.map(p => s"$t:${p.getFileName}:${Files.size(p)}:" +
        s"${Files.getLastModifiedTime(p).toMillis}")
    }
    val basis = (parts :+ s"sig=$signature").mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(basis.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.take(12)
  }
}
