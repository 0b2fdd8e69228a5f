package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.stream.{Stream => JStream}

import org.apache.spark.sql.DataFrame

/** Shared file-staging for the file-source streaming operators: write
  * a wave of rows as parquet into a sibling temp dir, then ATOMIC_MOVE
  * the part-files into the watched dir — the file-stream source must
  * only ever list whole files, and a rename on the same filesystem is
  * the one atomic publish the local file source offers (the same
  * contract a production file-drop ingest relies on).
  *
  * Every `Files.list` is closed (it holds a directory fd open until
  * then); the streaming operators call this per wave, so a leaked
  * stream per call would otherwise accumulate across a bench run.
  */
object Staging {

  private def listing[A](dir: Path)(f: JStream[Path] => A): A = {
    val s = Files.list(dir)
    try f(s) finally s.close()
  }

  /** Stage `df` into `watchDir` as `<wave>_<i>.parquet` files. */
  def stage(df: DataFrame, watchDir: String, wave: String): Unit = {
    val tmp = Files.createTempDirectory(Paths.get(watchDir).getParent, s"stage_$wave")
    df.coalesce(2).write.mode("overwrite").parquet(tmp.toString)
    var i = 0
    listing(tmp)(_.filter(p => p.getFileName.toString.endsWith(".parquet"))
      .forEach { p =>
        Files.move(p, Paths.get(watchDir, s"${wave}_$i.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
        i += 1
      })
    // scrub the leftovers (_SUCCESS, crc files)
    listing(tmp)(_.forEach(p => Files.deleteIfExists(p): Unit))
    Files.deleteIfExists(tmp)
  }

  /** Delete a staging dir's remaining files and the dir itself. */
  def clearDir(dir: Path): Unit = {
    listing(dir)(_.forEach(p => Files.deleteIfExists(p): Unit))
    Files.deleteIfExists(dir)
  }
}
