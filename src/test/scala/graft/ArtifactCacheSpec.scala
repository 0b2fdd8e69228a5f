package graft

import org.scalatest.funsuite.AnyFunSuite

/** The artifact-cache invalidation token: any change to the source
  * files (size, mtime, file set) or the algorithm signature must land
  * derived artifacts on a fresh subdir — the guard against silently
  * serving stale cluster labels / BPE encodings / LSH indexes. */
class ArtifactCacheSpec extends AnyFunSuite {
  test("token: stable for identical inputs, distinct across signature/file changes") {
    val dir = java.nio.file.Files.createTempDirectory("artifact_cache")
      .toFile.getAbsolutePath
    val f = java.nio.file.Paths.get(dir, "documents.parquet")
    java.nio.file.Files.writeString(f, "AAAA")
    val t1 = ingest.ArtifactCache.token(dir, Seq("documents"), "sig1")
    assert(t1 == ingest.ArtifactCache.token(dir, Seq("documents"), "sig1"))
    assert(t1.length == 12 && t1.forall("0123456789abcdef".contains(_)))
    assert(t1 != ingest.ArtifactCache.token(dir, Seq("documents"), "sig2"),
      "signature change must invalidate")
    java.nio.file.Files.writeString(f, "BBBBBBBB")
    val t2 = ingest.ArtifactCache.token(dir, Seq("documents"), "sig1")
    assert(t2 != t1, "source size change must invalidate")
    java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(1234567890123L))
    assert(ingest.ArtifactCache.token(dir, Seq("documents"), "sig1") != t2,
      "source mtime change must invalidate (same-size regeneration)")
    // a directory-of-parts table fingerprints every part file
    val d = java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(dir, "embeddings.parquet"))
    java.nio.file.Files.writeString(d.resolve("part-0.parquet"), "X")
    val t3 = ingest.ArtifactCache.token(dir, Seq("embeddings"), "s")
    java.nio.file.Files.writeString(d.resolve("part-1.parquet"), "Y")
    assert(ingest.ArtifactCache.token(dir, Seq("embeddings"), "s") != t3,
      "added part file must invalidate")
  }

  test("artifact paths embed the token: distinct dirs sharing a basename never collide") {
    // two differently-rooted "sfX" dirs with different corpora must
    // resolve to DIFFERENT artifact subdirs — the exact stale-cache
    // hazard the token closes
    def mk(content: String): String = {
      val root = java.nio.file.Files.createTempDirectory("abc")
      val sub = java.nio.file.Files.createDirectory(root.resolve("sfX"))
      java.nio.file.Files.writeString(sub.resolve("documents.parquet"), content)
      sub.toString
    }
    val (a, b) = (mk("corpus one"), mk("corpus two!"))
    assert(operators.Dedup.clusterLabelsPath(a) != operators.Dedup.clusterLabelsPath(b))
    assert(operators.Dedup.corpusIndexPath(a) != operators.Dedup.corpusIndexPath(b))
    assert(operators.CorpusClean.bpeTokensPath(a) != operators.CorpusClean.bpeTokensPath(b))
    assert(operators.Dedup.pairStatsPath(a) != operators.Dedup.pairStatsPath(b))
    assert(operators.Dedup.minhashSigPath(a) != operators.Dedup.minhashSigPath(b))
    // knn_topk keys on embeddings, not documents — same-basename roots
    // with NO embeddings table still must not collide on basename alone
    assert(operators.Ann.knnTopkPath(a).contains("sfX_"))
  }
}
