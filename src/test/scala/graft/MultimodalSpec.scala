package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("mm_schema: payload bytes survive the binary column round-trip") {
    val total = run("mm_schema").agg(sum("total_bytes")).collect()(0).getLong(0)
    val expected = Tables.documents(spark, sf)
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(total == expected) // ASCII corpus: chars == bytes
    assert(run("mm_schema").count() == 3) // three mime buckets
  }

  test("decodeStub: deterministic, bounded features") {
    val f = Multimodal.decodeStub("Hello!!!".getBytes("UTF-8"))
    assert(f.length == 8)
    assert(f.sameElements(Multimodal.decodeStub("Hello!!!".getBytes("UTF-8"))))
    assert(f.forall(v => v >= 0 && v <= 1))
    assert(math.abs(f(0) - 'H'.toInt / 255.0) < 1e-12)
  }

  test("mm_decode: one row per doc, features present") {
    val out = run("mm_decode")
    assert(out.count() == Tables.documents(spark, sf).count())
    val r = out.orderBy("doc_id").collect()(0)
    assert((0 until 8).forall(i => r.getAs[Double](s"f$i") >= 0))
  }

  test("mm_framesample: strided frames, full frames except possibly last") {
    val rows = run("mm_framesample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % Multimodal.FrameStride == 0)
      assert(r.getAs[Int]("frame_len") <= Multimodal.FrameBytes)
    }
    // every doc contributes its frame 0
    val docsWithFrame0 = rows.count(_.getAs[Int]("frame_idx") == 0)
    assert(docsWithFrame0 == Tables.documents(spark, sf).count())
  }

  test("mm_dedup: per-mime CAS accounting matches a local recount") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def mime(id: Long) = (id % 3) match {
      case 0 => "image/png"; case 1 => "audio/wav"; case _ => "video/mp4"
    }
    val byMime = docs.groupBy { case (id, _) => mime(id) }
    val rows = run("mm_dedup").collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == byMime.keySet)
    byMime.foreach { case (m, ds) =>
      val r = rows(m)
      val groups = ds.groupBy(_._2).values
      assert(r.getAs[Long]("n_payloads") == ds.length.toLong)
      assert(r.getAs[Long]("n_unique") == groups.size.toLong)
      val dupBytes = groups.map(g => (g.length - 1).toLong * g.head._2.length).sum
      assert(r.getAs[Long]("dup_bytes") == dupBytes, s"mime $m")
    }
    // totals: every payload is accounted for exactly once
    assert(rows.values.map(_.getAs[Long]("n_payloads")).sum == docs.length.toLong)
    assert(rows.values.forall(r => r.getAs[Long]("n_unique") <= r.getAs[Long]("n_payloads")))
  }

  test("mm_phash_dedup: recovers exactly the planted perceptual pairs, organic text dups stay out") {
    import graft.operators.Multimodal._
    val got = run("mm_phash_dedup").collect()
    val gotPairs = got.map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib"))).toSet
    val expected = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % PlantMod == PlantRes)
      .map(id => (id, id + PlantOffset)).toSet
    assert(expected.nonEmpty && gotPairs == expected,
      s"got ${gotPairs.size}, planted ${expected.size}; " +
        s"spurious=${(gotPairs -- expected).take(3)} missed=${(expected -- gotPairs).take(3)}")
    got.foreach { r =>
      // in-place perturbation moves few bits; mime rides along from the source
      assert(r.getAs[Long]("hamming") <= PhashRadius)
      val srcMime = (r.getAs[Long]("ia") % 3) match {
        case 0 => "image/png"; case 1 => "audio/wav"; case _ => "video/mp4"
      }
      assert(r.getString(0) == srcMime)
    }
    // the organic TEXT near-dups are alignment-shifted — none may
    // appear as perceptual pairs (background hamming floor is ~16)
    val textPairs = run("ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(textPairs.nonEmpty && gotPairs.intersect(textPairs).isEmpty)
  }

  test("mm_energy_vad: frame energies, planted silence, and islands replay exactly") {
    import graft.operators.Multimodal.VadFrame
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val nf = (t.length + VadFrame - 1) / VadFrame
      val energies = (0 until nf).map { i =>
        if (i % 3 == (id % 3).toInt) 0L
        else t.slice(i * VadFrame, (i + 1) * VadFrame)
          .map(c => (c.toLong - 32) * (c.toLong - 32)).sum
      }
      val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[Long]
      energies.foreach { e =>
        if (e > 0) cur += e
        else { if (cur.nonEmpty) runs += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty }
      }
      if (cur.nonEmpty) runs += cur.toSeq
      id -> (nf.toLong, runs.length.toLong, runs.map(_.length.toLong).sum,
        if (runs.isEmpty) 0L else runs.map(_.length.toLong).max,
        energies.sum)
    }.toMap
    val got = run("mm_energy_vad").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_segments"), r.getAs[Long]("n_active"),
        r.getAs[Long]("max_run"), r.getAs[Long]("total_energy"))).toMap
    assert(got == expected)
    // the planted silence genuinely segments: some doc has >1 segment
    assert(expected.values.exists(_._2 > 1))
  }

  test("mm_patch_embed: per-source patch profile replays a local byte recount") {
    import graft.operators.Multimodal.PatchN
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perPatch = docs.flatMap { case (id, src, text) =>
      val bytes = text.getBytes("UTF-8")
      val len = bytes.length.toLong
      bytes.zipWithIndex.map { case (b, i) =>
        ((id, src, i.toLong * PatchN / len), (b & 0xff).toLong)
      }
    }.groupBy(_._1).view.mapValues { g =>
      g.map(_._2).sum * 1000L / g.size
    }.toMap
    val expected = perPatch.toSeq
      .groupBy { case ((_, src, p), _) => (src, p) }
      .map { case (k, g) =>
        k -> (g.size.toLong, g.map(_._2).sum / g.size) }
    val contrast = perPatch.toSeq
      .groupBy { case ((id, src, _), _) => (id, src) }
      .toSeq.map { case ((_, src), g) =>
        src -> (g.map(_._2).max - g.map(_._2).min) }
      .groupBy(_._1).view.mapValues(g => g.map(_._2).sum / g.size).toMap
    val got = run("mm_patch_embed").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("avg_pm")) == expected(key),
        s"cell $key")
      assert(r.getAs[Long]("contrast_pm") == contrast(key._1), s"source ${key._1}")
    }
  }

  test("mm_blur_detect: Laplacian energy replays per payload; the gate splits the corpus") {
    import org.apache.spark.sql.functions._
    val texts = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = texts.collect { case (id, t) if t.length >= 3 =>
      val cs = t.toCharArray.map(_.toLong)
      val lap = (1 until cs.length - 1)
        .map { i => val d = cs(i - 1) - 2 * cs(i) + cs(i + 1); d * d }.sum
      id -> (lap, lap * 1000L / (cs.length - 2))
    }.toMap
    val got = run("mm_blur_detect").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("lap_q") == expected(id)._1, s"doc $id energy")
      assert(r.getAs[Long]("lap_per_pos") == expected(id)._2, s"doc $id rate")
      assert(r.getAs[Boolean]("blurry") ==
        (expected(id)._2 < graft.operators.Multimodal.BlurThresh))
    }
    // the threshold genuinely discriminates on this corpus
    val flags = got.map(_.getAs[Boolean]("blurry"))
    assert(flags.contains(true) && flags.contains(false))
  }

  test("mm_aspect_filter: geometry verdicts recount locally; conservation holds") {
    import graft.operators.Multimodal
    val imgs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._1 % 3 == 0)
    def verdictOf(id: Long, nBytes: Long): (String, Long) = {
      val w = 64 + (id % 37) * 16
      val h = 64 + (id % 23) * 16
      val aspect = math.max(w, h) * 10 / math.min(w, h)
      val bpkp = nBytes * 1000 / (w * h)
      val v =
        if (math.min(w, h) < Multimodal.MmMinSide) "drop_small"
        else if (aspect > Multimodal.MmMaxAspectX10) "drop_aspect"
        else if (bpkp < Multimodal.MmMinBytesPerKpx) "drop_thin"
        else "keep"
      (v, nBytes)
    }
    // UTF-8 byte length, matching the operator's
    // length(encode(text,'UTF-8')) — t.length counts UTF-16 chars and
    // only coincides on an all-ASCII corpus (r10 advisory)
    val local = imgs.map { case (id, t) =>
      verdictOf(id, t.getBytes("UTF-8").length.toLong)
    }
    val expected = local.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val rows = run("mm_aspect_filter").collect()
    val got = rows.map(r => r.getString(0) ->
      (r.getAs[Long]("n_items"), r.getAs[Long]("total_bytes"))).toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == imgs.length.toLong)
    rows.foreach(r => assert(r.getAs[Long]("n_total") == imgs.length.toLong))
  }

  test("clip_gate: integer two-tower score replays locally; gate discriminates") {
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, t) => id % 3 == 0 && t.getBytes("UTF-8").nonEmpty }
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def imgTower(t: String): Map[Long, Long] = {
      val bytes = t.getBytes("UTF-8").map(b => (b & 0xff).toLong)
      bytes.zipWithIndex
        .groupBy { case (_, i) =>
          math.floor(i.toLong * Multimodal.PatchN.toDouble / bytes.length).toLong
        }
        .view.mapValues(vs => vs.map(_._1).sum * 1000 / vs.length).toMap
    }
    def txtTower(e: Array[Float]): Map[Long, Long] =
      e.zipWithIndex.groupBy(_._2 / 4).map { case (g, vs) =>
        g.toLong -> vs.map(v => math.floor(v._1.toDouble * 10000 + 0.5).toLong).sum
      }
    val expected = docs.flatMap { case (id, t) =>
      embs.get(id).map { e =>
        val a = imgTower(t); val b = txtTower(e)
        val ks = a.keySet.intersect(b.keySet)
        val dot = ks.toSeq.map(k => a(k) * b(k)).sum
        val na2 = ks.toSeq.map(k => a(k) * a(k)).sum
        val nb2 = ks.toSeq.map(k => b(k) * b(k)).sum
        val kept = dot >= 0 &&
          BigInt(dot) * dot * Multimodal.ClipCos2Den >= BigInt(na2) * nb2
        id -> ((dot, na2, nb2, kept))
      }
    }.toMap
    val got = run("clip_gate").collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("dot"), r.getAs[Long]("na2"),
        r.getAs[Long]("nb2"), r.getAs[Boolean]("kept")))).toMap
    assert(got == expected)
    // the floor genuinely splits this corpus
    val flags = got.values.map(_._4)
    assert(flags.exists(identity) && flags.exists(!_))
  }

  test("scene_cut: luma/cut/shot pipeline replays from first principles") {
    import Multimodal.{SceneFrame, SceneShotLen, SceneCutThreshold}
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter(_._1 % 3 == 2) // the video/mp4 mime bucket
    val expected = docs.map { case (id, t) =>
      val nf = (t.length + SceneFrame - 1) / SceneFrame
      val lumas = (0L until nf).map { idx =>
        val frame = t.slice((idx * SceneFrame).toInt,
          (idx * SceneFrame).toInt + SceneFrame)
        frame.map(_.toLong).sum + 1000L * ((idx / SceneShotLen + id) % 3)
      }
      val cuts = lumas.zipWithIndex.map { case (l, i) =>
        if (i > 0 && math.abs(l - lumas(i - 1)) >= SceneCutThreshold) 1L else 0L
      }
      val shotIds = cuts.scanLeft(0L)(_ + _).drop(1)
      val shotLens = shotIds.groupBy(identity).values.map(_.size.toLong)
      val nCuts = cuts.sum
      id -> ((nf.toLong, nCuts, nCuts + 1, shotLens.max,
        nf.toLong * 1000 / (nCuts + 1)))
    }.toMap
    val got = run("scene_cut").collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_cuts"), r.getAs[Long]("n_shots"),
        r.getAs[Long]("max_shot"), r.getAs[Long]("avg_shot_pm")))).toMap
    assert(got == expected)
    // the planted brightness steps produce real cuts somewhere
    assert(got.values.exists(_._2 > 0))
    // every video segments into at least one shot, none longer than its frames
    got.values.foreach { case (nf, _, ns, mx, _) =>
      assert(ns >= 1 && mx <= nf)
    }
  }

  test("mm_interleave: positions/runs replay exactly; text runs conserve to n_segs") {
    import Multimodal.ImgTokens
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, t) =>
      val toks = t.split(" ").count(_.nonEmpty).toLong
      val nSegs = math.max(math.ceil(toks / 8.0).toLong, 1L)
      val ps = (0L to id % 3).map(j => (id + j * 3) % nSegs).distinct.sorted
      val runs = Seq(ps.head) ++ ps.sliding(2).collect { case Seq(a, b) => b - a } ++
        Seq(nSegs - ps.last)
      assert(runs.sum == nSegs) // conservation of the reference itself
      val total = toks + ps.size * ImgTokens
      id -> ((nSegs, ps.size.toLong, toks, ps.size * ImgTokens, total,
        ps.size * ImgTokens * 1000 / total, runs.max))
    }.toMap
    val got = run("mm_interleave").collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_imgs"),
        r.getAs[Long]("text_tokens"), r.getAs[Long]("img_tokens"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("img_share_pm"),
        r.getAs[Long]("max_text_run")))).toMap
    assert(got == expected)
    // interleaving is real: some page carries 3 images, some 1
    assert(got.values.map(_._2).toSet.intersect(Set(1L, 3L)).size == 2)
  }

  test("audio_fingerprint: landmark matching replays; the planted shifted " +
    "twin matches at exactly its alignment offset") {
    import graft.operators.Multimodal.{AfBands, AfDfCap, AfFan, AfFrame,
      AfMinCommon, AfShiftBase, AfShiftFrames, AfTz}
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val base = docs.filter(_._1 % 3 == 1)
    val audio = base ++ base.filter(_._1 % 9 == 4).map { case (id, t) =>
      (id + AfShiftBase, (" " * (AfFrame * AfShiftFrames)) + t)
    }
    // (doc, t1, hash) landmark fingerprints, from first principles
    val fpsAll = audio.flatMap { case (id, t) =>
      val nf = (t.length + AfFrame - 1) / AfFrame
      val cells = for (idx <- 0 until nf; b <- 0 until AfBands) yield {
        val fr = t.slice(idx * AfFrame, idx * AfFrame + AfFrame)
        val e = fr.zipWithIndex.collect { case (c, p) if p % AfBands == b =>
          (c.toLong - 32) * (c.toLong - 32) }.sum
        ((b, idx), e)
      }
      val byBand = cells.toMap
      val peaks = cells.collect { case ((b, idx), e)
        if e > 0 && e > byBand.getOrElse((b, idx - 1), -1L) &&
          e > byBand.getOrElse((b, idx + 1), -1L) => (idx.toLong, b.toLong, e) }
      peaks.flatMap { case (t1, b1, e1) =>
        peaks.filter(p => p._1 > t1 && p._1 <= t1 + AfTz)
          .sortBy(p => (p._1 - t1, p._2))
          .take(AfFan)
          .map { case (t2, b2, e2) =>
            (id, t1, (((b1 * AfBands + b2) * (AfTz + 1) + (t2 - t1)) * 1048576L
              + math.min(e1, 1048575L)) * 1048576L + math.min(e2, 1048575L))
          }
      }
    }
    // the ubiquitous-hash drop: df over distinct recordings
    val dfh = fpsAll.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct.size.toLong).toMap
    val fps = fpsAll.filter(f => dfh(f._3) <= AfDfCap)
    val expected = (for {
      (da, ta, ha) <- fps; (db, tb, hb) <- fps
      if ha == hb && da < db
    } yield ((da, db), ta - tb))
      .groupBy(_._1).view.mapValues { g =>
        val votes = g.groupBy(_._2).view.mapValues(_.length.toLong).toMap
        val enc = votes.map { case (off, v) => v * 1000000L + (500000L - off) }.max
        (g.length.toLong, enc / 1000000, 500000L - enc % 1000000)
      }.filter(_._2._1 >= AfMinCommon).toMap
    val got = run("audio_fingerprint").collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        ((r.getAs[Long]("n_common"), r.getAs[Long]("best_votes"),
          r.getAs[Long]("best_offset")))).toMap
    assert(got == expected)
    // the Shazam signature on every planted twin: the offset-vote
    // argmax (plurality by construction) lands on the alignment
    // offset -AfShiftFrames with a solid vote count (repeated in-doc
    // hash patterns legitimately scatter some mass across other
    // offsets — n_common >= best_votes is the algorithm's real shape)
    val twins = base.map(_._1).filter(_ % 9 == 4)
    assert(twins.nonEmpty)
    twins.foreach { id =>
      val r = got.get((id, id + AfShiftBase))
      assert(r.isDefined, s"planted twin $id not matched")
      assert(r.get._3 == -AfShiftFrames.toLong, s"twin $id offset ${r.get._3}")
      assert(r.get._2 >= AfMinCommon, s"twin $id weak alignment: $r")
    }
  }
}
