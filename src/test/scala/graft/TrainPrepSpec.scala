package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainPrep

class TrainPrepSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sample_split: deterministic, exhaustive, roughly 80/10/10") {
    val out = run("sample_split").collect()
    val bySplit = out.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = Tables.documents(spark, sf).count()
    assert(bySplit.values.sum == total)
    assert(bySplit.keySet == Set("train", "val", "test"))
    val trainFrac = bySplit("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    // deterministic: same result twice
    val again = run("sample_split").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(again == bySplit)
  }

  test("decontaminate: flagged docs are test-split docs overlapping train near-dups") {
    val out = run("decontaminate").collect()
    out.foreach { r =>
      val ratio = r.getAs[Double]("ratio")
      assert(ratio > 0 && ratio <= 1)
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_grams"))
      // flagged docs must be in the test split (same hash as sample_split)
      assert((r.getLong(0) * 2654435761L % 1000000007L) % 100 >= 90)
    }
    // cross-check vs the near-dup pairs: most test docs whose near-dup
    // partner landed in train should be flagged. Not all — a 0.9
    // 3-gram-jaccard edit pattern can break every 13-token run, which
    // is the sharper criterion working as intended.
    def split(id: Long) = (id * 2654435761L % 1000000007L) % 100
    val pairs = run("dedup_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val straddling = pairs.collect {
      case (a, b) if split(a) < 80 && split(b) >= 90 => b
      case (a, b) if split(b) < 80 && split(a) >= 90 => a
    }.toSet
    val flagged = out.map(_.getLong(0)).toSet
    assert(straddling.count(flagged) * 2 >= straddling.size,
      s"flagged ${straddling.count(flagged)} of ${straddling.size} straddling near-dups")
  }

  test("curate: survivors bounded by corpus, all splits represented, quality floor holds") {
    val rows = run("curate").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total > 0 && total <= Tables.documents(spark, sf).count())
    assert(rows.map(_.getString(0)).toSet == Set("train", "val", "test"))
    assert(rows.forall(r => r.getAs[Long]("n_tokens") >= 50 * r.getAs[Long]("n_docs")))
  }

  test("stratified_sample: kept fraction tracks per-lang rate, deterministic") {
    val total = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = run("stratified_sample").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    graft.operators.TrainPrep.SampleRates.foreach { case (lang, rate) =>
      val frac = kept.getOrElse(lang, 0L).toDouble / total(lang)
      assert(math.abs(frac - rate / 100.0) < 0.25,
        s"$lang kept $frac vs rate ${rate / 100.0}")
    }
    // deterministic: two runs identical
    assert(kept == run("stratified_sample").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap)
  }

  test("vocab_topk: tf >= df >= 1, ordered by tf desc, hand-checked count") {
    val rows = run("vocab_topk").collect()
    assert(rows.nonEmpty && rows.length <= graft.operators.TrainPrep.VocabK)
    rows.foreach { r =>
      assert(r.getAs[Long]("tf") >= r.getAs[Long]("df") && r.getAs[Long]("df") >= 1)
    }
    val tfs = rows.map(_.getAs[Long]("tf"))
    assert(tfs.zip(tfs.tail).forall { case (a, b) => a >= b })
    val top = rows.head
    val expect = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.wsTokens(lower(col("text")))).as("t"))
      .filter(col("t") === top.getString(0)).count()
    assert(top.getAs[Long]("tf") == expect)
  }

  test("vocab_coverage: OOV accounting recounts against the top-K vocab, rates in [0,1]") {
    val toks = Tables.documents(spark, sf).select("lang", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val vocab = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, tf) => (-tf, t) }
      .take(graft.operators.TrainPrep.CoverageK).map(_._1).toSet
    val got = run("vocab_coverage").collect()
      .map(r => r.getString(0) -> r).toMap
    val byLang = toks.groupBy(_._1)
    assert(got.keySet == byLang.keySet && got.nonEmpty)
    byLang.foreach { case (lang, ts) =>
      val oov = ts.filterNot(t => vocab.contains(t._2))
      val r = got(lang)
      assert(r.getAs[Long]("n_tokens") == ts.length.toLong, s"$lang n_tokens")
      assert(r.getAs[Long]("n_oov") == oov.length.toLong, s"$lang n_oov")
      assert(r.getAs[Long]("n_oov_types") == oov.map(_._2).distinct.length.toLong, s"$lang types")
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // a 200-word vocab on a synthetic corpus must cover SOMETHING and miss something
    assert(got.values.exists(_.getAs[Long]("n_oov") > 0))
    assert(got.values.exists(r => r.getAs[Long]("n_oov") < r.getAs[Long]("n_tokens")))
  }

  test("pareto_tokens: grid clamp equals brute-force top-decile selection") {
    val toks = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split(" ").count(_.nonEmpty).toLong))
    val got = run("pareto_tokens").collect()
      .map(r => r.getString(0) -> r).toMap
    val bySrc = toks.groupBy(_._1)
    assert(got.keySet == bySrc.keySet && got.nonEmpty)
    bySrc.foreach { case (src, ds) =>
      val sorted = ds.map(_._2).sorted(Ordering[Long].reverse)
      val k = (sorted.length + 9) / 10
      val r = got(src)
      assert(r.getAs[Long]("n_docs") == sorted.length.toLong, s"$src n_docs")
      assert(r.getAs[Long]("total_tokens") == sorted.sum, s"$src total")
      assert(r.getAs[Long]("top_decile_tokens") == sorted.take(k).sum,
        s"$src top-decile")
      val share = r.getAs[Double]("top_decile_share")
      // ≥ 10% of mass by construction (top decile of a desc sort)
      assert(share >= 0.1 - 1e-9 && share <= 1.0)
    }
  }

  test("chunk_docs: one row per doc, emitted == n_chunks, bounded chunk sizes") {
    val rows = run("chunk_docs").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("emitted") == r.getAs[Long]("n_chunks"))
      val minC = r.getAs[Long]("min_chunk")
      assert(minC >= 1 && minC <= graft.operators.TrainPrep.ChunkLen)
      // overlap accounting: total chunk chars exceed the doc length
      // by exactly (n_chunks - 1) * overlap for multi-chunk docs
      val overlap = graft.operators.TrainPrep.ChunkLen - graft.operators.TrainPrep.ChunkStride
      if (r.getAs[Long]("n_chunks") > 1)
        assert(r.getAs[Long]("chunk_chars") >
          (r.getAs[Long]("n_chunks") - 1) * overlap)
    }
  }

  test("seq_pack: per-shard bins contiguous from 0, tokens conserved") {
    val rows = run("seq_pack").orderBy("shard", "bin").collect()
    val byShard = rows.groupBy(_.getLong(0))
    assert(byShard.nonEmpty && byShard.size <= graft.operators.TrainPrep.PackShards)
    byShard.foreach { case (sh, rs) =>
      val bins = rs.map(_.getLong(1)).sorted
      assert(bins.head == 0 && bins.sameElements(bins.head to bins.last),
        s"shard $sh bins not contiguous: ${bins.mkString(",")}")
    }
    val totalTok = rows.map(_.getAs[Long]("n_tokens")).sum
    val expected = Tables.documents(spark, sf)
      .select(sum(graft.functions.TextFns.wsTokenCount(col("text")).cast("long")))
      .collect()(0).getLong(0)
    assert(totalTok == expected)
    assert(rows.forall(_.getAs[Long]("n_tokens") > 0))
  }

  test("token_budget_mix: plan matches an exact integer token recount") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").count(_.nonEmpty).toLong))
    val pct = graft.operators.TrainPrep.MixPct.toMap
    val out = run("token_budget_mix").collect().map(r => r.getString(0) -> r).toMap
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val actual = ds.map(_._2).sum
      val target = graft.operators.TrainPrep.MixBudget * pct(lang) / 100
      val r = out(lang)
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("actual_tokens") == actual)
      assert(r.getAs[Long]("target_tokens") == target)
      assert(r.getAs[Boolean]("oversample") == (target > actual))
      assert(math.abs(r.getAs[Double]("epochs") - target.toDouble / actual) < 1e-3)
      assert(math.abs(r.getAs[Double]("sample_rate") -
        math.min(1.0, target.toDouble / actual)) < 1e-3)
    }
  }

  test("chunk_reassemble: every document reassembles exactly from its chunks") {
    val out = run("chunk_reassemble").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length.toLong == nDocs)
    out.foreach { r =>
      assert(r.getAs[Boolean]("ok"), s"doc ${r.getLong(0)} did not reassemble")
      assert(r.getAs[Int]("re_len") == r.getAs[Int]("len"))
    }
  }

  test("systematic_sample: boundary-crossing picks replay, ~K per source, weight-proportional") {
    val K = graft.operators.TrainPrep.SysK
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ").count(_.nonEmpty).toLong))
    val expected = docs.groupBy(_._1).flatMap { case (src, ds) =>
      val sorted = ds.sortBy(_._2)
      val total = sorted.map(_._3).sum
      val stride = total / K
      if (stride == 0) Seq.empty[((String, Long), (Long, Long, Long, Long))]
      else {
        var cum = 0L
        sorted.toSeq.flatMap { case (_, id, toks) =>
          val prev = cum; cum += toks
          val nb = cum / stride - prev / stride
          if (nb > 0) Some((src, id) -> (toks, cum, cum / stride, nb)) else None
        }
      }
    }
    val got = run("systematic_sample").collect()
      .map(r => (r.getString(0), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("toks"), r.getAs[Long]("cum"),
          r.getAs[Long]("bucket"), r.getAs[Long]("n_buckets"))).toMap
    assert(got == expected.toMap)
    // about K picks per source (strictly: between K and K + heavy-doc slack)
    val bySrc = got.keys.groupBy(_._1).view.mapValues(_.size)
    assert(bySrc.values.forall(n => n >= K / 2 && n <= K + 2), bySrc.toMap)
    // weight-proportional: picked docs are heavier on average
    val pickedIds = got.keySet.map(_._2)
    val (p, np) = docs.partition(d => pickedIds(d._2))
    assert(p.map(_._3).sum.toDouble / p.length >
      np.map(_._3).sum.toDouble / np.length)
  }

  test("sample_bottomk: exactly the K smallest portable priorities, rerun-stable") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val P = 1000000007L
    val expected = docs
      .map { case (id, src, nc) => (id % P * 2654435761L % P, id, src, nc) }
      .sortBy(t => (t._1, t._2)).take(TrainPrep.BottomK).toSeq
    def got() = run("sample_bottomk").collect()
      .map(r => (r.getAs[Long]("priority"), r.getLong(0),
        r.getString(1), r.getAs[Long]("n_chars"))).toSeq
    val g1 = got()
    assert(g1 == expected, s"first diff: ${g1.zip(expected).find(p => p._1 != p._2)}")
    assert(g1 == got(), "bottom-k sample must be rerun-stable")
  }

  test("label_balance: shares and inverse-frequency weights recount exactly") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val cells = docs.groupBy(d => (d._1, d._2)).view
      .mapValues(ds => (ds.length.toLong, ds.map(_._3).sum)).toMap
    val n = docs.length.toLong
    val k = cells.size.toLong
    val got = run("label_balance").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"),
          r.getAs[Double]("share"), r.getAs[Long]("weight_q"))).toMap
    assert(got.keySet == cells.keySet)
    got.foreach { case (key, (nd, nc, share, wq)) =>
      val (en, ec) = cells(key)
      assert(nd == en && nc == ec, s"cell $key counts")
      assert(share == graft.Portable.jround(en.toDouble / n, 4), s"cell $key share")
      assert(wq == n * TrainPrep.BalScale / (k * en), s"cell $key weight")
    }
    // rebalance sanity: rarer cells carry strictly larger weights
    val byN = got.values.toSeq.sortBy(_._1)
    assert(byN.head._4 >= byN.last._4)
  }

  test("target_encode: leave-one-out and m-estimate encodings replay exactly") {
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySeg = rows.groupBy(_._2).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._3).sum)).toMap
    val gN = rows.length.toLong
    val gMean = rows.map(_._3).sum / gN
    val m = TrainPrep.TeSmooth
    val got = run("target_encode").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getAs[Long]("enc_c"), r.getAs[Long]("enc_smooth_c"))).toMap
    assert(got.size == rows.length)
    rows.foreach { case (ok, seg, cents) =>
      val (n, sum) = bySeg(seg)
      val (gseg, gcents, enc, encS) = got(ok)
      assert(gseg == seg && gcents == cents)
      assert(enc == (sum - cents) / (n - 1), s"order $ok LOO")
      assert(encS == (sum - cents + m * gMean) / (n - 1 + m), s"order $ok smoothed")
      // leakage check: the encoding never equals the naive self-inclusive
      // mean unless the row sits exactly on its group mean
      if (cents * n != sum) assert(enc != sum / n || (sum - cents) / (n - 1) == sum / n)
    }
    // shrinkage: smoothed encodings sit between LOO and the global mean
    got.values.foreach { case (_, _, enc, encS) =>
      assert((encS >= (enc min gMean) - 1) && (encS <= (enc max gMean) + 1))
    }
  }

  test("epoch_shards: assignment replays exactly; epochs decorrelate from epoch 0") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val P = 1000000007L; val mult = 2654435761L
    def shard(id: Long, e: Long): Long =
      ((id % P) * mult + e * TrainPrep.EpMult2) % P % TrainPrep.ShardN
    val expected = (for {
      (id, nc) <- docs; e <- 0L until TrainPrep.EpochN.toLong
    } yield (e, shard(id, e), nc, shard(id, e) == shard(id, 0L)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, ts) =>
        k -> (ts.length.toLong, ts.map(_._3).sum, ts.count(_._4).toLong)
      }
    val got = run("epoch_shards").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_same0"))).toMap
    assert(got == expected)
    // epoch 0 trivially collides with itself; later epochs must not
    val byEpoch = got.groupBy(_._1._1).view
      .mapValues(m => (m.values.map(_._1).sum, m.values.map(_._3).sum)).toMap
    assert(byEpoch(0L)._1 == byEpoch(0L)._2)
    (1L until TrainPrep.EpochN.toLong).foreach { e =>
      val (n, same) = byEpoch(e)
      assert(same < n, s"epoch $e failed to decorrelate: $same of $n")
    }
  }

  test("negative_sample: the hash ring replays exactly; collision flags are honest") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val src = docs.toMap
    val n = docs.length.toLong
    val P = 1000000007L; val mult = 2654435761L
    val expected = (for {
      (id, s0) <- docs if id % 10 == 0; k <- 1L to TrainPrep.NegK
    } yield {
      val neg = ((id % P) * mult + k * TrainPrep.EpMult2) % P % n
      (id, k, neg, neg == id, src(neg) == s0)
    }).toSet
    val got = run("negative_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    assert(got == expected)
    // every anchor got exactly NegK draws
    assert(got.groupBy(_._1).values.forall(_.size == TrainPrep.NegK.toInt))
    // the ring genuinely spreads: not all draws share the anchor's source
    assert(got.exists(!_._5) && got.size > docs.count(_._1 % 10 == 0))
  }

  test("saturation_curve: conservation, monotone cumulatives, exact integer rates") {
    val rows = run("saturation_curve").collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (1L to 5L))
    // per-stage values sum to the final cumulatives; stage-5 cum
    // covers the whole corpus and the whole distinct-gram universe
    val nDocs = Tables.documents(spark, sf).count()
    val nGrams = Tables.documents(spark, sf)
      .select(explode(graft.functions.HashFns.shingles(col("text"))).as("g"))
      .distinct().count()
    val last = rows.last
    assert(last.getAs[Long]("cum_docs") == nDocs)
    assert(last.getAs[Long]("cum_grams") == nGrams)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(rows.map(_.getAs[Long]("new_grams")).sum == nGrams)
    // cumulatives are running sums of the per-stage columns
    var (cd, ct, cg) = (0L, 0L, 0L)
    rows.foreach { r =>
      cd += r.getAs[Long]("n_docs"); ct += r.getAs[Long]("n_toks")
      cg += r.getAs[Long]("new_grams")
      assert(r.getAs[Long]("cum_docs") == cd)
      assert(r.getAs[Long]("cum_toks") == ct)
      assert(r.getAs[Long]("cum_grams") == cg)
      val npm = if (r.getAs[Long]("n_toks") > 0)
        r.getAs[Long]("new_grams") * 1000000L / r.getAs[Long]("n_toks") else 0L
      val cpm = if (ct > 0) cg * 1000000L / ct else 0L
      assert(r.getAs[Long]("new_per_mtok") == npm)
      assert(r.getAs[Long]("cum_per_mtok") == cpm)
    }
    // the saturation signal: the marginal new-gram rate decays as the
    // corpus grows (later stages re-see earlier stages' grams)
    val rates = rows.map(_.getAs[Long]("new_per_mtok"))
    assert(rates.head > rates.last,
      s"no saturation decay in $rates")
  }

  test("importance_resample: acceptance replays exactly; sampling is non-trivial") {
    val P = 1000000007L; val mult2 = 1103515245L
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        graft.functions.TextFns.wsTokenCount(col("text")).cast("long").as("toks"),
        graft.functions.TextFns.langScore(col("text"), "en").cast("long").as("hits"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val per = rows.map { case (_, id, toks, hits) =>
        val w = math.min(100L, hits * 200L / math.max(toks, 1L))
        val kept = (id % P) * mult2 % P % 100 < w
        (toks, w, kept)
      }
      src -> (rows.length.toLong, per.count(_._3).toLong, per.map(_._2).sum,
        per.map(_._1).sum, per.filter(_._3).map(_._1).sum)
    }
    val got = run("importance_resample").collect().map { r =>
      r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("sum_w"), r.getAs[Long]("toks_in"), r.getAs[Long]("toks_kept"))
    }.toMap
    assert(got == expected)
    // the weighting neither keeps everything nor drops everything
    val (tot, kept) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    assert(kept > 0 && kept < tot, s"degenerate sampling: $kept of $tot")
  }

  test("span_corruption: spans in-bounds, non-overlapping, ~15% token coverage") {
    val rows = run("span_corruption").collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("k"), r.getAs[Long]("span_start"), r.getAs[Long]("span_len"))
    }
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, spans) =>
      val n = spans.head._2
      assert(spans.length.toLong == spans.head._3, s"doc $doc span count")
      // each span inside its own stride => sorted spans never touch
      val sorted = spans.sortBy(_._5)
      sorted.foreach { case (_, _, _, _, st, len) =>
        assert(st >= 0 && st + len <= n, s"doc $doc span [$st,+$len) out of [0,$n)")
        assert(len >= 2 || len == spans.head._2 / spans.head._3, s"doc $doc len $len")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, s1, l1), (_, _, _, _, s2, _)) =>
          assert(s1 + l1 <= s2, s"doc $doc overlapping spans")
        case _ =>
      }
    }
    // aggregate corruption ratio lands near the 15% target
    val masked = rows.map(_._6).sum.toDouble
    val toks = rows.groupBy(_._1).map(_._2.head._2).sum.toDouble
    val ratio = masked / toks
    assert(ratio > 0.08 && ratio < 0.22, s"corruption ratio $ratio")
  }

  test("filter_sweep: retention curve replays locally and is monotone in the cutoff") {
    val toks = Tables.documents(spark, sf)
      .select(graft.functions.TextFns.wsTokenCount(col("text")).cast("long"))
      .collect().map(_.getLong(0))
    val (td, tt) = (toks.length.toLong, toks.sum)
    val rows = run("filter_sweep").collect()
    assert(rows.map(_.getAs[Long]("cutoff")).toSeq == TrainPrep.FsCuts)
    rows.foreach { r =>
      val c = r.getAs[Long]("cutoff")
      val kept = toks.filter(_ >= c)
      assert(r.getAs[Long]("n_docs_kept") == kept.length.toLong)
      assert(r.getAs[Long]("toks_kept") == kept.sum)
      assert(r.getAs[Long]("docs_share_pm") == kept.length.toLong * 1000000L / td)
      assert(r.getAs[Long]("toks_share_pm") == kept.sum * 1000000L / tt)
    }
    // cutoff 0 keeps the whole corpus; retention never increases
    assert(rows.head.getAs[Long]("n_docs_kept") == td)
    val keptSeq = rows.map(_.getAs[Long]("n_docs_kept"))
    assert(keptSeq.sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
    // the grid genuinely discriminates on this corpus
    assert(keptSeq.last < td)
  }

  test("quality_agreement: cross-tab and kappa recount from first principles") {
    import graft.functions.TextFns
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sw = TextFns.stopwords("en").toSet
    def toksOf(t: String) = t.split(" ").filter(_.nonEmpty)
    // axis A: stopword-density weight bucket
    val aB = docs.map { case (id, t) =>
      val toks = toksOf(t).length.toLong max 1L
      val hits = toksOf(t.toLowerCase).count(sw.contains).toLong
      id -> math.min(3L, math.min(100L, hits * 200L / toks) / 8L)
    }.toMap
    // axis B: corpus-bigram fluency bucket (lmPerDoc semantics)
    val perDocToks = docs.map { case (id, t) => id -> toksOf(t.toLowerCase) }
    val bigrams = perDocToks.flatMap { case (id, ts) =>
      ts.zip(ts.drop(1)).map(p => (id, p)) }
    val cbg = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cuni = perDocToks.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val lmScale = graft.operators.CorpusClean.LmScale
    val bB = docs.map { case (id, _) =>
      val bgs = bigrams.filter(_._1 == id).map(_._2)
      val fq = if (bgs.isEmpty) 0L
      else {
        val sumQ = bgs.map(p => cbg(p) * lmScale / cuni(p._1)).sum
        sumQ * 1000L / (bgs.length * lmScale)
      }
      id -> math.min(3L, math.max(0L, (fq - 30L) / 2L))
    }.toMap
    val expectedCells = docs.map { case (id, _) => (aB(id), bB(id)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = run("quality_agreement").collect()
    val gotCells = rows.map(r => (r.getAs[Long]("a_bucket"),
      r.getAs[Long]("b_bucket")) -> r.getAs[Long]("n_docs_cell")).toMap
    assert(gotCells == expectedCells)
    // kappa from first principles (BigInt, same floor divisions)
    val n = BigInt(docs.length)
    val diag = BigInt(expectedCells.collect { case ((a, b), c) if a == b => c }.sum)
    val ra = expectedCells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cb = expectedCells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val peNum = ra.map { case (k, r) => BigInt(r) * BigInt(cb.getOrElse(k, 0L)) }.sum
    val poPm = (diag * 1000000) / n
    val pePm = (peNum * 1000000) / (n * n)
    val kappa = if (pePm == 1000000) BigInt(1000000)
    else (if (poPm >= pePm) BigInt(1) else BigInt(-1)) *
      ((poPm - pePm).abs * 1000000 / (1000000 - pePm))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == docs.length.toLong)
      assert(BigInt(r.getAs[Long]("po_pm")) == poPm)
      assert(BigInt(r.getAs[Long]("pe_pm")) == pePm)
      assert(BigInt(r.getAs[Long]("kappa_pm")) == kappa)
    }
  }

  test("pack_efficiency: the L-sweep recounts from a local shard cumsum") {
    import graft.operators.TrainPrep
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").count(_.nonEmpty).toLong))
      .sortBy(_._1)
    val byShard = docs.groupBy { case (id, _) =>
      (id * 2654435761L % 1000000007L) % TrainPrep.PackShards }
    val expected = TrainPrep.PackGrid.map(_.toLong).map { len =>
      var nSplit = 0L
      var nSeqs = 0L
      var pad = 0L
      byShard.values.foreach { sd =>
        var before = 0L
        sd.sortBy(_._1).foreach { case (_, n) =>
          if ((before + n - 1) / len > before / len) nSplit += 1
          before += n
        }
        nSeqs += (before + len - 1) / len
        pad += (len - before % len) % len
      }
      val nDocs = docs.length.toLong
      (len, nSeqs, nDocs, nSplit, nSplit * 1000000L / nDocs,
        pad, pad * 1000000L / (nSeqs * len))
    }
    val got = run("pack_efficiency").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    // monotonicity: larger L never fragments MORE docs
    got.map(_._4).sliding(2).foreach(p => assert(p.head >= p.last))
  }

  test("dsir_weights: hashed-feature importance scores replay exactly") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def polyHash(t: String): Long = {
      var acc = 0L; var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        acc = (acc * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }
    def ilog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val feats = docs.flatMap { case (id, lang, text) =>
      val ws = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val grams = ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      grams.map(g => (id, lang, polyHash(g) % TrainPrep.DsirB))
    }
    val raw = feats.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val tgt = feats.filter(_._2 == "en").groupBy(_._3)
      .view.mapValues(_.length.toLong).toMap
    val rtot = raw.values.sum; val ttot = tgt.values.sum
    val llr = raw.map { case (f, cr) =>
      f -> (ilog2(tgt.getOrElse(f, 0L) + 1) - ilog2(cr + 1)
        + ilog2(rtot + 1) - ilog2(ttot + 1))
    }
    val perDoc = feats.groupBy(_._1).view.mapValues { fs =>
      (fs.length.toLong, fs.map(t => llr(t._3)).sum)
    }.toMap
    val n = perDoc.size
    val scoresDesc = perDoc.values.map(_._2).toSeq.sorted.reverse
    // threshold: max score with |{score >= thr}| * 4 >= N (tie-inclusive)
    val thr = scoresDesc.zipWithIndex
      .filter { case (_, i) => (i + 1) * TrainPrep.DsirKeepQuarter >= n }
      .map(_._1).max
    val got = run("dsir_weights").collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_feats"),
        r.getAs[Long]("dsir_score"), r.getAs[Boolean]("kept")))).toMap
    assert(got.size == n)
    perDoc.foreach { case (id, (nf, score)) =>
      assert(got(id) == ((nf, score, score >= thr)), s"doc $id")
    }
    // the selection is non-trivial and tie-inclusively >= a quarter
    val kept = got.values.count(_._3)
    assert(kept * TrainPrep.DsirKeepQuarter >= n && kept < n)
    // target alignment: en docs are (on average) scored higher —
    // the whole point of importance weighting toward the en target
    def mean(ids: Iterable[Long]) =
      ids.map(id => perDoc(id)._2).sum.toDouble / ids.size
    val enIds = docs.filter(_._2 == "en").map(_._1)
    val otherIds = docs.filter(_._2 != "en").map(_._1)
    assert(mean(enIds) > mean(otherIds))
  }

  test("lang_temperature: alpha=1/2 shares replay exactly and flatten the mix") {
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).split(" ").count(_.nonEmpty).toLong))
    val perLang = docs.groupBy(_._1).view.mapValues(g =>
      (g.length.toLong, g.map(_._2).sum)).toMap
    val ttot = perLang.values.map(_._2).sum
    // normalizer folds left-to-right in lang order — the operator's
    // (and the oracle's) documented float-sum convention
    val ssum = perLang.toSeq.sortBy(_._1)
      .foldLeft(0.0) { case (acc, (_, (_, t))) => acc + math.sqrt(t.toDouble) }
    val expected = perLang.map { case (lang, (nd, nt)) =>
      val pPm = nt * 1000000L / ttot
      val qPm = math.floor(math.sqrt(nt.toDouble) * 1000000 / ssum + 0.5).toLong
      lang -> ((nd, nt, pPm, qPm, if (pPm > 0) qPm * 1000 / pPm else 0L))
    }
    val got = run("lang_temperature").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
    // temperature flattens: the head language is down-weighted, the
    // smallest language up-weighted, and the q shares still ≈ sum to 1
    val head = perLang.maxBy(_._2._2)._1
    val tail = perLang.minBy(_._2._2)._1
    assert(got(head)._5 < 1000 && got(tail)._5 > 1000)
    val qSum = got.values.map(_._4).sum
    assert(math.abs(qSum - 1000000L) <= perLang.size)
  }

  test("unimax_budget: water-filling replays sequentially; caps bind exactly") {
    import TrainPrep.UnimaxEpochCap
    val perLang = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ").count(_.nonEmpty).toLong)
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val total = perLang.values.map(_._2).sum
    val budget = 3 * total / 2
    // reference: the documented convention — capped set is the
    // ascending-cap prefix passing cap·left < remaining (cumulative
    // AND), uncapped langs split the residue by floor division
    val order = perLang.toSeq.map { case (l, (_, tk)) => (l, tk * UnimaxEpochCap) }
      .sortBy { case (l, c) => (c, l) }
    var remaining = budget
    var left = order.size.toLong
    var anyUncapped = false
    val capped = order.map { case (l, cap) =>
      val f = !anyUncapped && cap * left < remaining
      if (f) remaining -= cap else anyUncapped = true
      left -= 1
      l -> f
    }.toMap
    val csum = order.collect { case (l, cap) if capped(l) => cap }.sum
    val nun = capped.values.count(!_).toLong
    val alloc = order.map { case (l, cap) =>
      l -> (if (capped(l)) cap else (budget - csum) / math.max(nun, 1L))
    }.toMap
    val got = run("unimax_budget").collect().map(r =>
      r.getString(0) -> ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("cap"), r.getAs[Boolean]("capped"), r.getAs[Long]("alloc"),
        r.getAs[Long]("epochs_pm")))).toMap
    assert(got.keySet == perLang.keySet)
    got.foreach { case (l, (nd, tk, cap, cp, al, epm)) =>
      assert((nd, tk) == perLang(l), s"$l corpus stats")
      assert(cap == tk * UnimaxEpochCap)
      assert(cp == capped(l), s"$l capped flag")
      assert(al == alloc(l), s"$l allocation")
      assert(epm == al * 1000 / tk)
    }
    // water-filling semantics hold: nobody exceeds its cap, the
    // budget is respected, and both branches live on this corpus
    got.values.foreach { case (_, _, cap, _, al, _) => assert(al <= cap) }
    assert(got.values.map(_._5).sum <= budget)
    assert(got.values.exists(_._4) && got.values.exists(!_._4))
  }

  test("conformal_gate: order-statistic thresholds replay; held-out coverage meets the guarantee") {
    import TrainPrep.ConformalAlphas
    import graft.operators.CorpusClean.LmScale
    // per-doc fq from first principles (the ccnet_buckets scoring)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def toks(t: String) = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    val allToks = docs.flatMap { case (_, t) => toks(t) }
    val cuni = allToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val allBg = docs.flatMap { case (_, t) => toks(t).sliding(2).collect {
      case Seq(a, b) => (a, b) }.toSeq }
    val cbg = allBg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val fqOf = docs.map { case (id, t) =>
      val bgs = toks(t).sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
      val fq = if (bgs.isEmpty) 0L
        else {
          val sumQ = bgs.map { case (a, b) => cbg((a, b)) * LmScale / cuni(a) }.sum
          sumQ * 1000 / (bgs.length.toLong * LmScale)
        }
      id -> fq
    }.toMap
    def lane(id: Long): Int = ((id * 2654435761L % 1000000007L) % 100).toInt
    val cal = docs.map(_._1).filter(i => lane(i) >= 80 && lane(i) < 90).map(fqOf).sorted
    val tst = docs.map(_._1).filter(i => lane(i) >= 90).map(fqOf)
    val got = run("conformal_gate").collect()
      .map(r => r.getAs[Long]("alpha_pm") -> r).toMap
    assert(got.keySet == ConformalAlphas.toSet)
    ConformalAlphas.foreach { a =>
      val r = got(a)
      val k = math.max(a * (cal.length + 1) / 1000, 1L)
      val t = cal((k - 1).toInt)
      assert(r.getAs[Long]("n_cal") == cal.length.toLong)
      assert(r.getAs[Long]("k") == k, s"alpha $a k")
      assert(r.getAs[Long]("threshold") == t, s"alpha $a threshold")
      assert(r.getAs[Long]("n_test") == tst.length.toLong)
      val keep = tst.count(_ >= t).toLong
      assert(r.getAs[Long]("n_keep") == keep)
      assert(r.getAs[Long]("coverage_pm") == keep * 1000 / tst.length)
      // the finite-sample guarantee, read empirically with slack for
      // the small held-out lane (binomial noise, not a violation)
      assert(r.getAs[Long]("coverage_pm") >= 1000 - a - 100,
        s"alpha $a coverage ${r.getAs[Long]("coverage_pm")}")
    }
    // the two levels produce genuinely different thresholds or ranks
    assert(got(ConformalAlphas.head).getAs[Long]("k")
      != got(ConformalAlphas.last).getAs[Long]("k"))
  }

  test("pareto_quality_gate: the GPT-3 admission rule replays in exact " +
    "integer algebra; admission is monotone in score") {
    import graft.operators.CorpusClean.LmScale
    import TrainPrep.PqMult
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def toks(t: String) = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    val cuni = docs.flatMap { case (_, t) => toks(t) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cbg = docs.flatMap { case (_, t) =>
      toks(t).sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val P = BigInt("1000000007")
    val rhs = P * BigInt(100).pow(9)
    val fqOf = docs.map { case (id, t) =>
      val bgs = toks(t).sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
      val fq = if (bgs.isEmpty) 0L
        else bgs.map { case (a, b) => cbg((a, b)) * LmScale / cuni(a) }.sum *
          1000 / (bgs.length.toLong * LmScale)
      (id, fq, bgs.length.toLong)
    }
    // score = empirical CDF of fq in percent (strictly-below mass)
    val below = fqOf.map(_._2).groupBy(identity).view.mapValues(_.length).toMap
      .toSeq.sortBy(_._1)
      .scanLeft((Long.MinValue, 0L)) { case ((_, acc), (fq, c)) => (fq, acc + c) }
    val belowOf = below.zip(below.tail).map { case ((_, acc), (fq, _)) => fq -> acc }.toMap
    val perDoc = fqOf.map { case (id, fq, nbg) =>
      val sPct = belowOf(fq) * 100 / docs.length
      val h = BigInt(id % 1000000007L) * PqMult % P
      val keep = (h + 1) * BigInt(200 - sPct).pow(9) < rhs
      (sPct / 10, keep, nbg)
    }
    val expected = perDoc.groupBy(_._1).view.mapValues { g =>
      val kept = g.filter(_._2)
      (g.length.toLong, kept.length.toLong,
        kept.length.toLong * 1000 / g.length, kept.map(_._3).sum)
    }.toMap
    val got = run("pareto_quality_gate").collect()
      .map(r => r.getAs[Long]("decile") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("kept_pm"),
        r.getAs[Long]("kept_bigrams")))).toMap
    assert(got == expected.map { case (k, v) => k.toLong -> v })
    // the Pareto signature on the fixed corpus: the top stable decile
    // admits at a strictly higher rate than the bottom stable one
    // (P(keep|s): ~0.2% at s=0 vs ~42% at s=0.9 — the lottery tail)
    val stable = got.toSeq.sortBy(_._1).filter(_._2._1 >= 20)
    assert(stable.size >= 2, s"score CDF failed to spread deciles: $got")
    assert(stable.head._2._3 < stable.last._2._3,
      s"admission not increasing: ${stable.head} vs ${stable.last}")
    // the gate is a real cut: some docs kept, some dropped
    val (tot, kept) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    assert(kept > 0 && kept < tot)
  }
}
