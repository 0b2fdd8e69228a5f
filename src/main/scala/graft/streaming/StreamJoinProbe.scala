package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Component breakdown for `stream_join` / `stream_join_outer` — the
  * suite's largest unprofiled warm block (r10 judge: 5.73 / 5.39 s,
  * more than the relational join of the same frames by an order of
  * magnitude). The stream_decisions convention: measure each layer
  * under the bench convention (alternating rounds, warm = min of the
  * post-JIT passes) and attribute the remainder, so the "machinery
  * floor" claim is a measured number, not prose.
  *
  * Layers (each self-contained, so deltas attribute cleanly):
  *  - `batch`: the relational join of the same two frames, noop-
  *    written — the cost a batch engine pays for the same answer.
  *  - `stage`: filter+project the two sides and stage them as
  *    parquet waves into watched dirs (no streaming query) — the
  *    input-preparation cost every variant shares.
  *  - `pass`:  stage + a STATELESS passthrough stream over the same
  *    files into a memory sink — adds file-source listing, micro-
  *    batch machinery and sink collection, still no state stores.
  *  - `full`:  the shipped StreamJoin.run (watermarks + symmetric
  *    hash join: 4 state stores per partition, RocksDB).
  *  - `fullo`: the shipped StreamJoinOuter.run (adds the eviction-
  *    driven null emission and the cutoff normalization).
  *  - `hdfs`:  `full` under HDFSBackedStateStoreProvider — the
  *    RocksDB instance open/commit tax, isolated. (The session
  *    default stays RocksDB: heap-backed state caps keyed state at
  *    executor memory, which window-sized state at 100 TB exceeds;
  *    the probe quantifies what that insurance costs HERE.)
  *  - `clog`:  `full` with RocksDB changelog checkpointing — commits
  *    upload a changelog instead of a full snapshot, the production
  *    setting for frequent small commits.
  *
  * Usage: runMain graft.streaming.StreamJoinProbe [sfDir] [rounds]
  *        [variant,variant,...]   (default: all variants)
  */
object StreamJoinProbe {

  private def withConf[A](s: SparkSession, key: String, value: String)(body: => A): A = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  private def sides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = Tables.events(s, dir)
    (e.filter(col("event_type") === "view")
       .select(col("event_id").as("vid"), col("user_id"), col("ts").as("vts")),
     e.filter(col("event_type") === "purchase")
       .select(col("event_id").as("pid"), col("user_id").as("p_user"), col("ts").as("pts")))
  }

  private def stageBoth(s: SparkSession, dir: String): Unit = {
    val (views, purchases) = sides(s, dir)
    val base = Files.createTempDirectory(Paths.get("/root/repo/target"), "sj_probe")
    val vDir = Files.createDirectory(base.resolve("views"))
    val pDir = Files.createDirectory(base.resolve("purchases"))
    Staging.stage(views, vDir.toString, "v")
    Staging.stage(purchases, pDir.toString, "p")
    Seq(vDir, pDir).foreach(Staging.clearDir)
    Files.deleteIfExists(base)
  }

  private def passthrough(s: SparkSession, dir: String): Unit = {
    val (views, _) = sides(s, dir)
    val base = Files.createTempDirectory(Paths.get("/root/repo/target"), "sj_probe")
    val vDir = Files.createDirectory(base.resolve("views"))
    val mem = "sj_pass_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = s.readStream.schema(views.schema).parquet(vDir.toString)
      .select(col("vid"), col("user_id"), col("vts"))
      .writeStream.format("memory").queryName(mem).outputMode("append").start()
    try {
      Staging.stage(views, vDir.toString, "v")
      q.processAllAvailable()
    } finally q.stop()
    s.table(mem).write.format("noop").mode("overwrite").save()
    s.catalog.dropTempView(mem)
    Staging.clearDir(vDir)
    Files.deleteIfExists(base)
  }

  private def dumpProgress(tag: String,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    q.recentProgress.foreach { p =>
      val d = p.durationMs
      def ms(k: String) = Option(d.get(k)).map(_.toString).getOrElse("-")
      val st = p.stateOperators.map(so =>
        s"commit=${so.commitTimeMs}ms rows=${so.numRowsTotal} " +
          s"updated=${so.numRowsUpdated}").mkString("; ")
      println(s"SJDIAG[$tag] batch=${p.batchId} rows=${p.numInputRows} " +
        s"trigger=${ms("triggerExecution")} planning=${ms("queryPlanning")} " +
        s"addBatch=${ms("addBatch")} state[$st] sinkRows=${Option(p.sink)
          .map(_.numOutputRows).getOrElse(-1L)}")
    }

  /** Instrumented copy of StreamJoin.run: same pipeline, but dumps
    * each micro-batch's engine-reported durations (queryPlanning /
    * addBatch / stateOperators commit times) so the state/join layer
    * attributes to named engine phases instead of a subtraction. */
  private def diag(s: SparkSession, dir: String): Unit = {
    val (views, purchases) = sides(s, dir)
    val base = Files.createTempDirectory(Paths.get("/root/repo/target"), "sj_diag")
    val vDir = Files.createDirectory(base.resolve("views"))
    val pDir = Files.createDirectory(base.resolve("purchases"))
    val mem = "sj_diag_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val vStream = s.readStream.schema(views.schema).parquet(vDir.toString)
      .withWatermark("vts", "1 hour")
    val pStream = s.readStream.schema(purchases.schema).parquet(pDir.toString)
      .withWatermark("pts", "1 hour")
    val q = vStream.join(pStream,
        col("user_id") === col("p_user") &&
          col("pts") >= col("vts") &&
          col("pts") <= col("vts") + expr("INTERVAL 1 HOUR"))
      .writeStream.format("memory").queryName(mem).outputMode("append").start()
    try {
      Staging.stage(views, vDir.toString, "v")
      Staging.stage(purchases, pDir.toString, "p")
      q.processAllAvailable()
    } finally q.stop()
    q.recentProgress.foreach { p =>
      val d = p.durationMs
      def ms(k: String) = Option(d.get(k)).map(_.toString).getOrElse("-")
      val st = p.stateOperators.map(so =>
        s"commit=${so.commitTimeMs}ms rows=${so.numRowsTotal}").mkString("; ")
      println(s"SJDIAG batch=${p.batchId} rows=${p.numInputRows} " +
        s"trigger=${ms("triggerExecution")} planning=${ms("queryPlanning")} " +
        s"addBatch=${ms("addBatch")} getBatch=${ms("latestOffset")} " +
        s"walCommit=${ms("walCommit")} commitOffsets=${ms("commitOffsets")} " +
        s"state[$st]")
    }
    s.catalog.dropTempView(mem)
    Seq(vDir, pDir).foreach(Staging.clearDir)
    Files.deleteIfExists(base)
  }

  /** StreamJoin.run with both sides staged BEFORE start(): the file
    * source's first listing sees every wave, so the whole join runs
    * in ONE data micro-batch (plus the watermark-advance batch)
    * instead of one per side — same operators, same state machinery,
    * deterministic batch composition. */
  private def preStaged(s: SparkSession, dir: String): Unit = {
    val (views, purchases) = sides(s, dir)
    val base = Files.createTempDirectory(Paths.get("/root/repo/target"), "sj_pre")
    val vDir = Files.createDirectory(base.resolve("views"))
    val pDir = Files.createDirectory(base.resolve("purchases"))
    val mem = "sj_pre_" + java.util.UUID.randomUUID().toString.replace("-", "")
    Staging.stage(views, vDir.toString, "v")
    Staging.stage(purchases, pDir.toString, "p")
    val vStream = s.readStream.schema(views.schema).parquet(vDir.toString)
      .withWatermark("vts", "1 hour")
    val pStream = s.readStream.schema(purchases.schema).parquet(pDir.toString)
      .withWatermark("pts", "1 hour")
    val q = vStream.join(pStream,
        col("user_id") === col("p_user") &&
          col("pts") >= col("vts") &&
          col("pts") <= col("vts") + expr("INTERVAL 1 HOUR"))
      .writeStream.format("memory").queryName(mem).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    s.table(mem).write.format("noop").mode("overwrite").save()
    s.catalog.dropTempView(mem)
    Seq(vDir, pDir).foreach(Staging.clearDir)
    Files.deleteIfExists(base)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configured(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-sj-probe"), cpus)
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    val Provider = "spark.sql.streaming.stateStore.providerClass"
    val Changelog =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    def full(): Unit =
      Staging.withStatePartitions(spark)(StreamJoin.run(spark, sfDir))
        .write.format("noop").mode("overwrite").save()
    val variants: Seq[(String, () => Unit)] = Seq(
      "batch" -> (() => {
        val (v, p) = sides(spark, sfDir)
        v.join(p, col("user_id") === col("p_user") &&
            col("pts") >= col("vts") &&
            col("pts") <= col("vts") + expr("INTERVAL 1 HOUR"))
          .write.format("noop").mode("overwrite").save()
      }),
      "stage" -> (() => stageBoth(spark, sfDir)),
      "pass"  -> (() => passthrough(spark, sfDir)),
      "full"  -> (() => full()),
      "fullo" -> (() =>
        Staging.withStatePartitions(spark)(StreamJoinOuter.run(spark, sfDir))
          .write.format("noop").mode("overwrite").save()),
      "hdfs"  -> (() => withConf(spark, Provider,
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")(
        full())),
      "clog"  -> (() => withConf(spark, Changelog, "true")(full())),
      "p2"    -> (() => withConf(spark, "spark.sql.shuffle.partitions", "2")(
        StreamJoin.run(spark, sfDir)
          .write.format("noop").mode("overwrite").save())),
      "diag"  -> (() => Staging.withStatePartitions(spark)(diag(spark, sfDir))),
      "pre"   -> (() => Staging.withStatePartitions(spark)(preStaged(spark, sfDir))),
      // the r10-driver-flagged pair: full entry vs its batch twin,
      // plus a progress dump — both are single-wave update/append
      // streams, so the sink's written set is bounded by construction
      // (NOT complete-mode rewrites); the probe shows where the rest
      // of the wall time sits
      "topk"  -> (() => Staging.withStatePartitions(spark)(
        StreamTopk.run(spark, sfDir))
        .write.format("noop").mode("overwrite").save()),
      "topkb" -> (() => {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables.events(spark, sfDir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("event_type"), col("n"))
        val w = Window.partitionBy(col("hour")).orderBy(col("n").desc, col("event_type"))
        counts.withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("rk") <= StreamTopk.K)
          .write.format("noop").mode("overwrite").save()
      }),
      "topkd" -> (() => Staging.withStatePartitions(spark) {
        val mem = "sj_topkd_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val q = StreamTopk.counts(StreamIngest.readEvents(spark, sfDir))
          .writeStream.format("memory").queryName(mem).outputMode("update").start()
        try q.processAllAvailable() finally q.stop()
        dumpProgress("topk", q)
        spark.catalog.dropTempView(mem)
      }),
      "ssw"   -> (() => Staging.withStatePartitions(spark)(
        StreamSessionWindow.run(spark, sfDir))
        .write.format("noop").mode("overwrite").save()))

    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val chosen = variants.filter(v => only.forall(_.contains(v._1)))
    for (_ <- 1 to rounds; (label, fn) <- chosen) {
      val t0 = System.nanoTime()
      fn()
      spark.sharedState.cacheManager.clearCache()
      times(label) = times(label) :+ (System.nanoTime() - t0) / 1e9
    }
    for ((label, _) <- chosen) {
      val ts = times(label)
      val warm = if (ts.size >= 2) ts.drop(1) else ts
      println(f"SJPROBE $label all=${ts.map(t => f"$t%.3f").mkString(" ")} " +
        f"warmMin=${warm.min}%.3f warmMed=${warm.sorted.apply(warm.size / 2)}%.3f")
    }
    spark.stop()
  }
}
