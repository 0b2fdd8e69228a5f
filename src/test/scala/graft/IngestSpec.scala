package graft

import org.apache.spark.sql.functions._
import graft.ingest.{Csv, Ingest}

class IngestSpec extends SparkSpec {

  test("Csv parser: quotes, escapes, embedded commas/newlines, blank lines") {
    val text = "a,b,c\n1,\"x,y\",\"he said \"\"hi\"\"\"\n\n2,\"multi\nline\",z\r\n"
    val recs = Csv.records(text)
    assert(recs == Vector(
      Vector("a", "b", "c"),
      Vector("1", "x,y", "he said \"hi\""),
      Vector("2", "multi\nline", "z")))
  }

  test("Csv.quote roundtrips through Csv.records") {
    val fields = Vector("plain", "with,comma", "with\"quote", "with\nnewline", "")
    val line = fields.map(Csv.quote).mkString(",")
    assert(Csv.records(line + "\n") == Vector(fields))
  }

  test("zipcsv_read roundtrips the documents table through zip+nested zip") {
    val got = SparkEntry.queries("zipcsv_read")(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(got.count() == docs.count())
    // spot-check realignment of the shuffled-header member
    val j = got.select(col("doc_id").cast("long").as("doc_id"), col("lang").as("got_lang"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    assert(j.filter(col("got_lang") =!= col("lang")).count() == 0)
  }

  test("ingest_manifest covers the events date span, one file per day") {
    val m = SparkEntry.queries("ingest_manifest")(spark, sf).collect()
    assert(m.length >= 28) // events span ~1 month
    assert(m.map(_.getString(1)).forall(f =>
      f.startsWith("sor-discord-netherlands-bv-") && f.endsWith("-full.zip")))
    assert(m.map(_.getDate(0)).distinct.length == m.length)
    // the reference's epoch warning (main.go:102-106) as a flag:
    // exactly the days before 2024-08-21 are marked
    val epoch = java.sql.Date.valueOf("2024-08-21")
    m.foreach(r => assert(r.getAs[Boolean]("before_epoch") == r.getDate(0).before(epoch)))
  }

  test("manifest range validation flags pre-epoch and unpublished days (main.go:102-112)") {
    import graft.ingest.Manifest
    val m = Manifest.validated(
      Manifest.daily(spark, "2024-08-19", "2024-08-24"),
      today = lit("2024-08-23").cast("date")).collect()
    val byDay = m.map(r => r.getDate(0).toString ->
      (r.getAs[Boolean]("before_epoch"), r.getAs[Boolean]("not_yet_published"))).toMap
    assert(byDay("2024-08-19") == ((true, false)))
    assert(byDay("2024-08-20") == ((true, false)))
    assert(byDay("2024-08-21") == ((false, false)))
    assert(byDay("2024-08-22") == ((false, false)))
    // "in the future or in today" both warn
    assert(byDay("2024-08-23") == ((false, true)))
    assert(byDay("2024-08-24") == ((false, true)))
  }

  test("decision_parse: malformed ts → null, array fallback, tri-state bool") {
    val rows = SparkEntry.queries("decision_parse")(spark, sf)
      .orderBy("event_id").collect()
    val bogus = rows.filter(_.getLong(0) % 11 == 0)
    assert(bogus.forall(_.isNullAt(1)))
    val jsonArr = rows.filter(_.getLong(0) % 4 == 0)
    assert(jsonArr.forall(_.getString(2).endsWith("|extra")))
    val empty = rows.filter(_.getLong(0) % 4 == 2)
    assert(empty.forall(_.isNullAt(2)))
    val yes = rows.filter(_.getLong(0) % 3 == 0)
    assert(yes.forall(_.getBoolean(3)))
    val dunno = rows.filter(_.getLong(0) % 3 == 2)
    assert(dunno.forall(_.isNullAt(3)))
  }

  test("snowflake_decode recovers event_id + discord epoch") {
    val rows = SparkEntry.queries("snowflake_decode")(spark, sf)
      .select("event_id", "snowflake_ms").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) + 1420070400000L))
  }

  test("dedup_upsert keeps exactly one latest row per user") {
    val d = SparkEntry.queries("dedup_upsert")(spark, sf)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(d.count() == users)
    assert(d.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("ingest_stats counts rows per file") {
    val r = SparkEntry.queries("ingest_stats")(spark, sf).collect()
    assert(r.map(_.getLong(1)).sum == Tables.lineitem(spark, sf).count())
  }

  test("csv_badrecords: every planted corruption is flagged, partial parses kept") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (corrupt, parsed) = docs.partition { case (id, _, _) =>
      id % 10 == 3 || id % 17 == 0
    }
    assert(corrupt.nonEmpty, "fixture plants no corruption — vacuous")
    val got = SparkEntry.queries("csv_badrecords")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("sum_ids"), r.getAs[Long]("sum_chars"),
        r.getAs[Long]("n_langs"))).toMap
    assert(got.keySet == Set("parsed", "corrupt"))
    // conservation: every input row lands in exactly one status
    assert(got("parsed")._1 + got("corrupt")._1 == docs.length.toLong)
    assert(got("parsed")._1 == parsed.length.toLong)
    assert(got("parsed")._2 == parsed.map(_._1).sum)
    assert(got("parsed")._3 == parsed.map(_._3).sum)
    assert(got("parsed")._4 == parsed.map(_._2).distinct.length.toLong)
    // partial parse: corrupt rows keep doc_id and lang; the
    // unparseable n_chars (bad-numeric mode) contributes nothing
    assert(got("corrupt")._2 == corrupt.map(_._1).sum)
    assert(got("corrupt")._3 ==
      corrupt.collect { case (id, _, nc) if id % 10 != 3 => nc }.sum)
    assert(got("corrupt")._4 == corrupt.map(_._2).distinct.length.toLong)
  }

  test("jsonl_read: syntax errors corrupt whole rows, missing fields parse to null") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (corrupt, parsed) = docs.partition(_._1 % 10 == 4)
    val missing = parsed.filter(_._1 % 13 == 0)
    assert(corrupt.nonEmpty && missing.nonEmpty, "fixture plants nothing — vacuous")
    val got = SparkEntry.queries("jsonl_read")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"),
        Option(r.getAs[Any]("sum_ids")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("sum_chars")).map(_.asInstanceOf[Long]),
        r.getAs[Long]("n_missing_lang"))).toMap
    assert(got.keySet == Set("parsed", "corrupt"))
    // conservation: every input line lands in exactly one status
    assert(got("parsed")._1 + got("corrupt")._1 == docs.length.toLong)
    assert(got("parsed") == ((parsed.length.toLong,
      Some(parsed.map(_._1).sum), Some(parsed.map(_._3).sum),
      missing.length.toLong)))
    // JSON's failure unit is the ROW: a truncated line yields no
    // partial fields at all (unlike CSV's field-level nulls)
    assert(got("corrupt") == ((corrupt.length.toLong, None, None, 0L)))
  }

  test("orc_roundtrip: aggregate matches the parquet original; filter pushed to the ORC scan") {
    val got = SparkEntry.queries("orc_roundtrip")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val expected = Tables.documents(spark, sf)
      .filter(col("n_chars") >= graft.ingest.Ingest.OrcMinChars)
      .groupBy(col("lang"))
      .agg(count(lit(1)), sum(col("n_chars")), count_distinct(col("source")),
        sum(col("doc_id")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
    assert(expected.nonEmpty)
    // the n_chars predicate must reach the ORC scan (search-argument
    // pushdown), not run as a post-scan filter only
    val plan = SparkEntry.queries("orc_roundtrip")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"), plan.take(800))
  }

  test("warc_stats: header parse + measured lengths replay; planted corruption found") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def typeOf(id: Long) = (id % 5) match {
      case 0 => "request"; case 1 => "metadata"; case _ => "response"
    }
    val exp = docs.groupBy { case (id, _) => typeOf(id) }.map { case (t, ds) =>
      t -> ((ds.length.toLong,
        ds.count { case (id, _) => id % 11 == 0 }.toLong,
        ds.map(_._2.length.toLong).sum,
        ds.map { case (id, _) => s"site${id % 7}.example.com" }.distinct.length.toLong))
    }
    val got = SparkEntry.queries("warc_stats")(spark, sf).collect().map(r =>
      r.getString(0) -> ((r.getAs[Long]("n_records"), r.getAs[Long]("n_bad_length"),
        r.getAs[Long]("payload_bytes"), r.getAs[Long]("n_hosts")))).toMap
    assert(got == exp)
    // the corruption is really detected by MEASUREMENT, not the mod:
    // every planted +5 record mismatches, nothing else does
    assert(got.values.map(_._2).sum == docs.count(_._1 % 11 == 0).toLong)
  }
}
