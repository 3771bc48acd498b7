package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import graft.streaming.LakeSink

class LakeStatsSpec extends SparkSuite {
  import spark.implicits._

  private def freshLake(): (String, LakeSink) = {
    val dir = Files.createTempDirectory("graft-lakestats").toString
    (dir, new LakeSink(dir))
  }

  private def batch(ids: Range, uLo: Long, uHi: Long) = {
    val span = math.max(1L, uHi - uLo)
    ids.map(i => (i.toLong, uLo + (i.toLong * 7919L) % span,
      s"2024-01-0${1 + i % 5}T0${i % 10}:00:00")).toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
  }

  test("zone stats recorded per commit; pruned read skips disjoint segments, loses nothing") {
    val (dir, sink) = freshLake()
    try {
      assert(sink.addBatchStats(0L, batch(0 until 100, 0L, 1000L), Seq("user_id")))
      assert(sink.addBatchStats(1L, batch(100 until 200, 5000L, 6000L), Seq("user_id")))
      assert(sink.addBatchStats(2L, batch(200 until 300, 9000L, 9500L), Seq("user_id")))
      val es = sink.committed()
      assert(es.forall(_.stats.contains("user_id")))
      // a box inside segment 1's range only
      val box = Map("user_id" -> ((5200L, 5800L)))
      val kept = sink.pruneEntries(box)
      assert(kept.map(_.batch) === Seq(1L))
      // correctness: pruned+exact == full+exact
      val exact = (d: org.apache.spark.sql.DataFrame) =>
        d.filter(col("user_id").between(5200L, 5800L))
          .agg(count(lit(1)), coalesce(sum("event_id"), lit(0L)))
          .as[(Long, Long)].head()
      assert(exact(sink.readPruned(spark, box)) === exact(sink.read(spark)))
    } finally graft.operators.LayoutOps.deleteTree(Paths.get(dir))
  }

  test("all-pruned box keeps the table schema; empty and old-format entries behave") {
    val (dir, sink) = freshLake()
    try {
      sink.addBatchStats(0L, batch(0 until 50, 0L, 100L), Seq("user_id"))
      // zero-row commit: never a candidate
      sink.addBatchStats(1L, batch(0 until 0, 0L, 1L), Seq("user_id"))
      // old-format entry (no stats, rows recorded): ALWAYS a candidate
      Files.write(Paths.get(dir, "_manifest.jsonl"),
        "{\"batch\": 7, \"rows\": -1}\n".getBytes, StandardOpenOption.APPEND)
      Files.createDirectories(Paths.get(dir, "batch=7"))
      batch(50 until 60, 77777L, 77800L).withColumn("_batch_id", lit(7L))
        .withColumn("_part_id", lit(0))
        .write.mode("overwrite").parquet(s"$dir/batch=7")
      val boxMiss = Map("user_id" -> ((900000L, 900001L)))
      // old-format entry survives pruning (no stats → candidate)
      assert(sink.pruneEntries(boxMiss).map(_.batch) === Seq(7L))
      val df = sink.readPruned(spark, boxMiss)
        .filter(col("user_id").between(900000L, 900001L))
      assert(df.count() === 0L)
      // a box that hits batch 0 AND keeps the un-statted candidate
      val boxHit = Map("user_id" -> ((0L, 50L)))
      assert(sink.pruneEntries(boxHit).map(_.batch).toSet === Set(0L, 7L))
    } finally graft.operators.LayoutOps.deleteTree(Paths.get(dir))
  }

  test("zero-row-only lake: pruned read keeps the schema (review r6 finding #1)") {
    val (dir, sink) = freshLake()
    try {
      // the all-dup microbatch shape: a commit with 0 rows (explicitly
      // supported — it gets an empty bloom); the lake has NO data-bearing
      // segment, yet a pruned read must still resolve caller predicates
      assert(sink.addBatchStats(0L, batch(0 until 0, 0L, 1L), Seq("user_id")))
      val df = sink.readPruned(spark, Map("user_id" -> ((5L, 9L))))
      assert(df.columns.contains("user_id"), s"schema lost: ${df.columns.toSeq}")
      assert(df.filter(col("user_id").between(5L, 9L)).count() === 0L)
    } finally graft.operators.LayoutOps.deleteTree(Paths.get(dir))
  }

  test("non-integral stat column fails loudly; absent column is skipped") {
    val (dir, sink) = freshLake()
    try {
      intercept[IllegalArgumentException] {
        sink.addBatchStats(0L, batch(0 until 5, 0L, 10L), Seq("ts")) }
      // the require fires BEFORE the batch write — no stranded segment dir,
      // no wasted write I/O on every streaming retry (review r6 finding #3)
      assert(!Files.exists(Paths.get(dir, "batch=0")))
      // a column the frame doesn't have: ignored, commit succeeds un-statted
      assert(sink.addBatchStats(1L, batch(0 until 5, 0L, 10L), Seq("nope")))
      assert(sink.committed().find(_.batch == 1L).get.stats.isEmpty)
    } finally graft.operators.LayoutOps.deleteTree(Paths.get(dir))
  }

  test("compaction folds stats as the union; a missing stat drops the column") {
    val (dir, sink) = freshLake()
    try {
      sink.addBatchStats(0L, batch(0 until 40, 0L, 100L), Seq("user_id"))
      sink.addBatchStats(1L, batch(40 until 80, 200L, 300L), Seq("user_id"))
      sink.compactInPlace(spark)
      val fold = sink.committed()
      assert(fold.size === 1 && fold.head.batch < 0)
      val s = fold.head.stats("user_id")
      assert(s._1 >= 0L && s._1 < 100L && s._2 >= 200L && s._2 < 300L)
      // pruning still correct through the fold
      assert(sink.pruneEntries(Map("user_id" -> ((150L, 160L)))).size === 1)
      assert(sink.readPruned(spark, Map("user_id" -> ((0L, 99L))))
        .filter(col("user_id") <= 99L).count() ===
        sink.read(spark).filter(col("user_id") <= 99L).count())

      // second lake: one statted + one UN-statted commit → fold must DROP
      // the column (a kept union would under-cover the un-statted rows)
      val (dir2, sink2) = freshLake()
      try {
        sink2.addBatchStats(0L, batch(0 until 40, 0L, 100L), Seq("user_id"))
        sink2.addBatch(1L, batch(40 until 80, 200L, 300L))
        sink2.compactInPlace(spark)
        assert(sink2.committed().head.stats.isEmpty)
        // and the fold is therefore always a candidate
        assert(sink2.pruneEntries(Map("user_id" -> ((900000L, 900001L)))).size === 1)
      } finally graft.operators.LayoutOps.deleteTree(Paths.get(dir2))
    } finally graft.operators.LayoutOps.deleteTree(Paths.get(dir))
  }

  test("streaming ingest records stats per microbatch; pruned read after the run") {
    // the 100-TB shape: foreachBatch commits carry zone stats for free (same
    // one-pass aggregate), and a later analytical read skips cold segments
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.SQLContext]
    val (dir, sink) = freshLake()
    try {
      val mem = MemoryStream[(Long, Long)]
      val q = mem.toDF().toDF("event_id", "user_id").writeStream
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-lscp").toString)
        .trigger(Trigger.ProcessingTime(0))
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          sink.addBatchStats(id, b, Seq("user_id"), tsCol = "none"); ()
        }
        .start()
      def feed(rows: Seq[(Long, Long)]): Unit = {
        mem.addData(rows: _*); q.processAllAvailable()
      }
      feed((0L until 50L).map(i => (i, i % 100L)))
      feed((50L until 100L).map(i => (i, 5000L + i % 100L)))
      feed((100L until 150L).map(i => (i, 90000L + i % 100L)))
      q.stop()
      assert(sink.committed().count(_.stats.contains("user_id")) === 3)
      val box = Map("user_id" -> ((5000L, 5099L)))
      assert(sink.pruneEntries(box).size === 1)
      val got = sink.readPruned(spark, box)
        .filter(col("user_id").between(5000L, 5099L))
        .select("event_id").as[Long].collect().sorted
      assert(got === (50L until 100L).toArray)
    } finally graft.operators.LayoutOps.deleteTree(Paths.get(dir))
  }

  test("OPTIMIZE ZORDER fold: file-level zone map inside the compacted segment") {
    val (dir, sink) = freshLake()
    try {
      // 4 commits, each spanning the FULL user range (so segment-level
      // stats alone cannot prune a narrow box at all)
      (0 until 4).foreach { i =>
        sink.addBatchStats(i.toLong,
          batch(i * 100 until (i + 1) * 100, 0L, 100000L), Seq("user_id")) }
      assert(sink.pruneEntries(Map("user_id" -> ((40000L, 41000L)))).size === 4)
      sink.compactInPlace(spark, zorderCols = Seq("user_id", "event_id"),
        zorderFiles = 8)
      val fold = sink.committed()
      assert(fold.size === 1 && fold.head.batch < 0)
      // fold-entry stats for the Z-columns are the zone map's exact bounds
      assert(fold.head.stats.contains("user_id") &&
        fold.head.stats.contains("event_id"))
      val zm = graft.operators.LayoutOps.readZoneMap(s"$dir/batch=${fold.head.batch}")
      assert(zm.files.map(_._2).sum === 400L)
      // a narrow box keeps strictly fewer FILES than the fold holds —
      // the resolution folding destroyed at segment level is back
      val box = Map("user_id" -> graft.operators.LayoutOps.ColRange(40000L, 41000L))
      assert(zm.surviving(box).size < zm.filesTotal)
      // and the pruned read loses nothing vs the full read
      val exact = (d: org.apache.spark.sql.DataFrame) =>
        d.filter(col("user_id").between(40000L, 41000L))
          .agg(count(lit(1)), coalesce(sum("event_id"), lit(0L)))
          .as[(Long, Long)].head()
      assert(exact(sink.readPruned(spark, Map("user_id" -> ((40000L, 41000L))))) ===
        exact(sink.read(spark)))
      // wide box: everything still readable through the zone-mapped fold
      assert(sink.readPruned(spark, Map("user_id" -> ((0L, 100000L)))).count() === 400L)
    } finally graft.operators.LayoutOps.deleteTree(Paths.get(dir))
  }

  test("relocated lake: zone-mapped fold resolves files against the NEW dir") {
    val (dir, sink) = freshLake()
    val moved = Files.createTempDirectory("graft-lakemoved").toString
    try {
      (0 until 3).foreach { i =>
        sink.addBatchStats(i.toLong,
          batch(i * 100 until (i + 1) * 100, 0L, 100000L), Seq("user_id")) }
      sink.compactInPlace(spark, zorderCols = Seq("user_id", "event_id"),
        zorderFiles = 4)
      // MOVE the whole lake (zone maps must store segment-relative names,
      // not write-time absolute URIs, for this to read the moved files)
      graft.operators.LayoutOps.deleteTree(Paths.get(moved))
      Files.move(Paths.get(dir), Paths.get(moved))
      val sink2 = new LakeSink(moved)
      val box = Map("user_id" -> ((40000L, 41000L)))
      val got = sink2.readPruned(spark, box)
        .filter(col("user_id").between(40000L, 41000L)).count()
      val want = sink2.read(spark)
        .filter(col("user_id").between(40000L, 41000L)).count()
      assert(got === want)
      assert(sink2.readPruned(spark, Map("user_id" -> ((0L, 100000L)))).count() === 300L)
    } finally {
      graft.operators.LayoutOps.deleteTree(Paths.get(dir))
      graft.operators.LayoutOps.deleteTree(Paths.get(moved))
    }
  }

  test("zordered fold coexists with a graduated (plain) segment in one pruned read") {
    val (dir, sink) = freshLake()
    try {
      sink.addBatchStats(0L, batch(0 until 50, 0L, 1000L), Seq("user_id"))
      sink.addBatchStats(1L, batch(50 until 100, 0L, 1000L), Seq("user_id"))
      // big segment graduates (never folded); the two small ones z-fold
      sink.addBatchStats(2L, batch(100 until 400, 50000L, 51000L), Seq("user_id"))
      sink.compactInPlace(spark, maxFoldRows = 200L,
        zorderCols = Seq("user_id", "event_id"), zorderFiles = 4)
      val es = sink.committed()
      assert(es.size === 2) // graduated + fold
      val all = sink.readPruned(spark, Map("user_id" -> ((0L, 100000L))))
      assert(all.count() === 400L)
      // box hitting only the graduated segment: the fold's files all prune
      val g = sink.readPruned(spark, Map("user_id" -> ((50000L, 51000L))))
        .filter(col("user_id").between(50000L, 51000L))
      assert(g.count() ===
        sink.read(spark).filter(col("user_id").between(50000L, 51000L)).count())
    } finally graft.operators.LayoutOps.deleteTree(Paths.get(dir))
  }

  test("manifest json round-trips stats (incl. a quoted column name)") {
    val e = LakeSink.Committed(3L, 10L, Some((5L, 9L)), Seq((0L, 2L)),
      Map("user_id" -> ((1L, 99L)), "we\"ird" -> ((-5L, 5L))))
    val line = LakeSink.entryJson(e)
    assert(LakeSink.Committed.parse(line) === e)
  }
}
