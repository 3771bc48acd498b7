package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LDP archive source (S11) — the reference's OVH Logs Data Platform
  * backend (/root/reference/src/ralph/backends/data/ldp.py:108-255):
  * read-only gzip'd line-delimited archives, listed per stream, with the
  * history ledger marking which archives were already consumed
  * (ldp.py:204-212 records `read` entries; `list(new=True)` filters them).
  *
  * Spark shape: the codec layer is free — Spark's text source decodes
  * `.gz` natively. One gzip archive = one partition (gzip is not
  * splittable), so at scale parallelism = number of archives listed, which
  * matches LDP's many-small-archives layout; no custom reader needed.
  * The HTTP download step of the reference is replaced by the filesystem/
  * object-store path the archives land on (S9/S10 conf in ObjectStore).
  */
object Ldp {

  /** List archive files under `dir` (the reference's `list_()` over stream
    * archives, ldp.py:149-167). */
  def listArchives(spark: SparkSession, dir: String): DataFrame = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".gz"))
      .map(_.getAbsolutePath).toSeq
    import spark.implicits._
    files.toDF("container")
  }

  /** Read one or more archives as raw JSONL lines (ldp.py:169-202: the
    * archive is streamed and gzip-decoded; invalid lines are the consumer's
    * concern — same lax contract as FsJsonl.read). */
  def read(spark: SparkSession, paths: Seq[String],
           maxStatements: Option[Int] = None): DataFrame = {
    if (paths.isEmpty)
      return spark.emptyDataFrame.select(lit("").as("raw")).limit(0)
    val df = spark.read.text(paths: _*).toDF("raw")
      .filter(length(trim(col("raw"))) > 0)
    maxStatements.map(df.limit).getOrElse(df)
  }

  /** Read only archives not yet in the history ledger, then record them —
    * the `new=True` consumption loop (mixins.py:11-71 + ldp.py:204-212).
    *
    * The ledger is written only AFTER the archives are fully read once
    * (the reference appends the `read` entry after the archive is fully
    * streamed, ldp.py:240-252) — r2 recorded at plan-build time, so a
    * downstream failure (or a never-run plan) permanently marked unread
    * archives consumed (ADVICE r2). The returned frame is NOT cached:
    * every action re-scans the (immutable) archives, and the
    * `maxStatements` subset is deterministic by construction (sorted
    * archive order + per-archive cumulative cutoff — see
    * [[readNewWithCommit]]), so a re-scan always yields the same rows;
    * callers that must tie the ledger write to a durable sink's success
    * use [[readNewWithCommit]] and own the commit point. */
  def readNew(spark: SparkSession, dir: String, historyPath: String,
              maxStatements: Option[Int] = None): DataFrame = {
    val (out, commit) = readNewWithCommit(spark, dir, historyPath, maxStatements)
    // full read BEFORE the ledger records consumption. Deliberately NOT
    // persisted: a consumption-loop poller calls this forever, and a
    // persist-per-call with no owner leaks executor storage; archives are
    // immutable, so the caller's action re-reading them is merely a second
    // scan (callers that cannot afford it use readNewWithCommit and own
    // both the caching and the commit point).
    out.count()
    commit()
    out
  }

  /** As [[readNew]] but the caller owns the commit point: the ledger
    * records the archives as consumed only when the returned callback is
    * invoked — call it after the downstream write succeeds (exactly the
    * reference's stream-then-record order, lifted to caller granularity).
    *
    * With `maxStatements`, the limited read is DETERMINISTIC BY
    * CONSTRUCTION: archives are taken in sorted-path order up to a
    * per-archive cumulative-count cutoff, plus the first rows (file order)
    * of the boundary archive — the reference's stream-archives-in-sequence
    * order, ldp.py:169-212. r3 instead applied a global `limit` over an
    * unordered multi-archive scan and re-evaluated it at commit time: a
    * global limit is not guaranteed to pick the same rows across actions,
    * so the ledger could mark an archive consumed while the caller's
    * earlier write action took a DIFFERENT subset — the unwritten rows
    * then lost to the new=True loop forever (ADVICE r3). Only archives
    * whose EVERY row fits inside the limit are recorded (ldp.py:240-252 —
    * a truncated archive must not be marked consumed); the boundary
    * archive is re-read whole on the next poll — at-least-once, matching
    * a reference restart. */
  def readNewWithCommit(spark: SparkSession, dir: String, historyPath: String,
                        maxStatements: Option[Int] = None): (DataFrame, () => Unit) = {
    val fresh = History.onlyNew(listArchives(spark, dir),
      History.read(spark, historyPath))
      .collect().map(_.getString(0)).toSeq.sorted // driver-sized metadata
    maxStatements match {
      case None =>
        (read(spark, fresh, None),
          () => { if (fresh.nonEmpty) History.record(spark, historyPath, fresh); () })
      case Some(lim) =>
        // per-archive row counts, taken CHUNK BY CHUNK in sorted order and
        // stopped at the cutoff: a poller with a small limit against a 10k-
        // archive backlog must not gzip-decode the whole backlog per poll
        // (review r4 #3 — the one-pass count was O(backlog); this is
        // O(consumed + one chunk)). input_file_name yields URIs; match by
        // path suffix.
        var cum = 0L
        val full = scala.collection.mutable.ArrayBuffer.empty[String]
        var boundary: Option[(String, Long)] = None
        var done = false
        fresh.grouped(16).takeWhile(_ => !done).foreach { chunk =>
          val counts = read(spark, chunk, None)
            .groupBy(input_file_name().as("f")).count()
            .collect().map(r => (r.getString(0), r.getLong(1))).toMap
          def rowsOf(path: String): Long =
            counts.collectFirst { case (f, n) if f.endsWith(path) => n }
              .getOrElse(0L)
          val it = chunk.iterator
          while (it.hasNext && !done) {
            val p = it.next()
            val n = rowsOf(p)
            if (cum + n <= lim) { full += p; cum += n }
            else { if (lim - cum > 0) boundary = Some((p, lim - cum)); done = true }
          }
        }
        val consumed = full.toSeq
        val fullDf = read(spark, consumed, None)
        val out = boundary match {
          // a single-archive scan is one gzip partition read in file
          // order, so this limit is the archive's FIRST rem rows — the
          // same rows every action
          case Some((p, rem)) => fullDf.unionAll(read(spark, Seq(p), None).limit(rem.toInt))
          case None => fullDf
        }
        (out,
          () => { if (consumed.nonEmpty) History.record(spark, historyPath, consumed); () })
    }
  }
}
