package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-once idempotent lake sink with a commit manifest — the sandbox
  * stand-in for an Iceberg append (no Iceberg runtime jar ships here; the
  * protocol is the same shape: write data files, then atomically commit a
  * manifest entry; readers only see committed batches).
  *
  * Idempotency model (north rule "exactly-once … resumable from
  * checkpoint"): `foreachBatch` may replay a batch after a crash; a replayed
  * batchId either (a) is already committed → skipped, or (b) was written but
  * not committed → its directory is overwritten then committed. Readers list
  * the manifest, so a torn write is invisible. This mirrors the reference's
  * idempotent id-keyed writes (ES `_id` index, Mongo deterministic `_id` —
  * backends/data/es.py:374-404, mongo.py:326-375) lifted to batch
  * granularity.
  *
  * Every row carries per-partition lineage columns `_batch_id`/`_part_id`,
  * and each commit records row counts — the north rule's "per-partition
  * lineage + metrics".
  */
class LakeSink(val path: String) extends Serializable {

  private def manifest = Paths.get(path, "_manifest.jsonl")

  def committedBatches(): Set[Long] =
    if (!Files.exists(manifest)) Set.empty
    else Files.readAllLines(manifest).asScala
      .filter(_.nonEmpty)
      .map(l => ujsonField(l, "batch").toLong).toSet

  // minimal JSON field extract (manifest lines are written by us)
  private def ujsonField(line: String, field: String): String = {
    val m = ("\"" + field + "\"\\s*:\\s*(\\d+)").r
    m.findFirstMatchIn(line).map(_.group(1)).getOrElse("-1")
  }

  /** The foreachBatch body. Returns true if the batch was newly committed. */
  def addBatch(batchId: Long, df: DataFrame): Boolean = {
    if (committedBatches().contains(batchId)) return false // replay → no-op
    val dir = s"$path/batch=$batchId"
    val withLineage = df
      .withColumn("_batch_id", lit(batchId))
      .withColumn("_part_id", spark_partition_id())
    withLineage.write.mode("overwrite").parquet(dir) // retry-safe rewrite
    // per-partition metrics from the just-written files (north rule:
    // "every microbatch emits per-partition lineage and metrics") —
    // one column-pruned read serves both the counts and the commit total
    val perPartRows = df.sparkSession.read.parquet(dir)
      .groupBy("_part_id").count().collect()
      .map(r => (r.get(0), r.getLong(1)))
    val perPart = perPartRows.map { case (p, n) => s"""{"part": $p, "rows": $n}""" }
    val rows = perPartRows.map(_._2).sum
    writeMetrics(batchId, perPart)
    commit(batchId, rows)
    true
  }

  /** MERGE-by-id variant: drops incoming rows whose id is already committed
    * (the reference's store-wide dedup, `query_statements_by_ids` —
    * statements.py:587-605). The watermarked dedup upstream bounds its state
    * by event time; this closes the gap for duplicates arriving later than
    * the watermark. The probe reads only the id column of committed batches
    * (column-pruned parquet scan); at lake scale this is the id-index
    * lookup a real table format (Iceberg bloom/partition stats) serves. */
  def addBatchMerged(batchId: Long, df: DataFrame, idCol: String): Boolean = {
    if (committedBatches().contains(batchId)) return false
    val spark = df.sparkSession
    val existing = read(spark)
    val batchUnique = df.dropDuplicates(idCol) // intra-batch dedup (D4)
    val novel =
      if (existing.isEmpty) batchUnique
      else batchUnique.join(
        existing.select(org.apache.spark.sql.functions.col(idCol)).distinct(),
        Seq(idCol), "left_anti")
    addBatch(batchId, novel)
  }

  /** Compaction: fold all committed micro-batch dirs into a partitioned
    * store table (small-file problem at 10^12 scale), deduping by id with a
    * deterministic winner (lowest batch id). */
  def compact(spark: SparkSession, targetPath: String, idCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val all = read(spark)
    if (!all.isEmpty) {
      val w = Window.partitionBy(idCol).orderBy(col("_batch_id"), col("_part_id"))
      all.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
        .write.mode("overwrite").parquet(targetPath)
    }
  }

  private def writeMetrics(batchId: Long, perPart: Array[String]): Unit = {
    Files.createDirectories(Paths.get(path, "_metrics"))
    val line = s"""{"batch": $batchId, "partitions": [${perPart.mkString(",")}]}\n"""
    Files.write(Paths.get(path, "_metrics", s"batch-$batchId.json"),
      line.getBytes(StandardCharsets.UTF_8))
  }

  def metrics(): Seq[String] = {
    val dir = Paths.get(path, "_metrics")
    if (!Files.exists(dir)) Seq.empty
    else Files.list(dir).iterator().asScala.toSeq.sortBy(_.toString)
      .map(p => Files.readString(p).trim)
  }

  /** Atomic manifest append: copy-on-write + rename. Single-writer (one
    * streaming query owns a sink), so no lock is needed. */
  private def commit(batchId: Long, rows: Long): Unit = {
    Files.createDirectories(Paths.get(path))
    val prev =
      if (Files.exists(manifest)) Files.readString(manifest) else ""
    val line = s"""{"batch": $batchId, "rows": $rows}\n"""
    val tmp = Paths.get(path, s"_manifest.tmp")
    Files.write(tmp, (prev + line).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Committed data only (snapshot isolation at batch granularity). */
  def read(spark: SparkSession): DataFrame = {
    val batches = committedBatches()
    if (batches.isEmpty) {
      spark.emptyDataFrame
    } else {
      val dirs = batches.toSeq.sorted.map(b => s"$path/batch=$b")
      spark.read.parquet(dirs: _*)
    }
  }
}
