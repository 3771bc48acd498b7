package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL file backend (S1/S2) — the reference's FS data backend semantics
  * (/root/reference/src/ralph/backends/data/fs.py:163-378):
  *
  *  - read: one JSON document per line, streamed; invalid lines skipped
  *    (ignore_errors) or failed; optional max_statements truncation.
  *  - write: CREATE/WRITE fails if the target exists; UPDATE overwrites;
  *    APPEND appends; DELETE unsupported.
  *
  * Spark shape: `spark.read.text` + per-row JSON handling keeps the raw
  * line (lax passthrough) — `spark.read.json` would re-serialise through an
  * inferred schema and drop/reorder unknown fields.
  */
object FsJsonl {

  /** Read JSONL: returns (raw line, valid flag). Lines that are not JSON
    * objects are flagged, mirroring parse_iterable_to_dict's per-line skip
    * (utils.py:192-246). */
  def read(spark: SparkSession, path: String,
           ignoreErrors: Boolean = true,
           maxStatements: Option[Int] = None): DataFrame = {
    val raw = spark.read.text(path).toDF("raw")
      .filter(length(trim(col("raw"))) > 0)
      .withColumn("valid",
        get_json_object(col("raw"), "$").isNotNull &&
          col("raw").startsWith("{"))
    val filtered = if (ignoreErrors) raw.filter(col("valid")).drop("valid") else raw.drop("valid")
    maxStatements.map(filtered.limit).getOrElse(filtered) // O4 truncation (base.py:337-345)
  }

  sealed trait WriteOp
  case object Create extends WriteOp // fail if exists (fs.py:300-309)
  case object Update extends WriteOp // overwrite
  case object Append extends WriteOp

  /** Write a single-column frame of JSON strings as JSONL. */
  def write(df: DataFrame, col0: String, path: String, op: WriteOp = Create): Unit = {
    val exists = new java.io.File(path).exists()
    op match {
      case Create if exists =>
        throw new IllegalStateException(
          s"$path exists and operation mode is CREATE") // fs.py:300-309
      case Create | Update =>
        df.select(col(col0)).write.mode("overwrite").text(path)
      case Append =>
        df.select(col(col0)).write.mode("append").text(path)
    }
  }
}

/** History ledger (S17, backends/data/mixins.py:11-71): a table of
  * processed container names; `new=true` listings anti-join against it. */
object History {
  import org.apache.spark.sql.SaveMode

  def record(spark: SparkSession, path: String, ids: Seq[String]): Unit = {
    import spark.implicits._
    ids.toDF("container").write.mode(SaveMode.Append).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    if (new java.io.File(path).exists()) spark.read.parquet(path)
    else spark.emptyDataFrame.withColumn("container", lit(""))
      .limit(0).select(col("container").cast("string"))

  /** `list(new=True)` = containers not yet in the history (fs.py:144-147). */
  def onlyNew(containers: DataFrame, history: DataFrame): DataFrame =
    containers.join(history, Seq("container"), "left_anti")
}
