package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** The statement lake table.
  *
  * Layout is the scalable-columnar precedent in the reference — ClickHouse's
  * `(event_id UUID, emission_time DateTime64, event String)` table
  * (/root/reference/src/ralph/backends/data/clickhouse.py:43-62) — widened
  * with pushdown columns so every LRS filter (SURVEY.md §2.2) hits parquet
  * column statistics instead of parsing JSON at scan time, and partitioned
  * by `date(ts)` + `source` so since/until and source predicates prune whole
  * partitions at 100 TB (the reference gets this from its stores' indexes).
  *
  * Columns: event_id, ts (statement timestamp), stored, verb_id,
  * activity_id, registration, actor_* IFI scalars, stmt (full parsed
  * struct), event (original JSON — lax passthrough), source, date.
  */
object Store {

  /** Project statement-JSON rows into the lake layout.
    * @param df frame with `stmtCol` (statement JSON) and a `source` column */
  def project(df: DataFrame, stmtCol: String = "xapi"): DataFrame = {
    val stmt = from_json(col(stmtCol), Schemas.statement)
    val src = if (df.columns.contains("source")) col("source") else lit("default")
    df.select(
      stmt.getField("id").as("event_id"),
      stmt.getField("timestamp").cast("timestamp").as("ts"),
      stmt.getField("stored").cast("timestamp").as("stored"),
      stmt.getField("verb").getField("id").as("verb_id"),
      // activity filter applies to Activity objects only (objectType absent
      // defaults to Activity — lrs/fs.py:305-313)
      when(stmt.getField("object").getField("objectType").isNull ||
           stmt.getField("object").getField("objectType") === "Activity",
        stmt.getField("object").getField("id")).as("activity_id"),
      stmt.getField("context").getField("registration").as("registration"),
      stmt.getField("actor").getField("mbox").as("actor_mbox"),
      stmt.getField("actor").getField("account").getField("name").as("actor_account_name"),
      stmt.as("stmt"),
      col(stmtCol).as("event"),
      src.as("source"),
      to_date(stmt.getField("timestamp").cast("timestamp")).as("date"))
  }

  /** Partitioned by (date, source); rows SORTED by ts inside each written
    * file so parquet row-group min/max stats on ts are tight — a since/
    * until window inside one day then skips most row groups instead of
    * scanning the whole partition (partition pruning gets the day, the
    * sort gets the hour). Costs one per-partition sort at write time, no
    * shuffle. */
  def write(df: DataFrame, path: String, mode: String = "append"): Unit =
    df.sortWithinPartitions("date", "source", "ts")
      .write.mode(mode).partitionBy("date", "source").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
