package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Extract parsers (S15/S16) — turn raw log lines into event JSON:
  *
  *  - GELF: each line is a GELF message; the event is its `short_message`
  *    field (/root/reference/src/ralph/parsers.py:28-61). Invalid lines are
  *    skipped and counted.
  *  - ES dump: each line is an Elasticsearch hit; the event is `_source`
  *    (parsers.py:64-91).
  */
object Extract {

  def gelf(df: DataFrame, line: Column): DataFrame =
    df.withColumn("event_str", get_json_object(line, "$.short_message"))
      .filter(col("event_str").isNotNull)

  def esDump(df: DataFrame, line: Column): DataFrame =
    df.withColumn("event_str", get_json_object(line, "$._source"))
      .filter(col("event_str").isNotNull)
}
