package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{JsonMerge, Uuid5}

/** Ingest-side statement enrichment (D1–D3), reference
  * /root/reference/src/ralph/api/routers/statements.py:564-579:
  *   - missing `id` → generated. The reference uses `uuid4()` (random); we
  *     use `uuid5(namespace, raw_statement)` so replays are idempotent — the
  *     determinism precedent is the converter's own id rule
  *     (edx/converters/xapi/base.py:34-39). Documented deviation.
  *   - `stored` = ingest wall time (passed in as a literal so jobs replay
  *     deterministically), `timestamp` = coalesce(timestamp, stored)
  *     (statements.py:84-93, utils.py:106-108).
  *   - `authority` = the writing identity's agent (statements.py:96-103).
  *
  * Enrichment merges into the ORIGINAL json via [[JsonMerge]], so fields
  * outside our schema survive (LaxStatement `extra="allow"` semantics).
  */
object Enrich {

  val DefaultAuthority = """{"mbox": "mailto:admin@example.com", "objectType": "Agent"}"""

  /** @param df         frame with a `stmtCol` column holding statement JSON
    * @param storedIso  the batch's `stored` time (ISO-8601, UTC)
    * @param authority  agent JSON of the authority
    */
  def apply(df: DataFrame, stmtCol: String, storedIso: String,
            authority: String = DefaultAuthority,
            uuidNamespace: String = graft.sources.Synth.UuidNamespace): DataFrame = {
    val j = col(stmtCol)
    val id = coalesce(get_json_object(j, "$.id"), Uuid5.uuid5Col(lit(uuidNamespace), j))
    val timestamp = coalesce(get_json_object(j, "$.timestamp"), lit(storedIso))
    val patch = to_json(struct(
      id.as("id"),
      timestamp.as("timestamp"),
      lit(storedIso).as("stored"),
      from_json(lit(authority), graft.model.Schemas.actorType).as("authority")),
      Map("ignoreNullFields" -> "true"))
    df.withColumn("stmt_id", id)
      .withColumn("stmt_ts", timestamp.cast("timestamp"))
      .withColumn("stored_ts", lit(storedIso).cast("timestamp"))
      .withColumn(stmtCol, JsonMerge.jsonMerge(j, patch))
  }
}
