package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.XapiEquivalent

/** POST/PUT ingest semantics (SURVEY.md §2.4, reference
  * /root/reference/src/ralph/api/routers/statements.py:543-655):
  *
  *  D4 — ANY duplicate statement id within one POST batch → the whole batch
  *       is rejected with 400, even when the duplicates are byte-equal
  *       (statements.py:568-574: `len(set(ids)) != len(ids)` guards before
  *       anything is written). `Result.rejected` carries that verdict and
  *       `toWrite` is empty for a rejected batch, so a caller that ignores
  *       the flag still cannot write a dup-id batch.
  *  D5 — ids already stored with EQUIVALENT content → silently dropped.
  *  D6 — ids already stored with DIFFERENT content → 409 Conflict rows.
  *
  * Spark shape: D4 is a group count per id; D5/D6 are one broadcast-friendly
  * left join against the store on `event_id` followed by the equivalence
  * expression — the store side is pre-filtered by the incoming id set, so at
  * 100 TB the probe stays a partition-pruned index lookup, never a full-table
  * join (mirrors `query_statements_by_ids`, statements.py:587-605).
  */
object Ingest {

  case class Result(toWrite: DataFrame, conflicts: DataFrame, duplicates: DataFrame,
                    intraBatchDups: Long) {
    /** D4 verdict: the reference 400s the whole POST on any duplicate id. */
    def rejected: Boolean = intraBatchDups > 0
  }

  /** @param store    existing lake frame ([[Store]] layout)
    * @param incoming enriched batch with `stmt_id` + statement JSON `stmtCol` */
  def post(store: DataFrame, incoming: DataFrame, stmtCol: String = "xapi"): Result = {
    // D4: any repeated stmt_id (byte-equal or not) rejects the whole batch
    val intraDup = incoming.groupBy("stmt_id").count().filter(col("count") > 1).count()
    if (intraDup > 0) {
      val empty = incoming.limit(0)
      // same schema as the probed outputs below (`_stored_event` appended):
      // a caller unioning Result frames across batches must not hit an
      // AnalysisException on the rejected path (ADVICE r2)
      val emptyProbed = empty.withColumn("_stored_event", lit(null).cast("string"))
      return Result(toWrite = empty, conflicts = emptyProbed,
        duplicates = emptyProbed, intraBatchDups = intraDup)
    }
    val batch = incoming

    // D5/D6: probe only the incoming id range — join, not full scan
    val existing = store
      .join(batch.select(col("stmt_id").as("event_id")).distinct(), Seq("event_id"), "left_semi")
      .select(col("event_id"), col("event").as("_stored_event"))

    val probed = batch.join(existing, batch("stmt_id") === existing("event_id"), "left")
    val isDup = col("_stored_event").isNotNull &&
      XapiEquivalent.xapiEquivalent(col(stmtCol), col("_stored_event"))
    val isConflict = col("_stored_event").isNotNull && !isDup

    Result(
      toWrite = probed.filter(col("_stored_event").isNull).drop("_stored_event", "event_id"),
      conflicts = probed.filter(isConflict).drop("event_id"),
      duplicates = probed.filter(isDup).drop("event_id"),
      intraBatchDups = intraDup)
  }

  /** Batch-path cross-store dedup used by the pipeline: keep first
    * occurrence per id (deterministic winner by ts then content). */
  def dedupExact(df: DataFrame, idCol: String = "id"): DataFrame =
    df.dropDuplicates(idCol)

  /** PUT /statements?statementId=X (statements.py:460-541): exactly one
    * statement; its id must equal the URL id (enforced by the caller);
    * otherwise the same equivalence rules as POST — returns
    * (shouldWrite, isConflict). */
  def put(store: DataFrame, statementJson: String, statementId: String): (Boolean, Boolean) = {
    val existing = store.filter(col("event_id") === statementId)
      .select("event").collect()
    if (existing.isEmpty) (true, false)
    else if (XapiEquivalent.equivalent(statementJson, existing.head.getString(0)))
      (false, false) // 204: silent no-op
    else (false, true) // 409 Conflict
  }
}
