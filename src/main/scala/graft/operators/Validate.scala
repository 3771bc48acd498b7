package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TokenCodec
import graft.model.Schemas

/** Scan-time validation: model selection + per-model constraints.
  *
  * Reference semantics (/root/reference/src/ralph/models/selector.py:29-145,
  * validator.py:22-77): a decision tree over `(event_source, event_type)`
  * rules picks the candidate model (the `Server` model matches when
  * event_type equals context.path — a value-at-other-path rule,
  * edx/server.py:60-62); the first model that parses wins; rows with no
  * match are UnknownEvent; invalid JSON is skipped and counted.
  *
  * Spark design: selection is a Catalyst `InSet` dispatch (Catalyst's
  * common-subexpression elimination + short-circuit codegen reproduce the
  * reference's most-common-rule factoring, SURVEY.md §4); the per-model
  * payload check is ONE native expression ([[graft.functions.EdxModelValid]]
  * over the [[graft.functions.EdxModels]] registry — all 105 catalog
  * families, exact) whose generated code is a single static call, so the
  * whole validate stage stays inside whole-stage codegen. The stage is a
  * pure projection: no shuffle, fully pushdown-friendly.
  */
object Validate {

  /** Statuses routed like the reference validator's counters/logging
    * (validator.py:33-47): ok | invalid_json | unknown | invalid_model. */
  val StatusOk = "ok"
  val StatusInvalidJson = "invalid_json"
  val StatusUnknown = "unknown"
  val StatusInvalidModel = "invalid_model"

  /** Selector: model name per row, null = no match (UnknownEvent).
    * Keys mirror each family's `__selector__`
    * (edx/navigational/statements.py:32, video/statements.py, enrollment,
    * server.py:60-62). */
  def selectModel(src: Column, typ: Column, ctxPath: Column): Column =
    when(src === "server" && typ === ctxPath, lit("server"))
      .when(src === "server" && typ.isin(ModelCatalog.serverTypes: _*), typ)
      .when(src === "browser" && typ.isin(ModelCatalog.browserTypes: _*), typ)
      .otherwise(lit(null))

  /** Full validation: input table (doc_id, tokens, n_tok, source) →
    * columns (doc_id, source, raw, event, model, ts, status).
    * `raw` is the decoded original text (lax passthrough — the canonical
    * output bytes, mirroring LaxStatement's extra="allow").
    *
    * The whole verdict — envelope presence (pydantic envelope parse,
    * base.py:105-169) + format constraints (base.py:160-169), the selector,
    * every per-model payload/envelope rule, event-time parse — is ONE
    * single-child native expression over the raw line
    * ([[graft.functions.EdxRowValidate]]): one Jackson parse per row, and
    * predicate pushdown substituting `status` into a downstream filter can
    * only duplicate that single call (a verdict assembled from many
    * subexpressions re-evaluates all of them per filter — measured 27× the
    * single-evaluation row cost on the r1-shaped plan). The `event` struct
    * column remains for downstream stages (Convert), evaluated only where
    * referenced — after the status filter. */
  def apply(input: DataFrame): DataFrame = {
    val raw = TokenCodec.decodeTokens(col("tokens"))
    val v = graft.functions.EdxRowValidate(col("raw"))
    input.withColumn("raw", raw)
      // full envelope struct for ad-hoc consumers (lax passthrough view);
      // the production convert path reads the verdict's own fields instead,
      // so this from_json is pruned out of pipeline plans
      .withColumn("event", from_json(col("raw"), Schemas.edxEvent))
      .withColumn("env", v)
      .withColumn("model", col("env").getField("model"))
      .withColumn("ts", col("env").getField("ts"))
      .withColumn("status", col("env").getField("status"))
  }

  /** Valid rows only (ignore_errors=true path, validator.py:33-46). */
  def valid(input: DataFrame): DataFrame = apply(input).filter(col("status") === StatusOk)

  /** Side output: rejected rows with their reason (error routing V3). */
  def rejected(input: DataFrame): DataFrame = apply(input).filter(col("status") =!= StatusOk)

  /** Attach per-(micro)batch counters, reference validator's total/invalid
    * (validator.py:47) via `observe` — readable from QueryProgress. */
  def observed(df: DataFrame): DataFrame =
    df.observe("validate_metrics",
      count(lit(1)).as("total"),
      sum(when(col("status") =!= StatusOk, 1L).otherwise(0L)).as("invalid"))
}
