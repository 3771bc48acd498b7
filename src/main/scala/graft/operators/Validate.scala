package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{EdxModelValid, TokenCodec}
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
    * output bytes, mirroring LaxStatement's extra="allow"). */
  def apply(input: DataFrame): DataFrame = {
    val raw = TokenCodec.decodeTokens(col("tokens"))
    val withRaw = input.withColumn("raw", raw)
      .withColumn("event", from_json(col("raw"), Schemas.edxEvent))

    val e = col("event")
    val model = selectModel(e("event_source"), e("event_type"), e("context").getField("path"))

    // Envelope presence = the reference's pydantic envelope parse
    // (base.py:105-169); from_json(PERMISSIVE) yields an all-null struct on
    // corrupt input, so missing mandatory fields ⇔ undecodable line.
    // Unparsable time is treated as invalid too (lrs/fs.py:344-352 precedent).
    val envelopeOk = e.isNotNull && e("username").isNotNull &&
      e("event_source").isNotNull && e("event_type").isNotNull &&
      e("time").isNotNull && e("context").isNotNull
    val ts = e("time").cast("timestamp")

    // Envelope FORMAT constraints (base.py:160-169, BaseContextField:89-94):
    // username 2-30 chars or ""; ip IPv4 or ""; referer http(s) URL or "";
    // course_id `^$|^course-v1:.+\+.+\+.+$`; user_id int | "" | null.
    // Format failures are model-validation failures (pydantic), not JSON
    // decode errors — they route to invalid_model.
    val ctxc = e("context")
    val envelopeFormatOk =
      (e("username") === "" || length(e("username")).between(2, 30)) &&
      (e("ip").isNull || e("ip") === "" ||
        e("ip").rlike("^([0-9]{1,3}\\.){3}[0-9]{1,3}$")) &&
      (e("referer").isNull || e("referer") === "" ||
        e("referer").rlike("^https?://")) &&
      (ctxc.getField("course_id").isNull ||
        ctxc.getField("course_id").rlike("^$|^course-v1:.+\\+.+\\+.+$")) &&
      (ctxc.getField("user_id").isNull || ctxc.getField("user_id") === "" ||
        ctxc.getField("user_id").rlike("^-?[0-9]+$"))

    // The entire 105-family payload + per-model envelope dispatch: one
    // native expression, one JSON parse per row, one generated static call.
    val modelOk = EdxModelValid(
      col("model"), e("event_source"), e("event"), e("name"), e("page"),
      e("session"), ctxc.getField("mode"))

    withRaw
      .withColumn("model", model)
      .withColumn("ts", ts)
      .withColumn("status",
        when(!envelopeOk || col("ts").isNull, StatusInvalidJson)
          .when(col("model").isNull, StatusUnknown)
          .when(!coalesce(envelopeFormatOk, lit(false)) || !modelOk, StatusInvalidModel)
          .otherwise(StatusOk))
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
