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
  * Spark design: one chained `when()` per selector rule — Catalyst's
  * common-subexpression elimination and short-circuit codegen reproduce the
  * reference's most-common-rule factoring for free (SURVEY.md §4). The
  * validate stage is a pure projection: no shuffle, fully pushdown-friendly.
  */
object Validate {

  /** Statuses routed like the reference validator's counters/logging
    * (validator.py:33-47): ok | invalid_json | unknown | invalid_model. */
  val StatusOk = "ok"
  val StatusInvalidJson = "invalid_json"
  val StatusUnknown = "unknown"
  val StatusInvalidModel = "invalid_model"

  private def nonEmpty(c: Column): Column = c.isNotNull && c =!= ""

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

    // Envelope sanity = reference's pydantic envelope parse (base.py:105-169)
    val envelopeOk = e.isNotNull && e("username").isNotNull &&
      e("event_source").isNotNull && e("event_type").isNotNull &&
      e("time").isNotNull && e("context").isNotNull
    // from_json(PERMISSIVE) yields an all-null struct on corrupt input;
    // treat unparsable time as invalid too (lrs/fs.py:344-352 precedent).
    val ts = e("time").cast("timestamp")

    val video = from_json(e("event"), Schemas.videoPayload)
    val seq = from_json(e("event"), Schemas.seqPayload)
    val enr = from_json(e("event"), Schemas.enrollmentPayload)
    val serverPayload = from_json(e("event"), Schemas.serverPayload)
    val problem = from_json(e("event"), Schemas.problemPayload)
    val textbook = from_json(e("event"), Schemas.textbookPayload)
    val videoExtra = from_json(e("event"), Schemas.videoExtraPayload)
    val misc = from_json(e("event"), Schemas.miscPayload)

    // from_json yields an all-null struct on corrupt payloads, so require the
    // model's mandatory fields (GET/POST are required on ServerEventField,
    // edx/server.py:25-29 — a 512-char-truncated JSON string fails here)
    val modelOk = when(col("model") === "server",
        serverPayload.getField("GET").isNotNull && serverPayload.getField("POST").isNotNull)
      .when(col("model") === "page_close", e("event") === "{}")
      .when(col("model") === "seq_goto",
        seq.isNotNull && nonEmpty(seq("id")) && seq("old").isNotNull && seq("new").isNotNull)
      .when(col("model") === "seq_next", seq.isNotNull && seq("new") === seq("old") + 1)
      .when(col("model") === "seq_prev", seq.isNotNull && seq("new") === seq("old") - 1)
      .when(col("model") === "load_video", video.isNotNull && nonEmpty(video("id")) && nonEmpty(video("code")))
      .when(col("model").isin("play_video", "pause_video", "stop_video"),
        video.isNotNull && nonEmpty(video("id")) && video("currentTime").isNotNull)
      .when(col("model") === "seek_video",
        video.isNotNull && nonEmpty(video("id")) &&
          video("old_time").isNotNull && video("new_time").isNotNull)
      .when(col("model").isin("edx.course.enrollment.activated",
          "edx.course.enrollment.deactivated", "edx.course.enrollment.mode_changed",
          "edx.course.enrollment.upgrade.succeeded"),
        enr.isNotNull && nonEmpty(enr("course_id")) && nonEmpty(enr("user_id")))
      // second-tier exact payloads --------------------------------------
      // server problem events (problem_interaction/fields/events.py)
      .when(col("model") === "problem_check" && col("source") === "server",
        nonEmpty(problem("problem_id")) && problem("attempts").isNotNull &&
          problem("grade").isNotNull && problem("max_grade").isNotNull &&
          problem("success").isin("correct", "incorrect"))
      .when(col("model") === "problem_check_fail",
        nonEmpty(problem("problem_id")) && problem("failure").isin("closed", "unreset"))
      .when(col("model") === "showanswer", nonEmpty(problem("problem_id")))
      // browser problem_check: event is a URL-encoded STRING, not JSON
      // (problem_interaction/statements.py:88)
      .when(col("model") === "problem_check", e("event").isNotNull)
      // textbook.pdf.* refinements (textbook_interaction/fields/events.py)
      .when(col("model").isin("textbook.pdf.search.executed",
          "textbook.pdf.search.navigatednext"),
        textbook("name") === e("event_type") && textbook("page").isNotNull &&
          textbook("query").isNotNull)
      .when(col("model") === "textbook.pdf.zoom.buttons.changed",
        textbook("name") === e("event_type") && textbook("page").isNotNull &&
          textbook("direction").isin("in", "out"))
      .when(col("model") === "textbook.pdf.page.scrolled",
        textbook("name") === e("event_type") && textbook("page").isNotNull &&
          textbook("direction").isin("up", "down"))
      .when(col("model") === "textbook.pdf.zoom.menu.changed",
        textbook("name") === e("event_type") && textbook("page").isNotNull &&
          textbook("amount").isNotNull)
      // textbook.pdf.*: name echoes event_type; page is an int
      // (textbook_interaction/fields/events.py:17-130)
      .when(col("model").startsWith("textbook.pdf."),
        textbook("name") === e("event_type") &&
          (textbook("page").isNotNull || col("model") === "textbook.pdf.chapter.navigated"))
      // video extras (video/fields/events.py:85-113)
      .when(col("model").isin("hide_transcript", "show_transcript"),
        nonEmpty(videoExtra("id")) && videoExtra("current_time").isNotNull)
      .when(col("model") === "speed_change_video",
        nonEmpty(videoExtra("id")) &&
          videoExtra("old_speed").isin("0.75", "1.0", "1.25", "1.50", "2.0") &&
          videoExtra("new_speed").isin("0.75", "1.0", "1.25", "1.50", "2.0"))
      // third-tier exact payloads (misc families) ------------------------
      .when(col("model").isin("edx.bookmark.added", "edx.bookmark.removed",
          "edx.bookmark.accessed"),
        nonEmpty(misc("bookmark_id")) && nonEmpty(misc("component_usage_id")))
      .when(col("model") === "edx.bookmark.listed",
        misc("bookmarks_count").isNotNull &&
          misc("list_type").isin("per_course", "all_courses"))
      .when(col("model") === "xblock.poll.submitted",
        nonEmpty(misc("url_name")) && nonEmpty(misc("choice")))
      .when(col("model") === "xblock.survey.submitted", nonEmpty(misc("url_name")))
      .when(col("model").isin("edx.drag_and_drop_v2.feedback.opened",
          "edx.drag_and_drop_v2.feedback.closed"),
        misc("content").isNotNull && misc("manually").isNotNull)
      .when(col("model") === "edx.drag_and_drop_v2.item.dropped",
        misc("item_id").isNotNull && misc("is_correct").isNotNull)
      .when(col("model").isin("edx.cohort.user_added", "edx.cohort.user_removed"),
        misc("cohort_id").isNotNull && nonEmpty(misc("name")) && misc("user_id").isNotNull)
      .when(col("model") === "edx.cohort.created",
        misc("cohort_id").isNotNull && nonEmpty(misc("name")))
      // edx.team.searched has no team_id (teams_related/fields/events.py:109)
      .when(col("model").startsWith("edx.team.") && col("model") =!= "edx.team.searched",
        nonEmpty(misc("team_id")))
      .when(col("model").isin("edx.certificate.created", "edx.certificate.revoked",
          "edx.certificate.shared", "edx.certificate.evidence_visited"),
        misc("enrollment_mode").isin("audit", "honor", "professional", "verified") &&
          misc("user_id").isNotNull)
      .when(col("model").startsWith("ubc.peer_instruction."), misc("answer").isNotNull)
      // fourth-tier exact payloads -------------------------------------
      // student notes (notes/fields/events.py): note body events
      .when(col("model").isin("edx.course.student_notes.added",
          "edx.course.student_notes.deleted", "edx.course.student_notes.edited",
          "edx.course.student_notes.viewed", "edx.course.student_notes.used_unit_link"),
        nonEmpty(misc("note_id")) && nonEmpty(misc("component_usage_id")))
      .when(col("model") === "edx.course.student_notes.searched",
        misc("number_of_results").isNotNull)
      .when(col("model") === "edx.course.student_notes.notes_page_viewed",
        misc("view").isin("Recent Activity", "Search Results"))
      // open response assessment (open_response_assessment/fields/events.py)
      .when(col("model").isin("openassessmentblock.peer_assess",
          "openassessmentblock.self_assess", "openassessmentblock.staff_assess"),
        nonEmpty(misc("submission_uuid")) &&
          misc("score_type").isin("PE", "SE", "ST") && nonEmpty(misc("scorer_id")))
      .when(col("model") === "openassessmentblock.create_submission",
        nonEmpty(misc("submission_uuid")) && misc("attempt_number").isNotNull)
      .when(col("model").isin("openassessmentblock.get_peer_submission",
          "openassessmentblock.get_submission_for_staff_grading",
          "openassessmentblock.save_submission",
          "openassessmentblock.submit_feedback_on_assessments"),
        e("event").isNotNull && e("event").startsWith("{"))
      // problem rescore (problem_interaction/fields/events.py:225-260)
      .when(col("model").isin("problem_rescore", "problem_rescore_fail"),
        nonEmpty(misc("problem_id")) && misc("new_score").isNotNull ||
          (col("model") === "problem_rescore_fail" && nonEmpty(misc("problem_id"))))
      // fifth-tier exact payloads -------------------------------------
      // hints (problem_interaction/fields/events.py:98-153)
      .when(col("model") === "edx.problem.hint.demandhint_displayed",
        misc("hint_index").isNotNull && misc("hint_len").isNotNull &&
          nonEmpty(misc("module_id")))
      .when(col("model") === "edx.problem.hint.feedback_displayed",
        nonEmpty(misc("module_id")) && misc("trigger_type").isin("single", "compound"))
      // reset/save problem variants (problem_interaction/fields/events.py:298-400)
      .when(col("model").isin("reset_problem", "save_problem_success"),
        nonEmpty(misc("problem_id")))
      .when(col("model") === "reset_problem_fail",
        nonEmpty(misc("problem_id")) && misc("failure").isin("closed", "not_done"))
      .when(col("model") === "save_problem_fail",
        nonEmpty(misc("problem_id")) && misc("failure").isin("closed", "done"))
      // certificate generation toggles (certificate/fields/events.py:87-103)
      .when(col("model").isin("edx.certificate.generation.enabled",
          "edx.certificate.generation.disabled"),
        misc("course_id").isNotNull)
      // done toggled (browser+server share the payload: {done: bool})
      .when(col("model") === "edx.done.toggled", misc("done").isNotNull)
      // book pdf reader (textbook_interaction/fields/events.py:240-270)
      .when(col("model") === "book",
        nonEmpty(misc("chapter")) &&
          misc("type").isin("gotopage", "prevpage", "nextpage"))
      // sixth-tier exact payloads --------------------------------------
      .when(col("model") === "edx.drag_and_drop_v2.item.picked_up",
        misc("item_id").isNotNull)
      .when(col("model") === "openassessment.upload_file",
        nonEmpty(misc("fileName")) && misc("fileSize").isNotNull)
      .when(col("model") === "edx.team.searched",
        misc("number_of_results").isNotNull)
      // cc menus carry the video base payload (video/statements.py:206-250)
      .when(col("model").isin("video_hide_cc_menu", "video_show_cc_menu"),
        nonEmpty(video("id")) && nonEmpty(video("code")))
      // ORA student training (open_response_assessment/fields/events.py:242-256)
      .when(col("model") === "openassessment.student_training_assess_example",
        nonEmpty(misc("submission_uuid")))
      // course tool accessed (bookmark/fields/events.py:95-103)
      .when(col("model") === "edx.course.tool.accessed",
        misc("tool_name").isin("edx.bookmarks", "edx.reviews", "edx.updates"))
      // library content (content_library_interaction/fields/events.py:56-84)
      .when(col("model") === "edx.librarycontentblock.content.assigned",
        misc("added").isNotNull)
      .when(col("model") === "edx.librarycontentblock.content.removed",
        misc("removed").isNotNull)
      // catalog families (ModelCatalog): selected, envelope-validated;
      // exact payload schemas are additive per family
      .when(col("model").isNotNull, e("event").isNotNull)
      .otherwise(lit(false))

    withRaw
      .withColumn("model", model)
      .withColumn("ts", ts)
      .withColumn("status",
        when(!envelopeOk || col("ts").isNull, StatusInvalidJson)
          .when(col("model").isNull, StatusUnknown)
          // null-safe: a null payload predicate (corrupt payload → null
          // fields → null comparisons) must mean invalid, not fall-through
          .when(!coalesce(modelOk, lit(false)), StatusInvalidModel)
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
