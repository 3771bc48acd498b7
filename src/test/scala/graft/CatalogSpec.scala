package graft

import org.apache.spark.sql.functions._

import graft.functions.{EdxModels, TokenCodec}
import graft.operators.{ModelCatalog, Validate}

/** Full selector-catalog coverage: every reference `__selector__` key (105
  * models) routes to its model AND carries an exact payload rule —
  * a malformed `{"k": 1}` payload is rejected for every family whose
  * reference model constrains the payload (negative case per family), and a
  * reference-conforming payload is accepted for every family (positive case
  * per family). Payload fixtures transcribe the pydantic field definitions
  * in /root/reference/src/ralph/models/edx/ ** /fields/events.py.
  */
class CatalogSpec extends SparkSuite {
  import spark.implicits._

  private val Url = "https://lms.example.com/courses/c/x"
  private val Hex32 = "a" * 32
  private val ProblemId = s"block-v1:org+c+r+type@problem+block@$Hex32"
  private val UsageId = s"block-v1:org+c+r+type@problem+block@$Hex32"
  private val Chapter = "/asset-v1:org+c+r+type@asset+block/a.pdf"
  private val Uuid = "12345678-1234-1234-1234-123456789012"
  private val State =
    """{"correct_map": {}, "input_state": {}, "seed": 1, "student_answers": {}}"""
  private val AnsKey = s"${Hex32}_2_1"
  private val CMapEntry = """{"correctness": "correct", "msg": ""}"""
  private val Submission =
    """{"answer": "x", "correct": true, "input_type": "t", "question": "q", "response_type": "r", "variant": "v"}"""
  private val OraAssess =
    s"""{"feedback": "f", "parts": [{"option": "o", "criterion": {"name": "n", "points_possible": 3}}],
        "rubric": {"content_hash": "abc123"}, "scored_at": "2024-01-01T00:00:00",
        "scorer_id": "s1", "score_type": "PE", "submission_uuid": "$Uuid"}"""
  private val Cert =
    s""""certificate_id": "$Uuid", "certificate_url": "https://c.example.com/1",
        "course_id": "course-v1:a+b+c", "enrollment_mode": "honor", "user_id": 7"""
  private val NotesBase =
    """"component_usage_id": "u1", "highlighted_content": "h", "note_id": "n1", "note_text": "t""""
  private val LibBase =
    """"location": "l", "max_count": 2, "previous_count": 1, "result": [],"""
  private val Component =
    """{"original_usage_key": "k", "original_usage_version": "1", "usage_key": "u"}"""
  private val Pdf = s""""page": 2, "chapter": "$Chapter""""
  private val Search = """"caseSensitive": false, "highlightAll": true, "query": "q", "status": """""

  /** Conforming payload per (source, type); families absent here are the
    * lax-payload ones (EdxModels.laxPayload) where any payload conforms. */
  private val conforming: Map[(String, String), String] = {
    def video(extra: String = "") = s"""{"id": "v1", "code": "html5"$extra}"""
    val m = Map.newBuilder[(String, String), String]
    def server(t: String, p: String): Unit = m += (("server", t) -> p)
    def browser(t: String, p: String): Unit = m += (("browser", t) -> p)

    server("server", """{"GET": {}, "POST": {}}""")
    browser("page_close", "\"{}\"")
    browser("seq_goto", s"""{"id": "block-v1:o+c+r+type@sequential+block@$Hex32", "old": 3, "new": 7}""")
    browser("seq_next", s"""{"id": "block-v1:o+c+r+type@sequential+block@$Hex32", "old": 3, "new": 4}""")
    browser("seq_prev", s"""{"id": "block-v1:o+c+r+type@sequential+block@$Hex32", "old": 3, "new": 2}""")
    browser("load_video", video())
    browser("play_video", video(""", "currentTime": 2.5"""))
    browser("pause_video", video(""", "currentTime": 2.5"""))
    browser("stop_video", video(""", "currentTime": 9.0"""))
    browser("seek_video", video(""", "old_time": 1, "new_time": 2, "type": "onSlideSeek""""))
    browser("hide_transcript", video(""", "current_time": 2.5"""))
    browser("show_transcript", video(""", "current_time": 2.5"""))
    browser("speed_change_video",
      video(""", "currentTime": 1, "old_speed": "1.0", "new_speed": "1.50""""))
    browser("video_hide_cc_menu", video())
    browser("video_show_cc_menu", video())
    val enr = """{"course_id": "course-v1:a+b+c", "mode": "honor", "user_id": 7}"""
    server("edx.course.enrollment.activated", enr)
    server("edx.course.enrollment.deactivated", enr)
    server("edx.course.enrollment.mode_changed", enr)
    server("problem_check",
      s"""{"answers": {"$AnsKey": "x"}, "attempts": 1, "correct_map": {"$AnsKey": $CMapEntry},
          "grade": 1, "max_grade": 2, "problem_id": "$ProblemId", "state": $State,
          "submission": {"$AnsKey": $Submission}, "success": "correct"}""")
    server("problem_check_fail",
      s"""{"answers": {}, "failure": "closed", "problem_id": "$ProblemId", "state": $State}""")
    server("problem_rescore",
      s"""{"attempts": 1, "correct_map": $CMapEntry, "new_score": 1, "new_total": 2,
          "orig_score": 0, "orig_total": 2, "problem_id": "$ProblemId", "state": $State,
          "success": "correct"}""")
    server("problem_rescore_fail",
      s"""{"failure": "unreset", "problem_id": "$ProblemId", "state": $State}""")
    server("reset_problem",
      s"""{"new_state": $State, "old_state": $State, "problem_id": "$ProblemId"}""")
    server("reset_problem_fail",
      s"""{"failure": "not_done", "old_state": $State, "problem_id": "$ProblemId"}""")
    server("save_problem_fail",
      s"""{"answers": {}, "failure": "done", "problem_id": "$ProblemId", "state": $State}""")
    server("save_problem_success",
      s"""{"answers": {}, "problem_id": "$ProblemId", "state": $State}""")
    server("showanswer", s"""{"problem_id": "$ProblemId"}""")
    server("edx.problem.hint.demandhint_displayed",
      """{"hint_index": 0, "hint_len": 2, "hint_text": "h", "module_id": "m"}""")
    server("edx.problem.hint.feedback_displayed",
      """{"correctness": true, "hint_label": "l", "hints": [{"text": "t"}], "module_id": "m",
         "problem_part_id": "p", "question_type": "choiceresponse",
         "student_answer": ["a"], "trigger_type": "single"}""")
    browser("problem_graded", """["input_1=x", null]""")
    browser("problem_show", """{"problem": "p1"}""")
    browser("book", s"""{"chapter": "$Chapter", "name": "textbook.pdf.page.loaded", "new": 2, "type": "gotopage"}""")
    def pdf(t: String, extra: String = ""): Unit =
      browser(t, s"""{"name": "$t", $Pdf$extra}""")
    pdf("textbook.pdf.thumbnails.toggled")
    pdf("textbook.pdf.thumbnail.navigated", """, "thumbnail_title": "t"""")
    pdf("textbook.pdf.outline.toggled")
    browser("textbook.pdf.chapter.navigated",
      s"""{"name": "textbook.pdf.chapter.navigated", "chapter": "$Chapter", "chapter_title": "c"}""")
    pdf("textbook.pdf.page.navigated")
    pdf("textbook.pdf.zoom.buttons.changed", """, "direction": "in"""")
    pdf("textbook.pdf.zoom.menu.changed", """, "amount": "page-fit"""")
    pdf("textbook.pdf.display.scaled", """, "amount": 1.25""")
    pdf("textbook.pdf.page.scrolled", """, "direction": "down"""")
    pdf("textbook.pdf.search.executed", s", $Search")
    pdf("textbook.pdf.search.navigatednext", s", $Search, \"findPrevious\": true")
    pdf("textbook.pdf.search.highlight.toggled", s", $Search")
    pdf("textbook.pdf.searchcasesensitivity.toggled", s", $Search")
    val bk = s""""bookmark_id": "b1", "component_type": "vertical", "component_usage_id": "$UsageId""""
    browser("edx.bookmark.accessed", s"{$bk}")
    server("edx.bookmark.added", s"""{$bk, "course_id": "course-v1:a+b+c"}""")
    server("edx.bookmark.removed", s"""{$bk, "course_id": "course-v1:a+b+c"}""")
    server("edx.bookmark.listed",
      """{"bookmarks_count": 3, "list_type": "per_course", "page_number": 1, "page_size": 10}""")
    browser("edx.course.tool.accessed", """{"tool_name": "edx.bookmarks"}""")
    server("edx.certificate.created", s"""{$Cert, "generation_mode": "batch"}""")
    server("edx.certificate.revoked", s"""{$Cert, "source": "s"}""")
    server("edx.certificate.shared", s"""{$Cert, "social_network": "x"}""")
    server("edx.certificate.evidence_visited",
      s"""{$Cert, "social_network": "x", "source_url": "https://e.example.com/1"}""")
    server("edx.certificate.generation.enabled", """{"course_id": "course-v1:a+b+c"}""")
    server("edx.certificate.generation.disabled", """{"course_id": ""}""")
    server("edx.cohort.created", """{"cohort_id": 1, "name": "c"}""")
    server("edx.cohort.user_added", """{"cohort_id": 1, "name": "c", "user_id": 5}""")
    server("edx.cohort.user_removed", """{"cohort_id": 1, "name": "c", "user_id": 5}""")
    server("edx.librarycontentblock.content.assigned",
      s"""{$LibBase "added": [$Component]}""")
    server("edx.librarycontentblock.content.removed",
      s"""{$LibBase "reason": "overlimit", "removed": [$Component]}""")
    server("edx.done.toggled", """{"done": true}""")
    browser("edx.done.toggled", """{"done": false}""")
    server("edx.drag_and_drop_v2.feedback.closed", """{"content": "c", "manually": true}""")
    server("edx.drag_and_drop_v2.feedback.opened", """{"content": "c", "manually": false}""")
    server("edx.drag_and_drop_v2.item.dropped",
      """{"input": 1, "item_id": 2, "is_correct": true, "is_correct_location": true, "location": "top"}""")
    server("edx.drag_and_drop_v2.item.picked_up", """{"item_id": 2}""")
    browser("edx.course.student_notes.added", s"{$NotesBase}")
    browser("edx.course.student_notes.deleted", s"{$NotesBase}")
    browser("edx.course.student_notes.edited", s"""{$NotesBase, "old_note_text": "o"}""")
    browser("edx.course.student_notes.viewed", """{"notes": [{"note_id": "n1"}]}""")
    browser("edx.course.student_notes.notes_page_viewed", """{"view": "Recent Activity"}""")
    browser("edx.course.student_notes.searched",
      """{"number_of_results": 2, "search_string": "s"}""")
    browser("edx.course.student_notes.used_unit_link",
      """{"component_usage_id": "u1", "note_id": "n1", "view": "Search Results"}""")
    server("openassessmentblock.create_submission",
      s"""{"answer": {"parts": [{"text": "t"}]}, "attempt_number": 1,
          "created_at": "2024-01-01", "submitted_at": "2024-01-01", "submission_uuid": "$Uuid"}""")
    server("openassessmentblock.get_peer_submission",
      """{"course_id": "c", "item_id": "i", "requesting_student_id": "s"}""")
    server("openassessmentblock.get_submission_for_staff_grading",
      """{"item_id": "i", "requesting_staff_id": "s", "type": "full-grade"}""")
    server("openassessmentblock.peer_assess", OraAssess)
    server("openassessmentblock.self_assess", OraAssess)
    server("openassessmentblock.staff_assess",
      OraAssess.dropRight(1) + """, "type": "regrade"}""")
    server("openassessmentblock.save_submission", """{"saved_response": {"text": "t"}}""")
    server("openassessmentblock.submit_feedback_on_assessments",
      s"""{"feedback_text": "f", "options": ["o"], "submission_uuid": "$Uuid"}""")
    server("openassessment.student_training_assess_example",
      s"""{"corrections": {}, "options_selected": {}, "submission_uuid": "$Uuid"}""")
    browser("openassessment.upload_file",
      """{"fileName": "f.png", "fileSize": 100, "fileType": "image/png"}""")
    val pi = """{"answer": 2, "rationale": "r", "truncated": false}"""
    server("ubc.peer_instruction.accessed", pi)
    server("ubc.peer_instruction.original_submitted", pi)
    server("ubc.peer_instruction.revised_submitted", pi)
    server("xblock.poll.submitted", """{"url_name": "p", "choice": "yes"}""")
    server("xblock.survey.submitted", """{"url_name": "p", "choices": {"q1": "a"}}""")
    server("edx.team.activity_updated", """{"team_id": "t1"}""")
    server("edx.team.created", """{"team_id": "t1"}""")
    server("edx.team.deleted", """{"team_id": "t1"}""")
    server("edx.team.changed",
      """{"team_id": "t1", "field": "name", "new": "b", "old": "a", "truncated": []}""")
    server("edx.team.learner_added",
      """{"team_id": "t1", "add_method": "added_on_create", "user_id": "u"}""")
    server("edx.team.learner_removed",
      """{"team_id": "t1", "remove_method": "self_removal", "user_id": "u"}""")
    server("edx.team.page_viewed",
      """{"team_id": "t1", "page_name": "browse", "topic_id": "x"}""")
    server("edx.team.searched",
      """{"number_of_results": 1, "search_text": "s", "topic_id": "x"}""")
    m.result()
  }

  /** JSON-encode a payload as the envelope's `event` value: objects/arrays
    * are embedded raw (Union[Json[X], X] — both encodings are normalized by
    * the envelope parse, CatalogSpec exercises the object form; ConvertSpec
    * goldens exercise the string form). Pre-quoted strings pass through. */
  private def envelope(src: String, typ0: String, event: String): String = {
    // the Server model selects on event_type == context.path (server.py:60-62)
    val typ = if (typ0 == "server") "/event" else typ0
    val page =
      if (src == "browser") s""""$Url""""
      else if (EdxModels.xModulePage(typ)) "\"x_module\""
      else "null"
    val mode = EdxModels.modeRequired.get((src, typ))
      .map(v => s""""mode": "$v", """).getOrElse("")
    s"""{"username": "user1", "ip": "192.168.1.1", "agent": "a", "host": "h", """ +
    s""""referer": "https://lms.example.com/", "accept_language": "en", """ +
    s""""context": {${mode}"course_id": "course-v1:a+b+c", "org_id": "o", """ +
    s""""path": "/event", "user_id": 1}, "time": "2024-01-01T00:00:00+00:00", """ +
    s""""page": $page, "event_source": "$src", "event_type": "$typ", """ +
    s""""name": "$typ", "session": "${"b" * 32}", "event": $event}"""
  }

  private def validate(rows: Seq[String]) = {
    val input = rows.toDF("raw0").select(
      lit("d").as("doc_id"), TokenCodec.encodeTokens(col("raw0")).as("tokens"),
      lit(1).as("n_tok"), get_json_object(col("raw0"), "$.event_source").as("source"))
    Validate(input).select("source", "model", "status").collect()
  }

  test("all 105 catalog keys route; malformed payload rejected per strict family") {
    val keys = ModelCatalog.serverTypes.map(("server", _)) ++
      ModelCatalog.browserTypes.map(("browser", _))
    val rows = keys.map { case (s, t) => envelope(s, t, """{"k": 1}""") } ++
      Seq(envelope("browser", "definitely_not_a_model", """{"k": 1}"""),
        envelope("mobile", "play_video", """{"k": 1}""")) // unknown source
    val out = validate(rows)
    val known = out.dropRight(2)
    assert(known.forall(_.getString(1) != null), "catalog family not selected")
    assert(out.takeRight(2).forall(r =>
      r.getString(1) == null && r.getString(2) == Validate.StatusUnknown))
    // negative case per family: {"k":1} must be rejected everywhere except
    // the families whose REFERENCE model accepts arbitrary payloads
    known.zip(keys).foreach { case (r, key) =>
      val expected =
        if (EdxModels.laxPayload(key)) Validate.StatusOk
        else Validate.StatusInvalidModel
      assert(r.getString(2) === expected, s"$key got ${r.getString(2)}")
    }
  }

  test("conforming payload accepted for every catalog family (positive case)") {
    val keys = conforming.keys.toSeq.sortBy(k => (k._1, k._2))
    val out = validate(keys.map { case (s, t) => envelope(s, t, conforming((s, t))) })
    out.zip(keys).foreach { case (r, key) =>
      assert(r.getString(2) === Validate.StatusOk, s"$key got ${r.getString(2)}")
    }
    // every non-lax catalog family has a positive fixture
    assert(conforming.keySet ++ EdxModels.laxPayload === ModelCatalog.all)
  }

  test("per-model envelope rules: page/session/mode constraints enforced") {
    // server problem event with page null instead of x_module → rejected
    val badPage = envelope("server", "showanswer", s"""{"problem_id": "$ProblemId"}""")
      .replace("\"page\": \"x_module\"", "\"page\": null")
    // browser event with a non-md5 session → rejected
    val badSession = envelope("browser", "page_close", "\"{}\"")
      .replace("b" * 32, "not-a-session")
    // upgrade_clicked with the wrong context.mode literal → rejected
    val badMode = envelope("browser", "edx.course.enrollment.upgrade_clicked", "{}")
      .replace("\"mode\": \"audit\"", "\"mode\": \"verified\"")
    val out = validate(Seq(badPage, badSession, badMode))
    assert(out.forall(_.getString(2) == Validate.StatusInvalidModel),
      out.mkString("; "))
  }
}
