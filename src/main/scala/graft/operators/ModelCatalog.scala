package graft.operators

/** The full edX model-selector catalog — every `__selector__` key in the
  * reference (105 concrete models: 59 server + 45 browser event_type
  * literals + the Server path rule; grep `__selector__`
  * /root/reference/src/ralph/models/edx — SURVEY.md §1.5).
  *
  * The 12 core families carry exact per-model payload constraints in
  * [[Validate]]; the remaining catalog families are selected (never
  * UnknownEvent) and envelope-validated, with payload schemas additive in
  * later rounds. Sources (file → families):
  *  - problem_interaction/statements.py: problem_check[_fail], rescore,
  *    reset/save/show variants, demandhint/feedback hints
  *  - textbook_interaction/statements.py: textbook.pdf.*
  *  - open_response_assessment/statements.py: openassessment*.*
  *  - peer_instruction/statements.py: ubc.peer_instruction.*
  *  - poll/survey statements.py: xblock.poll.*, xblock.survey.*
  *  - bookmark/statements.py: edx.bookmark.*
  *  - certificate/statements.py: edx.certificate.*
  *  - cohort/statements.py: edx.cohort.*
  *  - teams-related statements.py: edx.team.*
  *  - notes/statements.py: edx.course.student_notes.*
  *  - drag_and_drop/statements.py: edx.drag_and_drop_v2.*
  *  - enrollment/statements.py: edx.course.enrollment.*
  *  - video/statements.py: *_video, transcript + cc menu events
  *  - navigational/statements.py: page_close, seq_*
  *  - textbook: book
  */
object ModelCatalog {

  val serverTypes: Seq[String] = Seq(
    "edx.bookmark.added", "edx.bookmark.listed", "edx.bookmark.removed",
    "edx.certificate.created", "edx.certificate.evidence_visited",
    "edx.certificate.generation.disabled", "edx.certificate.generation.enabled",
    "edx.certificate.revoked", "edx.certificate.shared",
    "edx.cohort.created", "edx.cohort.user_added", "edx.cohort.user_removed",
    "edx.course.enrollment.activated", "edx.course.enrollment.deactivated",
    "edx.course.enrollment.mode_changed", "edx.course.enrollment.upgrade.succeeded",
    "edx.done.toggled",
    "edx.drag_and_drop_v2.feedback.closed", "edx.drag_and_drop_v2.feedback.opened",
    "edx.drag_and_drop_v2.item.dropped", "edx.drag_and_drop_v2.item.picked_up",
    "edx.drag_and_drop_v2.loaded",
    "edx.librarycontentblock.content.assigned", "edx.librarycontentblock.content.removed",
    "edx.problem.hint.demandhint_displayed", "edx.problem.hint.feedback_displayed",
    "edx.team.activity_updated", "edx.team.changed", "edx.team.created",
    "edx.team.deleted", "edx.team.learner_added", "edx.team.learner_removed",
    "edx.team.page_viewed", "edx.team.searched",
    "openassessment.student_training_assess_example",
    "openassessmentblock.create_submission", "openassessmentblock.get_peer_submission",
    "openassessmentblock.get_submission_for_staff_grading",
    "openassessmentblock.peer_assess", "openassessmentblock.save_submission",
    "openassessmentblock.self_assess", "openassessmentblock.staff_assess",
    "openassessmentblock.submit_feedback_on_assessments",
    "problem_check", "problem_check_fail", "problem_rescore", "problem_rescore_fail",
    "reset_problem", "reset_problem_fail", "save_problem_fail", "save_problem_success",
    "showanswer",
    "ubc.peer_instruction.accessed", "ubc.peer_instruction.original_submitted",
    "ubc.peer_instruction.revised_submitted",
    "xblock.poll.submitted", "xblock.poll.view_results",
    "xblock.survey.submitted", "xblock.survey.view_results")

  val browserTypes: Seq[String] = Seq(
    "book", "edx.bookmark.accessed", "edx.course.enrollment.upgrade_clicked",
    "edx.course.student_notes.added", "edx.course.student_notes.deleted",
    "edx.course.student_notes.edited", "edx.course.student_notes.notes_page_viewed",
    "edx.course.student_notes.searched", "edx.course.student_notes.used_unit_link",
    "edx.course.student_notes.viewed", "edx.course.tool.accessed", "edx.done.toggled",
    "hide_transcript", "load_video", "openassessment.upload_file", "page_close",
    "pause_video", "play_video",
    "problem_check", "problem_graded", "problem_reset", "problem_save", "problem_show",
    "seek_video", "seq_goto", "seq_next", "seq_prev",
    "show_transcript", "speed_change_video", "stop_video",
    "textbook.pdf.chapter.navigated", "textbook.pdf.display.scaled",
    "textbook.pdf.outline.toggled", "textbook.pdf.page.navigated",
    "textbook.pdf.page.scrolled", "textbook.pdf.search.executed",
    "textbook.pdf.search.highlight.toggled", "textbook.pdf.search.navigatednext",
    "textbook.pdf.searchcasesensitivity.toggled", "textbook.pdf.thumbnail.navigated",
    "textbook.pdf.thumbnails.toggled", "textbook.pdf.zoom.buttons.changed",
    "textbook.pdf.zoom.menu.changed", "video_hide_cc_menu", "video_show_cc_menu")

  /** Every catalog family carries an exact per-model payload rule (since
    * r2): the executable registry is [[graft.functions.EdxModels]] — one
    * rule per reference pydantic model, keyed `(event_source, event_type)`.
    * `EdxModels.laxPayload` lists the families whose *reference model
    * itself* places no payload constraint (no `event` field, or
    * `event: str`) — those are envelope/name/page-validated only, which is
    * the reference's own behavior, not a coverage gap. */
  val all: Set[(String, String)] =
    serverTypes.map(("server", _)).toSet ++
      browserTypes.map(("browser", _)).toSet + (("server", "server"))
}
