package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** xAPI-side validation (`ralph validate -f xapi`): template selection on
  * `(verb.id, object.definition.type)` — the xAPI models' `__selector__`
  * keys (/root/reference/src/ralph/models/xapi/{navigation,lms,video,
  * virtual_classroom}/statements.py) — plus the BaseXapiStatement
  * constraints (base/statements.py:20-73, ifi.py:12-61, results.py:31-42).
  */
object XapiValidate {

  /** (verb.id, object.definition.type) → template. The reference's three
    * `interacted` video models share one selector and are disambiguated by
    * first-parse-wins; here they carry one `video.VideoInteracted` label. */
  val Templates: Map[(String, String), String] = {
    val vc = "https://w3id.org/xapi/virtual-classroom/activity-types/virtual-classroom"
    val video = "https://w3id.org/xapi/video/activity-type/video"
    val page = "http://activitystrea.ms/schema/1.0/page"
    val course = "http://adlnet.gov/expapi/activities/course"
    val file = "http://activitystrea.ms/file"
    val doc = "http://id.tincanapi.com/activitytype/document"
    val audio = "https://w3id.org/xapi/audio/activity-type/audio"
    val cmi = "http://adlnet.gov/expapi/activities/cmi.interaction"
    Map(
      ("http://adlnet.gov/expapi/verbs/registered", course) -> "lms.LMSRegisteredCourse",
      ("http://id.tincanapi.com/verb/unregistered", course) -> "lms.LMSUnregisteredCourse",
      ("https://w3id.org/xapi/netc/verbs/accessed",
        "https://w3id.org/xapi/acrossx/activities/webpage") -> "lms.LMSAccessedPage",
      ("https://w3id.org/xapi/netc/verbs/accessed", file) -> "lms.LMSAccessedFile",
      ("https://w3id.org/xapi/netc/verbs/uploaded", file) -> "lms.LMSUploadedFile",
      ("http://id.tincanapi.com/verb/downloaded", file) -> "lms.LMSDownloadedFile",
      ("https://w3id.org/xapi/netc/verbs/uploaded", video) -> "lms.LMSUploadedVideo",
      ("http://id.tincanapi.com/verb/downloaded", video) -> "lms.LMSDownloadedVideo",
      ("https://w3id.org/xapi/netc/verbs/uploaded", doc) -> "lms.LMSUploadedDocument",
      ("http://id.tincanapi.com/verb/downloaded", doc) -> "lms.LMSDownloadedDocument",
      ("https://w3id.org/xapi/netc/verbs/uploaded", audio) -> "lms.LMSUploadedAudio",
      ("http://id.tincanapi.com/verb/downloaded", audio) -> "lms.LMSDownloadedAudio",
      ("http://id.tincanapi.com/verb/viewed", page) -> "navigation.PageViewed",
      ("http://adlnet.gov/expapi/verbs/terminated", page) -> "navigation.PageTerminated",
      ("http://adlnet.gov/expapi/verbs/initialized", video) -> "video.VideoInitialized",
      ("https://w3id.org/xapi/video/verbs/played", video) -> "video.VideoPlayed",
      ("https://w3id.org/xapi/video/verbs/paused", video) -> "video.VideoPaused",
      ("https://w3id.org/xapi/video/verbs/seeked", video) -> "video.VideoSeeked",
      ("http://adlnet.gov/expapi/verbs/completed", video) -> "video.VideoCompleted",
      ("http://adlnet.gov/expapi/verbs/terminated", video) -> "video.VideoTerminated",
      ("http://adlnet.gov/expapi/verbs/interacted", video) -> "video.VideoInteracted",
      ("http://adlnet.gov/expapi/verbs/initialized", vc) -> "virtual_classroom.VirtualClassroomInitialized",
      ("http://activitystrea.ms/join", vc) -> "virtual_classroom.VirtualClassroomJoined",
      ("http://activitystrea.ms/leave", vc) -> "virtual_classroom.VirtualClassroomLeft",
      ("http://adlnet.gov/expapi/verbs/terminated", vc) -> "virtual_classroom.VirtualClassroomTerminated",
      ("https://w3id.org/xapi/virtual-classroom/verbs/muted", vc) -> "virtual_classroom.VirtualClassroomMuted",
      ("https://w3id.org/xapi/virtual-classroom/verbs/unmuted", vc) -> "virtual_classroom.VirtualClassroomUnmuted",
      ("https://w3id.org/xapi/virtual-classroom/verbs/started-camera", vc) -> "virtual_classroom.VirtualClassroomStartedCamera",
      ("https://w3id.org/xapi/virtual-classroom/verbs/stopped-camera", vc) -> "virtual_classroom.VirtualClassroomStoppedCamera",
      ("https://w3id.org/xapi/virtual-classroom/verbs/shared-screen", vc) -> "virtual_classroom.VirtualClassroomSharedScreen",
      ("https://w3id.org/xapi/virtual-classroom/verbs/unshared-screen", vc) -> "virtual_classroom.VirtualClassroomUnsharedScreen",
      ("https://w3id.org/xapi/virtual-classroom/verbs/raised-hand", vc) -> "virtual_classroom.VirtualClassroomRaisedHand",
      ("https://w3id.org/xapi/virtual-classroom/verbs/lowered-hand", vc) -> "virtual_classroom.VirtualClassroomLoweredHand",
      ("http://adlnet.gov/expapi/verbs/asked", cmi) -> "virtual_classroom.VirtualClassroomStartedPoll",
      ("http://adlnet.gov/expapi/verbs/answered", cmi) -> "virtual_classroom.VirtualClassroomAnsweredPoll",
      ("https://w3id.org/xapi/acrossx/verbs/posted",
        "https://w3id.org/xapi/acrossx/activities/message") -> "virtual_classroom.VirtualClassroomPostedPublicMessage")
  }

  /** Validate statement-JSON rows: adds `stmt`, `xapi_model`, `xapi_status`.
    *
    * The verdict — template selection, IFI/score/version/timestamp/platform
    * constraints, strict raw-JSON rules — is ONE single-child native
    * expression ([[graft.functions.XapiRowValidate]]): one Jackson parse per
    * row, and a downstream status filter's predicate-pushdown substitution
    * can only duplicate that single call (see EdxRowValidate for the
    * measured many-subexpression trap). The parsed `stmt` struct column
    * remains for downstream consumers, evaluated only where referenced. */
  def apply(df: DataFrame, stmtCol: String = "xapi"): DataFrame = {
    val v = graft.functions.XapiRowValidate(col(stmtCol))
    df.withColumn("stmt", from_json(col(stmtCol), Schemas.statement))
      .withColumn("xapi_model", v.getField("model"))
      .withColumn("xapi_status", v.getField("status"))
  }
}
