package graft

import org.apache.spark.sql.functions._

import graft.operators.{Validate, XapiValidate}

class XapiValidateSpec extends SparkSuite {
  import spark.implicits._

  private def stmt(verb: String, otype: String, extra: String = "",
                   actor: String = """{"objectType": "Agent", "mbox": "mailto:a@x.io"}""") =
    s"""{"actor": $actor, "verb": {"id": "$verb"}, """ +
    s""""object": {"id": "act://1", "objectType": "Activity", "definition": {"type": "$otype"}}$extra}"""

  private def validate(rows: Seq[String]) =
    XapiValidate(rows.toDF("xapi")).select("xapi_model", "xapi_status").collect()

  test("templates select on (verb.id, object.definition.type)") {
    val out = validate(Seq(
      stmt("https://w3id.org/xapi/video/verbs/played", "https://w3id.org/xapi/video/activity-type/video"),
      stmt("http://id.tincanapi.com/verb/viewed", "http://activitystrea.ms/schema/1.0/page"),
      stmt("http://adlnet.gov/expapi/verbs/registered", "http://adlnet.gov/expapi/activities/course"),
      stmt("http://activitystrea.ms/join", "https://w3id.org/xapi/virtual-classroom/activity-types/virtual-classroom"),
      stmt("v://none", "t://none")))
    assert(out.map(r => Option(r.getString(0))).toSeq === Seq(
      Some("video.VideoPlayed"), Some("navigation.PageViewed"),
      Some("lms.LMSRegisteredCourse"), Some("virtual_classroom.VirtualClassroomJoined"), None))
    // selection ≠ validity: since the per-template payload registry, a bare
    // envelope only passes templates with no extra payload requirements
    // (PageViewed); VideoPlayed lacks its required result.extensions.time
    // and video category, LMS lacks its category, VC lacks registration +
    // extensions — the reference rejects all three the same way
    assert(out.map(_.getString(1)).toSeq === Seq(
      Validate.StatusInvalidModel, Validate.StatusOk, Validate.StatusInvalidModel,
      Validate.StatusInvalidModel, Validate.StatusUnknown))
  }

  private val videoCtx =
    """, "context": {"contextActivities": {"category": [{"id": "https://w3id.org/xapi/video"}]},
       "extensions": {"https://w3id.org/xapi/video/extensions/session-id":
         "de867099-77ce-453b-a4b9-5ee6f7de5a4f"}}"""

  test("per-template payload rules: video family (results.py / contexts.py)") {
    val video = "https://w3id.org/xapi/video/activity-type/video"
    val played = "https://w3id.org/xapi/video/verbs/played"
    def res(ext: String) = s""", "result": {"extensions": {$ext}}"""
    val time = "\"https://w3id.org/xapi/video/extensions/time\": 12.5"
    val okPlayed = stmt(played, video, extra = videoCtx + res(time))
    // missing result.extensions.time → VideoPlayedResult rejects
    val noTime = stmt(played, video, extra = videoCtx + res(
      "\"https://w3id.org/xapi/video/extensions/progress\": 0.5"))
    // missing the video profile category → context validator rejects
    val noCategory = stmt(played, video, extra = res(time) +
      """, "context": {"extensions": {}}""")
    // negative time → NonNegativeFloat rejects
    val negTime = stmt(played, video, extra = videoCtx +
      res("\"https://w3id.org/xapi/video/extensions/time\": -1.0"))
    // seeked requires BOTH time-from and time-to
    val seekHalf = stmt("https://w3id.org/xapi/video/verbs/seeked", video,
      extra = videoCtx + res("\"https://w3id.org/xapi/video/extensions/time-from\": 3.0"))
    // paused requires context.extensions.length
    val pausedNoLen = stmt("https://w3id.org/xapi/video/verbs/paused", video,
      extra = videoCtx + res(time))
    val out = validate(Seq(okPlayed, noTime, noCategory, negTime, seekHalf, pausedNoLen))
    assert(out.map(_.getString(1)).toSeq === Seq(Validate.StatusOk,
      Validate.StatusInvalidModel, Validate.StatusInvalidModel,
      Validate.StatusInvalidModel, Validate.StatusInvalidModel,
      Validate.StatusInvalidModel))
  }

  test("per-template payload rules: interacted volume must be integral (the corpus split)") {
    val video = "https://w3id.org/xapi/video/activity-type/video"
    val interacted = "http://adlnet.gov/expapi/verbs/interacted"
    def withVolume(v: String) = stmt(interacted, video, extra =
      s""", "context": {"contextActivities": {"category": [{"id": "https://w3id.org/xapi/video"}]},
         "extensions": {"https://w3id.org/xapi/video/extensions/session-id":
           "de867099-77ce-453b-a4b9-5ee6f7de5a4f",
           "https://w3id.org/xapi/video/extensions/volume": $v}}""" +
      """, "result": {"extensions": {"https://w3id.org/xapi/video/extensions/time": 1.0}}""")
    val out = validate(Seq(withVolume("1"), withVolume("0.43")))
    assert(out.map(_.getString(1)).toSeq ===
      Seq(Validate.StatusOk, Validate.StatusInvalidModel))
  }

  test("per-template payload rules: virtual classroom + lms families") {
    val vc = "https://w3id.org/xapi/virtual-classroom/activity-types/virtual-classroom"
    val joined = "http://activitystrea.ms/join"
    def vcCtx(reg: String, planned: Boolean) =
      s""", "context": {"registration": $reg,
        "contextActivities": {"category": [{"id": "https://w3id.org/xapi/virtual-classroom"}]},
        "extensions": {${if (planned)
          "\"http://id.tincanapi.com/extension/planned-duration\": \"2024-01-01T01:00:00+00:00\""
        else
          "\"https://w3id.org/xapi/cmi5/context/extensions/sessionid\": \"s1\""}}}"""
    val okJoined = stmt(joined, vc, extra = vcCtx("\"de867099-77ce-453b-a4b9-5ee6f7de5a4f\"", planned = true))
    // joined requires the planned-duration KEY (Optional-without-default)
    val noPlanned = stmt(joined, vc, extra = vcCtx("\"de867099-77ce-453b-a4b9-5ee6f7de5a4f\"", planned = false))
    // registration is required and must be a UUID
    val badReg = stmt(joined, vc, extra = vcCtx("\"not-a-uuid\"", planned = true))
    // muted has no planned-duration requirement — base VC context suffices
    val okMuted = stmt("https://w3id.org/xapi/virtual-classroom/verbs/muted", vc,
      extra = vcCtx("\"de867099-77ce-453b-a4b9-5ee6f7de5a4f\"", planned = false))
    // lms: registered course needs the lms category
    val course = "http://adlnet.gov/expapi/activities/course"
    val reg = "http://adlnet.gov/expapi/verbs/registered"
    val okLms = stmt(reg, course, extra =
      """, "context": {"contextActivities": {"category": [{"id": "https://w3id.org/xapi/lms"}]}}""")
    val wrongCategory = stmt(reg, course, extra =
      """, "context": {"contextActivities": {"category": [{"id": "https://w3id.org/xapi/video"}]}}""")
    val out = validate(Seq(okJoined, noPlanned, badReg, okMuted, okLms, wrongCategory))
    assert(out.map(_.getString(1)).toSeq === Seq(Validate.StatusOk,
      Validate.StatusInvalidModel, Validate.StatusInvalidModel, Validate.StatusOk,
      Validate.StatusOk, Validate.StatusInvalidModel))
  }

  test("exactly-one-IFI rule and IFI formats (ifi.py)") {
    val both = stmt("http://id.tincanapi.com/verb/viewed", "http://activitystrea.ms/schema/1.0/page",
      actor = """{"mbox": "mailto:a@x.io", "openid": "http://id"}""")
    val none = stmt("http://id.tincanapi.com/verb/viewed", "http://activitystrea.ms/schema/1.0/page",
      actor = """{"objectType": "Agent", "name": "anon"}""")
    val badMbox = stmt("http://id.tincanapi.com/verb/viewed", "http://activitystrea.ms/schema/1.0/page",
      actor = """{"mbox": "not-an-email"}""")
    val badSha = stmt("http://id.tincanapi.com/verb/viewed", "http://activitystrea.ms/schema/1.0/page",
      actor = """{"mbox_sha1sum": "zzzz"}""")
    val account = stmt("http://id.tincanapi.com/verb/viewed", "http://activitystrea.ms/schema/1.0/page",
      actor = """{"account": {"homePage": "https://x", "name": "n"}}""")
    val out = validate(Seq(both, none, badMbox, badSha, account)).map(_.getString(1))
    assert(out.toSeq === Seq(Validate.StatusInvalidModel, Validate.StatusInvalidModel,
      Validate.StatusInvalidModel, Validate.StatusInvalidModel, Validate.StatusOk))
  }

  test("score ordering, version pattern, platform-needs-Activity (base constraints)") {
    val timeExt = """"extensions": {"https://w3id.org/xapi/video/extensions/time": 3.0}, """
    val badScore = stmt("https://w3id.org/xapi/video/verbs/played",
      "https://w3id.org/xapi/video/activity-type/video",
      extra = videoCtx + s""", "result": {$timeExt"score": {"raw": 5.0, "min": 0.0, "max": 3.0}}""")
    val okScore = stmt("https://w3id.org/xapi/video/verbs/played",
      "https://w3id.org/xapi/video/activity-type/video",
      extra = videoCtx + s""", "result": {$timeExt"score": {"raw": 2.0, "min": 0.0, "max": 3.0, "scaled": 0.66}}""")
    val badVersion = stmt("http://id.tincanapi.com/verb/viewed",
      "http://activitystrea.ms/schema/1.0/page", extra = """, "version": "2.0.0"""")
    val out = validate(Seq(badScore, okScore, badVersion)).map(_.getString(1))
    assert(out.toSeq === Seq(Validate.StatusInvalidModel, Validate.StatusOk,
      Validate.StatusInvalidModel))
  }

  test("strict: recursive empty values rejected except inside extensions (statements.py:49-73)") {
    val page = ("http://id.tincanapi.com/verb/viewed", "http://activitystrea.ms/schema/1.0/page")
    val emptyTop = stmt(page._1, page._2, extra = """, "timestamp": """"")
    val emptyNested = stmt(page._1, page._2,
      extra = """, "context": {"registration": "de867099-77ce-453b-a4b9-5ee6f7de5a4f", "team": {}}""")
    val nullNested = stmt(page._1, page._2,
      extra = """, "result": {"success": true, "response": null}""")
    val emptyInExtensions = stmt(page._1, page._2,
      extra = """, "context": {"extensions": {"http://ext/a": "", "http://ext/b": {}}}""")
    val out = validate(Seq(emptyTop, emptyNested, nullNested, emptyInExtensions))
      .map(_.getString(1))
    assert(out.toSeq === Seq(Validate.StatusInvalidModel, Validate.StatusInvalidModel,
      Validate.StatusInvalidModel, Validate.StatusOk))
  }

  test("strict: duplicate interaction-component ids rejected (unnested_objects.py:79-84)") {
    // a fully-valid VirtualClassroomAnsweredPoll (context registration +
    // vc category + extensions + vc-typed parent, result.response) so the
    // ONLY difference between the two fixtures is the duplicate choice id
    def interaction(choices: String) =
      s"""{"actor": {"objectType": "Agent", "mbox": "mailto:a@x.io"}, """ +
      s""""verb": {"id": "http://adlnet.gov/expapi/verbs/answered"}, """ +
      s""""context": {"registration": "de867099-77ce-453b-a4b9-5ee6f7de5a4f", """ +
      s""""contextActivities": {"category": [{"id": "https://w3id.org/xapi/virtual-classroom"}], """ +
      s""""parent": [{"id": "act://room1", "objectType": "Activity", "definition": {""" +
      s""""type": "https://w3id.org/xapi/virtual-classroom/activity-types/virtual-classroom"}}]}, """ +
      s""""extensions": {"https://w3id.org/xapi/cmi5/context/extensions/sessionid": "s1"}}, """ +
      s""""result": {"response": "b"}, """ +
      s""""object": {"id": "act://q1", "objectType": "Activity", "definition": {""" +
      s""""type": "http://adlnet.gov/expapi/activities/cmi.interaction", """ +
      s""""interactionType": "choice", "choices": $choices}}}"""
    val dup = interaction("""[{"id": "a"}, {"id": "b"}, {"id": "a"}]""")
    val uniq = interaction("""[{"id": "a"}, {"id": "b"}]""")
    val out = validate(Seq(dup, uniq)).map(_.getString(1))
    // both select the AnsweredPoll template; only the unique one is valid
    assert(out.toSeq === Seq(Validate.StatusInvalidModel, Validate.StatusOk))
  }

  test("the 22k reference corpus splits exactly as the reference models split it") {
    // Ground truth from running the reference's own pydantic models over
    // /root/reference/data/statements.json.gz (ModelSelector + first model
    // that parses): 20,955 validate, 1,045 are rejected —
    //   989 `interacted` (required context volume has a fractional part),
    //     2 `initialized` (optional volume fractional),
    //    54 `downloaded` (LMSDownloadedVideo with the VIDEO profile
    //       category, not the required LMS one).
    // The per-template registry must reproduce that split bit-for-bit.
    val corpus = "/root/reference/data/statements.json.gz"
    assume(new java.io.File(corpus).exists())
    val df = XapiValidate(spark.read.text(corpus).toDF("xapi")).cache()
    val byStatus = df.groupBy("xapi_status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse(Validate.StatusOk, 0L) === 20955L, byStatus.toString)
    assert(byStatus.getOrElse(Validate.StatusInvalidModel, 0L) === 1045L, byStatus.toString)
    val okByModel = df.filter(col("xapi_status") === Validate.StatusOk)
      .groupBy("xapi_model").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(okByModel === Map(
      "video.VideoPlayed" -> 6603L, "video.VideoPaused" -> 6480L,
      "video.VideoInteracted" -> 2557L, "video.VideoSeeked" -> 2995L,
      "video.VideoInitialized" -> 1346L, "video.VideoCompleted" -> 636L,
      "video.VideoTerminated" -> 338L), okByModel.toString)
    df.unpersist()
    ()
  }
}
