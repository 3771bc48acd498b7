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
    assert(out.take(4).forall(_.getString(1) == Validate.StatusOk))
    assert(out.last.getString(1) === Validate.StatusUnknown)
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
    val badScore = stmt("https://w3id.org/xapi/video/verbs/played",
      "https://w3id.org/xapi/video/activity-type/video",
      extra = """, "result": {"score": {"raw": 5.0, "min": 0.0, "max": 3.0}}""")
    val okScore = stmt("https://w3id.org/xapi/video/verbs/played",
      "https://w3id.org/xapi/video/activity-type/video",
      extra = """, "result": {"score": {"raw": 2.0, "min": 0.0, "max": 3.0, "scaled": 0.66}}""")
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
    def interaction(choices: String) =
      s"""{"actor": {"objectType": "Agent", "mbox": "mailto:a@x.io"}, """ +
      s""""verb": {"id": "http://adlnet.gov/expapi/verbs/answered"}, """ +
      s""""object": {"id": "act://q1", "objectType": "Activity", "definition": {""" +
      s""""type": "http://adlnet.gov/expapi/activities/cmi.interaction", """ +
      s""""interactionType": "choice", "choices": $choices}}}"""
    val dup = interaction("""[{"id": "a"}, {"id": "b"}, {"id": "a"}]""")
    val uniq = interaction("""[{"id": "a"}, {"id": "b"}]""")
    val out = validate(Seq(dup, uniq)).map(_.getString(1))
    // both select the AnsweredPoll template; only the unique one is valid
    assert(out.toSeq === Seq(Validate.StatusInvalidModel, Validate.StatusOk))
  }

  test("the 22k reference corpus validates as video statements") {
    val corpus = "/root/reference/data/statements.json.gz"
    assume(new java.io.File(corpus).exists())
    val df = XapiValidate(spark.read.text(corpus).toDF("xapi"))
    val byStatus = df.groupBy("xapi_status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse(Validate.StatusOk, 0L) === 22000L, byStatus.toString)
    val models = df.filter(col("xapi_status") === Validate.StatusOk)
      .select("xapi_model").distinct().collect().map(_.getString(0)).toSet
    // the corpus is video activity: video.* templates plus the LMS
    // downloaded-video statement (downloaded verb × video activity type)
    assert(models.forall(m => m.startsWith("video.") || m.endsWith("Video")), models.toString)
  }
}
