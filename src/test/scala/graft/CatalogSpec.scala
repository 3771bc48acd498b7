package graft

import org.apache.spark.sql.functions._

import graft.functions.TokenCodec
import graft.operators.{ModelCatalog, Validate}

/** Full selector-catalog coverage: every reference `__selector__` key (105
  * models) routes to its model; unknown types stay UnknownEvent. */
class CatalogSpec extends SparkSuite {
  import spark.implicits._

  private def envelope(src: String, typ: String): String =
    s"""{"username": "u", "ip": "", "agent": "a", "host": "h", "referer": "", """ +
    s""""accept_language": "en", "context": {"course_id": "c", "org_id": "o", """ +
    s""""path": "/event", "user_id": 1}, "time": "2024-01-01T00:00:00+00:00", """ +
    s""""page": "p", "event_source": "$src", "event_type": "$typ", "name": "$typ", """ +
    s""""session": "s", "event": {"k": 1}}"""

  test("all 104 catalog selector keys route to a model; unknown stays unknown") {
    val rows =
      ModelCatalog.serverTypes.map(t => envelope("server", t)) ++
      ModelCatalog.browserTypes.map(t => envelope("browser", t)) ++
      Seq(envelope("browser", "definitely_not_a_model"),
        envelope("mobile", "play_video")) // unknown source → unknown
    val input = rows.toDF("raw0").select(
      lit("d").as("doc_id"), TokenCodec.encodeTokens(col("raw0")).as("tokens"),
      lit(1).as("n_tok"), get_json_object(col("raw0"), "$.event_source").as("source"))
    val out = Validate(input).select("source", "model", "status").collect()
    val known = out.dropRight(2)
    assert(known.forall(_.getString(1) != null), "catalog family not selected")
    assert(out.takeRight(2).forall(r =>
      r.getString(1) == null && r.getString(2) == Validate.StatusUnknown))
    // strict families keep their exact payload checks: {"k":1} payload fails them
    def isStrict(r: org.apache.spark.sql.Row): Boolean =
      if (r.getString(0) == "server") ModelCatalog.strictServerFamilies(r.getString(1))
      else ModelCatalog.strictBrowserFamilies(r.getString(1))
    val (strict, lax) = known.partition(isStrict)
    assert(strict.nonEmpty && strict.forall(_.getString(2) == Validate.StatusInvalidModel))
    // catalog-level families pass envelope validation
    assert(lax.forall(_.getString(2) == Validate.StatusOk))
  }

  test("second-tier payloads validate positively with conforming events") {
    def env(src: String, typ: String, event: String): String =
      envelope(src, typ).replace(""""event": {"k": 1}""", s""""event": $event""")
    val cases = Seq(
      env("server", "problem_check",
        """{"problem_id": "p1", "attempts": 2, "grade": 1, "max_grade": 3, "success": "correct", "answers": {}}"""),
      env("server", "problem_check_fail",
        """{"problem_id": "p1", "failure": "closed"}"""),
      env("server", "showanswer", """{"problem_id": "p1"}"""),
      env("browser", "textbook.pdf.page.navigated",
        """"{\"name\": \"textbook.pdf.page.navigated\", \"page\": 4, \"chapter\": \"a.pdf\"}""""),
      env("browser", "speed_change_video",
        """"{\"id\": \"v1\", \"code\": \"html5\", \"current_time\": 2.5, \"old_speed\": \"1.0\", \"new_speed\": \"1.50\"}""""),
      env("browser", "show_transcript",
        """"{\"id\": \"v1\", \"code\": \"html5\", \"current_time\": 9.1}""""))
    val input = cases.toDF("raw0").select(
      lit("d").as("doc_id"), TokenCodec.encodeTokens(col("raw0")).as("tokens"),
      lit(1).as("n_tok"), get_json_object(col("raw0"), "$.event_source").as("source"))
    val out = Validate(input).select("model", "status").collect()
    out.foreach(r => assert(r.getString(1) === Validate.StatusOk,
      s"${r.getString(0)} failed validation"))
    val tier3 = Seq(
      env("server", "edx.bookmark.added",
        """{"bookmark_id": "b1", "component_type": "chapter", "component_usage_id": "u1", "course_id": "course-v1:a+b+c"}"""),
      env("server", "edx.bookmark.listed",
        """{"bookmarks_count": 3, "list_type": "per_course", "page_number": 1, "page_size": 10}"""),
      env("server", "xblock.poll.submitted", """{"url_name": "p", "choice": "yes"}"""),
      env("server", "edx.cohort.user_added", """{"cohort_id": 1, "name": "c", "user_id": 5}"""),
      env("server", "edx.team.created", """{"team_id": "t1"}"""),
      env("server", "edx.certificate.created",
        """{"enrollment_mode": "verified", "user_id": 9, "generation_mode": "batch"}"""),
      env("server", "ubc.peer_instruction.accessed", """{"answer": 2, "truncated": false}"""))
    val in3 = tier3.toDF("raw0").select(
      lit("d").as("doc_id"), TokenCodec.encodeTokens(col("raw0")).as("tokens"),
      lit(1).as("n_tok"), lit("server").as("source"))
    Validate(in3).select("model", "status").collect().foreach(r =>
      assert(r.getString(1) === Validate.StatusOk, s"${r.getString(0)} failed"))
    // and missing mandatory fields are rejected
    val in3bad = Seq(env("server", "edx.certificate.created", """{"user_id": 9}"""))
      .toDF("raw0").select(lit("d").as("doc_id"),
        TokenCodec.encodeTokens(col("raw0")).as("tokens"),
        lit(1).as("n_tok"), lit("server").as("source"))
    assert(Validate(in3bad).select("status").collect().head.getString(0)
      === Validate.StatusInvalidModel)
    // and a bad speed value is rejected
    val bad = Seq(env("browser", "speed_change_video",
      """"{\"id\": \"v1\", \"old_speed\": \"1.0\", \"new_speed\": \"9.9\"}""""))
      .toDF("raw0").select(
        lit("d").as("doc_id"), TokenCodec.encodeTokens(col("raw0")).as("tokens"),
        lit(1).as("n_tok"), lit("browser").as("source"))
    assert(Validate(bad).select("status").collect().head.getString(0)
      === Validate.StatusInvalidModel)
  }
}
