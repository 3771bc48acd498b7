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
    val out = Validate(input).select("model", "status").collect()
    val known = out.dropRight(2)
    assert(known.forall(_.getString(0) != null), "catalog family not selected")
    assert(out.takeRight(2).forall(r =>
      r.getString(0) == null && r.getString(1) == Validate.StatusUnknown))
    // strict families keep their exact payload checks: {"k":1} payload fails them
    val strictCount = known.count(r => ModelCatalog.strictFamilies(r.getString(0)))
    assert(known.filter(r => ModelCatalog.strictFamilies(r.getString(0)))
      .forall(_.getString(1) == Validate.StatusInvalidModel))
    assert(strictCount > 0)
    // catalog-level families pass envelope validation
    assert(known.filterNot(r => ModelCatalog.strictFamilies(r.getString(0)))
      .forall(_.getString(1) == Validate.StatusOk))
  }
}
