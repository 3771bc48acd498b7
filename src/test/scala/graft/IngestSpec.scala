package graft

import org.apache.spark.sql.functions._

import graft.functions.XapiEquivalent
import graft.operators.{Enrich, Ingest, Store}

/** POST/PUT dedup + conflict scenarios ported from
  * /root/reference/tests/api/test_statements_post.py:414-526 and the
  * equivalence unit semantics of utils.py:167-186. */
class IngestSpec extends SparkSuite {
  import spark.implicits._

  private val s1 =
    """{"id": "11111111-0000-0000-0000-000000000001", "actor": {"objectType": "Agent", "mbox": "mailto:a@x.io"}, "verb": {"id": "v://1"}, "object": {"id": "act://1"}, "timestamp": "2024-01-01T10:00:00+00:00"}"""
  private val s1Equivalent = // same content, authority/stored differ → equivalent
    """{"id": "11111111-0000-0000-0000-000000000001", "actor": {"objectType": "Agent", "mbox": "mailto:a@x.io"}, "verb": {"id": "v://1"}, "object": {"id": "act://1"}, "timestamp": "2024-01-01T10:00:00+00:00", "authority": {"mbox": "mailto:other@x.io"}, "stored": "2030-01-01T00:00:00+00:00"}"""
  private val s1Conflict = // same id, different verb → 409
    """{"id": "11111111-0000-0000-0000-000000000001", "actor": {"objectType": "Agent", "mbox": "mailto:a@x.io"}, "verb": {"id": "v://DIFFERENT"}, "object": {"id": "act://1"}, "timestamp": "2024-01-01T10:00:00+00:00"}"""
  private val s2 =
    """{"id": "11111111-0000-0000-0000-000000000002", "actor": {"objectType": "Agent", "mbox": "mailto:b@x.io"}, "verb": {"id": "v://2"}, "object": {"id": "act://2"}, "timestamp": "2024-01-01T11:00:00+00:00"}"""

  private def enriched(stmts: Seq[String]) =
    Enrich(stmts.toDF("xapi").withColumn("source", lit("t")), "xapi",
      "2024-06-01T00:00:00.000000+00:00")

  test("equivalence (D6): authority/stored ignored; timestamp/version only when in both") {
    assert(XapiEquivalent.equivalent(s1, s1Equivalent))
    assert(!XapiEquivalent.equivalent(s1, s1Conflict))
    // timestamp present in only one side → still equivalent (utils.py:181-182)
    val noTs = s1.replace(""", "timestamp": "2024-01-01T10:00:00+00:00"""", "")
    assert(XapiEquivalent.equivalent(s1, noTs))
    // but different timestamps in both → not equivalent
    val otherTs = s1.replace("T10:00:00", "T10:00:01")
    assert(!XapiEquivalent.equivalent(s1, otherTs))
  }

  test("POST: new ids written, equivalent duplicates dropped, conflicts flagged (D5/D6)") {
    val store = Store.project(enriched(Seq(s1)), "xapi")
    val resA = Ingest.post(store, enriched(Seq(s1Equivalent, s2)))
    assert(!resA.rejected)
    assert(resA.duplicates.select("stmt_id").as[String].collect().toSet
      === Set("11111111-0000-0000-0000-000000000001"))
    assert(resA.toWrite.select("stmt_id").as[String].collect().toSeq
      === Seq("11111111-0000-0000-0000-000000000002"))
    val resB = Ingest.post(store, enriched(Seq(s1Conflict)))
    assert(resB.conflicts.count() === 1 && resB.toWrite.count() === 0)
  }

  test("intra-batch duplicate ids → whole batch rejected, even byte-equal (D4)") {
    // statements.py:568-574: the dup-id guard runs on the raw id list before
    // any write, so byte-equal duplicates 400 too
    val store = Store.project(enriched(Seq(s2)), "xapi").limit(0)
    val res = Ingest.post(store, enriched(Seq(s1, s1Conflict)))
    assert(res.rejected && res.intraBatchDups === 1)
    assert(res.toWrite.count() === 0)
    val res2 = Ingest.post(store, enriched(Seq(s1, s1)))
    assert(res2.rejected)
    assert(res2.toWrite.count() === 0)
    // distinct ids pass untouched
    val res3 = Ingest.post(store, enriched(Seq(s1, s2)))
    assert(!res3.rejected && res3.toWrite.count() === 2)
  }

  test("enrichment (D1-D3): id/stored/timestamp/authority merged, unknown fields survive") {
    val lax = """{"actor": {"mbox": "mailto:a@x.io"}, "verb": {"id": "v://1"}, "object": {"id": "act://1"}, "my_custom_field": {"keep": true}}"""
    val out = enriched(Seq(lax)).select("xapi").as[String].collect().head
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(out)
    assert(node.get("id") !== null) // D1 generated
    assert(node.get("stored").asText() === "2024-06-01T00:00:00.000000+00:00") // D2
    assert(node.get("timestamp").asText() === node.get("stored").asText()) // coalesce
    assert(node.get("authority").get("mbox").asText() === "mailto:admin@example.com") // D3
    assert(node.get("my_custom_field").get("keep").asBoolean()) // lax passthrough
    // determinism: same raw → same generated id (uuid5, not uuid4 — documented)
    val out2 = enriched(Seq(lax)).select("xapi").as[String].collect().head
    assert(new com.fasterxml.jackson.databind.ObjectMapper().readTree(out2).get("id")
      === node.get("id"))
  }
}
