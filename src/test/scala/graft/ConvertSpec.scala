package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.functions.TokenCodec
import graft.operators.{Convert, Validate}
import graft.sources.Synth

/** Golden conversion tests ported from the reference
  * (tests/models/edx/converters/xapi/test_{server,navigational,enrollment,
  * video}.py): fixed input event JSON → exact expected xAPI statement,
  * including the deterministic uuid5 id. Fixtures live in
  * src/test/resources/golden (expected ids computed with python uuid.uuid5,
  * the reference's own implementation).
  */
class ConvertSpec extends SparkSuite {
  private val mapper = new ObjectMapper()
  private val goldenDir = "src/test/resources/golden"

  private val families = Seq(
    "server", "page_close", "enroll_activated", "enroll_deactivated",
    "load_video", "play_video", "pause_video", "stop_video", "seek_video")

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  private def convertOne(eventJson: String): String = {
    import spark.implicits._
    val input = Seq(eventJson).toDF("raw0")
      .select(
        lit("d1").as("doc_id"),
        TokenCodec.encodeTokens(col("raw0")).as("tokens"),
        length(col("raw0")).as("n_tok"),
        get_json_object(col("raw0"), "$.event_source").as("source"))
    val validated = Validate(input)
    val statuses = validated.select("status").as[String].collect()
    assert(statuses.toSeq === Seq(Validate.StatusOk), s"validation failed: ${statuses.mkString}")
    Convert(validated, Synth.UuidNamespace, Synth.PlatformUrl)
      .select("xapi").as[String].collect().head
  }

  for (fam <- families) {
    test(s"golden conversion: $fam matches reference expected output") {
      val input = read(s"$goldenDir/$fam.input.json")
      val expected = mapper.readTree(read(s"$goldenDir/$fam.expected.json"))
      val got = mapper.readTree(convertOne(input))
      assert(got === expected,
        s"\nexpected: $expected\ngot:      $got")
    }
  }

  test("conversion id is deterministic: same raw event → same uuid5") {
    val input = read(s"$goldenDir/server.input.json")
    val a = mapper.readTree(convertOne(input)).get("id").asText()
    val b = mapper.readTree(convertOne(input)).get("id").asText()
    assert(a === b)
  }
}
