package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.functions.{TokenCodec, Uuid5, XapiEquivalent}

/** Property-based invariants (the analogue of the reference's polyfactory
  * model factories, tests/factories.py): randomized inputs over the codec,
  * id derivation, and equivalence relations. */
class PropertySpec extends SparkSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val unicodeText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("é", "ü", "日", "本", "😀" /* emoji */, " ", "\"", "\\", "{", "}")))
      .map(_.mkString)

  test("token codec round-trips every string (token-array equality invariant)") {
    check(forAll(unicodeText) { s =>
      TokenCodec.decodeString(TokenCodec.encodeString(s).toIndexedSeq) == s
    })
  }

  test("uuid5 is deterministic, version-5, and injective-in-practice") {
    check(forAll(unicodeText, unicodeText) { (a, b) =>
      val ua = Uuid5.uuid5(sources.Synth.UuidNamespace, a)
      val ub = Uuid5.uuid5(sources.Synth.UuidNamespace, b)
      ua == Uuid5.uuid5(sources.Synth.UuidNamespace, a) &&
        ua.charAt(14) == '5' && // version nibble
        ((a == b) == (ua == ub)) // no collisions expected at this scale
    })
  }

  test("xAPI equivalence is reflexive and symmetric; authority never matters") {
    val stmt: Gen[String] = for {
      verb <- Gen.oneOf("v://1", "v://2")
      obj <- Gen.oneOf("act://1", "act://2")
      ts <- Gen.option(Gen.oneOf("2024-01-01T00:00:00+00:00", "2024-01-02T00:00:00+00:00"))
    } yield {
      val tsPart = ts.map(t => s""", "timestamp": "$t"""").getOrElse("")
      s"""{"id": "x", "actor": {"mbox": "mailto:a@x.io"}, "verb": {"id": "$verb"}, "object": {"id": "$obj"}$tsPart}"""
    }
    check(forAll(stmt, stmt) { (a, b) =>
      val auth = """, "authority": {"mbox": "mailto:other@x.io"}"""
      val aAuth = a.dropRight(1) + auth + "}"
      XapiEquivalent.equivalent(a, a) &&
        (XapiEquivalent.equivalent(a, b) == XapiEquivalent.equivalent(b, a)) &&
        XapiEquivalent.equivalent(a, aAuth) // authority ignored (utils.py:181)
    })
  }

  test("synth generator is a pure function of the index") {
    check(forAll(Gen.chooseNum(0L, 100000L)) { i =>
      sources.Synth.edxJson(i) == sources.Synth.edxJson(i) &&
        sources.Synth.docId(i) == sources.Synth.docId(i)
    })
  }
}
