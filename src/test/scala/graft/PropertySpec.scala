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

  test("media sniff/resize never throw on arbitrary bytes (fuzz)") {
    // the quarantine contract: at 10^12 rows every corruption exists; the
    // parsers must classify, never crash
    val junk: Gen[Array[Byte]] = Gen.oneOf(
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray),
      // adversarial: valid magics with corrupt interiors
      Gen.listOfN(60, Gen.chooseNum(-128, 127).map(_.toByte)).map { l =>
        val a = l.toArray; a(0) = 'B'; a(1) = 'M'; a
      },
      Gen.listOfN(60, Gen.chooseNum(-128, 127).map(_.toByte)).map { l =>
        val a = l.toArray
        "RIFF".getBytes.copyToArray(a, 0); "WAVE".getBytes.copyToArray(a, 8); a
      })
    check(forAll(junk, Gen.chooseNum(1, 8), Gen.chooseNum(1, 8)) { (bytes, w, h) =>
      val m = graft.operators.MediaOps.sniff(1L, bytes)
      val r = graft.operators.MediaOps.resizeBmp(bytes, w, h)
      // sniff always classifies; resize only succeeds on genuinely valid
      // BMPs. The kind set is the FULL r3+ classifier range: random bytes
      // hit the 2-byte JPEG magic (FF D8) with probability 2^-16, so a
      // bmp/wav/unknown-only assertion is a latent fuzz failure, not a
      // parser bug (caught live by this property on 2026-08-17)
      Set("bmp", "wav", "png", "jpeg", "mp4", "unknown").contains(m.kind) &&
        (r.isEmpty || graft.operators.MediaOps.sniff(1L, r.get).valid)
    })
  }

  test("tokenStats equals brute-force distinct/modal counts on arbitrary arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    check(forAll(Gen.listOf(Gen.chooseNum(-5, 5))) { xs =>
      val got = graft.functions.Signatures.tokenStats(
        new GenericArrayData(xs.toArray))
      val expDistinct = xs.distinct.size.toLong
      val expTop = if (xs.isEmpty) 0L
        else xs.groupBy(identity).map(_._2.length).max.toLong
      got.getLong(0) == xs.length.toLong &&
        got.getLong(1) == expDistinct && got.getLong(2) == expTop
    })
    // null slots are excluded from ALL THREE counts, never read as token 0
    val withNulls = new GenericArrayData(Array[Any](null, null, 5, 5))
    val st = graft.functions.Signatures.tokenStats(withNulls)
    assert(st.getLong(0) === 2L && st.getLong(1) === 1L && st.getLong(2) === 2L)
  }

  test("PQ encode/decode: codes in range, reconstruction is codewords, members lossless") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val books = Array.tabulate(4) { s =>
      Array.tabulate(4) { c =>
        Array.tabulate(4) { d =>
          graft.sources.Synth.mix(s * 100 + c * 10 + d, 7L).toDouble / Long.MaxValue
        }
      }
    }
    val enc = graft.functions.PqEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(1), books)
    check(forAll(Gen.listOfN(16, Gen.chooseNum(-1.0, 1.0))) { xs =>
      val codes = enc.encodeFast(new GenericArrayData(xs.toArray))
      val dec = graft.functions.PqDecode.decode(codes, books)
      (0 until 4).forall(s => codes.getInt(s) >= 0 && codes.getInt(s) < 4) &&
        dec.numElements() == 16 &&
        (0 until 4).forall(s => (0 until 4).forall(d =>
          dec.getDouble(s * 4 + d) == books(s)(codes.getInt(s))(d)))
    })
    // a vector assembled from codewords round-trips to exactly those codes
    // (drives the exact-match hit path AND its collision guard)
    val member = books(0)(2) ++ books(1)(0) ++ books(2)(3) ++ books(3)(1)
    val codes = enc.encodeFast(new GenericArrayData(member))
    assert((0 until 4).map(codes.getInt) === Seq(2, 0, 3, 1))
  }

  test("IVF-PQ residual expressions: residual+centroid recovers v; decodePlus inverts member residuals") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cents = Array.tabulate(4) { c =>
      Array.tabulate(16)(d =>
        graft.sources.Synth.mix(c * 50 + d, 11L).toDouble / Long.MaxValue)
    }
    val books = Array.tabulate(4) { s =>
      Array.tabulate(4) { cw =>
        Array.tabulate(4)(d =>
          graft.sources.Synth.mix(s * 100 + cw * 10 + d, 13L).toDouble / Long.MaxValue)
      }
    }
    val enc = graft.functions.PqEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(1), books)
    check(forAll(Gen.listOfN(16, Gen.chooseNum(-1.0, 1.0)),
      Gen.chooseNum(0, 3)) { (xs, cell) =>
      val v = xs.toArray
      val res = graft.functions.CentroidResidual.residual(
        new GenericArrayData(v), cell, cents)
      // (v − c) + c recovers v to float tolerance
      val back = (0 until 16).forall(i =>
        math.abs(res.getDouble(i) + cents(cell)(i) - v(i)) < 1e-12)
      // decodePlus(encode(residual), cell) = centroid + chosen codewords
      val codes = enc.encodeFast(res)
      val dec = graft.functions.PqDecodeResidual.decodePlus(codes, cell, books, cents)
      val composed = (0 until 4).forall(s => (0 until 4).forall(d =>
        math.abs(dec.getDouble(s * 4 + d) -
          (cents(cell)(s * 4 + d) + books(s)(codes.getInt(s))(d))) == 0.0))
      back && composed
    })
    // dimension mismatch fails loudly, never pads or truncates
    intercept[IllegalArgumentException] {
      graft.functions.CentroidResidual.residual(
        new GenericArrayData(Array(1.0, 2.0)), 0, cents)
    }
    intercept[IllegalArgumentException] {
      val shortCents = Array(Array(1.0, 2.0)) // 2 dims vs 16-dim codebooks
      graft.functions.PqDecodeResidual.decodePlus(
        new GenericArrayData(Array(0, 0, 0, 0)), 0, books, shortCents)
    }
  }

  test("timestamp fast path equals the formatter chain on every shape (fuzz)") {
    import graft.functions.EdxModels
    // formatter-chain reference reimplemented here: the production
    // parseTsMicros now tries the digit-scan fast path first, and this
    // property is exactly the claim that the fast path changed nothing
    def slow(s: String): Long = {
      if (s == null || s.isEmpty) return EdxModels.NoTs
      try {
        val odt = java.time.OffsetDateTime.parse(s)
        odt.toEpochSecond * 1000000L + odt.getNano / 1000L
      } catch { case _: Exception =>
        try {
          val ldt = java.time.LocalDateTime.parse(s)
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
        } catch { case _: Exception =>
          try {
            // the repo-wide µs definition (floorDiv): the truncating
            // `getTime / 1000L * 1000000L` form diverges by one second on
            // pre-1970 timestamps with a fractional part (caught live by a
            // year-0208 scalacheck seed in r6) — production deliberately
            // routes through Horizon.micros, so the reference must too
            graft.streaming.Horizon.micros(java.sql.Timestamp.valueOf(s))
          } catch { case _: Exception => EdxModels.NoTs }
        }
      }
    }
    // structured generator around the wire shapes + targeted mutations
    val frac = Gen.oneOf(Gen.const(""), Gen.chooseNum(0, 999999).map(f => s".$f"),
      Gen.chooseNum(0, 999999999).map(f => s".$f"))
    // includes OUT-OF-RANGE colon-form offsets (+19:00, +05:99): the fast
    // path must fall back to the formatters, which reject them (review r4
    // #1 — the first generator only emitted in-range offsets and missed a
    // fabricated-epoch acceptance)
    val off = Gen.oneOf(Gen.oneOf("", "Z", "+0200", "junk"),
      for {
        sign <- Gen.oneOf("+", "-")
        oh <- Gen.chooseNum(0, 99); om <- Gen.chooseNum(0, 99)
      } yield f"$sign$oh%02d:$om%02d")
    val shaped = for {
      y <- Gen.chooseNum(1, 9999); mo <- Gen.chooseNum(0, 13)
      d <- Gen.chooseNum(0, 32); h <- Gen.chooseNum(0, 24)
      mi <- Gen.chooseNum(0, 60); se <- Gen.chooseNum(0, 61)
      f <- frac; o <- off
      sep <- Gen.oneOf("T", " ", "x")
    } yield f"$y%04d-$mo%02d-$d%02d$sep$h%02d:$mi%02d:$se%02d$f$o"
    val garbage = Gen.alphaNumStr
    check(forAll(Gen.oneOf(shaped, garbage)) { s =>
      EdxModels.parseTsMicros(s) == slow(s)
    })
    // the exact wire format, heavily
    check(forAll(Gen.chooseNum(0L, 4102444800L), Gen.chooseNum(0, 999999)) { (sec, us) =>
      val iso = java.time.Instant.ofEpochSecond(sec, us * 1000L)
        .atOffset(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'+00:00'"))
      EdxModels.parseTsMicros(iso) == slow(iso) &&
        EdxModels.parseTsMicros(iso) == sec * 1000000L + us
    })
  }

  test("BPE mergeOnce shrinks or preserves length and never emits the merged pair") {
    val seqGen = Gen.listOf(Gen.chooseNum(0, 5)).map(_.toArray)
    check(forAll(seqGen, Gen.chooseNum(0, 5), Gen.chooseNum(0, 5)) { (s, l, r) =>
      val out = graft.operators.BpeTrainer.mergeOnce(s, l, r, 99)
      val noPair = (0 until out.length - 1).forall(i => !(out(i) == l && out(i + 1) == r)) ||
        (l == r && r == 99) // unreachable newId sentinel guard
      out.length <= s.length && (l != r || noPair) &&
        (if (l != r) noPair else true)
    })
  }
}
