package graft

import org.apache.spark.sql.functions._

import graft.functions.{TokenCodec, Uuid5}
import graft.sources.Synth

class CoreSpec extends SparkSuite {

  test("uuid5 matches RFC 4122 test vector (python uuid.uuid5 parity)") {
    // uuid5(NAMESPACE_DNS, "python.org") — canonical public vector
    assert(Uuid5.uuid5("6ba7b810-9dad-11d1-80b4-00c04fd430c8", "python.org")
      === "886313e1-3b8a-5372-9b90-0c9aee199e5d")
    // converter namespace used by the reference golden tests (test_server.py:16)
    assert(Uuid5.uuid5(Synth.UuidNamespace, "x").length === 36)
  }

  test("uuid5 Catalyst expression equals pure implementation and stays codegen'd") {
    import spark.implicits._
    val df = Seq(("a", "hello"), ("b", "world")).toDF("k", "v")
      .withColumn("u", Uuid5.uuid5Col(lit(Synth.UuidNamespace), col("v")))
    val got = df.select("u").as[String].collect().toSeq
    assert(got === Seq(Uuid5.uuid5(Synth.UuidNamespace, "hello"),
      Uuid5.uuid5(Synth.UuidNamespace, "world")))
  }

  test("token codec round-trips arbitrary unicode (token-array equality invariant)") {
    import spark.implicits._
    val texts = Seq("""{"a": 1}""", "héllo wörld", "日本語テキスト", "emoji 😀 ok", "")
    val df = texts.toDF("text")
      .withColumn("tokens", TokenCodec.encodeTokens(col("text")))
      .withColumn("back", TokenCodec.decodeTokens(col("tokens")))
    assert(df.filter(col("back") =!= col("text")).count() === 0)
    // scala-side codec agrees with the Catalyst expressions
    texts.foreach { t =>
      assert(TokenCodec.decodeString(TokenCodec.encodeString(t).toIndexedSeq) === t)
    }
  }

  test("synth input table is deterministic and parallelism-invariant") {
    val a = Synth.inputTable(spark, 500, 4)
    val b = Synth.inputTable(spark, 500, 7)
    assert(a.count() === 500)
    // identical content regardless of partitioning
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    // schema matches BASELINE.json input_hint
    assert(a.schema.fieldNames.toSeq === Seq("doc_id", "tokens", "n_tok", "source"))
    // duplicates exist by design (doc_id repeats at ~1/17)
    val n = a.count()
    val distinct = a.select("doc_id").distinct().count()
    assert(distinct < n)
  }
}
