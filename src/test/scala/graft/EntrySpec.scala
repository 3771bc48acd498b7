package graft

/** Driver-contract smoke: entry() must return rows on a plain session. */
class EntrySpec extends SparkSuite {
  test("entry() produces a non-empty lake frame") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("event_id"))
  }

  test("every oracle key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
