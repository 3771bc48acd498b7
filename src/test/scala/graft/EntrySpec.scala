package graft

/** Driver-contract smoke: entry() must return rows on a plain session. */
class EntrySpec extends SparkSuite {
  test("entry() produces a non-empty lake frame") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("event_id"))
  }

  test("every oracle key has a matching queries entry — and vice versa") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
    // every shipped query carries the hard DuckDB signal (0 rows-only
    // checks since r2 — keep it that way)
    val unchecked = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unchecked.isEmpty, s"query without oracle: $unchecked")
  }
}
