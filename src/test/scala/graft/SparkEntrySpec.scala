package graft

/** The driver contract's integrity: registry construction itself
  * refuses cross-module id collisions and orphaned oracles (both would
  * otherwise silently shrink the correctness gate), and this spec
  * pins the shape so a future refactor back to bare `++` merges fails
  * here instead of in production. */
class SparkEntrySpec extends SparkSpec {
  test("query/oracle registries are collision-free and every oracle names a query") {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    assert(q.nonEmpty && o.nonEmpty)
    assert((o.keySet -- q.keySet).isEmpty, "orphaned oracle ids")
    // every query is either oracle-gated or a documented rows-only op
    val rowsOnly = q.keySet -- o.keySet
    assert(rowsOnly.forall(Set("dedup_minhash", "dedup_simhash",
      "log_heavy_hitters", "q_approx_distinct", "q_approx_percentile",
      "q_sample")),
      s"undocumented rows-only queries: ${(rowsOnly -- Set("dedup_minhash",
        "dedup_simhash", "log_heavy_hitters", "q_approx_distinct",
        "q_approx_percentile", "q_sample")).toSeq.sorted}")
    // the flagship smoke query answers rows on the smallest corpus
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
