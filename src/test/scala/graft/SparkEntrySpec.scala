package graft

/** Driver-contract guards: the correctness gate is only as strong as the
  * queries↔oracle pairing, so key drift (a query added without its oracle,
  * or an oracle orphaned by a rename) must fail fast in CI rather than
  * silently downgrade a gate to rows-only. */
class SparkEntrySpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${(o -- q).toSeq.sorted}")
    // full coverage: since round 5 there are zero rows-only gates — keep
    // it that way (a new engine-hash-only query needs an artifact-backed
    // oracle like x_dedup_simhash / x_mm_decode, not a missing entry)
    assert(q.subsetOf(o), s"queries without oracle: ${(q -- o).toSeq.sorted}")
  }

  test("oracle SQL references only path tokens Verify resolves") {
    val known = Set("__GRAFT_IVF__", "__GRAFT_SIMHASH__", "__GRAFT_MEDIA__",
      "__GRAFT_LSH__", "__GRAFT_PQ__", "__GRAFT_IVFPQ__", "__GRAFT_CMS__")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // multi-word tokens too (__GRAFT_MEDIA_V2__): words joined by
      // single underscores, terminated by the double underscore
      "__GRAFT_[A-Z0-9]+(?:_[A-Z0-9]+)*__".r.findAllIn(sql).toSet
        .foreach { (tok: String) =>
          assert(known.contains(tok), s"$name uses unresolved token $tok")
        }
    }
  }

  test("entry() (driver smoke) returns rows on sf0.001") {
    graft.plans.GraftExtensions.install(spark)
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
