package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared driver query must execute and return rows on the
  * smallest testdata — the in-suite twin of the driver's t1 smoke, so a
  * broken query fails `sbt test` immediately instead of the next
  * verify run. */
class QueriesSmokeSpec extends AnyFunSuite with SparkSpecBase {

  private val dir = sf("sf0.001")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("memoized build chains are first-query safe (no nested memo computes)") {
    // ConcurrentHashMap.computeIfAbsent throws "Recursive update" when a
    // memo lambda computes ANOTHER key of the same map — which only
    // bites when the dependent build is the SESSION'S FIRST touch (a
    // warmed memo returns without computing). The driver's Verify runs
    // queries concurrently, so any query must be safe to run first.
    // newSession() keys a fresh memo map (same context, new reference);
    // these two queries own the deepest memo dependency chains.
    val s2 = spark.newSession()
    assert(graft.queries.GraphQueries
      .queries("q_mutual_knn_clusters_lsh")(s2, sf("sf0.001")).count() > 0)
    val s3 = spark.newSession()
    assert(graft.queries.RetrievalQueries
      .queries("q_hybrid_rrf_indexed")(s3, sf("sf0.001")).count() > 0)
  }

  test("every oracle key has a query; no orphan oracle SQL") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  /** Semantically-allowed-empty at tiny scale: every sf0.001 customer
    * has at least one order, so the EXCEPT difference is empty (the
    * oracle agrees — the hash compare still gates it). */
  private val mayBeEmpty = Set("q_except_custkeys")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      // self-grading queries (Eval.withValidity / dump-and-check
      // invariant columns like occupancy_ok, total_ok) must be all-true:
      // this is the gate that makes a wrong-by-construction ANN search
      // or index build fail the build instead of slipping past a
      // rows-only driver check
      val graded = df.columns
        .filter(c => c == "valid" || c == "within" || c.endsWith("_ok"))
      graded.foreach { c =>
        val bad = df.where(!org.apache.spark.sql.functions.col(c)).count()
        assert(bad === 0, s"$name returned $bad rows with $c = false")
      }
    }
  }
}
