package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** [[GraphSearch.beamFrom]] `pruneScanMax` — the stored-table serving
  * shape: each hop collects the (driver-bounded) frontier ids and
  * pre-filters the edge and vector reads with an InSet, which
  * bucket-prunes a [[GraphSearch.saveBucketed]] graph instead of
  * scanning it per hop. Contracts:
  *
  *   - IDENTITY: pruned == unpruned, row for row, on the same stored
  *     graph — including with `excluded` and `allowed` in play (the
  *     InSet only names rows the hop join keeps anyway);
  *   - the pruned walk READS less (task input bytes) when the frontier
  *     touches few buckets;
  *   - a frontier past the cap runs that hop unpruned (still
  *     identical).
  */
class BeamPruneSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def clustered: DataFrame = {
    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(50)(Array.fill(64)(rnd.nextGaussian()))
    (0 until 500).map { i =>
      val c = centers(i / 10)
      (i.toLong, c.map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def storedGraph(e: DataFrame, name: String): DataFrame = {
    GraphSearch.dropManagedTables(spark, s"${name}_edges")
    val g = KnnGraph.exact(e, "vec_id", "embedding", 5, ExactNN.Cosine)
      .select($"src", $"dst")
      .unionByName(GraphSearch.randomBackbone(e, "vec_id"))
      .dropDuplicates("src", "dst")
    GraphSearch.saveBucketed(g, name)
    GraphSearch.loadBucketed(spark, name)
  }

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.select($"query_id", $"vec_id", $"dist")
      .as[(Long, Long, Double)].collect().toSet

  test("pruned serving == unpruned, with excluded and allowed in play") {
    val e = clustered
    val g = storedGraph(e, "beam_prune_id")
    val q = e.orderBy("vec_id").limit(20)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val entries = q.select($"query_id")
      .crossJoin((0L until 16L).toDF("node"))
    val excl = Some((0L until 500L by 7L).toDF("vec_id"))
    def run(prune: Int) = rows(GraphSearch.beamFrom(g, e, "vec_id",
      "embedding", q, entries, 10, 16, 4, ExactNN.Cosine,
      symmetrize = false, excluded = excl,
      allowed = Some($"vec_id" % 2 === 0), pruneScanMax = prune))
    assert(run(50000) === run(0))
    // cap of 3: every frontier overflows — still identical
    assert(run(3) === run(0))
  }

  test("the pruned walk reads fewer bytes off the stored graph") {
    val e = clustered
    val g = storedGraph(e, "beam_prune_io")
    // a tiny frontier (2 queries, narrow beam) touches few of the 64
    // buckets — the InSet hop reads should show up as an I/O drop
    val q = e.orderBy("vec_id").limit(2)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val entries = q.select($"query_id")
      .crossJoin((0L until 4L).toDF("node"))
    def bytesRead(work: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            ev: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (ev.taskMetrics != null)
            acc.addAndGet(ev.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        work
        var last = -1L; var stable = 0; var waited = 0
        while (stable < 3 && waited < 100) {
          Thread.sleep(100); waited += 1
          val now = acc.get()
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
        acc.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    def run(prune: Int): Long = bytesRead {
      GraphSearch.beamFrom(g, e, "vec_id", "embedding", q, entries,
        5, 8, 3, ExactNN.Cosine, symmetrize = false,
        pruneScanMax = prune).collect()
    }
    val unpruned = run(0)
    val pruned = run(50000)
    assert(pruned < (unpruned * 0.8).toLong,
      s"pruned walk read $pruned bytes vs unpruned $unpruned")
  }
}
