package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.{ExactNN, GraphSearch, KnnGraph}

/** Graph-index MAINTENANCE on a vector stream — the write twin of
  * StreamingGraphServeSpec: new vectors arrive in micro-batches, each
  * batch beam-searches the CURRENT stored graph for its neighbors
  * (GraphSearch.insert), and the resulting edge delta is appended to
  * the stored bucketed table (GraphSearch.appendBucketed) — no rewrite
  * of the existing graph, batch 2's walks see batch 1's nodes. The
  * identity under test: the stored graph after the streaming loop is
  * edge-identical to a driver-side batch loop applying the same
  * inserts in the same batch splits — the streaming machinery
  * (MemoryStream, foreachBatch, warehouse append) adds and loses
  * nothing. */
class StreamingGraphInsertSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  test("foreachBatch insert + bucketed append == sequential batch inserts; new nodes served") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val existing = emb.where($"vec_id" < 480)
    val arriving = emb.where($"vec_id" >= 480)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)

    val base = KnnGraph.exact(existing, "vec_id", "embedding", 4, ExactNN.Cosine)
      .select($"src", $"dst")
      .unionByName(GraphSearch.randomBackbone(existing, "vec_id"))
      .dropDuplicates("src", "dst")
    spark.sql("DROP TABLE IF EXISTS ins_spec_graph_edges")
    val loc = new java.io.File("target/spark-warehouse/ins_spec_graph_edges")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    GraphSearch.saveBucketed(base, "ins_spec_graph")

    // one maintenance step: beam-insert `batch` against `stored` and
    // return the delta (every edge touching an arriving id) — shared
    // verbatim by the streaming and batch sides so the identity tests
    // the MACHINERY (stream wiring + bucketed append), not the operator
    def insertDelta(stored: org.apache.spark.sql.DataFrame,
                    batch: org.apache.spark.sql.DataFrame) = {
      val ids = batch.select($"vec_id").as[Long].collect().toSeq
      val entries = batch.select($"vec_id".as("query_id"))
        .crossJoin((0L until 8L).toDF("node"))
      GraphSearch.insert(stored.withColumn("dist", lit(2.0)), emb,
          "vec_id", "embedding", batch, 4, 8, 2, entries,
          maxReverseDegree = 2, symmetrize = false)
        .where($"src".isin(ids: _*) || $"dst".isin(ids: _*))
        .select($"src", $"dst")
    }

    // batch twin: same splits applied sequentially, graph state kept
    // driver-side as a symmetrized edge set
    val (a, b) = arriving.splitAt(10)
    var gset = base
      .unionByName(base.select($"dst".as("src"), $"src".as("dst")))
      .as[(Long, Long)].collect().toSet
    for (split <- Seq(a, b)) {
      val stored = gset.toSeq.toDF("src", "dst")
      val delta = insertDelta(stored, split.toDF("vec_id", "embedding"))
        .as[(Long, Long)].collect()
      gset ++= delta.flatMap(e => Seq(e, e.swap))
    }

    // streaming side: the stored bucketed table IS the graph state
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batchDf: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batchDf.isEmpty) {
          val stored = GraphSearch.loadBucketed(spark, "ins_spec_graph")
          GraphSearch.appendBucketed(insertDelta(stored, batchDf),
            "ins_spec_graph")
        }
        ()
      }
      .start()
    try {
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = GraphSearch.loadBucketed(spark, "ins_spec_graph")
      .as[(Long, Long)].collect().toSet
    assert(streamed === gset,
      s"streamed-maintained graph diverged: ${streamed.size} vs ${gset.size} edges")

    // the maintained graph SERVES the new content: each arriving
    // node's own vector finds it at rank 1, dist 0
    val stored = GraphSearch.loadBucketed(spark, "ins_spec_graph")
    val q2 = arriving.take(5).toDF("query_id", "qv")
    val served = GraphSearch.beamFrom(stored, emb, "vec_id", "embedding",
        q2, q2.select($"query_id").crossJoin((0L until 32L).toDF("node")),
        1, 32, 6, symmetrize = false)
      .as[(Long, Long, Double)].collect()
    served.foreach { case (qid, vid, dist) =>
      assert(vid === qid && dist === 0.0, s"new node $qid not served: ($vid, $dist)")
    }
  }
}
