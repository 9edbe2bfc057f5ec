package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.{ExactNN, GraphSearch, KnnGraph}

/** Graph-index serving on a query stream: the edge list is a static
  * pre-symmetrized stored table, queries arrive in micro-batches, and
  * each batch runs the bounded beam walk via `foreachBatch` — the
  * serving pattern for an iterative algorithm a single streaming query
  * plan can't express (each hop is a new join round; `foreachBatch`
  * gives every micro-batch a full batch plan against static state,
  * exactly how a deployed graph index consumes a query feed). Results
  * must be row-identical to the batch walk over the same queries. */
class StreamingGraphServeSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  test("foreachBatch beam over a stored graph == batch walk, across micro-batches") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val graph = KnnGraph.exact(emb, "vec_id", "embedding", 4, ExactNN.Cosine)
      .select($"src", $"dst")
      .unionByName(GraphSearch.randomBackbone(emb, "vec_id"))
      .dropDuplicates("src", "dst")
    spark.sql("DROP TABLE IF EXISTS serve_spec_graph_edges")
    val loc = new java.io.File("target/spark-warehouse/serve_spec_graph_edges")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    GraphSearch.saveBucketed(graph, "serve_spec_graph")
    val stored = GraphSearch.loadBucketed(spark, "serve_spec_graph")

    val queries = emb.orderBy("vec_id").limit(12)
      .select($"vec_id".as("query_id"), $"embedding".cast("array<double>").as("qv"))
      .as[(Long, Seq[Double])].collect().toSeq
    val entry = (0L until 8L).toSeq

    def walk(q: org.apache.spark.sql.DataFrame) =
      GraphSearch.beamFrom(stored, emb, "vec_id", "embedding", q,
        q.select($"query_id").crossJoin(entry.toDF("node")),
        k = 5, beamWidth = 8, hops = 2, symmetrize = false)

    val batch = walk(queries.toDF("query_id", "qv"))
      .as[(Long, Long, Double)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val got = mutable.Set.empty[(Long, Long, Double)]
    val q = mem.toDF().toDF("query_id", "qv")
      .writeStream
      .foreachBatch { (batchDf: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= walk(batchDf).as[(Long, Long, Double)].collect()
        }
        ()
      }
      .start()
    try {
      val (a, b) = queries.splitAt(7)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      assert(got.toSet === batch, "streamed beam results diverged from batch")
    } finally q.stop()
  }
}
