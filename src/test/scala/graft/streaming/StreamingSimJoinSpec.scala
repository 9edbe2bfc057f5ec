package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.ann.ExactNN
import graft.ann.lsh.{Lsh, LshConfig}
import graft.functions.exprs

/** Streaming twin of [[graft.ann.lsh.LshIndex.similarityJoin]]: set B
  * arrives as a stream against A's FROZEN forest (the record-linkage
  * serving shape — a static master corpus, a live feed of records to
  * link). Every stage of the batch join is stream-compatible as
  * written: B hashes map-side through the frozen model, candidates are
  * a stream-static equi-join on (tree_id, hash), the per-pair dedup is
  * `dropDuplicates` keyed state, and B's embedding rides the pipeline
  * (a stream cannot re-join itself, so the vb join of the batch form
  * becomes a carried column — same rows, proved here). Append-mode
  * output: a pair is emitted exactly once, when its B row arrives. */
class StreamingSimJoinSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  test("streamed B against frozen A forest == batch similarityJoin") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val a = emb.where($"vec_id" % 2 === 0)
    val bRows = emb.where($"vec_id" % 2 === 1)
      .as[(Long, Seq[Double])].collect().toSeq
    val threshold = 1.2

    val idx = Lsh.train(a, "vec_id", "embedding",
      LshConfig(nTrees = 5, kMinVecs = 16, seed = 13L))
    idx.buckets.persist().count()

    val batch = idx
      .similarityJoin(bRows.toDF("vec_id", "embedding"), "vec_id",
        "embedding", threshold, ExactNN.L2)
      .orderBy("vec_a", "vec_b").collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    // model.transform with B's embedding carried along (the batch form
    // drops it and re-joins `other`; a stream cannot re-join itself)
    val bBuckets = mem.toDF().toDF("b_id", "b_emb")
      .select($"b_id", $"b_emb",
        posexplode(graft.ann.lsh.LshExpressions.lshHashes(idx.model, $"b_emb")))
      .select($"b_id", $"b_emb", $"pos".as("tree_id"), $"col".as("hash"))
    val va = idx.vectors.select($"vec_id".as("vec_a"), $"embedding".as("ea"))
    val pairs = idx.buckets.join(bBuckets, Seq("tree_id", "hash"))
      .select($"vec_id".as("vec_a"), $"b_id".as("vec_b"), $"b_emb")
      .dropDuplicates("vec_a", "vec_b")
      .join(va, "vec_a")
      .select($"vec_a", $"vec_b",
        round(exprs.l2DistNative($"ea", $"b_emb"), 6).as("dist"))
      .where($"dist" <= threshold)
    val q = pairs.writeStream.format("memory").queryName("stream_simjoin")
      .outputMode("append").start()
    try {
      mem.addData(bRows.take(bRows.size / 2): _*)
      q.processAllAvailable()
      val firstHalf = spark.table("stream_simjoin").count()
      mem.addData(bRows.drop(bRows.size / 2): _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_simjoin")
        .orderBy("vec_a", "vec_b").collect().toSeq
      assert(streamed === batch)
      // append semantics: the first micro-batch emitted only the pairs
      // whose B row had arrived — monotone delivery, no retraction
      assert(firstHalf > 0 && firstHalf < streamed.size)
    } finally q.stop()
  }
}
