package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{ExactNN, GraphMaintainer, GraphSearch, KnnGraph}
import graft.ann.lsh.{Lsh, LshConfig}

/** Scoped-vs-full graph refine at scale — the measurement behind
  * [[graft.ann.GraphMaintainer.refineScopedNow]]'s claim: refine cost
  * must track the BATCH (the touched region), not the corpus. Builds a
  * 100k-node LSH kNN graph + backbone, then streams insert batches of
  * increasing size through a scoped maintainer, timing each scheduled
  * scoped refine; one full [[graft.ann.GraphMaintainer.refineNow]] at
  * the end prices the O(n·k) rewrite the scoped pass replaces.
  *
  * Usage: runMain graft.tools.GraphRefineScaleProbe [--noprune|--compare]
  * [n] [batches...]
  * (default: 100000 100 1000 10000; `--noprune` sets scopePruneMax = 0
  * to time the broadcast semi-join fallback; `--compare` builds ONE
  * graph, saves it under two names, and times pruned vs fallback
  * refines on the twin stores in the SAME process and batch sequence —
  * the cross-run noise-free form of the
  * [[graft.ann.GraphMaintainer.scopePruneMax]] SCALE.md row)
  */
object GraphRefineScaleProbe {
  def main(args: Array[String]): Unit = {
    val noPrune = args.contains("--noprune")
    val compare = args.contains("--compare")
    val rest = args.filterNot(a => a == "--noprune" || a == "--compare")
    val n = if (rest.nonEmpty) rest.head.toInt else 100000
    val batchSizes =
      if (rest.length > 1) rest.tail.map(_.toInt).toSeq
      else Seq(100, 1000, 10000)
    val k = 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed[T](f: => T): (T, Double) = ProbeGen.timed(f)
    // clustered corpus generator, deterministic by id (10-point
    // clusters — the GraphScaleProbe geometry)
    def gen(upTo: Long) = ProbeGen.clustered(spark, upTo)

    val corpus = gen(n).persist()
    corpus.count()
    val storeNames =
      if (compare) Seq("refine_scale_p" -> true, "refine_scale_np" -> false)
      else Seq("refine_scale" -> !noPrune)
    storeNames.foreach { case (nm, _) =>
      GraphSearch.dropManagedTables(spark, s"${nm}_edges", s"${nm}_swap_edges")
    }
    val (_, tBuild) = timed {
      val idx = Lsh.train(corpus, "vec_id", "embedding",
        LshConfig(nTrees = 10, kMinVecs = 80, angular = true, seed = 42L))
      val g = KnnGraph.fromLsh(idx, corpus, "vec_id", "embedding", k,
          ExactNN.Cosine, maxBucketOccupancy = 50)
        .select(col("src"), col("dst"))
        .unionByName(GraphSearch.randomBackbone(corpus, "vec_id"))
        .dropDuplicates("src", "dst")
        .localCheckpoint()
      storeNames.foreach { case (nm, _) => GraphSearch.saveBucketed(g, nm) }
    }
    println(f"[refine-scale] n=$n%,d graph built in $tBuild%.1fs")

    val maintainers = storeNames.map { case (nm, prune) =>
      (nm, prune, new GraphMaintainer(spark, nm,
        java.nio.file.Files.createTempDirectory(s"${nm}_lsm").toString,
        "vec_id", "embedding", k = k, beamWidth = 16, hops = 3,
        refineEvery = 1000, maxReverseDegree = 2,
        scopedRefine = true, scopeHops = 1,
        scopePruneMax =
          if (prune) GraphMaintainer.DefaultScopePruneMax else 0,
        // the probe times each path explicitly — bypass the size
        // dispatch so "ON" means pruned even on a sub-threshold table
        scopePruneMinBytes = 0L))
    }
    maintainers.foreach { case (nm, prune, _) =>
      println(s"[refine-scale] store $nm: scan pruning ${if (prune) "ON" else "OFF"}")
    }

    var nextId = n.toLong
    batchSizes.foreach { b =>
      val all = gen(nextId + b).persist()
      all.count()
      val batch = all.where(col("vec_id") >= nextId)
      // 10% deletes from the previous id range exercise the bridges
      val dead = all.where(col("vec_id") >= nextId - b / 10 &&
        col("vec_id") < nextId && col("vec_id") % 10 === 3).select("vec_id")
      val entries = batch.select(col("vec_id").as("query_id"))
        .crossJoin(spark.range(32).select(col("id").as("node")))
      maintainers.foreach { case (nm, _, m) =>
        val (_, tIns) = timed {
          m.onBatch(all, batch, entries, Some(dead))
        }
        val (_, tRef) = timed { m.refineScopedNow(all).count() }
        println(f"[refine-scale] $nm batch=$b%,d: onBatch $tIns%.1fs, " +
          f"scoped refine $tRef%.1fs " +
          s"(pruned=${m.lastScopedPrune.getOrElse(false)})")
      }
      nextId += b
      corpus.unpersist(false)
      all.unpersist(false)
    }
    val allFinal = gen(nextId).persist()
    allFinal.count()
    val (_, tFull) = timed {
      maintainers.head._3.refineNow(allFinal).count()
    }
    println(f"[refine-scale] FULL refine over ${nextId}%,d nodes: $tFull%.1fs")
    spark.stop()
  }
}
