package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{CodesMaintainer, DriftCheck}
import graft.ann.sq.Sq

/** Cost of the closed drift loop's refit step at scale — the
  * measurement behind [[graft.ann.CodesMaintainer.refitAndSwap]]'s
  * SCALE.md note: build a 500k-row SQ codes store, stream drifted
  * batches until `refitDue` fires (510k live rows), then time the
  * atomic refit-and-swap (family re-fit + full re-encode + crash-safe
  * commit) against the one-time build it replaces. Unlike the postings
  * store's O(drift) `mergeRefit`, a codes refit is O(corpus) BY DESIGN
  * — the model itself (bounds/codebooks/cells) must see the new
  * distribution — so the note prices "how often can a deployment
  * afford refitDue" rather than claiming drift-bounded cost.
  *
  * Usage: runMain graft.tools.RefitCostProbe [n] [batch]
  * (default: 500000 5000)
  */
object RefitCostProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args.head.toInt else 500000
    val batch = if (args.length > 1) args(1).toInt else 5000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // deterministic 64-d corpus; ids past n carry a +6 location shift
    // (the drifted mode the frozen bounds saturate on)
    def gen(from: Long, upTo: Long, shift: Double) =
      spark.range(from, upTo).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          (pmod(xxhash64(col("id"), i), lit(2000))
            .cast("double") - 1000.0) / 250.0 + shift).as("embedding"))

    val dir = java.nio.file.Files.createTempDirectory("refit_cost").toString
    val fit = gen(0, n, 0.0).persist()
    fit.count()
    val (idx, tBuild) = timed {
      val i = Sq.train(fit, "vec_id", "embedding")
      i.save(spark, s"$dir/idx")
      i
    }
    DriftCheck.writeFitStats(fit, s"$dir/fit_stats")
    println(f"[refit-cost] n=$n%,d SQ build+save $tBuild%.1fs")

    val m = new CodesMaintainer(spark, s"$dir/idx",
      encode = a => idx.model.transformDf(a, "vec_id", "embedding"),
      compactEvery = 100,
      driftCheck = Some(new DriftCheck(spark, s"$dir/fit_stats")),
      refitAfterBreaches = 2)
    var nextId = n.toLong
    var tBatches = 0.0
    while (!m.refitDue) {
      val a = gen(nextId, nextId + batch, 6.0)
      val (_, t) = timed { m.onBatch(Some(a), None) }
      tBatches += t
      nextId += batch
      println(f"[refit-cost] drifted batch of $batch%,d: $t%.1fs " +
        f"(breaches ${m.driftBreaches})")
    }
    val corpus = fit.unionByName(gen(n, nextId, 6.0)).persist()
    corpus.count()
    val (_, tRefit) = timed {
      val model2 = Sq.fit(corpus, "embedding")
      m.refitAndSwap(corpus,
        newEncode = df => model2.transformDf(df, "vec_id", "embedding"),
        writeModel = tmp => model2.save(spark, tmp),
        modelSubs = Seq("bounds", "meta"))
      DriftCheck.writeFitStats(corpus, s"$dir/fit_stats")
    }
    val served = m.liveCodes.count()
    println(f"[refit-cost] refitAndSwap over ${nextId}%,d live rows: " +
      f"$tRefit%.1fs (vs $tBuild%.1fs one-time build; " +
      f"$served%,d rows served; refitDue=${m.refitDue})")
    spark.stop()
  }
}
