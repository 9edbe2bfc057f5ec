package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.ExactNN
import graft.ann.ivf.{Ivf, IvfConfig}
import graft.eval.Eval

/** Distributed-vs-driver coarse-fit probe: replicates the sf0.1
  * embeddings to `replicas` copies (deterministic jitter, the
  * ScaleProbe recipe), then fits IVF twice at a sampleCap of the FULL
  * corpus — once through the driver-collect path, once through the
  * MLlib k-means|| path (`driverFitMaxSample = 1`) — and reports fit
  * wall time plus same-operating-point recall for both. The point on
  * the curve past what the driver path can hold is taken by raising
  * `replicas`/dims until collectVectors would exceed the heap; the
  * distributed row keeps working there (only nCells × dims doubles
  * ever reach the driver).
  *
  * Usage: runMain graft.tools.DistFitProbe [replicas=200] [nCells=256] [nProbe=16]
  * Env: SPARK_GRAFT_DIMS (default 64), SPARK_GRAFT_SKIP_DRIVER=1 to
  * measure only the distributed row (for the beyond-driver point).
  */
object DistFitProbe {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args(0).toInt else 200
    val nCells = if (args.length > 1) args(1).toInt else 256
    val nProbe = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dims = sys.env.getOrElse("SPARK_GRAFT_DIMS", "64").toInt
    val base0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val base =
      if (dims == 64) base0
      else {
        val tiles = (dims + 63) / 64
        base0.select(col("vec_id"),
          slice(flatten(transform(sequence(lit(0), lit(tiles - 1)), t =>
            transform(col("embedding"), (x, i) =>
              x + (pmod(xxhash64(t, col("vec_id"), i), lit(1000))
                .cast("double") - 500.0) / 5000.0))), 1, dims).as("embedding"))
      }
    val baseN = base.count()
    val corpus = spark.range(replicas).crossJoin(base)
      .select(
        (col("id") * baseN + col("vec_id")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (pmod(xxhash64(col("id"), col("vec_id"), i), lit(1000))
            .cast("double") - 500.0) / 50000.0).as("embedding"))
      .persist()
    val n = corpus.count()
    println(s"corpus: $n x $dims-d; nCells=$nCells nProbe=$nProbe")
    val queries = corpus.where(col("vec_id") < 200)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val gt = ExactNN.topKAgg(queries, corpus, 10, ExactNN.L2)
      .select("query_id", "vec_id").persist()
    gt.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def recallOf(idx: graft.ann.ivf.IvfIndex): Double =
      Eval.setPrecisionRecall(
          idx.searchAll(queries, 10).select("query_id", "vec_id"), gt)
        .agg(avg("recall")).head().getDouble(0)

    // sampleCap = FULL corpus: the regime where the driver path's
    // collect is the bottleneck and the distributed path shines
    val cfg = IvfConfig(nCells = nCells, nProbe = nProbe, seed = 42L,
      sampleCap = Int.MaxValue)
    if (!sys.env.get("SPARK_GRAFT_SKIP_DRIVER").contains("1")) {
      val (idxDriver, tDriver) =
        time(Ivf.train(corpus, "vec_id", "embedding", cfg))
      println(f"driver-fit:      ${tDriver}%8.1f s  recall@$nProbe probes: ${recallOf(idxDriver)}%.4f")
    }
    val (idxDist, tDist) = time(Ivf.train(corpus, "vec_id", "embedding",
      cfg.copy(driverFitMaxSample = 1)))
    println(f"distributed-fit: ${tDist}%8.1f s  recall@$nProbe probes: ${recallOf(idxDist)}%.4f")
    spark.stop()
  }
}
