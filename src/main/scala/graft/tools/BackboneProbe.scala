package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: time randomBackbone's rank-free dense-id path against the
  * old global-Window row_number form at 1M nodes (delete after use). */
object BackboneProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args.head.toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val vectors = spark.range(n).select(col("id").as("vec_id"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // new path (dense detection + pure projection)
    val (cNew, tNew) =
      time(graft.ann.GraphSearch.randomBackbone(vectors, "vec_id").count())
    // old form: global-Window rank + join (inlined replica)
    val (cOld, tOld) = time {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("node"))
      val idx = vectors.select(col("vec_id").as("node"))
        .withColumn("i", row_number().over(w).cast("long") - 1)
      val total = idx.count()
      idx.select(col("node").as("src"), col("i"),
          explode(sequence(lit(0), lit(1))).as("j"))
        .select(col("src"),
          pmod(xxhash64(col("i"), col("j")), lit(total)).as("ti"))
        .join(idx.select(col("i").as("ti"), col("node").as("dst")), "ti")
        .where(col("src") =!= col("dst"))
        .select("src", "dst")
        .count()
    }
    println(f"[backbone] n=$n%,d new=${tNew}%.2fs ($cNew edges) " +
      f"old_window=${tOld}%.2fs ($cOld edges) speedup=${tOld / tNew}%.1fx")
    spark.stop()
  }
}
