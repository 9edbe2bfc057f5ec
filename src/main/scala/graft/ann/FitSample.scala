package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Driver-side fit-sample collection shared by the LSH/IVF/PQ trainers.
  *
  * Collects the vector column as PRIMITIVE double arrays through the
  * Dataset encoder (`UnsafeArrayData.toDoubleArray`) instead of
  * `collect().map(_.getSeq[Double])`: the Row form boxes every element
  * (java.lang.Double + Seq wrapper, ~5x the raw payload) and its
  * allocation churn at the recommended GloVe-regime sample size
  * (sampleCap ≈ total/3 ≈ 400k x 256-d, ~820 MB raw) was measured to
  * drive G1 into GCLocker retry failures on a 48 GB driver heap. The
  * primitive form lands the same sample in ~1 GB with bulk copies. */
object FitSample {

  /** Collect `vecCol` of an (already sampled) DataFrame as primitive
    * double arrays. */
  def collectVectors(sampled: DataFrame, vecCol: String): Array[Array[Double]] = {
    val spark = sampled.sparkSession
    import spark.implicits._
    sampled
      .select(col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .as[Array[Double]]
      .collect()
  }
}
