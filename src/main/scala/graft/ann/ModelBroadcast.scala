package graft.ann

import scala.reflect.ClassTag

import org.apache.spark.broadcast.Broadcast

/** Broadcast-handle memoization for fitted-model objects referenced by
  * native expressions (LSH forests, IVF centroids, PQ codebooks, ADC
  * table providers).
  *
  * Why not `ctx.addReferenceObj` alone: a reference object rides the
  * task binary, so EVERY task deserializes its own copy — measured as a
  * 32 x 160 MB heap OOM when a 400k-sample 256-d LSH forest met
  * local[32] at 8 GB. A broadcast moves the payload once per executor
  * via torrent blocks and all tasks share the single deserialized
  * instance; it also makes any `@transient lazy` state inside the model
  * (e.g. the IVF-PQ ADC table cache) genuinely per-executor instead of
  * per-task.
  *
  * Both map sides are weak: a Broadcast strongly references its payload,
  * so a strong value would pin the weak key forever and leak one
  * broadcast per trained model in a long-running session. An entry lives
  * exactly as long as some plan (expression) still holds the broadcast —
  * after that the handle is collected, Spark's ContextCleaner reclaims
  * the executor blocks, and a later call simply re-broadcasts.
  */
object ModelBroadcast {
  private val cache =
    new java.util.WeakHashMap[AnyRef, java.lang.ref.WeakReference[Broadcast[_]]]()

  def of[T <: AnyRef: ClassTag](model: T): Broadcast[T] = cache.synchronized {
    val ref = cache.get(model)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit.asInstanceOf[Broadcast[T]]
    else {
      val b = org.apache.spark.sql.SparkSession.active
        .sparkContext.broadcast(model)
      cache.put(model, new java.lang.ref.WeakReference(b))
      b
    }
  }
}
