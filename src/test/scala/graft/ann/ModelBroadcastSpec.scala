package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase

/** Contracts of the fit-parallelism and broadcast-memoization utilities
  * the native-expression layer rides on. */
class ModelBroadcastSpec extends AnyFunSuite with SparkSpecBase {

  test("same model instance returns the same broadcast; distinct models get distinct broadcasts") {
    // touch the session so SparkSession.active resolves
    spark.range(1).count()
    val a = Array(Array(1.0, 2.0))
    val b = Array(Array(1.0, 2.0))
    val ba1 = ModelBroadcast.of(a)
    val ba2 = ModelBroadcast.of(a)
    val bb = ModelBroadcast.of(b)
    assert(ba1 eq ba2, "repeated calls must reuse the memoized broadcast")
    assert(!(ba1 eq bb), "distinct model instances must not share a broadcast")
    assert(ba1.value eq a)
  }

  test("ParallelFit propagates a worker failure instead of leaving null results") {
    val out = new Array[String](4)
    val e = intercept[IllegalStateException] {
      ParallelFit.run(4) { i =>
        if (i == 2) throw new IllegalStateException("fit thread died")
        out(i) = s"ok$i"
      }
    }
    assert(e.getMessage === "fit thread died")
    // the surviving slots completed; the failure did not vanish
    assert(out(0) === "ok0" && out(1) === "ok1" && out(3) === "ok3")
  }

  test("ParallelFit completes all slots on success") {
    val out = new Array[Int](8)
    ParallelFit.run(8)(i => out(i) = i + 1)
    assert(out.toSeq === (1 to 8))
  }
}
