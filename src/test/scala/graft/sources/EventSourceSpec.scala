package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.streaming.EventStreams

/** File-based streaming source parity: the same hourly transform over
  * EventSource.read and EventSource.readStream (files arriving in a
  * watched directory) must produce identical results. */
class EventSourceSpec extends AnyFunSuite with SparkSpecBase {

  test("parquet file stream == batch through the shared hourly transform") {
    val batchDf = EventSource.read(spark, sf("sf0.001"))
    val batch = EventStreams.hourlyCounts(batchDf)
      .orderBy("hour", "event_type").collect().toSeq
    assert(batch.nonEmpty)

    val dir = Files.createTempDirectory("ev_stream")
    Files.copy(Paths.get(sf("sf0.001") + "/events.parquet"),
      dir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventStreams.hourlyCounts(EventSource.readStream(spark, dir.toString))
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_hourly")
        .orderBy("hour", "event_type").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }
}
