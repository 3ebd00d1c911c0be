package graft.tools

import java.nio.file.{Files, Paths}

import graft.streaming.Streams

/** Minimal runnable example of the streaming surface: stage the
  * events fixture as a landing directory, run the watermarked
  * windowed aggregation to completion, print the head.
  * Usage: runMain graft.tools.StreamDemo [eventsParquetFile] */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001/events.parquet")
    val spark = graft.core.Session.getOrCreate("graft-stream-demo")
    val dir = Files.createTempDirectory("events_landing")
    Files.copy(Paths.get(src), dir.resolve("part-0.parquet"))
    val agg = Streams.windowedAgg(
      Streams.eventStream(spark, dir.toString), "1 hour", "0 seconds")
    val out = Streams.runToMemory(agg, "demo")
    println(s"[stream-demo] windows emitted: ${out.count()}")
    out.orderBy("window_start", "event_type").show(10, truncate = false)
    spark.stop()
  }
}
