package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}
import EventStream.Ev

class EventStreamSpec extends AnyFunSuite with SparkSuite {

  // offset keeps test events above the initial watermark (epoch 0)
  private val Base = 1440L
  private def ts(min: Long): Timestamp = new Timestamp((Base + min) * 60000L)

  test("streaming hourly counts equal the batch aggregation once drained") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfDir, "events")
      .select("ts", "event_type", "value").limit(500)
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventStream.hourlyCounts(
        input.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      input.addData(events.collect().map(r =>
        (r.getTimestamp(0), r.getString(1), r.getDouble(2))).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = EventStream.hourlyCounts(events)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("file-source streaming over the events fixture equals batch") {
    // the fixture has shipped as NANOS and MICROS parquet over time — the
    // stream must route through the same layout dispatch as graft.Tables
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source wants a directory; stage the single fixture file
    val stageDir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(stageDir.toString))
    val q = EventStream.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly_file_src")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_file_src")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = EventStream.hourlyCounts(Tables(spark, sfDir, "events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionizer emits gap-separated sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.sessionize(input.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 2h gap, a new
      // event, and finally a far-future event to advance the watermark past
      // the first session's timeout.
      input.addData(Ev(1, ts(0), 1.0), Ev(1, ts(10), 2.0))
      q.processAllAvailable()
      input.addData(Ev(1, ts(130), 5.0))
      q.processAllAvailable()
      input.addData(Ev(2, ts(2000), 1.0)) // watermark = 2000m - 60m
      q.processAllAvailable()
      val sessions = spark.table("sessions_out").orderBy("start_s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      // session 1 closed by the gap event; session 2 closed by timeout
      assert(sessions.length >= 2)
      assert(sessions(0) == ((1L, Base * 60, Base * 60 + 600, 2, 3.0)))
      assert(sessions(1) == ((1L, (Base + 130) * 60, (Base + 130) * 60, 1, 5.0)))
    } finally q.stop()
  }

  test("late in-watermark events never rewind a session's end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.sessionize(input.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      input.addData(Ev(1, ts(0), 1.0), Ev(1, ts(10), 2.0))
      q.processAllAvailable()
      input.addData(Ev(1, ts(5), 4.0)) // late but within the 1h watermark
      q.processAllAvailable()
      input.addData(Ev(2, ts(5000), 1.0)) // advance watermark → flush user 1
      q.processAllAvailable()
      val s = spark.table("sessions_late").where(col("user_id") === 1)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      assert(s.toSeq == Seq((Base * 60, Base * 60 + 600, 3, 7.0)),
        s"late event mishandled: ${s.toSeq}")
    } finally q.stop()
  }

  test("batch sessionization and streaming sessionizer agree on fixture events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
      .collect().sortBy(_.ts.getTime)
    val input = MemoryStream[Ev]
    val q = EventStream.sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions_fixture")
      .outputMode("append").start()
    try {
      input.addData(evs.toSeq)
      q.processAllAvailable()
      // close everything: event far past the last ts
      val last = evs.last.ts.getTime / 60000
      input.addData(Ev(-1, ts(last + 10000), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions_fixture")
        .where(col("user_id") =!= -1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      val batch = graft.operators.Events.sessionize(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("start_s"),
          r.getAs[Long]("end_s"), r.getAs[Long]("n_events").toInt)).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch range join") {
    val streamed = EventStream.clicksAfterErrorsStream(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = graft.operators.Events.clicksAfterErrors(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("streaming exact dedup equals the batch groupBy face") {
    val streamed = DedupStream.dedupExactFromFiles(spark, sfDir)
      .collect().map(_.toSeq)
    val batch = graft.operators.Dedup.exact(spark, sfDir)
      .collect().map(_.toSeq)
    assert(streamed.sameElements(batch))
  }

  test("streaming LSH near-dup equals the batch incremental face") {
    val streamed = DedupStream.minhashPairsFromStream(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.operators.Dedup.minhashPairsIncremental(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      s"streamed ${streamed.length} pairs vs batch ${batch.length}")
  }
}
