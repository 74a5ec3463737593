package graft.ext

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private def run(events: Seq[Sessionize.Event], gapMin: Int = 10, cap: Int = 5) =
    Sessionize.sessions(spark, spark.createDataset(events),
        gapMillis = gapMin * 60 * 1000L, cap = cap)
      .collect().sortBy(s => (s.user_id, s.session_idx)).toSeq

  test("gap closes a session; end = last ts + gap") {
    val got = run(Seq(
      Sessionize.Event(1L, ts(0), 1.0, 1),
      Sessionize.Event(1L, ts(5), 2.0, 2),
      Sessionize.Event(1L, ts(20), 3.0, 3))) // 15-min quiet gap → new session
    assert(got.map(s => (s.session_idx, s.cnt, s.s_start, s.s_end, s.max_value)) == Seq(
      (0L, 2L, ts(0), ts(15), 2.0),
      (1L, 1L, ts(20), ts(30), 3.0)))
  }

  test("boundary: an event exactly gap after the previous starts a new session") {
    val got = run(Seq(
      Sessionize.Event(1L, ts(0), 1.0, 1),
      Sessionize.Event(1L, ts(10), 2.0, 2))) // ts == last + gap → closes
    assert(got.map(_.cnt) == Seq(1L, 1L))
  }

  test("activity cap splits a dense burst every `cap` events") {
    val events = (0 until 12).map(i => Sessionize.Event(1L, ts(i / 2, 30 * (i % 2)), i.toDouble, i.toLong))
    val got = run(events, cap = 5)
    assert(got.map(_.cnt) == Seq(5L, 5L, 2L))
    assert(got.map(_.session_idx) == Seq(0L, 1L, 2L))
    assert(got.map(_.max_value) == Seq(4.0, 9.0, 11.0))
  }

  test("keys fold independently; ties break on event_id") {
    val got = run(Seq(
      Sessionize.Event(2L, ts(0), 5.0, 11),
      Sessionize.Event(1L, ts(0), 7.0, 10),
      Sessionize.Event(1L, ts(0), 6.0, 9))) // same ts, order by event_id
    assert(got.map(s => (s.user_id, s.cnt)) == Seq((1L, 2L), (2L, 1L)))
    assert(got.head.max_value == 7.0)
  }

  test("streaming: state persists across micro-batches, event-time timeout flushes quiet users") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val gapMs = 10 * 60 * 1000L
    val batch = graft.ops.normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
      .select("user_id", "ts", "value", "event_id")
    // two time-split files → two micro-batches in event-time order
    val cut = batch.selectExpr(
      "timestamp_micros(cast(percentile_approx(unix_micros(ts), 0.5) as long))")
      .head().getTimestamp(0)
    val stage = graft.ops.FixtureRoots.path("graft_sess_stream")
    batch.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$stage/b0")
    batch.filter(col("ts") > cut).coalesce(1).write.parquet(s"$stage/b1")
    val land = java.nio.file.Files.createDirectory(stage.resolve("land"))
    def stageFile(sub: String, mtime: Long): Unit = {
      val f = java.nio.file.Files.list(stage.resolve(sub)).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      val dst = land.resolve(s"$sub.parquet")
      java.nio.file.Files.copy(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stageFile("b0", 1000000L); stageFile("b1", 2000000L) // order by mtime
    import spark.implicits._
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(land.toString)
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.Event]
    val q = Sessionize.sessionsStream(spark, stream, gapMs, cap = 5)
      .writeStream.format("memory").queryName("sess_stream_sink")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sess_stream_sink").as[Sessionize.Session]
      .collect().map(s => (s.user_id, s.session_idx, s.s_start, s.s_end, s.cnt, s.max_value))
      .toSet
    // expected: the batch fold, minus sessions still open at the final
    // watermark (= max ts): timeout fires only when watermark > last+gap
    val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
    val all = Sessionize.sessions(spark, batch.as[Sessionize.Event], gapMs, cap = 5)
      .collect()
    val expected = all.filter(_.s_end.compareTo(maxTs) < 0)
      .map(s => (s.user_id, s.session_idx, s.s_start, s.s_end, s.cnt, s.max_value))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < all.length) // some sessions stayed open
  }

  test("property: chunked incremental folding equals one-shot folding (stream ≡ batch)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gapUs = 5L * 60 * 1000000
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val evGen = for {
      offsetSec <- Gen.choose(0, 90 * 60) // 90 minutes of event time
      value <- Gen.choose(-100.0, 100.0)
      id <- Gen.choose(1L, 1000000L)
    } yield Sessionize.Event(1L, new Timestamp(base + offsetSec * 1000L), value, id)
    def sample(seed: Long): List[Sessionize.Event] =
      Gen.listOfN(40, evGen)(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error("gen failed"))
    for (seed <- 1L to 20L; cap <- Seq(3, Int.MaxValue)) {
      val events = sample(seed).sortBy(e => (e.ts.getTime, e.event_id))
      def finish(st: Sessionize.SessState): Seq[Sessionize.Session] =
        st.open.map(o => Sessionize.Session(1L, st.nextIdx,
          new Timestamp(o.startUs / 1000), new Timestamp((o.lastUs + gapUs) / 1000),
          o.cnt, o.maxValue)).toSeq
      val (st1, closed1) =
        Sessionize.foldEvents(1L, Sessionize.SessState(0L, None), events.iterator, gapUs, cap)
      val oneShot = closed1 ++ finish(st1)
      // every time-ordered split point must produce the identical history
      for (cut <- Seq(0, 1, events.length / 2, events.length - 1, events.length)) {
        val (a, b) = events.splitAt(cut)
        val (stA, closedA) =
          Sessionize.foldEvents(1L, Sessionize.SessState(0L, None), a.iterator, gapUs, cap)
        val (stB, closedB) = Sessionize.foldEvents(1L, stA, b.iterator, gapUs, cap)
        val chunked = closedA ++ closedB ++ finish(stB)
        assert(chunked == oneShot, s"seed=$seed cap=$cap cut=$cut")
      }
    }
  }

  test("a boundary-late cross-chunk event never regresses the open session end") {
    val gapUs = 5L * 60 * 1000000
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ev(offsetSec: Int, id: Long) =
      Sessionize.Event(1L, new Timestamp(base + offsetSec * 1000L), 1.0, id)
    // chunk 1 ends with an open session whose last event is t=120s
    val (st1, c1) = Sessionize.foldEvents(1L, Sessionize.SessState(0L, None),
      Iterator(ev(0, 1), ev(120, 2)), gapUs, Int.MaxValue)
    assert(c1.isEmpty && st1.open.get.cnt == 2L)
    val endAfterChunk1 = st1.open.get.lastUs
    // chunk 2 delivers an event OLDER than the open session's last event
    // (above the watermark, out of order across micro-batches): it must add
    // to cnt but never move the session end / gap anchor backward
    val (st2, c2) = Sessionize.foldEvents(1L, st1, Iterator(ev(60, 3)), gapUs, Int.MaxValue)
    assert(c2.isEmpty)
    assert(st2.open.get.cnt == 3L)
    assert(st2.open.get.lastUs == endAfterChunk1)
    // and the gap anchor still closes relative to t=120s, not t=60s
    val (st3, c3) = Sessionize.foldEvents(1L, st2,
      Iterator(ev(120 + 299, 4)), gapUs, Int.MaxValue) // 299s later: same session
    assert(c3.isEmpty && st3.open.get.cnt == 4L)
  }

  test("matches the declarative session_window when the cap never binds") {
    val ev = graft.ops.normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
      .select("user_id", "ts", "value", "event_id")
      .as[Sessionize.Event]
    val custom = Sessionize.sessions(spark, ev,
        gapMillis = 10 * 60 * 1000L, cap = Int.MaxValue)
      .select("user_id", "s_start", "s_end", "cnt")
    import org.apache.spark.sql.functions._
    val declarative = ev.toDF()
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("cnt"))
    assert(custom.exceptAll(declarative).isEmpty && declarative.exceptAll(custom).isEmpty)
  }
}
