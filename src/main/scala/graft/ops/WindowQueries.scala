package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.DoubleType

/**
 * Time-window operators over the `events` table — the reference leaves
 * SURVEY §2.5 empty and names windowed dedup only as a design alternative
 * (`README.md:89`); these fill the category with the three Structured
 * Streaming window shapes (tumbling / sliding / session), expressed in batch
 * mode with the exact same `window()` / `session_window()` operators a
 * `readStream` plan would use (the plans are identical modulo the
 * watermark-driven state cleanup, which streaming tests cover separately).
 *
 * Scale: tumbling/sliding windows are a single hash aggregation keyed on
 * (window, group) — shuffle-partitioned by key, no skew concerns since
 * windows are time-uniform. Session windows shuffle once on user_id.
 */
object WindowQueries {

  val all: Seq[Q] = Seq(

    // Tumbling 1-hour windows per event_type.
    Q("w_tumbling", (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("w_start", "event_type"),
      Some(s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
          time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
          event_type, COUNT(*) AS cnt, ${dsumSql("value")} AS sum_value
        FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""")),

    // Sliding windows: 1-hour length, 30-minute slide (each event lands in
    // exactly two windows; the oracle replays that as a two-way shifted union).
    Q("w_sliding", (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("cnt"), col("sum_value"))
        .orderBy("w_start"),
      Some(s"""WITH ev AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, value FROM events),
        exploded AS (
          SELECT b AS w_start, value FROM ev
          UNION ALL
          SELECT b - INTERVAL '30 minutes' AS w_start, value FROM ev)
        SELECT w_start, w_start + INTERVAL '1 hour' AS w_end,
          COUNT(*) AS cnt, ${dsumSql("value")} AS sum_value
        FROM exploded GROUP BY 1, 2 ORDER BY w_start""")),

    // The SAME tumbling aggregation as a real Structured Streaming query:
    // parquet file stream → watermark → windowed agg → memory sink,
    // AvailableNow. Complete output mode makes the drained result equal the
    // batch plan's, so the batch oracle replays it exactly — proving the
    // streaming operator (state store + watermark plumbing) computes the
    // identical aggregation.
    Q("w_streaming_tumbling", (s, d) => withShufflePartitions(s, 4) {
      // the streaming file source wants a directory: stage the single
      // parquet file into one (byte copy, file-level)
      val stage = FixtureRoots.path("graft_wst")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        stage.resolve("events.parquet"))
      val raw = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(raw).parquet(stage.toString)
        .transform(normalizeTs)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("cnt"), col("sum_value"))
      val q = stream.writeStream.format("memory")
        .queryName("w_streaming_tumbling_sink")
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("w_streaming_tumbling_sink").orderBy("w_start", "event_type")
    },
      Some(s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
          time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
          event_type, COUNT(*) AS cnt, ${dsumSql("value")} AS sum_value
        FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""")),

    // STREAM-STREAM interval join (the §2.8 machinery DLT runs under its
    // streaming joins): clicks joined to same-user purchases within the
    // following hour — two watermarked file streams, event-time range
    // condition, append mode. The watermark delay spans the dataset so no
    // row is late-dropped, making the drained append output equal the batch
    // interval join the oracle replays. (Bounded-delay state cleanup is the
    // same code path with a shorter delay; StreamingSpec covers dropping.)
    Q("w_stream_join", (s, d) => withShufflePartitions(s, 4) {
      val stage = FixtureRoots.path("graft_wsj")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        stage.resolve("events.parquet"))
      val raw = s.read.parquet(s"$d/events.parquet").schema
      def side(tpe: String, idAs: String, tsAs: String) =
        s.readStream.schema(raw).parquet(stage.toString)
          .transform(normalizeTs)
          .filter(col("event_type") === tpe)
          .select(col("event_id").as(idAs), col("user_id"), col("ts").as(tsAs))
          .withWatermark(tsAs, "40 days")
      val clicks = side("click", "click_id", "click_ts")
      val purchases = side("purchase", "purchase_id", "purchase_ts")
        .withColumnRenamed("user_id", "p_user_id")
      val joined = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          col("click_ts"), col("purchase_ts"))
      val q = joined.writeStream.format("memory").queryName("w_stream_join_sink")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("w_stream_join_sink").orderBy("click_id", "purchase_id")
    },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
          c.ts AS click_ts, p.ts AS purchase_ts
        FROM events c JOIN events p ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
        ORDER BY click_id, purchase_id""")),

    // STREAM-STATIC ENRICHMENT: the DLT silver staple — a streaming fact
    // joined to a STATIC broadcast dimension. Stateless (no watermark, no
    // state store): each micro-batch probes the broadcast hash table and
    // appends, so at 100 TB the streaming side never shuffles and the dim
    // refresh cadence is a re-broadcast, not a stateful join. Left join
    // keeps facts with no dim row (nulls), exactly as the batch twin.
    Q("w_stream_enrich", (s, d) => withShufflePartitions(s, 4) {
      val stage = FixtureRoots.path("graft_wsen")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        stage.resolve("events.parquet"))
      val raw = s.read.parquet(s"$d/events.parquet").schema
      val dim = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val enriched = s.readStream.schema(raw).parquet(stage.toString)
        .filter(col("user_id") % 50 === 0)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("c_name"), col("c_mktsegment"))
      val q = enriched.writeStream.format("memory")
        .queryName("w_stream_enrich_sink")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("w_stream_enrich_sink").orderBy("event_id")
    },
      Some("""SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_mktsegment
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        WHERE e.user_id % 50 = 0 ORDER BY e.event_id""")),

    // STREAMING SINK INTO A LAKE TABLE (the writeStream.format("delta")
    // role): a checkpointed AvailableNow drain appends each micro-batch
    // idempotently through the transaction ledger (appId + epoch id), so a
    // crash-replayed batch can never double-land — LakeSinkSpec pins the
    // replay/restart halves; this query pins the data path end-to-end
    // (stream → ledgered appends → DV-aware lake read ≡ plain relational
    // oracle).
    Q("w_lake_sink", (s, d) => {
      val stage = FixtureRoots.path("graft_wsink")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/orders.parquet"),
        stage.resolve("orders.parquet"))
      val raw = s.read.parquet(s"$d/orders.parquet").schema
      val root = FixtureRoots.path("graft_wsink_t")
      val tbl = graft.lake.LakeTable(s, s"$root/t")
      val stream = s.readStream.schema(raw).parquet(stage.toString)
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      tbl.create(stream.schema)
      graft.streaming.LakeSink.appendStream(
        stream, tbl, "w_lake_sink", s"$root/ck")
      // a second drain of the same checkpoint commits nothing (ledger)
      graft.streaming.LakeSink.appendStream(
        s.readStream.schema(raw).parquet(stage.toString)
          .filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        tbl, "w_lake_sink", s"$root/ck")
      tbl.read.orderBy("o_orderkey")
    },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderkey % 7 = 0 ORDER BY o_orderkey""")),

    // STREAMING DEDUP: exactly-once key emission over a watermarked stream
    // via dropDuplicatesWithinWatermark — the state-BOUNDED streaming dedup
    // (state for a key is dropped once the watermark passes it, unlike plain
    // dropDuplicates whose state grows forever). The delay spans the dataset
    // so no duplicate falls outside the window and the drained output equals
    // batch DISTINCT; only key columns are emitted so which physical
    // occurrence survived cannot affect the oracle hash.
    Q("w_streaming_dedup", (s, d) => withShufflePartitions(s, 4) {
      val stage = FixtureRoots.path("graft_wsd")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        stage.resolve("events.parquet"))
      val raw = s.read.parquet(s"$d/events.parquet").schema
      val deduped = s.readStream.schema(raw).parquet(stage.toString)
        .transform(normalizeTs)
        .select("user_id", "event_type", "ts")
        .withWatermark("ts", "40 days")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select("user_id", "event_type")
      val q = deduped.writeStream.format("memory")
        .queryName("w_streaming_dedup_sink")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("w_streaming_dedup_sink").orderBy("user_id", "event_type")
    },
      Some("""SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type""")),

    // Session windows per user, 10-minute gap. Spark closes a session when the
    // next event's ts >= previous ts + gap; window end = last ts + gap. The
    // oracle is the classic gaps-and-islands formulation.
    Q("w_session", (s, d) =>
      t(s, d, "events")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("user_id"), col("cnt"), col("sum_value"))
        .orderBy("user_id", "s_start"),
      Some(s"""WITH marked AS (
          SELECT user_id, ts, value, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL '10 minutes'
                 THEN 1 ELSE 0 END AS brk
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, ts, value,
            SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked)
        SELECT MIN(ts) AS s_start, MAX(ts) + INTERVAL '10 minutes' AS s_end,
          user_id, COUNT(*) AS cnt, ${dsumSql("value")} AS sum_value
        FROM sessions GROUP BY user_id, sid ORDER BY user_id, s_start""")),

    // CUSTOM-STATE sessionization via flatMapGroupsWithState: sessions close
    // on a 10-minute gap OR on a 5-event activity cap — the cap is a running
    // fold no declarative window (session_window included) can express, so
    // this exercises the KeyValueGroupedDataset arbitrary-state API. The
    // oracle replays it as gaps-and-islands + a within-island row-number
    // split (cap splits are every 5th event regardless of time, so the
    // iterative fold collapses to ⌊rn/5⌋ — true only because the cap check
    // and the gap check are independent, which is what makes it
    // SQL-replayable at all). Output keys on (user_id, session_idx) so the
    // compare is total-order stable even when capped sub-sessions share a
    // start timestamp; max_value (not sum) keeps doubles order-independent.
    Q("w_custom_state", (s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
        .as[graft.ext.Sessionize.Event]
      graft.ext.Sessionize.sessions(s, ev, gapMillis = 10 * 60 * 1000L, cap = 5)
        .toDF()
        .orderBy("user_id", "session_idx")
    },
      Some("""WITH marked AS (
          SELECT user_id, ts, value, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL '10 minutes'
                 THEN 1 ELSE 0 END AS brk
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        islands AS (
          SELECT user_id, ts, value, event_id,
            SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS isl
          FROM marked),
        sub AS (
          SELECT user_id, ts, value, isl,
            (CAST(ROW_NUMBER() OVER (PARTITION BY user_id, isl
               ORDER BY ts, event_id) AS BIGINT) - 1) // 5 AS subsess
          FROM islands),
        sess AS (
          SELECT user_id, isl, subsess,
            MIN(ts) AS s_start, MAX(ts) + INTERVAL '10 minutes' AS s_end,
            COUNT(*) AS cnt, MAX(value) AS max_value
          FROM sub GROUP BY user_id, isl, subsess)
        SELECT user_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY isl, subsess)
            AS BIGINT) - 1 AS session_idx,
          s_start, s_end, cnt, max_value
        FROM sess ORDER BY user_id, session_idx"""))
  )
}
