package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}
import graft.Tables
import graft.operators.Geo
import graft.streaming.Streams

/** Geo + streaming driver queries. Points/polygons are synthesized
  * deterministically from the relational tables (testdata has no
  * coordinates); rectangle rings make the exact ray-casting phase
  * SQL-mirrorable, so the two-phase join is oracle-checked end to end. */
object GeoStreamQueries {

  /** Documents landing zone shared by sm02 and sm07 — one tag + build (see
    * [[ordersLandingZone]] for why). Mtimes are stamped in name order
    * inside the build (rename preserves them), so micro-batch order ==
    * doc_id-range order for every consumer; sm02's row_number oracle
    * depends on that pinning. java.io.File is fine because Scratch roots
    * are /tmp-local by construction; a remote-FS stage would need
    * FileSystem.setTimes. */
  private def documentsLandingZone(s: SparkSession, d: String): String =
    graft.sources.Scratch.sharedDir("stream_stage",
      s"sm02_documents_v1_${d}_${graft.sources.Scratch.fingerprint(s"$d/documents.parquet")}") { tmp =>
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .repartitionByRange(4, col("doc_id"))
        .write.mode("overwrite").parquet(tmp)
      Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        .zipWithIndex.foreach { case (f, i) =>
          // a failed stamp must abort staging, not silently corrupt the
          // micro-batch-order contract consumers rely on
          require(f.setLastModified(1700000000000L + i * 60000L),
            s"documents staging: setLastModified failed for $f; " +
              "micro-batch order would not be pinned to doc_id order")
        }
    }

  /** Orders landing zone shared by sm01 and sm04 — tag and layout defined
    * ONCE so a version bump or layout change can't silently diverge the
    * two consumers. repartition(4) gives the file source several files =
    * several micro-batches; sharedDir's build-then-atomic-rename keeps
    * concurrent harness runs race-free without re-paying the staging
    * write per app run (the stage is a pure function of the sf dir). */
  private def ordersLandingZone(s: SparkSession, d: String): String = {
    val src = s"$d/orders.parquet"
    graft.sources.Scratch.sharedDir("stream_stage",
      s"sm01_orders_v1_${d}_${graft.sources.Scratch.fingerprint(src)}") { tmp =>
      s.read.parquet(src).repartition(4).write.mode("overwrite").parquet(tmp)
    }
  }

  /** Events landing zone shared by sm05 and sm06: range-partitioned by
    * event_id with part-file mtimes stamped in name order, so micro-batch
    * arrival follows event_id — and ts is monotone in event_id, which is
    * what makes BOTH the unwatermarked (sm05) and watermarked (sm06)
    * stream-stream joins batch-replayable. Tag + layout defined once. */
  private def eventsIntervalStage(s: SparkSession, d: String): String =
    graft.sources.Scratch.sharedDir("stream_stage",
      s"sm05_events_v2_${d}_${graft.sources.Scratch.fingerprint(s"$d/events.parquet")}") { tmp =>
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .repartitionByRange(4, col("event_id"))
        .write.mode("overwrite").parquet(tmp)
      Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        .zipWithIndex.foreach { case (f, i) =>
          require(f.setLastModified(1700000000000L + i * 60000L),
            s"events staging: setLastModified failed for $f")
        }
    }

  /** Events landing zone for sm10: same mtime-in-event_id-order contract
    * as [[eventsIntervalStage]], plus the `value` column the CUSUM folds
    * over. Separate tag so sm05/sm06's staged zones stay byte-stable. */
  private def eventsValueStage(s: SparkSession, d: String): String =
    graft.sources.Scratch.sharedDir("stream_stage",
      s"sm10_events_v1_${d}_${graft.sources.Scratch.fingerprint(s"$d/events.parquet")}") { tmp =>
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .repartitionByRange(4, col("event_id"))
        .write.mode("overwrite").parquet(tmp)
      Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        .zipWithIndex.foreach { case (f, i) =>
          require(f.setLastModified(1700000000000L + i * 60000L),
            s"events staging: setLastModified failed for $f")
        }
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Two-phase point-in-polygon join: 4x4 grid cells over derived points
    "geo01_point_in_polygon" -> ((s, d) => {
      val pts = Tables.events(s, d).select(
        col("event_id"),
        (pmod(col("event_id"), lit(97)) + 0.5).as("x"),
        (pmod(col("user_id"), lit(89)) + 0.5).as("y"))
      val cells = s.range(0, 16).toDF("cell_id")
        .withColumn("cx", (col("cell_id") % 4) * 25.0)
        .withColumn("cy", floor(col("cell_id") / 4) * 25.0)
        .withColumn("ring", array(
          col("cx"), col("cy"),
          col("cx") + 25.0, col("cy"),
          col("cx") + 25.0, col("cy") + 25.0,
          col("cx"), col("cy") + 25.0))
      val polys = Geo.withBbox(cells).select("cell_id", "ring", "minX", "maxX", "minY", "maxY")
      Geo.pointInPolygonJoin(pts, "x", "y", polys)
        .select(col("event_id"), col("cell_id").cast(IntegerType).as("cell_id"))
        .orderBy("event_id")
    }),

    // Hierarchy flattener: nation -> region parent chain denormalized
    "geo02_flatten_hierarchy" -> ((s, d) => {
      val regions = Tables.region(s, d).select(
        col("r_regionkey").cast("long").as("id"),
        lit(null).cast("long").as("parent"),
        col("r_name").as("name"))
      val nations = Tables.nation(s, d).select(
        (col("n_nationkey") + 100).cast("long").as("id"),
        col("n_regionkey").cast("long").as("parent"),
        col("n_name").as("name"))
      Geo.flattenHierarchy(regions.union(nations), "id", "parent", "name")
        .where(col("id") >= 100)
        .select((col("id") - 100).cast(IntegerType).as("n_nationkey"), col("full_name"))
        .orderBy("n_nationkey")
    }),

    // Address localization END TO END: free-text addresses carry a house
    // number + postcode; parseAddress extracts both, the parsed postcode
    // prunes the street join, token-set similarity picks the street.
    // Every step (regex parse, levenshtein similarity, top-1) is mirrored
    // exactly in the DuckDB oracle -> full hash gate.
    "geo03_address_localize" -> ((s, d) => {
      val streets = Tables.customer(s, d).where(col("c_custkey") <= 200).select(
        (lit(1000) + pmod(col("c_custkey"), lit(10))).cast(IntegerType).as("street_pc"),
        concat_ws(" ", lit("rue"), col("c_name"), col("c_mktsegment")).as("street"))
      val addrs = Tables.customer(s, d).where(col("c_custkey") <= 50).select(
        concat_ws(" ",
          (pmod(col("c_custkey"), lit(89)) + 1).cast("string"),
          col("c_name"), lit("rue"),
          (lit(1000) + pmod(col("c_custkey"), lit(10))).cast("string")).as("address"))
      Geo.localizeParsedAddresses(addrs, "address", streets, "street", "street_pc")
        .select(col("address"), col("addr_number"), col("addr_postcode"),
          col("street"), round(col("similarity"), 6).as("sim_r"))
        .orderBy("address")
    }),

    // Structured Streaming: watermarked 1-day tumbling windows over the
    // orders "stream" (file source, AvailableNow), oracle = batch rollup
    "sm01_stream_daily_orders" -> ((s, d) => {
      // stage into a landing directory (file-stream sources consume dirs)
      val stage = ordersLandingZone(s, d)
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
        // parquet stores TIMESTAMP_NTZ; watermarks require TIMESTAMP (LTZ).
        // Session TZ is UTC so the cast is a wall-clock identity.
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      val agg = stream
        .withWatermark("o_orderdate", "1 day")
        .groupBy(window(col("o_orderdate"), "1 day"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("daily_total"))
      Streams.runToMemory(agg, "sm01_sink", outputMode = "complete", statePartitions = Some(8))
        .select(col("window.start").as("day"), col("o_orderstatus"),
          col("n_orders"), col("daily_total").cast("double").as("daily_total"))
        .orderBy("day", "o_orderstatus")
    }),

    // Streaming HLL: the register table maintained as a streaming
    // complete-mode aggregate (groupBy(grp, register).max(rho) — the
    // sketch update IS an aggregation, so Structured Streaming keeps it
    // incrementally per micro-batch with m rows of state per group), then
    // the batch estimator over the final registers. Oracle = the hl01
    // replay over the same rows: a streaming sketch of a bounded stream
    // must equal the batch sketch exactly (max is order-insensitive).
    "sm14_stream_hll" -> ((s, d) => {
      val stage = eventsIntervalStage(s, d)
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 2)
      val regs = graft.operators.Sketch.hllRegisters(
        stream.select(col("event_type").as("grp"), col("user_id").as("k")),
        Seq("grp"), "k", p = 6)
      val table = Streams.runToMemory(regs, "sm14_sink",
        outputMode = "complete", statePartitions = Some(8))
      graft.operators.Sketch.hllEstimate(table, Seq("grp"), p = 6)
        .orderBy("grp")
    }),

    // Streaming quantile sketch: the decimal bucket table maintained as a
    // complete-mode count aggregate (the sketch update IS a grouped
    // count, so Structured Streaming folds it incrementally with
    // bucket-domain-bounded state), then the batch ceil-rank walk over
    // the final table. Counts are order-insensitive, so the bounded
    // stream's sketch equals the batch sketch exactly — oracle = the
    // qs01 program over the same rows. Reuses sm10's landing zone.
    "sm15_stream_quantile_sketch" -> ((s, d) => {
      val stage = eventsValueStage(s, d)
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 2)
      val sk = graft.operators.Sketch.decimalQuantileSketch(
        stream.select(expr("cast(round(value * 1000) as bigint)")
          .as("v_milli")),
        "v_milli", sigDigits = 3)
      val table = Streams.runToMemory(sk, "sm15_sink",
        outputMode = "complete", statePartitions = Some(8))
      graft.operators.Sketch.sketchQuantiles(table, Seq(100L, 500L, 900L))
        .orderBy("q_milli")
    }),

    // Stream-static join: each micro-batch of the orders stream hash-joins
    // the STATIC customer dimension (broadcast per batch — the enrich-
    // on-ingest shape), then a complete-mode rollup per market segment.
    // Reuses sm01's landing zone, so no extra staging cost.
    "sm04_stream_static_join" -> ((s, d) => {
      val stage = ordersLandingZone(s, d)
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
      val dim = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val agg = stream.join(dim, stream("o_custkey") === dim("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"))
      Streams.runToMemory(agg, "sm04_sink", outputMode = "complete",
          statePartitions = Some(8))
        .select(col("c_mktsegment"), col("n_orders"),
          col("total").cast("double").as("total"))
        .orderBy("c_mktsegment")
    }),

    // Stream-stream join: click and error streams (two independent readers
    // over the same landing zone) inner-join per user within a +-1h event-
    // time band. An INNER stream-stream join's result SET is batch-
    // equivalent regardless of micro-batch interleaving — matches emit
    // whenever the second side arrives and state is never evicted (no
    // watermark) — which is exactly the equivalence the oracle proves.
    "sm05_stream_stream_join" -> ((s, d) => {
      val stage = eventsIntervalStage(s, d)
      val schema = s.read.parquet(stage).schema
      def side(tpe: String, idAs: String, uAs: String, tsAs: String) =
        Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
          .where(col("event_type") === tpe)
          .select(col("event_id").as(idAs), col("user_id").as(uAs),
            col("ts").as(tsAs))
      val clicks = side("click", "click_id", "cu", "cts")
      val errors = side("error", "error_id", "eu", "ets")
      val joined = clicks.join(errors,
        col("cu") === col("eu") &&
          col("ets").between(col("cts") - expr("INTERVAL 1 HOUR"),
            col("cts") + expr("INTERVAL 1 HOUR")))
      Streams.runToMemory(joined.select(col("click_id"), col("error_id")),
          "sm05_sink", outputMode = "append", statePartitions = Some(8))
        .orderBy("click_id", "error_id")
    }),

    // Watermarked stream-stream join: sm05's shape with BOTH sides
    // ---- streaming -> tar shards: the ingest-to-training handoff ----------
    // foreachBatch writes one shard per micro-batch (deterministic
    // per-batch names = idempotent under retries); the gate reads every
    // shard back and checks the full key set + byte lengths. That check is
    // batch-split-independent, so the oracle is a plain batch replay
    // ---- streaming ingest with incremental dedup: the production shape —
    // each micro-batch dedups against the STANDING corpus on disk (bounded
    // state: digests live in the corpus files, not executor memory — cf.
    // sm02's in-memory dropDuplicates state) and appends its survivors.
    // Arrival is pinned to doc_id order by the landing zone, so the final
    // corpus IS the batch keep-first dedup — a plain SQL oracle ---------------
    "sm08_stream_ingest_dedup" -> ((s, d) => {
      val stage = documentsLandingZone(s, d)
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
      val corpusDir = graft.sources.Scratch.dir(s, "ingest",
        s"sm08_${System.nanoTime}")
      var seeded = false
      Streams.runForeachBatch(stream.select(col("doc_id"), col("text")),
        (batch, _) => {
          val sp = batch.sparkSession
          val corpus =
            if (seeded) sp.read.parquet(corpusDir)
            else sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              batch.schema)
          graft.operators.Dedup.exactIncremental(batch, corpus, "text", "doc_id")
            .write.mode(if (seeded) "append" else "overwrite").parquet(corpusDir)
          seeded = true
        })
      s.read.parquet(corpusDir)
        .select(col("doc_id"), md5(col("text")).as("text_hash"))
        .orderBy("doc_id")
    }),

    // ---- STREAMING two-sided CUSUM: per-user purchase-value drift via
    // the textbook recurrence in flatMapGroupsWithState (two longs of
    // state per user); the oracle replays cs01's closed form in batch —
    // the same sequence by algebra, so the gate proves the stream exact -
    "sm10_stream_cusum" -> ((s, d) => {
      import s.implicits._
      val stage = eventsValueStage(s, d)
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
      val typed = stream.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          expr("cast(round(value * 1000) as bigint)"))
        .as[(Long, Long, Long)]
      val verdicts = Streams.cusumDecisions(typed,
        target = 40000L, threshold = 400000L)
      Streams.runToMemory(verdicts.toDF(), "sm10_cusum",
          statePartitions = Some(4))
        .select(col("userId").as("user_id"), col("eventId").as("event_id"),
          col("valMilli").as("val_milli"), col("cusumHi").as("cusum_hi"),
          col("cusumLo").as("cusum_lo"), col("alarmHi").as("alarm_hi"),
          col("alarmLo").as("alarm_lo"))
        .orderBy("user_id", "event_id")
    }),

    // ---- STREAMING materialized-aggregate view: every micro-batch
    // folds into the (user, n_rows, total) state through applyAggDelta —
    // the mv01 maintenance loop closed as a stream (state re-read each
    // batch, localCheckpoint before the overwrite so the lazy read can
    // never race its own rewrite); oracle = the full batch rebuild, the
    // row-identity applyAggDelta guarantees ------------------------------
    "sm13_stream_agg_view" -> ((s, d) => {
      val stage = eventsValueStage(s, d)
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
      val stateDir = graft.sources.Scratch.dir(s, "aggview",
        s"sm13_${d}_${System.nanoTime}")
      var seeded = false
      Streams.runForeachBatch(
        stream.where(col("event_type") === "purchase")
          .select(col("user_id"), col("value")),
        (batch, _) => {
          val sp = batch.sparkSession
          val next =
            if (!seeded)
              graft.operators.Temporal.aggregateState(batch, "user_id", "value")
            else graft.operators.Temporal.applyAggDelta(
              sp.read.parquet(stateDir), batch, "user_id", "value")
          graft.operators.Materialize.round(next)
            .write.mode("overwrite").parquet(stateDir)
          seeded = true
        })
      s.read.parquet(stateDir)
        .select(col("user_id"), col("n_rows"),
          expr("cast(total as double)").as("total"))
        .orderBy("user_id")
    }),

    "sm07_stream_to_shards" -> ((s, d) => {
      val stage = documentsLandingZone(s, d)
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
      // fresh dir per run: a rerun's different batch split must not mix
      // with a previous run's leftover shards
      val outDir = graft.sources.Scratch.dir(s, "tar",
        s"sm07_${d}_${System.nanoTime}")
      Streams.runForeachBatch(stream.select(col("doc_id"), col("text")),
        (batch, bid) => graft.sources.TarShards.write(
          batch.repartition(1), "doc_id", "text", outDir,
          prefix = f"shard-b$bid%05d"))
      graft.sources.TarShards.read(s, outDir)
        .select(regexp_replace(col("name"), "\\.txt$", "").cast("long").as("doc_id"),
          length(col("bytes")).cast(IntegerType).as("n_bytes"))
        .orderBy("doc_id")
    }),

    // watermarked (2h) — the production form where Spark can EVICT join
    // state once the watermark passes a row's last possible match time
    // (the ±1h condition bounds it), instead of holding state forever.
    // Correctness still equals the batch join because arrival is pinned
    // to event order (ts monotone in event_id, mtime-stamped files): a
    // row is only evicted when every still-unseen row is too new to
    // match it, so the watermark drops nothing the batch oracle keeps.
    // State eviction itself is spec-asserted (numRowsTotal shrinks) in
    // GeoStreamSpec.
    "sm06_stream_stream_watermarked" -> ((s, d) => {
      val stage = eventsIntervalStage(s, d)
      val schema = s.read.parquet(stage).schema
      def side(tpe: String, idAs: String, uAs: String, tsAs: String) =
        Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
          .where(col("event_type") === tpe)
          .select(col("event_id").as(idAs), col("user_id").as(uAs),
            col("ts").as(tsAs))
          .withWatermark(tsAs, "2 hours")
      val clicks = side("click", "click_id", "cu", "cts")
      val errors = side("error", "error_id", "eu", "ets")
      val joined = clicks.join(errors,
        col("cu") === col("eu") &&
          col("ets").between(col("cts") - expr("INTERVAL 1 HOUR"),
            col("cts") + expr("INTERVAL 1 HOUR")))
      Streams.runToMemory(joined.select(col("click_id"), col("error_id")),
          "sm06_sink", outputMode = "append", statePartitions = Some(8))
        .orderBy("click_id", "error_id")
    }),

    // Streaming sessionization: session_window(ts, 12h) per user over the
    // events "stream". Append mode only emits a session once the watermark
    // passes its end, and AvailableNow's last batch advances the watermark
    // one batch too late — so the stage ends with a far-future SENTINEL row
    // (user_id = -1, filtered from output) whose arrival pushes the
    // watermark past every real session end. Sessions are a pure function
    // of event times, so the result is batch-replayable exactly.
    "sm03_stream_sessions" -> ((s, d) => {
      import s.implicits._
      val stage = graft.sources.Scratch.sharedDir("stream_stage",
        s"sm03_events_v2_${d}_${graft.sources.Scratch.fingerprint(s"$d/events.parquet")}") { tmp =>
        val ev = Tables.events(s, d).select(col("event_id"), col("ts"), col("user_id"))
        ev.repartitionByRange(4, col("event_id"))
          .write.mode("overwrite").parquet(tmp)
        val real = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        real.zipWithIndex.foreach { case (f, i) =>
          require(f.setLastModified(1700000000000L + i * 60000L),
            s"sm03 staging: setLastModified failed for $f")
        }
        // sentinel appended AFTER the real files and stamped newest: ts is
        // monotone in event_id, so +90 days clears every session end
        val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
        require(maxTs != null, "sm03 staging: events table is empty — no " +
          "watermark sentinel can be derived")
        Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 90L * 24 * 3600 * 1000), -1L))
          .toDF("event_id", "ts", "user_id").coalesce(1)
          .write.mode("append").parquet(tmp)
        val known = real.map(_.getName).toSet
        Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("part-") && !known(f.getName))
          .foreach { f =>
            require(f.setLastModified(1700000000000L + real.length * 60000L),
              s"sm03 staging: setLastModified failed for sentinel $f")
          }
      }
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
      val agg = stream
        .withWatermark("ts", "1 second")
        .groupBy(session_window(col("ts"), "12 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"))
      Streams.runToMemory(agg, "sm03_sink", outputMode = "append",
          statePartitions = Some(8))
        .where(col("user_id") >= 0)
        .orderBy("user_id", "session_start")
    }),

    // Stateful streaming exact-dedup via flatMapGroupsWithState: documents
    // arrive over 4 micro-batches (range-partitioned by doc_id, part-file
    // mtimes stamped so FileStreamSource's (modTime, path) order follows
    // doc_id), each sighting emits (keep, dupIndex), state carries the
    // per-hash count ACROSS batches. Oracle = batch row_number replay —
    // valid precisely because arrival order is pinned to doc_id order.
    "sm02_stream_dedup" -> ((s, d) => {
      import s.implicits._
      val stage = documentsLandingZone(s, d)
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
      val decisions = Streams.dedupDecisions(
        stream.select(col("doc_id"), col("text")).as[(Long, String)])
      Streams.runToMemory(decisions.toDF(), "sm02_sink", outputMode = "append", statePartitions = Some(8))
        .select(col("docId"), col("textHash"), col("keep"),
          col("dupIndex").cast(IntegerType).as("dupIndex"))
        .orderBy("docId")
    }),

    // STREAMING archive ingest: the crawler's zip landing zone drained
    // as a binary-file stream (one archive per micro-batch), each batch
    // decompressed IN EXECUTORS by ArchiveIngest's decoder and handed
    // off as an idempotent per-batch parquet (the sm07 foreachBatch
    // discipline) — the crawl → decompress → training-table loop closed
    // as a stream. Gate reads every batch's handoff back; oracle = the
    // same per-document byte lengths the zip round trip must preserve.
    "sm12_stream_archive_ingest" -> ((s, d) => {
      val docs = Tables.documents(s, d).where(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      // fresh dirs per run: a rerun's different batch split must not mix
      // with a previous run's leftover handoffs
      val tag = System.nanoTime
      val src = graft.sources.Scratch.dir(s, "zip", s"sm12_src_${d}_$tag")
      graft.sources.ArchiveIngest.writeZip(
        docs.repartition(4, col("doc_id")), "doc_id", "text", src)
      val out = graft.sources.Scratch.dir(s, "zip", s"sm12_out_${d}_$tag")
      val binSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType)))
      val stream = s.readStream.format("binaryFile").schema(binSchema)
        .option("maxFilesPerTrigger", "1").load(s"$src/*.zip")
      Streams.runForeachBatch(stream.select("path", "content"), (batch, bid) => {
        val sp = batch.sparkSession
        import sp.implicits._
        batch.rdd.flatMap { r =>
          graft.sources.ArchiveIngest.entriesOf(
              r.getAs[String]("path").split('/').last,
              r.getAs[Array[Byte]]("content"))
            .map { case (n, b) =>
              (n.stripSuffix(".txt").toLong, b.length) }
        }.toDF("doc_id", "n_bytes")
          .coalesce(1)
          .write.mode("overwrite").parquet(f"$out/batch-b$bid%05d")
      })
      s.read.parquet(s"$out/batch-b*")
        .select(col("doc_id"), col("n_bytes").cast(IntegerType).as("n_bytes"))
        .orderBy("doc_id")
    }),

    // BOUNDED-STATE streaming dedup: dropDuplicatesWithinWatermark — the
    // production answer to sm02's unbounded-state exact dedup (sm02's
    // flatMapGroupsWithState keeps every key forever; here state expires
    // `delay` behind the watermark, so a perpetual stream holds only a
    // sliding window of keys). Dedup key includes the calendar day, and
    // every sighting of a (user, type, day) key is < 1 day of event time
    // after the first while the watermark lags 2 days — so no duplicate
    // ever outlives its state entry and no key is emitted twice, which
    // makes the batch replay exactly DISTINCT over the staged zone. The
    // gate projects the KEY columns only: which physical duplicate wins
    // inside a micro-batch is not contractual. Eviction itself (the
    // point of the operator) is spec-asserted via numRowsTotal.
    "sm11_stream_dedup_watermarked" -> ((s, d) => {
      val stage = eventsIntervalStage(s, d)
      val schema = s.read.parquet(stage).schema
      val deduped = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
        // parquet re-read is TIMESTAMP_NTZ; session TZ pinned UTC → identity
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("day", to_date(col("ts")))
        .withWatermark("ts", "2 days")
        .dropDuplicatesWithinWatermark("user_id", "event_type", "day")
      // r20 (sf10 soak): the dedup state is DATA-sized ((user, type, day)
      // keys), and a fixed 8 serialized 10M-row micro-batches on 8 of 32
      // slots; adaptiveStateParts computes the same 8 at bench scale
      // (zone < 2 MB) and grows with the landing zone past it — the
      // output row set is partition-count-invariant
      Streams.runToMemory(deduped, "sm11_sink", outputMode = "append",
          statePartitions = Some(Streams.adaptiveStateParts(s, stage)))
        .select(col("user_id"), col("event_type"),
          col("day").cast("string").as("day"))
        .orderBy("user_id", "event_type", "day")
    }),

    // Streaming SLIDING windows: 6-hour windows every 2 hours over the
    // events stream — each event lands in exactly win/slide = 3
    // overlapping windows (epoch-aligned, same rule both engines).
    // Complete mode + AvailableNow is batch-equivalent with no watermark;
    // state = open windows × event types, and the overlap factor
    // multiplies it — at scale, watermark + append bounds that (sm03's
    // sentinel pattern), and slide ≥ win/4 keeps the multiplier sane.
    // Reuses sm05's landing zone: no extra staging cost.
    "sm09_stream_sliding_windows" -> ((s, d) => {
      val stage = eventsIntervalStage(s, d)
      val schema = s.read.parquet(stage).schema
      val stream = Streams.fileStream(s, stage, schema, maxFilesPerTrigger = 1)
        // parquet re-read is TIMESTAMP_NTZ; session TZ pinned UTC → identity
        .withColumn("ts", col("ts").cast("timestamp"))
      val agg = stream
        .groupBy(window(col("ts"), "6 hours", "2 hours"), col("event_type"))
        // count only: DISTINCT aggregates are unsupported over streams
        // (exact distinct needs unbounded per-window state)
        .agg(count(lit(1)).as("n_events"),
          min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"))
      Streams.runToMemory(agg, "sm09_sink", outputMode = "complete",
          statePartitions = Some(8))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n_events"), col("min_user"), col("max_user"))
        .orderBy("win_start", "event_type")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // sm14 replay: the hl01 HLL register+estimator program (p=6, K=59)
    // over (event_type, user_id) — a bounded stream's complete-mode max
    // aggregate equals the batch registers exactly
    "sm14_stream_hll" ->
      """WITH base AS (
        |  SELECT event_type AS grp, user_id AS k FROM events),
        |m AS (
        |  SELECT grp, xor(p2, p2 >> 31) AS h FROM (
        |    SELECT grp,
        |      (xor(p1, p1 >> 27) * CAST(10723151780598845931 AS UHUGEINT))
        |        % CAST(18446744073709551616 AS UHUGEINT) AS p2
        |    FROM (
        |      SELECT grp,
        |        (xor(p0, p0 >> 30) * CAST(13787848793156543929 AS UHUGEINT))
        |          % CAST(18446744073709551616 AS UHUGEINT) AS p1
        |      FROM (SELECT grp, CAST(k AS UHUGEINT) AS p0 FROM base) a) b) c),
        |regs AS (
        |  SELECT grp, CAST(h >> 58 AS BIGINT) AS register,
        |    max(CASE WHEN h % CAST(288230376151711744 AS UHUGEINT) = 0 THEN 59
        |         ELSE 59 - length(bin(CAST(
        |           h % CAST(288230376151711744 AS UHUGEINT) AS BIGINT)))
        |        END) AS rho
        |  FROM m GROUP BY 1, 2),
        |agg AS (
        |  SELECT grp, count(*) AS nreg,
        |    sum(CAST(1 AS BIGINT) << (59 - rho)) AS spart
        |  FROM regs GROUP BY grp),
        |sv AS (
        |  SELECT grp, 64 - nreg AS n_zero_registers,
        |    spart + CAST(64 - nreg AS HUGEINT)
        |            * CAST(576460752303423488 AS HUGEINT) AS s
        |  FROM agg),
        |er AS (
        |  SELECT grp, n_zero_registers,
        |    0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0 * 576460752303423488.0
        |      / CAST(CAST(s AS VARCHAR) AS DOUBLE) AS eraw
        |  FROM sv)
        |SELECT grp, n_zero_registers,
        |  CAST(floor(CASE WHEN eraw <= 160.0 AND n_zero_registers > 0
        |    THEN 64.0 * ln(64.0 / CAST(n_zero_registers AS DOUBLE))
        |    ELSE eraw END) AS BIGINT) AS est_distinct
        |FROM er ORDER BY grp""".stripMargin,

    // sm15 replay: the qs01 decimal-bucket program over milli values —
    // a bounded stream's complete-mode count aggregate equals the batch
    // bucket table exactly
    "sm15_stream_quantile_sketch" ->
      """WITH v AS (
        |  SELECT CAST(round(value * 1000) AS BIGINT) AS vm FROM events),
        |b AS (
        |  SELECT length(CAST(vm AS VARCHAR)) AS blen,
        |    CAST(substr(CAST(vm AS VARCHAR), 1, 3) AS BIGINT) AS bkey,
        |    count(*) AS cnt
        |  FROM v GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM b),
        |c AS (
        |  SELECT blen, bkey, cnt,
        |    sum(cnt) OVER (ORDER BY blen, bkey) AS cum,
        |    CAST(CAST(bkey AS VARCHAR) || repeat('0',
        |        CAST(blen - length(CAST(bkey AS VARCHAR)) AS INT))
        |      AS BIGINT) AS est,
        |    blen * 1000 + bkey AS code
        |  FROM b),
        |q AS (SELECT * FROM (VALUES (100), (500), (900)) AS qs(q_milli)),
        |r AS (SELECT q_milli, n,
        |  greatest(1, (q_milli * n + 999) // 1000) AS rnk FROM q, t)
        |SELECT CAST(q_milli AS BIGINT) AS q_milli, n,
        |  CAST(rnk AS BIGINT) AS rank,
        |  CAST(arg_min(est, code) AS BIGINT) AS est
        |FROM c JOIN r ON c.cum >= r.rnk
        |GROUP BY q_milli, n, rnk
        |ORDER BY q_milli""".stripMargin,

    // sm10 replay: the batch closed form (prefix sum + prefix extrema,
    // cs01's identity) — algebraically the same sequence the streaming
    // recurrence emits, per user over purchases in event_id order
    "sm10_stream_cusum" ->
      """WITH p AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id, v,
        |    CAST(sum(v - 40000) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS pp
        |  FROM p),
        |q AS (
        |  SELECT *, min(pp) OVER w2 AS pmin, max(pp) OVER w2 AS pmax
        |  FROM c
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, v AS val_milli,
        |  pp - least(CAST(0 AS BIGINT), pmin) AS cusum_hi,
        |  greatest(CAST(0 AS BIGINT), pmax) - pp AS cusum_lo,
        |  pp - least(CAST(0 AS BIGINT), pmin) >= 400000 AS alarm_hi,
        |  greatest(CAST(0 AS BIGINT), pmax) - pp >= 400000 AS alarm_lo
        |FROM q ORDER BY user_id, event_id""".stripMargin,
    // sm12 replay: every staged document survives the zip → stream →
    // decompress → parquet handoff with its exact byte length (ASCII:
    // bytes == chars, the ws01/cr03 convention)
    "sm12_stream_archive_ingest" ->
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS n_bytes
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    // sm11 replay: with the day in the dedup key and the watermark two
    // days behind event time, the streaming dedup emits each key exactly
    // once — the batch closed form is plain DISTINCT
    "sm11_stream_dedup_watermarked" ->
      """SELECT DISTINCT user_id, event_type,
        |  strftime(ts, '%Y-%m-%d') AS day
        |FROM events
        |ORDER BY user_id, event_type, day""".stripMargin,

    "geo01_point_in_polygon" ->
      """WITH pts AS (
        |  SELECT event_id,
        |         (event_id % 97) + 0.5 AS x,
        |         (user_id % 89) + 0.5 AS y
        |  FROM events),
        |cells AS (
        |  SELECT i AS cell_id, (i % 4) * 25.0 AS cx, (i // 4) * 25.0 AS cy
        |  FROM range(0, 16) t(i))
        |SELECT event_id, CAST(cell_id AS INTEGER) AS cell_id
        |FROM pts JOIN cells
        |  ON x >= cx AND x <= cx + 25 AND y >= cy AND y <= cy + 25
        |ORDER BY event_id""".stripMargin,

    "geo02_flatten_hierarchy" ->
      """SELECT n_nationkey, concat(r_name, ' > ', n_name) AS full_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "geo03_address_localize" ->
      """WITH streets AS (
        |  SELECT CAST(1000 + c_custkey % 10 AS INTEGER) AS street_pc,
        |         concat('rue ', c_name, ' ', c_mktsegment) AS street
        |  FROM customer WHERE c_custkey <= 200),
        |addrs AS (
        |  SELECT concat(CAST(c_custkey % 89 + 1 AS VARCHAR), ' ', c_name,
        |                ' rue ', CAST(1000 + c_custkey % 10 AS VARCHAR)) AS address
        |  FROM customer WHERE c_custkey <= 50),
        |parsed AS (
        |  SELECT address,
        |         regexp_extract(lower(address), '\b([0-9]{1,3})\b', 1) AS addr_number,
        |         CAST(pcs[len(pcs)] AS INTEGER) AS addr_postcode
        |  FROM (SELECT address,
        |               regexp_extract_all(lower(address), '\b([0-9]{4,9})\b', 1) AS pcs
        |        FROM addrs)),
        |cand AS (
        |  SELECT p.address, p.addr_number, p.addr_postcode, s.street,
        |         list_filter(string_split_regex(lower(p.address), '[^a-z0-9]+'),
        |                     q -> q <> '') AS qt,
        |         list_filter(string_split_regex(lower(s.street), '[^a-z0-9]+'),
        |                     q -> q <> '') AS ct
        |  FROM parsed p JOIN streets s ON p.addr_postcode = s.street_pc),
        |scored AS (
        |  SELECT address, addr_number, addr_postcode, street,
        |         CAST(len(list_filter(qt, q -> list_contains(ct, q)
        |                OR (length(q) >= 4 AND len(list_filter(ct,
        |                      c2 -> abs(length(c2) - length(q)) <= 1
        |                            AND levenshtein(q, c2) <= 1)) > 0)))
        |              AS DOUBLE) / len(qt) AS sim
        |  FROM cand),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY address, addr_postcode
        |                               ORDER BY sim DESC, street) AS rk
        |  FROM scored WHERE sim >= 0.3)
        |SELECT address, addr_number, addr_postcode, street,
        |       round(sim, 6) AS sim_r
        |FROM ranked WHERE rk = 1 ORDER BY address""".stripMargin,

    "sm01_stream_daily_orders" ->
      """SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        | o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_total
        |FROM orders GROUP BY 1, 2 ORDER BY day, o_orderstatus""".stripMargin,

    // batch replay of the streaming dedup: first sighting by doc_id keeps,
    // later sightings carry their 0-based duplicate index
    "sm02_stream_dedup" ->
      """SELECT doc_id AS docId, md5(text) AS textHash,
        |       rn = 1 AS keep, CAST(rn - 1 AS INTEGER) AS dupIndex
        |FROM (SELECT doc_id, text,
        |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |      FROM documents) t
        |ORDER BY docId""".stripMargin,

    // Stream-static replay: plain batch join + rollup (the stream adds no
    // semantics to an inner join against a static dim — that equivalence
    // is exactly what the gate proves)
    "sm04_stream_static_join" ->
      """SELECT c.c_mktsegment, count(*) AS n_orders,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,

    // Stream-stream replay: the plain batch interval join
    "sm05_stream_stream_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS error_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'error'
        | AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, error_id""".stripMargin,

    // stream-to-shards gate: whatever the micro-batch split, every doc
    // lands in exactly one shard with its exact bytes
    "sm07_stream_to_shards" ->
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    // streaming agg-view replay: count/DECIMAL-sum are commutative, so
    // however the micro-batches split, the folded state equals the full
    // rebuild over every purchase
    "sm13_stream_agg_view" ->
      """SELECT user_id, count(*) AS n_rows,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // streamed incremental-dedup replay: arrival pinned to doc_id order
    // makes the standing-corpus admission equal global keep-first
    "sm08_stream_ingest_dedup" ->
      """SELECT doc_id, md5(text) AS text_hash FROM (
        |  SELECT doc_id, text,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // Watermarked stream-stream replay: ordered arrival + 2h watermark
    // (wider than the 1h band) means eviction never races a possible
    // match — the result set is the SAME unrestricted batch join as sm05
    "sm06_stream_stream_watermarked" ->
      """SELECT a.event_id AS click_id, b.event_id AS error_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'error'
        | AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, error_id""".stripMargin,

    // Sessionization replay: gap-island detection (new session when the
    // inter-event gap reaches 12h — Spark merges only strictly-overlapping
    // [t, t+gap) windows, so `>= gap` breaks exactly like session_window),
    // session_end = last event + gap
    "sm03_stream_sessions" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN pts IS NULL OR epoch(ts - pts) >= 43200 THEN 1 ELSE 0
        |    END AS brk
        |  FROM g),
        |c AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 12 HOUR AS session_end,
        |       count(*) AS n_events
        |FROM c GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // sliding-window replay: each event expands to its 3 epoch-aligned
    // containing windows (start = 2h-floor(ts) − k·2h, k ∈ 0..2 — every
    // one satisfies start ≤ ts < start + 6h, so no residual filter)
    "sm09_stream_sliding_windows" ->
      """WITH w AS (
        |  SELECT e.event_type, e.user_id,
        |    make_timestamp(
        |      ((epoch_us(e.ts) // 7200000000) * 7200000000)
        |        - k.k * 7200000000) AS win_start
        |  FROM events e, range(0, 3) k(k))
        |SELECT win_start, event_type, count(*) AS n_events,
        |  min(user_id) AS min_user, max(user_id) AS max_user
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin
  )
}
