package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (SURVEY §2.2 streaming row): watermarked tumbling-window
  * aggregation and stateful sessionization via
  * flatMapGroupsWithState.
  *
  * The batch equivalents (Relational.q18_time_window,
  * Relational.q21_sessionize) are oracle-checked; the streaming
  * variants run the same logical aggregates incrementally and are
  * exercised by StreamingSpec with a file source + memory sink.
  *
  * Scale: windowed aggs keep one state row per (window, event_type) —
  * bounded by watermark eviction; sessionization state is one small
  * buffer per active user, evicted on processing-time timeout.
  */
object EventStreams {

  /** The events schema for nanos-staged event parquet (ts as INT64
    * raw nanos — the shape the streaming specs stage; see
    * graft.Tables.events for the physical-encoding story). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Stream sources need an explicit schema, but the physical ts
    // encoding varies by generator (INT64 nanos vs µs NTZ — see
    // graft.Tables.events). Peek at the footer with a batch read
    // (metadata-only, no job) and normalize to the (ts, ts_ns) surface.
    val physical = spark.read.parquet(dir).schema
    graft.Tables.normalizeEvents(
      spark.readStream.schema(physical).parquet(dir))
  }

  /** Watermarked tumbling-window aggregate — the streaming form of
    * q18_time_window: events per (hour, type) with exact decimal sums. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming dedup — the incremental form of d01/q10: drop repeat
    * (user_id, event_type) arrivals. dropDuplicatesWithinWatermark is
    * the variant whose state IS evicted at the watermark horizon —
    * plain dropDuplicates without the event-time column in its keys
    * keeps state forever and OOMs on unbounded input.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Orders subset used by the stream-stream join. */
  val orderSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderdate", TimestampType)))

  /** File-source stream over a directory of orders parquet files
    * (column-pruned to the join's needs). */
  def readOrderStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(orderSchema).parquet(dir)

  /** Stream-stream interval join — the streaming twin of
    * q27_range_join: each order pairs with the same user's events in
    * the 24 h before the order. BOTH sides are watermarked and the
    * predicate bounds event-time in both directions, which is what
    * lets Spark evict join state once the watermark passes the
    * interval — bounded state on unbounded streams. A key-only equi
    * join (no time bound) would buffer both streams forever.
    */
  def orderEventIntervalJoin(orders: DataFrame, events: DataFrame): DataFrame = {
    val o = orders
      .withColumnRenamed("o_orderdate", "o_ts")
      .withWatermark("o_ts", "1 hour")
    val e = events
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .withWatermark("ts", "1 hour")
    o.join(e,
      col("o_custkey") === col("user_id") &&
        col("ts") >= col("o_ts") - expr("INTERVAL 24 HOURS") &&
        col("ts") < col("o_ts"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_ts"),
        col("event_id"), col("value"))
  }

  /** Stream-stream LEFT OUTER interval join — the "orders with their
    * prior events, INCLUDING orders that had none" topology (abandoned-
    * cart / no-touch attribution). Same watermarks + two-sided time
    * bound as [[orderEventIntervalJoin]]; the left-outer semantics add
    * the deferred null row: Spark holds an unmatched order in join
    * state until the watermark on BOTH sides passes its interval end —
    * only then can "no event matched" be final (a matching event can
    * no longer arrive) and the order emits once with null event
    * columns, its state evicted. Matched rows emit eagerly exactly
    * like the inner form.
    *
    * Scale: state is bounded by the interval + watermark delay on both
    * sides — identical eviction horizon to the inner join; the only
    * extra cost is unmatched left rows living to their horizon instead
    * of dying at first match. An un-watermarked or one-sided-bound
    * outer join is refused by Spark outright (state would be unbounded
    * AND null rows could never finalize).
    */
  def orderEventLeftOuterJoin(orders: DataFrame, events: DataFrame): DataFrame = {
    val o = orders
      .withColumnRenamed("o_orderdate", "o_ts")
      .withWatermark("o_ts", "1 hour")
    val e = events
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .withWatermark("ts", "1 hour")
    o.join(e,
      col("o_custkey") === col("user_id") &&
        col("ts") >= col("o_ts") - expr("INTERVAL 24 HOURS") &&
        col("ts") < col("o_ts"),
      "leftOuter")
      .select(col("o_orderkey"), col("o_custkey"), col("o_ts"),
        col("event_id"), col("value"))
  }

  /** Stream-static enrichment join — the stateless front of every
    * enrichment topology: each streaming event picks up its user's
    * nation from the STATIC customer dimension. Stream-static inner
    * joins keep NO streaming state (the static side is planned per
    * micro-batch — broadcast here, since the dim is pruned to two
    * columns), so state never grows with stream length; at cluster
    * scale the dim re-plan also picks up dimension updates between
    * micro-batches, the classic slowly-changing-dim behavior.
    */
  def enrichedEvents(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey"), col("c_nationkey"))),
      col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("c_nationkey").as("nation"))

  /** Native session-window streaming aggregation — the declarative
    * twin of [[sessionize]] (and the streaming form of
    * Relational.q21b_session_window): Spark keeps one mergeable
    * session state per (user, window) and finalizes a session once
    * the watermark passes its end (= last event + gap). Same output
    * as the flatMapGroupsWithState version but with engine-managed
    * state, watermark eviction, and no custom merge code — prefer
    * this unless the session logic outgrows a gap rule.
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))

  final case class Event(event_id: Long, ts_ns: Long, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start_ns: Long, last_ns: Long, n: Long)
  final case class Session(user_id: Long, start_ns: Long, end_ns: Long,
      n_events: Long)

  final case class FunnelState(t_view: Option[Long], t_click: Option[Long],
      t_purchase: Option[Long])
  final case class FunnelUpdate(user_id: Long, stage: Int,
      t_view: Option[Long], t_click: Option[Long], t_purchase: Option[Long])

  /** Streaming funnel attribution — the incremental twin of the batch
    * [[graft.operators.Relational2.q69_funnel]]: per user, the
    * furthest view → click → purchase stage reached IN ORDER, as a
    * state machine over the event stream. A click arms only
    * at-or-after the first view, a purchase only at-or-after the
    * first qualifying click; an Append-mode row is emitted whenever a
    * user's state advances (stage is monotone, so the LAST emission
    * per user is their current funnel position).
    *
    * Scale: state is three optional longs per user (~24 bytes) —
    * O(users), not O(events); the batch form re-scans the event table
    * per stage, this form touches each event once. Production adds a
    * state TTL (timeout eviction like [[sessionize]]) to bound the
    * user set on unbounded streams; omitted here so the parity spec
    * is deterministic.
    *
    * Ordering caveat (inherent to streaming): events are applied in
    * (ts, event_id) order WITHIN a micro-batch; a stage event that
    * arrives in a LATER batch than a logically-later event it should
    * precede (e.g. a late view older than an already-processed click)
    * is applied against the already-advanced state. The batch q69 is
    * the ground truth for out-of-order replays.
    */
  def funnelStream(events: Dataset[Event]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          val before = state.getOption.getOrElse(FunnelState(None, None, None))
          var st = before
          rows.toSeq.sortBy(e => (e.ts_ns, e.event_id)).foreach { e =>
            e.event_type match {
              case "view" if st.t_view.isEmpty =>
                st = st.copy(t_view = Some(e.ts_ns))
              case "click" if st.t_click.isEmpty &&
                  st.t_view.exists(_ <= e.ts_ns) =>
                st = st.copy(t_click = Some(e.ts_ns))
              case "purchase" if st.t_purchase.isEmpty &&
                  st.t_click.exists(_ <= e.ts_ns) =>
                st = st.copy(t_purchase = Some(e.ts_ns))
              case _ => ()
            }
          }
          if (st != before || state.getOption.isEmpty) {
            state.update(st)
            val stage =
              if (st.t_purchase.nonEmpty) 3
              else if (st.t_click.nonEmpty) 2
              else if (st.t_view.nonEmpty) 1
              else 0
            Iterator.single(FunnelUpdate(userId, stage,
              st.t_view, st.t_click, st.t_purchase))
          } else Iterator.empty
      }
  }

  /** Stateful sessionization: events within `gap` of each other belong
    * to one session per user; a session closes when the processing-time
    * timeout fires with no new events. Demonstrates
    * flatMapGroupsWithState custom state (SURVEY §2.2 UDF/state row).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapNs = gapMinutes * 60L * 1000000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil)
              .map(s => Session(userId, s.start_ns, s.last_ns, s.n))
            state.remove()
            out.iterator
          } else {
            // merge the batch into open sessions (events may arrive
            // unordered within a micro-batch: sort first)
            val sorted = rows.toSeq.sortBy(e => (e.ts_ns, e.event_id))
            var open = state.getOption.getOrElse(Nil)
            var closed = List.empty[Session]
            sorted.foreach { e =>
              open match {
                case cur :: rest if e.ts_ns - cur.last_ns <= gapNs =>
                  open = cur.copy(last_ns = e.ts_ns, n = cur.n + 1) :: rest
                case cur :: rest =>
                  closed ::= Session(userId, cur.start_ns, cur.last_ns, cur.n)
                  open = SessionState(e.ts_ns, e.ts_ns, 1) :: rest
                case Nil =>
                  open = SessionState(e.ts_ns, e.ts_ns, 1) :: Nil
              }
            }
            state.update(open)
            state.setTimeoutDuration(s"$gapMinutes minutes")
            closed.reverseIterator
          }
      }
  }

  /** Schema of a streamed document delivery: the batch `documents`
    * columns plus the delivery's `arrival` event time (used only to
    * bound the candidate-dedup state). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("arrival", TimestampType)))

  /** File-source stream over a directory of delivery parquet files. */
  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Streaming incremental near-duplicate screen — the streaming twin
    * of [[graft.operators.Dedup.d16_incremental_neardup]]: documents
    * arrive as a micro-batched delivery stream, band into the same
    * 16×4 MinHash buckets, probe the STANDING corpus index (the
    * static join side) and emit one row per VERIFIED match
    * (shingle-Jaccard ≥ 0.5) in append mode. A doc that emits no row
    * is accepted — d16's verdict, streamed.
    *
    * State/scale: the stream-static band join itself holds ZERO
    * streaming state (at 100 TB the static side is the bucketed
    * standing index, re-resolved per micro-batch — new corpus
    * snapshots are picked up without restarting the query). The only
    * state is the candidate dedup — a pair colliding in k bands emits
    * once WITHIN THE WATERMARK HORIZON (1 hour here): bounding the
    * dedup state is what keeps it from growing forever, and the price
    * is that a re-delivered doc (or band collision) arriving more than
    * a horizon after the first emit produces a duplicate match row —
    * downstream consumers must be idempotent on (doc_id, corpus_id).
    * Per-batch cost is band collisions, exactly the batch d16 shape.
    */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType)),
    StructField("arrival", TimestampType)))

  /** File-source stream over a directory of embedding delivery
    * parquet (embedding staged as array<double>). */
  def readEmbStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embSchema).parquet(dir)

  /** [[embSchema]] plus the label column — the delivery shape the
    * per-label drift gate monitors. */
  val labeledEmbSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType), StructField("label", IntegerType),
    StructField("embedding", ArrayType(DoubleType)),
    StructField("arrival", TimestampType)))

  /** File-source stream over labeled embedding deliveries. */
  def readLabeledEmbStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(labeledEmbSchema).parquet(dir)

  /** Streaming IVF ingest — the streaming twin of
    * [[graft.operators.Similarity.s19_ivf_exact]]'s cell assignment:
    * newly arriving vectors are routed to their nearest cell of the
    * STANDING index (trained once on the static corpus by the same
    * exact-integer Lloyd trainer), emitting (vec_id, cell, d2) append
    * rows a downstream writer would fan into the per-cell bucketed
    * index files. Assignment arithmetic is identical to the batch
    * path — milli-quantized longs, exact L2, min(struct(d, cell))
    * ties — so a replayed delivery matches the batch assignment row
    * for row (StreamingSpec pins the parity).
    *
    * State/scale: the trained centroid table (nCells × 64 longs) is
    * collected ONCE at query construction and burned into the plan as
    * a literal, so per-batch work is a pure stateless map — no join,
    * no shuffle, no streaming state, nothing keyed on the stream. At
    * 100 TB-a-day ingest this is the only shape that holds: each
    * executor assigns its partition's vectors against the in-plan
    * centroid table. Re-training moves the centroids → restart the
    * query (the centroids are a deployment artifact, not per-batch
    * state); a groupBy-argmin formulation would instead buffer every
    * vector in state until the watermark closed. */
  def ivfIngestStream(delivery: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.milli_l2
    import graft.operators.Similarity
    val cents = Similarity.ivfCentroids(corpus).collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1)))
    // loud, named failure: an empty literal array would otherwise die
    // in analysis with an inscrutable getField-on-NULL type error
    require(cents.nonEmpty,
      "ivfIngestStream: the standing corpus trained zero centroids — " +
        "an ingest stream needs a non-empty index to route into")
    val centLit = array(cents.map { case (j, cv) =>
      struct(lit(j).as("j"), array(cv.map(lit): _*).as("c_mv")) }: _*)
    // argmin over the literal cells via array_min on (d, cell)
    // structs — the exact tie rule the batch min(struct) agg uses
    val dc = transform(centLit, c =>
      struct(milli_l2(col("mv"), c.getField("c_mv")).as("d"),
        c.getField("j").as("cell")))
    delivery
      .withColumn("mv", transform(col("embedding"),
        x => floor(x.cast(DoubleType) * 1000).cast(LongType)))
      .withColumn("mdc", array_min(dc))
      .select(col("vec_id"), col("arrival"),
        col("mdc").getField("cell").as("cell"),
        col("mdc").getField("d").as("d2"))
  }

  /** Streaming embedding-drift gate — the streaming twin of
    * [[graft.operators.Similarity.s12_drift]] (the admit-this-delivery
    * monitor): each micro-batch of arriving vectors is compared
    * against the STANDING corpus's per-(label, dim) statistics and a
    * drift report (per-label exact micro-unit L1 mean shift, max
    * shifted dimension) is handed to `sink` with the batch id. The
    * arithmetic is s12's bit for bit — integer micro sums,
    * floor-divided means, (delta, dim) ties — so a replayed delivery
    * produces s12's exact rows (StreamingSpec pins the parity).
    *
    * State/scale: foreachBatch is the zero-streaming-state seam — the
    * per-batch aggregation runs in batch land, the standing stats are
    * a PERSISTED frame (label·dim rows, broadcastable) computed once
    * on the first batch and reused by every later one — without the
    * persist each micro-batch would re-run the full corpus
    * posexplode+aggregate, corpus-sized work per batch. Registered
    * with [[graft.CacheScope]], so the harness's post-stream
    * releaseAll frees the blocks. Nothing is keyed on the stream
    * across batches. The report is delivery-sized work per batch: one
    * map-side-combined aggregate over the batch plus a join against
    * ≤ labels·dims rows.
    */
  def embeddingDriftReports(delivery: DataFrame, corpus: DataFrame)(
      sink: (Long, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    def stats(df: DataFrame, cn: String, sn: String): DataFrame = df
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").cast(IntegerType).as("dim"),
        floor(col("col").cast(DoubleType) * 1e6).cast(LongType).as("vm"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as(cn), sum(col("vm")).as(sn))
    val old = graft.CacheScope.persisted(stats(corpus, "c_old", "s_old"))
    delivery.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        val nw = stats(batch.toDF(), "c_new", "s_new")
        // s12's exact arithmetic: floor of the (exact) micro-sum over
        // the side count, |mean_new - mean_old|, then the s12
        // join-back argmax with min-dim ties
        val per = old.join(nw, Seq("label", "dim"))
          .withColumn("mean_old",
            floor(col("s_old").cast(DoubleType) / col("c_old")))
          .withColumn("mean_new",
            floor(col("s_new").cast(DoubleType) / col("c_new")))
          .withColumn("delta", abs(col("mean_new") - col("mean_old")))
          .persist()
        val agg = per.groupBy(col("label"))
          .agg(max(col("c_old")).as("n_old"), max(col("c_new")).as("n_new"),
            sum(col("delta")).as("l1_shift_micro"),
            max(col("delta")).as("max_shift_micro"))
        val argDim = per
          .join(agg.select(col("label"), col("max_shift_micro")), Seq("label"))
          .filter(col("delta") === col("max_shift_micro"))
          .groupBy(col("label")).agg(min(col("dim")).as("max_shift_dim"))
        val rep = agg.join(argDim, Seq("label"))
          .select(col("label"), col("n_old"), col("n_new"),
            col("l1_shift_micro"), col("max_shift_micro"),
            col("max_shift_dim"))
          .orderBy(col("label"))
        try sink(id, rep) finally { per.unpersist(); () }
    }
  }

  /** Streaming token-drift gate — the streaming twin of
    * [[graft.operators.TextAnalysis.t28_token_drift]]: each arriving
    * document micro-batch is scored against the standing corpus's
    * top-vocabulary distribution and the per-token KL contributions
    * (exact micro-units, t28's formula term for term) are handed to
    * `sink`. Same zero-state foreachBatch shape as
    * [[embeddingDriftReports]]; the reference vocabulary is a static
    * ≤ V-row frame resolved once. */
  def tokenDriftReports(delivery: DataFrame, corpus: DataFrame)(
      sink: (Long, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    delivery.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        sink(id,
          graft.operators.TextAnalysis.tokenDriftAgainst(corpus, batch.toDF()))
    }

  /** Streaming ANN serve — the query-side leg of the standing-index
    * story: vectors arriving as a stream are answered against the
    * SAVED s25 serving index ([[graft.sources.IndexStore
    * .ensureCellIndex]], resolved at stream construction and
    * re-checked per batch via one meta read, so a refresh that swaps
    * the artifact is picked up by the next micro-batch), each
    * micro-batch running the exact s23 probe-rank + per-cell beam +
    * fuse over the artifact and handing the per-query top-K to `sink`
    * with the batch id. The arithmetic is
    * [[graft.operators.Similarity.cellProbeSearchFor]]'s bit for bit,
    * so a replayed query batch reproduces the batch s25 rows
    * (StreamingSpec pins the parity). `sink` must consume its frame
    * EAGERLY (collect or write before returning): the batch's beam
    * checkpoints are released the moment it returns. Queries from an
    * EXTERNAL id namespace (ids that are not corpus vec_ids) pass
    * `selfIsInCorpus = false` so a numeric id collision cannot erase
    * a corpus vector from its top-K.
    *
    * State/scale: the same zero-streaming-state foreachBatch seam as
    * the drift gates — per batch the search runs in batch land over
    * the file-backed index (cell-partitioned: a batch probing
    * nprobe/ncells cells reads that fraction of the graph off disk),
    * the query side of every join broadcasts, and nothing is keyed on
    * the stream across batches. At serving scale this is the
    * query-router shape: each micro-batch costs |batch|·beam·(k+1)
    * exact distance evaluations and never scans the corpus. */
  /** `tombstonesDir` (optional): a parquet location holding the
    * current delete set (one `del_id` column), re-resolved per
    * micro-batch — deletions published by an upstream job between
    * batches take effect on the NEXT batch, no restart (the streaming
    * face of [[graft.operators.Similarity.s29_tombstone_serve]]'s
    * discipline: ghosts traversable, dropped at the fuse). A
    * transiently unreadable location (mid-overwrite, not yet created)
    * keeps the LAST resolved delete set — deletes only grow, so the
    * degraded mode must never resurrect a deleted id.
    *
    * `fuseKeep` (optional): the per-candidate fuse-stage filter hook,
    * verbatim [[graft.operators.Similarity.cellProbeSearchFor]]'s —
    * the streaming face of
    * [[graft.operators.Retrieval.s32_filtered_search]]'s
    * attribute-filtered serving (candidates failing the predicate
    * drop at the fuse, deeper beam members backfill, the beams and
    * the artifact untouched). The closure is applied inside every
    * micro-batch's search, so a predicate built on a static corpus
    * attribute frame resolves that frame per batch like any other
    * batch join. */
  def annServeStream(queries: DataFrame, corpusDir: String,
      corpus: DataFrame, selfIsInCorpus: Boolean = true,
      nCells: Int = -1, tombstonesDir: String = null,
      fuseKeep: DataFrame => DataFrame = null)(
      sink: (Long, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Similarity
    import graft.sources.IndexStore
    val s = corpus.sparkSession
    // resolve (build if stale) ONCE at stream construction — the only
    // time the corpus itself is scanned (for the fingerprint)
    val dir = IndexStore.cellIndexDir(corpusDir)
    var index = IndexStore.ensureCellIndex(s, corpusDir, corpus, nCells)
    var served = IndexStore.currentMeta(s, dir)
    var tombs: DataFrame = null
    queries.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        // refresh pickup: one tiny meta read per batch — when a
        // rebuild (s27's refresh, or any ensureCellIndex under a new
        // corpus state) swapped the artifact at this dir, later
        // batches answer from the NEW index; no corpus scan, no
        // stream restart. A mid-swap window (meta deleted, data
        // half-written) reads as None and keeps serving the frames
        // already resolved.
        val now = IndexStore.currentMeta(s, dir)
        if (now.isDefined && now != served) {
          index = IndexStore.loadCellIndex(s, dir)
          served = now
        }
        // tombstone pickup: re-list the delete set (file listing +
        // schema only — the frame is consumed inside the search); an
        // unreadable dir keeps the prior set, never drops it
        if (tombstonesDir != null) {
          try tombs = s.read.parquet(tombstonesDir).select(col("del_id"))
          catch { case scala.util.control.NonFatal(_) => () }
        }
        val (cents, asg, entries, graph) = index
        val q = batch.toDF().select(col("vec_id").as("q_id"),
          transform(col("embedding"),
            x => floor(x.cast(DoubleType) * 1000).cast(LongType)).as("q_mv"))
        // per-batch release scope: the beam rounds register GsRounds
        // localCheckpoint blocks per micro-batch; on a long-lived
        // serving stream letting them accumulate until stop() is
        // unbounded executor-storage growth. The sink contract is
        // eager (it must consume — collect/write — before returning),
        // so everything registered during THIS batch is releasable
        // the moment it returns; frames registered before the mark
        // (a concurrent query's) are untouched.
        val m = graft.CacheScope.mark()
        // the artifact's build-time probe recommendation rides the
        // SAME meta string the refresh poll just read — √n builds
        // carry it, pinned builds resolve the static default
        try sink(id, Similarity.cellProbeSearchFor(q, cents, asg, entries,
          graph, selfIsInCorpus = selfIsInCorpus, tombstones = tombs,
          fuseKeep = fuseKeep, nProbeMeta = IndexStore.nProbeOfMeta(served),
          // the artifact's row count rides the same meta string: small
          // corpora serve off one reused asg broadcast instead of
          // per-round beam broadcasts (see cellProbeSearchFor)
          asgRows = IndexStore.corpusRowsOfMeta(served).getOrElse(-1L)))
        finally graft.CacheScope.releaseSince(m)
    }
  }

  /** Streaming HYBRID serve — [[annServeStream]]'s discipline applied
    * to [[graft.operators.Retrieval.s33_hybrid_rrf]]: each arriving
    * query micro-batch is answered with the RRF fusion of (a) the
    * dense cell-probed search over the SAVED serving index (artifact
    * meta re-checked per batch — refresh pickup, no restart) and
    * (b) the sparse rare-shingle Jaccard ranking over the STANDING
    * lexical index (per-doc shingle sets + df-capped postings,
    * resolved at stream construction — the corpus text is not
    * rescanned per batch; each batch's queries broadcast into the
    * postings). When the dense artifact meta changes, the lexical
    * index is re-resolved from `docs` IN THE SAME batch (and the
    * previous standing persists released), so the two fusion arms
    * never rank against different corpus states past a refresh — the
    * one re-scan of the text per refresh is the price of arm
    * coherence, and refreshes are audit-gated rare. Queries are
    * in-corpus ids (vec_id = doc_id, the s33 convention) so the
    * lexical arm resolves their shingle sets by id. Zero streaming
    * state — the same foreachBatch seam as every serve here — and
    * per-batch CacheScope mark/release bounds executor storage on a
    * long-lived stream; the ONE standing lexical persist lives until
    * the next refresh or [[graft.CacheScope.releaseAll]] after
    * `stop()` (the suite convention). `sink` must consume eagerly,
    * as with [[annServeStream]]. */
  def hybridServeStream(queries: DataFrame, corpusDir: String,
      corpus: DataFrame, docs: DataFrame, nCells: Int = -1)(
      sink: (Long, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.{Retrieval, Similarity}
    import graft.sources.IndexStore
    val s = corpus.sparkSession
    val dir = IndexStore.cellIndexDir(corpusDir)
    var index = IndexStore.ensureCellIndex(s, corpusDir, corpus, nCells)
    var served = IndexStore.currentMeta(s, dir)
    // the standing lexical index: resolved at construction (persisted
    // shingle sets + rare postings); batches only probe it. It is
    // re-resolved on dense refresh pickup so the two arms stay on the
    // same corpus state (see the doc comment)
    var lexIx = Retrieval.lexIndex(docs)
    queries.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        val now = IndexStore.currentMeta(s, dir)
        if (now.isDefined && now != served) {
          index = IndexStore.loadCellIndex(s, dir)
          served = now
          // arm coherence: the dense artifact moved, so the lexical
          // arm re-reads `docs` (a lazy plan over the live corpus
          // files) — BOTH prior standing persists (shingle sets +
          // rare postings) are released first, bounding storage at
          // one lexical index per stream
          lexIx.rare.unpersist()
          lexIx.base.unpersist()
          lexIx = Retrieval.lexIndex(docs)
        }
        val (cents, asg, entries, graph) = index
        val m = graft.CacheScope.mark()
        val b = graft.CacheScope.persisted(batch.toDF())
        val q = b.select(col("vec_id").as("q_id"),
          transform(col("embedding"),
            x => floor(x.cast(DoubleType) * 1000).cast(LongType)).as("q_mv"))
        try {
          val ann = Similarity.cellProbeSearchFor(q, cents, asg, entries,
            graph, nProbeMeta = IndexStore.nProbeOfMeta(served),
            asgRows = IndexStore.corpusRowsOfMeta(served).getOrElse(-1L))
          val lex = Retrieval.lexicalTopKFor(
            b.select(col("vec_id").as("q_id")), lexIx)
          sink(id, Retrieval.rrfFuse(ann, lex))
        } finally graft.CacheScope.releaseSince(m)
    }
  }

  def neardupScreenStream(delivery: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.functions.TextHashFunctions.{array_jaccard, minhash_bands, word_shingles}
    def sh(text: org.apache.spark.sql.Column) =
      word_shingles(split(lower(text), "\\s+"), 3)
    val index = corpus.select(col("doc_id").as("corpus_id"),
        sh(col("text")).as("sh_c"))
      .withColumn("bh", explode(array_distinct(minhash_bands(col("sh_c"), 16, 4))))
    val probes = delivery
      .withWatermark("arrival", "1 hour")
      .select(col("doc_id"), col("arrival"), sh(col("text")).as("sh_d"))
      .withColumn("bh", explode(array_distinct(minhash_bands(col("sh_d"), 16, 4))))
    probes.join(index, Seq("bh"))
      .filter(col("doc_id") =!= col("corpus_id"))
      .dropDuplicatesWithinWatermark("doc_id", "corpus_id")
      .filter(array_jaccard(col("sh_d"), col("sh_c")) >= 0.5)
      .select(col("doc_id"), col("corpus_id"), col("arrival"),
        round(array_jaccard(col("sh_d"), col("sh_c")), 4).as("jaccard"))
  }
}
