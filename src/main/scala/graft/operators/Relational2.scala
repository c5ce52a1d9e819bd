package graft.operators

import graft.Tables
import graft.Tables.{dsum, davg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Round-4 extension of the relational surface ([[Relational]]):
  * reshaping (unpivot), statistical aggregates, distribution windows,
  * full-outer alignment, map columns, conditional/argmax/bitwise
  * aggregation, null-safe arithmetic, multi-distinct, and median.
  *
  * Same contract as [[Relational]]: every query here is
  * deterministic (total ORDER BY with tie-breaks, decimal-exact
  * double sums via [[Tables.dsum]]) and hash-checked against the
  * DuckDB oracle in [[oracles]].
  */
object Relational2 {

  type Q = (SparkSession, String) => DataFrame

  /** Wide→long reshape with the native `unpivot` (SQL UNPIVOT /
    * melt): aggregate once, then rotate the measure columns into
    * (measure, val) rows. Unpivot is a zero-shuffle projection — each
    * input row expands locally — so the reshape adds nothing to the
    * aggregation's cost at any scale. All measures are cast to double
    * (unpivot requires a common value type; the count would otherwise
    * widen to the sums' type nondeterministically).
    */
  def q51_unpivot: Q = (s, d) => {
    val wide = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).cast(DoubleType).as("n_rows"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_rows")),
        "measure", "val")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  /** Statistical aggregates (corr / covariance / stddev) computed
    * from decimal-exact power sums rather than the built-in
    * `corr`/`covar_pop` — the builtins accumulate doubles in
    * partition order, so their last bits drift run-to-run under
    * parallelism; the five exact sums reduce deterministically and
    * the closed-form combination below is one fixed IEEE sequence,
    * identical in Spark and DuckDB. Single partial-agg pass over the
    * fact table, five decimal accumulators per group — the same cost
    * profile as q01 at any scale.
    */
  def q52_corr_stats: Q = (s, d) => {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    val agg = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast(DoubleType).as("n"),
        dsum(x).as("sx"), dsum(y).as("sy"),
        dsum(x * x).as("sxx"), dsum(y * y).as("syy"),
        dsum(x * y).as("sxy"))
    agg.select(
        col("l_returnflag"),
        col("n").cast(LongType).as("n_rows"),
        // rhalfup for the sqrt-free quotient (can land on exact
        // halves); corr/stddev pass through sqrt (irrational) where
        // round() is stable — see Tables.rhalfup
        Tables.rhalfup((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"), 6)
          .as("covar_pop"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / col("n")), 6)
          .as("stddev_pop_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Distribution windows: percent_rank + cume_dist of every customer
    * within their nation's balance order. Both are exact ratios of
    * ranks ((rk−1)/(n−1), rows≤current/n) over a tie-broken total
    * order, so the doubles are bit-identical on any engine. One
    * shuffle on the partition key, same shape as q07/q35.
    */
  def q53_dist_window: Q = (s, d) => {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    // rhalfup, NOT round(x, 6): both ratios are exact small-integer
    // quotients (k/n), and at some SFs x·1e6 lands exactly on a
    // representable half (sf0.1 observed: 0.520313 vs 0.520312) where
    // Spark's and DuckDB's round() disagree — see Tables.rhalfup
    Tables.customer(s, d)
      .select(
        col("c_custkey"), col("c_nationkey"),
        Tables.rhalfup(percent_rank().over(w), 6).as("pct_rank"),
        Tables.rhalfup(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("c_custkey"))
  }

  /** Full-outer alignment of two independently aggregated daily
    * series (orders vs events) — the calendar-join shape behind every
    * "activity vs sales" dashboard. Aggregate BEFORE the join (one
    * row per day per side), so the full-outer join moves only
    * day-level rows regardless of fact scale; unmatched days keep
    * NULL counts (not 0 — absence and zero are different facts).
    * The day key is a 'yyyy-MM-dd' STRING: a computed DATE column
    * surfaces as datetime.date from Spark parquet but datetime64 from
    * DuckDB, and the driver's stringified hash sees those differently.
    */
  def q54_full_outer: Q = (s, d) => {
    val od = Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val ed = Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    od.join(ed, Seq("day"), "full_outer")
      .select(col("day"), col("n_orders"), col("n_events"))
      .orderBy(col("day"))
  }

  /** Map-typed columns end to end: build a status→count map per order
    * priority (map_from_entries over entries sorted by key — map
    * iteration order is entry order, so sorting makes every derived
    * value deterministic), then consume it with element_at /
    * map_keys / transform_values. Maps stay inside Tungsten rows
    * (no shuffle amplification); the group-by is two tiny aggregates.
    */
  def q55_map_funcs: Q = (s, d) => {
    val m = map_from_entries(
      array_sort(collect_list(struct(col("o_orderstatus"), col("cnt")))))
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("o_orderpriority"))
      .agg(m.as("m"))
      .select(
        col("o_orderpriority"),
        size(col("m")).as("n_statuses"),
        array_join(map_keys(col("m")), ",").as("statuses"),
        coalesce(element_at(col("m"), "F"), lit(0L)).as("n_finished"),
        coalesce(element_at(
          transform_values(col("m"), (_, v) => v * 2), "O"), lit(0L))
          .as("n_open_x2"))
      .orderBy(col("o_orderpriority"))
  }

  /** Conditional aggregation: count_if / bool_and / bool_or — the
    * FILTER-clause family. All three fold map-side like any other
    * partial aggregate; the share is an exact int ratio. */
  def q56_conditional_agg: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        count_if(col("c_acctbal") < 0).as("n_negative"),
        bool_and(col("c_acctbal") > -1000).as("all_above_floor"),
        bool_or(col("c_acctbal") > 9000).as("any_rich"))
      .withColumn("neg_share",
        Tables.rhalfup(col("n_negative") / col("n_customers"), 4))
      .orderBy(col("n_name"))
  }

  /** Argmax/argmin aggregation (max_by/min_by): the order carrying
    * the extreme price per return flag, without a window pass. The
    * ordering value packs (price, orderkey) into one exact long —
    * price has 2 decimals so ·100 is integral, ·10^7 leaves the
    * orderkey as the tie-break in the low digits (exact while
    * price·100 < 9.2e11 and orderkey < 10^7 — both orders of
    * magnitude above this dataset; a composite struct ordering would
    * be the general form, but DuckDB 1.0's arg_max can't take one).
    * max_by folds map-side — one partial-agg pass, no shuffle of raw
    * rows, which is why argmax-by-aggregation beats argmax-by-window
    * at 100 TB when only the extreme row is wanted.
    */
  def q57_argmax: Q = (s, d) => {
    val packed = round(col("l_extendedprice") * 100).cast(LongType) *
      10000000L + col("l_orderkey")
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        max_by(col("l_orderkey"), packed).as("max_price_order"),
        min_by(col("l_orderkey"), packed).as("min_price_order"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_extendedprice")).as("min_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Null-safe arithmetic (`try_divide`): ANSI-style
    * divide-by-zero → NULL instead of a job-killing exception — what
    * a 100 TB pipeline wants when one group in a trillion has an
    * empty denominator. Mirrors DuckDB's x / NULLIF(y, 0). */
  def q58_try_arith: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count_if(col("l_quantity") > 49).as("n_maxed"),
        count_if(col("l_quantity") < 2).as("n_single"))
      .withColumn("maxed_per_single",
        Tables.rhalfup(try_divide(col("n_maxed"), col("n_single")), 6))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Several COUNT(DISTINCT …) in one aggregate — Catalyst plans this
    * as one Expand (row replicated per distinct column) + two-phase
    * aggregate, NOT separate scans+joins. At scale the Expand
    * multiplies shuffle volume by the number of distinct columns;
    * that (visible, linear) cost is the right trade against N
    * self-joins. */
  def q59_multi_distinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Exact median (interpolating percentile 0.5) next to the
    * decimal-exact mean — the robust-vs-classical center pair. Exact
    * median materializes each group's values once (Spark collects
    * per-group into the percentile buffer); at true 100 TB prefer
    * q23b's approx_percentile sketch — this is the exact-answer
    * variant for when the group count is bounded. */
  def q60_median: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        median(col("l_quantity")).as("median_qty"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("n_rows"))
      .withColumn("skew_gap",
        Tables.rhalfup(col("avg_qty") - col("median_qty"), 6))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Bitwise aggregation (bit_and / bit_or / bit_xor) — flag-mask
    * folding (capability intersections, parity checks) as partial
    * aggregates. All three are associative+commutative so they fold
    * map-side; xor additionally makes a cheap order-independent
    * content checksum of a key set. */
  def q61_bitwise: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        bit_and(col("l_partkey")).as("mask_and"),
        bit_or(col("l_partkey")).as("mask_or"),
        bit_xor(col("l_partkey")).as("mask_xor"),
        bit_xor(col("l_orderkey") * 2654435761L % 4294967296L)
          .as("orderset_checksum"))
      .orderBy(col("l_returnflag"))

  /** Deterministic mode (most frequent value) per group. The builtin
    * `mode()` exists on both engines but leaves ties unspecified, so
    * the explicit count + row_number form pins the tie-break (highest
    * count, then highest value) — the only way a mode is
    * reproducible across engines, partitionings, and versions. Cost:
    * one partial-agg shuffle on (group, value) + a window over the
    * tiny per-group count table.
    */
  def q62_mode: Q = (s, d) => {
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n_occurrences"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n_occurrences").desc, col("l_quantity").desc)
    counts.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
        col("n_occurrences"))
      .orderBy(col("l_returnflag"))
  }

  /** Hopping (sliding) window aggregation: 2-hour windows advancing
    * every hour, so each event lands in exactly two overlapping
    * windows — the batch twin of the streaming hop that backs every
    * "active users in the trailing 2h, refreshed hourly" panel.
    * Spark's `window(ts, size, slide)` expands each row to its
    * windows before a normal aggregate; the DuckDB mirror builds the
    * same two starts per event (hour-trunc minus k hours, k ∈ {0,1}).
    * Row expansion is the slide ratio (2×) — visible, linear, and
    * map-side; the aggregate shuffles only (window, type) keys.
    */
  def q63_hopping_window: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n_events"))
      .orderBy(col("w_start"), col("event_type"))

  /** Array set algebra on grouped sets: per-order part sets by line
    * status, then intersect/union/except cardinalities — the
    * "overlap between two collected sets" shape (e.g. returned-vs-
    * kept SKUs). Only SIZES are emitted: collect_set order is
    * partition-dependent, set cardinalities are not. The filtered
    * keyset keeps output bounded; the one shuffle is the per-order
    * collect.
    */
  def q64_array_setops: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 50 === 0)
      .groupBy(col("l_orderkey"))
      .agg(
        collect_set(when(col("l_linestatus") === "F", col("l_partkey")))
          .as("parts_f"),
        collect_set(when(col("l_linestatus") === "O", col("l_partkey")))
          .as("parts_o"))
      .select(col("l_orderkey"),
        size(col("parts_f")).as("n_f"),
        size(col("parts_o")).as("n_o"),
        size(array_intersect(col("parts_f"), col("parts_o"))).as("n_both"),
        size(array_union(col("parts_f"), col("parts_o"))).as("n_any"),
        size(array_except(col("parts_f"), col("parts_o"))).as("n_f_only"))
      .orderBy(col("l_orderkey"))

  /** Positional explode (UNNEST WITH ORDINALITY): token positions per
    * document — first occurrence and count per distinct token. Spark's
    * posexplode is 0-based, the SQL-standard ordinality is 1-based,
    * so the position is shifted at the source. Generator + aggregate;
    * the doc_id filter bounds output for the gate, the shape itself
    * is a linear map-side expansion.
    */
  def q65_posexplode: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .groupBy(col("doc_id"), col("tok"))
      .agg(min(col("pos") + 1).as("first_pos"), count(lit(1)).as("n_occ"))
      .orderBy(col("doc_id"), col("tok"))

  /** Time-interval RANGE window: per-user trailing-1-hour event count
    * and value sum at every event — the rolling-rate shape behind
    * throttling, anomaly and velocity checks. Spark's rangeBetween is
    * numeric-only, so the frame runs over epoch-microseconds (exactly
    * the µs the timestamps are stored at; DuckDB mirrors with
    * epoch_us(ts)) — both engines evaluate the identical integer
    * frame, no interval-type semantics to disagree on. One shuffle on
    * user_id; the frame is evaluated by a running two-pointer pass
    * per partition, not a per-row rescan.
    */
  def q66_rolling_range: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .withColumn("ts_us", call_function("div", col("ts_ns"), lit(1000L)))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast(DecimalType(28, 6))).over(w)
          .cast(DoubleType).as("sum_1h"))
      .orderBy(col("event_id"))
  }

  /** The join under [[q67_bloom_join]], built plain so PlanSpec can
    * assert the injected runtime filter under the same conf window. */
  private[graft] def bloomSemiJoin(s: SparkSession, d: String): DataFrame = {
    val hi = Tables.orders(s, d)
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey"))
    Tables.lineitem(s, d)
      .join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** q67 — runtime-bloom-filtered semi-join: lineitem semi-joined to
    * the high-value slice of orders with Catalyst's
    * InjectRuntimeFilter rule active, so a bloom filter built on the
    * (selectively filtered) orders keys is pushed into the lineitem
    * side BEFORE its shuffle. This is the 100 TB shape for a
    * dim-too-big-to-broadcast join: the fact side's shuffle writes
    * only rows whose key might match (bloom false-positive rate ~1%),
    * instead of the full table, and the exact join after the filter
    * keeps the result identical — the oracle is the plain semi-join.
    *
    * The conf window (bloom on, application-side threshold 0 so the
    * local-scale scan qualifies, broadcast off so the join actually
    * shuffles — exactly the regime where bloom pays) is applied to a
    * CLONED session (`newSession`: same SparkContext and cached data,
    * fresh SessionState), so the caller's session conf is never
    * touched — a query planning concurrently on the same session can
    * no longer observe bloom-on/broadcast-off state. The result is
    * materialized inside the window with an eager localCheckpoint
    * (tracked by CacheScope for post-consumption release) and is
    * session-independent thereafter.
    */
  def q67_bloom_join: Q = (s, d) => {
    val s2 = s.newSession()
    // newSession initializes SQLConf from the SparkContext conf, so
    // builder-level settings (shuffle.partitions, AQE, timezone)
    // carry over; only the bloom window below is session-local
    Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "64MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => s2.conf.set(k, v) }
    graft.CacheScope.checkpointed(bloomSemiJoin(s2, d))
  }

  /** q68 — LOCF forward-fill (last observation carried forward): the
    * imputation pass every feature/training pipeline runs over gappy
    * per-entity series. Rows whose reading is invalid (here: 'error'
    * events) take the most recent valid value of the same user;
    * leading gaps stay NULL. Spark's `last(..., ignoreNulls)` over a
    * running row frame is the native form — one shuffle on user_id,
    * one sort, the fill itself is a single sequential pass per
    * partition. The oracle mirrors it with the portable
    * gaps-and-islands form (running COUNT of non-nulls defines the
    * fill group; each group holds exactly one non-null, its first
    * row, so MAX over the group recovers it) — value is carried
    * VERBATIM (no arithmetic), so floats hash bit-identically.
    */
  def q68_locf: Q = (s, d) => {
    val order = Seq(col("ts_us"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("ts_us", call_function("div", col("ts_ns"), lit(1000L)))
      .withColumn("v_valid",
        when(col("event_type") =!= "error", col("value")))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("v_valid"),
        last(col("v_valid"), ignoreNulls = true).over(w).as("v_filled"))
      .orderBy(col("event_id"))
  }

  /** q69 — ordered funnel attribution: per user, the furthest stage
    * of the view → click → purchase funnel reached IN ORDER: a click
    * counts only at-or-after the user's first view, a purchase only
    * at-or-after the first qualifying click. The standard
    * product-analytics shape (strict-order funnels are what
    * sessionization feeds).
    *
    * Three per-user aggregates chained by inequality joins on the
    * previous stage's first-hit time. Each aggregate is one shuffle
    * on user_id; the chaining tables are one row per user, so at
    * scale they broadcast and the event table is scanned three times
    * filtered to one event type each — never materializing per-user
    * event arrays (the collect_list formulation OOMs on power users).
    * Times are epoch-µs (exactly the stored precision; DuckDB mirrors
    * with epoch_us).
    */
  def q69_funnel: Q = (s, d) => {
    val e = Tables.events(s, d)
      .withColumn("ts_us", call_function("div", col("ts_ns"), lit(1000L)))
      .select(col("user_id"), col("event_type"), col("ts_us"))
    // v and c each feed TWO consumers (the next stage's inequality
    // join and the final left-join) — persisted so the pruned event
    // scan under each runs once, not twice (ReuseExchange only dedups
    // under AQE; the persist is explicit and the tables are one row
    // per user)
    val v = graft.CacheScope.persisted(
      e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view")))
    val c = graft.CacheScope.persisted(
      e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts_us") >= col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_click")))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts_us") >= col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_purchase"))
    e.select(col("user_id")).distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn("stage",
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0))
      .select(col("user_id"), col("stage"),
        col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy(col("user_id"))
  }

  /** q70 — cohort retention matrix: users cohorted by the ISO week of
    * their first event; for each (cohort_week, weeks-since) cell, the
    * count of cohort users active that week and the retention
    * fraction. The standard product-analytics readout (and a
    * corpus-delivery freshness readout when "user" is a source).
    *
    * Scale: two aggs over the event scan (first-event per user,
    * distinct user-weeks), one user-keyed join, then a cohort-keyed
    * rollup; cohort sizes are a tiny broadcast. week_no arithmetic is
    * exact (both timestamps are Monday-truncated, so the day delta is
    * a multiple of 7).
    */
  def q70_cohort: Q = (s, d) => {
    val e = Tables.events(s, d)
    val firsts = e.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), date_trunc("week", col("first_ts")).as("cohort_week"))
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    val activity = e
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    activity.join(firsts, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast(IntegerType)
          .as("week_no"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_no"), col("n_active"),
        col("n_cohort"),
        Tables.rhalfup(col("n_active") / col("n_cohort"), 6).as("retention"))
      .orderBy(col("cohort_week"), col("week_no"))
  }

  /** q71 — Z-order layout audit: events keyed by (user, epoch-minute)
    * are assigned the interleaved-bit z-value of the two 16-bit dims
    * and grouped into 1024 z-buckets (the file-level layout a
    * `ZORDER BY (user, time)` table write would produce); per bucket,
    * the count and BOTH dims' min/max spans. Tight spans on both
    * dims is exactly the property that lets min/max file statistics
    * skip files for user-keyed AND time-keyed predicates — the
    * data-skipping readout for a 100 TB layout decision.
    *
    * Scale: the z-value is a generated 16-term integer expression
    * (map-only); the audit is one 1024-ary agg. The same z column
    * feeds `repartitionByRange(col("z"))` at write time.
    */
  def q71_zorder: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(65536L)).as("x"),
        pmod(call_function("div",
          call_function("div", col("ts_ns"), lit(1000L)), lit(60000000L)),
          lit(65536L)).as("y"))
    val z = (0 until 16).map { i =>
      (shiftright(col("x"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(col("y"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
    e.withColumn("z", z)
      .groupBy((call_function("div", col("z"), lit(4194304L))).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy(col("bucket"))
  }

  /** q72 — MERGE INTO (CDC upsert apply): a change-data batch applied
    * to the `orders` base table with the three MERGE actions —
    * matched+U → update, matched+D → delete, not-matched+I → insert —
    * emitted as the changed-row feed (key, action, post-image). The
    * delivery here is derived deterministically from the base itself
    * (update every 13th key, delete every 19th not updated, insert a
    * remapped copy of every 17th ≡ 3) so the oracle can rebuild it;
    * in production it arrives as its own table and nothing in the
    * plan changes.
    *
    * Scale: one PK-keyed equi-join per action class against the
    * delivery (a real CDC batch is delivery-sized → Spark broadcasts
    * it and the base never shuffles; this corpus-derived delivery is
    * proportional, so AQE picks a shuffle join — both shapes are one
    * pass over the base). The anti-join for inserts is keyed the same
    * way. No window, no skew surface: the PK is unique on both sides.
    */
  def q72_merge_upsert: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val k = col("o_orderkey")
    val upd = o.filter(pmod(k, lit(13L)) === 0L)
      .select(k.as("mk"),
        Tables.rhalfup(col("o_totalprice") * 1.05, 2).as("new_price"))
    val del = o.filter(pmod(k, lit(13L)) =!= 0L && pmod(k, lit(19L)) === 5L)
      .select(k.as("mk"))
    val ins = o.filter(pmod(k, lit(17L)) === 3L)
      .select((k + 10000000000L).as("mk"),
        col("o_totalprice").as("new_price"))
    val updated = o.join(upd, k === col("mk"))
      .select(k.as("o_orderkey"), lit("update").as("action"),
        col("new_price").as("o_totalprice"), lit("P").as("o_orderstatus"))
    val deleted = o.join(del, k === col("mk"))
      .select(k.as("o_orderkey"), lit("delete").as("action"),
        lit(null).cast(DoubleType).as("o_totalprice"),
        lit(null).cast(StringType).as("o_orderstatus"))
    val inserted = ins.join(o, col("mk") === k, "left_anti")
      .select(col("mk").as("o_orderkey"), lit("insert").as("action"),
        col("new_price").as("o_totalprice"), lit("N").as("o_orderstatus"))
    updated.unionByName(deleted).unionByName(inserted)
      .orderBy(col("o_orderkey"), col("action"))
  }

  /** q73 — incremental aggregate maintenance: a standing per-key
    * aggregate (count / decimal-exact sum / min / max per customer)
    * updated with a delivery slice by MERGING PARTIAL AGGREGATES —
    * count adds, sum adds, min/max fold — instead of recomputing over
    * the union. This is how a 100 TB rollup absorbs a daily delivery:
    * work ∝ delivery + |touched keys|, never the standing fact table.
    * The full-outer merge is exact because every aggregate here is
    * decomposable (the same property Spark's own partial_sum/merge
    * phases rely on); the oracle RECOMPUTES over the union, proving
    * merge ≡ recompute.
    *
    * Scale: base and delta aggregate independently (partial+final each
    * side), then one key-keyed full-outer join; the delta side is
    * delivery-sized → broadcast-shaped.
    */
  /** q74 — mergeable distinct-count rollup: per-(day, event_type) HLL
    * sketches of the user set built in ONE pass over events, then
    * MERGED up to event_type totals without touching the fact table
    * again. This is q73's incremental-maintenance story extended to
    * the non-algebraic DISTINCT: daily distinct counts cannot be
    * added, but their sketches union losslessly — the standing
    * per-day sketch table absorbs each new day and any rollup window
    * (week, month, all-time) is a sketch-merge, never a fact re-scan.
    * The exact recount rides along as the audit column.
    *
    * Scale: daily sketches are a partial+final agg keyed (day, type)
    * — each executor contributes one ~1 KB sketch per group, so the
    * shuffle moves sketches, not user ids; the merge agg is
    * group-count-sized. The exact audit is the only distinct shuffle
    * and exists to measure the sketch, not to serve queries.
    * Rows-only (sketch estimates are engine-specific); the spec pins
    * estimate-vs-exact relative error ≤ 5% and merge ≡ direct-sketch.
    */
  def q74_sketch_rollup: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"))
    val daily = ev.groupBy(col("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        count(lit(1)).as("n_events"))
    val merged = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("n_events")).as("n_events"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_distinct"))
    val exact = ev.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_distinct"))
    merged.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_distinct"), col("exact_distinct"))
      .orderBy(col("event_type"))
  }

  def q73_incremental_agg: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val delivery = col("o_orderkey") % 10 === 7
    def aggOf(df: DataFrame): DataFrame = df
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(28, 6))).as("sum_d"),
        min(col("o_totalprice")).as("min_p"),
        max(col("o_totalprice")).as("max_p"))
    val base = aggOf(o.filter(!delivery))
      .withColumnRenamed("n", "n_b").withColumnRenamed("sum_d", "s_b")
      .withColumnRenamed("min_p", "mn_b").withColumnRenamed("max_p", "mx_b")
    val delta = aggOf(o.filter(delivery))
      .withColumnRenamed("n", "n_d").withColumnRenamed("sum_d", "s_d")
      .withColumnRenamed("min_p", "mn_d").withColumnRenamed("max_p", "mx_d")
    base.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("s_b"), lit(0).cast(DecimalType(28, 6)))
          + coalesce(col("s_d"), lit(0).cast(DecimalType(28, 6))))
          .cast(DoubleType).as("sum_price"),
        least(coalesce(col("mn_b"), col("mn_d")),
          coalesce(col("mn_d"), col("mn_b"))).as("min_price"),
        greatest(coalesce(col("mx_b"), col("mx_d")),
          coalesce(col("mx_d"), col("mx_b"))).as("max_price"))
      .orderBy(col("o_custkey"))
  }

  val queries: Map[String, Q] = Map(
    "q73_incremental_agg" -> q73_incremental_agg,
    "q74_sketch_rollup" -> q74_sketch_rollup,
    "q72_merge_upsert" -> q72_merge_upsert,
    "q71_zorder" -> q71_zorder,
    "q70_cohort" -> q70_cohort,
    "q69_funnel" -> q69_funnel,
    "q67_bloom_join" -> q67_bloom_join,
    "q68_locf" -> q68_locf,
    "q66_rolling_range" -> q66_rolling_range,
    "q62_mode" -> q62_mode,
    "q63_hopping_window" -> q63_hopping_window,
    "q64_array_setops" -> q64_array_setops,
    "q65_posexplode" -> q65_posexplode,
    "q51_unpivot" -> q51_unpivot,
    "q52_corr_stats" -> q52_corr_stats,
    "q53_dist_window" -> q53_dist_window,
    "q54_full_outer" -> q54_full_outer,
    "q55_map_funcs" -> q55_map_funcs,
    "q56_conditional_agg" -> q56_conditional_agg,
    "q57_argmax" -> q57_argmax,
    "q58_try_arith" -> q58_try_arith,
    "q59_multi_distinct" -> q59_multi_distinct,
    "q60_median" -> q60_median,
    "q61_bitwise" -> q61_bitwise,
  )

  val oracles: Map[String, String] = Map(
    "q73_incremental_agg" ->
      // the PROOF side: a flat recompute over all orders must equal
      // the Spark side's base⊕delta partial-aggregate merge
      """SELECT o_custkey,
        |  COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
        |    AS sum_price,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price
        |FROM orders
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q72_merge_upsert" ->
      """WITH upd AS (
        |  SELECT o_orderkey AS mk,
        |    floor(o_totalprice * 1.05 * 1e2 + 0.5) / 1e2 AS new_price
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |del AS (
        |  SELECT o_orderkey AS mk FROM orders
        |  WHERE o_orderkey % 13 <> 0 AND o_orderkey % 19 = 5),
        |ins AS (
        |  SELECT o_orderkey + 10000000000 AS mk, o_totalprice AS new_price
        |  FROM orders WHERE o_orderkey % 17 = 3)
        |SELECT o.o_orderkey, 'update' AS action,
        |  u.new_price AS o_totalprice, 'P' AS o_orderstatus
        |FROM orders o JOIN upd u ON o.o_orderkey = u.mk
        |UNION ALL
        |SELECT o.o_orderkey, 'delete', NULL, NULL
        |FROM orders o JOIN del d ON o.o_orderkey = d.mk
        |UNION ALL
        |SELECT i.mk, 'insert', i.new_price, 'N'
        |FROM ins i ANTI JOIN orders o ON i.mk = o.o_orderkey
        |ORDER BY o_orderkey, action""".stripMargin,
    "q67_bloom_join" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q71_zorder" -> {
      // the same 16-term interleave both engines evaluate exactly
      val zSql = (0 until 16).map(i =>
        s"((x >> $i) & 1) * ${1L << (2 * i)} + " +
          s"((y >> $i) & 1) * ${1L << (2 * i + 1)}").mkString(" + ")
      s"""WITH e AS (
         |  SELECT event_id, user_id % 65536 AS x,
         |    (epoch_us(ts) // 60000000) % 65536 AS y
         |  FROM events),
         |z AS (SELECT x, y, $zSql AS z FROM e)
         |SELECT z // 4194304 AS bucket, COUNT(*) AS n_events,
         |  MIN(x) AS x_min, MAX(x) AS x_max,
         |  MIN(y) AS y_min, MAX(y) AS y_max
         |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
    },
    "q70_cohort" ->
      """WITH firsts AS (
        |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        |  FROM events GROUP BY user_id),
        |sizes AS (
        |  SELECT cohort_week, COUNT(*) AS n_cohort
        |  FROM firsts GROUP BY cohort_week),
        |activity AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        |  FROM events),
        |cells AS (
        |  SELECT f.cohort_week,
        |    CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT) AS week_no,
        |    COUNT(*) AS n_active
        |  FROM activity a JOIN firsts f USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT c.cohort_week, c.week_no, c.n_active, s.n_cohort,
        |  floor(CAST(c.n_active AS DOUBLE) / s.n_cohort * 1e6 + 0.5) / 1e6
        |    AS retention
        |FROM cells c JOIN sizes s USING (cohort_week)
        |ORDER BY c.cohort_week, c.week_no""".stripMargin,
    "q69_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (
        |  SELECT user_id, MIN(ts_us) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(ts_us) AS t_click FROM e
        |  JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND ts_us >= t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(ts_us) AS t_purchase FROM e
        |  JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_us >= t_click
        |  GROUP BY e.user_id)
        |SELECT u.user_id,
        |  CASE WHEN p.user_id IS NOT NULL THEN 3
        |       WHEN c.user_id IS NOT NULL THEN 2
        |       WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage,
        |  v.t_view, c.t_click, p.t_purchase
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN v USING (user_id)
        |LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)
        |ORDER BY u.user_id""".stripMargin,
    "q68_locf" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN event_type <> 'error' THEN value END AS v_valid
        |  FROM events),
        |g AS (
        |  SELECT *, COUNT(v_valid) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM e)
        |SELECT event_id, user_id, ts_us, v_valid,
        |  MAX(v_valid) OVER (PARTITION BY user_id, grp) AS v_filled
        |FROM g ORDER BY event_id""".stripMargin,
    "q66_rolling_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS VARCHAR) AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q62_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS n_occurrences
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY n_occurrences DESC, l_quantity DESC) AS rk
        |  FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, n_occurrences
        |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,
    "q63_hopping_window" ->
      """WITH h AS (
        |  SELECT event_type,
        |    date_trunc('hour', ts) - INTERVAL 1 HOUR * k AS w_start
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
        |SELECT w_start, w_start + INTERVAL 2 HOUR AS w_end, event_type,
        |  COUNT(*) AS n_events
        |FROM h GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,
    "q64_array_setops" ->
      """WITH s AS (
        |  SELECT l_orderkey,
        |    coalesce(list(DISTINCT l_partkey)
        |      FILTER (WHERE l_linestatus = 'F'), []) AS pf,
        |    coalesce(list(DISTINCT l_partkey)
        |      FILTER (WHERE l_linestatus = 'O'), []) AS po
        |  FROM lineitem WHERE l_orderkey % 50 = 0 GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  CAST(len(pf) AS INT) AS n_f,
        |  CAST(len(po) AS INT) AS n_o,
        |  CAST(len(list_filter(pf, x -> list_contains(po, x))) AS INT)
        |    AS n_both,
        |  CAST(len(pf) + len(po)
        |    - len(list_filter(pf, x -> list_contains(po, x))) AS INT)
        |    AS n_any,
        |  CAST(len(pf)
        |    - len(list_filter(pf, x -> list_contains(po, x))) AS INT)
        |    AS n_f_only
        |FROM s ORDER BY l_orderkey""".stripMargin,
    "q65_posexplode" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents WHERE doc_id < 20),
        |u AS (
        |  SELECT doc_id, unnest(l) AS tok,
        |    unnest(range(1, len(l) + 1)) AS pos
        |  FROM t)
        |SELECT doc_id, tok, CAST(MIN(pos) AS INT) AS first_pos,
        |  COUNT(*) AS n_occ
        |FROM u GROUP BY doc_id, tok ORDER BY doc_id, tok""".stripMargin,
    "q51_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_price,
        |    CAST(COUNT(*) AS DOUBLE) AS n_rows
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, val
        |FROM w UNPIVOT (val FOR measure IN (sum_qty, sum_price, n_rows))
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q52_corr_stats" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  CAST(n AS BIGINT) AS n_rows,
        |  floor((sxy - sx*sy/n)/n * 1e6 + 0.5) / 1e6 AS covar_pop,
        |  round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx)*(n*syy - sy*sy)), 6) AS corr,
        |  round(sqrt((sxx - sx*sx/n)/n), 6) AS stddev_pop_qty
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "q53_dist_window" ->
      """SELECT c_custkey, c_nationkey,
        |  floor(percent_rank() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal, c_custkey) * 1e6 + 0.5) / 1e6 AS pct_rank,
        |  floor(cume_dist() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal, c_custkey) * 1e6 + 0.5) / 1e6 AS cume
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q54_full_outer" ->
      """WITH od AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |ed AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT COALESCE(od.day, ed.day) AS day, n_orders, n_events
        |FROM od FULL OUTER JOIN ed ON od.day = ed.day
        |ORDER BY day""".stripMargin,
    "q55_map_funcs" ->
      """WITH c AS (
        |  SELECT o_orderpriority, o_orderstatus,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority,
        |  CAST(COUNT(*) AS INT) AS n_statuses,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        |  CAST(COALESCE(SUM(cnt) FILTER (WHERE o_orderstatus = 'F'), 0)
        |    AS BIGINT) AS n_finished,
        |  CAST(COALESCE(SUM(cnt * 2) FILTER (WHERE o_orderstatus = 'O'), 0)
        |    AS BIGINT) AS n_open_x2
        |FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q56_conditional_agg" ->
      """SELECT n_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_negative,
        |  bool_and(c_acctbal > -1000) AS all_above_floor,
        |  bool_or(c_acctbal > 9000) AS any_rich,
        |  floor(count_if(c_acctbal < 0) / COUNT(*) * 1e4 + 0.5) / 1e4
        |    AS neg_share
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q57_argmax" ->
      """SELECT l_returnflag,
        |  arg_max(l_orderkey,
        |    CAST(round(l_extendedprice*100) AS BIGINT)*10000000 + l_orderkey)
        |    AS max_price_order,
        |  arg_min(l_orderkey,
        |    CAST(round(l_extendedprice*100) AS BIGINT)*10000000 + l_orderkey)
        |    AS min_price_order,
        |  MAX(l_extendedprice) AS max_price,
        |  MIN(l_extendedprice) AS min_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q58_try_arith" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count_if(l_quantity > 49) AS BIGINT) AS n_maxed,
        |  CAST(count_if(l_quantity < 2) AS BIGINT) AS n_single,
        |  floor(count_if(l_quantity > 49) /
        |    NULLIF(count_if(l_quantity < 2), 0) * 1e6 + 0.5) / 1e6
        |    AS maxed_per_single
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q59_multi_distinct" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q60_median" ->
      """SELECT l_returnflag, l_linestatus,
        |  median(l_quantity) AS median_qty,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity)
        |    AS avg_qty,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  floor((CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
        |    / COUNT(l_quantity) - median(l_quantity)) * 1e6 + 0.5) / 1e6
        |    AS skew_gap
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q61_bitwise" ->
      """SELECT l_returnflag,
        |  CAST(bit_and(l_partkey) AS BIGINT) AS mask_and,
        |  CAST(bit_or(l_partkey) AS BIGINT) AS mask_or,
        |  CAST(bit_xor(l_partkey) AS BIGINT) AS mask_xor,
        |  CAST(bit_xor(l_orderkey * 2654435761 % 4294967296) AS BIGINT)
        |    AS orderset_checksum
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
