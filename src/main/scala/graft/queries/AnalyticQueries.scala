package graft.queries

import graft.Checkpoints.Truncate
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic operators beyond the reference surface: as-of join, range
  * join, pivot, cube, exact percentiles. Each is expressed in the shape
  * that survives 100 TB (no cross joins, no driver loops) and carries a
  * DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  */
object AnalyticQueries {

  /** As-of join — for every event, the most recent order (by o_orderdate
    * ≤ event ts) of the same customer. Spark has no ASOF JOIN operator;
    * the scale-correct composition is union-tag + one window pass:
    * tag both sides, sort each user's timeline once, and carry the last
    * seen order key forward with `last(_, ignoreNulls)`. ONE shuffle on
    * the join key — never a per-event subquery or an inequality join.
    * Timestamp ties resolve INSIDE the window ordering (ascending order
    * key → `last()` sees the max-key order at the latest time ≤ ts), so
    * no dedup pre-aggregate is needed — the whole as-of join is ONE
    * shuffle. (DuckDB's ASOF picks an arbitrary winner under ties, so the
    * oracle dedups its right side to the same max-key row.) */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"))
    val ords = Tables.orders(s, d)
      .select(col("o_custkey").as("user_id"),
        // o_orderdate is TIMESTAMP_NTZ; the session timezone is pinned
        // to UTC, so this cast matches DuckDB's naive epoch_us.
        unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
        col("o_orderkey").as("last_orderkey"))
    // side 0 (orders) sorts before side 1 (events) at equal timestamps —
    // the `o_orderdate <= ts` inclusive bound.
    val tagged = ords
      .withColumn("side", lit(0))
      .withColumn("event_id", lit(null).cast("long"))
      .unionByName(ev
        .withColumn("side", lit(1))
        .withColumn("last_orderkey", lit(null).cast("long")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("side"), col("last_orderkey"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("lk", last(col("last_orderkey"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("user_id"), col("event_id"), col("t_us").as("ts_us"),
        col("lk").as("last_orderkey"))
  }

  /** Range (interval) join — orders against overlapping price bands
    * [k·25000, k·25000 + 50000). The scale shape is bin-bucketing: map
    * each order to the ≤ 2 bins its price can overlap (`explode`), then a
    * plain EQUI-join on bin id + a residual range filter — never an
    * inequality join's cross-product. */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val bands = s.range(0, 20).select(
      col("id").cast("int").as("band_id"),
      (col("id") * 25000.0).as("lo"),
      (col("id") * 25000.0 + 50000.0).as("hi"))
    Tables.orders(s, d)
      .withColumn("b", floor(col("o_totalprice") / 25000.0).cast("int"))
      .select(col("o_totalprice"),
        explode(array(col("b") - 1, col("b"))).as("band_id"))
      .join(bands, Seq("band_id"))
      .filter(col("o_totalprice") >= col("lo") &&
        col("o_totalprice") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
  }

  /** PIVOT — order counts per priority, one column per status. Explicit
    * pivot values keep the plan a single pass (no values-discovery job). */
  def pivotAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  /** CUBE — all grouping-set combinations of (status, priority) in one
    * shuffle (completes the rollup in RefQueries). */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))

  /** Skew-safe distinct count — count(DISTINCT l_suppkey) per return
    * flag, two-stage over a salt derived FROM THE DISTINCT COLUMN: the
    * per-salt distinct sets are disjoint by construction, so the partial
    * counts sum exactly. A hot group's distinct work spreads over 16
    * reducers instead of landing on one (the generic skew recipe for
    * any group-by whose per-group state is decomposable). The salt is
    * deterministic (`pmod`, not `rand()`), so task retries and the
    * oracle agree. */
  def distinctSalted(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), pmod(col("l_suppkey"), lit(16)).as("salt"))
      .agg(count_distinct(col("l_suppkey")).as("part"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("part")).as("n_supp"))

  /** RANGE-frame window — per customer, order count and spend within the
    * trailing 30 days of each order. The frame is VALUE-based (days since
    * epoch), so results are deterministic under same-day ties — unlike a
    * ROWS frame — and the whole query is one shuffle + one sorted pass. */
  def windowRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("d", unix_date(col("o_orderdate").cast("date")))
      .withColumn("n_30d", count(lit(1)).over(w))
      .withColumn("spend_30d", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_orderkey"), col("o_custkey"), col("d"),
        col("n_30d"), col("spend_30d"))
  }

  /** GROUPING SETS — the general grouping-set form (rollup and cube are
    * its specializations): per-status totals and per-priority totals in
    * ONE shuffle over an Expand, instead of two separate aggregation jobs.
    * Uses the Dataset `groupingSets` API directly — no session-global temp
    * view, so concurrent callers share no mutable catalog state. */
  def groupingSets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))

  /** JSON extraction — parse the events' `props` JSON payload with a
    * path expression and aggregate the extracted field. `get_json_object`
    * is a codegen'd scalar op; at scale JSON parsing stays a narrow
    * per-row transform ahead of the one aggregation shuffle. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))

  /** INTERSECT-distinct — customers who placed an order AND are in the
    * BUILDING segment (completes the set-op family with except/union). */
  def intersectKeys(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      .intersect(Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey")))

  /** Scalar-subquery filter — orders above the global average price.
    * The scalar aggregate is computed once and broadcast into the filter
    * (a 1-row cross join), so the fact table streams through unshuffled
    * until the final group-by. The threshold is rounded to 2 decimals so
    * both engines compare against the identical constant. */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val avgP = o.agg(round(avg(col("o_totalprice")), 2).as("ap"))
    o.join(broadcast(avgP))
      .filter(col("o_totalprice") > col("ap"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
  }

  /** Exact linear-interpolation percentiles per group (Spark `percentile`
    * ≡ DuckDB `quantile_cont`). Quantity is whole-valued so the
    * interpolation arithmetic is exact in double on both engines.
    *
    * SCALE WARNING: Spark's exact `percentile` is a
    * TypedImperativeAggregate that buffers EVERY value of a group in one
    * reducer — with 3 `l_returnflag` groups that is N/3 doubles in one
    * task at 100 TB (OOM, not slow). This query is kept for reference
    * parity at fixture scale; the 100 TB path for a bounded-domain column
    * is [[percentilesBounded]] (identical results, O(domain) state). */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("round(percentile(l_quantity, 0.25), 4)").as("q25"),
        expr("round(percentile(l_quantity, 0.5), 4)").as("q50"),
        expr("round(percentile(l_quantity, 0.75), 4)").as("q75"),
        expr("round(percentile(l_extendedprice, 0.5), 4)").as("med_price"))

  /** Offset window functions (lag/lead/first_value) over each customer's
    * order history — previous/next order price, the customer's first
    * order price so far, and days since the previous order. Completes
    * the window family (ranking: `windowRank`; running frames:
    * `windowRunning`/`windowRange`; offsets: here). ONE shuffle on
    * o_custkey, one sorted pass serves all four functions (same window
    * spec ⇒ Spark plans a single Window operator); the
    * (o_orderdate, o_orderkey) ordering is a total order, so every
    * offset is deterministic. */
  def windowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_price"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .as("days_since_prev"))
  }

  /** Time-series gap filling (daily resample): each user's event
    * timeline densified to a continuous daily grid between their first
    * and last active day, zero-filling silent days — the standard
    * pre-step for rolling/trend features over sparse activity data.
    *
    * Scale shape: one (user, day) count aggregate; the grid derives from
    * a USER-level min/max aggregate (one row per user) and explodes to
    * exactly the output size (per-user day span — linear in the result,
    * not in events); the fill join is an equi-join on (user, day). Every
    * key includes user_id — no hot partition. Restricted to
    * user_id < 100 to keep the fixture result bounded. */
  def eventsGapfill(s: SparkSession, d: String): DataFrame =
    gapfillDaily(
      Tables.events(s, d).filter(col("user_id") < 100)
        .select(col("user_id"), to_date(col("ts")).as("day")),
      keyCol = "user_id", dayCol = "day")
      .withColumnRenamed("n_rows", "n_events")

  /** The general daily gap-fill operator behind [[eventsGapfill]]:
    * per `keyCol`, one row per day from that key's first to last `dayCol`
    * value, with the day's row count (`n_rows`, 0 on silent days) and a
    * `filled` flag. Library API — callable on any (key, date) frame. */
  def gapfillDaily(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(dayCol))
      .agg(count(lit(1)).as("n"))
    val grid = df.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("d0"), max(col(dayCol)).as("d1"))
      .select(col(keyCol),
        explode(expr("sequence(d0, d1, interval 1 day)")).as(dayCol))
    grid.join(counts, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        coalesce(col("n"), lit(0L)).as("n_rows"),
        col("n").isNull.as("filled"))
  }

  /** Rolling features over the gapfilled daily series — the
    * feature-engineering step [[eventsGapfill]] exists to serve:
    * trailing 7-day sum and mean of daily activity plus the
    * day-over-day delta, per user. The dense grid makes ROWS frames
    * correct (a silent day is a 0 row, not a hole), so `rows between 6
    * preceding` IS the calendar week — the reason to gapfill before
    * windowing. One extra window pass over the gapfilled relation
    * (user-keyed partitions, output-sized); the mean is windowed
    * int-sum ÷ int-count, one IEEE division both engines agree on. */
  def eventsRolling(s: SparkSession, d: String): DataFrame = {
    val base = gapfillDaily(
      Tables.events(s, d).filter(col("user_id") < 100)
        .select(col("user_id"), to_date(col("ts")).as("day")),
      keyCol = "user_id", dayCol = "day")
      .withColumnRenamed("n_rows", "n_events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val w7 = w.rowsBetween(-6, Window.currentRow)
    base.select(
      col("user_id"), col("day"), col("n_events"),
      sum(col("n_events")).over(w7).as("sum7"),
      round(sum(col("n_events")).over(w7) /
        count(lit(1)).over(w7).cast("double"), 6).as("avg7"),
      (col("n_events") - lag(col("n_events"), 1).over(w)).as("delta"))
  }

  /** ANALYZE-style table profile over representative lineitem columns —
    * the per-column form: 4 pruned columns of a 16-column table is
    * exactly its sweet spot (measured 3× faster here than the one-pass
    * Expand, whose row amplification through the 4-way exact-distinct
    * shuffle outweighs the single scan at this narrow-profile shape).
    * See [[profileOf]] / [[profileOnePassOf]] for the trade. */
  def tableProfile(s: SparkSession, d: String): DataFrame =
    profileOf(Tables.lineitem(s, d),
      Seq("l_quantity", "l_discount", "l_shipdate", "l_returnflag"))

  /** The column-statistics profiler behind [[tableProfile]] — library
    * API: per column, row count, null count, EXACT distinct count, and
    * min/max rendered as strings (one uniform schema across column
    * types). The `ANALYZE TABLE`-shaped pass a planner, data-quality
    * monitor, or migration diff runs first on any new table.
    *
    * Scale shape: one narrow aggregate pass per column (each scan reads
    * ONLY its column — parquet column pruning makes the per-column cost
    * that column's bytes, not the table's, and there is NO row
    * amplification). The right form for a narrow profile of a wide
    * table; for profiling many columns at once see
    * [[profileOnePassOf]]. */
  def profileOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_.unionByName(_))
  }

  /** [[profileOf]]'s one-scan sibling: ALL columns' stats from a single
    * aggregate over a single table scan, then an output-sized unpivot
    * (explode of one struct per column) back to the same one-row-per-
    * column schema. Bit-identical results to [[profileOf]].
    *
    * Scale shape: Catalyst plans the k exact `count(DISTINCT c)`s as ONE
    * scan + an Expand (k+1 row amplification through the partial
    * aggregate, all map-side combinable). One pass over the table's
    * bytes beats k per-column scans whenever the profiled columns are
    * most of the table (the ANALYZE-everything case); prefer
    * [[profileOf]] when profiling a few columns of a wide table, where
    * per-column pruned scans read less. Exact NDV is the
    * oracle-checkable choice; at 100 TB `approx_count_distinct` or the
    * deterministic HLL sketch (X57) drops the Expand entirely — the
    * output contract is identical. */
  def profileOnePassOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col("n_rows"),
          col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
          col(s"mn_$c").as("min_s"), col(s"mx_$c").as("max_s"))
      }: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_s"), col("p.max_s"))
  }

  /** Cohort retention (the day-N retention matrix): users are cohorted by
    * their FIRST active day; each later active day contributes to cell
    * (cohort_day, day_offset). The classic growth-analytics readout —
    * row = a cohort, column = days since acquisition, value = users still
    * active.
    *
    * Scale shape: one distinct (user, day) projection feeds BOTH the
    * cohort min-aggregate and the activity side, joined back on user_id —
    * two shuffles total, every key includes user_id (no hot partition),
    * and the final matrix aggregate is output-sized (cohorts × offsets).
    * Never a self-join of raw events against raw events. */
  def eventsRetention(s: SparkSession, d: String): DataFrame =
    retentionOf(
      Tables.events(s, d).select(col("user_id"), to_date(col("ts")).as("day")),
      keyCol = "user_id", dayCol = "day")

  /** The general cohort-retention operator behind [[eventsRetention]] —
    * library API on any (key, date) activity frame: returns one row per
    * (cohort_day, day_offset) with the count of keys whose first active
    * day is `cohort_day` and who were active `day_offset` days later.
    * `day_offset = 0` rows recover each cohort's size. */
  def retentionOf(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val days = df.select(col(keyCol), col(dayCol)).distinct()
    val cohorts = days.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("cohort_day"))
    days.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort_day"),
        datediff(col(dayCol), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Funnel analysis (view → click → purchase): per-stage user counts
    * where stage k only counts events AT OR AFTER the user's stage-k−1
    * completion time — the ordered-sequence semantics (a click before
    * the first view does not advance the funnel).
    *
    * Scale shape: one conditional min-aggregate per stage, chained by
    * user_id equi-joins (stage k's relation is ≤ stage k−1's — funnel
    * attrition shrinks every step), then a tiny tagged union + count.
    * Deliberately NOT a per-user event-array collect (which buffers a
    * user's whole history in one aggregation buffer) and NOT a window
    * over the event stream. */
  def eventsFunnel(s: SparkSession, d: String): DataFrame =
    funnelOf(
      Tables.events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t")),
      keyCol = "user_id", stageCol = "event_type", timeCol = "t",
      stages = Seq("view", "click", "purchase"))

  /** The general k-stage ordered funnel behind [[eventsFunnel]] — library
    * API: `stages` is the ordered list of `stageCol` values; stage k only
    * counts events at or after the key's stage-k−1 completion time
    * (`timeCol` must be totally ordered — epoch micros, a date, …).
    * Returns one row per stage: `stage` (1-based), `stage_name`,
    * `n_users`. Counts are monotonically non-increasing by construction
    * (stage k's relation is an equi-join against stage k−1's — funnel
    * attrition shrinks every step); plan shape as documented on
    * [[eventsFunnel]]: one conditional min-aggregate per stage chained by
    * key equi-joins, then a tiny tagged union + count. */
  def funnelOf(events: DataFrame, keyCol: String, stageCol: String,
      timeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = events.select(col(keyCol).as("__k"), col(stageCol).as("__s"),
      col(timeCol).as("__t"))
    // firsts(k) = per-key completion time of stage k (min qualifying __t)
    val firsts = stages.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, (name, i)) =>
        val base = e.filter(col("__s") === name)
        val qualified =
          if (i == 0) base
          else base.join(acc.last.select(col("__k"),
              col("__tk").as("__prev")), Seq("__k"))
            .filter(col("__t") >= col("__prev"))
        acc :+ qualified.groupBy(col("__k")).agg(min(col("__t")).as("__tk"))
      }
    firsts.zipWithIndex
      .map { case (f, i) => f.select(col("__k"), lit(i + 1).as("stage")) }
      .reduce(_.unionByName(_))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("stage_name",
        element_at(array(stages.map(lit): _*), col("stage")))
      .select(col("stage"), col("stage_name"), col("n_users"))
  }

  /** Equal-width histogram (20 bins over the global [min, max]) of
    * l_extendedprice — the profiling primitive behind binning, NDV
    * estimation, and range-partitioning decisions. Shape: one 1-row
    * min/max aggregate broadcast against the streaming scan, a narrow
    * codegen'd bin computation, one 20-group aggregate — never a sort,
    * never per-value state. `bin = least(19, floor((x−mn)/w))` where
    * `w = (mx−mn)/20`: each step is a single correctly-rounded IEEE op
    * evaluated in the same order by both engines, so bin assignment can
    * never disagree. The share division normalizes over a 20-row window
    * — constant-size, driver-safe. */
  def histogram(s: SparkSession, d: String): DataFrame =
    histogramOf(Tables.lineitem(s, d), "l_extendedprice", bins = 20)

  /** The general equal-width histogram behind [[histogram]]: `bins`
    * buckets of `valCol` over its global [min, max]. Library API —
    * callable on any frame; plan shape as documented on [[histogram]]. */
  def histogramOf(df: DataFrame, valCol: String, bins: Int): DataFrame = {
    require(bins > 0)
    // The global [min, max] is collected ONCE as two doubles (a 1-row
    // aggregate — the same driver-safe metadata contract as a broadcast
    // variable) and injected as literals, so the input is scanned exactly
    // twice (stats pass + binning pass) instead of three times via two
    // cross-joined copies of the aggregate.
    val mmRow = df.agg(min(col(valCol)).cast("double").as("mn"),
      max(col(valCol)).cast("double").as("mx")).head()
    val (mn, mx) =
      if (mmRow.isNullAt(0)) (lit(null).cast("double"), lit(null).cast("double"))
      else (lit(mmRow.getDouble(0)), lit(mmRow.getDouble(1)))
    val binned = df
      .select(col(valCol).as("x"))
      // mx = mn (all values equal) would divide 0/0 into NaN, which the
      // two engines cast differently — a single degenerate bin 0 instead
      .withColumn("bin",
        when(mx === mn, lit(0L))
          .otherwise(least(lit(bins - 1L),
            floor((col("x") - mn) / ((mx - mn) / bins.toDouble))))
          .cast("bigint"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    binned
      .select(col("bin"),
        round(mn + col("bin") * ((mx - mn) / bins), 2).as("bin_lo"),
        round(mn + (col("bin") + 1) * ((mx - mn) / bins), 2).as("bin_hi"),
        col("n"),
        round(col("n") / sum(col("n")).over(Window.partitionBy()), 4)
          .as("frac"))
  }

  /** Scale-safe EXACT percentiles for a bounded-domain column — the
    * 100 TB replacement for the value-buffering `percentile` aggregate.
    * `l_quantity` takes 50 distinct whole values, so the exact
    * interpolated percentile is computable from a count-by-value
    * aggregate (per-group state = O(domain), map-side combinable) plus a
    * cumulative pass over the TINY (group × domain) result:
    * rank h = p·(n−1); the values at ranks ⌊h⌋/⌈h⌉ fall out of the
    * cumulative counts; linear interpolation between them is exactly
    * `percentile`'s / DuckDB `quantile_cont`'s formula. The windows run
    * over ≤ |groups|·|domain| rows — driver-safe at any corpus size.
    * p ∈ {0.25, 0.5, 0.75} are exact binary fractions, so h = p·(n−1) is
    * exact in double and both engines agree bitwise. */
  def percentilesBounded(s: SparkSession, d: String): DataFrame =
    boundedPercentiles(Tables.lineitem(s, d), "l_returnflag", "l_quantity",
      Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75"))

  /** The general bounded-domain exact-percentile operator behind
    * [[percentilesBounded]]: linear-interpolation percentiles of
    * `valCol` per `groupCol` computed from a count-by-value aggregate —
    * identical results to Spark's `percentile` (proven for arbitrary
    * inputs by BoundedPercentilesPropsSpec) with O(domain) state instead
    * of O(rows) buffering. */
  def boundedPercentiles(df: org.apache.spark.sql.DataFrame,
      groupCol: String, valCol: String,
      qs: Seq[(Double, String)]): DataFrame = {
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val cum = df
      .groupBy(col(groupCol), col(valCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val aggs = qs.flatMap { case (p, nm) =>
      Seq(
        min(when(col("cum") > floor(lit(p) * (col("n") - 1).cast("double")),
          col("v"))).as(s"${nm}_lo"),
        min(when(col("cum") > ceil(lit(p) * (col("n") - 1).cast("double")),
          col("v"))).as(s"${nm}_hi"),
        min(lit(p) * (col("n") - 1).cast("double")).as(s"${nm}_h"))
    }
    cum.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: qs.map { case (_, nm) =>
        round(col(s"${nm}_lo") +
          (col(s"${nm}_h") - floor(col(s"${nm}_h"))) *
            (col(s"${nm}_hi") - col(s"${nm}_lo")), 4).as(nm)
      }: _*)
  }

  // ---- skew-safe joins ----------------------------------------------------

  /** Skew-safe equi-join (the join-side companion to [[distinctSalted]]
    * and the remedy [[skewOf]] diagnoses for): each LEFT row gets one
    * of `salts` salt values, each RIGHT row is replicated across ALL
    * salts, and the join runs on (key, salt) — a hot key's rows spread
    * over `salts` reducers instead of one. The salt assignment may be
    * any value in range (every choice matches exactly one replica), so
    * correctness is partitioning-independent. Right-side replication
    * costs |right|×salts — use when the right side is the smaller
    * relation but too big to broadcast and AQE's size-based skew split
    * doesn't trigger (e.g. the skew is downstream of this join's
    * output). Inner and left joins only: replication would break
    * right/full-outer multiplicity. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be positive: $salts")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val l = left.withColumn("__salt",
      floor(rand(42) * salts).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  // ---- sequence analytics: Markov transitions -----------------------------

  /** First-order Markov transition matrix over each user's event
    * sequence: counts and probabilities of event_type → next event_type
    * — the behavioral-model summary behind next-action prediction and
    * funnel-shape sanity checks.
    *
    * Shape: one lag window per user (tie-free order: ts, then the
    * unique event_id — both engines sequence identically), one
    * (prev, next) count aggregate (types² rows), totals joined back
    * broadcast. The probability is a single integer÷integer IEEE
    * division both engines evaluate on identical operands. */
  def eventsMarkov(s: SparkSession, d: String): DataFrame =
    markovOf(
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id")),
      keyCol = "user_id", stateCol = "event_type",
      orderCols = Seq("ts", "event_id"))

  /** The general transition-matrix operator behind [[eventsMarkov]] —
    * library API: per `keyCol` sequence (ordered tie-free by
    * `orderCols`), count state→state transitions and their per-source
    * probabilities. */
  def markovOf(df: DataFrame, keyCol: String, stateCol: String,
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
    val c = df
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_state"),
        col(stateCol).as("next_state"))
      .agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("prev_state"))
      .agg(sum(col("n")).as("tot"))
    c.join(broadcast(tot), Seq("prev_state"))
      .select(col("prev_state"), col("next_state"), col("n"),
        round(col("n") / col("tot").cast("double"), 6).as("p"))
  }

  // ---- declarative expectations -------------------------------------------

  /** DLT-style expectations report over lineitem: every rule evaluated
    * in ONE pass as conditional-sum aggregates (see
    * [[graft.ingest.Validation.expectationsOf]]); one row per rule with
    * total, failures and failure fraction — the per-batch numbers a
    * pipeline monitors. Rules deliberately mix always-pass invariants
    * with thresholds the fixture violates, so both outcomes are
    * hash-checked. */
  def expectations(s: SparkSession, d: String): DataFrame =
    graft.ingest.Validation.expectationsOf(
      Tables.lineitem(s, d), Seq(
        "quantity_positive" -> (col("l_quantity") > 0),
        "quantity_under_41" -> (col("l_quantity") <= 41),
        "discount_in_range" -> col("l_discount").between(0, 0.05),
        "shipdate_present" -> col("l_shipdate").isNotNull))

  // ---- key-skew profiling -------------------------------------------------

  /** Hot-key profile of lineitem's supplier key — the diagnostic you
    * run BEFORE a big join to decide whether a key needs salting
    * ([[distinctSalted]]) or an AQE skew split: top keys by row count
    * with each key's share and the cumulative share of the head. */
  def skewProfile(s: SparkSession, d: String): DataFrame =
    skewOf(Tables.lineitem(s, d), "l_suppkey", topK = 20)

  /** The general hot-key profiler behind [[skewProfile]]: top-`topK`
    * values of `keyCol` by count, with share of total rows and
    * cumulative share (tie-free order: count desc, then key). The
    * count aggregate is map-side combinable; total is the SAME relation
    * re-aggregated (tiny — distinct keys), the top-k is a
    * TakeOrdered, and the cumulative window runs over k rows. */
  def skewOf(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("tot"))
    val top = counts
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
    val wCum = Window.orderBy(col("n").desc, col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("tot").cast("double"), 6))
      .withColumn("cum_share",
        round(sum(col("n")).over(wCum) / col("tot").cast("double"), 6))
      .select(col("key"), col("n"), col("share"), col("cum_share"))
  }

  // ---- robust anomaly detection -------------------------------------------

  /** Robust daily-volume anomaly detection: days whose event count sits
    * more than `k`×MAD from that event type's median daily count — the
    * median/MAD outlier rule (robust to the outliers themselves, unlike
    * mean/stddev z-scores where one spike inflates its own yardstick).
    *
    * Determinism across engines: daily counts are integers, so the
    * median is a half-integer, absolute deviations are half-integers,
    * and the MAD is a quarter-integer — all exact binary fractions that
    * double represents exactly; `k`×MAD and the comparison are then
    * single correctly-rounded IEEE ops both engines evaluate
    * identically. No epsilon, no hash risk. */
  def eventsAnomaly(s: SparkSession, d: String): DataFrame =
    anomalyOf(
      Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day")),
      keyCol = "event_type", dayCol = "day", k = 2.0)

  /** The general median/MAD anomaly operator behind [[eventsAnomaly]] —
    * library API over any (key, day) event frame; returns the flagged
    * days with their count, median and MAD. `percentile` here buffers
    * per-group values, but its input is the (key, day) COUNT relation —
    * bounded by keys × days, not by corpus rows — so the buffering is
    * scale-safe by construction (same argument as [[profileOf]]'s
    * exact NDV; swap in [[boundedPercentiles]] if the day axis ever
    * stops being bounded). */
  def anomalyOf(df: DataFrame, keyCol: String, dayCol: String,
      k: Double): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(dayCol))
      .agg(count(lit(1)).as("n"))
    val med = counts.groupBy(col(keyCol))
      .agg(expr("percentile(n, 0.5)").as("med"))
    val dev = counts.join(broadcast(med), Seq(keyCol))
      .withColumn("adev", abs(col("n") - col("med")))
    val mad = dev.groupBy(col(keyCol))
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq(keyCol))
      .filter(col("adev") > lit(k) * col("mad"))
      .select(col(keyCol), col(dayCol), col("n"), col("med"), col("mad"))
  }

  // ---- bounded-domain distribution operators ------------------------------

  /** Equi-DEPTH histogram (X72 is equi-width): 5 buckets of ~equal row
    * count over l_quantity, built from the count-by-value relation —
    * the binning rule is `bucket(v) = (rows-before-v × B) div n`, pure
    * integer arithmetic on exact cumulative counts, so bucket edges are
    * engine-identical with no percentile interpolation at all. Same
    * O(domain) scale stance as [[percentilesBounded]]: per-value counts
    * are map-side combinable; every later pass runs over the tiny
    * (domain-sized) relation. */
  def histogramEqd(s: SparkSession, d: String): DataFrame =
    equiDepthOf(Tables.lineitem(s, d), "l_quantity", buckets = 5)

  /** The general equi-depth operator behind [[histogramEqd]]. */
  def equiDepthOf(df: DataFrame, valCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1)
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.groupBy(col(valCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy()))
    cum
      // integer floor-division, NOT double `/`+cast: a correctly-rounded
      // double quotient can land exactly ON an integer the true ratio
      // sits just below, flipping a bucket edge vs the oracle's `//`
      .withColumn("bucket",
        expr(s"((cum - cnt) * $buckets) div n"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("cnt")).as("n_rows"))
  }

  /** IQR winsorization summary: per return flag, clip l_quantity to
    * [q25 − 1.5·IQR, q75 + 1.5·IQR] and report how many rows clipped
    * at each end plus the winsorized sum — the outlier-capping step of
    * numeric feature prep. Quartiles on integer counts are
    * quarter-exact binary fractions ([[boundedPercentiles]] machinery),
    * 1.5·IQR is exact, and the winsorized sum adds only exact binary
    * values well under 2^52 — order-independent, no float hash risk. */
  def winsorize(s: SparkSession, d: String): DataFrame = {
    val qs = boundedPercentiles(Tables.lineitem(s, d), "l_returnflag",
      "l_quantity", Seq(0.25 -> "q25", 0.75 -> "q75"))
      .select(col("l_returnflag"),
        (col("q25") - (col("q75") - col("q25")) * 1.5).as("lo"),
        (col("q75") + (col("q75") - col("q25")) * 1.5).as("hi"))
    Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity"))
      .join(broadcast(qs), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_quantity") < col("lo"), 1L).otherwise(0L))
          .as("n_lo_clipped"),
        sum(when(col("l_quantity") > col("hi"), 1L).otherwise(0L))
          .as("n_hi_clipped"),
        round(sum(greatest(col("lo"),
          least(col("hi"), col("l_quantity")))), 2).as("sum_winsorized"),
        count(lit(1)).as("n_rows"))
  }

  // ---- global row indexing ------------------------------------------------

  /** Deterministic 0-based global row index in the total order of
    * `orderCols` — WITHOUT the single-partition funnel of the naive
    * `row_number().over(Window.orderBy(...))` (which moves the whole
    * corpus through ONE task — the classic scale-killer for "add an id
    * column"). `orderCols` must be a TOTAL order (unique key) or the
    * index assignment within ties is partitioning-dependent.
    *
    * Shape: range-repartition on the order key (a distributed sort —
    * equal keys land in one partition, so ranks never straddle a
    * boundary), localCheckpoint so both passes see identical partitions,
    * then (1) per-partition counts — partition-count-sized driver
    * metadata — fold into start offsets, and (2) a per-PARTITION rank
    * window (no global ordering) plus the broadcast offset. Two narrow
    * passes, one range shuffle, no task ever sees more than its
    * partition. */
  def globalIndexOf(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val oc = orderCols.map(col)
    val sorted = df.repartitionByRange(oc: _*)
      .sortWithinPartitions(oc: _*)
      .withColumn("__pid", spark_partition_id())
      .truncated
    val counts = sorted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = sorted.sparkSession
      .createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(oc: _*)
    val out = sorted
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("idx", col("__off") + row_number().over(w) - 1)
      .drop("__pid", "__off")
      .truncated
    graft.Checkpoints.release(sorted)
    out
  }

  /** `q_global_index`: [[globalIndexOf]] over lineitem's (orderkey,
    * linenumber) unique key — oracle = the very single-partition
    * row_number the operator exists to avoid (fine in DuckDB, fatal at
    * 100 TB in Spark). */
  def globalIndex(s: SparkSession, d: String): DataFrame =
    globalIndexOf(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      Seq("l_orderkey", "l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("idx"))

  val globalIndexOracle: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
              CAST(row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1
                   AS BIGINT) AS idx
       FROM lineitem ORDER BY idx"""

  // ---- iterative graph analytics: PageRank --------------------------------

  /** Fixed-point PageRank constants, shared by the Spark operator and the
    * generated DuckDB oracle so both engines run IDENTICAL integer
    * arithmetic: ranks are BIGINTs in units of 1/[[PrScale]], damping is
    * the exact rational [[PrDampNum]]/100, and every per-edge
    * contribution is an integer floor-division — integer sums are
    * order-independent, so partial aggregation order can never produce a
    * hash mismatch (the same trick as the X80 fixed-point centroids). */
  val PrScale = 10000000000L
  val PrDampNum = 85L
  val PrIters = 3
  val PrTopK = 20
  private val PrTeleport = PrScale * (100L - PrDampNum) / 100L

  /** PageRank over the co-purchase graph: parts are linked when they
    * appear in the same order (the "customers also bought" graph), and
    * rank finds the structurally central products — the link-analysis
    * flavor of product importance, vs [[RefQueries]]' pure revenue
    * top-k. Edge build is ONE equi-join on l_orderkey (the inequality
    * only filters the matched pairs); each of the [[PrIters]] rounds is
    * one edge-shuffle aggregate over the PAIR graph, never the fact
    * table. */
  def graphPagerank(s: SparkSession, d: String): DataFrame = {
    // NOT fanned (r16 A/B): keying the scan by l_orderkey before the
    // aggregate replaces the partial-aggregated shuffle (~order-count
    // sets) with a raw-row shuffle (|lineitem| rows) — measured 0.94×.
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    // Pair build as ONE orderkey aggregate + a narrow per-order pair
    // explode — not a lineitem self-join (two exchanges + a sort; ~2×
    // slower measured). Per-order state is the order's item list —
    // bounded by order size (≤7 in TPC-H shapes), safe at any corpus
    // scale. The inner filter emits ONLY a < b pairs, so the per-order
    // allocation is k(k-1)/2 structs, not k² then filtered — half the
    // young-gen churn of the generate stage. Cross-order duplicates
    // fall to pageRankOf's pair dedup.
    val pairs = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, x ->
           transform(filter(ps, y -> y > x), y -> struct(x AS a, y AS b))))"""
        )).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    pageRankOf(pairs, "a", "b", PrIters)
      .orderBy(col("rank_fp").desc, col("node"))
      .limit(PrTopK)
      .select(col("node").as("part_id"), col("degree"), col("rank_fp"))
  }

  /** The general PageRank operator behind [[graphPagerank]] — library
    * API: undirected edge list in (`aCol`, `bCol`; symmetrized
    * internally), one row per node out: `node`, `degree`, `rank_fp`
    * (fixed-point, 1.0 = [[PrScale]]). The classic unnormalized
    * formulation r' = (1−d) + d·Σ r(u)/deg(u) over in-neighbors, run
    * for a FIXED `iters` rounds in exact integer arithmetic (see
    * [[PrScale]]) so results are bit-reproducible across engines and
    * partitionings.
    *
    * Scale shape: the HALF-size (a < b) pair relation is deduped and
    * materialized once (localCheckpoint — the CC-loop discipline, so k
    * rounds nest k× neither the plan nor the upstream pair build); the
    * symmetric edge view is a narrow union over it, never stored. The
    * degree relation is a map-side-combinable aggregate (one node-count
    * shuffle — NOT a window over the 2|E| edge list, whose per-partition
    * sort was the old hot spot), materialized small. Each round first
    * computes the per-source contribution r/deg as a NODE-sized join,
    * then does exactly one edge-side join and one integer-sum
    * aggregate: the contribution and degree relations are
    * node-cardinality, so AQE broadcasts them while they fit (zero edge
    * shuffles per round at fixture scale — and the degree broadcast is
    * one ReusedExchange across all rounds, since every round references
    * the same checkpointed relation) and falls back to hash-partitioned
    * joins when the node set outgrows a broadcast — the 100 TB path
    * needs no code change. The driver never sees row data. Output is
    * materialized before the pinned inputs are released. */
  def pageRankOf(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"pageRankOf needs at least one iteration: $iters")
    // Pair dedup on the half-size relation: an aggregate, so map-side
    // partial dedup shrinks the shuffle below |pairs| when cross-order
    // duplicates exist (the window-based shape shuffled 2|E| rows and
    // sorted them; this moves ≤|E|/2 and sorts nothing).
    val ded = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .dropDuplicates(Seq("a", "b"))
      .truncated
    val sym = ded.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ded.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .truncated
    // `r` and the join keys below all derive from `deg`/`sym`, so every
    // join re-aliases its keys to fresh attributes (withColumnRenamed)
    // and joins by name — dataset-qualified refs would trip Spark's
    // ambiguous-self-join detection.
    val degK = deg.withColumnRenamed("src", "csrc")
    var r = deg.select(col("src").as("id")).withColumn("r", lit(PrScale))
    (1 to iters).foreach { _ =>
      // Per-source contribution r/deg is a NODE-sized join computed
      // before the edge list is touched, so each round does exactly one
      // edge-side join and one integer-sum aggregate.
      val contrib = r.join(degK, col("id") === col("csrc"))
        .select(col("csrc"), expr("r div d").as("c"))
      r = sym.join(contrib, col("src") === col("csrc"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("id"),
          (lit(PrTeleport) + expr(s"($PrDampNum * s) div 100")).as("r"))
    }
    val out = r.join(degK, col("id") === col("csrc"))
      .select(col("id").as("node"), col("d").as("degree"),
        col("r").as("rank_fp"))
      .truncated
    graft.Checkpoints.release(ded)
    graft.Checkpoints.release(deg)
    out
  }

  /** DuckDB oracle for [[graphPagerank]] — the identical integer
    * recurrence with the [[PrIters]] rounds unrolled as CTEs (DuckDB
    * `//` is floor division; every operand is positive, so it agrees
    * with Spark's `div` truncation). */
  def graphPagerankOracle: String = {
    val iterCtes = (1 to PrIters).map { k =>
      s"""r$k AS (SELECT e.dst AS id,
             CAST($PrTeleport + ($PrDampNum * SUM(p.r // d.d)) // 100
                  AS BIGINT) AS r
           FROM edges e JOIN r${k - 1} p ON e.src = p.id
           JOIN deg d ON e.src = d.src
           GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
          FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
           AND x.l_partkey < y.l_partkey),
        edges AS (SELECT a AS src, b AS dst FROM pairs
                  UNION ALL SELECT b, a FROM pairs),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
                FROM edges GROUP BY src),
        r0 AS (SELECT src AS id, CAST($PrScale AS BIGINT) AS r FROM deg),
        $iterCtes
        SELECT d.src AS part_id, d.d AS degree, r.r AS rank_fp
        FROM r$PrIters r JOIN deg d ON r.id = d.src
        ORDER BY rank_fp DESC, part_id LIMIT $PrTopK"""
  }

  // ---- iterative graph analytics: triangle counting -----------------------

  val TriTopK = 20

  /** Per-node triangle counts over the co-purchase graph (parts linked
    * when they share an order) — the local clustering signal: a part in
    * many triangles sits in a densely cross-purchased cluster, vs
    * [[graphPagerank]]'s global centrality. Top-[[TriTopK]] nodes by
    * triangle participation, with degree. */
  def graphTriangles(s: SparkSession, d: String): DataFrame = {
    // NOT fanned — same measured reasoning as [[graphPagerank]].
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, x ->
           transform(filter(ps, y -> y > x), y -> struct(x AS a, y AS b))))"""
        )).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    trianglesOf(pairs, "a", "b")
      .orderBy(col("n_triangles").desc, col("node"))
      .limit(TriTopK)
      .select(col("node").as("part_id"), col("degree"), col("n_triangles"))
  }

  /** Degree-ordered triangle counting (the node-iterator-minus kernel) —
    * library API: undirected edge list in (`aCol`, `bCol`), one row per
    * triangle-participating node out: `node`, `degree`, `n_triangles`.
    *
    * Scale shape: every undirected edge is ORIENTED from its
    * lexicographically-smaller (degree, node) endpoint to the larger, so
    * each node's out-neighborhood is O(√E) on ANY graph (arboricity
    * bound) — wedge generation is per-node quadratic only in OUT-degree,
    * never in raw degree: the celebrity node that breaks naive
    * node-iterator counting (k² wedges for a k-degree hub) fans its
    * edges OUT to higher-degree-ordered endpoints and generates almost
    * no wedges itself. Total wedge volume is O(E^1.5) worst-case — the
    * best known for exact counting — and each triangle materializes
    * exactly once (at its minimum-order apex). The close step is ONE
    * equi-join of wedges against the oriented half-size edge list on the
    * composite (v, w) key; per-node counts are one output-sized
    * aggregate. The dedup/orientation relations are checkpointed once
    * (the CC-loop discipline) and released after the output
    * materializes; the driver never sees row data. */
  def trianglesOf(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // Canonicalize to one row per undirected edge: order endpoints by id
    // (so (x,y) and (y,x) collapse), drop self-loops, dedup.
    val ded = pairs.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .dropDuplicates(Seq("a", "b"))
      .truncated
    val sym = ded.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ded.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .truncated
    // Orient each edge by the total (degree, node) order. Degrees are
    // node-sized relations — AQE broadcasts them against the edge list
    // while they fit and falls back to hash joins beyond that.
    val dA = deg.select(col("src").as("a"), col("d").as("da"))
    val dB = deg.select(col("src").as("b"), col("d").as("db"))
    val oriented = ded.join(dA, "a").join(dB, "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u"), col("e.v"))
      .truncated
    // Close step, EDGE-ITERATOR form (r15): a triangle {a≺b≺c} in the
    // (degree, node) total order holds oriented edges (a,b), (a,c),
    // (b,c) and is closed EXACTLY ONCE — at edge (a,b), by the common
    // oriented out-neighbor c ∈ N⁺(a) ∩ N⁺(b) (edges (a,c)/(b,c) close
    // nothing: b ∉ N⁺(c)). The per-edge intersection does the work the
    // r14 shape did by MATERIALIZING every wedge — Σ C(outdeg,2) rows
    // (41M at sf0.1 vs 1.2M edges) exploded, hash-probed and exploded
    // again 3× per triangle; here the same O(E^1.5) wedge volume is
    // walked INSIDE array_intersect (codegen, no intermediate rows) and
    // only true triangles surface. Out-degrees stay O(√E) by the
    // orientation (arboricity bound), so adjacency arrays are bounded
    // on ANY graph. The node-scale adjacency relation broadcasts while
    // the edge list fits comfortably (≤2M edges); beyond that both
    // joins fall back to hash joins whose shuffled bytes are the same
    // O(Σ outdeg²) the wedge relation itself would have been — the
    // 100 TB path, no code change. (The count is free: `oriented` is
    // checkpointed.)
    val adj = oriented.groupBy(col("u")).agg(collect_list(col("v")).as("ns"))
    val small = oriented.count() <= 2000000L
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val tris = oriented
      .join(maybeB(adj.select(col("u").as("__cu"), col("ns").as("__nsu"))),
        col("u") === col("__cu"))
      .join(maybeB(adj.select(col("u").as("__cv"), col("ns").as("__nsv"))),
        col("v") === col("__cv"))
      .select(col("u"), col("v"),
        explode(array_intersect(col("__nsu"), col("__nsv"))).as("w"))
    val counts = tris.select(explode(array(col("u"), col("v"), col("w")))
        .as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val out = counts
      .join(deg.select(col("src").as("node"), col("d").as("degree")), "node")
      .select(col("node"), col("degree"), col("n_triangles"))
      .truncated
    graft.Checkpoints.release(ded)
    graft.Checkpoints.release(deg)
    graft.Checkpoints.release(oriented)
    out
  }

  /** DuckDB oracle for [[graphTriangles]] — id-ordered brute-force
    * three-way join over the a<b pair relation (orientation changes the
    * enumeration order, never the triangle SET, so the id-ordered replay
    * and the degree-ordered kernel agree exactly). */
  def graphTrianglesOracle: String =
    s"""WITH pairs AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
          FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
           AND x.l_partkey < y.l_partkey),
        tri AS (SELECT p1.a AS x, p1.b AS y, p2.b AS z
                FROM pairs p1 JOIN pairs p2 ON p1.b = p2.a
                JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b),
        nodes AS (SELECT x AS node FROM tri
                  UNION ALL SELECT y FROM tri
                  UNION ALL SELECT z FROM tri),
        cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
                FROM nodes GROUP BY node),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree
                FROM (SELECT a AS src FROM pairs
                      UNION ALL SELECT b FROM pairs) GROUP BY src)
        SELECT c.node AS part_id, d.degree, c.n_triangles
        FROM cnt c JOIN deg d ON c.node = d.src
        ORDER BY n_triangles DESC, part_id LIMIT $TriTopK"""
}
