package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{Bounds, Matching}

/** Correctness-gate queries for the aggregation/window families
  * (SURVEY.md §2.5-§2.6) plus the report analytics (A3/A4/A6/W1/SO1/SO2).
  *
  * Floating-point discipline: sums over inexact doubles go through exact
  * DECIMAL(18,2) accumulation (order-insensitive) and come back as double;
  * l_quantity is integer-valued so plain double sums are exact.
  */
object AggQueries {

  /** A1: 10-minute tumbling-window GPS aggregation shape (reference
    * R/export.R:165-174 — floor_date to 10 min + group mean). The window
    * start is emitted as a formatted string for engine-stable compare.
    * Streaming-ready: the same expression works under readStream with a
    * watermark (see graft.streaming).
    */
  val a1Tumbling = Q("q_a1_tumbling_10min",
    (s, dir) => {
      val e = Tables.events(s, dir)
      e.groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
          col("event_type"), col("n"), col("min_value"), col("max_value"), col("sum_value"))
        .orderBy("bucket", "event_type")
    },
    Some("""SELECT STRFTIME(TIME_BUCKET(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
              event_type, COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** A2/W2: the non-reducing per-key count flag (reference
    * `group_by |> mutate(n() == 1)`, R/merge_trips.R:87-88) — standalone;
    * q_j8_match_1to1 uses it inside the 1:1 match.
    */
  val a2WindowFlag = Q("q_a2_window_count_flag",
    (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"), col("user_id"), to_date(col("ts")).as("day"))
        .withColumn("n_per_day",
          count(lit(1)).over(Window.partitionBy("user_id", "day")))
        .withColumn("unique_trip_per_day", col("n_per_day") === 1)
        .orderBy("event_id"),
    Some("""SELECT event_id, user_id, CAST(ts AS DATE) AS day,
              COUNT(*) OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS n_per_day,
              COUNT(*) OVER (PARTITION BY user_id, CAST(ts AS DATE)) = 1 AS unique_trip_per_day
            FROM events ORDER BY event_id"""))

  /** A3+SO1: group count with descending sort (reference qmd:56-63). */
  val a3GroupCount = Q("q_a3_group_count",
    (s, dir) =>
      Tables.orders(s, dir).groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("o_orderpriority")),
    Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
            GROUP BY 1 ORDER BY n DESC, o_orderpriority"""))

  /** A4+W1+SO2 — the report's catch-composition query re-expressed: total
    * weight per (district=nation, species=brand), top 10 per district
    * (reference qmd:102-123). l_quantity is integer-valued → exact sums.
    */
  val a4TopSpecies = Q("q_a4_w1_top_species",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      val p = Tables.part(s, dir).select("p_partkey", "p_brand")
      val joined = li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val totals = joined.groupBy(col("n_name").as("district"), col("p_brand").as("species"))
        .agg(sum(col("l_quantity")).as("tot_weight"))
      totals
        .withColumn("rank", row_number().over(
          Window.partitionBy("district").orderBy(col("tot_weight").desc, col("species").asc)))
        .filter(col("rank") <= 10)
        .orderBy("district", "rank")
    },
    Some("""WITH totals AS (
              SELECT n_name AS district, p_brand AS species, SUM(l_quantity) AS tot_weight
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN part ON l_partkey = p_partkey
              GROUP BY 1, 2)
            SELECT district, species, tot_weight,
              CAST(ROW_NUMBER() OVER (PARTITION BY district ORDER BY tot_weight DESC, species) AS INTEGER) AS rank
            FROM totals
            QUALIFY rank <= 10
            ORDER BY district, rank"""))

  /** A5 — the custom LocScaleB bounds aggregate (single-pass
    * TypedImperativeAggregate; reference univOutl formula, SURVEY.md A5).
    * Transcendental outputs rounded to 9 digits for engine-stable hashing.
    */
  val a5Bounds = Q("q_a5_locscaleb_bounds",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(Bounds.locscaleb(col("l_quantity"), 2.5, logt = true).as("b"))
        .select(col("l_returnflag"), col("b.n").as("n"),
          round(col("b.median"), 9).as("median"),
          round(col("b.mad"), 9).as("mad"),
          round(col("b.lower_low"), 9).as("lower_low"),
          round(col("b.upper_up"), 9).as("upper_up"))
        .orderBy("l_returnflag")
    },
    Some("""WITH x AS (
              SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS raw,
                     LN(1 + CAST(l_quantity AS DOUBLE)) AS t
              FROM lineitem WHERE l_quantity IS NOT NULL),
            med AS (
              SELECT g, COUNT(*) AS n, MEDIAN(raw) AS mraw, MEDIAN(t) AS mt,
                     MAX(CASE WHEN raw <> 0 THEN 1 ELSE 0 END) AS nz
              FROM x GROUP BY g),
            mads AS (
              SELECT x.g, MEDIAN(ABS(x.raw - med.mraw)) AS madraw,
                     MEDIAN(ABS(x.t - med.mt)) AS madt
              FROM x JOIN med ON x.g = med.g GROUP BY x.g)
            SELECT med.g AS l_returnflag, med.n AS n,
              ROUND(med.mt, 9) AS median,
              ROUND(1.4826 * mads.madt, 9) AS mad,
              CASE WHEN med.nz = 0 OR 1.4826 * mads.madraw <= 0 THEN NULL
                   ELSE ROUND(med.mt - 2.5 * 1.4826 * mads.madt, 9) END AS lower_low,
              CASE WHEN med.nz = 0 OR 1.4826 * mads.madraw <= 0 THEN NULL
                   ELSE ROUND(med.mt + 2.5 * 1.4826 * mads.madt, 9) END AS upper_up
            FROM med JOIN mads ON med.g = mads.g
            ORDER BY l_returnflag"""))

  /** A6/W3: non-reducing per-group mean via window (reference qmd:155-157).
    * l_quantity integer-valued → window avg exact in any order.
    */
  val a6WindowMean = Q("q_a6_window_mean",
    (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        avg(col("l_quantity")).over(Window.partitionBy("l_orderkey")).as("mean_qty"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
              AVG(l_quantity) OVER (PARTITION BY l_orderkey) AS mean_qty
            FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity"""))

  /** Session windows (gap-based sessionization) — the natural
    * trip-segmentation op for GPS point streams: consecutive events of a
    * key belong to one session while gaps stay under the threshold
    * (extension beyond the reference's fixed 10-min buckets, A1; the
    * streaming twin is `session_window` under `withWatermark`). Spark's
    * native `session_window` keeps this a single shuffle per key; the
    * DuckDB twin derives sessions relationally (lag → gap flag →
    * cumulative sum), which is also the scale-out fallback pattern for
    * engines without native session windows. Session end = last event +
    * gap (Spark semantics), mirrored in SQL.
    */
  val sessionWindow = Q("q_session_window_gap",
    (s, dir) => {
      val e = Tables.events(s, dir)
      e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },
    Some("""WITH e AS (
              SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
            flagged AS (
              SELECT user_id, ts, value,
                -- Spark sessions are [start, last+gap) with exclusive end:
                -- an event exactly `gap` after the previous one does NOT
                -- overlap and opens a new session, hence >=
                CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL '30 minutes' OR
                          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS new_session
              FROM e),
            sessions AS (
              SELECT user_id, ts, value,
                SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS session_id
              FROM flagged)
            SELECT user_id,
              STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              STRFTIME(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
              COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM sessions GROUP BY user_id, session_id
            ORDER BY user_id, session_start"""))

  /** A8/SO7: distinct (reference R/preprocessing.R:310, R/export.R:137). */
  val a8Distinct = Q("q_a8_distinct",
    (s, dir) =>
      Tables.lineitem(s, dir).select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
            ORDER BY l_returnflag, l_linestatus"""))

  /** ROLLUP subtotal lattice — the multi-level report shape (per
    * (flag, status), per flag, grand total) in one pass. `grouping_id()`
    * rides along both to disambiguate "null because subtotal" from a
    * null key and to give the ORDER BY a null-free sort prefix (Spark
    * sorts nulls first ascending, DuckDB last — sorting on gid+keys
    * avoids the divergence entirely). Decimal-exact sums, A1 discipline.
    */
  val aggRollup = Q("q_agg_rollup",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        // grouping_id() must be computed inside the rollup's agg — it is
        // an aggregate-context expression, not a post-hoc column
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
        .select(col("gid"), col("l_returnflag"), col("l_linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy("gid", "l_returnflag", "l_linestatus"),
    Some("""SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
              l_returnflag, l_linestatus,
              COUNT(*) AS n_rows,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY gid, l_returnflag, l_linestatus"""))

  /** Pivot (long → wide): per return flag, one column per line status.
    * Spark's `pivot` with EXPLICIT values — leaving values to be
    * discovered adds a distinct-scan job and makes the output schema
    * data-dependent, which no downstream contract (or oracle) can pin.
    * The oracle is the conditional-aggregation desugaring, which is
    * also exactly what Catalyst rewrites pivot into.
    */
  val aggPivot = Q("q_agg_pivot",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
              CAST(SUM(CASE WHEN l_linestatus = 'F'
                            THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
              CAST(SUM(CASE WHEN l_linestatus = 'O'
                            THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O
            FROM lineitem GROUP BY l_returnflag
            ORDER BY l_returnflag"""))

  /** CUBE over (status, priority) — the full 2^k subtotal lattice the
    * rollup gate's prefix hierarchy doesn't cover (a rollup never emits
    * the (·, priority) margin; a cube does). Same gid discipline as
    * `q_agg_rollup`: grouping_id disambiguates subtotal-null from a null
    * key and gives the sort a null-free prefix, sidestepping the
    * nulls-first/nulls-last divergence. Scale: one pass — Spark expands
    * the lattice map-side (Expand), so the shuffle carries 4× the rows
    * but there is still exactly ONE exchange, same as a plain groupBy.
    */
  val aggCube = Q("q_agg_cube",
    (s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_price"))
        .select(col("gid"), col("o_orderstatus"), col("o_orderpriority"),
          col("n_orders"), col("sum_price"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority"),
    Some("""SELECT GROUPING(o_orderstatus, o_orderpriority) AS gid,
              o_orderstatus, o_orderpriority,
              COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY gid, o_orderstatus, o_orderpriority"""))

  /** GROUPING SETS — the selective margins neither rollup's prefix
    * hierarchy nor cube's full lattice express: ONLY the per-status and
    * per-priority totals, no (status, priority) cells, no grand total.
    * Exercised through the SQL surface (`spark.sql` over a temp view —
    * the DataFrame API has no grouping-sets builder pre-3.4 style here)
    * with the same gid sort-prefix discipline as the rollup/cube gates.
    */
  val aggGroupingSets = Q("q_agg_grouping_sets",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
      s.sql("""SELECT grouping_id() AS gid, o_orderstatus, o_orderpriority,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
               FROM orders_gs
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
               ORDER BY gid, o_orderstatus, o_orderpriority""")
    },
    Some("""SELECT GROUPING(o_orderstatus, o_orderpriority) AS gid,
              o_orderstatus, o_orderpriority,
              COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
            ORDER BY gid, o_orderstatus, o_orderpriority"""))

  /** Bounded sliding window frame (ROWS BETWEEN 3 PRECEDING AND CURRENT
    * ROW) — the trailing-window smoothing shape A6's unbounded partition
    * mean doesn't cover. The frame ORDER includes event_id so frame
    * membership is total-ordered (ts ties would otherwise make the
    * frame, and the sum, nondeterministic); values sum as decimals.
    */
  val windowSlidingSum = Q("q_w_sliding_sum",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, dir).select(
        col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType).as("trailing_sum"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
              CAST(SUM(CAST(value AS DECIMAL(18,2)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
                AS trailing_sum
            FROM events ORDER BY event_id"""))

  def all: Seq[Q] = Seq(a1Tumbling, a2WindowFlag, a3GroupCount, a4TopSpecies,
    a5Bounds, a6WindowMean, a8Distinct, sessionWindow, aggRollup, aggPivot,
    aggCube, aggGroupingSets, windowSlidingSum)
}
