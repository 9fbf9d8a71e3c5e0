package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams: funnel conversion and cohort
  * retention — the two queries every product-analytics engine ships
  * (reference has no event analytics; beyond-reference per the builder
  * brief's events table).
  *
  * Scale shape: both operators reduce the event table to one row per
  * (user, stage) / (user, day) BEFORE any join, so every join input is
  * bounded by |users| × small, not |events|. All joins are equi-joins on
  * the user key and co-partition after the first shuffle (Spark reuses
  * the hash partitioning across the chained aggregates).
  */
object Behavior {

  /** Ordered-funnel stage times: for each user, the earliest time of
    * step i that occurs within `maxGapSec` AFTER their step i-1 time
    * (classic "strict order, bounded gap" funnel semantics, gap measured
    * between consecutive stage completions).
    *
    * Returns one row per user who completed at least stage 1, with a
    * nullable `t<i>` epoch-seconds column per stage.
    *
    * Each stage is one filtered aggregate (min over the user's qualifying
    * events) joined to the previous stage's result on the user key — a
    * left join so earlier-stage completers survive with null later
    * stages. At 100 TB: the per-stage aggregate does map-side partial
    * min; the join side is |users-who-reached-stage| rows.
    */
  def funnelTimes(events: DataFrame, userCol: String, tsSecCol: String,
                  typeCol: String, steps: Seq[String],
                  maxGapSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsSecCol)).as("t1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (prev, (step, i)) =>
      val tPrev = s"t$i"
      val tCur = s"t${i + 1}"
      val cur = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsSecCol))
        .join(prev.select(col(userCol), col(tPrev)), Seq(userCol))
        .filter(col(tsSecCol) >= col(tPrev) &&
                col(tsSecCol) <= col(tPrev) + maxGapSec)
        .groupBy(col(userCol))
        .agg(min(col(tsSecCol)).as(tCur))
      prev.join(cur, Seq(userCol), "left")
    }
  }

  /** Funnel summary: one row per stage with the user count that reached
    * it and the mean seconds from the previous stage (null for stage 1).
    *
    * The mean is exact-decimal gap sum → one IEEE double division by the
    * count — bit-identical on any engine regardless of row order.
    */
  def funnel(events: DataFrame, userCol: String, tsSecCol: String,
             typeCol: String, steps: Seq[String],
             maxGapSec: Long): DataFrame = {
    val times = funnelTimes(events, userCol, tsSecCol, typeCol, steps,
      maxGapSec)
    val perStage = steps.indices.map { i =>
      val t = s"t${i + 1}"
      val gapSum = if (i == 0) lit(null).cast("double")
        else sum((col(t) - col(s"t$i")).cast("decimal(18,2)")).cast("double")
      times.agg(count(col(t)).as("n_users"), gapSum.as("gap_sum"))
        .select(lit(i + 1).as("stage"), lit(steps(i)).as("step"),
          col("n_users"),
          when(col("n_users") > 0, col("gap_sum") / col("n_users"))
            .as("mean_gap_sec"))
    }
    perStage.reduce(_.union(_))
  }

  /** Gaps-and-islands activity streaks: per user, runs of CONSECUTIVE
    * active days (the classic `day − row_number` grouping — consecutive
    * days share one difference, a gap starts a new group). Output one
    * row per user: `n_active_days`, `n_streaks`, `longest_streak`, and
    * the start day of the (earliest) longest streak.
    *
    * Every window is partitioned by the user key — no global ordering
    * anywhere — and the input is first reduced to one row per
    * (user, active day), so the wide shuffle carries |users|×days-active
    * rows, not |events|. The "earliest longest" tie-break is
    * `max_by(−start)` over exact integers: deterministic on any engine
    * and any row order.
    */
  def streaks(events: DataFrame, userCol: String, dayCol: String): DataFrame = {
    val userDays = events.select(col(userCol), col(dayCol)).distinct()
    val w = Window.partitionBy(col(userCol)).orderBy(col(dayCol))
    userDays
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(userCol), (col(dayCol) - col("__rn")).as("__island"))
      .agg(count(lit(1)).as("__len"), min(col(dayCol)).as("__start"))
      .groupBy(col(userCol))
      .agg(sum(col("__len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("longest_streak"),
        // (len, −start) max picks the longest streak, earliest on ties
        max(struct(col("__len").as("l"), (-col("__start")).as("ns")))
          .as("__best"))
      .select(col(userCol), col("n_active_days"), col("n_streaks"),
        col("longest_streak"), (-col("__best.ns")).as("streak_start_day"))
  }

  /** Peak concurrency per key (the interval sweep / "rooms needed"
    * query): given intervals `[startCol, endCol)` with a grouping key,
    * the maximum number of simultaneously-open intervals and the
    * earliest instant that maximum is first reached.
    *
    * Sweep-line as relational ops: ±1 boundary events, PRE-AGGREGATED
    * to one net delta per (key, instant) — so the running-sum window
    * has a unique per-key order and no tie ambiguity — then a per-key
    * prefix sum and one aggregate. Two by-key windows, zero self-joins;
    * the shuffle carries |distinct boundary instants|, bounded by 2×
    * intervals. Half-open semantics: an interval ending at t does not
    * overlap one starting at t.
    */
  def maxConcurrency(intervals: DataFrame, keyCol: String,
                     startCol: String, endCol: String): DataFrame = {
    // null boundaries drop (the kaplanMeier/streaks convention): a null
    // instant would sort first in the per-key order and start the
    // running open-count from a spurious -1
    val valid = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
    val deltas = valid
      .select(col(keyCol), col(startCol).as("__t"), lit(1L).as("__d"))
      .unionByName(valid
        .select(col(keyCol), col(endCol).as("__t"), lit(-1L).as("__d")))
      .groupBy(col(keyCol), col("__t"))
      .agg(sum(col("__d")).as("__net"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("__open", sum(col("__net")).over(w))
      .groupBy(col(keyCol))
      .agg(max(col("__open")).as("max_concurrent"),
        max(struct(col("__open").as("o"), (-col("__t")).as("nt")))
          .as("__peak"))
      .select(col(keyCol), col("max_concurrent"),
        (-col("__peak.nt")).as("peak_at"))
  }

  /** Kaplan-Meier survival curve over per-subject durations — the
    * censoring-aware retention estimate ([[cohortRetention]]'s matrix
    * can't distinguish "churned" from "still here, observation ended"):
    * S(t) = Π_{u ≤ t} (1 − d_u / n_u) with d_u = observed events at
    * duration u and n_u = subjects still at risk (duration ≥ u);
    * censored subjects leave the risk set without an event.
    *
    * Input: one row per subject — (durationCol: integer duration,
    * observedCol: boolean, true = the event happened, false =
    * censored). Output per distinct event duration: n_risk, n_events,
    * n_censored, and `survival`.
    *
    * Shape: one aggregate to |distinct durations| rows, then windows
    * over THAT bounded table (the bounded-domain single-key argument —
    * durations are days/weeks, not data-sized). The product is
    * exp(Σ ln(1−d/n)) with each ln term pinned at 9 dp into an exact
    * DECIMAL sum (the PMI convention), so the curve is engine-portable
    * to the final 6 dp rounding.
    */
  def kaplanMeier(subjects: DataFrame, durationCol: String,
                  observedCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val byDur = subjects
      .filter(col(durationCol).isNotNull)
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(when(col(observedCol), 1L).otherwise(0L)).as("d"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("c"))
    val ord = Window.orderBy(col("t"))
    val withRisk = byDur
      .withColumn("__tot", sum(col("d") + col("c")).over(
        Window.partitionBy()))
      .withColumn("__before", coalesce(sum(col("d") + col("c")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("__tot") - col("__before"))
    withRisk
      .withColumn("__term",
        // absorbing case d == n_risk: survival hits exact 0; ln(0) is
        // -Inf (breaks the decimal sum), so pin a -99 sentinel — any
        // downstream exp(≤-99) rounds to 0.000000 on every engine
        when(col("d") === col("n_risk"), lit(-99.0))
          .otherwise(round(log((col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double")), 9)).cast(DecimalType(28, 9)))
      .withColumn("survival",
        round(exp(sum(col("__term")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double")), 6))
      .filter(col("d") > 0) // curve points: event durations only
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        col("c").as("n_censored"), col("survival"))
  }

  /** Cohort retention matrix: users grouped by their first-activity day
    * (the cohort), counted on each subsequent activity day offset.
    *
    * `dayCol` is an integer day number (e.g. epoch-seconds div 86400 —
    * integer arithmetic, engine-portable). Two aggregates and one
    * equi-join, all keyed/co-partitioned on the user column; the join
    * input is one row per (user, active day), not one per event.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      dayCol: String): DataFrame = {
    val userDays = events.select(col(userCol), col(dayCol)).distinct()
    val cohorts = userDays.groupBy(col(userCol))
      .agg(min(col(dayCol)).as("cohort_day"))
    userDays.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_day"),
        (col(dayCol) - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
