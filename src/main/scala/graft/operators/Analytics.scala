package graft.operators

import graft.core.Caching.LedgerOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered funnels and cohort retention —
  * the two standard product-analytics queries over an event stream,
  * in exact integer arithmetic (counts and timestamp comparisons
  * only; nothing floats).
  */
object Analytics {

  /** Strict-order funnel: for each stage i, the number of users with a
    * qualifying event chain e_1 < e_2 < … < e_i where e_1 is the
    * user's EARLIEST stage-1 event, each later stage is the earliest
    * qualifying event strictly after the previous stage, and every
    * stage lands within `windowSec` of e_1 (the classic
    * first-touch-anchored conversion window).
    *
    * Earliest-qualifying is the standard greedy semantics: taking the
    * earliest event at every stage never forecloses a later stage
    * (any valid chain's stage-i event is ≥ the greedy one), so the
    * count per stage is maximal — FunnelSpec pins this against
    * hand-built chains.
    *
    * Shape: one narrow (user, stage-hits) aggregate per stage — each
    * pass groups the stage's events by user (map-side combined min)
    * and broadcast-or-shuffle joins the ≤|users|-row frontier, so k
    * stages cost k bounded aggregates over single-stage slices, not a
    * per-user event-sequence sort. At 100 TB the frontier table
    * (|users| rows) is the only state carried between stages.
    *
    * Output: (stage_idx 1.., stage, n_users), one row per stage. */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, stages: Seq[String],
                   windowSec: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("ts"))
    // frontier after stage 1: (u, t1, tprev = t1)
    var frontier = ev.filter(col("et") === stages.head)
      .groupBy(col("u")).agg(min(col("ts")).as("t1"))
      .withColumn("tprev", col("t1"))
    val counts = Seq.newBuilder[(Long, String, Long)]
    counts += ((1L, stages.head, frontier.count()))
    stages.zipWithIndex.drop(1).foreach { case (s, i) =>
      frontier = ev.filter(col("et") === s)
        .join(frontier, Seq("u"))
        .filter(col("ts") > col("tprev") &&
          col("ts") <= col("t1") + expr(s"INTERVAL $windowSec SECONDS"))
        .groupBy(col("u"), col("t1")).agg(min(col("ts")).as("tprev"))
      // one count() per stage: the frontier is the next stage's input
      // anyway, and the count is a |users|-bounded aggregate
      counts += ((i + 1L, s, frontier.count()))
    }
    counts.result().toDF("stage_idx", "stage", "n_users")
  }

  /** Cohort retention: users grouped by the calendar day of their first
    * event; for each (cohort day, day offset ≤ `maxOffsetDays`) the
    * number of cohort users active on cohort+offset. All exact —
    * distinct (user, day) pairs, then a count per (cohort, offset)
    * (the pair is unique, so count(*) IS the distinct-user count).
    *
    * Shape: one (user) aggregate for cohorts, one (user, day) distinct,
    * one join on the user key, one bounded groupBy — at 100 TB the
    * cohort table is |users| rows and the output is
    * |days|·`maxOffsetDays` rows.
    *
    * Output: (cohort_day 'yyyy-MM-dd', day_offset, n_active). */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      maxOffsetDays: Int): DataFrame = {
    val ev = events.select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
    val cohorts = ev.groupBy(col("u")).agg(min(col("d")).as("c"))
    ev.distinct()
      .join(cohorts, Seq("u"))
      .withColumn("day_offset", datediff(col("d"), col("c")).cast("long"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("c"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .select(date_format(col("c"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_active"))
  }

  /** Peak concurrent intervals per day — the sweep-line overlap count
    * WITHOUT the textbook global window sort: interval boundaries
    * become ±1 deltas, a two-level [[GlobalIds.assignBy]] rank orders
    * them, and [[GlobalIds.exclusivePrefixSum]] running-sums the
    * deltas; the only single-task stage folds `boundaries/1024` bucket
    * totals, so the plan survives any corpus size where
    * `sum(delta) OVER (ORDER BY ...)` (the oracle form) cannot.
    *
    * Interval semantics are closed [st, en] at microsecond grain: the
    * −1 lands at `en_us + 1`, so a zero-length interval still occupies
    * its instant and an interval starting exactly when another ends
    * overlaps it. Boundary order is (us, flag, owner) with ends
    * (flag 0) first — unique as long as one owner's intervals are
    * disjoint (the sessionizer guarantees it), so every running value
    * is deterministic.
    *
    * Output: (day 'yyyy-MM-dd' of the boundary's own timestamp,
    * peak_sessions, first_peak_us epoch-µs of first attainment). */
  def peakConcurrency(intervals: DataFrame, ownerCol: String,
                      stCol: String, enCol: String,
                      localComputeMaxIntervals: Long = 2000000L): DataFrame = {
    // LOCAL regime (r10, the graph-fixpoint pattern applied to the
    // sweep-line): the running sum over sorted boundaries is a single
    // sequential pass by nature — below the guard, on integral owners
    // and null-free rows, it runs over the collected (owner, st, en)
    // triples with the SAME total order (us_ord, flag, owner), closed
    // [st, en]+1 semantics, UTC day attribution of each boundary's own
    // timestamp, and min-us first-attainment. Past the guard the
    // two-level prefix-sum plan below runs unchanged — at corpus scale
    // it is the plan that survives where the textbook global window
    // cannot.
    val ownerIntegral = intervals.schema(ownerCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // the local day attribution is epoch-day arithmetic (UTC); the
    // distributed date_format follows the SESSION timezone — only
    // equivalent when the session runs UTC (Bench/Verify do)
    val utcSession = intervals.sparkSession.conf
      .get("spark.sql.session.timeZone", "") == "UTC"
    if (ownerIntegral && utcSession) {
      val proj = intervals.select(col(ownerCol).cast("long").as("o"),
        unix_micros(col(stCol)).as("stu"), unix_micros(col(enCol)).as("enu"))
      val stat = proj.agg(count(lit(1)),
        count(when(col("o").isNull || col("stu").isNull ||
          col("enu").isNull, lit(1)))).collect()(0)
      if (stat.getLong(0) > 0 && stat.getLong(1) == 0 &&
          stat.getLong(0) <= localComputeMaxIntervals) {
        val rows = proj.collect()
        // boundary = (us_ord, flag, owner, ts_us, delta)
        val bounds = new Array[(Long, Int, Long, Long, Long)](rows.length * 2)
        var i = 0
        rows.foreach { r =>
          val o = r.getLong(0); val st = r.getLong(1); val en = r.getLong(2)
          bounds(i) = (st, 1, o, st, 1L); i += 1
          bounds(i) = (en + 1L, 0, o, en, -1L); i += 1
        }
        scala.util.Sorting.quickSort(bounds)(
          Ordering.Tuple3[Long, Int, Long].on(b => (b._1, b._2, b._3)))
        def dayOf(us: Long): String =
          java.time.LocalDate.ofEpochDay(
            Math.floorDiv(us, 86400000000L)).toString
        // per day: (peak, first us attaining it)
        val byDay = new java.util.TreeMap[String, (Long, Long)]()
        var conc = 0L
        bounds.foreach { b =>
          conc += b._5
          val d = dayOf(b._4)
          val cur = byDay.get(d)
          if (cur == null || conc > cur._1) byDay.put(d, (conc, b._4))
          else if (conc == cur._1 && b._4 < cur._2) byDay.put(d, (conc, b._4))
        }
        val out = new java.util.ArrayList[org.apache.spark.sql.Row](byDay.size())
        byDay.forEach((d, pv) =>
          out.add(org.apache.spark.sql.Row(d, pv._1, pv._2)))
        import org.apache.spark.sql.types._
        return intervals.sparkSession.createDataFrame(out,
          StructType(Seq(
            StructField("day", StringType),
            StructField("peak_sessions", LongType),
            StructField("first_peak_us", LongType))))
      }
    }
    val ep = intervals
      .select(col(ownerCol).as("owner"), col(stCol).as("ts"),
        unix_micros(col(stCol)).as("us_ord"),
        lit(1).as("flag"), lit(1L).as("delta"))
      .unionByName(intervals
        .select(col(ownerCol).as("owner"), col(enCol).as("ts"),
          (unix_micros(col(enCol)) + 1L).as("us_ord"),
          lit(0).as("flag"), lit(-1L).as("delta")))
    val ranked = GlobalIds.assignBy(ep,
      Seq(col("us_ord"), col("flag"), col("owner")))
    val run = GlobalIds.exclusivePrefixSum(ranked, "global_id", "delta")
      .withColumn("conc", col("prefix") + col("delta"))
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        unix_micros(col("ts")).as("us"), col("conc"))
      .persistLedgered()
    val peaks = run.groupBy(col("day"))
      .agg(max(col("conc")).as("peak_sessions"))
      .withColumnRenamed("day", "pday")
    // |days|-bounded join back for the first attainment instant
    run.join(broadcast(peaks),
        col("day") === col("pday") && col("conc") === col("peak_sessions"))
      .groupBy(col("day"), col("peak_sessions"))
      .agg(min(col("us")).as("first_peak_us"))
      .orderBy(col("day"))
  }
}
