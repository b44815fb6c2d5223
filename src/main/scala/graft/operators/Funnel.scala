package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered funnel analysis over an event stream: how many users reach each
 * stage of a required sequence (e.g. view → click → purchase), where a
 * stage counts only if it happens STRICTLY AFTER the user's entry into the
 * previous stage. The behavioral-analytics twin of the reference's
 * event-log queries (per-user event ordering is the same contract its
 * latest-record view enforces — SURVEY.md §2.4/§2.5).
 *
 * Semantics: a user's stage-1 time is their earliest stage-1 event; their
 * stage-k time is their earliest stage-k event later than their stage-(k−1)
 * time. Earliest-entry semantics make the result order-insensitive and
 * engine-portable (pure min aggregates — no row_number ties to break).
 *
 * Scale: one filter + groupBy per stage, all shuffling on the user key —
 * after the first aggregation every subsequent join and groupBy reuses the
 * same hash partitioning, so AQE plans them without extra exchanges of the
 * big side. The per-stage frontier frames shrink monotonically (users drop
 * out of the funnel), never grow.
 */
object Funnel {

  /** Per-user entry times for each stage: (user, t1, t2, ..., tk) with
    * nulls once the user falls out of the funnel. */
  def userStages(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    stages.tail.zipWithIndex.foldLeft(first) { case (acc, (stage, i)) =>
      val prev = s"t${i + 1}"
      val next = s"t${i + 2}"
      val hits = events.filter(col(typeCol) === stage)
        .select(col(userCol), col(tsCol).as("__ts"))
      // conditional min, not filter-then-min: a user whose stage events all
      // precede t_prev must STAY in the frame with a null t_next, not vanish
      acc.join(hits, Seq(userCol), "left")
        .groupBy((col(userCol) +: (1 to i + 1).map(j => col(s"t$j"))): _*)
        .agg(min(when(col("__ts") > col(prev), col("__ts"))).as(next))
    }
  }

  /** Funnel summary: one row per stage with the user count still in the
    * funnel at that stage (weakly decreasing by construction). */
  def steps(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    val perUser = userStages(events, userCol, typeCol, tsCol, stages)
    val counts = stages.zipWithIndex.map { case (_, i) =>
      // coalesce: sum over an empty frame is null, but an empty funnel has
      // zero users at every stage
      coalesce(sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as(s"n${i + 1}")
    }
    val agg = perUser.agg(counts.head, counts.tail: _*)
    val rows = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i + 1).as("step"), lit(stage).as("stage"),
        col(s"n${i + 1}").as("n_users"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step"), col("r.stage"), col("r.n_users"))
  }
}
