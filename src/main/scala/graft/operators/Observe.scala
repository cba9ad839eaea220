package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** L44: single-action pipeline observability. A curation funnel needs
  * per-stage accounting (rows surviving, bytes, nulls) — but a
  * `count()` per stage re-executes the lineage prefix once per stage:
  * at 100 TB a 14-stage funnel would read the corpus 14 times for its
  * metrics alone. `Dataset.observe` attaches named aggregates to a
  * point IN the plan; they are computed as accumulators DURING the one
  * terminal action (map-side, no extra shuffle, no extra scan), so the
  * whole funnel report costs zero additional passes.
  *
  * Contract notes: metrics ride the NEXT completed action on the
  * returned frame — run exactly one terminal action, then read the
  * observations. Aggregates must be global (no grouping) and
  * distinct-free (Spark enforces this at `observe` time). Stage names
  * double as observation names and must be unique within the funnel
  * (enforced here; Spark would fail the action otherwise).
  */
object Observe {

  /** Attach a named observation after `df`. Always records `rows`
    * (row count at this point in the plan); `extras` are additional
    * global aggregate columns riding the same pass — alias each
    * (`sum(length($"text")).as("bytes")`).
    */
  def stage(df: DataFrame, name: String, extras: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, count(lit(1)).as("rows"), extras: _*), obs)
  }

  /** Thread `input` through named transforms, observing the row count
    * surviving each. Returns the final frame plus the observations in
    * stage order; run ONE action on the frame, then [[report]].
    */
  def funnel(input: DataFrame,
             stages: Seq[(String, DataFrame => DataFrame)]): (DataFrame, Seq[(String, Observation)]) = {
    val names = stages.map(_._1)
    require(names.distinct == names,
      s"stage names must be unique, got: ${names.mkString(", ")}")
    stages.foldLeft((input, Vector.empty[(String, Observation)])) {
      case ((df, acc), (name, f)) =>
        val (out, obs) = stage(f(df), name)
        (out, acc :+ (name -> obs))
    }
  }

  /** Post-action funnel report: (stage_idx, stage, rows_out) in stage
    * order. Call after the terminal action — metric delivery rides an
    * async QueryExecutionListener, so each observation is awaited up
    * to `timeout`; when no action ever ran through the observe node
    * this fails loudly rather than hanging forever or reporting a
    * silent zero.
    */
  def report(spark: org.apache.spark.sql.SparkSession,
             observed: Seq[(String, Observation)],
             timeout: scala.concurrent.duration.Duration =
               scala.concurrent.duration.Duration(60, "s")): DataFrame = {
    import spark.implicits._
    val rows = observed.zipWithIndex.map { case ((name, obs), i) =>
      try scala.concurrent.Await.ready(obs.future, timeout)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          throw new IllegalArgumentException(
            s"observation '$name' was never populated: run the terminal action first")
      }
      (i.toLong, name, obs.get("rows").asInstanceOf[Long])
    }
    rows.toDF("stage_idx", "stage", "rows_out")
  }
}
