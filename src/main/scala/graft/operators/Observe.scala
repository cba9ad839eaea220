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
  /** R41: two-proportion z-statistic from per-variant counts — input
    * one row per variant in {0, 1} with columns (variant, n, c); output
    * ONE row (n_a, n_b, conv_a, conv_b, rate_a_pm, rate_b_pm, z_q,
    * significant). z_q is the z-statistic in 1e-4 units (half-up
    * floor-quantized, engine-portable); significant at |z| >= 1.96.
    * Shared by the batch q_ab_test and the streaming A/B monitor so
    * the two can never drift. */
  def twoProportionZ(perVariant: DataFrame): DataFrame =
    perVariant.agg(
        max(when(col("variant") === 0, col("n"))).as("n_a"),
        max(when(col("variant") === 1, col("n"))).as("n_b"),
        max(when(col("variant") === 0, col("c"))).as("conv_a"),
        max(when(col("variant") === 1, col("c"))).as("conv_b"))
      .withColumn("rate_a_pm", expr("conv_a * 1000 div n_a"))
      .withColumn("rate_b_pm", expr("conv_b * 1000 div n_b"))
      .withColumn("z_q", expr(
        """CAST(FLOOR((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
          | / NULLIF(sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
          |   * (1.0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
          |   * (1.0 / n_a + 1.0 / n_b)), 0.0)
          | * 10000 + 0.5) AS BIGINT)""".stripMargin))
      .withColumn("significant", abs(col("z_q")) >= 19600L)
      .select("n_a", "n_b", "conv_a", "conv_b", "rate_a_pm", "rate_b_pm",
        "z_q", "significant")

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
