package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared curation primitives (SURVEY.md §2 L31/L33) — the single
  * implementation behind `CurationQueries` and `tools.PipelineDemo`
  * (the two used to carry verbatim copies; a fix to either diverged
  * silently).
  */
object Curate {

  /** Exact per-group median of an integer score: the rank-(n+1)/2
    * element under (score, tiebreaker) order — integer rank on integer
    * values, no interpolation, engine-exact. One window shuffle on the
    * group; the result is group-cardinality rows (broadcast it back).
    */
  def groupMedian(df: DataFrame, groupCol: String, scoreCol: String,
                  tieCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(scoreCol), col(tieCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .filter(col("__rn") === floor((col("__n") + 1) / lit(2.0)).cast("int"))
      .select(col(groupCol), col(scoreCol).as(outCol))
  }

  /** Per-group md5-prefix keep thresholds hitting a target output
    * share: rate = min(1, share · total/group), threshold = the
    * four-hex-digit prefix bound (rate 1.0 → 'zzzz', above every hex
    * quad). Membership test downstream: `substring(md5(content),1,4) <
    * thr` — a pure function of content, identical at any parallelism.
    * `shareExpr` may reference the group column (e.g. en 40%, others
    * 15%). Returns (groupCol, thr), group-cardinality rows.
    *
    * Granularity: realized rates quantize DOWN to 1/65536 steps
    * (floor keeps the sample at-or-under target, never over), so a
    * group's effective rate can undershoot by up to 1/65536 — and a
    * computed rate below 1/65536 rounds to a keep-nothing threshold.
    * At that point the target share asks for less than one row in
    * 65536; if that group still matters, raise its share rather than
    * relying on sub-ulp sampling. */
  def mixThresholds(df: DataFrame, groupCol: String, shareExpr: Column): DataFrame =
    df.groupBy(groupCol).agg(count(lit(1)).as("__nl"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("__tt"))))
      .withColumn("__rate", least(lit(1.0), shareExpr * col("__tt") / col("__nl")))
      .withColumn("thr", when(col("__rate") >= 1.0, lit("zzzz"))
        .otherwise(lpad(lower(hex(floor(col("__rate") * 65536).cast("int"))), 4, "0")))
      .select(col(groupCol), col("thr"))
}
