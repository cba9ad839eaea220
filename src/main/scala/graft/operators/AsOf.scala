package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — the operator Spark lacks natively: for every
  * left row, attach the most recent right row with `rightTs <= leftTs`
  * within the same key group (kdb aj / DuckDB ASOF JOIN semantics,
  * left-outer flavor: unmatched left rows keep nulls).
  *
  * Implementation is the union+window formulation, NOT a range
  * cross-join or per-row probe: tag both sides, union, and take one
  * window pass per key ordered by (ts, side, tie) carrying the last
  * non-null right payload forward. Cost is a single shuffle on the key
  * plus a sort — the same plan as any windowed aggregate, so it
  * scales exactly as far as the key distribution does (salt the key
  * like Sessionize.salted if one key dominates). Ties on `rightTs`
  * resolve to the largest `tieCol`; a right row at exactly `leftTs`
  * matches (inclusive, DuckDB's `>=`).
  */
object AsOf {

  /** @param keys        equality keys present on both sides
    * @param leftTs      left event-time column (orderable type)
    * @param rightTs     right event-time column (same type)
    * @param tieCol      deterministic tiebreaker present on both sides
    * @param payloadCols right columns to carry onto matched left rows
    * @param outPrefix   prefix for the attached payload columns
    * @param tolerance   max age `leftTs - rightTs` of a match (same
    *                    unit as the ts columns, numeric); older
    *                    matches become nulls (pandas merge_asof
    *                    tolerance). Negative = unbounded.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, tieCol: String,
           payloadCols: Seq[String], outPrefix: String = "asof_",
           tolerance: Long = -1L): DataFrame = {
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", col(tieCol))
    // the right payload carries its own ts so tolerance can be
    // evaluated on the matched row
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"), col(tieCol).as("__tie"),
        struct((payloadCols.map(col) :+ col(rightTs).as("__rts")): _*).as("__p")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__m0", last(col("__p"), ignoreNulls = true).over(w))
      .withColumn("__m",
        if (tolerance < 0) col("__m0")
        else when(col("__ts") - col("__m0.__rts") <= tolerance, col("__m0")))
      .filter(col("__side") === 1)
    matched.select(left.columns.toIndexedSeq.map(col) ++
      payloadCols.map(c => col(s"__m.$c").as(s"$outPrefix$c")): _*)
  }
}
