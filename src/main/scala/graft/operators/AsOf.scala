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

  /** R51: point-in-time dimension join — every fact row joined to the
    * dimension VERSION that was valid at the fact's timestamp (the
    * feature-store / data-warehouse classic over an SCD2 history:
    * valid_from ≤ t < valid_to, open current version = null
    * valid_to). Train/serve skew in feature pipelines is exactly a
    * botched PIT join (joining today's dim values onto yesterday's
    * facts), so the operator exists as a NAMED primitive instead of a
    * hand-rolled range join.
    *
    * Implementation is the [[join]] union+window as-of shape — one
    * shuffle on the keys, no interval cross-join: the as-of match on
    * `validFrom` picks the version with the latest start ≤ t, which
    * for a TILED history (SCD2: next valid_from = previous valid_to,
    * the R32 builder's shape) IS the containing version; the
    * `validTo` gap filter then nulls out matches that fall in HOLES
    * of a non-tiled history instead of silently attributing them to
    * the previous version. Left-outer: facts before the first
    * version (or in a hole) keep null payloads. Contract: (keys,
    * validFrom) unique — the R32 builder guarantees strictly
    * increasing starts per key. */
  def pointInTime(facts: DataFrame, dims: DataFrame, keys: Seq[String],
                  factTs: String, validFrom: String, validTo: String,
                  payloadCols: Seq[String],
                  outPrefix: String = "pit_"): DataFrame = {
    require(!payloadCols.contains(validTo),
      s"payloadCols must not include $validTo (carried internally)")
    val f2 = facts.withColumn("__pit_tie", col(factTs))
    val d2 = dims.withColumn("__pit_tie", col(validFrom))
    val j = join(f2, d2, keys, factTs, validFrom, "__pit_tie",
      payloadCols :+ validTo, outPrefix)
    val ok = col(s"$outPrefix$validTo").isNull ||
      col(factTs) < col(s"$outPrefix$validTo")
    payloadCols.foldLeft(j) { (d, c) =>
        d.withColumn(s"$outPrefix$c", when(ok, col(s"$outPrefix$c")))
      }
      .drop(s"$outPrefix$validTo", "__pit_tie")
  }
}
