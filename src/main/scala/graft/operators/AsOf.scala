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

  /** R58 (r16): first/last-touch conversion attribution — for every
    * conversion, the first and last touch event of the same key
    * inside the trailing lookback window (cts − W, cts], plus the
    * touch count: the marketing/growth question ("which click gets
    * credit") and, in pipeline terms, the windowed generalization of
    * the plain as-of join ([[join]] answers only last-touch,
    * unbounded or toleranced — attribution needs first AND count).
    *
    * Scale shape: candidates come from [[RangeJoin.byBucket]] with
    * bucketSize = lookback, so each conversion interval explodes to
    * ≤ 2 bucket rows and the join is a pure (keys, bucket)
    * equi-join — never a per-user cross join. First/last resolve via
    * ROW_NUMBER windows partitioned by conversion id (bounded: the
    * touches of ONE key inside ONE lookback window), ties on equal
    * ts to the smallest touch id for first / largest for last.
    * Left-outer: unattributed conversions keep n_touches = 0 and −1
    * ids/timestamps.
    *
    * Returns (keys..., conv_id, conv_ts, n_touches, first_touch_id,
    * first_ts, last_touch_id, last_ts). */
  def attribution(conversions: DataFrame, touches: DataFrame,
                  keys: Seq[String], convTsCol: String, convIdCol: String,
                  touchTsCol: String, touchIdCol: String,
                  lookback: Long): DataFrame = {
    require(lookback > 0, s"lookback must be positive, got $lookback")
    val convs = conversions.select(
      keys.map(col) ++ Seq(col(convIdCol).as("conv_id"),
        col(convTsCol).cast("long").as("conv_ts")): _*)
    val tchs = touches.select(
      keys.map(col) ++ Seq(col(touchIdCol).as("touch_id"),
        col(touchTsCol).cast("long").as("tts")): _*)
    val iv = convs.withColumn("__s", col("conv_ts") - lookback + 1L)
    val cand = RangeJoin.byBucket(tchs, iv, keys, "tts", "__s", "conv_ts",
      bucketSize = lookback)
    val wF = Window.partitionBy("conv_id")
      .orderBy(col("tts").asc, col("touch_id").asc)
    val wL = Window.partitionBy("conv_id")
      .orderBy(col("tts").desc, col("touch_id").desc)
    val att = cand
      .withColumn("__rf", row_number().over(wF))
      .withColumn("__rl", row_number().over(wL))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_touches"),
        max(when(col("__rf") === 1, col("touch_id"))).as("first_touch_id"),
        max(when(col("__rf") === 1, col("tts"))).as("first_ts"),
        max(when(col("__rl") === 1, col("touch_id"))).as("last_touch_id"),
        max(when(col("__rl") === 1, col("tts"))).as("last_ts"))
    convs.join(att, Seq("conv_id"), "left")
      .select(keys.map(col) ++ Seq(col("conv_id"), col("conv_ts"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        coalesce(col("first_touch_id"), lit(-1L)).as("first_touch_id"),
        coalesce(col("first_ts"), lit(-1L)).as("first_ts"),
        coalesce(col("last_touch_id"), lit(-1L)).as("last_touch_id"),
        coalesce(col("last_ts"), lit(-1L)).as("last_ts")): _*)
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
