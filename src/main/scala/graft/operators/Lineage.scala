package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias, View}

/** Lineage guard for multi-reference operators.
  *
  * [[Dedup.containmentPairs]], [[Curate.shingleNovelty]] and
  * [[Dedup.sampledDupRate]] reference their input frame several times
  * (df table, size table, rank window, verify sets): Spark re-executes
  * the input's WHOLE upstream plan per reference, so a long uncached
  * lineage (a composed pipeline) multiplies its own cost — observed
  * wedging the composed demo until the caller cut the lineage. The
  * contract used to be documentation; this makes it structural: inputs
  * whose plan is scan-shaped (projections/filters over a leaf — the
  * re-execution is just a re-read, which is exactly what those
  * operators are designed around) pass through untouched, anything
  * derived (joins, aggregates, windows, generates…) is pinned ONCE via
  * eager `localCheckpoint`.
  *
  * Cluster caveat (applies to every localCheckpoint in the engine,
  * incl. the iterative CC/LPA/k-core/SGNS/Lloyd rounds): checkpoint
  * blocks live on executors and die with them — lineage is truncated,
  * so an executor loss fails the job instead of recomputing. On a real
  * cluster prefer reliable `checkpoint()` for long-running jobs by
  * setting [[Lineage.useReliableCheckpoint]] (requires
  * `spark.sparkContext.setCheckpointDir`). local[32] has no executor
  * loss, so the default stays local.
  */
object Lineage {

  /** Opt-in: route [[pinDerived]] through reliable `checkpoint()`
    * instead of `localCheckpoint()` (set once at app start; requires a
    * checkpoint dir). Equivalent to the session conf knob
    * `graft.checkpoint.reliable=true`. */
  @volatile var useReliableCheckpoint: Boolean = false

  /** Round pin for the engine's iterative operators (LPA, k-core,
    * Lloyd, SGNS, PageRank, MW reweight, greedy packing…): cut
    * lineage eagerly so round t+1 never re-executes round t. Honors
    * `graft.checkpoint.reliable`: when the session conf sets it true
    * (or [[useReliableCheckpoint]] is set) rounds checkpoint RELIABLY
    * to the configured checkpoint dir, so on a real cluster an
    * executor loss recomputes the round from storage instead of
    * failing the job — localCheckpoint blocks live on executors and
    * die with them. local[*] keeps the localCheckpoint default (no
    * executor loss, no distributed-FS round-trip per round). */
  def pin(df: DataFrame): DataFrame = {
    val reliable = useReliableCheckpoint ||
      df.sparkSession.conf.getOption("graft.checkpoint.reliable")
        .exists(_.equalsIgnoreCase("true"))
    if (reliable) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "graft.checkpoint.reliable=true requires " +
          "sparkContext.setCheckpointDir(<reliable storage path>)")
      // Retention: superseded round checkpoints are reclaimed by the
      // ContextCleaner once the round's RDD is unreachable — but ONLY
      // under spark.cleaner.referenceTracking.cleanCheckpoints=true
      // (GraftSession sets it; it must be set before the context
      // starts). Warn loudly when a foreign session forgot it, since
      // a long iterative job then accumulates one checkpoint dir per
      // round forever (r14 ADVICE).
      if (!df.sparkSession.sparkContext.getConf.getBoolean(
          "spark.cleaner.referenceTracking.cleanCheckpoints", false))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "reliable round pins without spark.cleaner.referenceTracking." +
            "cleanCheckpoints=true: superseded round checkpoints are " +
            "never deleted — set it before the SparkContext starts")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }

  private def scanShaped(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case Project(_, c)        => scanShaped(c)
    case Filter(_, c)         => scanShaped(c)
    case SubqueryAlias(_, c)  => scanShaped(c)
    case v: View              => scanShaped(v.child)
    case _                    => false
  }

  /** The input frame, pinned iff its plan is more than a (possibly
    * filtered/projected) scan. Idempotent on already-pinned frames
    * (a checkpointed frame is a leaf). */
  def pinDerived(df: DataFrame): DataFrame =
    if (scanShaped(df.queryExecution.analyzed)) df
    else pin(df)
}
