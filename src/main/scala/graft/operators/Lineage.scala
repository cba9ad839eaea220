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
    * checkpoint dir). */
  @volatile var useReliableCheckpoint: Boolean = false

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
    else if (useReliableCheckpoint) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
