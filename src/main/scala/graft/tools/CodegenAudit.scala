package graft.tools
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import graft.{GraftSession, SparkEntry}
/** Report every query whose plan carries interpreted (CodegenFallback)
  * expressions — candidates for fused native kernels.
  *
  * Scans `sparkPlan` (the physical plan BEFORE the adaptive
  * preparation), not `executedPlan`: under AQE the executed plan is a
  * single AdaptiveSparkPlanExec node with NO children (the input plan
  * is a constructor field, not a child), so traversing it visits one
  * expressionless shell and reports a vacuous all-clear — which is
  * exactly what this audit did from r10 until the r12 q_pan_luhn HOF
  * slipped through and exposed the hole. */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("4", "codegen-audit")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.sparkPlan
        val fb = plan.flatMap(_.expressions)
          .flatMap(_.collect { case e: CodegenFallback => e.prettyName })
          .distinct.sorted
        if (fb.nonEmpty) { flagged += 1; println(s"FALLBACK $name: ${fb.mkString(", ")}") }
      } catch { case e: Throwable =>
        flagged += 1
        println(s"ERR $name: ${e.toString.linesIterator.next().take(120)}")
      }
    }
    println(s"AUDIT ${if (flagged == 0) "CLEAN" else s"$flagged queries flagged"}")
    spark.stop()
  }
}
