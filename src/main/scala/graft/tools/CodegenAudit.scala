package graft.tools
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import graft.{GraftSession, SparkEntry}
/** Report every query whose plan carries interpreted (CodegenFallback)
  * expressions — candidates for fused native kernels. */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("4", "codegen-audit")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val exec = fn(spark, sfDir).queryExecution.executedPlan
        val fb = exec.flatMap(_.expressions)
          .flatMap(e => e +: e.children.flatMap(_.collect { case x => x }))
          .collect { case e: CodegenFallback => e.prettyName }
          .distinct.sorted
        if (fb.nonEmpty) println(s"FALLBACK $name: ${fb.mkString(", ")}")
      } catch { case e: Throwable =>
        println(s"ERR $name: ${e.toString.linesIterator.next().take(120)}")
      }
    }
    spark.stop()
  }
}
