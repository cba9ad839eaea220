package graft.tools

import graft.{GraftSession, SparkEntry}

/** Print the formatted physical plan for one or more queries — the
  * audit loop for shuffle/pushdown/broadcast review.
  * `sbt "runMain graft.tools.PlanAudit q_dedup_jaccard [sfDir]"`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("4", "plan-audit")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
