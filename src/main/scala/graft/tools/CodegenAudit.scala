package graft.tools
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import graft.{GraftSession, SparkEntry}
/** Report every query whose plan carries interpreted (CodegenFallback)
  * expressions — candidates for fused native kernels — and DIFF the
  * sweep against the checked adjudication ledger
  * `codegen_ledger.json` (flag → class (a) aggregate-buffer /
  * (b) bounded-or-cold HOF → justification). Exits nonzero on any
  * flagged (query, expression) the ledger doesn't cover, so a NEW
  * interpreted hot-path expression fails loudly instead of joining
  * an unexamined pile; stale ledger entries (no longer flagged, or
  * listing expressions the plan no longer carries) are reported so
  * the ledger shrinks when kernels land.
  *
  * Scans `sparkPlan` (the physical plan BEFORE the adaptive
  * preparation), not `executedPlan`: under AQE the executed plan is a
  * single AdaptiveSparkPlanExec node with NO children (the input plan
  * is a constructor field, not a child), so traversing it visits one
  * expressionless shell and reports a vacuous all-clear — which is
  * exactly what this audit did from r10 until the r12 q_pan_luhn HOF
  * slipped through and exposed the hole. */
object CodegenAudit {

  /** Minimal parse of the ledger: query → (class, allowed exprs).
    * Uses Spark's bundled json4s so the audit needs no new deps. */
  private def loadLedger(path: String): Map[String, (String, Set[String])] = {
    import org.json4s._
    val f = new java.io.File(path)
    if (!f.exists()) Map.empty
    else {
      val root = org.json4s.jackson.JsonMethods.parse(f)
      root match {
        case JObject(fields) => fields.collect {
          case (name, JObject(entry)) if name.startsWith("q_") =>
            val cls = entry.collectFirst {
              case ("class", JString(c)) => c
            }.getOrElse("?")
            val exprs = entry.collectFirst {
              case ("exprs", JArray(xs)) =>
                xs.collect { case JString(s) => s }.toSet
            }.getOrElse(Set.empty[String])
            name -> (cls, exprs)
        }.toMap
        case _ => Map.empty
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val ledgerPath = if (args.length > 1) args(1) else "codegen_ledger.json"
    val ledger = loadLedger(ledgerPath)
    val spark = GraftSession.local("4", "codegen-audit")
    var unadjudicated = 0
    val seen = scala.collection.mutable.Map[String, Set[String]]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.sparkPlan
        val fb = plan.flatMap(_.expressions)
          .flatMap(_.collect { case e: CodegenFallback => e.prettyName })
          .distinct.sorted
        if (fb.nonEmpty) {
          seen(name) = fb.toSet
          ledger.get(name) match {
            case Some((cls, allowed)) =>
              val extra = fb.filterNot(allowed)
              if (extra.isEmpty)
                println(s"ADJUDICATED($cls) $name: ${fb.mkString(", ")}")
              else {
                unadjudicated += 1
                println(s"UNADJUDICATED $name: new expressions beyond the " +
                  s"ledger entry: ${extra.mkString(", ")}")
              }
            case None =>
              unadjudicated += 1
              println(s"UNADJUDICATED $name: ${fb.mkString(", ")} — add a " +
                s"ledger entry with class+why, or fuse a native kernel")
          }
        }
      } catch { case e: Throwable =>
        unadjudicated += 1
        println(s"ERR $name: ${e.toString.linesIterator.next().take(120)}")
      }
    }
    // stale direction: ledger rows whose flags no longer exist
    ledger.foreach { case (name, (_, allowed)) =>
      seen.get(name) match {
        case None =>
          println(s"STALE $name: ledger entry but the plan no longer " +
            "carries fallbacks — remove the entry")
        case Some(fb) =>
          val gone = allowed -- fb
          if (gone.nonEmpty)
            println(s"STALE-EXPR $name: ledger allows ${gone.mkString(", ")} " +
              "which the plan no longer carries — trim the entry")
      }
    }
    println(s"AUDIT ${if (unadjudicated == 0) "CLEAN (all flags adjudicated)"
      else s"$unadjudicated UNADJUDICATED"}")
    spark.stop()
    if (unadjudicated > 0) sys.exit(1)
  }
}
