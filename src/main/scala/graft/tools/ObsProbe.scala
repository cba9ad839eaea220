package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Observation
import scala.concurrent.Await
import scala.concurrent.duration.Duration
/** r17 measurement probe: Dataset.observe metric delivery + latency on
  * the engine's two pin paths (eager localCheckpoint, eager reliable
  * checkpoint) — the mechanism Lineage.pinAgg relies on. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("4", "obs-probe")
    val dir = java.nio.file.Files.createTempDirectory("obs-probe-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    def run(label: String, reliable: Boolean): Unit = {
      val s2 = spark.newSession()
      s2.conf.set("graft.checkpoint.reliable", reliable.toString)
      val df = s2.range(100000).toDF("x")
        .withColumn("m", (col("x") % 7 === 0).cast("long"))
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val (pinned, v) = graft.operators.Lineage.pinAgg(
          df.withColumn("m", col("m") + i),
          ("mv", sum(col("m"))))
        println(f"[obs] $label round $i pinAgg ${(System.nanoTime()-t0)/1e9}%.3f s v=${v("mv")}")
      }
    }
    run("localCheckpoint", reliable = false)
    run("reliableCheckpoint", reliable = true)
    spark.stop()
  }
}
