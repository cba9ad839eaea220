package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Observation
import scala.concurrent.Await
import scala.concurrent.duration.Duration
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("4", "obs-probe")
    var df = spark.range(100000).toDF("x").withColumn("m", (col("x") % 7 === 0).cast("long")).localCheckpoint(true)
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      val obs = Observation(s"probe_$i")
      val pinned = df.withColumn("m", col("m") + 1).observe(obs, sum(col("m")).as("mv")).localCheckpoint(true)
      Await.ready(obs.future, Duration(30, "s"))
      val tObs = (System.nanoTime()-t0)/1e9
      val t1 = System.nanoTime()
      val c = pinned.filter(col("m") > 0).limit(1).count()
      val tCnt = (System.nanoTime()-t1)/1e9
      println(f"[obs] round $i pin+obs $tObs%.3f s, extra count-job $tCnt%.3f s, v=${obs.get("mv")}")
      df = pinned
    }
    spark.stop()
  }
}
