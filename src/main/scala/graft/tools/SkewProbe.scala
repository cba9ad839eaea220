package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Skew

/** AQE-skew-split vs static salting head-to-head (SURVEY §6): the
  * measured guidance for when `Skew.saltedJoin` earns its dim-payload
  * ×buckets replication cost and when AQE's runtime skew handling (or
  * a plain shuffle join) is already enough.
  *
  * Workload: lineitem replicated ×R with half of all rows remapped to
  * ONE hot key and the rest spread over `nKeys`; dim = one row per
  * key. Broadcast is disabled so the join is a genuine shuffle
  * (sort-merge) join — with a broadcastable dim the whole question is
  * moot, which is guidance line zero. AQE skew thresholds are tuned
  * down so the splitter can actually see partitions of this size
  * (defaults only trigger at 256 MB).
  *
  * `sbt "runMain graft.tools.SkewProbe [sfDir] [replicas]"`
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args(1).toInt else 10
    val nKeys = 10000L
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-skewprobe")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val fact = (0 until replicas).map { i =>
      li.select(
        (col("l_orderkey") * 10 + col("l_linenumber") + lit(i.toLong * 10000000L))
          .as("row_id"),
        // half the rows hit one hot key; the rest spread uniformly
        when(pmod(col("l_orderkey"), lit(2)) === 0, lit(0L))
          .otherwise(pmod(col("l_orderkey") * 37 + i, lit(nKeys))).as("k"),
        col("l_quantity").cast("double").as("qty"))
    }.reduce(_ union _)
    val dim = spark.range(nKeys).select(col("id").as("k"),
      concat(lit("payload-"), col("id")).as("name"))

    fact.persist(); dim.persist()
    val n = fact.count(); dim.count()
    println(s"[skewprobe] fact $n rows, ${nKeys} dim keys, ~50% on the hot key")

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)
    // genuine shuffle join: no broadcast side
    conf("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // let the AQE splitter see partitions of this (test-scale) size
    conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    def time(label: String)(df: => DataFrame): Double = {
      val dts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // aggregate forces the full join without materializing output
        df.agg(sum(col("qty")), count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val dt = dts.min
      println(f"[skewprobe] $label%-34s $dt%6.2f s  (runs: ${dts.map(d => f"$d%.2f").mkString(", ")})")
      dt
    }

    conf("spark.sql.adaptive.skewJoin.enabled", "false")
    val tPlain = time("plain shuffle join (no AQE skew)") {
      fact.join(dim, "k")
    }
    conf("spark.sql.adaptive.skewJoin.enabled", "true")
    val tAqe = time("AQE skew-split join") {
      fact.join(dim, "k")
    }
    conf("spark.sql.adaptive.skewJoin.enabled", "false")
    val tSalted = time("Skew.saltedJoin (32 buckets)") {
      Skew.saltedJoin(fact, dim, "k", saltBy = "row_id", buckets = 32)
    }
    println(f"""{"metric":"skewprobe","rows":$n,"plain_sec":$tPlain%.3f,""" +
      f""""aqe_sec":$tAqe%.3f,"salted_sec":$tSalted%.3f}""")
    spark.stop()
  }
}
