package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 heavy-lane data generator (measurement-only; never used by the
  * bench/driver contract): writes a K×-scaled copy of an existing
  * testdata dir by unioning K key-shifted replicas of each table —
  * every primary/foreign key of replica i shifts by i·10⁷ per key
  * namespace, so joins stay consistent and the replicas are DISJOINT
  * (graphs gain nodes, sessions gain users; no artificial cross-copy
  * density). Deterministic: no rand anywhere. sf0.1 × 10 ≈ 6M-row
  * lineitem, 1M events, 50k docs — big enough that 32 cores beat 8,
  * which sf0.1 cannot show (r16 verdict: the 8-core bench BEAT the
  * 32-core one at sf0.1).
  *
  * `sbt "runMain graft.tools.GenScaled /root/testdata/sf0.1 /root/testdata_sf1 10"`
  */
object GenScaled {
  private val OFF = 10000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/testdata_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "gen-scaled")

    // key columns to shift, per table; non-key columns replicate as-is
    val shifts: Map[String, Seq[String]] = Map(
      "region" -> Nil, "nation" -> Nil, // small dims: copy 0 only
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    shifts.foreach { case (name, keys) =>
      val base = spark.read.parquet(s"$src/$name.parquet")
      val copies = if (keys.isEmpty) 1 else k
      val out = (0 until copies).map { i =>
        keys.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(i * OFF))
        }
      }.reduce(_ unionByName _)
      // few right-sized multi-row-group files so scans can parallelize
      // (the whole point of the lane: sf0.1 parquet is one row group
      // = one scan task)
      out.repartition(8).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")
      println(s"[gen] $name x$copies -> $dst/$name.parquet")
    }
    spark.stop()
  }
}
