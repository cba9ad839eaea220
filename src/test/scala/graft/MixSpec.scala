package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.Mix

class MixSpec extends SparkSpec {

  private def md5hex2(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .take(1).map(b => f"${b & 0xff}%02x").mkString

  test("weighted sample keeps exactly the hash-thresholded rows per source") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val weights = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    val kept = Mix.weightedSample(d, "source", "text", weights, defaultWeight = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // independent truth via java MessageDigest
    val truth = d.select("doc_id", "source", "text").collect().filter { r =>
      val w = weights.getOrElse(r.getString(1), 0.25)
      val k = math.round(w * 256).toInt
      val t = if (k >= 256) "g0" else f"$k%02x"
      md5hex2(r.getString(2)) < t
    }.map(_.getLong(0)).toSet
    assert(kept == truth)
    // weight 1.0 keeps everything from src0; weight 0 keeps nothing from src2
    val bySrc = d.select("doc_id", "source").collect()
      .groupBy(_.getString(1)).map { case (s, rs) => s -> rs.map(_.getLong(0)).toSet }
    assert(bySrc("src0").subsetOf(kept))
    assert((bySrc("src2") & kept).isEmpty)
  }

  test("coordinatedSample: join of samples equals sample of the join") {
    val o = table("orders")
    val l = table("lineitem")
    val Seq(so, sl) = Mix.coordinatedSample(0.25,
      Seq(o -> "o_orderkey", l -> "l_orderkey"))
    val joined = o.join(l, col("o_orderkey") === col("l_orderkey"))
    val sampleOfJoin = Mix.coordinatedSample(0.25,
      Seq(joined -> "o_orderkey")).head
    val joinOfSamples = so.join(sl, col("o_orderkey") === col("l_orderkey"))
    // the defining property: identical row sets, not just counts
    assert(joinOfSamples.select("o_orderkey", "l_linenumber")
      .exceptAll(sampleOfJoin.select("o_orderkey", "l_linenumber"))
      .isEmpty)
    assert(joinOfSamples.count() === sampleOfJoin.count())
    assert(joinOfSamples.count() > 0, "degenerate: empty sampled join")
  }

  test("coordinatedSample: referential integrity is total within the slice") {
    val o = table("orders")
    val l = table("lineitem")
    val Seq(so, sl) = Mix.coordinatedSample(0.25,
      Seq(o -> "o_orderkey", l -> "l_orderkey"))
    // every sampled order keeps ALL its lineitems...
    val fullCounts = l.groupBy("l_orderkey").count().withColumnRenamed("count", "full")
    val lost = so.join(sl.groupBy("l_orderkey").count(),
        col("o_orderkey") === col("l_orderkey"), "left")
      .join(fullCounts, Seq("l_orderkey"))
      .filter(col("count") =!= col("full"))
    assert(lost.isEmpty, "a sampled order lost lineitems")
    // ...and no orphan lineitems enter the slice
    assert(sl.join(so, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .isEmpty, "sampled lineitem without its sampled order")
    // fraction lands near 64/256 of keys
    val f = so.count().toDouble / o.count().toDouble
    assert(f > 0.15 && f < 0.35, s"keep rate $f far from 0.25")
  }
}
