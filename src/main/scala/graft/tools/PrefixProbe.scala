package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions._

/** One-off measurement for the PPJoin chain: counts candidates
  * surviving each exactness-preserving prune at a given SF —
  * raw prefix-join rows, distinct pairs (the r11 baseline), pairs
  * after the pair-level positional/match-count filter (r12), and
  * verified pairs. `sbt "runMain graft.tools.PrefixProbe [sfDir]"`. */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val (num, den) = (9L, 10L)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-prefixprobe")
    val docs = graft.queries.RelationalQueries.t(spark, dir, "documents")
    val toks = docs.select(col("doc_id").as("id"),
      explode(array_distinct(tokenize_ws(col("text")))).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val sized = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val ordered = toks.join(dfreq, "tok").join(sized, "id")
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy("df", "tok")))
    val prefix = ordered.filter(
      col("rk") <= col("sz") - expr(s"($num * sz + $den - 1) div $den") + 1)
    val a = prefix.select(col("id").as("ida"), col("tok"), col("sz").as("sza"),
      col("rk").as("pa"))
    val b = prefix.select(col("id").as("idb"), col("tok"), col("sz").as("szb"),
      col("rk").as("pb"))
    val joined = a.join(b, Seq("tok")).filter(col("ida") < col("idb"))
      .filter(least(col("sza"), col("szb")) * den >=
        greatest(col("sza"), col("szb")) * num)
    val occ = joined.filter(
      expr(s"1 + least(sza - pa, szb - pb) >= " +
        s"($num * (sza + szb) + ${num + den - 1}) div ${num + den}"))
    println(s"[probe] prefix-join rows (post size-ratio): ${joined.count()}")
    println(s"[probe] rows after per-occurrence positional: ${occ.count()}")
    val grouped = occ.groupBy("ida", "idb")
      .agg(max(col("sza")).as("sza"), max(col("szb")).as("szb"),
        count(lit(1)).as("c"), max(col("pa")).as("pamax"),
        max(col("pb")).as("pbmax"))
    println(s"[probe] distinct candidate pairs (r11 verify load): ${grouped.count()}")
    val cut = grouped.filter(expr(s"c + least(sza - pamax, szb - pbmax) >= " +
      s"($num * (sza + szb) + ${num + den - 1}) div ${num + den}"))
    println(s"[probe] pairs after pair-level filter (r12 verify load): ${cut.count()}")
    val sets = docs.select(col("doc_id").as("id"),
      token_id_set(tokenize_ws(col("text"))).as("ids"))
    val ver = cut
      .join(sets.select(col("id").as("ida"), col("ids").as("ids1")), "ida")
      .join(sets.select(col("id").as("idb"), col("ids").as("ids2")), "idb")
      .withColumn("minh", expr(
        s"($num * (sza + szb) + ${num + den - 1}) div ${num + den}"))
      .filter(inter_ge_sorted(col("ids1"), col("ids2"), col("minh")) >=
        col("minh"))
    println(s"[probe] verified pairs: ${ver.count()}")
    spark.stop()
  }
}
