package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions._

/** Scratch profiling harness for operator stage costs. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "profile")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val B = 16
    val toks = d.select(col("doc_id").as("id"),
        array_distinct(tokenize_ws(col("text"))).as("toks"), col("lang"))
      .withColumn("bkt", pmod(col("id"), lit(B)).cast("int"))
    val a = toks.withColumn("bv", explode(sequence(col("bkt"), lit(B - 1))))
      .withColumnRenamed("bkt", "bu").as("a")
    val b = toks.withColumn("bu", explode(sequence(lit(0), col("bkt"))))
      .withColumnRenamed("bkt", "bv").as("b")
    val joined = a.join(b, col("a.lang") === col("b.lang") &&
      col("a.bu") === col("b.bu") && col("a.bv") === col("b.bv") &&
      (col("a.bu") < col("a.bv") || col("a.id") < col("b.id")))

    time("tokenize only")(toks.count())
    time("pair join, no arrays")(joined.select(col("a.id"), col("b.id")).count())
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    time("string_funcs noop")({
      graft.SparkEntry.queries("q_string_funcs")(spark, sfDir)
        .write.format("noop").mode("overwrite").save(); 0L})
    time("string_funcs noop 2nd")({
      graft.SparkEntry.queries("q_string_funcs")(spark, sfDir)
        .write.format("noop").mode("overwrite").save(); 0L})
    time("string funcs no sort")({part.selectExpr("p_partkey",
      "upper(p_brand)", "substring(p_name,1,8)", "length(p_name)")
      .write.format("noop").mode("overwrite").save(); 0L})

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    time("get_json_object")(ev
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k").agg(count(lit(1))).count())
    time("get_json_object 2nd")(ev
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k").agg(count(lit(1))).count())
    time("from_json")(ev
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k").as("k"))
      .groupBy("k").agg(count(lit(1))).count())
    time("variant_get")(ev
      .select(expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
      .groupBy("k").agg(count(lit(1))).count())

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    time("agg double sum")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(rev)).count())
    time("agg decimal38 sum")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(rev.cast("decimal(38,4)"))).count())
    time("agg decimal18 sum")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(rev.cast("decimal(18,4)"))).count())
    time("agg long-scaled sum")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(round(rev * 10000).cast("long"))).count())
    time("agg double sum 2nd")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(rev)).count())

    time("pair join + jac")(joined
      .withColumn("jac", size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
        size(array_union(col("a.toks"), col("b.toks"))).cast("double"))
      .filter(col("jac") >= 0.9).count())

    spark.stop()
  }
}
