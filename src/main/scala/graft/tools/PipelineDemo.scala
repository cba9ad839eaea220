package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions._
import graft.operators.{Decontaminate, Dedup, Layout, Pack}

/** End-to-end training-data pipeline over the library surface:
  * read → quality gate → language gate → exact dedup → clustered
  * near-dup removal → decontamination vs an eval slice → chunk →
  * deterministic sample → shard packing → sized partitioned write.
  * Prints one line per stage (rows surviving).
  * `sbt "runMain graft.tools.PipelineDemo [sfDir]"`
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      "pipeline-demo")
    def stage(name: String, n: Long): Unit = println(f"[pipeline] $name%-22s $n%7d rows")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    stage("ingest", docs.count())

    val quality = docs.filter(quality_score(col("text")) >= 0.5)
    stage("quality>=0.5", quality.count())

    val langOk = quality.filter(col("lang").isin("en", "de", "es", "fr"))
    stage("lang gate", langOk.count())

    val exactKept = Dedup.exact(langOk, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val afterExact = langOk.join(exactKept, "doc_id")
    stage("exact dedup", afterExact.count())

    val pairs = Dedup.minhashPairs(afterExact, "doc_id", "text", minJaccard = 0.9)
    val afterNear = Dedup.removeNearDupsClustered(afterExact, "doc_id", pairs)
    stage("near-dup clusters", afterNear.count())

    val evalSlice = docs.filter(col("doc_id") % 23 === 0)
    val clean = Decontaminate.removeContaminated(afterNear, evalSlice,
      "doc_id", "text", shingleN = 3, minMatched = 5)
    stage("decontaminated", clean.count())

    val chunks = clean.select(col("doc_id"), col("lang"),
        explode(chunk_windows(col("text"), 32, 8)).as("c"))
      .select(col("doc_id"), col("lang"), col("c.chunk_idx"),
        col("c.chunk_text"), col("c.n_chunk_tokens"))
    stage("chunked (32/8)", chunks.count())

    val sampled = chunks.filter(substring(md5(col("chunk_text")), 1, 2) < "c0")
    stage("sampled (~75%)", sampled.count())

    val shards = Pack.assignShardsShuffled(
      sampled.withColumn("cid",
        col("doc_id") * 100000 + col("chunk_idx")),
      "cid", col("n_chunk_tokens"), col("chunk_text"), budgetTokens = 4096)
    stage("packed shards", shards.select("shard").distinct().count())

    val out = Files.createTempDirectory("pipeline_out").toString
    Layout.writeSized(sampled, out, Seq("lang"), filesPerPartition = 2,
      idCol = "doc_id")
    val written = spark.read.parquet(out)
    stage("written", written.count())
    println(s"[pipeline] layout dirs: " +
      new java.io.File(out).listFiles().count(_.getName.startsWith("lang=")))
    spark.stop()
  }
}
