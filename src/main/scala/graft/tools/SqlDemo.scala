package graft.tools

import graft.{GraftExtensions, GraftSession}

/** Example: the engine's native expressions from pure SQL — a session
  * built with `withExtensions(new GraftExtensions)`.
  * Run with `sbt "runMain graft.tools.SqlDemo [sfDir]"`.
  */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-sql-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("documents")

    println("scalar=" + spark.sql(
      """SELECT rolling_hash('ab') AS rh,
        |  jaccard_sorted(array(1L,2L,3L), array(2L,3L,4L)) AS js,
        |  cast(gzip_decompress(gzip_compress(encode('hi','UTF-8'))) AS STRING) AS rt
        |""".stripMargin).collect().head)

    val dups = spark.sql(
      """WITH t AS (SELECT doc_id,
        |    array_sort(array_distinct(transform(split(text, ' '),
        |      x -> fnv64(x)))) AS ids,
        |    simhash64(split(text, ' ')) AS fp
        |  FROM documents)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  round(jaccard_sorted(a.ids, b.ids), 4) AS jac,
        |  bit_count(a.fp ^ b.fp) AS hamming
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE jaccard_sorted(a.ids, b.ids) >= 0.9
        |ORDER BY d1, d2 LIMIT 5""".stripMargin).collect()
    println("sql_dedup=" + dups.map(r =>
      s"(${r.getLong(0)},${r.getLong(1)},${r.getDouble(2)},${r.getInt(3)})").mkString(";"))

    // misuse probe: non-literal k must produce a clear error
    try {
      spark.sql("SELECT minhash_sig(array('a'), doc_id + 0) FROM documents LIMIT 1").collect()
      println("misuse=NOT-REJECTED")
    } catch {
      case e: Throwable => println("misuse=rejected: " +
        Option(e.getMessage).getOrElse("").linesIterator.next())
    }
    spark.stop()
  }
}
