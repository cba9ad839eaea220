package graft

import org.apache.spark.sql.functions._

import graft.functions._

class CodecSpec extends SparkSpec {
  import spark.implicits._

  test("gzip round-trip is identity and actually compresses") {
    val df = Seq("hello world " * 100, "", "short").toDF("s")
      .select(encode(col("s"), "UTF-8").as("raw"))
      .select(col("raw"), gzip_decompress(gzip_compress(col("raw"))).as("rt"),
        octet_length(gzip_compress(col("raw"))).as("clen"),
        octet_length(col("raw")).as("rlen"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("raw").sameElements(r.getAs[Array[Byte]]("rt")))
    }
    // the repetitive payload must shrink
    assert(rows(0).getAs[Int]("clen") < rows(0).getAs[Int]("rlen") / 5)
  }

  test("gzip output is valid standard gzip (magic bytes)") {
    val out = Seq("x").toDF("s")
      .select(gzip_compress(encode(col("s"), "UTF-8")).as("z"))
      .collect().head.getAs[Array[Byte]]("z")
    assert((out(0) & 0xFF) == 0x1f && (out(1) & 0xFF) == 0x8b)
  }

  test("expressions survive filters/joins inside the plan") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), gzip_compress(encode(col("text"), "UTF-8")).as("z"))
      .filter(octet_length(col("z")) > 0)
    assert(df.count() == 500)
  }
}
