package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Jsonl

/** L58 JSONL source/sink: lossless roundtrip, gzip shards, explicit
  * schema, corrupt-line tolerance. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = Files.createTempDirectory(s"graft_jsonl_$name")
    p.toFile.deleteOnExit()
    s"$p/out"
  }

  test("roundtrip preserves rows, types, and text bytes") {
    val docs = table("documents")
    val path = tmp("rt")
    val back = Jsonl.roundtrip(docs, path, partitions = Some(4))
    assert(back.schema == docs.schema, "explicit-schema read keeps types")
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("writer honors the gzip codec and the shard count") {
    val path = tmp("gz")
    Jsonl.write(table("documents"), path, "gzip", Some(3))
    val shards = Files.list(Paths.get(path)).toArray.map(_.toString)
      .filter(_.endsWith(".json.gz"))
    assert(shards.length == 3, s"expected 3 gzip shards, got ${shards.toSeq}")
  }

  test("csv roundtrip survives quotes, delimiters, and embedded newlines") {
    import graft.sources.Csv
    val nasty = Seq(
      (1L, "plain text"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line one\nline two"),
      (5L, "trailing space "),
      (6L, ""))
      .toDF("id", "txt")
    val path = tmp("csv")
    val back = Csv.roundtrip(nasty, path, multiLine = true)
    // CSV reads are always nullable; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      nasty.schema.map(f => (f.name, f.dataType)))
    val a = nasty.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    // CSV has no representation distinguishing empty string from null:
    // accept the documented coercion on the empty row, byte-exact rest
    assert(a.take(5) == b.take(5), s"non-empty rows must round-trip: $b")
    assert(b(5).isNullAt(1) || b(5).getString(1).isEmpty)
  }

  test("csv roundtrip on the documents table is byte-exact") {
    import graft.sources.Csv
    val docs = table("documents")
    val back = Csv.roundtrip(docs, tmp("csvdocs"), partitions = Some(3))
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("corrupt lines surface in _corrupt_record instead of failing the read") {
    val path = tmp("bad")
    Jsonl.write(Seq((1L, "alpha"), (2L, "beta")).toDF("id", "txt"), path, "none")
    // append a malformed shard by hand
    val extra = Paths.get(path, "zz-malformed.json")
    Files.writeString(extra, "{\"id\": 3, \"txt\": \"ok\"}\nnot json at all\n")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("txt", StringType), StructField("_corrupt_record", StringType)))
    val got = Jsonl.read(spark, path, schema)
      .select("id", "txt", "_corrupt_record").collect()
    assert(got.length == 4)
    val bad = got.filter(r => !r.isNullAt(2))
    assert(bad.length == 1 && bad.head.getString(2) == "not json at all")
    assert(got.count(r => !r.isNullAt(0)) == 3, "parseable rows survive")
  }
}
