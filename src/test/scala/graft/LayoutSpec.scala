package graft

import java.nio.file.{Files, Paths}

import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  test("writeSized bounds files per partition dir and loses no rows") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Files.createTempDirectory("layout").toString
    Layout.writeSized(d, out, Seq("lang"), filesPerPartition = 3, idCol = "doc_id")
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).toSeq
    assert(langDirs.size >= 2, "expected multiple partition dirs")
    langDirs.foreach { dir =>
      val files = dir.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files <= 3, s"${dir.getName}: $files files > bound 3")
      assert(files >= 1)
    }
    val back = spark.read.parquet(out)
    assert(back.count() == d.count())
    assert(back.columns.sorted.toSeq == d.columns.sorted.toSeq)
  }
}
