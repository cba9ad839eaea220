package graft

class ExtensionsSpec extends SparkSpec {

  test("SQL surface: simhash64 / fnv64 / cosine_sim / jaccard_sorted / codecs") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    val r = s.sql(
      """SELECT
        |  simhash64(array('a','b')) AS sh,
        |  fnv64('a') AS f,
        |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
        |  jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS js,
        |  cast(gzip_decompress(gzip_compress(encode('hi', 'UTF-8'))) AS STRING) AS rt,
        |  hyperplane_lsh(array(1.0d, 2.0d), 8) AS hp,
        |  minhash_sig(array('a','b'), 4) AS ms,
        |  rolling_hash('ab') AS rh
        |""".stripMargin).collect().head
    assert(r.getAs[Double]("cs") == 1.0)
    assert(r.getAs[Double]("js") == 0.5)
    assert(r.getAs[String]("rt") == "hi")
    assert(r.getAs[scala.collection.Seq[Long]]("ms").length == 4)
    // h("ab") = (97*31 + 98) mod 1e9+7
    assert(r.getAs[Long]("rh") == 97L * 31 + 98)
    assert(r.getAs[Long]("f") == graft.functions.Kernels.fnv64(
      org.apache.spark.unsafe.types.UTF8String.fromString("a")))
  }

  test("SQL surface: max_adjacent_pair_count / approx_top_k aggregate") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    val m = s.sql(
      "SELECT max_adjacent_pair_count(array('a','b','a','b','c')) AS m")
      .collect().head.getAs[Int]("m")
    assert(m == 2) // 'a b' twice
    val hh = s.sql(
      """SELECT approx_top_k(t, 2, 16) AS hh
        |FROM (SELECT explode(array('x','x','x','y','y','z')) AS t)""".stripMargin)
      .collect().head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("hh")
    assert(hh.map(r => (r.getString(0), r.getLong(1))) == Seq(("x", 3L), ("y", 2L)))
    // count-min cells are SQL-visible too; the total mass equals n
    val cm = s.sql(
      """SELECT count_min_agg(t, 2, 8) AS cm
        |FROM (SELECT explode(array('x','x','y')) AS t)""".stripMargin)
      .collect().head.getAs[scala.collection.Seq[Long]]("cm")
    assert(cm.length == 16 && cm.sum == 6L) // 3 rows x 2 depth rows
  }

  test("a full dedup query runs in pure SQL") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    s.read.parquet(s"$sfDir/documents.parquet").limit(50)
      .createOrReplaceTempView("docs_ext")
    val n = s.sql(
      """SELECT a.doc_id, b.doc_id,
        |  jaccard_sorted(a.ids, b.ids) AS jac
        |FROM (SELECT doc_id, array_sort(array_distinct(transform(
        |        split(text, ' '), t -> fnv64(t)))) AS ids FROM docs_ext) a
        |JOIN (SELECT doc_id, array_sort(array_distinct(transform(
        |        split(text, ' '), t -> fnv64(t)))) AS ids FROM docs_ext) b
        |  ON a.doc_id < b.doc_id
        |WHERE jaccard_sorted(a.ids, b.ids) >= 0.8""".stripMargin).count()
    assert(n >= 0) // deterministic; just has to execute end to end
  }

  test("SQL surface: gopher_stats / blocklist_stats / nfc_normalize / probes") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    val r = s.sql(
      """SELECT
        |  gopher_stats('the quick fox', array('the')) AS gs,
        |  blocklist_stats('bad cat bad', array('bad', 'worse')) AS bs,
        |  nfc_normalize('cafe\u0301') AS nf,
        |  hyperplane_probes(array(1.0d, 2.0d), 8, 3) AS hp
        |""".stripMargin).collect().head
    assert(r.getAs[scala.collection.Seq[Long]]("gs").head == 3L) // n_words
    assert(r.getAs[scala.collection.Seq[Long]]("bs").toSeq == Seq(3L, 2L, 1L))
    assert(r.getAs[String]("nf") == "café")
    assert(r.getAs[scala.collection.Seq[Long]]("hp").length == 3)
    // non-literal blocklist argument fails loudly, not silently
    val ex = intercept[Exception] {
      s.sql("SELECT blocklist_stats('x', array(cast(rand() AS STRING)))")
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("foldable"))
  }

  test("SQL surface: hilbert_d2 / hilbert_d3 / top_centroids_l2") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    val r = s.sql(
      """SELECT
        |  hilbert_d2(3L, 5L, 8) AS h2,
        |  hilbert_d3(1L, 2L, 3L, 8) AS h3,
        |  top_centroids_l2(array(0.0d, 0.0d),
        |    array(array(5.0d, 0.0d), array(1.0d, 0.0d)), 2) AS tc
        |""".stripMargin).collect().head
    assert(r.getAs[Long]("h2") ==
      graft.functions.Kernels.hilbertD2(3L, 5L, 8))
    assert(r.getAs[Long]("h3") ==
      graft.functions.Kernels.hilbertD3(1L, 2L, 3L, 8))
    // nearest (index 1) first, then index 0
    assert(r.getAs[scala.collection.Seq[Int]]("tc").toSeq == Seq(1, 0))
  }
}
