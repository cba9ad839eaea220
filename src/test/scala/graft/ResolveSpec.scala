package graft

import org.apache.spark.sql.functions._

import graft.operators.Resolve

/** L57 fuzzy entity resolution: token-blocked Levenshtein matching over
  * the distinct-value inventory, transitive canonicalization, and the
  * survivorship rollup. */
class ResolveSpec extends SparkSpec {
  import spark.implicits._

  private def inv(names: String*) =
    Resolve.inventory(names.toDF("name"), "name")

  test("fuzzy pairs: verified Levenshtein within the token blocks") {
    val pairs = Resolve.fuzzyPairs(
      inv("red bolt", "rad bolt", "red bolts", "blue gear"), 2)
      .select("name_a", "name_b", "dist")
      .as[(String, String, Int)].collect().toSet
    // note "rad bolt"/"red bolts" (dist 2) is absent: its tokens
    // ("rad","bolt") and ("red","bolts") share no exact token, so
    // blocking never pairs them — but both still canonicalize together
    // transitively through "red bolt".
    assert(pairs == Set(
      ("rad bolt", "red bolt", 1),
      ("red bolt", "red bolts", 1)))
  }

  test("token blocking contract: a pair sharing no token is never considered") {
    // "cat dog" vs "cot dig" is distance 2 but shares no whitespace
    // token — the blocking (replayed identically by the oracle) skips it.
    val pairs = Resolve.fuzzyPairs(inv("cat dog", "cot dig"), 2)
    assert(pairs.isEmpty)
  }

  test("canonicalize is transitive: chained variants collapse to one entity") {
    // aaaa~aabb (2) and aabb~bbbb (2) but aaaa~bbbb is 4 — only the
    // transitive closure maps all three to the same canon.
    val i = inv("aaaa x", "aabb x", "bbbb x", "solo y")
    val m = Resolve.canonicalize(i, Resolve.fuzzyPairs(i, 2))
      .as[(String, String)].collect().toMap
    assert(m("aaaa x") == "aaaa x")
    assert(m("aabb x") == "aaaa x")
    assert(m("bbbb x") == "aaaa x")
    assert(m("solo y") == "solo y") // singleton maps to itself
  }

  test("survivorship rollup merges variant counts under the canon") {
    val rows = Seq("acme corp", "acme corp", "acme c0rp", "other co")
      .toDF("src")
    val canon = Resolve.canonicalMap(rows, "src", 2)
    val rolled = Resolve.applyCanonical(rows, "src", canon)
      .groupBy("canon").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // '0' < 'o' so the canonical spelling is "acme c0rp"
    assert(rolled == Map("acme c0rp" -> 3L, "other co" -> 1L))
  }

  test("driver union-find == distributed propagation on the same pair graph") {
    // chains, a cycle, singletons — the union-find fast path and the
    // Dedup.clusters fallback (forced via maxDriverPairs = 0) must
    // emit the identical canonical map
    val vals = Seq("aaaa x", "aaab x", "aabb x", "bbbb x", "solo y",
      "ring a", "ring b", "ring c", "lone z")
    val i = Resolve.inventory(vals.toDF("v"), "v")
    val pairs = Resolve.fuzzyPairs(i, 2)
    val fast = Resolve.canonicalize(i, pairs)
      .as[(String, String)].collect().toMap
    val dist = Resolve.canonicalize(i, pairs, maxDriverPairs = 0)
      .as[(String, String)].collect().toMap
    assert(fast == dist)
  }

  test("inventory is the only corpus-sized input: pair graph is value-level") {
    // 1000 rows but only 3 distinct values -> at most 3 inventory rows
    // and 1 verified pair, independent of row count.
    val rows = (0 until 1000).map(i => Seq("hot rod", "hot ro", "cold x")(i % 3))
      .toDF("v")
    val i = Resolve.inventory(rows, "v")
    assert(i.count() == 3)
    val p = Resolve.fuzzyPairs(i, 2).collect()
    assert(p.length == 1)
  }
}
