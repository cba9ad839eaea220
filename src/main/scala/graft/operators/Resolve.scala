package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution / value canonicalization (SURVEY.md §2 L57).
  *
  * The curation problem: the same real-world entity arrives under
  * near-identical spellings ("red bolt" / "rad bolt", mixed-case
  * domains, typo'd source labels), and per-entity statistics (source
  * caps, domain balancing, per-source scorecards) silently fragment
  * across the variants. The classic fix is record linkage: block,
  * verify with an edit-distance, cluster, canonicalize.
  *
  * Scale design — resolve the DISTINCT-VALUE INVENTORY, not the rows:
  *  1. [[inventory]] collapses the corpus to one row per distinct
  *     value with its support count (Zipf-small: the inventory is
  *     vocabulary-bounded, it does NOT grow with corpus rows).
  *  2. [[fuzzyPairs]] token-blocks the inventory (candidates must
  *     share >= 1 whitespace token and sit within a `maxDist` length
  *     band) and verifies candidates with exact Levenshtein — the
  *     standard blocking join, never O(|inventory|²) and never
  *     touching corpus rows.
  *  3. [[canonicalize]] runs min-label propagation over the verified
  *     pair graph (reusing [[Dedup.clusters]], which is generic over
  *     orderable ids — here the labels are the strings themselves), so
  *     every variant maps to the lexicographically-smallest member of
  *     its transitive cluster; singletons map to themselves.
  *  4. Appliers join the (tiny, broadcastable) canonical map back to
  *     the corpus — the only full-corpus pass in the whole chain.
  *
  * Completeness caveat (shared with every blocking scheme, and
  * replayed identically by the DuckDB oracle): a pair within `maxDist`
  * that shares NO whitespace token is never considered. For
  * multi-token values and small `maxDist` such pairs require edits
  * concentrated in every token at once and are vanishingly rare; the
  * oracle uses the same blocks, so both engines miss the same pairs.
  *
  * Reference: the quebic reference has no fuzzy matching; this is part
  * of the training-data-pipeline surface (per-source accounting needs
  * canonical sources).
  */
object Resolve {

  /** One row per distinct value of `valueCol` with its support count:
    * `(name, n)`. */
  def inventory(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(col(valueCol).as("name")).agg(count(lit(1)).as("n"))

  /** Token-blocked fuzzy pairs over a distinct-value inventory
    * `(name, n)`: rows `(name_a, name_b, dist, n_a, n_b)` with
    * `name_a < name_b` and `dist = levenshtein <= maxDist`.
    *
    * Candidates are generated per shared token (explode + self-equi-
    * join on the token — an equi-join, so it shuffles on a well-spread
    * key and never goes cartesian), de-duplicated, banded on length
    * (|len(a)-len(b)| <= maxDist is a necessary condition for the
    * distance bound — free pruning before the O(len²) verify), then
    * verified with the exact codegen `levenshtein`. */
  def fuzzyPairs(inv: DataFrame, maxDist: Int): DataFrame = {
    val tok = inv.select(col("name"),
        explode(split(col("name"), " ")).as("tk"))
      .filter(length(col("tk")) > 0)
    val cand = tok.as("a")
      .join(tok.as("b"),
        col("a.tk") === col("b.tk") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
    val counts = inv.select(col("name"), col("n"))
    cand
      .join(broadcast(counts.withColumnRenamed("name", "name_a")
        .withColumnRenamed("n", "n_a")), "name_a")
      .join(broadcast(counts.withColumnRenamed("name", "name_b")
        .withColumnRenamed("n", "n_b")), "name_b")
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }

  /** Canonical map `(name, canon)` over the whole inventory: `canon`
    * is the lexicographically-smallest member of the name's transitive
    * fuzzy cluster; names with no fuzzy neighbor map to themselves.
    *
    * The fuzzy pair graph is INVENTORY-bounded (vocabulary-scale — a
    * model artifact, never corpus-row-sized), so the transitive
    * closure runs as a driver-side union-find over the collected pair
    * list: one job, zero propagation rounds. Distributed min-label
    * propagation ([[Dedup.clusters]]) paid ~4 rounds of fixed
    * job-scheduling cost for a graph that fits driver memory by
    * construction; it remains the fallback should an inventory ever
    * outgrow `maxDriverPairs` (the same bounded-artifact contract as
    * collecting centroids or vocab tables). */
  def canonicalize(inv: DataFrame, pairs: DataFrame,
                   maxDriverPairs: Int = 2000000): DataFrame = {
    val es = pairs.select("name_a", "name_b")
      .limit(maxDriverPairs + 1).collect()
    val clustered =
      if (es.length > maxDriverPairs)
        Dedup.clusters(pairs, "name_a", "name_b")
          .select(col("id").as("name"), col("cluster").as("canon"))
      else {
        // union-find where the smaller root always wins: each tree's
        // root is inductively the min member of its component, so
        // find(x) IS the canonical label — no second pass needed
        val parent = scala.collection.mutable.HashMap.empty[String, String]
        def find(x: String): String = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) {
            val nx = parent(c); parent(c) = r; c = nx
          }
          r
        }
        es.foreach { row =>
          val ra = find(row.getString(0)); val rb = find(row.getString(1))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val names = es.iterator
          .flatMap(r => Iterator(r.getString(0), r.getString(1)))
          .distinct.toSeq
        val sp = inv.sparkSession
        import sp.implicits._
        broadcast(names.map(nm => (nm, find(nm))).toDF("name", "canon"))
      }
    inv.select("name")
      .join(clustered, Seq("name"), "left")
      .select(col("name"), coalesce(col("canon"), col("name")).as("canon"))
  }

  /** Full chain: inventory -> blocked fuzzy pairs -> transitive
    * canonical map for `valueCol` of `df`. */
  def canonicalMap(df: DataFrame, valueCol: String, maxDist: Int): DataFrame = {
    val inv = inventory(df, valueCol)
    canonicalize(inv, fuzzyPairs(inv, maxDist))
  }

  /** Survivorship rollup: corpus rows re-keyed by canonical value via
    * one broadcast join (the map is inventory-sized), aggregated per
    * canonical entity. Emits `(canon, n_rows, n_variants)` plus any
    * caller-side aggregates appended downstream. */
  def applyCanonical(df: DataFrame, valueCol: String,
                     canon: DataFrame): DataFrame =
    df.join(broadcast(canon.withColumnRenamed("name", valueCol)), valueCol)
}
