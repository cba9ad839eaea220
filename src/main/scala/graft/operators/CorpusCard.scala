package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L74: corpus card — the release document of a curated corpus, built
  * from pieces that are each already oracled/spec-gated: per-(lang,
  * source) accounting (L22), the language mixture (L33's input), and
  * the per-source rule attrition scorecard (L55). Two surfaces:
  *
  *   - [[cardRows]]: the card's NUMERIC content as a long-format
  *     (section, grp_a, grp_b, metric, value) frame — every value an
  *     exact integer, so the whole card carries a DuckDB hash oracle
  *     (`q_corpus_card`). This is the machine-readable artifact a
  *     release pipeline diffs against the previous release.
  *   - [[markdown]]: the human-readable card rendered from those rows
  *     (driver-side over the card-sized frame — the corpus is never
  *     re-read for prose).
  *
  * Cost: TWO corpus passes total (one for stats+mix — mix derives from
  * the stats aggregate, not a re-scan — one for the scorecard's fused
  * rule kernels), regardless of how many numbers the card shows.
  * Compose with [[graft.sources.Manifest]] for the shard-integrity
  * section of an exported release.
  */
object CorpusCard {

  def cardRows(docs: DataFrame, idCol: String, textCol: String,
               langCol: String, sourceCol: String,
               stopWords: Seq[String], blocklist: Seq[String],
               minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    import graft.functions._
    val stats = docs
      .groupBy(col(langCol).as("grp_a"), col(sourceCol).as("grp_b"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col(textCol))).as("n_distinct"),
        sum(token_count(col(textCol))).as("sum_tokens"))
    val statsLong = stats.selectExpr("'stats' AS section", "grp_a", "grp_b",
      """stack(3, 'n_docs', n_docs, 'n_distinct', n_distinct,
        |'sum_tokens', sum_tokens) AS (metric, value)""".stripMargin)
    val perLang = stats.groupBy("grp_a").agg(sum("sum_tokens").as("tk"))
    val tot = perLang.agg(sum("tk").as("tot"))
    val mixLong = perLang.crossJoin(broadcast(tot))
      .select(lit("mix").as("section"), col("grp_a"), lit("").as("grp_b"),
        lit("share_pm").as("metric"), expr("tk * 1000 div tot").as("value"))
    val rulesLong = Curate.scorecard(docs, idCol, textCol, sourceCol,
        stopWords, blocklist, minWords, maxWords)
      .selectExpr("'rules' AS section", "'' AS grp_a", "grp AS grp_b",
        """stack(5, 'n_docs', n_docs, 'pass_gopher', pass_gopher,
          |'pass_repetition', pass_repetition,
          |'pass_blocklist', pass_blocklist,
          |'pass_all', pass_all) AS (metric, value)""".stripMargin)
    statsLong.unionByName(mixLong).unionByName(rulesLong)
      .orderBy("section", "grp_a", "grp_b", "metric")
  }

  /** 11a: the per-tenant twin of [[cardRows]] — one full card per
    * tenant (the grouping column: data provider, customer, bucket of
    * a multi-tenant lake): composition and language mixture computed
    * WITHIN each tenant (share_pm sums to ~1000 per tenant, so a
    * tenant's mixture is readable without cross-tenant context), rule
    * attrition grouped (tenant, lang). Long format (tenant, section,
    * grp_a, metric, value), every value an exact integer → full DuckDB
    * hash oracle (`q_corpus_card_grouped`). Same TWO corpus passes as
    * the global card regardless of tenant count: the tenant key rides
    * the existing groupBy shuffles. */
  def cardRowsGrouped(docs: DataFrame, idCol: String, textCol: String,
                      langCol: String, tenantCol: String,
                      stopWords: Seq[String], blocklist: Seq[String],
                      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    import graft.functions._
    val stats = docs
      .groupBy(col(tenantCol).as("tenant"), col(langCol).as("grp_a"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col(textCol))).as("n_distinct"),
        sum(token_count(col(textCol))).as("sum_tokens"))
    val statsLong = stats.selectExpr("tenant", "'stats' AS section", "grp_a",
      """stack(3, 'n_docs', n_docs, 'n_distinct', n_distinct,
        |'sum_tokens', sum_tokens) AS (metric, value)""".stripMargin)
    // per-tenant totals are tenant-count-sized — broadcast into the mix
    val tot = stats.groupBy("tenant").agg(sum("sum_tokens").as("tot"))
    val mixLong = stats.join(broadcast(tot), "tenant")
      .select(col("tenant"), lit("mix").as("section"), col("grp_a"),
        lit("share_pm").as("metric"),
        expr("sum_tokens * 1000 div tot").as("value"))
    val rulesLong = Curate.scorecardBy(docs, idCol, textCol,
        Seq(tenantCol, langCol), stopWords, blocklist, minWords, maxWords)
      .selectExpr(s"$tenantCol AS tenant", "'rules' AS section",
        s"$langCol AS grp_a",
        """stack(5, 'n_docs', n_docs, 'pass_gopher', pass_gopher,
          |'pass_repetition', pass_repetition,
          |'pass_blocklist', pass_blocklist,
          |'pass_all', pass_all) AS (metric, value)""".stripMargin)
    statsLong.unionByName(mixLong).unionByName(rulesLong)
      .orderBy("tenant", "section", "grp_a", "metric")
  }

  /** Render the grouped card rows ([[cardRowsGrouped]]) as one
    * markdown document with a section per tenant. Driver-side collect
    * of the CARD (tenants × sections × langs rows, never the
    * corpus). */
  def markdownGrouped(card: DataFrame, title: String): String = {
    val rows = card.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val sb = new StringBuilder
    sb ++= s"# Corpus card (per tenant): $title\n"
    def v(ten: String, sec: String, a: String, m: String): Long =
      rows.collectFirst {
        case (`ten`, `sec`, `a`, `m`, x) => x
      }.getOrElse(0L)
    for (ten <- rows.map(_._1).distinct.sorted) {
      sb ++= s"\n## Tenant: $ten\n"
      val langs = rows.filter(r => r._1 == ten && r._2 == "stats")
        .map(_._3).distinct.sorted
      sb ++= "\n### Composition + mixture (per lang)\n\n"
      sb ++= "| lang | docs | distinct | tokens | share_pm |\n|---|---|---|---|---|\n"
      for (a <- langs)
        sb ++= s"| $a | ${v(ten, "stats", a, "n_docs")} | " +
          s"${v(ten, "stats", a, "n_distinct")} | " +
          s"${v(ten, "stats", a, "sum_tokens")} | " +
          s"${v(ten, "mix", a, "share_pm")} |\n"
      sb ++= "\n### Rule attrition (per lang)\n\n"
      sb ++= "| lang | docs | gopher | repetition | blocklist | all |\n|---|---|---|---|---|---|\n"
      for (a <- rows.filter(r => r._1 == ten && r._2 == "rules")
             .map(_._3).distinct.sorted)
        sb ++= s"| $a | ${v(ten, "rules", a, "n_docs")} | " +
          s"${v(ten, "rules", a, "pass_gopher")} | " +
          s"${v(ten, "rules", a, "pass_repetition")} | " +
          s"${v(ten, "rules", a, "pass_blocklist")} | " +
          s"${v(ten, "rules", a, "pass_all")} |\n"
    }
    sb.result()
  }

  /** Render the card rows as a markdown release document. Driver-side
    * collect of the CARD (sections × groups rows, never the corpus). */
  def markdown(card: DataFrame, title: String): String = {
    val rows = card.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val sb = new StringBuilder
    sb ++= s"# Corpus card: $title\n"
    val stats = rows.filter(_._1 == "stats")
    val langs = stats.map(_._2).distinct.sorted
    def v(sec: String, a: String, b: String, m: String): Long =
      rows.collectFirst {
        case (`sec`, `a`, `b`, `m`, x) => x
      }.getOrElse(0L)
    sb ++= "\n## Composition (docs / distinct / tokens per lang+source)\n\n"
    sb ++= "| lang | source | docs | distinct | tokens |\n|---|---|---|---|---|\n"
    for ((a, b) <- stats.map(t => (t._2, t._3)).distinct.sorted)
      sb ++= s"| $a | $b | ${v("stats", a, b, "n_docs")} | " +
        s"${v("stats", a, b, "n_distinct")} | ${v("stats", a, b, "sum_tokens")} |\n"
    sb ++= "\n## Language mixture (token share, per-mille)\n\n"
    sb ++= "| lang | share |\n|---|---|\n"
    for (a <- langs)
      sb ++= s"| $a | ${v("mix", a, "", "share_pm")} |\n"
    sb ++= "\n## Rule attrition per source (docs passing each family)\n\n"
    sb ++= "| source | docs | gopher | repetition | blocklist | all |\n|---|---|---|---|---|---|\n"
    for (b <- rows.filter(_._1 == "rules").map(_._3).distinct.sorted)
      sb ++= s"| $b | ${v("rules", "", b, "n_docs")} | " +
        s"${v("rules", "", b, "pass_gopher")} | " +
        s"${v("rules", "", b, "pass_repetition")} | " +
        s"${v("rules", "", b, "pass_blocklist")} | " +
        s"${v("rules", "", b, "pass_all")} |\n"
    sb.result()
  }

  /** [[markdown]] plus a shard-integrity section from a
    * [[graft.sources.Manifest]] frame (`(shard, n_rows, key_xor)`) —
    * the complete release document: composition + mixture + attrition
    * + the checksums a consumer validates the download against
    * (`Manifest.validate`). The manifest frame is shard-sized
    * (driver-safe). */
  def markdownWithManifest(card: DataFrame, manifest: DataFrame,
                           title: String): String = {
    val sb = new StringBuilder(markdown(card, title))
    sb ++= "\n## Shard manifest (validate with Manifest.validate)\n\n"
    sb ++= "| shard | rows | key_xor |\n|---|---|---|\n"
    manifest.orderBy("shard").collect().foreach { r =>
      sb ++= s"| ${r.getAs[String]("shard")} | ${r.getAs[Long]("n_rows")} | " +
        f"${r.getAs[Long]("key_xor")}%016x |\n"
    }
    sb.result()
  }
}
