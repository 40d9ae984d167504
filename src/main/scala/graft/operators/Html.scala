package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction (the WET-extraction stage a web
  * corpus pipeline runs before ANY of the curation/dedup operators —
  * CommonCrawl's WARC→WET step, trafilatura/jusText's line-density
  * heuristic; ref has no counterpart, this is LLM-pipeline surface).
  *
  * Everything is pure codegen'd column algebra — regexp_replace /
  * split / higher-order functions — so the pass is map-only: at 100 TB
  * it streams through the corpus with ZERO shuffle, and the regex
  * vocabulary is held to the RE2 ∩ java.util.regex dialect (the Q12
  * contract) so the DuckDB oracle replays it byte-for-byte.
  *
  * Pipeline per document:
  *   1. drop `<script>`/`<style>` BLOCKS (non-greedy `(?is)`, so a
  *      literal "</p>" inside a script never fabricates a line break);
  *   2. block-level close tags + `<br>` become newlines → lines;
  *   3. per line: count `<a` anchors, strip all tags, decode the six
  *      common HTML entities (`&amp;` LAST — the standard chained-
  *      unescape order), collapse runs of spaces/tabs;
  *   4. boilerplate cut: keep a line iff it has ≥ `minWords` words AND
  *      link density ≤ 1/2 — expressed as `2·links ≤ words`, integer
  *      arithmetic so the decision is exact on every engine (nav bars
  *      and footers are mostly anchors; body text is not).
  *
  * The per-line regex work runs ONCE per line: the struct-building
  * `transform` is kept in its own projection (CollapseProject leaves a
  * non-cheap expression referenced 5× in place), and the keep/count
  * consumers only touch struct fields.
  */
object Html {

  /** Six-entity chained unescape; `&amp;` decoded last so escaped
    * entities (`&amp;lt;`) come out as their literal text — the
    * standard order for replace-chain unescaping. */
  private def unescape(c: Column): Column = {
    val pre = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
    val partial = pre.foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
    regexp_replace(partial, "&amp;", "&")
  }

  private val blockStrip = "(?is)<(?:script|style)[^>]*>.*?</(?:script|style)>"
  private val lineBreaks = "(?i)</(?:p|div|li|h[1-6]|tr|td|table|ul|ol|title)>|<br[^>]*>"
  private val anchorPat  = "(?i)<a[ >]"
  private val tagPat     = "<[^>]*>"

  /** Per-line (txt, links, words) structs for an HTML column — the
    * shared body of [[htmlExtract]] and [[htmlExtractText]]. */
  private def lineStructs(html: Column): Column = {
    val lined = regexp_replace(
      regexp_replace(html, blockStrip, " "), lineBreaks, "\n")
    // one struct per line, regex chain evaluated once per line
    val base = transform(split(lined, "\n"), ln => {
      val txt = trim(regexp_replace(
        unescape(regexp_replace(ln, tagPat, " ")), "[ \t]+", " "))
      struct(
        txt.as("txt"),
        regexp_count(ln, lit(anchorPat)).cast("long").as("links"))
    })
    transform(base, s => struct(
      s.getField("txt").as("txt"),
      s.getField("links").as("links"),
      when(s.getField("txt") === "", lit(0L))
        .otherwise(size(split(s.getField("txt"), " ")).cast("long")).as("words")))
  }

  private def keepPredFor(minWords: Int)(s: Column): Column =
    s.getField("words") >= minWords &&
      s.getField("links") * 2 <= s.getField("words")

  /** The extraction applied IN PLACE: the html column replaced by its
    * extracted text, every other column preserved — the chainable
    * pipeline-step shape (the piiScrubText convention), feeding the
    * downstream curation vocabulary whose operators expect plain
    * text. Still map-only. */
  def htmlExtractText(df: DataFrame, htmlCol: String,
                      minWords: Int = 3): DataFrame =
    df.withColumn(htmlCol,
      array_join(transform(filter(lineStructs(col(htmlCol)),
        keepPredFor(minWords) _), (s: Column) => s.getField("txt")), "\n"))

  /** Outbound links with their anchor text — the edge SOURCE for the
    * link-graph authority pass ([[Graph.pageRank]]): WARC → (WET text
    * via [[htmlExtract]]) + (link graph via this) is the full
    * web-corpus front end. One row per `<a href="...">` in document
    * order: (id, link_no, href, anchor) — anchors get the same tag
    * strip / entity decode / whitespace collapse as extracted lines.
    * Map-only (rows ∝ links); double-quoted hrefs only, per the
    * RE2 ∩ Java dialect contract (no backreferences to support other
    * quoting). */
  def htmlLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val pat = "(?is)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"
    val links = zip_with(
      regexp_extract_all(col(htmlCol), lit(pat), lit(1)),
      regexp_extract_all(col(htmlCol), lit(pat), lit(2)),
      (h, a) => struct(
        h.as("href"),
        trim(regexp_replace(
          unescape(regexp_replace(a, tagPat, " ")), "[ \t]+", " ")).as("anchor")))
    df.select(col(idCol), posexplode(links).as(Seq("__p", "__l")))
      .select(col(idCol), (col("__p") + 1).as("link_no"),
        col("__l.href").as("href"), col("__l.anchor").as("anchor"))
  }

  /** Canonical URL — the dedup/join key a crawl frontier and a
    * URL-level dedup pass group by (two fetches of `HTTP://WWW.X.COM:80
    * /a#top` and `http://x.com/a` are the same page). Pure chained
    * regex/string algebra in the RE2 ∩ Java dialect: trim → strip
    * fragment → lowercase the scheme://host[:port] prefix → drop the
    * default port (:80 http / :443 https) → drop a leading `www.` →
    * ensure a non-empty path. Deliberately NOT full RFC 3986 dot-
    * segment resolution (iterative — not one-pass column algebra);
    * crawl pipelines apply this same pragmatic subset. */
  def urlNormalize(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "(?s)#.*", "")
    val prefix = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*).*", 1))
    val rest = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*(.*)", 1)
    val noPort = regexp_replace(
      regexp_replace(prefix, "^(http://[^/:]*):80$", "$1"),
      "^(https://[^/:]*):443$", "$1")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    // a URL with no scheme://host prefix passes through untouched
    // (relative href — resolution needs the base URL, not a rewrite)
    when(prefix === "", trim(url))
      .otherwise(concat(noWww, when(rest === "", lit("/")).otherwise(rest)))
  }

  /** Lowercased host of an absolute URL ('' for relative hrefs) — the
    * domain key per-domain quality/topk/mixing operators group by. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(trim(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*).*", 1))

  /** Extract per-document training text + extraction stats from a raw
    * HTML column. Output: (id, content, n_lines, n_kept, n_links,
    * n_words) — `content` is the kept lines joined by '\n'. */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String,
                  minWords: Int = 3): DataFrame = {
    def keepPred(s: Column): Column = keepPredFor(minWords)(s)

    df.select(col(idCol), lineStructs(col(htmlCol)).as("__ls"))
      .select(
        col(idCol),
        array_join(transform(filter(col("__ls"), keepPred _),
          (s: Column) => s.getField("txt")), "\n").as("content"),
        size(filter(col("__ls"),
          (s: Column) => s.getField("words") > 0)).cast("long").as("n_lines"),
        size(filter(col("__ls"), keepPred _)).cast("long").as("n_kept"),
        aggregate(col("__ls"), lit(0L),
          (a: Column, s: Column) => a + s.getField("links")).as("n_links"),
        aggregate(filter(col("__ls"), keepPred _), lit(0L),
          (a: Column, s: Column) => a + s.getField("words")).as("n_words"))
  }

  /** L14 — blocklist URL filtering (the first cut every web-corpus
    * pipeline applies: adult/spam domain blocklists plus per-site path
    * rules — RefinedWeb §3.1, CCNet's URL filtering). Rules are a
    * DataFrame (rule_id, host_suffix, path_prefix nullable): a rule
    * matches a URL when its host equals the suffix or ends with
    * "." + suffix (label-boundary suffix semantics), and — when
    * path_prefix is set — the canonical path starts with it.
    *
    * Scale shape: the host explodes into its label-boundary suffixes
    * (≤ label count per row, a small constant) and matches rules by
    * EQUI-join on the suffix — never a LIKE/regex scan per rule, so a
    * multi-million-rule blocklist joins in one exchange (or
    * broadcasts when small; Spark picks by size). Verdict folds as a
    * map-combinable min(rule_id) per URL. Output: (id, canon,
    * blocked, rule_id) — rule_id NULL when unblocked. */
  def urlFilter(df: DataFrame, idCol: String, urlCol: String,
                rules: DataFrame): DataFrame = {
    val base = df.select(
      col(idCol),
      urlNormalize(col(urlCol)).as("canon"),
      urlHost(col(urlCol)).as("host"))
      .withColumn("path",
        regexp_extract(col("canon"), "^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1))
    val parts = split(col("host"), "\\.")
    val sufs = transform(sequence(lit(0), size(parts) - 1),
      i => array_join(slice(parts, i + 1, size(parts)), "."))
    val hits = base
      .withColumn("suffix", explode(sufs))
      .join(rules, col("suffix") === col("host_suffix"))
      .where(col("path_prefix").isNull ||
        col("path").startsWith(col("path_prefix")))
      .groupBy(idCol).agg(min(col("rule_id")).as("rule_id"))
    base.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("canon"),
        col("rule_id").isNotNull.as("blocked"), col("rule_id"))
      .orderBy(idCol)
  }

  /** L15 — robots.txt → blocklist rules (RFC 9309 subset): the
    * compliance source every polite crawler parses before fetching.
    * Input: one robots.txt body per host. A `Disallow:` line yields a
    * (host, path_prefix) rule iff the group it belongs to — the run
    * of consecutive `User-agent:` lines nearest above it (RFC 9309
    * §2.1: a UA run shares one rule group) — names `*` (per-bot
    * groups are ignored; this engine crawls as `*`). Empty
    * `Disallow:` (allow-all), comments and non-field lines drop.
    * Output (rule_id, host_suffix, path_prefix) feeds [[urlFilter]]
    * directly; `rule_id` is the first 15 md5 hex digits of
    * `host:line_no` — deterministic, engine-replayable, no global
    * ordering pass. (Note [[urlFilter]]'s suffix semantics are a
    * superset of strict per-authority robots scope; feed exact-host
    * URL tables or accept subdomain inheritance.)
    *
    * Shape: lines posexplode (rows ∝ robots lines, KB per host), two
    * per-host windows (bounded by FILE size, never corpus size) to
    * resolve UA runs and carry the governing run forward, then one
    * (host, run) equi-join of disallow lines against star-runs —
    * no range join, no global window. */
  def robotsRules(df: DataFrame, hostCol: String, robotsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fieldPat = "(?i)^\\s*(user-agent|disallow)\\s*:\\s*(\\S*)\\s*$"
    val lines = df.select(
      col(hostCol).as("host"),
      posexplode(split(col(robotsCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("line", regexp_replace(col("line"), "#.*", ""))
      .withColumn("field", lower(regexp_extract(col("line"), fieldPat, 1)))
      .withColumn("value", regexp_extract(col("line"), fieldPat, 2))
      .where(col("field") =!= "")
    val byLine = Window.partitionBy("host").orderBy("line_no")
    val carry = byLine.rowsBetween(Window.unboundedPreceding, 0)
    // run head: a UA line not directly preceded (among FIELD lines)
    // by another UA line starts a new group
    val runs = lines
      .withColumn("prev_field", lag("field", 1).over(byLine))
      .withColumn("run_head",
        when(col("field") === "user-agent" && (
          col("prev_field").isNull || col("prev_field") =!= "user-agent"),
          col("line_no")))
      .withColumn("run_id", last("run_head", ignoreNulls = true).over(carry))
    // star groups: (host, run) where any UA line of the run names *
    val starRuns = runs
      .where(col("field") === "user-agent" && col("value") === "*")
      .select(col("host"), col("run_id")).distinct()
    runs
      .where(col("field") === "disallow" && col("value") =!= "")
      .join(starRuns, Seq("host", "run_id"), "leftsemi")
      .select(
        expr("CAST(CONV(substring(md5(concat(host, ':', CAST(line_no AS STRING))), 1, 15), 16, 10) AS BIGINT)")
          .as("rule_id"),
        col("host").as("host_suffix"), col("value").as("path_prefix"))
  }

  /** L13 — anchor-text aggregation: the classic web-retrieval signal
    * (what OTHER pages call a page describes it better than the page
    * itself — Brin & Page 1998 §2.2; web corpora also use it as a
    * per-URL quality/topic prior). Input is a [[htmlLinks]]-shaped
    * link table with a RESOLVED target column; output is the top-`k`
    * anchor terms per target: (target, term, cnt, rank).
    *
    * Shape: one keyed partial-agg exchange on (target, term) — the hot
    * static-nav terms ("home", "terms") combine map-side, so the hot
    * key cost is ∝ partitions, not rows — then a (cnt DESC, term ASC)
    * row_number per target whose `rank <= k` filter Spark rewrites to
    * a WindowGroupLimit: each shuffle side keeps only k rows per
    * target before the final sort. Nothing is corpus-proportional
    * after the first agg; at 100 TB the term table is ∝ distinct
    * (target, term), orders of magnitude smaller than the link list. */
  def anchorTerms(links: DataFrame, targetCol: String, anchorCol: String,
                  k: Int): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    val terms = links
      .select(col(targetCol).as("target"),
        explode(split(lower(col(anchorCol)), " ")).as("term"))
      .where(col("term") =!= "")
    terms.groupBy("target", "term").agg(count(lit(1)).as("cnt"))
      .withColumn("rank",
        row_number().over(Window.partitionBy("target")
          .orderBy(col("cnt").desc, col("term"))).cast("int"))
      .where(col("rank") <= k)
  }
}
