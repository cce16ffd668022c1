package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.ContainsAny

/** Link cleaning / extraction operators of the crawl pipeline, re-expressed
  * as Spark `Column` transforms (SURVEY.md §2.1, §2.3, §2.8).
  *
  * All operators are pure column expressions (codegen'd, no UDF in the hot
  * path) so Catalyst can push them into scans and keep them inside
  * whole-stage codegen — at 100 TB the frontier-cleaning filter chain runs
  * once per extracted link and must not break the codegen span.
  */
object LinkOps {

  /** The reference's substring blacklist: the 28 distinct entries incl.
    * the case-sensitive `app`/`App` pair (reference
    * `web_spider_oo.py:195-225` lists 29 with `google` twice; contains-any
    * semantics make the duplicate a no-op, so it is dropped here).
    */
  val filterWords: Seq[String] = Seq(
    "career", "login", "main-content", "pay", "your", "form", "#",
    "account", "auth", "contact", "activate", "reservation", "book",
    "tel", "facebook", "instagram", "subscribe", "google", "linkedin",
    "youtube", "mail", "app", "App", "help", "sponsor", "terms",
    "twitter", "@")

  /** Regex shared by [[extractHrefs]], the `ExtractHrefs` Generator and
    * the DuckDB oracle: matches BeautifulSoup's `html.parser` behavior
    * (`web_spider_oo.py:251-263`) — tag and attribute names are
    * case-insensitive and attribute values may be double-quoted,
    * single-quoted, or unquoted (unquoted ends at whitespace/`>`).
    * Group 1 captures the value WITH its surrounding quotes (if any);
    * callers strip one leading/trailing quote.
    */
  val hrefPattern: String =
    """(?i)<a\s[^>]*?href\s*=\s*("[^"]*"|'[^']*'|[^\s>'"]+)"""

  /** Lenient `<a href=...>` extractor over raw HTML -> ARRAY<STRING>.
    * Re-expresses BeautifulSoup link mining (`web_spider_oo.py:251-263`)
    * with a codegen'd regexp (no external parser dep; offline build).
    * Case-insensitive, accepts `"v"`, `'v'` and bare `v` values like
    * `html.parser` does.
    */
  def extractHrefs(html: Column): Column =
    transform(
      regexp_extract_all(html, lit(hrefPattern), lit(1)),
      v => regexp_replace(v, "^[\"']|[\"']$", ""))

  /** Standard HTML entities decoded by [[htmlToText]] (and mirrored into
    * the DuckDB oracle as the same chained replaces — one source of
    * truth). Order matters: every non-`&amp;` entity first, then the
    * ampersand forms LAST, so a double-escaped `&amp;lt;` decodes exactly
    * one level — the single-pass behavior of Python's `html.unescape`
    * that BeautifulSoup's `soup.text` applies (`web_spider_oo.py:355`). */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&#39;" -> "'", "&#34;" -> "\"", "&#60;" -> "<", "&#62;" -> ">",
    "&nbsp;" -> " ", "&#160;" -> " ",
    "&#38;" -> "&", "&amp;" -> "&")

  /** HTML -> visible text (tag strip + entity decode), the K2 text-sink
    * transform (`soup.text`, `web_spider_oo.py:355,359`). Entities decode
    * AFTER the tag strip (like soup.text) and before the whitespace
    * normalization. */
  def htmlToText(html: Column): Column = {
    val stripped = regexp_replace(html, "<[^>]*>", " ")
    val decoded = htmlEntities.foldLeft(stripped) {
      case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, " +", " "))
  }

  /** F1: drop null hrefs and the bare root self-link "/"
    * (`web_spider_oo.py:293-297`). */
  def keepNonRoot(link: Column): Column = link.isNotNull && link =!= "/"

  /** F2: contains-any blacklist, fixed `not any(...)` semantics of the OO
    * rewrite (`web_spider_oo.py:292-297`; the superseded version's J2
    * product-loop was buggy, `web_spider.py:106-136` — we implement the
    * intended anti-semantics). Codegen'd single pass via [[ContainsAny]].
    */
  def hitsBlacklist(link: Column): Column = ContainsAny(link, filterWords)

  /** F2 as a composition of built-ins — reference implementation used to
    * property-test [[ContainsAny]]. */
  def hitsBlacklistComposed(link: Column): Column =
    filterWords.map(link.contains(_)).reduce(_ || _)

  /** F3: relative-link gate — keep ONLY links starting with "/"
    * (`web_spider_oo.py:299`; absolute links silently dropped, which is
    * what confines the crawl to one site). */
  def isRelative(link: Column): Column = link.startsWith("/")

  /** F3 normalization: `root_site + link[1:]` (`web_spider_oo.py:299`).
    * `root` is expected to end with "/". */
  def normalize(root: String, link: Column): Column =
    concat(lit(root), link.substr(lit(2), length(link)))

  /** Full frontier-cleaning predicate F1 ∧ ¬F2 ∧ F3 as applied at
    * `web_spider_oo.py:292-299`. */
  def keepLink(link: Column): Column =
    keepNonRoot(link) && !hitsBlacklist(link) && isRelative(link)

  /** J2: the superseded pipeline's BUGGY word filter, reproduced
    * faithfully (`web_spider.py:106-136`): the `product(links, words)`
    * loop appends a link whenever ANY word is absent from it, so a link
    * is dropped only when it contains EVERY blacklist word — the
    * intended `not any(...)` became `exists not-in`. Kept as documented
    * history; [[keepLink]] is the fixed semantics the OO rewrite intended.
    */
  def keepLinkSuperseded(link: Column): Column =
    link.isNotNull && link =!= "/" &&
      !filterWords.map(link.contains(_)).reduce(_ && _)

  /** K5/C7: filename sanitization — each of `\ / ? :` -> `_`
    * (`web_spider_oo.py:382-385`), single-pass `translate`. */
  def sanitizeFileName(url: Column): Column = translate(url, "\\/?:", "____")

  /** K5 md5 variant (designed at `web_spider_oo.py:367-376,386`):
    * `md5(root || url)` keeps filenames under the 255-char budget. */
  def md5FileKey(root: String, url: Column): Column = md5(concat(lit(root), url))

  /** F5: extension dispatch (`web_spider_oo.py:108-115`):
    * pdf -> binary sink, xlsx/xls -> skip, else text sink + link mining. */
  def route(url: Column): Column = {
    val u = lower(url)
    when(u.endsWith("pdf"), "pdf_sink")
      .when(u.endsWith("xlsx") || u.endsWith("xls"), "skip")
      .otherwise("text_sink")
  }
}
