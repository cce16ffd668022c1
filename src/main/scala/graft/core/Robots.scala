package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt admission filtering — the politeness gate a production
  * crawler applies before the frontier (the reference relies on manual
  * blacklists instead, `web_spider_oo.py:195-225`; this is the
  * standards-based form of the same admission decision).
  *
  * Semantics follow RFC 9309 path matching restricted to plain prefix
  * rules (no `*`/`$` wildcards): the MOST SPECIFIC (longest) matching
  * rule wins; Allow beats Disallow on equal length; a URL with no
  * matching rule is allowed.
  *
  * Scale shape: a parsed robots.txt is model-sized (rarely more than a
  * few hundred rules), so the rule set rides into the plan as a literal
  * array and the whole decision is ONE map-side column expression —
  * no join, no shuffle, no window. A 100 TB frontier pays exactly one
  * codegen'd filter pass; higher-order functions keep it inside
  * whole-stage codegen. (A window/groupBy formulation would shuffle the
  * entire frontier just to rank a handful of matched rules per URL.)
  */
object Robots {

  /** The winning rule's verdict for `url` as a BOOLEAN column
    * (true/null = allowed, false = denied). */
  def verdict(url: Column, rules: Seq[(String, Boolean)]): Column = {
    val rlit = array(rules.map { case (p, a) =>
      struct(lit(p).as("p"), lit(a).as("a"))
    }: _*)
    // longest matching prefix wins; Allow beats Disallow on equal length
    // (lexicographic struct max does both); no match -> null -> allowed
    val matched = filter(rlit, r => url.startsWith(r.getField("p")))
    val best = array_max(transform(matched,
      r => struct(length(r.getField("p")).as("l"), r.getField("a").as("a"))))
    best.isNull || best.getField("a")
  }

  /** Keep the allowed URLs (column `url`), original columns unchanged. */
  def allowed(urls: DataFrame, rules: Seq[(String, Boolean)]): DataFrame =
    urls.where(verdict(col("url"), rules))
}
