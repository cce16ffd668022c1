package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.LinkOps
import graft.functions.ContainsAny

/** Edge cases lifted from the reference (SURVEY.md §5.2, FIXTURES.md A1):
  * null hrefs, "/" self-link, #-fragments, app/App case sensitivity,
  * relative-only gate, normalization, dispatch, filename sanitization. */
class LinkOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def cleaned(links: Seq[String]): Seq[String] =
    links.toDF("link")
      .filter(LinkOps.keepLink($"link"))
      .select(LinkOps.normalize("https://x.test/", $"link"))
      .as[String].collect().toSeq

  test("F1 drops null and bare root link") {
    val out = (Seq(null, "/", "/ok") : Seq[String]).toDF("link")
      .filter(LinkOps.keepNonRoot($"link")).as[String].collect()
    assert(out.toSeq == Seq("/ok"))
  }

  test("F2 blacklist is case-sensitive: app and App both listed, APP is not") {
    assert(cleaned(Seq("/my-app-page")).isEmpty)     // 'app'
    assert(cleaned(Seq("/myApple")).isEmpty)         // 'App'
    assert(cleaned(Seq("/MY-APPLE")).nonEmpty)       // 'APP' not in list
  }

  test("F2 drops #-fragments and @-links (both in the word list)") {
    assert(cleaned(Seq("/page#frag")).isEmpty)
    assert(cleaned(Seq("/user@host")).isEmpty)
  }

  test("F3 keeps only relative links and rewrites root + link[1:]") {
    assert(cleaned(Seq("https://elsewhere.test/x")).isEmpty)
    assert(cleaned(Seq("/menu/drinks")) == Seq("https://x.test/menu/drinks"))
  }

  test("ContainsAny expression == composed OR-chain on random inputs") {
    val words = LinkOps.filterWords
    val rng = new scala.util.Random(42)
    val frags = Seq("/x/", "app", "App", "APP", "boo", "k", "tel", "#", "@",
      "zzz", "car", "eer", "career")
    val inputs = (1 to 300).map { _ =>
      (1 to rng.nextInt(6)).map(_ => frags(rng.nextInt(frags.size))).mkString
    } :+ "" :+ "/"
    val df = inputs.toDF("link").select(
      $"link",
      ContainsAny($"link", words).as("expr"),
      LinkOps.hitsBlacklistComposed($"link").as("composed"))
    val mismatched = df.filter($"expr" =!= $"composed").count()
    assert(mismatched == 0)
  }

  test("ContainsAny propagates null") {
    val out = (Seq("ok", null) : Seq[String]).toDF("link")
      .select(ContainsAny($"link", Seq("zz")).as("r")).collect()
    assert(out(0).getBoolean(0) == false && out(1).isNullAt(0))
  }

  test("S3 extractHrefs handles attributes, spacing, and ignores non-href") {
    val html = """<a class="x" href="/a">1</a> <A HREF="/up">up</A>
                 |<a href = "/b">2</a><img src="/c"><a name="z">3</a>""".stripMargin
    val out = Seq(html).toDF("html")
      .select(explode(LinkOps.extractHrefs($"html")).as("h"))
      .as[String].collect().toSeq
    // html.parser normalizes tag/attribute case, so <A HREF=...> IS a link
    assert(out == Seq("/a", "/up", "/b"))
  }

  test("S3 extractHrefs matches html.parser on quote styles and case") {
    // BeautifulSoup with html.parser extracts all of these
    // (web_spider_oo.py:251-263): uppercase tags/attrs, single-quoted and
    // unquoted values; unquoted values end at whitespace or '>'
    val html = """<A HREF='/up'>u</A><a Href=/bare>b</a>
                 |<a class='q' href= '/sq'>s</a><a href=/sp x=1>t</a>""".stripMargin
    val viaArray = Seq(html).toDF("html")
      .select(explode(LinkOps.extractHrefs($"html")).as("h"))
      .as[String].collect().toSeq
    val viaGen = Seq(html).toDF("html")
      .select(graft.functions.ExtractHrefs($"html").as("h"))
      .as[String].collect().toSeq
    assert(viaArray == Seq("/up", "/bare", "/sq", "/sp"))
    assert(viaGen == viaArray)
  }

  test("htmlToText strips tags and collapses whitespace") {
    val out = Seq("<p>Hello  <b>world</b></p>").toDF("h")
      .select(LinkOps.htmlToText($"h")).as[String].head()
    assert(out == "Hello world")
  }

  test("htmlToText decodes entities one level, like soup.text / html.unescape") {
    val out = Seq("<p>A &amp; B &lt;x&gt; it&#39;s &quot;q&quot; &amp;lt;raw</p>")
      .toDF("h").select(LinkOps.htmlToText($"h")).as[String].head()
    // &amp;lt; decodes exactly ONE level: to the literal text "&lt;"
    assert(out == "A & B <x> it's \"q\" &lt;raw")
  }

  test("J2 superseded buggy filter keeps single-word links, fixed drops them") {
    // the product-loop bug (web_spider.py:106-136): a link survives when
    // ANY word is absent, so only a link containing EVERY word is dropped
    val allWords = "/" + LinkOps.filterWords.mkString("")
    val links = Seq("/login/x", allWords, "/ok", "/", null)
    val fixed = links.toDF("link")
      .filter(LinkOps.keepLink($"link")).as[String].collect().toSet
    val buggy = links.toDF("link")
      .filter(LinkOps.keepLinkSuperseded($"link")).as[String].collect().toSet
    assert(fixed == Set("/ok"))                 // intended semantics
    assert(buggy == Set("/login/x", "/ok"))    // bug: one word absent => kept
    assert((buggy -- fixed) == Set("/login/x")) // the documented divergence
  }

  test("K5 filename sanitization replaces each of \\ / ? : with _") {
    val out = Seq("""https://x.test/a?b\c:d""").toDF("u")
      .select(LinkOps.sanitizeFileName($"u")).as[String].head()
    assert(out == "https___x.test_a_b_c_d")
  }

  test("F5 route dispatch: pdf sink, xls(x) skip, else text (case-folded)") {
    val out = Seq("/a.PDF", "/b.xlsx", "/c.XLS", "/d.html", "/e")
      .toDF("u").select(LinkOps.route($"u").as("r")).as[String].collect().toSeq
    assert(out == Seq("pdf_sink", "skip", "skip", "text_sink", "text_sink"))
  }

  test("ExtractHrefs generator == explode(extractHrefs) on tricky html") {
    val html = Seq(
      """<a href="/one">1</a><p>x</p><a  class=z href = "/two">2</a>""",
      """no links here""",
      null.asInstanceOf[String],
      """<a href="">empty</a><a href="#f">f</a>"""
    ).toDF("html")
    val viaArray = html
      .select(explode(LinkOps.extractHrefs($"html")).as("href"))
      .as[String].collect().toSeq
    val viaGen = html
      .select(graft.functions.ExtractHrefs($"html").as("href"))
      .as[String].collect().toSeq
    assert(viaGen == viaArray)
    assert(viaGen == Seq("/one", "/two", "", "#f"))
    // whole-operator form: the plan must carry a Generate node
    val plan = html.select(graft.functions.ExtractHrefs($"html"))
      .queryExecution.optimizedPlan
    assert(plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.nonEmpty)
  }

  test("extract_hrefs is registered for SQL by GraftExtensions") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.rules.GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      Seq("""<a href="/a">a</a><a href="/b">b</a>""").toDF("html")
        .createOrReplaceTempView("pages_gen")
      val out = s2.sql(
        "SELECT extract_hrefs(html) AS href FROM pages_gen ORDER BY href")
        .as[String].collect().toSeq
      assert(out == Seq("/a", "/b"))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
