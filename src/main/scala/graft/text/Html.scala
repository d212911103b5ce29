package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * HTML → text extraction — stage 0 of every real crawl pipeline (WET
 * extraction / boilerplate stripping à la trafilatura): drop
 * script/style/nav/footer/head blocks WITH their content, drop
 * comments, unwrap the remaining content tags, decode entities,
 * normalize whitespace. The engine previously started from clean text;
 * this is the stage that produces it.
 *
 * The test tables carry no HTML column, so [[synthHtml]] synthesizes a
 * full page around each document's text as a CLOSED FORM of
 * (doc_id, text) — the row-91 generator discipline
 * ([[graft.text.Urls.synthUrl]]): the DuckDB oracle replays the FORMULA
 * and never parses HTML. The generator is built so that extraction
 * EXACTLY inverts it: the body holds the document's words (entity-
 * escaped, some spaces encoded as `&nbsp;`, inline `<b>`/`<h1>` wraps,
 * a paragraph break), while every synthetic chrome block (nav links,
 * script trackers, style rules, comments, footer) contributes words
 * that must NOT survive. Because the corpus text is single-spaced and
 * trimmed, `extractText(synthHtml(id, text)) == text` byte-identically
 * — so the oracle for the extraction query is the `text` column
 * itself, and a no-op "extractor" (returning its HTML input) or a
 * naive tag-only strip (leaking script/nav content) hash-mismatches.
 *
 * Scale shape: pure per-row string expressions (regexp_replace /
 * replace chains, all codegen'd) — no shuffle, no UDF, no driver
 * state; linear in input splits, exactly what stage 0 of a 100 TB
 * crawl ingest must be.
 */
object Html {

  // ---- the generator (test harness side) --------------------------------

  /** `&`/`<`/`>` entity-escaped, the honest encoding an HTML emitter
    * applies to text content ([[decodeEntities]] inverts it: amp is
    * escaped first and decoded last, the classic ordering). */
  private def escape(c: Column): Column =
    replace(replace(replace(c,
      lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")),
      lit(">"), lit("&gt;"))

  /** One deterministic HTML page per document. `noise` varies ONLY
    * chrome (nav params, comment text, style class, tracker id) — the
    * markup-invariance pin: any two noise values extract identically.
    *
    * Body construction (inverted exactly by [[extractText]]):
    *  - first word wrapped in `<h1>` (content tags KEEP their text);
    *  - the rest in `<p>`, with a paragraph break replacing the 8th
    *    space when the text is long enough;
    *  - every standalone "the" wrapped in `<b>` (inline unwrap leaves
    *    extra spaces that whitespace collapse must absorb);
    *  - for doc_id % 3 == 0 every remaining body space is written as
    *    `&nbsp;` (entity decode is load-bearing, not decorative). */
  def synthHtml(docId: Column, text: Column, noise: Column = lit(0)): Column = {
    val first = substring_index(text, " ", 1)
    val rest = when(instr(text, " ") > 0,
      text.substr(length(first) + lit(2), length(text))).otherwise(lit(""))
    val escaped = escape(rest)
    val para = regexp_replace(escaped,
      "^((?:\\S+ ){7}\\S+) ", "$1</p>\n<p>")
    val bolded = regexp_replace(para, "\\bthe\\b", "<b>the</b>")
    val body = when(docId % 3 === 0,
      replace(bolded, lit(" "), lit("&nbsp;"))).otherwise(bolded)
    concat(
      lit("<!DOCTYPE html>\n<html lang=\"en\">\n<head>\n<title>Doc "),
      docId,
      lit("</title>\n<meta charset=\"utf-8\"/>\n<style>\n  .m"),
      noise % 7,
      lit(" { color: #1a2b3c; margin: 0 auto; }\n</style>\n"),
      lit("<script type=\"text/javascript\">\n  var i = "),
      docId % 101,
      lit("; // tracker chrome\n  if (i<9 && i>2) { i = i+1; }\n</script>\n"),
      lit("</head>\n<body>\n<nav class=\"menu\"><a href=\"/home?ref="),
      noise,
      lit("\">home navigation</a> <a href=\"/about\">about boilerplate chrome</a></nav>\n"),
      lit("<!-- crawler chrome "), noise % 11,
      lit(": if x<3 && y>2 then skip -->\n<div id=\"main\">\n<h1>"),
      escape(first),
      lit("</h1>\n<p>"), body,
      lit("</p>\n</div>\n<footer>footer boilerplate &copy; site"),
      docId % 23,
      lit("</footer>\n</body>\n</html>\n"))
  }

  // ---- the real operators (consume only the HTML STRING) ----------------

  /** The entity subset the generator emits, decoded in inverse-escape
    * order (`&amp;` strictly last so escaped text round-trips even
    * when the original contains literal entity spellings). */
  private def decodeEntities(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("&nbsp;"), lit(" ")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")),
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&amp;"), lit("&"))

  /** Boilerplate/metadata elements whose CONTENT is dropped, not just
    * the tags — the trafilatura-style chrome set. Matched with their
    * bodies via a back-referenced block regex, so `<` / `>` inside
    * script code, comment prose, CDATA payloads, or QUOTED attribute
    * values (the [[TagInnards]] alternation) cannot confuse the tag
    * unwrap that runs after. Known limitation (regex, not a parser):
    * a chrome block NESTED inside the same element kind ends at the
    * first close tag, so the inner tail would unwrap as content — the
    * stated contract covers the non-self-nested chrome real pages
    * emit (HTML4 forbade nested forms of these; a full parser is a
    * mapInPandas/mapPartitions job, the multimodal decode argument). */
  private val DropBlocks = "script|style|nav|footer|head"

  /** A tag's innards, quote-aware: a sequence of quoted strings or
    * plain non-`>` chars — so a `>` INSIDE a quoted attribute value
    * (`title="a > b"`) cannot end the tag early and leak the attribute
    * tail into the text. Alternatives have disjoint first characters
    * (`"`, `'`, other), so matching is linear, never backtracking; a
    * tag with an UNCLOSED quote matches nothing and stays visible as
    * raw text (malformed markup surfaces, it is not silently mangled).
    * Second known limitation (the dual of the first): a stray TEXT `<`
    * followed by a PAIRED quote whose payload contains `>` — e.g.
    * `x < "a>b" y > z` — quote-skips past the `>` inside the quotes,
    * so the "tag" swallows through the SECOND `>` (`"a>b" y` goes with
    * it) where the old `<[^>]*>` stopped at the first. Both readings
    * are wrong on such input (it is not markup); HTML5's tokenizer
    * makes the same quote-aware choice inside a tag, and real pages
    * escape a text `<` as `&lt;`. HtmlSpec pins this behavior so a
    * change is a decision, not drift. */
  private val TagInnards = """(?:"[^"]*"|'[^']*'|[^>"'])*"""

  /** HTML → clean text: comments out first (they may contain raw `<`),
    * then CDATA sections whole (stray CDATA in HTML is a parse error
    * the HTML5 tokenizer treats as bogus-comment chrome; its payload
    * is raw data, not page text — dropping the section keeps `<`/`>`
    * inside it from confusing the tag unwrap), then chrome blocks with
    * their content, then every remaining tag unwrapped to a space
    * (block boundaries must separate words; open tags quote-aware via
    * [[TagInnards]]), then entities, then whitespace collapse + trim.
    * Per-row, codegen'd. */
  def extractText(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noCdata = regexp_replace(noComments,
      "(?s)<!\\[CDATA\\[.*?\\]\\]>", " ")
    val noBlocks = regexp_replace(noCdata,
      s"(?is)<($DropBlocks)\\b$TagInnards>.*?</\\1\\s*>", " ")
    val noTags = regexp_replace(noBlocks, s"<$TagInnards>", " ")
    // explicit ASCII class + regex strip, not \s/trim: Java's \s
    // includes \x0B where RE2's doesn't, and a bare trim() means
    // unicode spaces in DuckDB vs ASCII in Spark (Text.WsClass) —
    // the oracle replays this collapse as the extraction contract
    regexp_replace(
      regexp_replace(decodeEntities(noTags), s"[${Text.WsClass}]+", " "),
      "(^ )|( $)", "")
  }

  /** The page title (chrome the EXTRACTOR drops but a crawl pipeline
    * keeps as metadata) — proves the query consumed real page bytes:
    * its oracle replays the generator formula `'Doc ' || doc_id`. */
  def titleOf(html: Column): Column =
    regexp_extract(html, "<title>([^<]*)</title>", 1)
}
