package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL / domain curation signals — the CommonCrawl-style operator family
 * (host extraction, registered-domain [eTLD+1] rollup, URL
 * normalization for crawl-dup detection). The test tables carry no URL
 * column, so [[synthUrl]] synthesizes one as a CLOSED FORM of
 * `doc_id` (the multimodal-generator proof discipline: the DuckDB
 * oracle replays the FORMULA and never parses a URL, so the Spark
 * side's `parse_url` / suffix-list / normalization logic is proven
 * real, not replayed hashing).
 *
 * Generator shape: every component a trainer-facing pipeline must
 * canonicalize away varies with the FULL doc_id (utm tracking params,
 * query-param order, fragments), while every component that survives
 * normalization derives from `u = doc_id % 150` — so normalized URLs
 * collide in groups (the same page crawled repeatedly with different
 * tracking noise), giving url-keyed dedup real work with a closed-form
 * answer. Hosts draw from 23 registered domains across 8 TLDs, three
 * of them two-level public suffixes (co.uk, com.au, ac.uk), so eTLD+1
 * extraction genuinely consults the suffix list rather than "last two
 * labels".
 */
object Urls {

  /** Modulus of the canonical (normalization-surviving) components. */
  val CanonMod = 150

  private val Tlds = Seq("com", "org", "net", "io",
    "co.uk", "com.au", "ac.uk", "de")
  private val Subs = Seq("www", "cdn", "blog", "m")

  /** Registered domain `d` (0 ≤ d < 23) of the generator's host
    * population — the key a quota/blocklist CONFIG names (a config
    * constant, like a blocklist entry; the domain COLUMN itself is
    * always computed from the URL string). */
  def domainName(d: Int): String = s"site$d.${Tlds(d % 8)}"

  /** Public-suffix subset (two-level entries only — one-level TLDs need
    * no list). Deliberately a SUPERSET of what the generator draws from:
    * the rollup logic is general, not a generator replay. */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "org.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.nz", "com.br", "com.cn")

  // ---- the generator (Spark side) --------------------------------------

  private def pick(options: Seq[String], idx: Column): Column =
    element_at(array(options.map(lit): _*), (idx + 1).cast("int"))

  /** The canonical URL components of `u = doc_id % CanonMod`. */
  private def canonParts(u: Column) = {
    val d = u % 23
    val reg = concat(lit("site"), d, lit("."), pick(Tlds, d % 8))
    val host = when(u % 5 === 0, reg)
      .otherwise(concat(pick(Subs, u % 4), lit("."), reg))
    val scheme = when(u % 3 === 0, lit("http")).otherwise(lit("https"))
    val port = when(u % 11 === 0, lit(":8080")).otherwise(lit(""))
    val path = concat(lit("/p/"), u % 17,
      when(u % 2 === 0, lit("/a")).otherwise(lit("")),
      lit("/doc-"), u)
    (scheme, host, port, path, u % 29)
  }

  /** One deterministic URL per document id. */
  def synthUrl(docId: Column): Column = {
    val u = docId % CanonMod
    val (scheme, host, port, path, idp) = canonParts(u)
    val idParam = concat(lit("id="), idp)
    val utm = concat(lit("utm_source=s"), docId % 6)
    val params = when(docId % 2 =!= 0, idParam)
      .when(docId % 4 === 0, concat(idParam, lit("&"), utm))
      .otherwise(concat(utm, lit("&"), idParam))
    val frag = when(docId % 7 === 0, concat(lit("#sec"), docId % 3))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, lit("?"), params, frag)
  }

  // ---- the real operators (consume only the URL STRING) ----------------

  /** Registered domain (eTLD+1) of a parsed host: last two labels,
    * or last three when the final two form a two-level public suffix.
    * Pure per-row string logic — no shuffle, no UDF. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val lastTwo = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    when(lastTwo.isin(TwoLevelSuffixes: _*) && size(labels) >= 3,
        concat_ws(".", element_at(labels, -3), lastTwo))
      .otherwise(lastTwo)
  }

  /** Canonical form of a URL: tracking (`utm_*`) params dropped,
    * remaining params sorted, fragment dropped; scheme/authority/path
    * kept verbatim (authority preserves a non-default port). The
    * url-keyed dedup key a crawl pipeline groups on. */
  def normalize(url: Column): Column = {
    val q = parse_url(url, lit("QUERY"))
    val kept = array_sort(filter(split(q, "&"),
      p => !p.startsWith("utm_")))
    concat(
      parse_url(url, lit("PROTOCOL")), lit("://"),
      parse_url(url, lit("AUTHORITY")),
      parse_url(url, lit("PATH")),
      when(q.isNull || size(kept) === 0, lit(""))
        .otherwise(concat(lit("?"), array_join(kept, "&"))))
  }

  /** PSL-branch host generator (SURVEY row 102): u = doc_id % 12
    * cycles the four rule regimes — exception (`!www.ck`), wildcard
    * (`*.ck`), two-level normal (`co.uk`), implicit default (`com`) —
    * so every branch of [[Psl.registeredDomain]]'s resolution is
    * population-exercised, with a closed-form expected domain the
    * oracle replays without ever running PSL logic. */
  def synthHostPsl(docId: Column): Column = {
    val u = docId % 12
    when(u % 4 === 0, concat(lit("a"), u, lit(".www.ck")))
      .when(u % 4 === 1, concat(lit("b"), u, lit(".g"), u, lit(".ck")))
      .when(u % 4 === 2, concat(lit("site"), u, lit(".co.uk")))
      .otherwise(concat(lit("cdn.site"), u, lit(".com")))
  }

  // ---- the oracle replay (DuckDB SQL over the FORMULA) ------------------

  /** Closed-form replay of [[synthHostPsl]]. */
  def hostPslSql(id: String): String = {
    val u = s"(($id) % 12)"
    s"""(CASE $u % 4
          WHEN 0 THEN 'a' || $u || '.www.ck'
          WHEN 1 THEN 'b' || $u || '.g' || $u || '.ck'
          WHEN 2 THEN 'site' || $u || '.co.uk'
          ELSE 'cdn.site' || $u || '.com' END)"""
  }

  /** Closed-form EXPECTED registered domain of [[synthHostPsl]] under
    * [[Psl.Fixture]] — per branch: the exception strips back to
    * www.ck; the wildcard makes g{u}.ck a public suffix so all three
    * labels survive; co.uk keeps three; the default keeps two. */
  def domainPslSql(id: String): String = {
    val u = s"(($id) % 12)"
    s"""(CASE $u % 4
          WHEN 0 THEN 'www.ck'
          WHEN 1 THEN 'b' || $u || '.g' || $u || '.ck'
          WHEN 2 THEN 'site' || $u || '.co.uk'
          ELSE 'site' || $u || '.com' END)"""
  }

  /** DuckDB expressions replaying [[canonParts]] for `u = $id % 150`. */
  private def canonSql(id: String): (String, String, String, String, String) = {
    val u = s"(($id) % ${CanonMod})"
    val d = s"($u % 23)"
    val tld = Tlds.zipWithIndex.map { case (t, i) =>
      s"WHEN $i THEN '$t'" }.mkString(" ")
    val sub = Subs.zipWithIndex.map { case (s0, i) =>
      s"WHEN $i THEN '$s0'" }.mkString(" ")
    val reg = s"('site' || $d || '.' || (CASE $d % 8 $tld END))"
    val host = s"(CASE WHEN $u % 5 = 0 THEN $reg " +
      s"ELSE (CASE $u % 4 $sub END) || '.' || $reg END)"
    val scheme = s"(CASE WHEN $u % 3 = 0 THEN 'http' ELSE 'https' END)"
    val port = s"(CASE WHEN $u % 11 = 0 THEN ':8080' ELSE '' END)"
    val path = s"('/p/' || ($u % 17) || " +
      s"(CASE WHEN $u % 2 = 0 THEN '/a' ELSE '' END) || '/doc-' || $u)"
    (scheme, host, port, path, s"($u % 29)")
  }

  /** Closed-form host of `$id` (for the rollup oracle). */
  def hostSql(id: String): String = canonSql(id)._2

  /** Closed-form registered domain of `$id`: the generator only draws
    * suffixes from [[Tlds]], so the replay needs no suffix list — the
    * tld CASE tells which entries are two-level. */
  def registeredSql(id: String): String = {
    val u = s"(($id) % ${CanonMod})"
    val d = s"($u % 23)"
    val tld = Tlds.zipWithIndex.map { case (t, i) =>
      s"WHEN $i THEN '$t'" }.mkString(" ")
    s"('site' || $d || '.' || (CASE $d % 8 $tld END))"
  }

  /** Closed-form normalized URL of `$id` — a pure function of
    * `u = $id % 150` by construction. */
  def normalizedSql(id: String): String = {
    val (scheme, host, port, path, idp) = canonSql(id)
    s"($scheme || '://' || $host || $port || $path || '?id=' || $idp)"
  }

  /** Closed-form raw URL of `$id` (replays [[synthUrl]] exactly). */
  def urlSql(id: String): String = {
    val (scheme, host, port, path, idp) = canonSql(id)
    val utm = s"('utm_source=s' || (($id) % 6))"
    val params = s"(CASE WHEN ($id) % 2 <> 0 THEN 'id=' || $idp " +
      s"WHEN ($id) % 4 = 0 THEN 'id=' || $idp || '&' || $utm " +
      s"ELSE $utm || '&id=' || $idp END)"
    val frag = s"(CASE WHEN ($id) % 7 = 0 THEN '#sec' || (($id) % 3) " +
      s"ELSE '' END)"
    s"($scheme || '://' || $host || $port || $path || '?' || $params || $frag)"
  }
}
