package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Full public-suffix-list semantics (publicsuffix.org's algorithm) —
 * the production upgrade of [[Urls.registeredDomain]]'s plain
 * two-level suffix lookup (r13 verdict item 3): real eTLD+1 needs the
 * complete rule grammar, including wildcard rules (`*.ck` — every
 * label directly under ck is a public suffix) and exception rules
 * (`!www.ck` — www.ck is NOT a public suffix despite the wildcard).
 *
 * Rule resolution, per the published algorithm:
 *   1. collect all rules matching a label-suffix of the host
 *      (`*` matches exactly one label);
 *   2. an exception rule prevails outright; otherwise the longest
 *      matching rule; otherwise the implicit default rule `*`;
 *   3. public suffix = the prevailing rule's labels (for an exception
 *      rule, minus its leftmost label); registered domain = the public
 *      suffix plus one preceding host label — NULL when the host IS a
 *      public suffix.
 *
 * Scale shape: the rule set compiles to THREE map literals
 * (anchor → label count) carried once in the plan, probed per row with
 * `element_at` on the host's ≤[[maxProbe]] label-suffixes — O(rules)
 * once at plan build, O(suffixes) hash lookups per row, NO join, NO
 * explode, NO shuffle, and never a 9k-entry when-chain. The full
 * ~9k-rule published list loads through [[load]] (it is a config
 * artifact like a blocklist: parsed driver-side, shipped as the same
 * map literals); [[Fixture]] is the oracle-replayable test instance —
 * [[Urls.TwoLevelSuffixes]] as normal rules plus the canonical
 * wildcard/exception family from the spec's own examples.
 */
object Psl {

  /** One parsed rule: anchor = the rule without its `*.`/`!` prefix. */
  final case class Rule(anchor: String, labels: Int,
      kind: Char) // 'n' normal, 'w' wildcard, 'e' exception

  /** Compiled rule set: the three anchor maps + the deepest probe. */
  final class Rules private[Psl] (
      private[graft] val norm: Map[String, Int],
      private[graft] val wild: Map[String, Int],
      private[graft] val exc: Map[String, Int]) {
    /** Deepest label-suffix worth probing: the longest anchor. */
    private[graft] val maxProbe: Int =
      ((norm.keys ++ wild.keys ++ exc.keys).map(_.count(_ == '.') + 1)
        .maxOption.getOrElse(0)).max(1)
  }

  /** Parse PSL-format lines: one rule per line; `//` comments and
    * blank lines ignored (the published file's format). */
  def fromLines(lines: Seq[String]): Rules = {
    val rules = lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map {
        case l if l.startsWith("!") =>
          val a = l.drop(1)
          Rule(a, a.count(_ == '.') + 1, 'e')
        case l if l.startsWith("*.") =>
          val a = l.drop(2)
          Rule(a, a.count(_ == '.') + 1, 'w')
        case l => Rule(l, l.count(_ == '.') + 1, 'n')
      }.toSeq
    new Rules(
      rules.filter(_.kind == 'n').map(r => r.anchor -> r.labels).toMap,
      rules.filter(_.kind == 'w').map(r => r.anchor -> r.labels).toMap,
      rules.filter(_.kind == 'e').map(r => r.anchor -> r.labels).toMap)
  }

  /** Load a PSL-format rules file (the published ~9k-rule list, or any
    * curated subset) through the Hadoop FS API, so the artifact can
    * live wherever the cluster mounts config. Driver-side parse of a
    * config file — the rules then ride the PLAN as map literals. */
  def load(s: org.apache.spark.sql.SparkSession, path: String): Rules = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    fromLines(lines)
  }

  /** The oracle-replayable test instance: the generator's two-level
    * suffixes as normal rules + the spec's canonical wildcard/exception
    * family (`*.ck` / `!www.ck`, publicsuffix.org's own worked
    * example). One-level TLDs need no entry — the implicit `*` default
    * covers them, exactly as in the published list. */
  val Fixture: Rules = fromLines(
    Urls.TwoLevelSuffixes ++ Seq("*.ck", "!www.ck"))

  private def mapLit(m: Map[String, Int]): Column =
    if (m.isEmpty) typedLit(Map.empty[String, Int]) else typedLit(m)

  /**
   * Registered domain (eTLD+1) of `host` under `rules` — pure per-row
   * expressions. Probes the host's last-k-label suffixes (k ≤ the rule
   * set's deepest anchor + 1 is unnecessary: anchors are probed
   * directly, the +1 arrives arithmetically via the wildcard/registered
   * offsets). NULL when the host is itself a public suffix.
   *
   * The host is canonicalized first, mirroring publicsuffix.org's
   * algorithm step 1: rule matching is case-insensitive (lowercase the
   * host — the rule anchors are already lowercase by list convention)
   * and a fully-qualified trailing dot is ignored. Without this,
   * 'Foo.CO.UK' or 'a.co.uk.' would miss every anchor and resolve via
   * the implicit default instead of co.uk.
   */
  def registeredDomain(host: Column, rules: Rules): Column = {
    val canon = lower(regexp_replace(host, "\\.$", ""))
    val labels = split(canon, "\\.")
    val n = size(labels)
    def suffix(k: Int): Column = array_join(slice(labels, -k, k), ".")
    val probes = 1 to rules.maxProbe
    // exception match at anchor depth k → public suffix has k-1 labels
    val excPs = probes.map { k =>
      when(n >= k && element_at(mapLit(rules.exc), suffix(k)).isNotNull,
        lit(k - 1))
    }.reduceLeft((a, b) => coalesce(b, a)) // deepest exception wins
    // longest of: normal anchors (ps = k), wildcard anchors (ps = k+1,
    // needs a label to exist under the anchor)
    val longest = probes.foldLeft(lit(1): Column) { (acc, k) =>
      val nrm = when(n >= k &&
        element_at(mapLit(rules.norm), suffix(k)).isNotNull, lit(k))
      val wld = when(n >= k + 1 &&
        element_at(mapLit(rules.wild), suffix(k)).isNotNull, lit(k + 1))
      greatest(acc, coalesce(nrm, lit(1)), coalesce(wld, lit(1)))
    }
    val psLen = coalesce(excPs, longest)
    val regLen = psLen + 1
    when(n >= regLen,
        array_join(slice(labels, regLen * lit(-1), regLen), "."))
      .otherwise(lit(null).cast("string"))
  }
}
