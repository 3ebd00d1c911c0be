package graft.ops

/** Public-Suffix-List rules and the standard matching algorithm
  * (format and semantics per publicsuffix.org/list: one rule per
  * line, `//` comments, `*` matches exactly one label, `!` marks an
  * exception rule that beats every other match; the prevailing rule
  * is the matching rule with the most labels, defaulting to `*`
  * — i.e. the bare TLD — when nothing matches).
  *
  * The rule table is COMPILED once on the driver into three hash
  * sets keyed by reversed-suffix strings and shipped inside the
  * [[graft.expressions.RegisteredDomain]] expression (a few hundred
  * rules by default, ~9k for the full published list — either way a
  * closure-sized object, far below broadcast-worthy). Lookup per
  * host is ≤ `maxLabels` set probes on label suffixes — no regex,
  * no per-row allocation beyond the label split.
  *
  * Divergence from the strict published algorithm, kept deliberately
  * for crawl-balancing: a host that IS a public suffix (e.g.
  * literally "co.uk") maps to itself rather than to NULL/undefined —
  * a per-domain cap should treat such rows as their own group, not
  * drop them; and IPv4/IPv6 literal hosts map to themselves (no
  * label structure; the label rule would collapse every IP sharing
  * its last two octets into one pseudo-domain).
  */
object Psl {

  /** Compiled rule table. `exact` holds normal rules ("co.uk"),
    * `wildcard` holds the parent of `*.X` rules (the "X"), and
    * `exception` holds `!`-rules minus the bang — all lowercased,
    * dot-joined labels. `maxLabels` bounds the suffix probe loop. */
  final case class Rules(exact: Set[String], wildcard: Set[String],
                         exception: Set[String], maxLabels: Int)
      extends Serializable {

    /** Number of labels in `host`'s public suffix under these rules
      * (host given as its label array, left to right). */
    private def publicSuffixLabels(labels: Array[String]): Int = {
      val n = labels.length
      var best = 1 // the default rule "*": the bare TLD
      var k = 1
      val kMax = math.min(n, maxLabels + 1)
      var suffix = labels(n - 1)
      while (k <= kMax) {
        // exception rule: public suffix is the rule minus its
        // leftmost label — and it beats everything, stop here
        if (exception.contains(suffix)) return k - 1
        if (exact.contains(suffix) && k > best) best = k
        // "*.X" matches any single label directly left of X
        if (k < n && wildcard.contains(suffix) && k + 1 > best)
          best = k + 1
        k += 1
        if (k <= kMax) suffix = labels(n - k) + "." + suffix
      }
      best
    }

    /** Host → registered domain (eTLD+1). Hosts with no label to the
      * left of their public suffix return themselves (see class doc
      * divergence note). Expects a lowercased, root-dot-stripped
      * host; returns null for null/empty input. */
    def registeredDomain(host: String): String = {
      if (host == null || host.isEmpty) return null
      // literal addresses: IPv6 (any colon) and IPv4 dotted quads
      if (host.indexOf(':') >= 0 || isIpv4(host)) return host
      val labels = host.split("\\.", -1)
      if (labels.length <= 1) return host
      val ps = publicSuffixLabels(labels)
      val keep = math.min(ps + 1, labels.length)
      if (keep == labels.length) host
      else {
        val sb = new java.lang.StringBuilder
        var i = labels.length - keep
        while (i < labels.length) {
          sb.append(labels(i))
          if (i < labels.length - 1) sb.append('.')
          i += 1
        }
        sb.toString
      }
    }

    private def isIpv4(host: String): Boolean = {
      var i = 0; var label = 0; var digits = 0
      val n = host.length
      while (i < n) {
        val c = host.charAt(i)
        if (c == '.') {
          if (digits == 0 || digits > 3) return false
          label += 1; digits = 0
        } else if (c >= '0' && c <= '9') digits += 1
        else return false
        i += 1
      }
      label == 3 && digits >= 1 && digits <= 3
    }
  }

  /** The published list spells IDN rules in Unicode (e.g. the
    * Japanese geographic suffixes) while crawl hosts arrive in
    * punycode — normalize each non-ASCII rule label to its ASCII
    * (`xn--`) form at parse time so full-list Unicode rules match
    * `xn--` hosts. A label that fails IDN conversion is kept
    * verbatim (it then simply never matches an ASCII host, exactly
    * as the unconverted rule wouldn't). */
  private def toAsciiRule(rule: String): String =
    if (rule.forall(_ < 0x80)) rule
    else rule.split("\\.", -1).map { label =>
      if (label.forall(_ < 0x80)) label
      else try java.net.IDN.toASCII(label, java.net.IDN.ALLOW_UNASSIGNED)
        .toLowerCase
      catch { case _: IllegalArgumentException => label }
    }.mkString(".")

  /** Parse PSL-format lines into compiled [[Rules]]. Ignores blank
    * lines, `//` comments, and anything after whitespace on a rule
    * line (the published list is already one-rule-per-line).
    * Unicode (IDN) rules are normalized to punycode — see
    * [[toAsciiRule]]. */
  def parse(lines: Iterator[String]): Rules = {
    val exact = Set.newBuilder[String]
    val wildcard = Set.newBuilder[String]
    val exception = Set.newBuilder[String]
    var maxLabels = 1
    for (raw <- lines) {
      val line = raw.trim.toLowerCase
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.takeWhile(!_.isWhitespace)
        val nLabels = rule.count(_ == '.') + 1
        if (nLabels > maxLabels) maxLabels = nLabels
        if (rule.startsWith("!")) exception += toAsciiRule(rule.substring(1))
        else if (rule.startsWith("*.")) wildcard += toAsciiRule(rule.substring(2))
        else exact += toAsciiRule(rule)
      }
    }
    Rules(exact.result(), wildcard.result(), exception.result(), maxLabels)
  }

  /** Load a PSL-format file from disk (driver-side; the compiled
    * table ships with the expression). */
  def load(path: String): Rules = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** The shipped default table: `graft/psl_default.dat` on the
    * classpath — the high-mass subset of the published list
    * (country-code second-level registries, wildcard + exception
    * examples, common hosting suffixes). Swap in the full published
    * list via [[load]] / the plugins' `psl_file` option; the
    * matching algorithm is identical. */
  lazy val default: Rules = {
    val in = getClass.getClassLoader
      .getResourceAsStream("graft/psl_default.dat")
    require(in != null, "graft/psl_default.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }
}
