package graft.rdf

/** Python-`re` → Java-`Pattern` translation for sh:pattern / SPARQL regex.
  *
  * The reference evaluates patterns with Python `re`
  * (string_based_constraints.py); Spark's rlike is Java. The dialects
  * agree on everything the conformance corpora use (audited: the SHT/DASH
  * fixtures only contain literal text, char classes, `\\d` and anchors),
  * but real-world shapes hit these divergences, translated here:
  *
  *   (?P<name>...)  →  (?<name>...)     named group
  *   (?P=name)      →  \k<name>         named backreference
  *   \Z             →  \z               Python \Z = absolute end; Java \Z
  *                                      stops before a final newline
  *
  * Known untranslatable constructs (left as-is; Java will reject them,
  * which is louder than silently diverging): conditional groups
  * `(?(id)yes|no)`, possessive-quantifier-free Python syntax is otherwise
  * a Java subset. Escapes and character classes are scanned so the
  * rewrites never fire inside them. */
object RegexDialect {
  def pythonToJava(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    val n = p.length
    while (i < n) {
      val c = p.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = p.charAt(i + 1)
        if (e == 'Z' && !inClass) { sb.append("\\z"); i += 2 }
        else { sb.append(c).append(e); i += 2 }
      } else if (inClass) {
        if (c == ']') inClass = false
        sb.append(c); i += 1
      } else if (c == '[') {
        inClass = true; sb.append(c); i += 1
      } else if (c == '(' && p.startsWith("(?P<", i)) {
        sb.append("(?<"); i += 4
      } else if (c == '(' && p.startsWith("(?P=", i)) {
        val end = p.indexOf(')', i)
        if (end > 0) { sb.append("\\k<").append(p.substring(i + 4, end)).append('>'); i = end + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
