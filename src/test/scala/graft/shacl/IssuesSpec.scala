package graft.shacl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.rdf._

/** Issue-regression corpus: the reference's /root/reference/test/issues
  * tests are plain Python files with inline Turtle fixtures and
  * `validate(...)` + `assert (not) conforms` pairs. This harness extracts
  * the fixtures and expectations AT TEST TIME from the reference tree (no
  * fixture copying) and replays each supported case through the engine.
  * Unsupported features are enumerated with an explicit skip reason —
  * the spec prints a per-file PASS/SKIP/FAIL inventory. */
object IssueCorpus {
  final case class PyCase(
    dataVar: String, shaclVar: Option[String], ontVar: Option[String],
    opts: Map[String, String], expect: Option[Boolean], expectLoadError: Boolean,
    offset: Int,
    /** `assert "X" (not) in results_text` checks; CURIE tokens are matched
      * by local name (this engine prints full IRIs, pyshacl prints CURIEs) */
    textContains: List[String] = Nil, textNotContains: List[String] = Nil)
  /** aliases are positional: (text offset, graph var, parsed blocks) — the
    * same variable name is reassigned per test function in many files. */
  final case class PyFile(name: String, blocks: Map[String, String],
                          aliases: List[(Int, String, List[String])], cases: List[PyCase])

  // string prefix (r = raw: no escape processing), then triple quotes
  private val blockRe =
    """(?s)(\w+)\s*=\s*([rbuRBU]{0,2})(?:'''(.*?)'''|\"\"\"(.*?)\"\"\")""".r

  /** Python (non-raw) string escape semantics: recognized escapes are
    * translated, unknown ones (\\d in regex patterns etc.) are preserved. */
  def pyUnescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '"' => sb.append('"'); i += 2
          case 'a' => sb.append('\u0007'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'v' => sb.append('\u000b'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'x' if i + 3 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar); i += 4
          case '\n' => i += 2 // line continuation
          case _ => sb.append(c); i += 1 // unknown escape: keep backslash
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def parseFile(path: String): PyFile = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val blocks = blockRe.findAllMatchIn(text).map { m =>
      val raw = m.group(2).toLowerCase.contains("r")
      val body = Option(m.group(3)).getOrElse(m.group(4))
      m.group(1) -> (if (raw) body else pyUnescape(body))
    }.toMap
    // rdflib indirection: `g = rdflib.Graph(); g.parse(data=block)` (possibly
    // chained `.parse(data=b1).parse(data=b2)`) — map graph var -> blocks
    val aliases = scala.collection.mutable.ListBuffer.empty[(Int, String, List[String])]
    for (m <- """(\w+)(?:\s*=\s*(?:rdflib\.)?\w*Graph\(\))?((?:\s*\.parse\(\s*data=\w+[^)]*\))+)""".r
           .findAllMatchIn(text)) {
      val v = m.group(1)
      val parsed = """\.parse\(\s*data=(\w+)""".r.findAllMatchIn(m.group(2))
        .map(_.group(1)).toList
      if (parsed.nonEmpty) aliases += ((m.start, v, parsed))
    }
    // anonymous inline fixture: g(.= Graph())?.parse(data=\"\"\"...\"\"\") —
    // the literal becomes a synthetic block targeted by a positional alias
    val inline = scala.collection.mutable.Map.empty[String, String]
    for (m <- """(?s)(\w+)(?:\s*=\s*(?:rdflib\.)?\w*Graph\(\))?\s*\.parse\(\s*data=(?:'''(.*?)'''|\"\"\"(.*?)\"\"\")""".r
           .findAllMatchIn(text)) {
      val synth = s"__inline_${m.start}"
      inline(synth) = pyUnescape(Option(m.group(2)).getOrElse(m.group(3)))
      aliases += ((m.start, m.group(1), List(synth)))
    }
    // rdflib BytesIO indirection: fp = BytesIO(block)
    for (m <- """(\w+)\s*=\s*(?:io\.)?BytesIO\((\w+)\)""".r.findAllMatchIn(text))
      aliases += ((m.start, m.group(1), List(m.group(2))))
    // split on validate( calls; pair each with the asserts that follow it
    val callIdx = "(?<![\\w])(?:pyshacl\\.)?validate\\(".r
      .findAllMatchIn(text).map(_.start).toList
    val segments = callIdx.zipAll(callIdx.drop(1), -1, text.length).map {
      case (s, e) => text.substring(s, e)
    }
    val cases = segments.zip(callIdx).flatMap { case (seg, segStart) =>
      val open = seg.indexOf('(')
      var depth = 0; var i = open; var close = -1
      while (i < seg.length && close < 0) {
        seg.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      if (close < 0) None
      else {
        val args = seg.substring(open + 1, close)
        val firstArg = args.takeWhile(c => c != ',' && c != ')').trim
        val kwargs = """(\w+)\s*=\s*([\w'"\.\-]+)""".r.findAllMatchIn(args)
          .map(m => m.group(1) -> m.group(2).stripPrefix("'").stripSuffix("'")
            .stripPrefix("\"").stripSuffix("\"")).toMap
        val after = seg.substring(close)
        val expect =
          if ("""assert\s+not\s+conforms|assert\s+conforms\s+(?:is|==)\s+False|assert\s+False\s*==\s*conforms""".r
              .findFirstIn(after).isDefined) Some(false)
          else if ("""assert\s+conforms\s+(?:is|==)\s+True|assert\s+True\s*==\s*conforms""".r
              .findFirstIn(after).isDefined) Some(true)
          else if ("""(?m)assert\s+conforms\s*(?:#.*)?$""".r
              .findFirstIn(after).isDefined) Some(true)
          else None
        val textChecks = """assert\s+"([^"]+)"\s+(not\s+)?in\s+(?:string|results_text|v_text|rtext|text)\b""".r
          .findAllMatchIn(after).map(m => (m.group(1), m.group(2) == null)).toList
        val expectErr =
          """ConstraintLoadError|ShapeLoadError|ReportableRuntimeError""".r
            .findFirstIn(seg).isDefined &&
            """assert\s+exc\s+is\s+not\s+None|pytest\.raises""".r.findFirstIn(seg + after).isDefined
        val dataVar =
          if (firstArg.matches("\\w+")) firstArg
          else kwargs.getOrElse("data_graph", firstArg)
        Some(PyCase(dataVar,
          kwargs.get("shacl_graph").filter(_.matches("\\w+")),
          kwargs.get("ont_graph").filter(_.matches("\\w+")),
          kwargs, expect, expectErr, segStart,
          textContains = textChecks.collect { case (t, true) => t },
          textNotContains = textChecks.collect { case (t, false) => t }))
      }
    }
    PyFile(path, blocks ++ inline, aliases.toList, cases)
  }

  /** Resolve a variable to the fixture blocks it denotes at the call site:
    * a direct block, or the LAST rdflib-graph alias assigned before the
    * call (the same var name is reassigned per test function). */
  def resolveBlocks(f: PyFile, v: String, at: Int = Int.MaxValue): List[String] =
    if (f.blocks.contains(v)) List(f.blocks(v))
    else f.aliases.filter(a => a._2 == v && a._1 < at)
      .sortBy(_._1).lastOption.toList
      .flatMap(_._3).flatMap(b => f.blocks.get(b))

  /** None = supported; Some(reason) = skip (per case). */
  def caseReason(f: PyFile, c: PyCase): Option[String] = {
    val supportedFormats = Set("turtle", "ttl", "trig", "json-ld")
    if (c.expect.isEmpty && !c.expectLoadError)
      Some("no conforms assertion after validate() (asserts report internals)")
    else if (resolveBlocks(f, c.dataVar, c.offset).isEmpty)
      Some(s"data fixture ${c.dataVar} not inline")
    else if (c.shaclVar.exists(v => resolveBlocks(f, v, c.offset).isEmpty))
      Some("shapes fixture not inline")
    else if (c.opts.get("data_graph_format").exists(fm => !supportedFormats(fm)) ||
             c.opts.get("shacl_graph_format").exists(fm => !supportedFormats(fm)) ||
             c.opts.get("ont_graph_format").exists(fm => !supportedFormats(fm)))
      Some(s"non-turtle serialization ${c.opts.getOrElse("data_graph_format",
        c.opts.getOrElse("shacl_graph_format", ""))}")
    else if (c.opts.get("js").contains("True")) Some("js mode")
    else if (c.opts.get("do_owl_imports").contains("True")) Some("do_owl_imports (web fetch)")
    else if ((resolveBlocks(f, c.dataVar, c.offset) ++
              c.shaclVar.toList.flatMap(resolveBlocks(f, _, c.offset)))
             .exists(b => b.trim.startsWith("{") && b.contains("\"@context\": \"")))
      Some("json-ld with a remote @context (web fetch)")
    else None
  }

  def unsupportedReason(f: PyFile): Option[String] = {
    if (f.cases.isEmpty) return Some("no validate() call found")
    val reasons = f.cases.map(caseReason(f, _))
    if (reasons.forall(_.isDefined)) reasons.flatten.headOption else None
  }

  def run(spark: org.apache.spark.sql.SparkSession, f: PyFile): List[(Boolean, String)] =
    f.cases.filter(c => caseReason(f, c).isEmpty).map { c =>
      def parseOne(b: String, base: String, pfx: String, fmt: Option[String]): MemGraph =
        // content sniffing like the reference's loader (load.py:370-386):
        // a declared format can be wrong (test_036 marks Turtle as json-ld)
        if (b.trim.startsWith("{")) JsonLd.parseGraph(b, bnodePrefix = pfx)
        else if (fmt.contains("trig")) TrigParser.parseGraph(b, base, bnodePrefix = pfx)
        else TurtleParser.parseGraph(b, base, bnodePrefix = pfx)
      def parseAll(blocks: List[String], base: String, pfx: String,
                   fmt: Option[String] = None): MemGraph =
        blocks.zipWithIndex.map { case (b, i) =>
          parseOne(b, base, s"$pfx$i", fmt)
        }.reduce(_ ++ _)
      if (c.expectLoadError) {
        val ok =
          try {
            val dataG = parseAll(resolveBlocks(f, c.dataVar, c.offset), "file:///issue.ttl", "d")
            val shapesG = c.shaclVar.map(v =>
              parseAll(resolveBlocks(f, v, c.offset), "file:///shapes.ttl", "s"))
            Validator.validateGraph(spark, dataG, shapesG, ValidationOptions())
            false
          } catch {
            case _: ShapeLoadException | _: ReportableError => true
          }
        (ok, "expected a shape-load error")
      } else {
      val dataG = parseAll(resolveBlocks(f, c.dataVar, c.offset), "file:///issue.ttl", "d",
        c.opts.get("data_graph_format"))
      val ontG = c.ontVar.map(v => resolveBlocks(f, v, c.offset)).filter(_.nonEmpty)
        .map(ov => parseAll(ov, "file:///ont.ttl", "o"))
      val shapesG = c.shaclVar.map(v =>
        parseAll(resolveBlocks(f, v, c.offset), "file:///shapes.ttl", "s"))
      val opts = ValidationOptions(
        inference = c.opts.getOrElse("inference", "none") match {
          case "rdfs" => "rdfs"
          case "owlrl" | "both" => "owlrl"
          case _ => "none"
        },
        advanced = c.opts.get("advanced").contains("True"),
        iterateRules = c.opts.get("iterate_rules").contains("True"),
        abortOnFirst = c.opts.get("abort_on_first").contains("True"),
        allowInfos = c.opts.get("allow_infos").contains("True"),
        allowWarnings = c.opts.get("allow_warnings").contains("True"))
      val out = Validator.validateGraph(spark, dataG, shapesG, opts, ontGraph = ontG)
      // report-text content checks: pyshacl prints CURIEs, this engine full
      // IRIs, so CURIE tokens are matched by local name
      def norm(tok: String): String =
        if (tok.matches("\\w+:[^/].*") && !tok.startsWith("http")) tok.substring(tok.indexOf(':') + 1)
        else tok
      val textFails =
        c.textContains.filterNot(t => out.reportText.contains(norm(t)))
          .map(t => s"report text lacks '$t'") ++
        c.textNotContains.filter(t => out.reportText.contains(norm(t)))
          .map(t => s"report text unexpectedly contains '$t'")
      if (out.conforms != c.expect.get)
        (false, s"expected conforms=${c.expect.get} got ${out.conforms}")
      else if (textFails.nonEmpty) (false, textFails.mkString("; "))
      else (true, "")
      }
    }
}

class IssuesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/reference/test/issues"

  /** Per-file dispositions the generic extractor can't infer. Files whose
    * pytest bodies use parameterized templates / fixture composition /
    * programmatic graphs are replayed case-by-case in [[IssueTargetedSpec]];
    * the remainder are genuinely web- or Python-runtime-bound. */
  val knownSkip: Map[String, String] = Map(
    "test_076.py" -> "replayed in IssueTargetedSpec (asserts rule-derived triples in the mutated graph)",
    "test_116.py" -> "replayed in IssueTargetedSpec (%-template fixture composition)",
    "test_126.py" -> "replayed in IssueTargetedSpec (parameterized severity template + report-graph asserts)",
    "test_141.py" -> "replayed in IssueTargetedSpec (no-crash smoke, turtle + json-ld)",
    "test_142.py" -> "replayed in IssueTargetedSpec (ont_graph smoke)",
    "test_160.py" -> "replayed in IssueTargetedSpec (parameterized shapes template + report-graph asserts)",
    "test_298.py" -> "replayed in IssueTargetedSpec (programmatic JSON-LD graphs + use_shapes)",
    "test_304.py" -> "replayed in IssueTargetedSpec (subprocess PYTHONHASHSEED determinism -> two-run text equality)",
    "test_098.py" -> "web-bound: do_owl_imports fetches http IRIs (zero egress)",
    "test_108.py" -> "js-bound: pySHACL-js extension engine is out of scope",
    "test_146.py" -> "python-runtime-bound: asserts `import pyshacl` emits no warnings",
    "test_154.py" -> "web-bound: JSON-LD remote @context fetch (zero egress)",
    "test_319.py" -> "web+runtime-bound: local HTTP server owl:imports + CPython GC finalizer behavior")

  test("issue-regression corpus replays (pass/skip inventory)") {
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.toString)
      .filter(f => f.endsWith(".py") && f.split("/").last.startsWith("test_"))
      .toList.sorted
    assert(files.size >= 40)
    var pass = 0; var skip = 0
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    for (f <- files) {
      val short = f.split("/").last
      val parsed =
        try Right(IssueCorpus.parseFile(f))
        catch { case e: Throwable => Left(s"extractor: ${e.getMessage}") }
      parsed match {
        case Left(why) => skip += 1; info(s"SKIP $short — $why")
        case Right(pf) =>
          knownSkip.get(short).orElse(IssueCorpus.unsupportedReason(pf)) match {
            case Some(why) => skip += 1; info(s"SKIP $short — $why")
            case None =>
              try {
                val rs = IssueCorpus.run(spark, pf)
                val bad = rs.filterNot(_._1)
                if (bad.isEmpty) { pass += 1; info(s"PASS $short (${rs.size} case(s))") }
                else failures += s"$short: ${bad.map(_._2).mkString("; ")}"
              } catch {
                case e: Throwable =>
                  failures += s"$short: ${e.getClass.getSimpleName}: ${e.getMessage}"
              }
          }
      }
    }
    info(s"issue corpus: pass=$pass skip=$skip fail=${failures.size}")
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
