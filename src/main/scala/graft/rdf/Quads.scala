package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Named-graph (quad) layer — the analogue of the reference's
  * Dataset/multigraph handling (graph_abstraction.py:112-128 default-union,
  * :207-215 locked write context). Spark-side schema is the triples frame
  * plus a top-level `g` string column ("" = default graph), so per-graph
  * filters prune like predicate filters do. */
final case class Quad(s: Node, p: Iri, o: Node, g: Option[Iri])

object QuadsDF {
  val schema: StructType = StructType(TriplesDF.schema.fields :+
    StructField("g", StringType, nullable = false))

  def fromQuads(spark: SparkSession, qs: Seq[Quad]): DataFrame = {
    val rows = qs.map(q => Row(TriplesDF.rowOf(q.s), q.p.value, TriplesDF.rowOf(q.o),
      q.g.map(_.value).getOrElse("")))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  /** Default-union view (validator.py:316-317 forces default_union before
    * validation): one triples frame over every named graph + the default
    * graph; duplicates across graphs collapse (set semantics). */
  def defaultUnion(quads: DataFrame): DataFrame =
    quads.drop("g").distinct()

  /** One named graph (or the default graph for name = None). */
  def graph(quads: DataFrame, name: Option[String]): DataFrame =
    quads.filter(col("g") === name.getOrElse("")).drop("g")

  def graphNames(quads: DataFrame): Seq[String] = {
    import quads.sparkSession.implicits._
    quads.select($"g").distinct().as[String].collect().toSeq.filter(_.nonEmpty).sorted
  }

  /** Locked write context (graph_abstraction.py:207-215): add derived
    * triples into one named graph — e.g. inference output into
    * urn:pyshacl:inference — leaving source graphs untouched. */
  def addTriples(quads: DataFrame, triples: DataFrame, context: String): DataFrame =
    quads.unionByName(triples.withColumn("g", lit(context)))

  /** New-only triples of an expansion, directed to a locked context:
    * expanded \ defaultUnion lands in `context`. */
  def expandInto(quads: DataFrame, expanded: DataFrame, context: String): DataFrame = {
    val base = defaultUnion(quads)
    val fresh = expanded.join(base,
      expanded("s") === base("s") && expanded("p") === base("p") && expanded("o") === base("o"),
      "left_anti")
    addTriples(quads, fresh, context)
  }
}

/** TriG serializer (sink counterpart of [[TrigParser]]): default-graph
  * statements first, then one sorted `GRAPH <g> { ... }` block per named
  * graph; N-Triples term syntax throughout so round-trips are exact. */
object TrigWriter {
  private def line(q: Quad): String =
    s"${NTriplesWriter.node(q.s)} ${NTriplesWriter.node(q.p)} ${NTriplesWriter.node(q.o)} ."

  def write(quads: Seq[Quad]): String = {
    val sb = new StringBuilder
    val (dflt, named) = quads.partition(_.g.isEmpty)
    dflt.map(line).sorted.distinct.foreach(l => sb.append(l).append('\n'))
    for ((g, qs) <- named.groupBy(_.g.get.value).toSeq.sortBy(_._1)) {
      sb.append(s"GRAPH <$g> {\n")
      qs.map(line).sorted.distinct.foreach(l => sb.append("  ").append(l).append('\n'))
      sb.append("}\n")
    }
    sb.toString
  }
}

/** TriG reader: Turtle plus named-graph blocks (`GRAPH <g> { ... }`,
  * `<g> { ... }`, `{ ... }` for the default graph). Implemented as a
  * top-level segmenter (string/comment/IRI-aware) that delegates each
  * segment to the Turtle parser with the document's directive header —
  * the reference gets TriG via rdflib's plugin
  * (rdfutil/load.py:370-386 format sniffing). */
object TrigParser {

  final case class Segment(graph: Option[String], text: String)

  def parseGraphQuads(content: String, base: String,
                      bnodePrefix: String = "b"): Seq[Quad] = {
    val (header, segments) = segmentize(content)
    segments.zipWithIndex.flatMap { case (seg, i) =>
      val (triples, _) =
        new TurtleParser(header + "\n" + seg.text, base, s"$bnodePrefix$i").parse()
      val g = seg.graph.map(resolveLabel(_, header, base))
      triples.map(t => Quad(t.s, t.p, t.o, g))
    }
  }

  /** Load into a default-union MemGraph (what validation consumes). */
  def parseGraph(content: String, base: String, bnodePrefix: String = "b"): MemGraph = {
    val g = new MemGraph
    parseGraphQuads(content, base, bnodePrefix).foreach(q => g.add(q.s, q.p, q.o))
    g
  }

  private def resolveLabel(label: String, header: String, base: String): Iri = {
    // run the label through the Turtle parser to expand prefixed names
    val (ts, _) = new TurtleParser(s"$header\n$label <urn:x> <urn:y> .", base, "g").parse()
    ts.headOption match {
      case Some(Triple(i: Iri, _, _)) => i
      case _ => throw new IllegalArgumentException(s"cannot resolve TriG graph label $label")
    }
  }

  /** Split a TriG document into its directive header, default-graph
    * statements and named-graph blocks. Tracks strings (single/triple
    * quoted), comments and IRI refs so braces inside them don't count. */
  def segmentize(content: String): (String, Seq[Segment]) = {
    val header = new StringBuilder
    val segs = scala.collection.mutable.ListBuffer.empty[Segment]
    val defaultSeg = new StringBuilder
    var i = 0
    val n = content.length
    val pending = new StringBuilder // statement text since last boundary

    def skipString(from: Int): Int = {
      val q = content.charAt(from)
      val triple = from + 2 < n && content.charAt(from + 1) == q && content.charAt(from + 2) == q
      var j = if (triple) from + 3 else from + 1
      while (j < n) {
        val c = content.charAt(j)
        if (c == '\\') j += 2
        else if (c == q && (!triple ||
          (j + 2 < n && content.charAt(j + 1) == q && content.charAt(j + 2) == q)))
          return if (triple) j + 3 else j + 1
        else j += 1
      }
      j
    }

    while (i < n) {
      val c = content.charAt(i)
      if (c == '"' || c == '\'') {
        val end = skipString(i)
        pending.append(content.substring(i, end)); i = end
      } else if (c == '#') {
        while (i < n && content.charAt(i) != '\n') i += 1
      } else if (c == '<') {
        val end = content.indexOf('>', i)
        val stop = if (end < 0) n else end + 1
        pending.append(content.substring(i, stop)); i = stop
      } else if (c == '{') {
        // pending holds the graph label (possibly with GRAPH keyword) or is
        // blank for an anonymous default-graph block
        var label = pending.toString.trim
        pending.clear()
        if (label.toUpperCase.startsWith("GRAPH") &&
            (label.length == 5 || label.charAt(5).isWhitespace))
          label = label.substring(5).trim
        // find the matching close brace at depth 0 of this block
        var depth = 1
        var j = i + 1
        val body = new StringBuilder
        while (j < n && depth > 0) {
          val cc = content.charAt(j)
          if (cc == '"' || cc == '\'') { val e = skipString(j); body.append(content.substring(j, e)); j = e }
          else if (cc == '#') { while (j < n && content.charAt(j) != '\n') j += 1 }
          else if (cc == '<') {
            val e = content.indexOf('>', j); val stop = if (e < 0) n else e + 1
            body.append(content.substring(j, stop)); j = stop
          } else {
            if (cc == '{') depth += 1
            else if (cc == '}') depth -= 1
            if (depth > 0) body.append(cc)
            j += 1
          }
        }
        segs += Segment(if (label.isEmpty) None else Some(label), body.toString)
        i = j
        // optional trailing '.' after a graph block
        var k = i
        while (k < n && content.charAt(k).isWhitespace) k += 1
        if (k < n && content.charAt(k) == '.') i = k + 1
      } else if (c == '.' &&
                 (i + 1 >= n || content.charAt(i + 1).isWhitespace ||
                  content.charAt(i + 1) == '#')) {
        // statement boundary: a '.' inside decimals (1.5) or dotted local
        // names (ex:v1.2) is followed by a name char, not whitespace
        pending.append(c)
        val st = pending.toString
        val trimmed = st.trim
        if (trimmed.startsWith("@prefix") || trimmed.startsWith("@base") ||
            trimmed.toUpperCase.startsWith("PREFIX") || trimmed.toUpperCase.startsWith("BASE"))
          header.append(st).append("\n")
        else defaultSeg.append(st).append("\n")
        pending.clear()
        i += 1
      } else { pending.append(c); i += 1 }
    }
    if (pending.toString.trim.nonEmpty) defaultSeg.append(pending)
    val out =
      (if (defaultSeg.toString.trim.nonEmpty) Seq(Segment(None, defaultSeg.toString)) else Nil) ++
        segs.toList
    (header.toString, out)
  }
}
