package graft.shacl

import graft.rdf._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** High-level validation entry point — the analogue of pyshacl.validate()
  * (/root/reference/pyshacl/entrypoints.py:33-256 +
  * /root/reference/pyshacl/validator.py:193-342).
  *
  * Data scales through the DataFrame path; the shapes graph is compiled
  * driver-side (it is always small). When no shapes graph is supplied the
  * data graph doubles as the shapes graph (validator.py:73-83).
  */
object Validator {

  final case class Outcome(
    conforms: Boolean,
    reportGraph: MemGraph,
    reportNode: Node,
    reportText: String,
    results: Seq[ResultRow])

  /** Validate a driver-side data graph (tests / small graphs): the data is
    * shipped through the same DataFrame engine; CBDs for report cloning
    * come from the in-memory graph. */
  def validateGraph(
      spark: SparkSession,
      dataGraph: MemGraph,
      shapesGraph: Option[MemGraph],
      opts: ValidationOptions = ValidationOptions()): Outcome = {
    val sg = shapesGraph.getOrElse(dataGraph)
    val df0 = TriplesDF.fromMemGraph(spark, dataGraph)
    val df = if (opts.inference == "rdfs") RdfsInference.expand(spark, df0) else df0
    validateFrame(spark, df, sg, dataCbd = n => dataGraph.cbd(n), opts)
  }

  /** Validate an arbitrary triples DataFrame (the at-scale path). CBDs for
    * blank-node report cloning are fetched via targeted scans. */
  def validateFrame(
      spark: SparkSession,
      triples: DataFrame,
      shapesGraph: MemGraph,
      dataCbd: Node => Seq[Triple],
      opts: ValidationOptions = ValidationOptions()): Outcome = {
    // advanced mode: apply SHACL-AF rules (graph mutation) before any
    // constraint runs — validator.py:323-330
    val expanded =
      if (opts.advanced) RulesEngine.expand(spark, triples, shapesGraph, opts.iterateRules)
      else triples
    val shapes = new ShapeCompiler(shapesGraph).compile()
    val engine = new ValidationEngine(spark, expanded, shapes, shapesGraph, opts)
    val rows = engine.run()
    // allow_infos/allow_warnings: allowed severities still report but do not
    // flip conformance (shape.py:729-741)
    val allowed: Set[Iri] =
      (if (opts.allowWarnings) Set(SH.Info, SH.Warning)
       else if (opts.allowInfos) Set(SH.Info)
       else Set.empty[Iri])
    val shapesByKey = shapes.values.map(sh => sh.id.key -> sh).toMap
    val blocking = rows.filterNot(r =>
      allowed.contains(shapesByKey.get(r.shapeKey).map(_.severity).getOrElse(SH.Violation)))
    val conformsV = blocking.isEmpty
    val (conforms, g, rep) = ReportBuilder.build(rows, shapes, shapesGraph, dataCbd,
      conformsOverride = Some(conformsV))
    Outcome(conforms, g, rep, ReportBuilder.text(conforms, rows, shapes), rows)
  }

  /** CBD provider over a DataFrame for the at-scale path: one targeted
    * filter per requested bnode subtree (reports are small). */
  def frameCbd(spark: SparkSession, triples: DataFrame)(root: Node): Seq[Triple] = {
    import org.apache.spark.sql.functions._
    val out = scala.collection.mutable.ListBuffer.empty[Triple]
    val seen = scala.collection.mutable.Set.empty[Node]
    var frontier: Seq[Node] = Seq(root)
    while (frontier.nonEmpty) {
      val keys = frontier.map(_.key)
      val got = TriplesDF.collectTriples(
        triples.filter(TriplesDF.termKey(col("s")).isin(keys: _*)))
      out ++= got
      seen ++= frontier
      frontier = got.map(_.o).collect { case b: BNode if !seen.contains(b) => b }.distinct
    }
    out.toSeq.distinct
  }
}
