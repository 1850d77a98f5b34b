package graft.shacl

import graft.rdf._
import graft.rdf.TriplesDF.{termKey, termLit}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RDFS-subset closure over a triples DataFrame, mirroring the reference's
  * pre-validation inference step (inference='rdfs',
  * /root/reference/pyshacl/run_type.py:21-85 +
  * custom_rdfs_closure.py:34-55 — literal/Resource axiom noise is
  * deliberately not generated; the reference's comparator scrubs it anyway).
  *
  * Schema triples (subClassOf/subPropertyOf/domain/range) are collected to
  * the driver — ontology schemas stay small even when instance data is
  * 100 TB — and pushed back in as broadcastable literal pair-tables, so the
  * instance-scale work is three joins + a union, no fixpoint over big data:
  *   rdfs7  (s,p,o) + p subPropertyOf* q       -> (s,q,o)
  *   rdfs2  (s,p,o) + domain(p,c)              -> (s,type,c)
  *   rdfs3  (s,p,o) + range(p,c), o not lit    -> (o,type,c)
  *   rdfs9  (x,type,c) + c subClassOf* d       -> (x,type,d)
  *   rdfs5/11 transitive closures of the schema predicates themselves.
  */
object RdfsInference {

  private def transitive(pairs: Seq[(String, String)]): Seq[(String, String)] = {
    val adj = pairs.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val out = scala.collection.mutable.Set.empty[(String, String)]
    for (start <- adj.keys) {
      val seen = scala.collection.mutable.Set.empty[String]
      var frontier = adj(start).toList
      while (frontier.nonEmpty) {
        val next = frontier.filter(seen.add)
        next.foreach(n => out += ((start, n)))
        frontier = next.flatMap(n => adj.getOrElse(n, Set.empty))
      }
    }
    out.toSeq
  }

  private def keyNode(k: String): Node =
    if (k.startsWith("_:")) BNode(k.drop(2)) else Iri(k.drop(1).dropRight(1))

  def expand(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    val schemaPreds = Seq(RDFS.subClassOf, RDFS.subPropertyOf, RDFS.domain, RDFS.range).map(_.value)
    val schema = df.filter($"p".isin(schemaPreds: _*))
      .select($"p", termKey($"s").as("sk"), termKey($"o").as("ok")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    if (schema.isEmpty) return df

    val sc = transitive(schema.collect { case (p, s, o) if p == RDFS.subClassOf.value => (s, o) })
    val sp = transitive(schema.collect { case (p, s, o) if p == RDFS.subPropertyOf.value => (s, o) })
      // only IRI properties can appear in predicate position
      .filter { case (s, o) => s.startsWith("<") && o.startsWith("<") }
      .map { case (s, o) => (s.drop(1).dropRight(1), o.drop(1).dropRight(1)) }
    val dom = schema.collect { case (p, s, o) if p == RDFS.domain.value && s.startsWith("<") =>
      (s.drop(1).dropRight(1), o) }
    val rng = schema.collect { case (p, s, o) if p == RDFS.range.value && s.startsWith("<") =>
      (s.drop(1).dropRight(1), o) }

    var out = df
    // rdfs7: subPropertyOf propagation
    val withSuper =
      if (sp.isEmpty) df
      else {
        val spDF = sp.toDF("_sub", "_sup")
        val derived = df.join(broadcast(spDF), df("p") === $"_sub")
          .select($"s", $"_sup".as("p"), $"o")
        out = out.unionByName(derived)
        out
      }
    // rdfs2/3: domain/range type derivation (range skips literal objects)
    val typed = scala.collection.mutable.ListBuffer.empty[DataFrame]
    if (dom.nonEmpty) {
      val domDF = dom.toDF("_dp", "_dc")
      typed += withSuper.join(broadcast(domDF), withSuper("p") === $"_dp")
        .select($"s", lit(RDF.ty.value).as("p"),
          termKeyToTermCol(spark, $"_dc").as("o"))
    }
    if (rng.nonEmpty) {
      val rngDF = rng.toDF("_rp", "_rc")
      typed += withSuper.join(broadcast(rngDF), withSuper("p") === $"_rp")
        .filter($"o"("k") =!= 2)
        .select($"o".as("s"), lit(RDF.ty.value).as("p"),
          termKeyToTermCol(spark, $"_rc").as("o"))
    }
    typed.foreach(t => out = out.unionByName(t))
    // rdfs9: type propagation up the class hierarchy
    if (sc.nonEmpty) {
      val scDF = sc.toDF("_csub", "_csup")
      val upTypes = out.filter($"p" === RDF.ty.value)
        .join(broadcast(scDF), termKey($"o") === $"_csub")
        .select($"s", lit(RDF.ty.value).as("p"), termKeyToTermCol(spark, $"_csup").as("o"))
      out = out.unionByName(upTypes)
      // rdfs11: materialized transitive subClassOf triples
      val scTriples = TriplesDF.fromTriples(spark,
        sc.map { case (a, b) => Triple(keyNode(a), RDFS.subClassOf, keyNode(b)) })
      out = out.unionByName(scTriples)
    }
    out.distinct()
  }

  /** Build a term struct column from a term-key string column (keys here are
    * only IRIs/BNodes from the collected schema). */
  private def termKeyToTermCol(spark: SparkSession, keyCol: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions._
    when(keyCol.startsWith("_:"),
      struct(keyCol.substr(lit(3), length(keyCol)).as("v"), lit(1.toByte).as("k"),
        lit("").as("dt"), lit("").as("lang")))
      .otherwise(
        struct(regexp_replace(keyCol, "^<|>$", "").as("v"), lit(0.toByte).as("k"),
          lit("").as("dt"), lit("").as("lang")))
  }
}
