package graft.shacl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.rdf._

/** inference='owlrl' must actually infer (it silently behaved as 'none' in
  * round 1 — VERDICT item 9). */
class OwlRlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def expandTtl(ttl: String): MemGraph = {
    val g = TurtleParser.parseGraph(ttl, "http://test/")
    MemGraph(TriplesDF.collectTriples(
      OwlRlInference.expand(spark, TriplesDF.fromMemGraph(spark, g))))
  }

  val prefixes =
    """@prefix owl: <http://www.w3.org/2002/07/owl#> .
      |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
      |@prefix ex: <http://ex.org/> .
      |""".stripMargin

  test("inverseOf, symmetric and transitive properties materialize") {
    val g = expandTtl(prefixes +
      """ex:parentOf owl:inverseOf ex:childOf .
        |ex:knows a owl:SymmetricProperty .
        |ex:ancestorOf a owl:TransitiveProperty .
        |ex:a ex:parentOf ex:b .
        |ex:x ex:knows ex:y .
        |ex:p ex:ancestorOf ex:q . ex:q ex:ancestorOf ex:r . ex:r ex:ancestorOf ex:s .
        |""".stripMargin)
    def I(l: String) = Iri("http://ex.org/" + l)
    assert(g.contains(I("b"), I("childOf"), I("a")))
    assert(g.contains(I("y"), I("knows"), I("x")))
    assert(g.contains(I("p"), I("ancestorOf"), I("s")))
  }

  test("a chain that fires only through a sameAs alias materializes (outer fixpoint)") {
    val g = expandTtl(prefixes +
      """ex:grand owl:propertyChainAxiom (ex:parentOf ex:parentOf) .
        |ex:a ex:parentOf ex:b1 .
        |ex:b2 ex:parentOf ex:c .
        |ex:b1 owl:sameAs ex:b2 .
        |""".stripMargin)
    // the chain has no b-join until eq-rep replicates parentOf onto the
    // b1/b2 alias pair; the second classify round must then fire it
    def I(l: String) = Iri("http://ex.org/" + l)
    assert(g.contains(I("a"), I("grand"), I("c")))
  }

  test("fp-derived sameAs replicates and re-fires classification") {
    val g = expandTtl(prefixes +
      """ex:ssn a owl:FunctionalProperty .
        |ex:a ex:ssn ex:k1 .
        |ex:a ex:ssn ex:k2 .
        |ex:k1 ex:label "K" .
        |""".stripMargin)
    // fp → k1 sameAs k2 → replication copies the label onto k2
    def I(l: String) = Iri("http://ex.org/" + l)
    assert(g.contains(I("k2"), I("label"), Lit("K")))
  }

  test("someValuesFrom owl:Thing classifies any subject with the property (cls-svf2)") {
    val g = expandTtl(prefixes +
      """ex:HasChild a owl:Class ;
        |  owl:onProperty ex:child ; owl:someValuesFrom owl:Thing .
        |ex:a ex:child ex:b .
        |""".stripMargin)
    def I(l: String) = Iri("http://ex.org/" + l)
    assert(g.contains(I("a"), RDF.ty, I("HasChild")))
  }

  test("maxCardinality 1 merges property values via sameAs (cls-maxc2)") {
    val g = expandTtl(prefixes +
      """ex:SingleParented a owl:Class ;
        |  owl:onProperty ex:parent ; owl:maxCardinality 1 .
        |ex:kid a ex:SingleParented ; ex:parent ex:p1 , ex:p2 .
        |ex:p1 ex:label "P" .
        |ex:other ex:parent ex:q1 , ex:q2 .
        |""".stripMargin)
    def I(l: String) = Iri("http://ex.org/" + l)
    // replication through the derived p1 sameAs p2 copies the label
    assert(g.contains(I("p2"), I("label"), Lit("P")))
    // untyped subjects must NOT merge their values
    assert(!g.contains(I("q1"), Iri(owlNs + "sameAs"), I("q2")) &&
      !g.contains(I("q2"), Iri(owlNs + "sameAs"), I("q1")))
  }

  test("maxQualifiedCardinality 1 merges only onClass-typed values (cls-maxqc3)") {
    val g = expandTtl(prefixes +
      """ex:R a owl:Class ; owl:onProperty ex:owns ;
        |  owl:maxQualifiedCardinality 1 ; owl:onClass ex:Car .
        |ex:x a ex:R ; ex:owns ex:c1 , ex:c2 , ex:dog .
        |ex:c1 a ex:Car . ex:c2 a ex:Car .
        |ex:c1 ex:plate "Z-1" .
        |""".stripMargin)
    def I(l: String) = Iri("http://ex.org/" + l)
    assert(g.contains(I("c2"), I("plate"), Lit("Z-1"))) // c1 sameAs c2 replicated
    // the dog is not a Car: it must not merge with the cars
    assert(!g.contains(I("dog"), I("plate"), Lit("Z-1")))
  }

  private val owlNs = "http://www.w3.org/2002/07/owl#"

  test("inconsistency detection: every 'false' rule fires distributed") {
    val g = TurtleParser.parseGraph(prefixes +
      """ex:a owl:sameAs ex:b ; owl:differentFrom ex:b .
        |ex:nil a owl:Nothing .
        |ex:Empty a owl:Class ; owl:onProperty ex:child ; owl:maxCardinality 0 .
        |ex:x a ex:Empty ; ex:child ex:y .
        |ex:near a owl:IrreflexiveProperty .
        |ex:p ex:near ex:p .
        |ex:beats a owl:AsymmetricProperty .
        |ex:r ex:beats ex:s . ex:s ex:beats ex:r .
        |ex:likes owl:propertyDisjointWith ex:hates .
        |ex:m ex:likes ex:n . ex:m ex:hates ex:n .
        |ex:Cat owl:disjointWith ex:Dog .
        |ex:rex a ex:Cat , ex:Dog .
        |ex:fine a ex:Cat . ex:ok ex:likes ex:n .
        |ex:bad ex:age "notanum"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |ex:good ex:age "31"^^<http://www.w3.org/2001/XMLSchema#integer> ;
        |  ex:tag "x"^^<http://ex.org/customDt> .
        |""".stripMargin, "http://test/")
    val df = TriplesDF.fromMemGraph(spark, g)
    val found = OwlRlInference.inconsistencies(spark, df)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(found.contains(("eq-diff1", "<http://ex.org/a>")))
    assert(found.contains(("cls-nothing2", "<http://ex.org/nil>")))
    assert(found.contains(("cls-maxc1", "<http://ex.org/x>")))
    assert(found.contains(("prp-irp", "<http://ex.org/p>")))
    assert(found.contains(("prp-asyp", "<http://ex.org/r>")))
    assert(found.contains(("prp-pdw", "<http://ex.org/m>")))
    assert(found.contains(("cax-dw", "<http://ex.org/rex>")))
    assert(found.contains(("dt-not-type", "<http://ex.org/bad>")))
    // innocents are not flagged (incl. well-typed and unknown datatypes)
    assert(!found.exists(_._2 == "<http://ex.org/fine>"))
    assert(!found.exists(_._2 == "<http://ex.org/ok>"))
    assert(!found.exists(_._2 == "<http://ex.org/good>"))
    // a clean graph yields an empty frame
    val clean = TurtleParser.parseGraph(prefixes + "ex:a ex:p ex:b .", "http://test/")
    assert(OwlRlInference.inconsistencies(spark,
      TriplesDF.fromMemGraph(spark, clean)).count() == 0)
  }

  test("--strict-owlrl: inconsistent data aborts with the reference's failure") {
    // reference parity: pySHACL's owlrl pre-inference fails on inconsistent
    // data and validation aborts (run_type.py:82-85); default mode proceeds
    val data = TurtleParser.parseGraph(prefixes +
      "ex:a owl:sameAs ex:b ; owl:differentFrom ex:b .", "http://test/")
    val shapes = TurtleParser.parseGraph(prefixes +
      """@prefix sh: <http://www.w3.org/ns/shacl#> .
        |ex:S a sh:NodeShape ; sh:targetNode ex:a .""".stripMargin, "http://test/")
    // default: diagnostics frame, validation proceeds and conforms
    val lax = Validator.validateGraph(spark, data, Some(shapes),
      ValidationOptions(inference = "owlrl"))
    assert(lax.conforms)
    // strict: the reference's abort text, naming the offending node
    val ex = intercept[ReportableError](
      Validator.validateGraph(spark, data, Some(shapes),
        ValidationOptions(inference = "owlrl", failOnInconsistency = true)))
    assert(ex.getMessage.startsWith("Error while running OWL-RL Deductive Closure"))
    assert(ex.getMessage.contains("eq-diff1") && ex.getMessage.contains("ex.org/a"))
    // the CLI flag wires through
    assert(graft.tools.ShaclCli.parseArgs(
      Array("d.ttl", "--inference", "owlrl", "--strict-owlrl")).opts.failOnInconsistency)
  }

  test("malformed cyclic rdf:rest chain terminates instead of hanging") {
    val g = expandTtl(prefixes +
      """@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        |ex:grand owl:propertyChainAxiom _:l1 .
        |_:l1 rdf:first ex:parentOf ; rdf:rest _:l2 .
        |_:l2 rdf:first ex:parentOf ; rdf:rest _:l1 .
        |ex:a ex:parentOf ex:b . ex:b ex:parentOf ex:c .
        |""".stripMargin)
    // the cycle guard truncates the walk at the first repeated cell; the
    // (two-element) prefix still fires as a chain
    def I(l: String) = Iri("http://ex.org/" + l)
    assert(g.contains(I("a"), I("grand"), I("c")))
  }

  test("equivalentClass/equivalentProperty and sameAs replicate assertions") {
    val g = expandTtl(prefixes +
      """ex:Human owl:equivalentClass ex:Person .
        |ex:name owl:equivalentProperty ex:label .
        |ex:alice a ex:Human ; ex:name "Alice" .
        |ex:bob owl:sameAs ex:robert .
        |ex:robert ex:age "44" .
        |""".stripMargin)
    def I(l: String) = Iri("http://ex.org/" + l)
    assert(g.contains(I("alice"), RDF.ty, I("Person")))
    assert(g.contains(I("alice"), I("label"), Lit("Alice")))
    assert(g.contains(I("bob"), I("age"), Lit("44")))
  }

  test("property chains: hasParent∘hasParent -> hasGrandparent") {
    val g = expandTtl(prefixes +
      """ex:hasGrandparent owl:propertyChainAxiom ( ex:hasParent ex:hasParent ) .
        |ex:a ex:hasParent ex:b . ex:b ex:hasParent ex:c . ex:c ex:hasParent ex:d .
        |""".stripMargin)
    def I(l: String) = Iri("http://ex.org/" + l)
    assert(g.contains(I("a"), I("hasGrandparent"), I("c")))
    assert(g.contains(I("b"), I("hasGrandparent"), I("d")))
    assert(!g.contains(I("a"), I("hasGrandparent"), I("d")))
  }

  test("FunctionalProperty / InverseFunctionalProperty derive sameAs + replication") {
    val g = expandTtl(prefixes +
      """ex:hasMother a owl:FunctionalProperty .
        |ex:email a owl:InverseFunctionalProperty .
        |ex:kid ex:hasMother ex:m1 . ex:kid ex:hasMother ex:m2 .
        |ex:m1 ex:age "40" .
        |ex:u1 ex:email "x@y.z" . ex:u2 ex:email "x@y.z" .
        |ex:u1 ex:nick "Ed" .
        |""".stripMargin)
    def I(l: String) = Iri("http://ex.org/" + l)
    val sameAs = Iri("http://www.w3.org/2002/07/owl#sameAs")
    assert(g.contains(I("m1"), sameAs, I("m2")) || g.contains(I("m2"), sameAs, I("m1")))
    assert(g.contains(I("m2"), I("age"), Lit("40"))) // replicated onto the alias
    assert(g.contains(I("u2"), I("nick"), Lit("Ed")))
  }

  test("someValuesFrom / hasValue / allValuesFrom classification + oneOf") {
    val g = expandTtl(prefixes +
      """ex:CatOwner owl:equivalentClass [ a owl:Restriction ;
        |    owl:onProperty ex:hasPet ; owl:someValuesFrom ex:Cat ] .
        |ex:Vip owl:equivalentClass [ a owl:Restriction ;
        |    owl:onProperty ex:status ; owl:hasValue "gold" ] .
        |ex:felix a ex:Cat . ex:anna ex:hasPet ex:felix .
        |ex:bob ex:status "gold" .
        |ex:Primary owl:oneOf ( ex:red ex:green ex:blue ) .
        |""".stripMargin)
    def I(l: String) = Iri("http://ex.org/" + l)
    // anna is typed with the restriction node, and via equivalentClass
    // (mutual subclassing through the final RDFS pass) with CatOwner
    assert(g.contains(I("anna"), RDF.ty, I("CatOwner")))
    assert(g.contains(I("bob"), RDF.ty, I("Vip")))
    assert(g.contains(I("red"), RDF.ty, I("Primary")))
    assert(g.contains(I("blue"), RDF.ty, I("Primary")))
  }

  test("sameAs substitutes subject AND object together (double-alias fixpoint)") {
    val g = expandTtl(prefixes +
      """ex:a owl:sameAs ex:b .
        |ex:c owl:sameAs ex:d .
        |ex:a ex:likes ex:c .
        |""".stripMargin)
    def I(l: String) = Iri("http://ex.org/" + l)
    // all four alias combinations must materialize (owlrl runs eq-rep to
    // fixpoint; two independent single-pass substitutions miss (b, likes, d))
    for (s <- Seq("a", "b"); o <- Seq("c", "d"))
      assert(g.contains(I(s), I("likes"), I(o)), s"missing ($s likes $o)")
  }

  test("1M-pair sameAs closure runs distributed with bounded driver memory") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val owl = "http://www.w3.org/2002/07/owl#"
    val ex = "http://ex.org/e/"
    val nPairs = 1000000L
    def iriT(c: org.apache.spark.sql.Column) =
      struct(c.as("v"), lit(0.toByte).as("k"), lit("").as("dt"), lit("").as("lang"))
    // pair i: e{2i} sameAs e{2i+1}
    val sameAs = spark.range(nPairs).select(
      iriT(concat(lit(ex), (col("id") * 2).cast("string"))).as("s"),
      lit(owl + "sameAs").as("p"),
      iriT(concat(lit(ex), (col("id") * 2 + 1).cast("string"))).as("o"))
    // an attribute on the even member of the first 1000 pairs
    val attrs = spark.range(1000).select(
      iriT(concat(lit(ex), (col("id") * 2).cast("string"))).as("s"),
      lit("http://ex.org/name").as("p"),
      struct(concat(lit("n"), col("id").cast("string")).as("v"), lit(2.toByte).as("k"),
        lit("").as("dt"), lit("").as("lang")).as("o"))
    assert(nPairs > OwlRlInference.DriverSameAsLimit) // exercises the CC path
    val out = OwlRlInference.expand(spark, sameAs.unionByName(attrs))
    // every attribute replicates onto the odd alias: (e{2i+1}, name, n_i)
    val replicated = out.filter(col("p") === "http://ex.org/name" &&
      col("s")("v") === (ex + "7") && col("o")("v") === "n3").count()
    assert(replicated == 1L)
    // total attribute rows: 1000 originals + 1000 aliases
    assert(out.filter(col("p") === "http://ex.org/name").count() == 2000L)
  }

  test("validateGraph honors inference='owlrl'") {
    val data = TurtleParser.parseGraph(prefixes +
      """ex:Human owl:equivalentClass ex:Person .
        |ex:alice a ex:Human .
        |""".stripMargin, "http://test/")
    val shapes = TurtleParser.parseGraph(
      """@prefix sh: <http://www.w3.org/ns/shacl#> .
        |@prefix ex: <http://ex.org/> .
        |ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
        |  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
        |""".stripMargin, "http://test/s")
    // with owlrl inference alice becomes a Person and violates minCount;
    // with none there are no focus nodes at all
    val none = Validator.validateGraph(spark, data, Some(shapes))
    val owlrl = Validator.validateGraph(spark, data, Some(shapes),
      ValidationOptions(inference = "owlrl"))
    assert(none.conforms)
    assert(!owlrl.conforms)
  }
}
