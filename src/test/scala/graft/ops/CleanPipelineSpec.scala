package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** CleanPipeline staged run: per-stage lineage counts, checkpoint-resume
  * (stage parquet reused byte-for-byte, metrics not duplicated), and
  * staged-vs-pure-composition equality. The >= 500k-doc SIGKILL/resume
  * soak runs through tools.CleanCli (BASELINE.md r7); this spec pins the
  * semantics at CI scale. */
class CleanPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsWithUrl = {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val url = concat(lit("HTTPS://Ex.COM:443/"),
      when($"doc_id" % 25 === 0, concat(lit("shared/"), ($"doc_id" % 2).cast("string")))
        .otherwise(concat(lit("u/"), $"doc_id".cast("string"))),
      lit("?utm_source=feed&p=1#frag"))
    val isBench = $"doc_id" % 7 === 0
    (all.filter(!isBench).select($"doc_id", $"lang", $"source", $"text", url.as("url")),
      all.filter(isBench).select($"doc_id", $"text"))
  }

  test("staged run: monotone stage counts, reason metrics, resume reuses outputs") {
    val root = java.nio.file.Files.createTempDirectory("cleanpipe").toString
    val (docs, bench) = docsWithUrl
    val ck = "sf0.001;v1"
    val c1 = CleanPipeline.run(spark, root, docs, bench, ck, minWords = 20)
    assert(c1.docsIn > 0)
    assert(c1.afterStrip == c1.docsIn) // strip drops nothing
    assert(c1.afterUrlDedup < c1.afterStrip) // the %25 collision class collapses
    assert(c1.afterQuality <= c1.afterUrlDedup)
    assert(c1.afterClean == c1.afterQuality) // clean rewrites, never drops
    assert(c1.afterDecontaminate <= c1.afterClean)
    assert(c1.sampled < c1.afterDecontaminate && c1.sampled > 0)
    assert(c1.tokensCut >= 0)
    // reason metrics recorded once per computed stage
    val lin = new graft.kg.Lineage(spark, root, "clean1")
    val ms = lin.metrics().select($"stage", $"metric").as[(String, String)]
      .collect().groupBy(identity).view.mapValues(_.length).toMap
    assert(ms(("url_dedup", "dropped_url_dup")) == 1)
    assert(ms(("quality", "dropped_quality_fail")) == 1)
    assert(ms(("decontaminate", "dropped_contaminated")) == 1)
    assert(ms(("sample", "dropped_sampled_out")) == 1)

    // resume: identical checksum reuses every stage's parquet (mtimes
    // untouched) and appends no duplicate reason metrics
    def mtimes = Seq("strip", "url_dedup", "quality", "substring_clean",
      "decontaminate", "sample").map { s =>
      s -> new java.io.File(s"$root/$s/_SUCCESS").lastModified()
    }.toMap
    val before = mtimes
    val c2 = CleanPipeline.run(spark, root, docs, bench, ck, minWords = 20)
    assert(c2 == c1)
    assert(mtimes == before, "resume must not rewrite completed stage outputs")
    val ms2 = lin.metrics().select($"stage", $"metric").as[(String, String)]
      .collect().groupBy(identity).view.mapValues(_.length).toMap
    assert(ms2(("url_dedup", "dropped_url_dup")) == 1, "resume duplicated metrics")
    assert(ms2.getOrElse(("sample", "resumed"), 0) >= 1)

    // changed checksum recomputes (different quality gate -> new counts)
    val c3 = CleanPipeline.run(spark, root, docs, bench, "sf0.001;v2", minWords = 1)
    assert(c3.afterQuality >= c1.afterQuality) // looser gate keeps at least as much
    assert(mtimes("quality") != before("quality"), "changed checksum must recompute")

    // staged output == pure composition (same stages, no lineage layer);
    // compare against the LATEST staged run (v2, minWords = 1)
    val direct = CleanPipeline.decontaminateDrop(
      CleanPipeline.substringClean(
        CleanPipeline.qualityFilter(
          CleanPipeline.urlDedup(
            CleanPipeline.strip(docs, "text"), "doc_id", "url"),
          "text", minWords = 1),
        "doc_id", "text"),
      bench, "doc_id", "text", "doc_id", "text")
    val directSampled = Sampling.sampleStratified(direct, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.25), 0.1)
    val fromStage = spark.read.parquet(s"$root/sample")
    assert(fromStage.select($"doc_id", $"text").collect().map(_.toString).sorted.toSeq ==
      directSampled.select($"doc_id", $"text").collect().map(_.toString).sorted.toSeq)
  }
}
