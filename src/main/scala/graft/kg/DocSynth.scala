package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}

/** Span/doc model — exact input_hint shape from BASELINE.json:
  * (doc_id string, spans array<struct<kind,text,media_ref,offset:int>>).
  * media spans carry a null text; text spans a null media_ref. */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)
final case class Doc(doc_id: String, spans: Seq[Span])

/** Deterministic synthetic interleaved text+media document table.
  *
  * Seeded, distributed (spark.range -> per-row splittable hash RNG), and
  * scale-free: the same (seed, id) always produces the same row at any
  * row count/partitioning, so correctness tests and benchmarks agree.
  * Entity ids are Zipf-ish (log-uniform inverse CDF) to exercise skew
  * handling in the downstream connected-components join.
  */
object DocSynth {
  val EntityVocab = 10000

  // splittable counter hash (SplitMix64 finalizer — public domain constant
  // mixing, same scheme java.util.SplittableRandom uses)
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def u01(seed: Long, id: Long, slot: Long): Double = {
    val h = mix(mix(mix(seed) ^ id) ^ slot)
    ((h >>> 11).toDouble) / (1L << 53).toDouble
  }

  /** Zipf-ish entity id in [0, vocab): log-uniform inverse CDF — heavy head,
    * long tail; entity 0 appears orders of magnitude more than entity V-1. */
  def entityAt(seed: Long, docId: Long, slot: Int, vocab: Int = EntityVocab): Long = {
    val u = u01(seed, docId, slot.toLong)
    math.min(vocab - 1L, math.exp(u * math.log(vocab.toDouble)).toLong - 1L).max(0L)
  }

  private val words = Vector("the", "fast", "graph", "node", "edge", "span", "link",
    "data", "text", "media", "image", "audio", "doc", "entity", "mention", "a", "of")

  /** `fat` scales tokens-per-span (1 = unit-test size; ~20 approximates a
    * real web document and makes per-doc compute dominate shuffle cost in
    * benchmarks). Token content is unchanged for fat=1. */
  def spansFor(seed: Long, id: Long, fat: Int = 1): Seq[Span] = {
    val nSpans = 2 + (u01(seed, id, -1) * 6).toInt // 2..7 spans
    var offset = 0
    (0 until nSpans).map { j =>
      val isMedia = u01(seed, id, 100 + j) < 0.3
      if (isMedia) {
        val m = s"media://obj/${mix(mix(seed) ^ id ^ (200 + j)).toHexString.take(12)}"
        val s = Span("media", null, m, offset)
        offset += 1
        s
      } else {
        val nTok = (3 + (u01(seed, id, 300 + j) * 8).toInt) * fat
        val toks = (0 until nTok).map { t =>
          val u = u01(seed, id, 1000 + j * 64 + t)
          if (u < 0.35) s"Entity_${entityAt(seed, id, j * 64 + t)}"
          else words(((u * 9973).toInt) % words.size)
        }
        val text = toks.mkString(" ")
        val s = Span("text", text, null, offset)
        offset += text.length + 1
        s
      }
    }
  }

  def docs(spark: SparkSession, n: Long, seed: Long = 42,
           partitions: Int = 32, fat: Int = 1): Dataset[Doc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(id => Doc(s"doc:$id", spansFor(seed, id, fat)))
  }
}
