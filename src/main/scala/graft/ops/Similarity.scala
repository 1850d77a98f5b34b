package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k (one broadcast of the query set, one
  * codegen'd zip_with dot product, one windowed top-k — correct at any
  * scale, linear cost). Scale path: random-hyperplane LSH bucketing (or the
  * same code with an IVF coarse quantizer column), so candidates per query
  * are bounded; cosine verify runs only inside buckets.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    // cast BEFORE multiplying: float*float rounds each product to 24-bit
    // mantissa, double*double keeps full precision (and matches how any
    // SQL engine with a double list type computes the same product)
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (greatest(norm(a), lit(1e-12)) * greatest(norm(b), lit(1e-12))), 6)

  /** Dot through the native [[ArrayDotProduct]] expression (codegen'd
    * primitive loop; bit-identical fold order to dot()). Callers must have
    * run ArrayDotProduct.ensure(spark) — every public entry here does. */
  private[ops] def dotFast(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** cosine() with the norms precomputed per ROW instead of per PAIR and
    * the dot via the codegen'd native expression — identical arithmetic
    * (same doubles, same operation order, so results are bit-equal to
    * cosine() and DuckDB-comparable), but a candidate join scoring k pairs
    * per row does one primitive loop per pair instead of three interpreted
    * higher-order aggregates. sf0.1 near-dup verify: 33 s -> ~4 s. */
  private[ops] def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    round(dotFast(a, b) / (na * nb), 6)

  /** Guarded per-row norm column (matches cosine()'s greatest(..., 1e-12)). */
  private[ops] def nrm(vec: Column): Column = greatest(norm(vec), lit(1e-12))

  /** Shared candidate verify + rank: exact cosine on the joined candidate
    * pairs, per-query row_number (ties toward the smaller item_id), top-k.
    * Every ANN path — both fast scale paths AND both portable twins — ends
    * here, so a fix to the verify/rank contract cannot desynchronize a
    * twin from the DuckDB oracle that mirrors it. Expects the item side
    * as (item_id, item_vec, item_nrm, joinCols...) and the (small,
    * broadcastable) query side as (q_id, q_vec, q_nrm, joinCols...). */
  private def verifyTopK(it: DataFrame, q: DataFrame,
                         joinCols: Seq[String], k: Int): DataFrame = {
    val scored = it.join(broadcast(q), joinCols)
      .filter(col("q_id") =!= col("item_id"))
      .select(col("q_id"), col("item_id"),
        cosinePre(col("q_vec"), col("item_vec"), col("q_nrm"), col("item_nrm")).as("cos"))
      .distinct() // a pair may collide in several tables / probed cells
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Max embedding length of a frame (0 when the frame is empty or every
    * vector is null — downstream literal weight arrays come out empty
    * instead of the probe throwing). One tiny driver action. */
  private def maxDim(df: DataFrame, vecCol: String): Int = {
    val r = df.agg(max(size(col(vecCol)))).head
    if (r.isNullAt(0)) 0 else r.getInt(0)
  }

  /** Brute-force cosine top-k: every (query, item) pair via broadcast of the
    * (small) query side, windowed rank per query. */
  def bruteForceTopK(items: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    ArrayDotProduct.ensure(items.sparkSession)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      nrm(col(vecCol)).as("q_nrm"))
    val it = widen(items).select(col(idCol).as("item_id"), col(vecCol).as("item_vec"),
      nrm(col(vecCol)).as("item_nrm"))
    val scored = it.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("item_id"))
      .select(col("q_id"), col("item_id"),
        cosinePre(col("q_vec"), col("item_vec"), col("q_nrm"), col("item_nrm")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-uniform[-1,1] hyperplane weight for
    * (table, bit, dim) — hash-derived, no external randomness. */
  private def rhpWeight(table: Column, bit: Column, dim: Column): Column =
    (pmod(xxhash64(concat(table.cast("string"), lit(":"), bit.cast("string"),
      lit(":"), dim.cast("string"))), lit(1000L)).cast("double") / 500.0d) - 1.0d

  /** Banded multi-table signatures via explode + groupBy (the simhash
    * bit-vote trick, Dedup.scala): dimensions stream ONCE through
    * bits×tables partial-aggregating sums instead of bits×tables re-scans
    * of the embedding array per row (the inlined column-expression form
    * cost q_ann_lsh 5.5 s vs 1.9 s in BENCH_r02). Serves
    * [[Dedup.embeddingNearDupLsh]], where rows with empty/null embeddings
    * must KEEP their id (sig 0 in every table) for candidate/diagnostic
    * completeness — the portable twin below deliberately drops them
    * instead. Returns (id, tbl, sig). */
  def rhpSigTable(docs: DataFrame, idCol: String, vecCol: String,
                  bits: Int, tables: Int): DataFrame = {
    // posexplode_outer keeps rows with empty/null embeddings: their sums
    // come out null -> every sign bit 0 -> signature 0 in every table,
    // matching the column-expression form (a plain posexplode would drop
    // the id from the signature table and silently exclude it from
    // candidates and bucket diagnostics)
    val dims = widen(docs).select(col(idCol).as("id"), posexplode_outer(col(vecCol)))
      .select(col("id"), col("pos").as("d"), col("col").cast("double").as("x"))
    val sums = for (t <- 0 until tables; b <- 0 until bits)
      yield sum(col("x") * rhpWeight(lit(t), lit(b), col("d"))).as(s"p_${t}_$b")
    dims.groupBy(col("id")).agg(sums.head, sums.tail: _*)
      .select(col("id"), posexplode(array((0 until tables).map { t =>
        (0 until bits).map(b =>
          when(col(s"p_${t}_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce[Column](_ bitwiseOR _)
      }: _*)))
      .select(col("id"), col("pos").as("tbl"), col("col").as("sig"))
  }

  /** Plan-time md5-derived integer hyperplane weight for (table, bit, dim):
    * first 60 bits of md5("t:b:d") mod 1001, shifted to [-500, 500]. Computed
    * on the driver (tables×bits×dim values — catalog-scale) and inlined as
    * literals, so the executors do ZERO hashing; a SQL engine recomputes the
    * identical numbers from its own md5 (`('0x'||substr(md5(k),1,15))::BIGINT
    * % 1001 - 500`), which is what makes the portable signature
    * DuckDB-oracle-able end to end. */
  private[ops] def mdWeight(t: Int, b: Int, d: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$t:$b:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1001L - 500L
  }

  /** Portable twin of [[rhpSigTable]]: components quantized to integers
    * (`floor(x * 2^20)` — exact in doubles, identical in any engine) and
    * integer hyperplane weights, so every projection is an EXACT int64 sum —
    * associative, partition-order-independent (the float fast path's
    * documented near-zero sign-bit wobble cannot happen here) and
    * bit-identical in DuckDB. Through r8 mid-round this was posexplode +
    * tables×bits literal-weight sum aggregates (dim-bounded typedLit
    * arrays); now the whole quantize + project + sign loop is ONE codegen'd
    * expression per row ([[RhpSigs]]) — a pure projection, no per-component
    * explode, no exchange into the 48-sum aggregate, no plan-time literal
    * arrays and no per-frame maxDim probe job (guide §2.4, §4). Values are
    * bit-identical (OpsSpec pins the projection to the aggregate form).
    * Empty/null embeddings are EXCLUDED like before: the twin's SQL oracle
    * unnest drops them identically. */
  def rhpSigTablePortable(docs: DataFrame, idCol: String, vecCol: String,
                          bits: Int, tables: Int): DataFrame = {
    RhpSigs.ensure(docs.sparkSession)
    // empty/null-vec guard on the CHEAP source column (size), not on the
    // computed sigs — a sigs.isNotNull filter gets pushed below widen()'s
    // exchange with the expression substituted in, running the projection
    // loop twice per row (guide §4.4); with the guard, sigs is never null.
    // posexplode_OUTER: the non-outer form makes InferFiltersFromGenerate
    // add size(sigs) > 0 AND isnotnull(sigs) — the same substituted
    // double-evaluation through the back door (caught in the r8 sig-plan
    // audit); with the guard the outer form emits identical rows.
    widen(docs).filter(size(col(vecCol)) > 0)
      .select(col(idCol).as("id"),
        call_function("graft_rhp_sigs", col(vecCol), lit(bits), lit(tables)).as("sigs"))
      .select(col("id"), posexplode_outer(col("sigs")))
      .select(col("id"), col("pos").as("tbl"), col("col").as("sig"))
  }

  /** Banded multi-table LSH ANN over the portable integer signatures:
    * `tables` independent `bits`-bit signature tables; a (query, item) pair
    * is a candidate when ANY table collides (recall ≈ 1-(1-p^bits)^tables,
    * tunable to data scale: more bits → smaller buckets, more tables →
    * recovered recall). A single-table exact-equality variant had a fixed
    * 2^bits bucket space — at 10^9 items every bucket blows up and recall
    * is frozen (VERDICT r1). Candidates dedupe on (query, item) before the
    * cosine verify. Every stage (signature, candidate set, cosine, rank) is
    * recomputable bit-identically in DuckDB, so the query is
    * rows+schema+hash oracle-able despite being an approximate scale path
    * (the oracle recomputes the SAME approximation, the r5 portable-MinHash
    * pattern); an xxhash64 runtime-hashing twin was retired in r7 — the
    * plan-time literal weights measured FASTER (VERDICT r6 #7), and the
    * literal arrays were in turn replaced by the [[RhpSigs]] codegen
    * projection late in r8 (bit-identical; no maxDim probe jobs, no sig
    * join — each side computes its signatures inline in its own select).
    * Empty/null embeddings are excluded (null sigs filtered — see
    * [[rhpSigTablePortable]]). */
  def lshTopKPortable(items: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, k: Int, bits: Int = 12, tables: Int = 4): DataFrame = {
    ArrayDotProduct.ensure(items.sparkSession)
    RhpSigs.ensure(items.sparkSession)
    def side(df: DataFrame, pfx: String): DataFrame =
      // empty-vec guard on size() + posexplode_outer, not sigs.isNotNull —
      // see rhpSigTablePortable (guide §4.4 duplication, both doors)
      widen(df).filter(size(col(vecCol)) > 0)
        .select(col(idCol).as(s"${pfx}_id"), col(vecCol).as(s"${pfx}_vec"),
          nrm(col(vecCol)).as(s"${pfx}_nrm"),
          call_function("graft_rhp_sigs", col(vecCol), lit(bits), lit(tables)).as("sigs"))
        .select(col(s"${pfx}_id"), col(s"${pfx}_vec"), col(s"${pfx}_nrm"),
          posexplode_outer(col("sigs")))
        .select(col(s"${pfx}_id"), col(s"${pfx}_vec"), col(s"${pfx}_nrm"),
          col("pos").as("tbl"), col("col").as("sig"))
    verifyTopK(side(items, "item"), side(queries, "q"), Seq("tbl", "sig"), k)
  }

  // ------------------------------------------------------------------ IVF
  /** Deterministic portable IVF coarse quantizer: the nlist hash-order
    * sample with md5 as the order key and NO Lloyd refinement — float mean
    * aggregation is not cross-engine-reproducible (partial-aggregation
    * order), while the sample itself is (`ORDER BY md5(CAST(id AS VARCHAR))
    * LIMIT nlist` reads identically in any engine; md5 renders lowercase
    * hex everywhere, so the string order agrees). A Lloyd-refined xxhash64
    * twin was retired in r7: on the bench corpus the refinement bought no
    * recall the multi-assignment path didn't already have, cost a full
    * assign+mean pass, and could not be hash-oracled (VERDICT r6 #7).
    * Returns (cell, c_vec). */
  def ivfCentroidsPortable(items: DataFrame, idCol: String, vecCol: String,
                           nlist: Int): DataFrame = {
    // hash-order seed sample: nlist rows ordered by md5(id), numbered into
    // cells — no external randomness, identical in any engine
    val w = Window.orderBy(col("__h"))
    items.filter(size(col(vecCol)) > 0)
      .select(col(idCol).as("__cid"), col(vecCol).as("c_vec"))
      .withColumn("__h", md5(col("__cid").cast("string")))
      .orderBy(col("__h")).limit(nlist)
      .withColumn("cell", row_number().over(w)).select(col("cell"), col("c_vec"))
  }

  /** Centroids to the driver (nlist rows — catalog-scale). Collecting once
    * and passing the array to every assignment site keeps the quantizer
    * pipeline from re-running per downstream action. */
  private def collectCents(cents: DataFrame): Array[(Int, Array[Float])] =
    cents.select(col("cell").cast("int"), col("c_vec")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))

  /** Assign every row its `nprobe` nearest cells (by cosine), with ZERO
    * shuffle: the centroid table is bounded (nlist), so it arrives as a
    * driver-collected array riding in the [[IvfCells]] expression — each
    * row derives its top cells in one codegen loop (no crossJoin row
    * explosion, no window or aggregation shuffle). Through r8 mid-round
    * the centroids were inlined as an nlist-struct LITERAL array whose
    * transform + array_sort + slice chain the analyzer re-planned per
    * assignment side — q_ann_ivf's dominant cost was that planning, not
    * execution (guide §1.2, §7.3). Ties break toward the smallest cell id
    * and `roundCos` ranks cells by round(cos, 6), both exactly as before
    * (OpsSpec pins the expression to the literal-array form). Output:
    * (idCol, __vec, cell) — one row per (vector, probed cell). */
  private def assignCellsLocal(df: DataFrame, local: Array[(Int, Array[Float])],
                               idCol: String, vecCol: String, nprobe: Int,
                               roundCos: Boolean = false): DataFrame = {
    IvfCells.ensure(df.sparkSession)
    val cnrms = local.map { case (_, vec) =>
      math.max(math.sqrt(vec.map(x => x.toDouble * x.toDouble).sum), 1e-12) }
    widen(df).select(col(idCol), col(vecCol).as("__vec"),
        explode(call_function("graft_ivf_cells", col(vecCol),
          typedLit(local.map(_._1)), typedLit(local.map(_._2)), typedLit(cnrms),
          lit(nprobe), lit(roundCos))).as("cell"))
      .select(col(idCol), col("__vec"), col("cell"))
  }

  /** IVF ANN top-k — the second scale path next to [[lshTopKPortable]]:
    * items land in their `itemProbe` nearest cells (multi-assignment — the
    * standard remedy when the corpus clusters weakly: on this bench's
    * near-uniform random embeddings, single-assignment recall vs brute
    * force is ~0.6 at any sane nprobe, multi-assignment at the defaults
    * measures 0.95; on genuinely clustered corpora itemProbe can drop back
    * to 1), queries probe their `nprobe` nearest cells, and the exact
    * cosine verify runs only inside probed cells (candidates per query ≈
    * itemProbe × nprobe × N/nlist instead of N). Unlike RHP LSH, recall
    * does not collapse at lower similarity thresholds — the cell geometry,
    * not a collision probability, bounds the candidates; neighbors just
    * across a cell boundary are recovered by raising nprobe or itemProbe.
    * Runs the portable quantizer: md5-ordered centroid sample (no Lloyd
    * step), cell ranking on round(cos, 6) — every stage (centroids,
    * item/query cell assignment, candidate set, verify, rank) recomputes
    * bit-identically in DuckDB, making this approximate scale path
    * rows+schema+hash oracle-able. Driver-side centroid norms use the
    * same in-index-order double fold as the SQL `list_sum`, so they agree to
    * the last bit. Empty/null embeddings are excluded on both sides
    * (centroid sample, items, queries) — the SQL twin filters them the
    * same way, and a zero-length vector has no meaningful cell anyway. */
  def ivfTopKPortable(items: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, k: Int, nlist: Int = 64, nprobe: Int = 16,
                      itemProbe: Int = 4): DataFrame = {
    ArrayDotProduct.ensure(items.sparkSession)
    val cents = collectCents(ivfCentroidsPortable(items, idCol, vecCol, nlist))
    val it = assignCellsLocal(items.filter(size(col(vecCol)) > 0), cents,
        idCol, vecCol, nprobe = itemProbe, roundCos = true)
      .select(col(idCol).as("item_id"), col("__vec").as("item_vec"),
        nrm(col("__vec")).as("item_nrm"), col("cell"))
    val q = assignCellsLocal(queries.filter(size(col(vecCol)) > 0), cents,
        idCol, vecCol, nprobe, roundCos = true)
      .select(col(idCol).as("q_id"), col("__vec").as("q_vec"),
        nrm(col("__vec")).as("q_nrm"), col("cell"))
    verifyTopK(it, q, Seq("cell"), k)
  }

  /** Bucket-occupancy diagnostics under the portable banded signature
    * scheme — the path [[lshTopKPortable]] (and q_ann_lsh) actually runs:
    * (tbl, sig, n) — assert max(n) stays bounded. */
  def lshBucketSizesPortable(items: DataFrame, idCol: String, vecCol: String,
                             bits: Int = 12, tables: Int = 4): DataFrame =
    rhpSigTablePortable(items, idCol, vecCol, bits, tables)
      .groupBy(col("tbl"), col("sig"))
      .agg(count(lit(1)).as("n"))

  /** Cell-occupancy diagnostics under the portable quantizer — the cells
    * [[ivfTopKPortable]] (and q_ann_ivf) actually probes: (cell, n) for the
    * single-nearest-cell assignment. A query at nprobe scores at most
    * nprobe × max(n) candidates, so max(n) is the real bound to assert
    * (the top-k OUTPUT is rank-capped and proves nothing). */
  def ivfCellSizesPortable(items: DataFrame, idCol: String, vecCol: String,
                           nlist: Int = 64): DataFrame = {
    val cents = collectCents(ivfCentroidsPortable(items, idCol, vecCol, nlist))
    // same empty/null exclusion as ivfTopKPortable — occupancy evidence must
    // count exactly the cells the query path probes (empty vectors would all
    // collapse into one spurious max cell)
    assignCellsLocal(items.filter(size(col(vecCol)) > 0), cents,
        idCol, vecCol, nprobe = 1, roundCos = true)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
  }
}
