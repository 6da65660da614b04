package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector symmetric int8 quantization of embedding columns — the
  * storage/bandwidth lever of a vector corpus at scale: 64-dim float32
  * embeddings shrink 4× (256 B → 64 B + one scale), which at 100 TB is the
  * difference between a re-shippable artifact and a second corpus. All
  * operators are narrow per-row column expressions (no shuffle, no UDFs);
  * the quantized relation is what the ANN/near-dup pipelines would read,
  * with [[dequantize]] reconstructing floats at query time.
  *
  * Engine-portable by construction: rounding is `floor(x/scale + 0.5)` —
  * half-up toward +∞ — because `floor` is defined identically in every
  * engine while ROUND's half-way rule is not; all arithmetic is double
  * IEEE-754, so a DuckDB oracle reproduces every quantized value
  * bit-for-bit.
  *
  * Error contract: |x − dequantize(quantize(x))| ≤ scale/2 per dimension
  * (clamping never engages: |x|/scale ≤ 127 by the scale's definition).
  */
object Quantization {

  /** Symmetric per-vector scale: max|xᵢ|/127 (max is order-independent).
    * 0 for the all-zero vector — callers branch on it ([[quantizeInt8]]).
    */
  def int8Scale(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0

  /** Int8 code array: floor(x/scale + 0.5) clamped to [−127, 127]
    * (symmetric — −128 is unused so negation stays in range). All-zero
    * vectors (scale 0) quantize to all zeros rather than dividing by 0.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec, x =>
        greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") / scale + 0.5))).cast("int")))

  /** Reconstructed double vector: qᵢ · scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale)

  /** Per-vector max absolute reconstruction error (≤ scale/2). Computed
    * against the original in one pass; zip is self-aligned (the code
    * array has the vector's own length) so no NULL-padding guard needed.
    */
  def maxAbsError(vec: Column, q: Column, scale: Column): Column =
    aggregate(
      zip_with(vec, q, (x, v) => abs(x.cast("double") - v.cast("double") * scale)),
      lit(0.0), (acc, e) => greatest(acc, e))

  private val Dec = "decimal(30,16)"

  /** Per-vector mean squared reconstruction error. DECIMAL(30,16)
    * accumulation (the [[Similarity]] exact-variant convention) so the
    * sum is order-independent and bit-equal across engines — a double
    * left-fold would depend on each engine's list-sum implementation.
    */
  def mse(vec: Column, q: Column, scale: Column): Column = {
    val sq = zip_with(vec, q, (x, v) => {
      val e = x.cast("double") - v.cast("double") * scale
      (e * e).cast(Dec)
    })
    aggregate(sq, lit(0).cast(Dec), (acc, e) => (acc + e).cast(Dec))
      .cast("double") / size(vec)
  }

  /** Product-quantization (PQ) code assignment — the IVF-PQ backbone:
    * each vector splits into `m` contiguous sub-vectors; each sub-vector
    * is encoded as the index of its nearest codebook entry (squared-L2,
    * ties to the lower code). A vector becomes `m` small integers —
    * with m=8 / 16 codes that is 8 nibbles ≈ 4 B against 256 B of floats,
    * the compression regime billion-vector ANN indexes live in.
    *
    * Codebook: the `nCodes` lowest-`vec_id` vectors (the deterministic
    * seeding contract shared with [[Similarity.kmeansCentroids]] — a
    * trained codebook drops in by replacing the seed relation), folded to
    * a SINGLE array row and broadcast ([[Similarity.assignToSeeds]]'s
    * physical shape): the per-vector work is a narrow argmin over the
    * broadcast array — no shuffle, constant plan size in `nCodes` and `m`.
    *
    * Determinism contract: d² = xx − 2·xc + cc with each dot the
    * order-independent exact-decimal fold ([[Similarity.dotExact]]) cast
    * to double, combined in one fixed IEEE chain and rounded to 6 — the
    * same double in every engine, so argmin and the decimal-summed `mse`
    * reproduce bit-for-bit. The inner lambda recomputes xx per code
    * (Catalyst does not CSE across lambda bodies) — m·nCodes·3 short
    * decimal dots per row, constant in corpus size.
    *
    * Output: `vec_id`, `codes` (comma-joined, subspace order), `mse`
    * (mean over all `dim` dimensions of the squared residual, round 6).
    */
  /** The codebook as ONE broadcastable array row, PRE-SLICED per subspace
    * with each entry's self-dot precomputed: `cb2[s][k] = struct(cv, cc)`
    * where `cv` is code k's subspace-s slice and `cc = dot(cv, cv)` —
    * both constants of the codebook, computed once on the 1-row relation
    * instead of per corpus row × code (the d² identity
    * xx − 2·xc + cc needs only ONE dot per (row, sub, code) this way;
    * measured ~3× on the sf0.1 gate). Code k = sorted vec_id position k
    * over the `nCodes` lowest-id vectors. */
  private def codebookRow(vecs: DataFrame, nCodes: Int, m: Int,
                          sub: Int): DataFrame =
    vecs.orderBy("vec_id").limit(nCodes)
      .agg(array_sort(collect_list(struct(col("vec_id"), col("embedding"))))
        .as("cs"))
      .select(transform(sequence(lit(0), lit(m - 1)), s =>
        transform(col("cs"), c => {
          val cv = slice(c.getField("embedding"), s * sub + 1, lit(sub))
          struct(cv.as("cv"), Similarity.dotExact(cv, cv).as("cc"))
        })).as("cb2"))

  /** The exact-decimal rounded d² against codebook entry
    * `e = struct(cv, cc)` given the row's generator-output sub-vector
    * struct `x = struct(xv, xx)` — the ONE distance definition
    * [[pqCodes]] and [[pqAdcTopK]] share: round(xx − 2·xc + cc, 6). */
  private def subD2(x: Column, e: Column): Column =
    round(x.getField("xx")
      - lit(2) * Similarity.dotExact(x.getField("xv"), e.getField("cv"))
      + e.getField("cc"), 6)

  /** One row per (vector, subspace) with the slice and its self-dot as
    * GENERATOR outputs (`sub`, `x = struct(xv, xx)`): posexplode output
    * attributes are hard columns Catalyst cannot inline back into
    * downstream lambdas — a plain projection alias here gets collapsed
    * into the per-code argmin lambda and recomputes the whole slice array
    * per codebook entry (measured 2× SLOWER than no hoisting at all). */
  private def subVecRows(vecs: DataFrame, cbSource: DataFrame, nCodes: Int,
                         m: Int, sub: Int): DataFrame =
    vecs.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(codebookRow(cbSource, nCodes, m, sub)))
      .select(col("vec_id"), col("cb2"),
        posexplode(transform(sequence(lit(0), lit(m - 1)), s => {
          val xv = slice(col("embedding"), s * sub + 1, lit(sub))
          struct(xv.as("xv"), Similarity.dotExact(xv, xv).as("xx"))
        })).as(Seq("sub", "x")))

  /** Per-(vector, subspace) PQ assignment rows:
    * (`vec_id`, `sub`, `code`, `d2`), argmin by (d², code). */
  private def pqSubBest(vecs: DataFrame, nCodes: Int, m: Int,
                        dim: Int): DataFrame = {
    require(nCodes >= 1, s"nCodes: $nCodes")
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val best = array_min(transform(element_at(col("cb2"), col("sub") + 1),
      (e, k) => struct(subD2(col("x"), e).as("d2"),
        k.cast("int").as("code"))))
    subVecRows(vecs, vecs, nCodes, m, sub)
      .select(col("vec_id"), col("sub"), best.as("b"))
      .select(col("vec_id"), col("sub"),
        col("b").getField("code").as("code"),
        col("b").getField("d2").as("d2"))
  }

  def pqCodes(vecs: DataFrame, nCodes: Int, m: Int, dim: Int): DataFrame =
    // the regroup is one hash exchange on vec_id of n·m short rows — the
    // price of the Generate form above; array_sort pins collect order
    pqSubBest(vecs, nCodes, m, dim)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code"),
        col("d2")))).as("bs"))
      .select(col("vec_id"),
        array_join(transform(col("bs"),
          b => b.getField("code").cast("string")), ",").as("codes"),
        round(aggregate(col("bs"), lit(0).cast("decimal(28,6)"),
          (acc, b) => (acc + b.getField("d2").cast("decimal(28,6)"))
            .cast("decimal(28,6)")).cast("double") / dim, 6).as("mse"))

  /** PQ top-k search by ASYMMETRIC DISTANCE COMPUTATION (ADC) — how a
    * PQ-compressed index is actually queried: per probe, one lookup table
    * of m·nCodes exact sub-distances against the codebook; each corpus
    * vector's approximate d² is then the SUM OF m TABLE LOOKUPS on its
    * stored codes — the corpus embeddings are never touched at query
    * time, only the codes relation (the 64×-smaller artifact).
    *
    * Plan: the LUT relation (probes × m × nCodes rows — tiny for bounded
    * probe sets, broadcast by size) EQUI-joins the exploded codes relation
    * on (subspace, code); one (probe, cand) sum-aggregate; one per-probe
    * top-k window. Keyed end to end — the "scan all codes" of the ADC
    * paper is this hash join, and at 100 TB it composes with IVF cell
    * routing (filter the codes relation to the probe's cells first).
    *
    * Output carries `exact_d2` alongside `approx_d2` for the ranked rows
    * (two keyed id joins back to the embeddings) — the per-pair
    * quantization-error audit, and the gate's proof the approximation is
    * read against ground truth. Determinism: LUT entries are the shared
    * [[subD2]] doubles; the per-pair sum accumulates their DECIMAL(28,6)
    * images (exact, order-free); ties break on cand_id.
    */
  def pqAdcTopK(probes: DataFrame, corpus: DataFrame, nCodes: Int, m: Int,
                dim: Int, k: Int): DataFrame = {
    require(k >= 1, s"k: $k")
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    // the codes relation is the expensive leg (per-row argmin over the
    // codebook) and the join fans it out per probe — persist so it
    // computes once (measured 37 s -> 24 s at a 10x probe; caller-managed
    // lifetime, the verifiedNearDupsFromHashes contract: Verify/Bench
    // clear the cache per query)
    val codes = pqSubBest(corpus, nCodes, m, dim)
      .select(col("vec_id").as("cand_id"), col("sub"), col("code"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lut = subVecRows(probes, corpus, nCodes, m, sub)
      .select(col("vec_id").as("probe_id"), col("sub"),
        posexplode(transform(element_at(col("cb2"), col("sub") + 1),
          e => subD2(col("x"), e))).as(Seq("code", "d2")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("approx_d2").asc, col("cand_id").asc)
    val ranked = codes.join(lut, Seq("sub", "code"))
      .where(col("probe_id") =!= col("cand_id"))
      .groupBy(col("probe_id"), col("cand_id"))
      .agg(sum(col("d2").cast("decimal(28,6)")).cast("double").as("approx_d2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    def d2Exact(a: Column, b: Column): Column =
      round(Similarity.dotExact(a, a) - lit(2) * Similarity.dotExact(a, b)
        + Similarity.dotExact(b, b), 6)
    ranked
      .join(probes.select(col("vec_id").as("probe_id"),
        col("embedding").as("pv")), Seq("probe_id"))
      .join(corpus.select(col("vec_id").as("cand_id"),
        col("embedding").as("cv")), Seq("cand_id"))
      .select(col("probe_id"), col("cand_id"), col("approx_d2"),
        d2Exact(col("pv"), col("cv")).as("exact_d2"), col("rank"))
  }

  /** IVF-PQ top-k — the full modern billion-vector ANN stack composed
    * from this module's PQ codes and [[Similarity]]'s Voronoi cells:
    * corpus vectors live in the cell of their nearest seed
    * ([[Similarity.assignToSeeds]] — deterministic lowest-id seeding, the
    * oracle-mirrored contract; a trained coarse quantizer drops in by
    * replacing the seed relation); a probe visits only its `nProbeCells`
    * best cells and runs the [[pqAdcTopK]] lookup-table scan over THOSE
    * cells' codes. Candidate volume contracts by ~nProbeCells/nSeeds, and
    * every join is keyed: probe→cell routing is a narrow argsort over the
    * broadcast seed array, candidates come from the (cell) hash join,
    * distances from the (probe, sub, code) LUT join. This is exactly the
    * plan a 100 TB vector store runs — cells partition the codes
    * relation, the LUT is per-query tiny, and the raw embeddings are
    * touched only for the final audit column.
    *
    * Output: `probe_id, cand_id, cell, approx_d2, exact_d2, rank` —
    * `exact_d2` is the ground-truth audit as in [[pqAdcTopK]].
    */
  def ivfPqTopK(probes: DataFrame, corpus: DataFrame, nSeeds: Int,
                nProbeCells: Int, nCodes: Int, m: Int, dim: Int,
                k: Int): DataFrame = {
    require(nProbeCells >= 1 && nProbeCells <= nSeeds,
      s"nProbeCells: $nProbeCells of $nSeeds")
    require(k >= 1, s"k: $k")
    val seeds = Similarity.seedsRelation(corpus, nSeeds)
    val assigned = Similarity.assignToSeeds(corpus, seeds)
      .select(col("vec_id").as("cand_id"), col("cell"))
    // persisted for the same reason as pqAdcTopK's codes relation (the
    // cell join + probe fan-out would re-derive the argmin leg)
    val codes = pqSubBest(corpus, nCodes, m, dim)
      .select(col("vec_id").as("cand_id"), col("sub"), col("code"))
      .join(assigned, Seq("cand_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // probe → nProbeCells best cells by the SAME rounded exact cosine the
    // assignment ranks with (ties to the lower cell — oracle contract);
    // nv rides in the projection so it is computed once per probe row
    val probeCells = probes
      .select(col("vec_id").as("probe_id"), col("embedding"),
        sqrt(Similarity.norm2Exact(col("embedding"))).as("nv"))
      .crossJoin(broadcast(Similarity.seedsArray(seeds)))
      .select(col("probe_id"), col("nv"),
        explode(slice(array_sort(transform(col("seeds"), s => struct(
          (round(Similarity.dotExact(col("embedding"), s.getField("sv"))
            / (col("nv") * s.getField("sn")), 6) * -1).as("neg_cos"),
          s.getField("cell").as("cell")))), 1, nProbeCells)).as("c"))
      .select(col("probe_id"), col("c").getField("cell").as("cell"))
    val sub = dim / m
    val lut = subVecRows(probes, corpus, nCodes, m, sub)
      .select(col("vec_id").as("probe_id"), col("sub"),
        posexplode(transform(element_at(col("cb2"), col("sub") + 1),
          e => subD2(col("x"), e))).as(Seq("code", "d2")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("approx_d2").asc, col("cand_id").asc)
    val ranked = codes.join(probeCells, Seq("cell"))
      .join(lut, Seq("probe_id", "sub", "code"))
      .where(col("probe_id") =!= col("cand_id"))
      .groupBy(col("probe_id"), col("cand_id"), col("cell"))
      .agg(sum(col("d2").cast("decimal(28,6)")).cast("double").as("approx_d2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    def d2Exact(a: Column, b: Column): Column =
      round(Similarity.dotExact(a, a) - lit(2) * Similarity.dotExact(a, b)
        + Similarity.dotExact(b, b), 6)
    ranked
      .join(probes.select(col("vec_id").as("probe_id"),
        col("embedding").as("pv")), Seq("probe_id"))
      .join(corpus.select(col("vec_id").as("cand_id"),
        col("embedding").as("cv")), Seq("cand_id"))
      .select(col("probe_id"), col("cand_id"), col("cell"), col("approx_d2"),
        d2Exact(col("pv"), col("cv")).as("exact_d2"), col("rank"))
  }
}
