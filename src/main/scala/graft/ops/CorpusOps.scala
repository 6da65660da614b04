package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** Corpus-assembly operators: deterministic sampling and sequence packing —
  * the steps between a curated document set and actual training batches.
  *
  * Both are engineered for the same reproducibility contract as
  * `q_split`'s hash split: NO randomness (`rand()` changes with partitioning
  * and retries), every decision a pure function of the row's identity, so
  * results are stable across runs, engines, cluster sizes, and incremental
  * re-runs over a grown corpus.
  */
object CorpusOps {

  /** T5-style SPAN CORRUPTION — the denoising-pretraining sample prep:
    * cut each doc's token stream into consecutive `spanLen`-token spans,
    * deterministically mask `maskPct`% of them (the h60 hash of
    * `salt:id:span` — same no-randomness contract as the split/sample
    * family, so the corruption is reproducible across runs, engines, and
    * retries), and emit the model's two sides: `input_text` with each
    * masked span replaced by its sentinel `<extra_id_k>` (k = the span's
    * rank among the doc's masked spans) and `target_text` = the sentinels
    * with their recovered spans. Pure per-row array algebra — narrow, no
    * shuffle, codegen-adjacent HOFs; the per-doc O(spans²) sentinel-rank
    * prefix sum is bounded by doc length, not corpus size.
    *
    * Output: id, `n_spans`, `n_masked`, `input_text`, `target_text`.
    */
  def spanCorrupt(df: DataFrame, idCol: String, toksCol: String,
                  spanLen: Int, maskPct: Int,
                  salt: String = "span:"): DataFrame = {
    require(spanLen >= 1, s"spanLen: $spanLen")
    require(maskPct >= 0 && maskPct <= 100, s"maskPct: $maskPct")
    val nToks = size(col(toksCol))
    val lastSpan = floor((nToks - 1).cast("double") / spanLen).cast("int")
    val spanIdx = sequence(lit(0), lastSpan)
    val flags = transform(spanIdx, i =>
      (pmod(Hashes.h60(concat(lit(salt), col(idCol), lit(":"), i)),
        lit(100L)) < maskPct).cast("int"))
    df.where(nToks > 0)
      .withColumn("__flags", flags)
      .select(col(idCol), col(toksCol).as("__toks"), col("__flags"),
        size(col("__flags")).as("n_spans"),
        aggregate(col("__flags"), lit(0L), (a, x) => a + x).as("n_masked"))
      .select(col(idCol), col("n_spans").cast("long").as("n_spans"),
        col("n_masked"),
        array_join(transform(sequence(lit(0), size(col("__flags")) - 1), i => {
          val sentinel = concat(lit("<extra_id_"),
            aggregate(slice(col("__flags"), lit(1), i), lit(0), (a, x) => a + x)
              .cast("string"), lit(">"))
          val span = array_join(
            slice(col("__toks"), i * spanLen + 1, lit(spanLen)), " ")
          when(element_at(col("__flags"), i + 1) === 1, sentinel)
            .otherwise(span)
        }), " ").as("input_text"),
        array_join(filter(transform(sequence(lit(0), size(col("__flags")) - 1),
          i => when(element_at(col("__flags"), i + 1) === 1,
            concat(lit("<extra_id_"),
              aggregate(slice(col("__flags"), lit(1), i), lit(0), (a, x) => a + x)
                .cast("string"), lit("> "),
              array_join(slice(col("__toks"), i * spanLen + 1, lit(spanLen)),
                " ")))), x => x.isNotNull), " ").as("target_text"))
  }

  /** FILL-IN-THE-MIDDLE (FIM) transform — the code-model data prep
    * (Bavarian et al. 2022, "Efficient Training of Language Models to
    * Fill in the Middle"): pick two deterministic cut points, reorder the
    * document as PSM — `<PRE> prefix <SUF> suffix <MID> middle` — so a
    * causal LM learns infilling from plain next-token prediction. Cuts
    * are h60 draws over (salt, id) mapped into token positions (the
    * family's no-randomness contract): a = 1 + h₁ mod (n−1) and
    * b = a + h₂ mod (n−a) keep all three segments non-degenerate-ordered
    * (prefix ≥ 1 token, middle ≥ 0, suffix ≥ 0). Narrow per-row array
    * algebra, no shuffle.
    *
    * Output: id, `cut_a`, `cut_b`, `fim_text`.
    */
  def fimTransform(df: DataFrame, idCol: String, toksCol: String,
                   salt: String = "fim:"): DataFrame = {
    val n = size(col(toksCol))
    val h1 = pmod(Hashes.h60(concat(lit(salt), lit("a:"),
      col(idCol).cast("string"))), greatest(n - 1, lit(1)).cast("long"))
    df.where(n >= 2)
      .withColumn("cut_a", (lit(1) + h1).cast("int"))
      .withColumn("cut_b",
        (col("cut_a") + pmod(Hashes.h60(concat(lit(salt), lit("b:"),
          col(idCol).cast("string"))),
          greatest(n - col("cut_a"), lit(1)).cast("long"))).cast("int"))
      .select(col(idCol), col("cut_a"), col("cut_b"),
        concat(lit("<PRE> "),
          array_join(slice(col(toksCol), lit(1), col("cut_a")), " "),
          lit(" <SUF> "),
          array_join(slice(col(toksCol), col("cut_b") + 1,
            greatest(n - col("cut_b"), lit(0))), " "),
          lit(" <MID> "),
          array_join(slice(col(toksCol), col("cut_a") + 1,
            col("cut_b") - col("cut_a")), " ")).as("fim_text"))
  }

  /** Sampling basis: h60 of `salt:id`, reduced mod 10000 — i.e. a
    * deterministic uniform draw in [0, 10000) basis points. Exposed so
    * callers/oracles can reproduce the draw. */
  def sampleBasis(idCol: Column, salt: String): Column =
    pmod(Hashes.h60(concat(lit(salt), lit(":"), idCol.cast("string"))),
      lit(10000L))

  /** Mixture-recipe assembly: the per-group A-ES draw of
    * [[weightedSamplePerGroup]] where each group's keep count comes from
    * a `(grpCol, quota)` relation instead of a fixed k — the step that
    * turns a mixture recipe ([[CorpusStats.mixtureWeights]]) into an
    * actual sampled training set. Same determinism contract as every
    * sampler here: the draw is a pure function of (salt, id), so grown
    * corpora and re-partitioning never reshuffle old decisions.
    *
    * `quotas` is group-count rows (small by Heaps-law-ish group
    * cardinality), broadcast into the rank filter; the draw itself is
    * one shuffle on the group key — no new shuffle structure over the
    * fixed-k form at any corpus size.
    *
    * Contract: `quotas` must carry EXACTLY ONE row per group — the join
    * is a plain inner join, so a duplicated group would silently
    * duplicate every sampled row of that group (ADVICE r10). Enforced in
    * the plan: a per-group count window over the (tiny) quota relation
    * guards the quota value with `raise_error`, so a duplicated group
    * fails the job loudly instead of corrupting the sample — no extra
    * driver action, and the window shuffles only the group-count rows.
    */
  def mixtureSample(df: DataFrame, idCol: String, grpCol: String,
                    weightCol: Column, quotas: DataFrame,
                    salt: String = "wsamp"): DataFrame = {
    val u = (pmod(Hashes.h60(concat(lit(salt), lit(":"),
        col(idCol).cast("string"))), lit(1000000L)) + 0.5) / 1000000.0
    val w = weightCol.cast("double")
    val wChecked = when(w > 0, w).otherwise(raise_error(concat(
      lit("mixtureSample: weight must be > 0, got "),
      coalesce(w.cast("string"), lit("NULL")),
      lit(" for id "), col(idCol).cast("string"))))
    val qCount = count(lit(1)).over(Window.partitionBy(col(grpCol)))
    val uniqueQuotas = quotas
      .withColumn("quota", when(qCount === 1, col("quota")).otherwise(
        raise_error(concat(
          lit("mixtureSample: quotas must have exactly one row per group; "),
          lit("group "), col(grpCol).cast("string"),
          lit(" has "), qCount.cast("string"), lit(" rows")))))
    val win = Window.partitionBy(col(grpCol)).orderBy(col("es_key"), col(idCol))
    df.withColumn("es_key", round(-log(u), 6) / wChecked)
      .withColumn("rk", row_number().over(win))
      .join(broadcast(uniqueQuotas), grpCol)
      .where(col("rk") <= col("quota"))
      .drop("rk")
  }

  /** DSIR-style importance resampling (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023 — public
    * method): score every document by how much more likely its hashed
    * n-gram features are under a TARGET domain's bag-of-features unigram
    * LM than under the raw corpus's, then draw `k` docs without
    * replacement with probability ∝ exp(score) — the classifier-free way
    * to tilt a crawl toward a target domain (the paper's hashed-n-gram
    * variant matched trained-classifier selection on GLUE).
    *
    * Math, all engine-portable: features hash into `buckets` bins
    * (b = fh mod B); with add-one smoothing over occurrence totals T
    * (target) and Q (all), each bin's log importance ratio is
    * lr(b) = ln((T_b+1)/(T+B)) − ln((Q_b+1)/(Q+B)), rounded to 6 (the
    * repo-wide ln-portability discipline); a doc's score is the
    * DECIMAL-exact sum of lr over its feature OCCURRENCES. The draw is
    * A-ES in log-log form: with weight w = exp(score), the standard
    * ascending key (−ln u)/w ranks identically to ln(−ln u) − score —
    * so the exp never happens and the whole draw stays inside the
    * proven-portable ln/round algebra. u is the [[sampleBasis]]-style
    * deterministic h60 draw — same reproducibility contract as every
    * sampler here.
    *
    * Scale posture: the bucket relation is ≤ B rows — broadcast into the
    * per-doc scoring join; the exploded feature stream is persisted once
    * (caller-managed lifetime, the repo's per-query contract) and feeds
    * the count aggregate and the scoring join; target membership is a
    * conditional sum inside the ONE bucket aggregate, not a join. Per
    * doc the plan is one shuffle on the doc key; the lr relation is the
    * reusable artifact at 100 TB (compute once per corpus snapshot,
    * broadcast everywhere).
    *
    * Docs with zero features have no rows in the feature stream and are
    * absent from the result (unscorable). Returns
    * (`idCol`, carryCols…, `log_ratio`, `es_key`) — the k smallest keys.
    */
  /** The per-doc DSIR log importance ratios — [[importanceResample]]'s
    * scoring half, exposed so audits ([[importanceEss]]) read the SAME
    * relation the draw uses. Returns `(idCol, carryCols…, log_ratio)`. */
  def dsirLogRatios(df: DataFrame, idCol: String, featsCol: Column,
                    isTarget: Column, buckets: Int,
                    carryCols: Seq[String] = Nil): DataFrame = {
    require(buckets >= 2, s"buckets: $buckets")
    val carried = carryCols.map(col)
    val f = df
      .select(col(idCol) +: isTarget.as("is_t") +:
        explode(featsCol).as("fh") +: carried: _*)
      .withColumn("b", pmod(col("fh"), lit(buckets.toLong)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qc = f.groupBy(col("b")).agg(
      count(lit(1)).as("qb"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("tb"))
    val tot = qc.agg(sum(col("qb")).as("qt"), sum(col("tb")).as("tt"))
    val lr = qc.crossJoin(broadcast(tot)) // 1-row global totals
      .select(col("b"), round(
        log((col("tb") + 1).cast("double") / (col("tt") + buckets).cast("double"))
          - log((col("qb") + 1).cast("double") / (col("qt") + buckets).cast("double")),
        6).as("lr"))
    f.join(broadcast(lr), Seq("b"))
      .groupBy(col(idCol) +: carried: _*)
      .agg(round(sum(col("lr").cast("decimal(28,6)")).cast("double"), 6)
        .as("log_ratio"))
  }

  def importanceResample(df: DataFrame, idCol: String, featsCol: Column,
                         isTarget: Column, buckets: Int, k: Int,
                         carryCols: Seq[String] = Nil,
                         salt: String = "dsir"): DataFrame = {
    require(k >= 1, s"k: $k")
    val perDoc = dsirLogRatios(df, idCol, featsCol, isTarget, buckets,
      carryCols)
    val u = (pmod(Hashes.h60(concat(lit(salt), lit(":"),
        col(idCol).cast("string"))), lit(1000000L)) + 0.5) / 1000000.0
    perDoc
      .withColumn("es_key", round(log(-log(u)), 6) - col("log_ratio"))
      .orderBy(col("es_key"), col(idCol))
      .limit(k)
  }

  /** DSIR weight-health audit: the EFFECTIVE SAMPLE SIZE of the implied
    * importance weights w ∝ exp(log_ratio) — ESS = (Σw)²/Σw² (Kong 1992;
    * the standard importance-sampling diagnostic). `ess_fraction` = ESS/n:
    * near 1 means the weights are flat (resampling changes nothing);
    * near 0 means a handful of documents carry all the mass and the
    * resampled set's variance blows up — the number to check BEFORE
    * trusting a DSIR-selected corpus. Weights are max-normalized
    * (w = exp(lr − lr_max) ∈ (0,1], ESS is scale-invariant) so the exp
    * can never overflow and the decimal sums never leave range; the
    * per-row exp is one IEEE double op (engine-portable), the two sums
    * are DECIMAL, the final combine is fixed.
    *
    * Cost: the [[dsirLogRatios]] aggregate plus one max and one sum pass
    * over the doc-count relation — nothing beyond the scoring pass a DSIR
    * run already pays.
    */
  def importanceEss(df: DataFrame, idCol: String, featsCol: Column,
                    isTarget: Column, buckets: Int): DataFrame = {
    val dl = dsirLogRatios(df, idCol, featsCol, isTarget, buckets)
    val mx = dl.agg(max(col("log_ratio")).as("mx"))
    val w = dl.crossJoin(broadcast(mx))
      .select(exp(col("log_ratio") - col("mx")).as("w"))
    w.agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("w").cast("decimal(38,18)")).cast("double").as("sw"),
        sum((col("w") * col("w")).cast("decimal(38,18)")).cast("double")
          .as("sww"))
      .select(col("n_docs"),
        round(col("sw") * col("sw") / col("sww"), 6).as("ess"),
        round(col("sw") * col("sw") / col("sww")
          / col("n_docs").cast("double"), 6).as("ess_fraction"))
  }

  /** Keep each row with probability `rateBp`/10000 — deterministically:
    * the same (salt, id) always draws the same value, new rows never
    * reshuffle old decisions, and re-partitioning cannot change the
    * sample. Rates are integer BASIS POINTS on purpose: a double rate
    * would make the keep predicate a float compare that engines could
    * round differently at the boundary.
    */
  def hashSample(df: DataFrame, idCol: String, rateBp: Int,
                 salt: String = "samp"): DataFrame = {
    require(rateBp >= 0 && rateBp <= 10000, s"rateBp: $rateBp")
    df.where(sampleBasis(col(idCol), salt) < rateBp)
  }

  /** Weighted sample of k rows WITHOUT replacement — deterministic
    * Efraimidis–Spirakis (A-ES, "Weighted random sampling with a
    * reservoir", 2006): each row draws key uᵂ with u uniform; the k
    * largest keys are the sample. Expressed in the equivalent log form
    * (−ln u)/w ascending, which avoids pow() (libm pow is not
    * engine-portable; ln rounded to 6 is — the q_unigram_lm result).
    * u comes from the [[sampleBasis]]-style h60 draw mapped to
    * (0, 1) via (h % 1e6 + 0.5)/1e6 — never exactly 0 or 1, so ln is
    * finite — making the "random" sample reproducible across engines,
    * runs, and partitionings.
    *
    * Scale: one narrow projection + TakeOrderedAndProject(k) — no
    * shuffle beyond the top-k tree. Weights must be > 0 — ENFORCED per
    * row (ADVICE r07: a zero weight would draw key +∞ and be silently
    * excluded, a negative one would sort FIRST and silently corrupt the
    * sample; both now raise instead).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Int, salt: String = "wsamp"): DataFrame = {
    require(k >= 1, s"k: $k")
    val u = (pmod(Hashes.h60(concat(lit(salt), lit(":"),
        col(idCol).cast("string"))), lit(1000000L)) + 0.5) / 1000000.0
    val w = weightCol.cast("double")
    val wChecked = when(w > 0, w).otherwise(raise_error(concat(
      lit("weightedSample: weight must be > 0, got "),
      coalesce(w.cast("string"), lit("NULL")),
      lit(" for id "), col(idCol).cast("string"))))
    df.withColumn("es_key", round(-log(u), 6) / wChecked)
      .orderBy(col("es_key"), col(idCol))
      .limit(k)
  }

  /** Per-GROUP weighted sample of k rows without replacement — the
    * stratified form of [[weightedSample]] (a per-language eval draw, a
    * per-source audit sample): the k smallest A-ES log-form keys WITHIN
    * each group win. Same deterministic h60 draw and per-row positive-
    * weight guard; the cut is one group-partitioned window (rank ≤ k) —
    * hash-partitioned on the group, no global sort, no driver state.
    */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, grpCol: String,
                             weightCol: Column, k: Int,
                             salt: String = "wsamp"): DataFrame = {
    require(k >= 1, s"k: $k")
    val u = (pmod(Hashes.h60(concat(lit(salt), lit(":"),
        col(idCol).cast("string"))), lit(1000000L)) + 0.5) / 1000000.0
    val w = weightCol.cast("double")
    val wChecked = when(w > 0, w).otherwise(raise_error(concat(
      lit("weightedSamplePerGroup: weight must be > 0, got "),
      coalesce(w.cast("string"), lit("NULL")),
      lit(" for id "), col(idCol).cast("string"))))
    val win = Window.partitionBy(col(grpCol)).orderBy(col("es_key"), col(idCol))
    df.withColumn("es_key", round(-log(u), 6) / wChecked)
      .withColumn("rk", row_number().over(win))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Near-dup-leakage-free train/val/test split: every document in the
    * same near-dup component receives the SAME split, decided by the hash
    * of the component's min-id ANCHOR rather than of the document — the
    * guard against the classic contamination hazard where a doc lands in
    * train while its near-duplicate lands in test (the dedup-aware split
    * discipline of LLM corpus prep). Docs in no pair anchor to themselves,
    * so singletons keep EXACTLY the assignment of the plain hash split
    * (same salt, same buckets — q_split): adopting the leak-free split
    * never reshuffles non-duplicated documents.
    *
    * `pairs` is the verified near-dup pair relation (pairs-scale — the
    * OUTPUT of dedup, orders of magnitude below corpus scale). Components
    * come from [[Dedup.connectedComponents]] (pointer-jumping min-label);
    * the anchor join back to the corpus is one shuffle on the doc key
    * (the component relation is pairs-scale — AQE broadcasts it when dup
    * density is low); the split itself is a narrow hash. Buckets:
    * h60("salt:" ‖ anchor) mod 100 → [0,trainPct) train,
    * [trainPct,trainPct+valPct) val, rest test.
    */
  def leakFreeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                    aCol: String, bCol: String,
                    trainPct: Int = 90, valPct: Int = 5,
                    salt: String = "split"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"trainPct=$trainPct valPct=$valPct must be ≥0 and sum ≤100")
    val comp = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("component"))
    df.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("anchor", coalesce(col("component"), col(idCol)))
      .withColumn("bucket",
        pmod(Hashes.h60(concat(lit(salt + ":"), col("anchor"))), lit(100L)))
      .select(col(idCol), col("anchor"),
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test").as("split"))
  }

  /** Split-representativeness audit — the companion gate to [[leakFreeSplit]]
    * / the plain hash split: per split, document count, token budget, and
    * the maximum absolute deviation of the split's group composition from
    * the GLOBAL composition (max over groups of |share_in_split −
    * share_global|). A val/test split whose language (or source) mix
    * drifts from the corpus measures the wrong thing; hash splits are
    * composition-unbiased in expectation, and this is the number that
    * verifies it held for THIS corpus.
    *
    * Determinism: shares are round-6 doubles of integer-count ratios
    * (both engines divide the same integers), the deviation is re-rounded
    * at the edge, and the max is order-independent.
    *
    * Scale posture: ONE corpus-scale aggregate (groupBy split × group);
    * everything after runs on the ≤ splits·groups count grid — including
    * absent (split, group) cells, which deviate by the full global share
    * and therefore must exist in the grid (a grid built from observed
    * cells only would silently under-report the drift of a group that
    * vanished from a split).
    */
  def splitBalance(df: DataFrame, splitCol: String, grpCol: String,
                   tokCountCol: Column): DataFrame = {
    val cnt = df.groupBy(col(splitCol).as("split"), col(grpCol).as("grp"))
      .agg(count(lit(1)).as("c"), sum(tokCountCol.cast("long")).as("tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bySplit = cnt.groupBy(col("split"))
      .agg(sum(col("c")).as("n_docs"), sum(col("tk")).as("n_tokens"))
    val byGrp = cnt.groupBy(col("grp")).agg(sum(col("c")).as("gc"))
    val total = byGrp.agg(sum(col("gc")).as("n_all"))
    // full splits × groups grid (splits·groups rows — tiny): absent cells
    // count 0, see the scaladoc
    val grid = bySplit.select(col("split"), col("n_docs"))
      .crossJoin(byGrp.crossJoin(broadcast(total)))
      .join(cnt.select(col("split"), col("grp"), col("c")),
        Seq("split", "grp"), "left")
      .na.fill(0L, Seq("c"))
    val dev = round(abs(
      round(col("c").cast("double") / col("n_docs"), 6)
        - round(col("gc").cast("double") / col("n_all"), 6)), 6)
    val out = grid
      .select(col("split"), dev.as("dev"))
      .groupBy(col("split"))
      .agg(max(col("dev")).as("max_grp_dev"))
      .join(bySplit, Seq("split"))
      .select(col("split"), col("n_docs"), col("n_tokens"),
        col("max_grp_dev"))
    out
  }

  /** Per-stratum sampling rates (basis points), e.g. downsample boilerplate
    * languages while keeping all of a rare one — the corpus-mixing knob of
    * an LLM data pipeline. Unlisted strata fall back to `defaultBp`.
    * Same determinism contract as [[hashSample]]; one narrow filter, no
    * shuffle, no join against a rates table (the map inlines into codegen).
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
                           ratesBp: Map[String, Int], defaultBp: Int,
                           salt: String = "samp"): DataFrame = {
    (ratesBp.values.toSeq :+ defaultBp).foreach(bp =>
      require(bp >= 0 && bp <= 10000, s"rateBp: $bp"))
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (stratum, bp)) =>
      when(col(stratumCol) === stratum, lit(bp)).otherwise(acc)
    }
    df.where(sampleBasis(col(idCol), salt) < rate)
  }

  /** Fixed-size token chunking with overlap — the step between a curated
    * document and context-length training sequences: doc tokens are cut
    * into windows of `chunkSize` tokens starting every
    * `chunkSize − overlap` tokens, so consecutive chunks share `overlap`
    * tokens and no token is dropped (the final, possibly short, chunk
    * keeps the tail). Emits one row per (doc, chunk_id) with the chunk's
    * token count and space-joined text.
    *
    * Narrow generate: slice + posexplode per row — no shuffle, output
    * rows ≈ Σ tokens/stride, each chunk assembled from the token array
    * already in the row. Deterministic: chunk_id is the 0-based window
    * index. Degenerate inputs: docs with ≤ chunkSize tokens yield exactly
    * one chunk; empty-token docs yield none.
    */
  def chunkTokens(df: DataFrame, idCol: String, toksCol: String,
                  chunkSize: Int, overlap: Int,
                  carryCols: Seq[String] = Nil): DataFrame = {
    require(chunkSize >= 1, s"chunkSize: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap $overlap must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    val toks = col(toksCol)
    val carried = carryCols.map(col)
    // number of windows: 1 + ⌈max(len − chunkSize, 0) / stride⌉ — the
    // last window starts at the largest multiple of stride < len that
    // still adds unseen tokens
    val nChunks = when(size(toks) <= chunkSize, lit(1))
      .otherwise(lit(1) +
        ceil((size(toks) - chunkSize).cast("double") / stride).cast("int"))
    df.where(size(toks) > 0)
      .select(col(idCol).as("doc_id") +: toks.as("toks") +:
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id") +: carried: _*)
      .select(col("doc_id") +: col("chunk_id") +:
        slice(col("toks"), col("chunk_id") * stride + 1, lit(chunkSize)).as("chunk")
        +: carried: _*)
      .select(col("doc_id") +: col("chunk_id") +:
        size(col("chunk")).as("n_tokens") +:
        concat_ws(" ", col("chunk")).as("chunk_text") +: carried: _*)
  }

  /** Greedy sequence packing: within each `partitionCol` group, documents
    * in ascending `orderCol` order are appended to the current pack, and
    * `pack_id` = ⌊(running token total BEFORE this doc) / budget⌋ — the
    * overflow-allowed policy (a doc straddling the boundary finishes its
    * pack; the next doc starts the next one). Emitted as a new column.
    *
    * Scale posture: ONE window partitioned by `partitionCol` — state is a
    * running sum per group, so groups (language, shard, source) must be
    * numerous enough to spread; a global pack order would serialize into
    * one reducer, which is why `partitionCol` is required rather than
    * optional. Deterministic: (partition, order) totally orders rows as
    * long as `orderCol` is unique per partition (doc ids are).
    */
  def packByBudget(df: DataFrame, partitionCol: String, orderCol: String,
                   tokenCol: String, budget: Long,
                   outCol: String = "pack_id"): DataFrame = {
    require(budget >= 1, s"budget: $budget")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists on the input; pass a " +
        "different outCol instead of silently overwriting it")
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol,
      floor((sum(col(tokenCol)).over(w) - col(tokenCol)) / budget))
  }

  /** Write-path SHARD PLAN: deterministic hash sharding of the corpus into
    * `nShards` output shards (the same salt+h60 basis as the split ops —
    * shard = h60("shard:" ++ id) mod N, stable under repartitioning and
    * incremental re-runs) plus the per-shard load audit: doc count, total
    * weight (tokens/bytes), and `load_factor` = this shard's weight over
    * the balanced ideal (1.0 = perfectly even; the max over shards is the
    * straggler factor a 1000-executor write inherits, since the slowest
    * shard gates the job). Hash sharding balances COUNTS by construction
    * but not WEIGHT when the size distribution is heavy-tailed — exactly
    * what this relation measures before anyone commits to N.
    *
    * One map-side-combined corpus aggregate to an N-row relation; the
    * totals attach via the engine's one-row-aggregate broadcast crossJoin
    * idiom. Empty shards (possible at tiny corpus/large N) are absent —
    * the oracle mirrors that.
    */
  def shardPlan(docs: DataFrame, idCol: String, weightCol: Column,
                nShards: Int, salt: String = "shard"): DataFrame = {
    require(nShards >= 1, s"nShards: $nShards")
    val sh = docs.select(
        pmod(Hashes.h60(concat(lit(salt), lit(":"), col(idCol))),
          lit(nShards.toLong)).as("shard"),
        weightCol.cast("long").as("w"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).cast("long").as("weight"))
    val tot = sh.agg(sum(col("weight")).cast("long").as("tot"))
    sh.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("weight"),
        round(col("weight").cast("double") * nShards
          / col("tot").cast("double"), 6).as("load_factor"))
  }
}
