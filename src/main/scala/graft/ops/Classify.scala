package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised text classification over hashed features — the domain-tagger
  * stage of a training-data pipeline (the CCNet / fastText-classifier role:
  * label every document with its most likely source domain, with a
  * confidence margin, so downstream mixture and filtering stages can key on
  * predicted domain instead of trusted metadata).
  *
  * The model is multinomial Naive Bayes over hashed token-feature buckets —
  * the closed-form member of the linear-classifier family (fastText = the
  * gradient-trained member; NB needs no iteration, so train + score is two
  * relational passes and every number is exactly reproducible across
  * engines). Same hashed-feature basis as DSIR ([[CorpusOps.importanceResample]]):
  * h60 token hashes bucketed mod B, add-one smoothing, ln rounded to 6
  * decimals at the edge, decimal-exact per-doc sums.
  *
  * Generalizes the reference's per-key counting loop (`hash_map.c:25-28`)
  * from one global histogram to per-class histograms + argmax.
  */
object Classify {

  /** Train-and-score multinomial NB in one call.
    *
    * Model: for class c with n_c docs out of N and per-bucket feature
    * counts cnt_c(b) (Σ_b cnt_c(b) = tot_c),
    *
    *   score(d, c) = ln(n_c / N) + Σ_{occurrences (b) in d}
    *                 ln((cnt_c(b) + 1) / (tot_c + B))
    *
    * Occurrences keep multiplicity (term frequency — multinomial NB, not
    * Bernoulli). Each ln is rounded to 6 decimals, then summed as
    * DECIMAL(28,6) — the repo's proven-portable ln algebra (q_unigram_lm,
    * q_dsir_sample) — so scores, the argmax, and the margin are
    * bit-reproducible across engines and partitionings. Ties on score
    * break toward the lexicographically smaller class label.
    *
    * Scale posture: the label set is collected to the driver — bounded by
    * the number of DOMAINS, not rows (the kmeans-centroid precedent,
    * Similarity.scala) — so the per-bucket model can be built WIDE: one
    * row per bucket with one log-prob column per class (pivot), ≤ B rows
    * broadcast into the scoring join. The feature stream is exploded once,
    * persisted (caller-managed lifetime, the repo's per-query contract),
    * and feeds (a) the B-row model aggregate and (b) the scoring join;
    * scoring is then ONE shuffle on the doc key with C running sums per
    * doc — no C× row multiplication before the exchange, which is what the
    * long-form (bucket, class) join would cost. The argmax/margin is a
    * C-element in-row sort, not a second shuffle. At 100 TB the model
    * relation is the reusable artifact: build once per corpus snapshot,
    * broadcast everywhere.
    *
    * Docs whose `featsCol` is empty have no feature rows and are absent
    * from the result (unscorable — same contract as importanceResample).
    *
    * @param df       input; one row per doc
    * @param idCol    doc key column name
    * @param featsCol array<long> of feature hashes (e.g. h60 tokens)
    * @param labelCol class label column name (string-castable, non-null)
    * @param buckets  feature-hash bucket count B
    * @return (idCol, labelCol, pred_label, nb_score, margin) — nb_score is
    *         the winning class's score, margin its lead over the runner-up,
    *         both rounded to 6 decimals; ordered by idCol
    */
  def nbDomain(df: DataFrame, idCol: String, featsCol: Column,
               labelCol: String, buckets: Int): DataFrame = {
    val (labels, f, bcnt, ftot, pri) =
      modelParts(df, featsCol, labelCol, buckets, idCol = Some(idCol))
    val model = lpModel(bcnt, ftot, labels, buckets)
    val sums = f.join(broadcast(model), Seq("b"))
      .groupBy(col(idCol), col("lbl"))
      .agg(sum(col(s"lp_${labels.head}")).as(s"s_${labels.head}"),
        labels.tail.map(l => sum(col(s"lp_$l")).as(s"s_$l")): _*)
      .crossJoin(broadcast(pri))

    // In-row argmax + runner-up: sort the C (score, class) pairs once.
    val cands = labels.map(l =>
      struct((col(s"s_$l") + col(s"pri_$l")).as("s"), lit(l).as("c")))
    val ranked = array_sort(array(cands: _*), (x, y) =>
      when(x.getField("s") > y.getField("s"), -1)
        .when(x.getField("s") < y.getField("s"), 1)
        .when(x.getField("c") < y.getField("c"), -1)
        .when(x.getField("c") > y.getField("c"), 1)
        .otherwise(0))
    sums.withColumn("r", ranked)
      .select(col(idCol), col("lbl").as(labelCol),
        element_at(col("r"), 1).getField("c").as("pred_label"),
        round(element_at(col("r"), 1).getField("s").cast("double"), 6)
          .as("nb_score"),
        round((element_at(col("r"), 1).getField("s")
            - element_at(col("r"), 2).getField("s")).cast("double"), 6)
          .as("margin"))
      .orderBy(col(idCol))
  }

  /** Shared model-building stages (algebra identical for [[nbDomain]] and
    * [[nbTrain]] by construction): sorted labels (bounded driver collect —
    * one row per DOMAIN, the kmeans-centroid precedent), the persisted
    * exploded feature stream, the ≤ B-row wide bucket-count relation
    * (persisted: it feeds the totals fold AND the model projection), the
    * 1-row per-class occurrence totals (folded from the bucket relation,
    * NOT a second corpus pass), and the 1-row priors ln(n_c / N).
    */
  private def modelParts(df: DataFrame, featsCol: Column, labelCol: String,
                         buckets: Int, idCol: Option[String] = None)
      : (Seq[String], DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(buckets >= 2, s"buckets: $buckets")
    // null check on the RAW collect, BEFORE .sorted — Arrays.sort on a
    // null element throws an opaque NPE and would make this diagnostic
    // unreachable (ADVICE r11)
    val rawLabels = df.select(col(labelCol).cast("string")).distinct()
      .collect().map(_.getString(0))
    require(!rawLabels.contains(null), "nbDomain: null label")
    val labels = rawLabels.sorted.toSeq
    require(labels.size >= 2, s"nbDomain needs >= 2 classes, got $labels")
    // persist only when a scoring join will re-read the stream (nbDomain);
    // the train-only path (no idCol) consumes f exactly once, in bcnt
    val f0 = df
      .select(idCol.map(col).toSeq ++ Seq(
        col(labelCol).cast("string").as("lbl"), explode(featsCol).as("fh")): _*)
      .withColumn("b", pmod(col("fh"), lit(buckets.toLong)))
    val f = if (idCol.isDefined)
      f0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else f0
    val bcnt = f.groupBy(col("b")).pivot("lbl", labels).count()
      .na.fill(0L)
      .toDF("b" +: labels.map("cnt_" + _): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ftot = bcnt.agg(
      sum(col(s"cnt_${labels.head}")).as(s"tot_${labels.head}"),
      labels.tail.map(l => sum(col(s"cnt_$l")).as(s"tot_$l")): _*)
    val pri = df.groupBy().pivot(col(labelCol).cast("string"), labels).count()
      .na.fill(0L)
      .toDF(labels.map("nd_" + _): _*)
      .withColumn("nd_all", labels.map(l => col(s"nd_$l")).reduce(_ + _))
      .select(labels.map(l =>
        round(log(col(s"nd_$l").cast("double") / col("nd_all").cast("double")), 6)
          .cast("decimal(28,6)").as(s"pri_$l")): _*)
    (labels, f, bcnt, ftot, pri)
  }

  /** ≤ B-row model relation (b, lp_<label>…): add-one smoothed per-bucket
    * log-probs, ln rounded to 6 then DECIMAL(28,6). */
  private def lpModel(bcnt: DataFrame, ftot: DataFrame, labels: Seq[String],
                      buckets: Int): DataFrame =
    bcnt.crossJoin(broadcast(ftot)) // 1-row totals
      .select(col("b") +: labels.map(l =>
        round(log((col(s"cnt_$l") + 1).cast("double")
            / (col(s"tot_$l") + buckets).cast("double")), 6)
          .cast("decimal(28,6)").as(s"lp_$l")): _*)

  /** Collected NB model — bounded by B·C values (buckets × DOMAINS, never
    * rows), the broadcast-everywhere artifact of the 100 TB deployment:
    * train once per corpus snapshot, ship the arrays, score with zero
    * shuffles. Log-probs and priors are EXACT integer micro-units
    * (rounded-6 ln × 10⁶) so scoring is pure long arithmetic — the same
    * values the relational path sums as DECIMAL(28,6), so the two paths
    * agree bit-for-bit. Overflow bound: |lp| < 40·10⁶ micro, so a doc
    * needs > 2·10¹¹ feature occurrences to overflow a long — far beyond
    * any document.
    *
    * @param labels      sorted class labels
    * @param priorsMicro ln(n_c / N) × 10⁶ per label, aligned
    * @param lpMicro     per label: DENSE B-element bucket log-probs × 10⁶
    *                    (unseen buckets already hold the smoothed default)
    */
  final case class NbModel(buckets: Int, labels: Seq[String],
                           priorsMicro: Seq[Long], lpMicro: Seq[Array[Long]])

  /** Train the [[NbModel]]: identical model algebra to [[nbDomain]]
    * (shared builder), collected to the driver — a bounded B·C collect,
    * the kmeans-centroid precedent. */
  def nbTrain(df: DataFrame, featsCol: Column, labelCol: String,
              buckets: Int): NbModel = {
    val (labels, f, bcnt, ftot, pri) = modelParts(df, featsCol, labelCol, buckets)
    val model = lpModel(bcnt, ftot, labels, buckets)
    def micro(d: java.math.BigDecimal): Long =
      d.movePointRight(6).setScale(0).longValueExact()
    val defaults = ftot.select(labels.map(l =>
      round(log(lit(1.0) / (col(s"tot_$l") + buckets).cast("double")), 6)
        .cast("decimal(28,6)").as(s"def_$l")): _*).head()
    val priRow = pri.head()
    val dense = labels.indices.map { i =>
      Array.fill(buckets)(micro(defaults.getDecimal(i)))
    }
    model.collect().foreach { r =>
      val b = r.getLong(0).toInt
      labels.indices.foreach(i => dense(i)(b) = micro(r.getDecimal(i + 1)))
    }
    f.unpersist()
    bcnt.unpersist()
    NbModel(buckets, labels,
      labels.indices.map(i => micro(priRow.getDecimal(i))), dense)
  }

  /** Zero-shuffle scoring column from a collected [[NbModel]]: one long
    * `aggregate` fold per class over the feature array — O(1) dense-array
    * literal indexing, integer adds, no per-step allocation (the first
    * cut used a map literal + decimal zip_with: element_at on a map
    * literal is a LINEAR scan and each step allocated C BigDecimals —
    * 46 s at sf0.1; this form is ~1 s) — then the same C-element in-row
    * argmax as [[nbDomain]], compared in exact micros. A pure column
    * expression — narrow and STREAMING-SAFE (stateless: usable on a
    * readStream frame with no watermark or state store).
    *
    * Returns struct(pred_label, nb_score, margin). Rows with an empty
    * feature array score priors-only (they predict the largest-prior
    * class) — the relational path instead drops them; filter upstream
    * when comparing.
    */
  def nbScore(model: NbModel, featsCol: Column): Column =
    nbScoreBuckets(model, bucketIndex(model, featsCol))

  /** 1-based dense-array index of a feature hash: pmod(fh, B) + 1. */
  def bucketIndex(model: NbModel, featsCol: Column): Column =
    transform(featsCol,
      fh => (pmod(fh, lit(model.buckets.toLong)) + 1).cast("int"))

  /** [[nbScore]] over PRE-BUCKETED 1-based indices ([[bucketIndex]]) —
    * callers scoring repeatedly (or whose feature expression is expensive,
    * e.g. tokenize + md5) should materialize the index array once and use
    * this form: the C per-class folds each re-evaluate their input
    * expression, so an un-materialized feats column would be recomputed
    * C times. */
  def nbScoreBuckets(model: NbModel, bidxCol: Column): Column = {
    val scoresMicro = model.labels.indices.map { i =>
      val arr = lit(model.lpMicro(i))
      aggregate(bidxCol, lit(0L), (acc, bi) => acc + element_at(arr, bi)) +
        lit(model.priorsMicro(i))
    }
    val cands = model.labels.zip(scoresMicro).map { case (l, s) =>
      struct(s.as("s"), lit(l).as("c"))
    }
    val ranked = array_sort(array(cands: _*), (x, y) =>
      when(x.getField("s") > y.getField("s"), -1)
        .when(x.getField("s") < y.getField("s"), 1)
        .when(x.getField("c") < y.getField("c"), -1)
        .when(x.getField("c") > y.getField("c"), 1)
        .otherwise(0))
    def toScore(micros: Column): Column =
      round(micros.cast("double") / 1e6, 6)
    struct(
      element_at(ranked, 1).getField("c").as("pred_label"),
      toScore(element_at(ranked, 1).getField("s")).as("nb_score"),
      toScore(element_at(ranked, 1).getField("s")
          - element_at(ranked, 2).getField("s")).as("margin"))
  }

  /** Pairwise KL divergence between per-class hashed-unigram distributions
    * — the domain-similarity diagnostic behind mixture design (which
    * sources are interchangeable, which are distinct; the DoReMi/DSIR-era
    * "domain distance" signal), computed on the same smoothed bucket basis
    * as [[nbDomain]]:
    *
    *   p_c(b) = (cnt_c(b) + 1) / (tot_c + B)   over ALL B buckets
    *   KL(a‖b) = Σ_b p_a(b) · (ln p_a(b) − ln p_b(b))
    *           = [Σ_b (cnt_a(b)+1) · (ln p_a − ln p_b)] / (tot_a + B)
    *
    * Every ln is rounded to 6 decimals; the numerator is an exact
    * DECIMAL sum of integer × decimal products (counts as DECIMAL(19,0) —
    * wide enough for trillions of occurrences per (class, bucket), the
    * 100 TB posture; a 9-digit cnt overflowed under ANSI mode past 10^9
    * occurrences, ADVICE r11 — log-probs as DECIMAL(12,6); products stay
    * inside 38 digits in both engines); the single closing division and
    * round(…,6) are the only double ops — order-independent,
    * engine-portable.
    *
    * Unobserved buckets matter: two classes with different totals assign
    * DIFFERENT smoothed mass to an everywhere-empty bucket, so the grid
    * is the full B × classes surface — built by exploding a 0…B−1
    * sequence per class (narrow), never a cross join.
    *
    * Scale posture: ONE corpus-scale aggregate (groupBy class × bucket);
    * everything after is bounded by B·C² rows regardless of corpus size.
    *
    * @return (label_a, label_b, kl_ab, kl_ba) for label_a < label_b,
    *         ordered by (label_a, label_b)
    */
  def domainDivergence(df: DataFrame, featsCol: Column, labelCol: String,
                       buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets: $buckets")
    val f = df
      .select(col(labelCol).cast("string").as("lbl"), explode(featsCol).as("fh"))
      .withColumn("b", pmod(col("fh"), lit(buckets.toLong)))
    val cnt = f.groupBy(col("lbl"), col("b")).agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy(col("lbl")).agg(sum(col("cnt")).as("tot"))
    // full B × C grid: explode the bucket range under each class (narrow)
    val grid = tot
      .select(col("lbl"), col("tot"),
        explode(sequence(lit(0L), lit(buckets - 1L))).as("b"))
      .join(cnt, Seq("lbl", "b"), "left")
      .na.fill(0L, Seq("cnt"))
      .select(col("lbl"), col("b"),
        col("cnt").cast("decimal(19,0)").as("cnt"),
        round(log((col("cnt") + 1).cast("double")
            / (col("tot") + buckets).cast("double")), 6)
          .cast("decimal(12,6)").as("lnp"))
    val a = grid.select(col("lbl").as("label_a"), col("b"),
      col("cnt").as("cnt_a"), col("lnp").as("lnp_a"))
    val b = grid.select(col("lbl").as("label_b"), col("b"),
      col("cnt").as("cnt_b"), col("lnp").as("lnp_b"))
    val pairs = a.join(b, Seq("b")).where(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(
        sum((col("cnt_a") + 1) * (col("lnp_a") - col("lnp_b"))).as("num_ab"),
        sum((col("cnt_b") + 1) * (col("lnp_b") - col("lnp_a"))).as("num_ba"))
    pairs
      .join(tot.select(col("lbl").as("label_a"), col("tot").as("tot_a")),
        Seq("label_a"))
      .join(tot.select(col("lbl").as("label_b"), col("tot").as("tot_b")),
        Seq("label_b"))
      .select(col("label_a"), col("label_b"),
        round(col("num_ab").cast("double") / (col("tot_a") + buckets), 6)
          .as("kl_ab"),
        round(col("num_ba").cast("double") / (col("tot_b") + buckets), 6)
          .as("kl_ba"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Pairwise Jensen-Shannon divergence between the same smoothed hashed
    * unigram distributions [[domainDivergence]] compares by KL — the
    * SYMMETRIC, bounded ([0, ln 2]) domain distance mixture design
    * actually wants (KL explodes when one domain lacks the other's mass;
    * JS against the midpoint M = ½(P+Q) never does). Same exactness
    * discipline: per-bucket logs quantized DECIMAL(12,6) — ln p from the
    * smoothed rational, ln m from the one fixed IEEE chain over both
    * sides' rationals — multiplied by exact integer counts and summed in
    * decimal, one closing division per side. Same plan shape too: one
    * bucket-keyed aggregate, the B × C grid explode, a bucket-keyed pair
    * join (B·C² rows — bounded by the bucket grid, never corpus-scale).
    */
  def domainJsDivergence(df: DataFrame, featsCol: Column, labelCol: String,
                         buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets: $buckets")
    val f = df
      .select(col(labelCol).cast("string").as("lbl"), explode(featsCol).as("fh"))
      .withColumn("b", pmod(col("fh"), lit(buckets.toLong)))
    val cnt = f.groupBy(col("lbl"), col("b")).agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy(col("lbl")).agg(sum(col("cnt")).as("tot"))
    val grid = tot
      .select(col("lbl"), col("tot"),
        explode(sequence(lit(0L), lit(buckets - 1L))).as("b"))
      .join(cnt, Seq("lbl", "b"), "left")
      .na.fill(0L, Seq("cnt"))
      .select(col("lbl"), col("b"), col("tot"),
        col("cnt").cast("decimal(19,0)").as("cnt"),
        round(log((col("cnt") + 1).cast("double")
            / (col("tot") + buckets).cast("double")), 6)
          .cast("decimal(12,6)").as("lnp"))
    val a = grid.select(col("lbl").as("label_a"), col("b"),
      col("cnt").as("cnt_a"), col("tot").as("tot_a"), col("lnp").as("lnp_a"))
    val c = grid.select(col("lbl").as("label_b"), col("b"),
      col("cnt").as("cnt_b"), col("tot").as("tot_b"), col("lnp").as("lnp_b"))
    a.join(c, Seq("b")).where(col("label_a") < col("label_b"))
      .withColumn("lnm",
        round(log(lit(0.5) *
            ((col("cnt_a") + 1).cast("double")
                / (col("tot_a") + buckets).cast("double")
              + (col("cnt_b") + 1).cast("double")
                / (col("tot_b") + buckets).cast("double"))), 6)
          .cast("decimal(12,6)"))
      .groupBy(col("label_a"), col("label_b"), col("tot_a"), col("tot_b"))
      .agg(
        sum((col("cnt_a") + 1) * (col("lnp_a") - col("lnm"))).as("num_a"),
        sum((col("cnt_b") + 1) * (col("lnp_b") - col("lnm"))).as("num_b"))
      .select(col("label_a"), col("label_b"),
        round(lit(0.5) *
          (col("num_a").cast("double") / (col("tot_a") + buckets)
            + col("num_b").cast("double") / (col("tot_b") + buckets)), 6)
          .as("js"))
      .orderBy(col("label_a"), col("label_b"))
  }
}
