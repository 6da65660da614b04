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
    require(buckets >= 2, s"buckets: $buckets")
    // Bounded driver collect: one row per DOMAIN (not per doc/feature).
    val labels = df.select(col(labelCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    require(labels.size >= 2, s"nbDomain needs >= 2 classes, got $labels")
    require(!labels.contains(null), "nbDomain: null label")

    val f = df
      .select(col(idCol), col(labelCol).cast("string").as("lbl"),
        explode(featsCol).as("fh"))
      .withColumn("b", pmod(col("fh"), lit(buckets.toLong)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ≤ B rows: per-bucket per-class occurrence counts, wide. Persisted:
    // it feeds both the 1-row totals aggregate and the model projection,
    // and recomputing it would re-run the corpus-scale feature aggregate.
    val bcnt = f.groupBy(col("b")).pivot("lbl", labels).count()
      .na.fill(0L)
      .toDF("b" +: labels.map("cnt_" + _): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 1 row: per-class total occurrences — folded from the ≤ B-row bucket
    // relation, NOT a second corpus-scale pass over the feature stream.
    val ftot = bcnt.agg(
      sum(col(s"cnt_${labels.head}")).as(s"tot_${labels.head}"),
      labels.tail.map(l => sum(col(s"cnt_$l")).as(s"tot_$l")): _*)
    // 1 row: per-class doc-count priors ln(n_c / N).
    val pri = df.groupBy().pivot(col(labelCol).cast("string"), labels).count()
      .na.fill(0L)
      .toDF(labels.map("nd_" + _): _*)
      .withColumn("nd_all", labels.map(l => col(s"nd_$l")).reduce(_ + _))
      .select(labels.map(l =>
        round(log(col(s"nd_$l").cast("double") / col("nd_all").cast("double")), 6)
          .cast("decimal(28,6)").as(s"pri_$l")): _*)

    val model = bcnt.crossJoin(broadcast(ftot)) // 1-row totals
      .select(col("b") +: labels.map(l =>
        round(log((col(s"cnt_$l") + 1).cast("double")
            / (col(s"tot_$l") + buckets).cast("double")), 6)
          .cast("decimal(28,6)").as(s"lp_$l")): _*)

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
}
