package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus assembly: deterministic (hash-based) sampling and greedy
  * sequence packing — reproducibility and policy semantics.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 1000L).map(i =>
    (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")

  test("hashSample: deterministic, repartition-stable, rate-nested") {
    val s20 = CorpusOps.hashSample(docs, "doc_id", 2000)
      .select("doc_id").as[Long].collect().toSet
    val again = CorpusOps.hashSample(docs.repartition(13), "doc_id", 2000)
      .select("doc_id").as[Long].collect().toSet
    assert(s20 === again, "sample must not depend on partitioning")
    // the draw is shared across rates, so a lower rate is a SUBSET of a
    // higher one (incremental rate changes don't reshuffle the sample)
    val s50 = CorpusOps.hashSample(docs, "doc_id", 5000)
      .select("doc_id").as[Long].collect().toSet
    assert(s20.subsetOf(s50))
    // loose two-sided bound: 2000bp of 1000 docs ⇒ ~200 (md5-uniform draw)
    assert(s20.size > 120 && s20.size < 280, s"got ${s20.size}")
  }

  test("leakFreeSplit: components move as one; singletons keep the plain split") {
    val d = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 5L)).toDF("id_a", "id_b")
    val got = CorpusOps.leakFreeSplit(d, "doc_id", pairs, "id_a", "id_b")
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(got.map(_._2) === Seq(1L, 1L, 3L, 4L, 1L, 6L),
      "pair members anchor to the component min id, singletons to themselves")
    val split = got.map(g => g._1 -> g._3).toMap
    assert(split(1L) === split(2L) && split(2L) === split(5L),
      "every member of a near-dup component must land in the same split")
    // singletons: bit-identical to the no-pairs (plain q_split) assignment
    val plain = CorpusOps.leakFreeSplit(d, "doc_id",
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b")
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(plain.map(_._2) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val plainSplit = plain.map(g => g._1 -> g._3).toMap
    Seq(3L, 4L, 6L).foreach(id => assert(split(id) === plainSplit(id),
      s"singleton $id must keep its plain hash-split assignment"))
    // repartition stability (the determinism contract of every split/sampler)
    val re = CorpusOps.leakFreeSplit(d.repartition(7), "doc_id", pairs,
        "id_a", "id_b")
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(re === got)
  }

  test("stratifiedHashSample: per-stratum rates, unlisted strata default") {
    val sampled = CorpusOps.stratifiedHashSample(docs, "doc_id", "lang",
        Map("en" -> 8000), defaultBp = 500)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // en ~ 8000bp of 500 ⇒ ~400; de ~ 500bp of 500 ⇒ ~25
    assert(sampled("en") > 320 && sampled("en") < 480, sampled.toString)
    assert(sampled.getOrElse("de", 0L) < 70, sampled.toString)
    // per-row decisions equal a plain hashSample at that stratum's rate
    val enOnly = CorpusOps.hashSample(docs.where(col("lang") === "en"),
      "doc_id", 8000).count()
    assert(sampled("en") === enOnly)
  }

  test("chunkTokens: coverage, overlap, tail chunk, degenerate inputs") {
    val d = Seq(
      (1L, (1 to 11).map(i => s"t$i")), // 11 toks, size 4 overlap 1 → stride 3
      (2L, Seq("a", "b")),              // ≤ chunkSize → one chunk
      (3L, Seq.empty[String]))          // empty → no rows
      .toDF("doc_id", "toks")
    val out = CorpusOps.chunkTokens(d, "doc_id", "toks", chunkSize = 4, overlap = 1)
      .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    // doc 1: windows start at 1,4,7,10 (1-based) → 4 chunks, short tail
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._4) === Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10 t11"))
    assert(doc1.map(_._3) === Seq(4, 4, 4, 2))
    // every token appears; consecutive chunks share exactly `overlap`
    assert(doc1.flatMap(_._4.split(" ")).distinct.size === 11)
    assert(out.filter(_._1 == 2L) === Seq((2L, 0, 2, "a b")))
    assert(!out.exists(_._1 == 3L))
    // invalid overlap rejected
    intercept[IllegalArgumentException] {
      CorpusOps.chunkTokens(d, "doc_id", "toks", chunkSize = 4, overlap = 4)
    }
  }

  test("packByBudget: overflow-allowed greedy policy, per-partition state") {
    val df = Seq(
      ("a", 1L, 1000L), ("a", 2L, 1000L), ("a", 3L, 100L), ("a", 4L, 2048L),
      ("b", 1L, 5000L), ("b", 2L, 10L))
      .toDF("grp", "doc_id", "n_tokens")
    val packed = CorpusOps.packByBudget(df, "grp", "doc_id", "n_tokens", 2048)
      .select("grp", "doc_id", "pack_id")
      .as[(String, Long, Long)].collect().toSet
    assert(packed === Set(
      // prev-cum: 0, 1000, 2000, 2100 → packs 0,0,0,1
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 1L),
      // oversized doc finishes pack 0; next starts at prev-cum 5000 → pack 2
      ("b", 1L, 0L), ("b", 2L, 2L)))
    // each pack holds at least one doc and packs are contiguous per group
    val perGroup = packed.groupBy(_._1).view.mapValues(
      _.toSeq.sortBy(_._2).map(_._3))
    perGroup.foreach { case (g, packs) =>
      assert(packs === packs.sorted, s"pack ids must be monotone in $g")
    }
  }

  test("weightedSamplePerGroup: k per group, short groups whole, deterministic") {
    import spark.implicits._
    val df = (0 until 40).map(i =>
      (i.toLong, if (i < 20) "a" else "b", (i % 7 + 1).toDouble))
      .toDF("id", "g", "w")
    val out = CorpusOps.weightedSamplePerGroup(df, "id", "g", col("w"), 5)
      .select("id", "g").as[(Long, String)].collect().toSeq
    assert(out.groupBy(_._2).view.mapValues(_.size).toMap
      === Map("a" -> 5, "b" -> 5))
    // deterministic draw: identical result on a different partitioning
    val again = CorpusOps.weightedSamplePerGroup(df.repartition(7), "id", "g",
        col("w"), 5)
      .select("id", "g").as[(Long, String)].collect().toSeq
    assert(out.toSet === again.toSet)
    // a group smaller than k returns the whole group
    assert(CorpusOps.weightedSamplePerGroup(
      df.where(col("id") < 3), "id", "g", col("w"), 5).count() === 3)
  }

  test("mixtureSample: per-group quotas respected, equals fixed-k form when quotas match") {
    import spark.implicits._
    val df = (0 until 40).map(i =>
      (i.toLong, if (i < 20) "a" else "b", (i % 7 + 1).toDouble))
      .toDF("id", "g", "w")
    val quotas = Seq(("a", 3L), ("b", 7L)).toDF("g", "quota")
    val out = CorpusOps.mixtureSample(df, "id", "g", col("w"), quotas)
    assert(out.groupBy("g").count().as[(String, Long)].collect().toMap
      === Map("a" -> 3L, "b" -> 7L))
    // same draw as weightedSamplePerGroup where the quota equals its k
    val fixedA = CorpusOps.weightedSamplePerGroup(df.where(col("g") === "a"),
        "id", "g", col("w"), 3)
      .select("id").as[Long].collect().toSet
    assert(out.where(col("g") === "a")
      .select("id").as[Long].collect().toSet === fixedA)
    // a group absent from quotas contributes nothing (inner join contract)
    val partial = CorpusOps.mixtureSample(df, "id", "g", col("w"),
      Seq(("a", 2L)).toDF("g", "quota"))
    assert(partial.select("g").distinct().as[String].collect().toSeq === Seq("a"))
  }

  test("mixtureSample: duplicated quota group fails loudly, not silently duplicating rows") {
    import spark.implicits._
    // the quota join is a plain inner join — a duplicate quota row would
    // silently duplicate every sampled row of that group (ADVICE r10);
    // the in-plan window guard must raise instead
    val df = (0 until 10).map(i => (i.toLong, "a", 1.0)).toDF("id", "g", "w")
    val dup = Seq(("a", 3L), ("a", 5L)).toDF("g", "quota")
    val e = intercept[Exception] {
      CorpusOps.mixtureSample(df, "id", "g", col("w"), dup).collect()
    }
    assert(e.getMessage.contains("exactly one row per group") ||
      Option(e.getCause).exists(_.getMessage.contains("exactly one row per group")))
  }

  test("importanceResample: target-vocab docs outscore off-domain, draw is stable") {
    import spark.implicits._
    import graft.functions.Hashes
    // two disjoint vocabularies: docs 0-9 speak vocab A, 10-19 vocab B;
    // the TARGET sample is ids 0-4 (all vocab A) — every A doc must get a
    // strictly higher log importance ratio than every B doc, target
    // membership included or not (DSIR scores raw docs by feature
    // likelihood ratio, not by membership)
    val rows = (0 until 20).map { i =>
      val toks =
        if (i < 10) Seq("alpha", "beta", "gamma", "alpha")
        else Seq("delta", "epsilon", "zeta", "delta")
      (i.toLong, toks, i < 5)
    } :+ ((20L, Seq.empty[String], false)) // zero-feature doc: unscorable
    val df = rows.toDF("id", "toks", "is_t")
      .withColumn("f", transform(col("toks"), t => Hashes.h60(t)))
    val out = CorpusOps.importanceResample(df, "id", col("f"), col("is_t"),
      buckets = 64, k = 21)
    val scored = out.select("id", "log_ratio").as[(Long, Double)]
      .collect().toMap
    assert(scored.keySet === (0L until 20L).toSet,
      "all featured docs scored; the empty doc is absent")
    val aMin = (0L until 10L).map(scored).min
    val bMax = (10L until 20L).map(scored).max
    assert(aMin > bMax,
      s"target-vocab floor $aMin must exceed off-domain ceiling $bMax")
    // within a vocab every doc has identical features → identical ratio
    assert((0L until 10L).map(scored).distinct.size === 1)
    // deterministic under repartitioning, and the k cut is the prefix of
    // the full ascending-key order
    val again = CorpusOps.importanceResample(df.repartition(7), "id",
      col("f"), col("is_t"), buckets = 64, k = 21)
    assert(out.select("id", "log_ratio", "es_key").collect().toSeq ===
      again.select("id", "log_ratio", "es_key").collect().toSeq)
    val top5 = CorpusOps.importanceResample(df, "id", col("f"), col("is_t"),
      buckets = 64, k = 5).select("id").as[Long].collect().toSeq
    assert(top5 === out.select("id").as[Long].collect().toSeq.take(5))
    spark.catalog.clearCache()
  }

  test("weightedSample: non-positive weights raise instead of corrupting the sample") {
    import spark.implicits._
    // a zero weight would draw es_key = +Inf (silent exclusion), a
    // negative one a negative key that sorts FIRST (silent corruption) —
    // both must fail loudly (ADVICE r07)
    for (bad <- Seq(0.0, -1.5)) {
      val df = Seq((1L, 2.0), (2L, bad)).toDF("id", "w")
      val e = intercept[Exception] {
        CorpusOps.weightedSample(df, "id", col("w"), 2).collect()
      }
      assert(e.getMessage != null)
    }
    // positive weights: unchanged happy path
    val ok = Seq((1L, 1.0), (2L, 5.0), (3L, 2.0)).toDF("id", "w")
    assert(CorpusOps.weightedSample(ok, "id", col("w"), 2).count() === 2)
  }

  test("splitBalance: counts, token budgets, max deviation counts ABSENT groups, repartition-stable") {
    import spark.implicits._
    // global mix: a 4/6, b 2/6. Split s1 holds only a (b is ABSENT — its
    // cell must still deviate by b's full global share); s2 holds 1 a, 2 b.
    // Hand math on round-6 shares: s1 max dev = |1 − 0.666667| = 0.333333,
    // s2 max dev = |0.666667 − 0.333333| = 0.333334 — the asymmetric pair
    // proves the shares are rounded BEFORE the difference, as the oracle's.
    val df = Seq(
      ("s1", "a", 10L), ("s1", "a", 10L), ("s1", "a", 10L),
      ("s2", "a", 10L), ("s2", "b", 10L), ("s2", "b", 10L)
    ).toDF("split", "grp", "tk")
    val out = CorpusOps.splitBalance(df, "split", "grp", col("tk"))
      .orderBy("split")
      .select("split", "n_docs", "n_tokens", "max_grp_dev")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("s1", 3L, 30L, 0.333333), ("s2", 3L, 30L, 0.333334)))
    val re = CorpusOps.splitBalance(df.repartition(7), "split", "grp", col("tk"))
      .orderBy("split")
      .select("split", "n_docs", "n_tokens", "max_grp_dev")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(re === out, "splitBalance must be partitioning-invariant")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("importanceEss: flat weights give ESS = n; skew pulls the fraction below 1") {
    // identical features → identical log_ratio → w ≡ 1 → ESS = n exactly
    val flat = Seq(
      (1L, true, Array(5L)), (2L, false, Array(5L)),
      (3L, false, Array(5L)), (4L, false, Array(5L))
    ).toDF("doc_id", "t", "feats")
    val gotFlat = CorpusOps.importanceEss(flat, "doc_id", col("feats"),
        col("t"), buckets = 16)
      .as[(Long, Double, Double)].collect().head
    assert(gotFlat === ((4L, 4.0, 1.0)))
    // target concentrated on one feature bucket → that doc's weight
    // dominates → ESS strictly between 1 and n
    val skew = Seq(
      (1L, true, Array(1L)), (2L, false, Array(2L)),
      (3L, false, Array(2L)), (4L, false, Array(2L))
    ).toDF("doc_id", "t", "feats")
    val gotSkew = CorpusOps.importanceEss(skew, "doc_id", col("feats"),
        col("t"), buckets = 16)
      .as[(Long, Double, Double)].collect().head
    assert(gotSkew._1 === 4L)
    assert(gotSkew._2 > 1.0 && gotSkew._2 < 4.0,
      s"skewed weights must land strictly inside (1, n): $gotSkew")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  test("shardPlan: conservation, range, load-factor algebra, partitioning-invariant") {
    val df = (0L until 200L).map(i => (i, 1L + i % 7)).toDF("doc_id", "tk")
    val out = CorpusOps.shardPlan(df, "doc_id", col("tk"), nShards = 16)
      .orderBy("shard")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1).forall(s => s >= 0 && s < 16), "shard ids in [0,16)")
    assert(out.map(_._2).sum === 200L, "every doc lands in exactly one shard")
    val tot = out.map(_._3).sum
    assert(tot === (0L until 200L).map(i => 1L + i % 7).sum)
    out.foreach { case (_, _, w, lf) =>
      assert(lf === BigDecimal(w.toDouble * 16 / tot)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        "load_factor = weight * N / total, round 6")
    }
    val re = CorpusOps.shardPlan(df.repartition(7), "doc_id", col("tk"), 16)
      .orderBy("shard")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(re === out, "shardPlan must be partitioning-invariant")
    spark.catalog.clearCache()
  }

  test("spanCorrupt: splicing target spans back into input sentinels reconstructs the text") {
    val docs = (0L until 40L).map(i =>
      (i, (1 to 30 + (i % 7).toInt).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
    val out = CorpusOps.spanCorrupt(docs, "doc_id", "toks",
        spanLen = 3, maskPct = 30)
      .select("doc_id", "n_spans", "n_masked", "input_text", "target_text")
      .as[(Long, Long, Long, String, String)].collect().toSeq
    assert(out.size === 40)
    assert(out.exists(_._3 > 0), "some spans mask at 30%")
    assert(out.exists(r => r._3 < r._2), "some spans survive at 30%")
    val orig = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    out.foreach { case (id, nSpans, nMasked, input, target) =>
      // sentinels are sequentially numbered 0..nMasked-1 in the input
      val sentinels = "<extra_id_(\\d+)>".r.findAllMatchIn(input)
        .map(_.group(1).toInt).toSeq
      assert(sentinels === (0 until nMasked.toInt), s"doc $id sentinels")
      // parse target back into sentinel -> span text
      val spanOf =
        if (nMasked == 0) Map.empty[Int, String]
        else "<extra_id_(\\d+)> ([^<]*)".r.findAllMatchIn(target).map(m =>
          m.group(1).toInt -> m.group(2).trim).toMap
      assert(spanOf.keySet === (0 until nMasked.toInt).toSet)
      // splice: every sentinel in the input replaced by its target span
      val rebuilt = spanOf.foldLeft(input) { case (acc, (k, s)) =>
        acc.replace(s"<extra_id_$k>", s)
      }
      assert(rebuilt === orig(id), s"doc $id round-trip")
      assert(nSpans === (orig(id).split(" ").length + 2) / 3)
    }
    // maskPct = 0: input is the original text, target empty
    val none = CorpusOps.spanCorrupt(docs, "doc_id", "toks", 3, 0)
      .select("doc_id", "n_masked", "input_text", "target_text")
      .as[(Long, Long, String, String)].collect()
    none.foreach { case (id, m, in, tgt) =>
      assert(m === 0L && in === orig(id) && tgt === "")
    }
    spark.catalog.clearCache()
  }
}
