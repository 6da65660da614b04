package graft.ops

import graft.SparkSpec
import graft.functions.Hashes
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def featDf(rows: Seq[(Long, Seq[String], String)]) =
    rows.toDF("id", "toks", "dom")
      .withColumn("f", transform(col("toks"), t => Hashes.h60(t)))

  test("nbDomain: disjoint vocabularies classify perfectly with positive margin") {
    // three classes, three disjoint vocabularies — NB must recover every
    // doc's own class (in-sample domain tagging, the CCNet role)
    val vocab = Map(
      "a" -> Seq("alpha", "beta", "gamma"),
      "b" -> Seq("delta", "epsilon", "zeta"),
      "c" -> Seq("eta", "theta", "iota"))
    val rows = (0 until 30).map { i =>
      val dom = Seq("a", "b", "c")(i % 3)
      (i.toLong, vocab(dom) ++ vocab(dom).take(i % 2 + 1), dom)
    }
    val out = Classify.nbDomain(featDf(rows), "id", col("f"), "dom", buckets = 64)
      .select("id", "dom", "pred_label", "margin")
      .as[(Long, String, String, Double)].collect()
    assert(out.length === 30)
    assert(out.forall { case (_, dom, pred, _) => pred === dom },
      s"every doc tagged with its own class: ${out.filterNot(r => r._2 == r._3).toSeq}")
    assert(out.forall(_._4 > 0), "disjoint vocab ⇒ strictly positive margin")
    spark.catalog.clearCache()
  }

  test("nbDomain: unseen-vocab doc ties break to the smaller class label; empty doc absent") {
    // classes sized EQUALLY so an all-unseen-bucket doc scores identically
    // under both classes (same tot_c, same prior) — the tie must go to the
    // lexicographically smaller label, deterministically
    val rows = Seq(
      (0L, Seq("alpha", "beta"), "x"),
      (1L, Seq("alpha", "beta"), "x"),
      (2L, Seq("gamma", "delta"), "y"),
      (3L, Seq("gamma", "delta"), "y"),
      (4L, Seq("omega", "psi"), "y"), // vocab unseen elsewhere — but class y's OWN counts see it
      (5L, Seq.empty[String], "x")) // zero features: unscorable, absent
    // doc 4's features ARE in class y's training counts (in-sample), so it
    // predicts y; the true tie case needs a vocab absent from training —
    // score a doc set where classes have identical counts per bucket
    val sym = Seq(
      (0L, Seq("alpha"), "x"), (1L, Seq("alpha"), "y"),
      (2L, Seq("beta", "beta"), "x"), (3L, Seq("beta", "beta"), "y"))
    val symOut = Classify.nbDomain(featDf(sym), "id", col("f"), "dom", buckets = 64)
      .select("id", "pred_label").as[(Long, String)].collect().toMap
    // perfectly symmetric classes: every doc ties → smaller label "x" wins
    assert(symOut.values.toSet === Set("x"),
      s"symmetric counts must tie-break to 'x': $symOut")
    val out = Classify.nbDomain(featDf(rows), "id", col("f"), "dom", buckets = 64)
    assert(out.select("id").as[Long].collect().toSet === Set(0L, 1L, 2L, 3L, 4L),
      "empty-feature doc is absent")
    spark.catalog.clearCache()
  }

  test("nbDomain: scores are invariant under repartitioning and match the closed form") {
    val rows = (0 until 12).map { i =>
      val dom = if (i < 8) "p" else "q"
      val toks = if (i < 8) Seq("aa", "bb", "aa") else Seq("cc", "dd")
      (i.toLong, toks, dom)
    }
    val df = featDf(rows)
    val a = Classify.nbDomain(df, "id", col("f"), "dom", buckets = 32)
      .collect().toSeq
    val b = Classify.nbDomain(df.repartition(7), "id", col("f"), "dom", buckets = 32)
      .collect().toSeq
    assert(a === b, "bit-identical under repartitioning")
    // closed form for doc 0 (class p): prior ln(8/12) + 3 occurrence terms,
    // each ln rounded to 6 BEFORE the sum — replicate exactly
    val bkts = Seq("aa", "bb", "aa").map { t =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(15), 16) % 32
    }
    val cntP = bkts.groupBy(identity).map { case (b, o) => b -> o.size * 8 } // 8 identical docs
    val totP = 8 * 3 // class p: 8 docs × 3 occurrences
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expect = (r6(math.log(8.0 / 12.0)) +
      bkts.map(b => r6(math.log((cntP(b) + 1.0) / (totP + 32)))).sum).toDouble
    val got = a.find(_.getLong(0) == 0L).get.getAs[Double]("nb_score")
    assert(math.abs(got - expect) < 1e-9, s"closed form: $got vs $expect")
    spark.catalog.clearCache()
  }

  test("nbDomain: fewer than two classes raises") {
    val df = featDf(Seq((0L, Seq("a"), "only"), (1L, Seq("b"), "only")))
    val e = intercept[IllegalArgumentException] {
      Classify.nbDomain(df, "id", col("f"), "dom", buckets = 16)
    }
    assert(e.getMessage.contains("2 classes"))
  }

  test("nbScore: collected-model zero-shuffle path equals the relational path bit-for-bit") {
    val rows = (0 until 24).map { i =>
      val dom = Seq("a", "b", "c")(i % 3)
      val toks = dom match {
        case "a" => Seq("alpha", "beta", "shared")
        case "b" => Seq("delta", "shared", "shared")
        case _   => Seq("eta", "theta", "iota", "shared")
      }
      (i.toLong, toks ++ toks.take(i % 3), dom)
    }
    val df = featDf(rows)
    val relational = Classify.nbDomain(df, "id", col("f"), "dom", buckets = 64)
      .collect().toSeq
    val model = Classify.nbTrain(df, col("f"), "dom", buckets = 64)
    val viaMap = df
      .select(col("id"), col("dom"), Classify.nbScore(model, col("f")).as("r"))
      .select(col("id"), col("dom"), col("r.pred_label").as("pred_label"),
        col("r.nb_score").as("nb_score"), col("r.margin").as("margin"))
      .orderBy("id").collect().toSeq
    assert(relational === viaMap,
      "the scale path changes the plan, not the result")
    spark.catalog.clearCache()
  }

  test("nbScore parity: priors count featureless docs exactly as the relational path") {
    // ADVICE r11 (the one contract both paths share): TRAINING sees the
    // UNFILTERED frame — a zero-feature doc still shifts every prior
    // ln(n_c/N), in nbDomain, nbTrain, and the DuckDB oracle alike; only
    // SCORING drops it (no feature rows ⇒ absent from the result).
    val rows = Seq(
      (0L, Seq("alpha", "beta"), "x"),
      (1L, Seq("alpha"), "x"),
      (2L, Seq("gamma", "delta"), "y"),
      (3L, Seq("gamma"), "y"),
      (4L, Seq.empty[String], "y")) // featureless: in priors, not in output
    val df = featDf(rows)
    val relational = Classify.nbDomain(df, "id", col("f"), "dom", buckets = 64)
      .collect().toSeq
    val model = Classify.nbTrain(df, col("f"), "dom", buckets = 64)
    // the prior must count doc 4: ln(2/5)/ln(3/5) micros, not ln(2/4)/ln(2/4)
    assert(model.labels === Seq("x", "y"))
    assert(model.priorsMicro === Seq(-916291L, -510826L),
      "priors over ALL docs (rounded-6 ln micros of 2/5 and 3/5)")
    val viaMap = df.where(size(col("f")) > 0)
      .select(col("id"), col("dom"), Classify.nbScore(model, col("f")).as("r"))
      .select(col("id"), col("dom"), col("r.pred_label").as("pred_label"),
        col("r.nb_score").as("nb_score"), col("r.margin").as("margin"))
      .orderBy("id").collect().toSeq
    assert(relational === viaMap,
      "featureless docs shift priors for BOTH paths or neither")
    spark.catalog.clearCache()
  }

  test("nbDomain: null label raises the intended diagnostic, not an opaque NPE") {
    // ADVICE r11: the null check must run BEFORE the sort — Arrays.sort
    // on a null element would throw an NPE and mask this message
    val rows = Seq(
      (0L, Seq("a"), "x"), (1L, Seq("b"), null.asInstanceOf[String]),
      (2L, Seq("c"), "y"))
    val e = intercept[IllegalArgumentException] {
      Classify.nbDomain(featDf(rows), "id", col("f"), "dom", buckets = 16)
    }
    assert(e.getMessage.contains("null label"))
  }

  test("nbScore: stateless streaming scoring equals batch (stream of docs, static model)") {
    import org.apache.spark.sql.streaming.Trigger
    val rows = (0 until 18).map { i =>
      val dom = if (i % 2 == 0) "even" else "odd"
      val toks = if (i % 2 == 0) Seq("pair", "deux") else Seq("impair", "un")
      (i.toLong, toks, dom)
    }
    val df = featDf(rows).select("id", "dom", "f")
    val dir = tempDir("nbStream").toString
    df.repartition(3).write.mode("overwrite").parquet(dir)
    val model = Classify.nbTrain(spark.read.parquet(dir), col("f"), "dom", 64)
    def scoreCols(d: org.apache.spark.sql.DataFrame) = d
      .select(col("id"), col("dom"), Classify.nbScore(model, col("f")).as("r"))
      .select(col("id"), col("dom"), col("r.pred_label").as("pred_label"),
        col("r.nb_score").as("nb_score"), col("r.margin").as("margin"))
    val stream = scoreCols(spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir))
    val q = stream.writeStream.format("memory").queryName("nb_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate")
    val streamed = spark.table("nb_stream").orderBy("id").collect().toSeq
    val batch = scoreCols(spark.read.parquet(dir)).orderBy("id").collect().toSeq
    assert(streamed === batch,
      "nbScore is a pure column expression — stateless, watermark-free")
    assert(streamed.forall(r => r.getAs[String]("pred_label") ==
      r.getAs[String]("dom")), "disjoint vocab classifies perfectly")
    spark.catalog.clearCache()
  }

  test("domainDivergence: identical distributions give 0, disjoint give positive, repartition-stable") {
    // classes "same1"/"same2" share an identical token multiset → every
    // smoothed bucket mass matches → KL exactly 0 both ways; "other" is
    // disjoint vocab → strictly positive divergence against both
    val rows =
      (0 until 5).map(i => (i.toLong, Seq("aa", "bb", "aa"), "same1")) ++
      (5 until 10).map(i => (i.toLong, Seq("aa", "bb", "aa"), "same2")) ++
      (10 until 15).map(i => (i.toLong, Seq("cc", "dd"), "other"))
    val df = featDf(rows)
    val out = Classify.domainDivergence(df, col("f"), "dom", buckets = 64)
      .select("label_a", "label_b", "kl_ab", "kl_ba")
      .as[(String, String, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ===
      Seq(("other", "same1"), ("other", "same2"), ("same1", "same2")))
    val m = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m(("same1", "same2")) === ((0.0, 0.0)),
      "identical distributions diverge by exactly zero")
    assert(m(("other", "same1"))._1 > 0 && m(("other", "same1"))._2 > 0)
    // Gibbs: KL is non-negative everywhere (up to the 1e-6 rounding grain)
    assert(out.forall(r => r._3 >= -1e-6 && r._4 >= -1e-6))
    val again = Classify.domainDivergence(df.repartition(7), col("f"), "dom",
      buckets = 64).collect().toSeq
    assert(Classify.domainDivergence(df, col("f"), "dom", buckets = 64)
      .collect().toSeq === again, "bit-identical under repartitioning")
  }

  test("clusterRepresentatives: argmax by score, ties to smaller id, sizes exact") {
    val members = Seq(
      (10L, 10L, 0.5), (10L, 11L, 0.9), (10L, 12L, 0.9), // tie at 0.9 → id 11
      (20L, 20L, 0.3), (20L, 21L, 0.1))
      .toDF("component", "id", "quality")
    val out = Dedup.clusterRepresentatives(members, "component", "id", "quality")
      .orderBy("component")
      .select("component", "rep_id", "rep_score", "n_members")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out === Seq((10L, 11L, 0.9, 3L), (20L, 20L, 0.3, 2L)))
  }
}
