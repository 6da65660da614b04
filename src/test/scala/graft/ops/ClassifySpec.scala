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
