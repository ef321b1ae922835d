package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation
import graft.operators.Curation.GopherThresholds

/** Curation tier: Gopher rule filter, CCNet perplexity buckets,
  * cross-source minhash overlap. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")

  // ---- gopherRules -------------------------------------------------

  test("gopher rules: each signal is exact integer milli-units") {
    val d = docs((1L, "the a the xx", "en", "s0"))
    val r = Curation.gopherRules(d).collect().head
    assert(r.getAs[Long]("n_words") === 4L)
    // (1000 * (3+1+3+2)) div 4 = 2250
    assert(r.getAs[Long]("mwl_milli") === 2250L)
    assert(r.getAs[Long]("stop_hits") === 3L)
    // 3 distinct of 4 → 750
    assert(r.getAs[Long]("distinct_milli") === 750L)
  }

  test("gopher rules: keep is the conjunction and every rule can fail") {
    val t = GopherThresholds(minWords = 2, maxWords = 4, minMwlMilli = 1000,
      maxMwlMilli = 9000, minStopHits = 1, minDistinctMilli = 500)
    val d = docs(
      (1L, "the cat sat", "en", "s0"),         // keeps
      (2L, "x", "en", "s0"),                   // r_words fails (1 word)
      (3L, "the the the", "en", "s0"),         // r_distinct fails (333)
      (4L, "cat dog fox", "en", "s0"))         // r_stop fails (0 hits)
    val out = Curation.gopherRules(d, t)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  // ---- pplBuckets --------------------------------------------------

  test("ppl buckets: equal-frequency per language, bucket 1 is the head") {
    // 4 docs per lang with increasingly repetitive (= more probable)
    // bigrams; nb=2 must split each lang exactly in half.
    val d = docs(
      (1L, "a b c d e f", "en", "s"), (2L, "a b a b a b", "en", "s"),
      (3L, "g h i j k l", "en", "s"), (4L, "g h g h g h", "en", "s"),
      (5L, "m n o p q r", "de", "s"), (6L, "m n m n m n", "de", "s"))
    val out = Curation.pplBuckets(d, nb = 2)
    val rows = out.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"),
        r.getAs[Long]("n_lang"))).toSeq.sortBy(_._1)
    assert(rows.map(_._3).distinct.sorted === Seq(2L, 4L))
    // per lang: half in bucket 1 (head = higher avg_pmilli), half in 2
    val en = rows.filter(r => Seq(1L, 2L, 3L, 4L).contains(r._1))
    assert(en.count(_._2 == 1L) === 2 && en.count(_._2 == 2L) === 2)
    val de = rows.filter(r => Seq(5L, 6L).contains(r._1))
    assert(de.count(_._2 == 1L) === 1 && de.count(_._2 == 2L) === 1)
  }

  test("ppl buckets: rank is a dense global rank per language") {
    val d = docs((1L, "a b c", "en", "s"), (2L, "a b c", "en", "s"),
      (3L, "a b c d", "en", "s"), (4L, "x y", "de", "s"))
    val out = Curation.pplBuckets(d, nb = 2)
      .select("lang", "rnk").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(out("en") === Seq(1L, 2L, 3L))
    assert(out("de") === Seq(1L))
  }

  // ---- sourceOverlap -----------------------------------------------

  test("source overlap: identical sources estimate 1000, disjoint 0") {
    val d = docs(
      (1L, "a b c d e f g h", "en", "sA"),
      (2L, "a b c d e f g h", "en", "sB"),   // sB == sA exactly
      (3L, "q r s t u v w x", "en", "sC"))   // sC disjoint
    val out = Curation.sourceOverlap(d, m = 16).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("jaccard_milli"), r.getAs[Long]("est_milli"),
          r.getAs[Long]("matches"))).toMap
    assert(out(("sA", "sB")) === ((1000L, 1000L, 16L)))
    assert(out(("sA", "sC"))._1 === 0L)
    assert(out(("sA", "sC"))._2 === 0L)
    assert(out.size === 3)
  }

  test("source overlap: exact columns agree with a hand count") {
    // sA: grams of "a b c d" = {a b c, b c d}; sB: "b c d e" =
    // {b c d, c d e}; inter = 1, union = 3 → 333 milli.
    val d = docs((1L, "a b c d", "en", "sA"), (2L, "b c d e", "en", "sB"))
    val r = Curation.sourceOverlap(d, m = 16).collect().head
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("inter") === 1L)
    assert(r.getAs[Long]("union_n") === 3L)
    assert(r.getAs[Long]("jaccard_milli") === 333L)
  }

  test("source overlap: short docs fall back to a whole-text shingle") {
    val d = docs((1L, "a b", "en", "sA"), (2L, "a b", "en", "sB"))
    val r = Curation.sourceOverlap(d, m = 8).collect().head
    assert(r.getAs[Long]("jaccard_milli") === 1000L)
    assert(r.getAs[Long]("est_milli") === 1000L)
  }

  test("source overlap production path drops the gram-keyed exact join") {
    val d = docs(
      (1L, "a b c d e f g h", "en", "sA"),
      (2L, "a b c d e f g h", "en", "sB"),
      (3L, "q r s t u v w x", "en", "sC"))
    val prod = Curation.sourceOverlap(d, m = 16, validate = false)
    // sketch columns only — no exact intersection/jaccard in the schema
    assert(prod.columns.toSeq ===
      Seq("src_a", "src_b", "n_a", "n_b", "matches", "est_milli"))
    // and no corpus-scale join: no physical join node may key on the
    // gram column (the validation join is the only gram-keyed one)
    val joinLines = prod.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.nonEmpty && joinLines.forall(!_.contains("gram#")),
      s"production path must not join on grams:\n${joinLines.mkString("\n")}")
    // sketch columns agree with the validating run
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
    val sketchOf = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("matches"), r.getAs[Long]("est_milli"))
    val p = prod.collect().map(r => key(r) -> sketchOf(r)).toMap
    val v = Curation.sourceOverlap(d, m = 16).collect()
      .map(r => key(r) -> sketchOf(r)).toMap
    assert(p === v)
  }

  // ---- shardBalance ------------------------------------------------

  test("shard balance: serpentine deal matches the hand rule") {
    // 8 docs with distinct sizes, 2 shards → ranks 1..8, positions
    // 0..3 repeating: shards 0,1,1,0, 0,1,1,0
    val d = (1L to 8L).map(i =>
      (i, Seq.fill(20 - i.toInt)("w").mkString(" "), "en", "s"))
    val out = Curation.shardBalance(docs(d: _*), shards = 2).collect()
      .map(r => r.getAs[Long]("rnk") -> r.getAs[Long]("shard")).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 0L, 6L -> 1L, 7L -> 1L, 8L -> 0L))
  }

  test("shard balance: token mass spread stays within the largest doc") {
    val d = (1L to 40L).map(i =>
      (i, Seq.fill(((i * 7) % 23 + 3).toInt)("w").mkString(" "), "en", "s"))
    val out = Curation.shardBalance(docs(d: _*), shards = 4).collect()
    val mass = out.groupBy(_.getAs[Long]("shard")).view
      .mapValues(_.map(_.getAs[Long]("tokens")).sum).toMap
    assert(mass.keySet === Set(0L, 1L, 2L, 3L))
    val maxDoc = out.map(_.getAs[Long]("tokens")).max
    assert(mass.values.max - mass.values.min <= maxDoc,
      s"serpentine imbalance ${mass.values.max - mass.values.min} " +
        s"exceeds the largest document $maxDoc")
  }

  test("shard balance: ranks are a contiguous global permutation") {
    val d = (1L to 9L).map(i => (i, "a b c", "en", "s"))
    val out = Curation.shardBalance(docs(d: _*), shards = 3).collect()
    assert(out.map(_.getAs[Long]("rnk")).sorted.toSeq === (1L to 9L))
  }

  // ---- perceptron --------------------------------------------------

  test("perceptron features: hashed counts plus one bias row per doc") {
    val d = docs((1L, "a b a", "en", "s0"))
    val f = Curation.perceptronFeatures(d, buckets = 8).collect()
      .map(r => (r.getAs[Long]("b"), r.getAs[Long]("x")))
    // bias row at bucket 8 with x = 1; token rows sum to 3
    assert(f.count(_._1 == 8L) === 1)
    assert(f.filter(_._1 == 8L).head._2 === 1L)
    assert(f.filter(_._1 < 8L).map(_._2).sum === 3L)
  }

  test("perceptron round 1 equals sum of y·x over all docs (w0 = 0)") {
    val d = docs((1L, "the the cat", "en", "s0"),   // y = +1 (2 stops)
      (2L, "cat dog fox", "en", "s0"))              // y = -1
    val cfg = Curation.PerceptronConfig(buckets = 8, rounds = 1)
    val w = Curation.perceptronWeights(d, cfg).collect()
      .map(r => r.getAs[Long]("b") -> r.getAs[Long]("w")).toMap
    val f = Curation.perceptronFeatures(d, 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("b"),
        r.getAs[Long]("x")))
    val y = Map(1L -> 1L, 2L -> -1L)
    val expected = f.groupBy(_._2).view
      .mapValues(_.map(t => y(t._1) * t._3).sum).toMap
    assert(w === expected)
  }

  test("perceptron: extra rounds only update on misclassified docs") {
    // Linearly separable: the stop-word bucket count separates; by
    // some round the weights stop changing (all margins correct).
    val d = docs(
      (1L, "the the x", "en", "s"), (2L, "the the y", "en", "s"),
      (3L, "x y z", "en", "s"), (4L, "p q r", "en", "s"))
    def weights(r: Int) = Curation
      .perceptronWeights(d, Curation.PerceptronConfig(8, r)).collect()
      .map(x => x.getAs[Long]("b") -> x.getAs[Long]("w")).toMap
    val scored = Curation.perceptronScore(d, Curation.PerceptronConfig(8, 6))
    val acc = scored.filter(col("correct")).count()
    assert(acc === 4L) // converged on a separable fixture
    assert(weights(6) === weights(7)) // fixed point once separated
  }

  test("perceptron score: margin is the integer dot and pred its sign") {
    val d = docs((1L, "the the b", "en", "s0"))
    val cfg = Curation.PerceptronConfig(buckets = 8, rounds = 2)
    val r = Curation.perceptronScore(d, cfg).collect().head
    assert(r.getAs[Long]("y") === 1L)
    assert(r.getAs[Long]("pred") === (if (r.getAs[Long]("margin") >= 0) 1L else -1L))
    assert(r.getAs[Boolean]("correct") === (r.getAs[Long]("pred") == 1L))
  }
}
