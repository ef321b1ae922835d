package graft

import org.apache.spark.sql.functions.{col, lit}
import graft.operators.Sketches

/** KMV distinct-count sketch vs a pure-JVM replica of the shared
  * md5-derived hash, plus the estimator's accuracy and exact-fallback
  * contracts. */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  /** Same 60-bit hash the operator and the SQL oracle use. */
  private def h60(key: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  test("kth_hash is exactly the k-th smallest distinct hash per group") {
    val k = 8
    val df = (0L until 100L).map(i => ("g", i)).toDF("grp", "key")
    val row = Sketches.kmvDistinct(df, "grp", "key", k).collect().head
    val expectedKth = (0L until 100L).map(i => h60(i.toString)).distinct.sorted.apply(k - 1)
    assert(row.getAs[Long]("kth_hash") === expectedKth)
    assert(row.getAs[Long]("n_exact") === 100L)
    val expectedEst = Math.scalb((k - 1).toDouble, 60) / expectedKth.toDouble
    assert(row.getAs[Double]("kmv_estimate") === expectedEst)
  }

  test("estimator falls back to the exact count below k distinct keys") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("g", 3L)).toDF("grp", "key")
    val row = Sketches.kmvDistinct(df, "grp", "key", k = 16).collect().head
    assert(row.getAs[Long]("n_exact") === 3L)
    assert(row.getAs[Double]("kmv_estimate") === 3.0)
  }

  test("estimate lands within the expected error band (k=64, n=2000)") {
    val df = (0L until 2000L).map(i => ("g", i)).toDF("grp", "key")
    val row = Sketches.kmvDistinct(df, "grp", "key", k = 64).collect().head
    val est = row.getAs[Double]("kmv_estimate")
    // stderr ≈ n/sqrt(k−2) ≈ 254; assert a generous 4σ band so the test
    // can only fail on a broken estimator, not an unlucky hash draw
    // (the hash is fixed, so this is deterministic anyway — the band
    // documents the contract)
    assert(est > 1000.0 && est < 3000.0, s"estimate $est out of band")
  }

  test("k-min absorption is order-insensitive, idempotent, and bounded " +
    "over random batch splits (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(0, 200)
      hashes <- Gen.listOfN(n, Gen.choose(0L, 1000L)) // collisions likely
      cuts <- Gen.listOfN(3, Gen.choose(0, math.max(n, 1)))
    } yield (hashes, cuts.sorted)
    for (s <- 1 to 50) {
      val (hashes, cuts) = gen.apply(Gen.Parameters.default, Seed(s.toLong)).get
      val k = 8
      val whole = graft.streaming.SketchStream.absorb(Nil, hashes, k)
      // any split into sequential batches gives the same sketch
      val parts = (List(0) ++ cuts ++ List(hashes.length)).distinct.sorted
        .sliding(2).map { case List(a, b) => hashes.slice(a, b) }.toList
      val folded = parts.foldLeft(List.empty[Long])(
        (st, batch) => graft.streaming.SketchStream.absorb(st, batch, k))
      assert(folded === whole, s"seed=$s split=$parts")
      // shuffled delivery gives the same sketch
      val shuffled = graft.streaming.SketchStream
        .absorb(Nil, new scala.util.Random(s).shuffle(hashes), k)
      assert(shuffled === whole, s"seed=$s shuffle")
      // redelivery (idempotence) and boundedness
      assert(graft.streaming.SketchStream.absorb(whole, hashes, k) === whole)
      assert(whole.size <= k && whole === whole.distinct.sorted)
    }
  }

  test("merging per-group sketches equals sketching the union from scratch") {
    val k = 8
    val df = ((0L until 60L).map(i => ("a", i)) ++
      (40L until 120L).map(i => ("b", i)) ++     // overlaps group a
      (500L until 600L).map(i => ("c", i)))       // excluded group
      .toDF("grp", "key")
    val merged = Sketches.kmvMergedEstimate(df, "grp", "key", k,
      include = Seq("a", "b")).collect().head
    val fromScratch = Sketches.kmvDistinctSketch(
      df.filter(col("grp") =!= "c").withColumn("grp", lit("u")),
      "grp", "key", k).collect().head
    assert(merged.getAs[Long]("kth_hash") ===
      fromScratch.getAs[Long]("kth_hash"))
    assert(merged.getAs[Double]("kmv_estimate") ===
      fromScratch.getAs[Double]("kmv_estimate"))
  }

  test("groups are independent: per-group kth differs from pooled kth") {
    val df = ((0L until 50L).map(i => ("a", i)) ++
      (1000L until 1050L).map(i => ("b", i))).toDF("grp", "key")
    val rows = Sketches.kmvDistinct(df, "grp", "key", k = 8)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("kth_hash")).toMap
    val kthA = (0L until 50L).map(i => h60(i.toString)).sorted.apply(7)
    val kthB = (1000L until 1050L).map(i => h60(i.toString)).sorted.apply(7)
    assert(rows("a") === kthA)
    assert(rows("b") === kthB)
  }

  test("quantile sketch reads quantiles off the hash-chosen sample") {
    // values 0..99 in group g; the k=16 sample is the 16 ids with the
    // smallest salted hashes — replicate it in plain JVM and take the
    // same ceil(p*n) discrete quantiles
    val df = (0L until 100L).map(i => ("g", i, i.toDouble))
      .toDF("grp", "id", "v")
    val out = Sketches.kmvQuantileSketch(df, "grp", "id", "v", k = 16)
      .collect().head
    val sampleVals = (0L until 100L)
      .sortBy(i => (h60(s"qs:$i"), i)).take(16).map(_.toDouble).sorted
    def disc(p: Double) = sampleVals(math.ceil(p * 16).toInt - 1)
    assert(out.getAs[Long]("n") === 100L)
    assert(out.getAs[Long]("n_sampled") === 16L)
    assert(out.getAs[Double]("p50_est") === disc(0.5))
    assert(out.getAs[Double]("p90_est") === disc(0.9))
    assert(out.getAs[Double]("p99_est") === disc(0.99))
    // exact side: ceil convention over the full 0..99 population
    assert(out.getAs[Double]("p50_exact") === 49.0)
    assert(out.getAs[Double]("p90_exact") === 89.0)
    assert(out.getAs[Double]("p99_exact") === 98.0)
    // mergeability: the k-min sample of a union is recoverable from the
    // two sides' k-min samples — same sketch whether built whole or
    // from halves
    val halves = (0L until 100L).map { i =>
      (if (i % 2 == 0) "h0" else "h1", i, i.toDouble)
    }.toDF("grp", "id", "v")
    val perHalf = Sketches.kmvQuantileSketch(halves, "grp", "id", "v", k = 16)
    val unionSample = (0L until 100L)
      .groupBy(_ % 2).values.flatMap(
        _.sortBy(i => (h60(s"qs:$i"), i)).take(16))
      .toSeq.sortBy(i => (h60(s"qs:$i"), i)).take(16).map(_.toDouble).sorted
    assert(perHalf.count() === 2L)
    assert(unionSample === sampleVals) // absorption: union of k-mins ⊇ k-min of union
  }

  test("count-min estimate never undercounts and is exact without collisions") {
    import spark.implicits._
    val keys = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = keys.toDF("k")
    val hh = Sketches.heavyHitters(df, "k", k = 3, depth = 4, width = 1024)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("exact"), r.getAs[Long]("cms_est"))).toMap
    assert(hh("alpha")._1 === 5L && hh("beta")._1 === 3L)
    // est >= exact always; with 3 keys in 1024 buckets x 4 rows, the
    // min over rows collides with nothing → exact
    assert(hh.values.forall { case (e, c) => c >= e })
    assert(hh.values.forall { case (e, c) => c === e })
  }

  test("count-min tables merge cell-wise: sum of halves equals the whole") {
    import spark.implicits._
    val a = Seq("x", "y", "x", "z").toDF("k")
    val b = Seq("y", "y", "w").toDF("k")
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsTable(df, "k", depth = 3, width = 64).collect()
        .map(r => (r.getAs[Int]("d"), r.getAs[Long]("b")) -> r.getAs[Long]("c"))
        .toMap
    val whole = cells(a.unionByName(b))
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(whole === merged)
  }

  test("hll registers match a plain-Scala rebuild and estimate within 5%") {
    import spark.implicits._
    val n = 3000
    val df = (0 until n).map(i => ("g", s"u$i")).toDF("grp", "k")
    val p = 8
    val lowBits = 60 - p
    val regs = Sketches.hllRegisters(df, "grp", "k", p).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("register")).toMap
    // plain-Scala oracle over the same md5 hash
    val expect = (0 until n).map { i =>
      val h = h60(s"u$i")
      val rest = h & ((1L << lowBits) - 1)
      val rho = if (rest == 0) lowBits + 1
        else lowBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      (h >>> lowBits) -> rho.toLong
    }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(regs === expect)
    // the float estimate (spec-only — engine output stays integral):
    // alpha_m * m^2 / sum(2^-reg), with the empty-bucket registers at 0
    val m = 1 << p
    val alpha = 0.7213 / (1 + 1.079 / m)
    val harm = (0 until m).map(b => math.pow(2.0, -regs.getOrElse(b.toLong, 0L).toDouble)).sum
    val est = alpha * m * m / harm
    assert(math.abs(est - n) < 0.05 * n, s"estimate $est vs exact $n")
  }

  test("hll merge by cell-wise max is lossless vs the whole-corpus build") {
    import spark.implicits._
    val df = (0 until 500)
      .map(i => ("g", i.toString, i.toLong)).toDF("grp", "k", "id")
    val merged = Sketches.hllMerged(df, "grp", "k", "id", p = 8)
    assert(merged.count() > 0)
    assert(merged.filter(!col("agree")).count() === 0L)
    // merged register table == direct register table, cell for cell
    val direct = Sketches.hllRegisters(df, "grp", "k", p = 8).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("register")).toMap
    val viaMerge = merged.collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("register_merged")).toMap
    assert(viaMerge === direct)
  }
}
