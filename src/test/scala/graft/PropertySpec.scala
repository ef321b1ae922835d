package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.MatrixOps

/** Algebraic property tests (FIXTURES.md §B.4) — the equivalences the
  * reference's four kernels implicitly claim but never assert
  * (SURVEY.md §5). Values are integral so every summation order agrees
  * bit-for-bit (R2/R3). Generators run under fixed seeds so failures
  * reproduce. */
class PropertySpec extends SparkSpec {

  private val matrixGen: Gen[Seq[(Long, Long, Double)]] = for {
    n <- Gen.choose(2, 8)
    count <- Gen.choose(n, n * n)
    entries <- Gen.listOfN(count,
      for {
        i <- Gen.choose(0L, n - 1L)
        j <- Gen.choose(0L, n - 1L)
        v <- Gen.choose(1, 9)
      } yield (i, j, v.toDouble))
  } yield entries

  /** Deterministic sampling: seeds 1..n. */
  private def samples(n: Int): Seq[Seq[(Long, Long, Double)]] =
    (1 to n).flatMap(s =>
      matrixGen.apply(Gen.Parameters.default, Seed(s.toLong)))

  test("block hash ignores non-sampled bytes and is deterministic (property)") {
    // the structural claim behind the perceptual hash's robustness: the
    // stride downsample means only positions ≡ 0 (mod stride) exist for
    // the fingerprint — mutating any OTHER byte cannot move a single
    // bit, while mutating a sampled byte changes at most its block sum
    // and the global mean
    val byteGen = for {
      len <- Gen.choose(300, 2000) // forces stride > 1 (4·60 = 240 cap)
      bytes <- Gen.listOfN(len, Gen.choose(32, 126))
    } yield bytes.map(_.toByte).toArray
    for (s <- 1 to 40; bytes <- byteGen(Gen.Parameters.default, Seed(s.toLong))) {
      val bits = graft.operators.Multimodal.PhashBits
      val h0 = graft.operators.Multimodal.StubCodec.blockHash(bytes, bits)
      // deterministic
      assert(graft.operators.Multimodal.StubCodec.blockHash(bytes.clone(), bits) === h0)
      val stride = (bytes.length + 4 * bits - 1) / (4 * bits)
      assert(stride > 1)
      // first non-sampled index; mutate it → hash identical
      val idx = 1 // 1 % stride != 0 because stride > 1
      val mutated = bytes.clone()
      mutated(idx) = (mutated(idx) ^ 0x55).toByte
      assert(graft.operators.Multimodal.StubCodec.blockHash(mutated, bits) === h0,
        s"seed=$s len=${bytes.length} stride=$stride")
    }
  }

  private def toDF(entries: Seq[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    // pre-sum duplicate coordinates (fromTable contract, SURVEY Q3)
    MatrixOps.fromTable(entries.toDF("i", "j", "v"), col("i"), col("j"), col("v"))
  }

  private def dim(es: Seq[(Long, Long, Double)]*): Long =
    es.flatten.flatMap(e => Seq(e._1, e._2)).max + 1

  test("basic == transposed == blocked on random integral matrices (M1=M2=M3)") {
    for (Seq(ae, be) <- samples(10).grouped(2)) {
      val (a, b) = (toDF(ae), toDF(be))
      val basic = cells(MatrixOps.multiply(a, b))
      assert(cells(MatrixOps.multiplyTransposed(a, MatrixOps.transpose(b))) === basic)
      assert(cells(MatrixOps.multiplyBlocked(spark, a, b, dim(ae, be), 4)) ===
        basic.filter(_._3 != 0.0))
    }
  }

  /** Rectangular m×k and k×n coordinate matrices with genuinely
    * distinct dims — nothing in the coordinate form is square-bound
    * (the restriction was the REFERENCE's, SURVEY §1.1a). */
  private val rectPairGen: Gen[(Seq[(Long, Long, Double)], Seq[(Long, Long, Double)])] =
    for {
      m <- Gen.choose(2, 7)
      k <- Gen.choose(2, 7)
      n <- Gen.choose(2, 7)
      ca <- Gen.choose(m, m * k)
      cb <- Gen.choose(k, k * n)
      aEntries <- Gen.listOfN(ca, for {
        i <- Gen.choose(0L, m - 1L); j <- Gen.choose(0L, k - 1L)
        v <- Gen.choose(1, 9)
      } yield (i, j, v.toDouble))
      bEntries <- Gen.listOfN(cb, for {
        i <- Gen.choose(0L, k - 1L); j <- Gen.choose(0L, n - 1L)
        v <- Gen.choose(1, 9)
      } yield (i, j, v.toDouble))
    } yield (aEntries, bEntries)

  /** Plain-Scala oracle: pre-sum duplicates, then contract on k. */
  private def localMultiply(ae: Seq[(Long, Long, Double)],
                            be: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] = {
    def presum(es: Seq[(Long, Long, Double)]) =
      es.groupBy(e => (e._1, e._2)).map { case (ij, g) => (ij, g.map(_._3).sum) }
    val bm = presum(be).toSeq.groupBy(_._1._1)
    presum(ae).toSeq
      .flatMap { case ((i, k), va) =>
        bm.getOrElse(k, Nil).map { case ((_, j), vb) => ((i, j), va * vb) } }
      .groupBy(_._1).map { case ((i, j), g) => (i, j, g.map(_._2).sum) }
      .toSeq.sorted
  }

  test("rectangular m×k · k×n: multiply == Scala oracle == blocked == transposed") {
    for (s <- 1 to 6) {
      val (ae, be) = rectPairGen(Gen.Parameters.default, Seed(100L + s)).get
      val (a, b) = (toDF(ae), toDF(be))
      val expected = localMultiply(ae, be)
      assert(cells(MatrixOps.multiply(a, b)) === expected)
      assert(cells(MatrixOps.multiplyTransposed(a, MatrixOps.transpose(b))) === expected)
      // block size 4 does NOT divide the dims for most samples —
      // boundary blocks zero-pad implicitly in coordinate form
      assert(cells(MatrixOps.multiplyBlocked(spark, a, b, dim(ae, be), 4)) ===
        expected.filter(_._3 != 0.0))
    }
  }

  test("A x I == A and I x A == A") {
    for (ae <- samples(5)) {
      val a = toDF(ae)
      val id = MatrixOps.identity(spark, dim(ae))
      assert(cells(MatrixOps.multiply(a, id)) === cells(a))
      assert(cells(MatrixOps.multiply(id, a)) === cells(a))
    }
  }

  test("(A x B)^T == B^T x A^T") {
    for (Seq(ae, be) <- samples(10).grouped(2)) {
      val (a, b) = (toDF(ae), toDF(be))
      val lhs = cells(MatrixOps.transpose(MatrixOps.multiply(a, b)))
      val rhs = cells(MatrixOps.multiply(MatrixOps.transpose(b), MatrixOps.transpose(a)))
      assert(lhs === rhs)
    }
  }

  test("duplicate-coordinate accumulation matches a Scala-side oracle (Q3)") {
    import spark.implicits._
    for (ae <- samples(5)) {
      val dup = ae ++ ae.take(ae.length / 2)
      val expected = dup.groupBy(e => (e._1, e._2))
        .map { case ((i, j), es) => (i, j, es.map(_._3).sum) }
        .toSeq.sorted
      assert(cells(MatrixOps.fromTable(dup.toDF("i", "j", "v"),
        col("i"), col("j"), col("v"))) === expected)
    }
  }

  test("sparse-densified multiply == dense multiply") {
    for (ae <- samples(5)) {
      val a = toDF(ae)
      val b = toDF(ae.map { case (i, j, v) => (j, i, v + 1) })
      // broadcast (SpMM plan) and shuffle paths agree
      assert(cells(MatrixOps.multiply(a, b, broadcastRight = true)) ===
        cells(MatrixOps.multiply(a, b)))
    }
  }

  test("genSparseQuota honors the reference's per-row nnz quota (G5)") {
    for {
      n <- Seq(16L, 64L)
      density <- Seq(0.05, 0.25)
    } {
      val m = MatrixOps.genSparseQuota(spark, n, density, seed = 1).cache()
      val nnz = (n * n * density).toLong
      assert(m.count() === nnz)
      // per-row quota: first (nnz % n) rows carry one extra (mm_opt.py:17-18)
      val perRow = m.groupBy("i").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val base = nnz / n
      val leftover = nnz % n
      (0L until n).foreach { i =>
        val expected = base + (if (i < leftover) 1L else 0L)
        assert(perRow.getOrElse(i, 0L) === expected, s"row $i at n=$n d=$density")
      }
      // distinct columns within each row (CSR contract, mm_opt.py:22-23)
      assert(m.select("i", "j").distinct().count() === nnz)
    }
  }

  test("native set kernels agree with the built-in formulations") {
    import spark.implicits._
    import graft.functions.VectorFunctions.{sortedIntersectCount, zipEqualCount}
    val arrGen: Gen[Seq[Long]] = for {
      n <- Gen.choose(0, 24)
      xs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield xs
    val pairs: Seq[(Seq[Long], Seq[Long])] = (1 to 40).flatMap { s =>
      for {
        a <- arrGen.apply(Gen.Parameters.default, Seed(s.toLong))
        b <- arrGen.apply(Gen.Parameters.default, Seed(s.toLong + 1000))
      } yield (a.distinct.sorted.toSeq, b.distinct.sorted.toSeq)
    }
    val df = pairs.toDF("a", "b")
    // merge-intersect == size(array_intersect) on sorted distinct input
    val rows = df.select(
      sortedIntersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // positional-equality count == interpreted zip_with fold (equal lengths)
    val eqLen = pairs.map { case (a, b) =>
      val n = math.min(a.length, b.length); (a.take(n), b.take(n))
    }
    val rows2 = eqLen.toDF("a", "b").select(
      zipEqualCount(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), (acc, x) => acc + x).as("builtin"))
      .collect()
    rows2.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("two-level prefix sum packs identically for every shard width") {
    import spark.implicits._
    import graft.operators.TextOps
    // packChunks' correctness rides on exact long offset arithmetic at
    // lang/shard boundaries: a huge shardDocs degenerates to the
    // single-window form (one shard per language), so equality across
    // adversarial widths — every doc its own shard (1), straddling
    // pairs (2), mid-size (7) — is the two-level ≡ global property.
    // doc_ids draw WITH GAPS (0..60 for ≤24 docs) so shard boundaries
    // land on absent ids too.
    val corpusGen: Gen[Seq[(Long, String, Int)]] = for {
      n <- Gen.choose(1, 24)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 60L)
        lang <- Gen.oneOf("en", "fr")
        k <- Gen.choose(1, 9)
      } yield (id, lang, k))
    } yield rows.groupBy(_._1).map(_._2.head).toSeq
    def packed(docs: org.apache.spark.sql.DataFrame, shardDocs: Long) =
      TextOps.packChunks(docs, budgetTokens = 7L, shardDocs = shardDocs)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(t => (t._1, t._2))
    (1 to 10).flatMap(s =>
      corpusGen.apply(Gen.Parameters.default, Seed(s.toLong))).foreach { rows =>
      val docs = rows.map { case (id, lang, k) =>
        (id, Seq.fill(k)("w").mkString(" "), lang)
      }.toDF("doc_id", "text", "lang")
      val single = packed(docs, Long.MaxValue / 4)
      for (sd <- Seq(1L, 2L, 7L))
        assert(packed(docs, sd) === single,
          s"shardDocs=$sd diverged on corpus ${rows.sortBy(_._1)}")
    }
  }

  test("substring spans equal a plain-Scala interval-merge oracle") {
    import spark.implicits._
    import graft.operators.TextOps
    // 3-symbol vocabulary makes shared 3-token windows (and same-doc
    // repeats, which must NOT count) dense; lengths below the window
    // size exercise the empty branch
    val nSpan = 3
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(2, 10)
      rows <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 14)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
      } yield toks.mkString(" "))
    } yield rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (1 to 15).flatMap(s =>
      corpusGen(Gen.Parameters.default, Seed(s.toLong))).foreach { rows =>
      val wins = rows.map { case (id, text) =>
        val t = text.split(" ")
        id -> (0 to t.length - nSpan)
          .map(p => p -> t.slice(p, p + nSpan).mkString(" "))
      }.toMap
      val dupGrams = wins.toSeq
        .flatMap { case (id, ws) => ws.map { case (_, g) => (g, id) } }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val expected = wins.flatMap { case (id, ws) =>
        val ps = ws.collect { case (p, g) if dupGrams(g) => p }.sorted
        if (ps.isEmpty) None
        else {
          val islands = ps.foldLeft(List.empty[(Int, Int)]) {
            case (Nil, p) => List((p, p))
            case ((lo, hi) :: rest, p) =>
              if (p - hi > nSpan) (p, p) :: (lo, hi) :: rest
              else (lo, p) :: rest
          }
          val dupTokens = islands.map { case (lo, hi) => hi - lo + nSpan }.sum
          Some(id -> ((islands.size.toLong, dupTokens.toLong)))
        }
      }
      val df = rows.map { case (id, t) => (id, t, "en", "s0", 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = TextOps.substringSpans(df, nSpan).collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      assert(got === expected, s"corpus=$rows")
    }
  }

  test("semdedup equals a plain-Scala cluster/verdict oracle") {
    import spark.implicits._
    import graft.operators.Similarity
    // components from the exact-in-binary quarter grid so float→double
    // widening and both quantizations (1000 for assignment, 100 for the
    // verdict) are trivially exact; 2 labels keep clusters adversarially
    // small and collision-prone (exact distance ties exercise the
    // cluster-asc and vec_id tie-breaks)
    val dim = 4
    val t = 80
    val grid = Seq(-1.0f, -0.75f, -0.5f, -0.25f, 0.0f, 0.25f, 0.5f,
      0.75f, 1.0f)
    val embGen: Gen[Seq[(Long, Array[Float], Int)]] = for {
      n <- Gen.choose(2, 10)
      rows <- Gen.listOfN(n, for {
        vec <- Gen.listOfN(dim, Gen.oneOf(grid))
        label <- Gen.choose(0, 1)
      } yield (vec.toArray, label))
    } yield rows.zipWithIndex.map { case ((v, l), i) => (i.toLong, v, l) }
    def q(x: Float, s: Int): Long = math.floor(x.toDouble * s).toLong
    (1 to 12).flatMap(s =>
      embGen(Gen.Parameters.default, Seed(s.toLong))).foreach { rows =>
      // JVM oracle: truncated integer centroids per label, argmin
      // assignment (dist, cluster) asc, then the integer squared-cosine
      // verdict against every lower-id same-cluster vector
      val book = rows.groupBy(_._3).map { case (l, vs) =>
        l -> (0 until dim).map(d =>
          vs.map(v => q(v._2(d), 1000)).sum / vs.size).toArray
      }
      val asg = rows.map { case (id, v, _) =>
        val best = book.toSeq.map { case (c, cq) =>
          val dist = (0 until dim)
            .map { d => val e = q(v(d), 1000) - cq(d); e * e }.sum
          (dist, c)
        }.min
        id -> best._2
      }.toMap
      val expected = rows.map { case (id, v, _) =>
        val twins = rows.filter { case (oid, ov, _) =>
          oid < id && asg(oid) == asg(id) && {
            val dot = (0 until dim).map(d => q(v(d), 100) * q(ov(d), 100)).sum
            val na = (0 until dim).map(d => q(v(d), 100) * q(v(d), 100)).sum
            val nb = (0 until dim).map(d => q(ov(d), 100) * q(ov(d), 100)).sum
            dot > 0 && 10000L * dot * dot >= t.toLong * t * na * nb
          }
        }.map(_._1)
        id -> ((asg(id), if (twins.isEmpty) 1L else 0L,
          if (twins.isEmpty) -1L else twins.min))
      }.toMap
      val got = Similarity.semDedup(spark,
          rows.toDF("vec_id", "embedding", "label"), t, dim)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getInt(1), r.getAs[Long]("kept"), r.getAs[Long]("dup_of"))))
        .toMap
      assert(got === expected, s"rows=${rows.map(r =>
        (r._1, r._2.toSeq, r._3))}")

      // companion: semDedupComponents equals union-find over the SAME
      // qualifying pair relation (symmetric closure of the verdicts the
      // keep-rule oracle just computed) — min id labels the component,
      // vectors in no pair are absent
      val parent = scala.collection.mutable.Map(
        rows.map(r => r._1 -> r._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      for {
        (ia, va, _) <- rows; (ib, vb, _) <- rows
        if ia < ib && asg(ia) == asg(ib)
        dot = (0 until dim).map(d => q(va(d), 100) * q(vb(d), 100)).sum
        na = (0 until dim).map(d => q(va(d), 100) * q(va(d), 100)).sum
        nb = (0 until dim).map(d => q(vb(d), 100) * q(vb(d), 100)).sum
        if dot > 0 && 10000L * dot * dot >= t.toLong * t * na * nb
      } parent(find(ia)) = find(ib)
      val comps = rows.map(_._1).groupBy(find).filter(_._2.size > 1)
      val expComps = (for ((_, ms) <- comps; m <- ms)
        yield m -> ms.min).toMap
      val gotComps = Similarity.semDedupComponents(spark,
          rows.toDF("vec_id", "embedding", "label"), t, dim)
        .collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("component")).toMap
      assert(gotComps === expComps, s"rows=${rows.map(r =>
        (r._1, r._2.toSeq, r._3))}")
    }
  }
}
