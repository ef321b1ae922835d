package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.VectorFunctions

/** The native long-array kernels read elements as primitive longs, so a
  * null element would silently corrupt a signature/count. These specs
  * pin the contract: nullable-element arrays are rejected at ANALYSIS,
  * the sanctioned narrowing wrapper validates per row, and a violated
  * no-null claim fails loudly instead of corrupting.
  */
class KernelTypeSpec extends SparkSpec {

  test("md5_token_ids equals the interpreted split-distinct-md5 form") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val texts = Seq(
      "the quick brown fox the quick",  // duplicates
      "a",                              // single token
      "",                               // empty string → one empty token
      "a  b",                           // separator run → empty token
      " leading and trailing ",         // boundary empties
      "üñïçødé tökens üñïçødé",         // non-ASCII, with a duplicate
      "x y z x y z x y z"
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val interpreted = df.select(col("id"),
      transform(array_distinct(split(col("text"), " ")),
        t => conv(substring(md5(t.cast("binary")), 1, 10), 16, 10)
          .cast("long")).as("ids"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    val native = df.select(col("id"),
      Bridge.column(graft.functions.Md5TokenIds(
        Bridge.expression(col("text")))).as("ids"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    assert(native.toSeq === interpreted.toSeq)
    // ids are 40-bit non-negative (conv parity)
    assert(native.flatten.forall(id => id >= 0L && id < (1L << 40)))
  }

  test("kernels reject containsNull=true arrays at analysis") {
    import spark.implicits._
    // a nullable lambda body types the array containsNull=true —
    // exactly the misuse ADVICE flagged
    val df = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "xs")
      .withColumn("nullable_xs", transform(col("xs"), x => when(x > 0L, x)))
    assert(df.schema("nullable_xs").dataType ===
      ArrayType(LongType, containsNull = true))
    val ex = intercept[AnalysisException] {
      df.select(VectorFunctions.sortedIntersectCount(
        col("nullable_xs"), col("nullable_xs"))).collect()
    }
    assert(ex.getMessage.contains("KnownNoNullElements"))
    val ex2 = intercept[AnalysisException] {
      df.select(VectorFunctions.zipEqualCount(
        col("nullable_xs"), col("nullable_xs"))).collect()
    }
    assert(ex2.getMessage.contains("KnownNoNullElements"))
  }

  test("noNullElements narrows the static type and passes values through") {
    import spark.implicits._
    val df = Seq((1L, Seq(5L, 1L, 5L))).toDF("id", "xs")
      .withColumn("narrowed",
        VectorFunctions.noNullElements(transform(col("xs"), x => x * 2)))
    assert(df.schema("narrowed").dataType ===
      ArrayType(LongType, containsNull = false))
    assert(df.select("narrowed").as[Seq[Long]].head() === Seq(10L, 2L, 10L))
    // and the narrowed column is accepted by the kernels
    val n = df.select(VectorFunctions.zipEqualCount(
      col("narrowed"), col("narrowed")).as("n")).as[Long].head()
    assert(n === 3L)
  }

  test("srp_code_words equals the per-plane zip_with/aggregate form") {
    import spark.implicits._
    // seeded vectors spanning signs/magnitudes; 130 planes → 3 words
    val rnd = new scala.util.Random(11)
    val dim = 16
    val vecs = (0L until 8L).map(i =>
      (i, Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = vecs.toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
    val planes = graft.operators.Similarity
      .lshPlanesQuantized(130, dim, seed = 7L)
    val native = df.select(col("id"),
      VectorFunctions.srpCodeWords(col("v"), planes, 1000).as("code"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    // the portable per-plane formulation the kernel replaced
    val portable = df.select(col("id"),
      array(planes.grouped(62).toSeq.map { word =>
        word.zipWithIndex.map { case (plane, p) =>
          val planeCol = array(plane.map(lit): _*)
          when(aggregate(zip_with(planeCol, col("v"),
            (w, y) => w * floor(y.cast("double") * 1000).cast("long")),
            lit(0L), (acc, x) => acc + x) >= 0, lit(1L << p))
            .otherwise(lit(0L))
        }.reduce(_ + _)
      }: _*).as("code"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    assert(native.toSeq === portable.toSeq)
    assert(native.head.length === 3) // ceil(130/62)
    // null element and length-mismatch inputs are NULL, not garbage
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
      .select(VectorFunctions.srpCodeWords(col("v"),
        planes, 1000).as("code"))
    assert(bad.filter(col("code").isNull).count() === 1L)
  }

  test("pq_argmin picks the nearest codeword with the (dist, label) tie-break") {
    import spark.implicits._
    // one subspace table of two codewords: label 7 at (10,10),
    // label 3 at (0,0) — vec 3 at (5,5) ties exactly, so the lower
    // label must win (the packed dist·2²⁰+label contract)
    val books = Seq(Tuple1(Seq((7L, Seq(10L, 10L)), (3L, Seq(0L, 0L)))))
      .toDF("books")
    val got = Seq(
      (1L, Seq(0L, 0L)),
      (2L, Seq(10L, 10L)),
      (3L, Seq(5L, 5L))
    ).toDF("vec_id", "vs")
      .crossJoin(books)
      .select(col("vec_id"),
        VectorFunctions.pqArgMinCode(col("vs"), col("books")).as("p"))
      .select(col("vec_id"), (col("p") % (1L << 20)).as("code"),
        expr(s"p div ${1L << 20}").as("dist"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 3L, 0L), (2L, 7L, 0L), (3L, 3L, 50L)))
    // an empty table and a codeword/subvector length mismatch are
    // NULL, not garbage (the SqDistLong strictness contract)
    val cast = "array<struct<label:bigint,cs:array<bigint>>>"
    val empty = Seq(Tuple1(Seq(1L, 2L))).toDF("vs")
      .select(VectorFunctions.pqArgMinCode(col("vs"),
        expr(s"CAST(array() AS $cast)")).as("p"))
    assert(empty.filter(col("p").isNull).count() === 1L)
    val mismatch = Seq(Tuple1(Seq(1L, 2L))).toDF("vs")
      .crossJoin(Seq(Tuple1(Seq((1L, Seq(5L))))).toDF("books"))
      .select(VectorFunctions.pqArgMinCode(col("vs"), col("books")).as("p"))
    assert(mismatch.filter(col("p").isNull).count() === 1L)
  }

  test("pq_argmin fails loudly on a wrapped-negative distance " +
    "instead of silently winning the argmin") {
    import spark.implicits._
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // 3037000500² = 9223372037000250000 > Long.MaxValue: the single-dim
    // d·d wraps NEGATIVE — exactly the r11 ADVICE hole the guard
    // closes. Were the guard absent, the negative dist would sail
    // under DistCap and crown this codeword as a "win" at distance
    // < 0; the contract is IllegalStateException, not a result.
    val wrap = Seq(Tuple1(Seq(3037000500L))).toDF("vs")
      .crossJoin(Seq(Tuple1(Seq((0L, Seq(0L))))).toDF("books"))
      .select(VectorFunctions.pqArgMinCode(col("vs"), col("books")).as("p"))
    val exWrap = intercept[Exception] { wrap.collect() }
    assert(messages(exWrap).exists(_.contains("wrapped negative")),
      s"expected the wrapped-negative guard, got: $exWrap")
    // the non-wrapping overflow arm: diff 2²² → dist 2⁴⁴ ≥ DistCap,
    // positive but too wide for the (dist, label) pack
    val over = Seq(Tuple1(Seq(1L << 22))).toDF("vs")
      .crossJoin(Seq(Tuple1(Seq((0L, Seq(0L))))).toDF("books"))
      .select(VectorFunctions.pqArgMinCode(col("vs"), col("books")).as("p"))
    val exOver = intercept[Exception] { over.collect() }
    assert(messages(exOver).exists(_.contains("overflows")),
      s"expected the DistCap guard, got: $exOver")
    // a codeword label outside [0, 2²⁰) breaks the pack
    val badLabel = Seq(Tuple1(Seq(1L))).toDF("vs")
      .crossJoin(Seq(Tuple1(Seq((1L << 20, Seq(1L))))).toDF("books"))
      .select(VectorFunctions.pqArgMinCode(col("vs"), col("books")).as("p"))
    val exLabel = intercept[Exception] { badLabel.collect() }
    assert(messages(exLabel).exists(_.contains("label")),
      s"expected the label guard, got: $exLabel")
  }

  test("pq_argmin is SQL-callable via GraftExtensions with the same " +
    "packed contract") {
    // the streaming encode path calls the kernel BY NAME inside a SQL
    // lambda (pqEncodeStream's per-subspace transform) — pin the
    // registration itself: same argmin, tie-break, and packing as the
    // Column-API call KernelTypeSpec already covers
    val pack = graft.functions.PqArgMinCode.Pack
    val got = spark.sql(
      """SELECT pq_argmin(
        |  array(CAST(5 AS BIGINT), CAST(5 AS BIGINT)),
        |  array(named_struct('label', CAST(7 AS BIGINT),
        |          'cs', array(CAST(10 AS BIGINT), CAST(10 AS BIGINT))),
        |        named_struct('label', CAST(3 AS BIGINT),
        |          'cs', array(CAST(0 AS BIGINT), CAST(0 AS BIGINT))))
        |) AS p""".stripMargin)
      .collect().head.getLong(0)
    // (5,5) ties at 50 against both codewords — label 3 must win
    assert(got % pack === 3L)
    assert(got / pack === 50L)
  }

  test("a violated no-null claim fails loudly instead of corrupting") {
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "xs")
      .withColumn("lying", VectorFunctions.noNullElements(
        transform(col("xs"), x => when(x === 2L, lit(null)).otherwise(x))))
    val ex = intercept[Exception] {
      df.select(col("lying")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("known_no_null_elements")),
      s"expected the validation error, got: $ex")
  }
}
