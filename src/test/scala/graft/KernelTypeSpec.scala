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
