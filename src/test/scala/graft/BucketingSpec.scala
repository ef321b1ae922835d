package graft

import org.apache.spark.sql.functions._
import graft.operators.MatrixOps

/** Bucketed co-located multiply: the join over pre-bucketed operands
  * must run WITHOUT a shuffle on either input — the one-time-write /
  * many-cheap-joins trade that matters for iterative workloads. */
class BucketingSpec extends SparkSpec {

  test("bucketed multiply joins exchange-free and matches plain multiply") {
    val a = MatrixOps.genDense(spark, 16, seed = 11)
      .withColumn("v", floor(col("v") * 10).cast("double"))
    val b = MatrixOps.genDense(spark, 16, seed = 12)
      .withColumn("v", floor(col("v") * 10).cast("double"))

    MatrixOps.saveForMultiply(a, b, "bucketed_a", "bucketed_b", buckets = 4)
    // Force SMJ so the exchange-free property is observable (a broadcast
    // join would hide it).
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val product = MatrixOps.multiplyBucketed(spark, "bucketed_a", "bucketed_b")

      // Physical plan: exactly ONE exchange (the final groupBy), none
      // feeding the join.
      val plan = product.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1, s"expected only the aggregate exchange, plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)

      assert(cells(product) === cells(MatrixOps.multiply(a, b)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("bucketed incremental dedup anti-joins without shuffling the corpus") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpus = Seq((0L, "seen before"), (1L, "also seen"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "seen before"), (11L, "novel one"), (12L, "also seen"))
      .toDF("doc_id", "text")
    Dedup.saveCorpusDigests(corpus, "corpus_digests", buckets = 4)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val kept = Dedup.dedupAgainstCorpusBucketed(spark, batch, "corpus_digests")
      val plan = kept.queryExecution.executedPlan.toString
      // exactly one exchange: the incoming BATCH hashing into the
      // corpus's bucket layout; the corpus side reads buckets in place
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1, s"expected only the batch-side exchange, plan:\n$plan")
      assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(11L))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS corpus_digests")
    }
  }
}
