package graft

// Measurement tooling (dev/judge, not a driver surface): adjudicates
// the two unexplained ×10 ops-smoke entries the r13 verdict flagged —
// `doc_repetition` 7.9× and `dedup_exact_normalized` 5.8× wall growth
// for ×10 tagged-replica volume, standing out against shape-siblings
// like dedup_exact_groups (1.25×, overhead-dominated). Same standard
// as MINHASH_SCALE_r13: cumulative stage prefixes at ×1 and ×N on the
// smoke's own replica construction, so the paying stage is NAMED, not
// guessed, plus a shuffle-width leg to rule out a spilling aggregation.
//
//   doc_repetition prefixes: grams (posexplode + lead window + gram
//     explode — gramRows' volume), agg1 (+ per-(doc,n,gram-hash)
//     count), full (+ the per-(doc,n) signal aggregation);
//   dedup_exact_normalized prefixes: norm (the lower + 3×regexp_replace
//     chain, forced via a length sum so column pruning can't skip it),
//     hash (+ md5 of the normalized text, same forcing), full (+ the
//     content-key groupBy).
//
// Read the numbers as PER-PREFIX ×1→×N ratios, not as cumulative stage
// deltas: each prefix is forced by its own count/aggregate action, and
// a prefix whose forcing action runs over a LARGE intermediate (agg1's
// count over the per-gram relation) can legitimately clock above a
// longer prefix whose final stage reduces before counting — the
// comparison that adjudicates is each prefix's own scaling ratio.
//
// → OPS_PROBE_r{N}.json (append-only per the probe pinning rule).
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

object OpsScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = Tables.documents(spark, sfDir)
    val stride = docs1.agg(max("doc_id")).first().getLong(0) + 1
    val base = java.nio.file.Files
      .createTempDirectory("graft_opsprobe_").toString
    ScaleSmoke.scaledDocs(docs1, factor, stride).write.mode("overwrite")
      .parquet(s"$base/documents")
    val docsN = spark.read.parquet(s"$base/documents")
    docs1.count(); docsN.count() // scan warm-up

    def minOf2(f: => Unit): Double = {
      f // codegen warm-up
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    // each stage is a CUMULATIVE prefix timed at both scales
    def stages(op: String, d1: DataFrame, dN: DataFrame,
               prefixes: Seq[(String, DataFrame => Unit)]): String = {
      val cells = prefixes.map { case (tag, f) =>
        val t1 = minOf2(f(d1))
        val tN = minOf2(f(dN))
        println(f"[opsscale] $op/$tag x1=$t1%.2fs x$factor=$tN%.2fs " +
          f"ratio=${tN / t1}%.2f")
        Console.flush()
        f""""$tag":{"t1":$t1%.3f,"tN":$tN%.3f,"ratio":${tN / t1}%.2f}"""
      }
      s""""$op":{${cells.mkString(",")}}"""
    }

    val rep = stages("doc_repetition", docs1, docsN, Seq(
      // gramRows ends in a filter on the computed gram struct, so a
      // count cannot prune the explode/window work
      "grams" -> (d => TextOps.gramRows(d, Seq(1, 2, 3)).count(): Unit),
      "agg1" -> (d => TextOps.gramRows(d, Seq(1, 2, 3))
        .select(col("doc_id"), col("n"), xxhash64(col("gram")).as("gh"))
        .groupBy("doc_id", "n", "gh").agg(count(lit(1)).as("cnt"))
        .count(): Unit),
      // r15 (r14 verdict #6): the second aggregation timed separately —
      // agg1's forcing count runs over the LARGE per-gram relation
      // while full's counts the reduced per-(doc,n) rows, so the
      // agg1→full ratio gap could hide either in the per-(doc,n)
      // signal aggregation or in the forcing asymmetry; agg2 pins it
      "agg2" -> (d => TextOps.gramRows(d, Seq(1, 2, 3))
        .select(col("doc_id"), col("n"), xxhash64(col("gram")).as("gh"))
        .groupBy("doc_id", "n", "gh").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id", "n")
        .agg(sum("cnt").as("grams"), count(lit(1)).as("distinct_grams"),
          max("cnt").as("top_cnt"),
          sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L)))
            .as("dup_grams"))
        .count(): Unit),
      "full" -> (d => TextOps.repetitionSignals(d).count(): Unit)))

    val norm = stages("dedup_exact_normalized", docs1, docsN, Seq(
      // force the projection through an aggregate — count() alone
      // would column-prune the regex chain away
      "norm" -> (d => d.select(length(TextOps.normalizedText(col("text")))
        .as("l")).agg(sum("l")).first(): Unit),
      "hash" -> (d => d.select(length(md5(TextOps.normalizedText(col("text"))
        .cast("binary"))).as("l")).agg(sum("l")).first(): Unit),
      "full" -> (d => TextOps.dedupExactNormalized(d).count(): Unit)))

    // width leg: the full ops at 32/128/512 shuffle partitions — flat
    // means no spilling aggregation, the cluster dial is not the issue
    val widths = Seq(32, 128, 512).map { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val tr = minOf2(TextOps.repetitionSignals(docsN).count(): Unit)
      val tn = minOf2(TextOps.dedupExactNormalized(docsN).count(): Unit)
      println(f"[opsscale] width=$parts doc_repetition=$tr%.2fs " +
        f"dedup_exact_normalized=$tn%.2fs")
      Console.flush()
      f""""p$parts":{"doc_repetition":$tr%.3f,"dedup_exact_normalized":$tn%.3f}"""
    }
    println(s"""{"metric":"ops_scale_probe","sf":"$sfDir","factor":$factor,""" +
      s"""$rep,$norm,"width_sec":{${widths.mkString(",")}}}""")
    spark.stop()
  }

}

/** r16 scale leg (runMain graft.HybridScaleLeg): ×1 vs ×factor wall
  * for `hybrid_rrf` on matched doc+embedding replicas (the smoke's
  * own scaledDocs/scaledEmb constructions). Both arms are
  * corpus-linear scans (token scan / probe×corpus dot) and the fusion
  * is ≤ 2·kArm rows per query by construction — the leg verifies the
  * measured growth tracks that claim. → OPS_PROBE_r{N}.json */

object HybridScaleLeg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = Tables.documents(spark, sfDir)
    val emb1 = Tables.embeddings(spark, sfDir)
    val dStride = docs1.agg(max("doc_id")).first().getLong(0) + 1
    val eStride = emb1.agg(max("vec_id")).first().getLong(0) + 1
    val base = java.nio.file.Files
      .createTempDirectory("graft_hybridscale_").toString
    ScaleSmoke.scaledDocs(docs1, factor, dStride).write.mode("overwrite")
      .parquet(s"$base/documents")
    ScaleSmoke.scaledEmb(emb1, factor, eStride).write.mode("overwrite")
      .parquet(s"$base/embeddings")
    val docsN = spark.read.parquet(s"$base/documents")
    val embN = spark.read.parquet(s"$base/embeddings")
    docs1.count(); docsN.count(); emb1.count(); embN.count()

    def minOf2(f: => Unit): Double = {
      f
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def run(d: org.apache.spark.sql.DataFrame,
            e: org.apache.spark.sql.DataFrame): Unit =
      TextOps.hybridRrfTopK(d, e, numQueries = 3, kArm = 20, k = 10)
        .count(): Unit
    val t1 = minOf2(run(docs1, emb1))
    val tN = minOf2(run(docsN, embN))
    println(f"[hybridscale] x1=$t1%.3fs x$factor=$tN%.3fs " +
      f"ratio=${tN / t1}%.2f")
    Console.flush()
    println(f"""{"metric":"hybrid_scale_probe","sf":"$sfDir",""" +
      f""""factor":$factor,"t1":$t1%.3f,"tN":$tN%.3f,""" +
      f""""ratio":${tN / t1}%.2f}""")
    spark.stop()
  }
}

/** r17 scale leg (runMain graft.HybridIndexedScaleLeg): the
  * INDEX-SERVED hybrid (`hybrid_rrf_indexed`) vs the scan-tier hybrid
  * at ×1 and ×factor corpus — the number behind the
  * [[graft.operators.TextOps.hybridRrfTopKIndexed]] serving claim.
  * Index builds (lexical postings + IVF-PQ) clock SEPARATELY as the
  * offline job they are; the serve comparison is what a query pays.
  * Expected shape: the scan tier grows with the corpus (both arms are
  * corpus-linear by declared design); the indexed serve's lexical arm
  * touches only the query terms' postings and its dense arm reads
  * probes/cells of the index — so the serve ratio should sit well
  * under the scan ratio. → OPS_PROBE_r{N}.json */
object HybridIndexedScaleLeg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = Tables.documents(spark, sfDir)
    val emb1 = Tables.embeddings(spark, sfDir)
    val dStride = docs1.agg(max("doc_id")).first().getLong(0) + 1
    val eStride = emb1.agg(max("vec_id")).first().getLong(0) + 1
    val base = java.nio.file.Files
      .createTempDirectory("graft_hybridxscale_").toString
    ScaleSmoke.scaledDocs(docs1, factor, dStride).write.mode("overwrite")
      .parquet(s"$base/documents")
    ScaleSmoke.scaledEmb(emb1, factor, eStride).write.mode("overwrite")
      .parquet(s"$base/embeddings")
    val docsN = spark.read.parquet(s"$base/documents")
    val embN = spark.read.parquet(s"$base/embeddings")
    docs1.count(); docsN.count(); emb1.count(); embN.count()

    def minOf2(f: => Unit): Double = {
      f
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def leg(tag: String, d: org.apache.spark.sql.DataFrame,
            e: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
      val lex = s"$base/lex_$tag"; val pq = s"$base/pq_$tag"
      val tb0 = System.nanoTime()
      TextOps.saveLexicalIndex(d, lex)
      graft.operators.Similarity.savePqIndex(spark, e, pq,
        m = 16, cw = 256, rounds = 2, cells = 10, cellRounds = 2)
      val build = (System.nanoTime() - tb0) / 1e9
      val serve = minOf2(
        TextOps.hybridRrfTopKIndexed(spark,
          e.filter(col("vec_id") < 3), lex, pq,
          numQueries = 3, kArm = 20, k = 10, m = 16).count(): Unit)
      val scan = minOf2(
        TextOps.hybridRrfTopK(d, e, numQueries = 3, kArm = 20,
          k = 10).count(): Unit)
      (build, serve, scan)
    }
    val (b1, s1, c1) = leg("x1", docs1, emb1)
    val (bN, sN, cN) = leg("xN", docsN, embN)
    // LEXICAL BUCKETED-PRUNE leg (r18, the r17 verdict #2's "show the
    // ratio drop"): the scaled replicas above SHARE the base
    // vocabulary, so the probe terms' postings genuinely grow xN and
    // no layout can shrink them — the corpus-linear floor of lexical
    // serving on a vocabulary-saturating query. The lake-realistic
    // shape is the PERTURBED replica set (zero shared vocabulary:
    // global vocab grows xN, the probe docs' terms stay a 1/N slice),
    // where the token-bucketed directory prune + sorted row groups
    // should hold the lexical serve near-flat while the corpus grows
    // xN. Measured on the lexical arm alone to isolate the layout.
    ScaleSmoke.perturbedDocs(docs1, factor, dStride).write
      .mode("overwrite").parquet(s"$base/documents_pert")
    val docsP = spark.read.parquet(s"$base/documents_pert")
    docsP.count()
    TextOps.saveLexicalIndex(docsP, s"$base/lex_pert")
    val l1 = minOf2(TextOps.bm25DocAsQueryFromIndex(spark,
      s"$base/lex_x1", numQueries = 3, k = 20).count(): Unit)
    val lP = minOf2(TextOps.bm25DocAsQueryFromIndex(spark,
      s"$base/lex_pert", numQueries = 3, k = 20).count(): Unit)
    println(f"[hybridxscale] x1 build=$b1%.3f serve=$s1%.3f scan=$c1%.3f" +
      f" | x$factor build=$bN%.3f serve=$sN%.3f scan=$cN%.3f" +
      f" | serve ratio=${sN / s1}%.2f scan ratio=${cN / c1}%.2f" +
      f" | lex pert x1=$l1%.3f xN=$lP%.3f ratio=${lP / l1}%.2f")
    Console.flush()
    println(f"""{"metric":"hybrid_indexed_scale_probe","sf":"$sfDir",""" +
      f""""factor":$factor,"build_x1":$b1%.3f,"build_xN":$bN%.3f,""" +
      f""""serve_x1":$s1%.3f,"serve_xN":$sN%.3f,""" +
      f""""scan_x1":$c1%.3f,"scan_xN":$cN%.3f,""" +
      f""""serve_ratio":${sN / s1}%.2f,"scan_ratio":${cN / c1}%.2f,""" +
      f""""lex_pert_x1":$l1%.3f,"lex_pert_xN":$lP%.3f,""" +
      f""""lex_pert_ratio":${lP / l1}%.2f}""")
    spark.stop()
  }
}
