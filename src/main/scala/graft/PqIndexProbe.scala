package graft

// Measurement tooling (dev/judge, not a driver surface): splits the
// persisted-index lifecycle into separately-timed halves (the r13
// verdict item — the old bench row timed build + write + serve as one
// number, saying nothing about the pruned serve the query exists to
// demonstrate), and measures the small-files effect appendToPqIndex
// accumulates plus what compactPqIndex buys back:
//   build   — savePqIndex (train books, code corpus, write postings);
//   serve   — annIvfPqFromIndex on the fresh index (min-of-2, warmed);
//   append  — N ingest batches against the frozen books;
//   serve_fragmented / files_per_cell — the serve re-timed on the
//     multi-file-per-cell layout;
//   compact + serve_compacted — the layout folded back to one file
//     per cell and the serve re-timed.
// → PQINDEX_PROBE_r{N}.json (append-only per the probe pinning rule:
// re-runs within a round bump a capture suffix, never overwrite).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

object PqIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    emb.count() // scan warm-up
    val path = java.nio.file.Files
      .createTempDirectory("graft_pqindex_probe_").toString

    def once(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def timed(tag: String)(f: => Unit): String = {
      f // codegen warm-up (rebuild/rewrite tags re-do the work; noted)
      val t = math.min(once(f), once(f))
      println(f"[pqindex] $tag $t%.2fs"); Console.flush()
      f""""$tag":$t%.3f"""
    }
    def filesPerCell(): Seq[Int] = {
      val root = new java.io.File(s"$path/postings")
      root.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("cell=")).toSeq
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    }
    def serveCount(): Unit =
      Similarity.annIvfPqFromIndex(spark,
        emb.filter(col("vec_id") < 5), path, k = 5, probes = 1, m = 16)
        .count()

    // build: each sample is a FULL rebuild (train + code + write) —
    // overwrite mode makes repeats idempotent
    val build = timed("build_sec") {
      Similarity.savePqIndex(spark, emb, path, m = 16, cw = 256,
        rounds = 2, cells = 10, cellRounds = 2)
    }
    val serveFresh = timed("serve_sec")(serveCount())
    val files0 = filesPerCell()

    // ingest cadence: 8 frozen-book appends of 200 vectors each
    val stride = emb.agg(max("vec_id")).first().getLong(0) + 1
    (0 until 8).foreach { b =>
      Similarity.appendToPqIndex(spark,
        emb.filter(col("vec_id") >= b * 200L && col("vec_id") < (b + 1) * 200L)
          .withColumn("vec_id", col("vec_id") + lit(stride * (b + 1))),
        path, m = 16)
    }
    val files1 = filesPerCell()
    val serveFrag = timed("serve_fragmented_sec")(serveCount())

    val compact = timed("compact_sec")(Similarity.compactPqIndex(spark, path))
    val files2 = filesPerCell()
    val serveCompact = timed("serve_compacted_sec")(serveCount())

    def arr(xs: Seq[Int]) = xs.sorted.mkString("[", ",", "]")
    println(s"""{"metric":"pqindex_probe","sf":"$sfDir",""" +
      s"""$build,$serveFresh,"files_per_cell_fresh":${arr(files0)},""" +
      s""""appends":8,"files_per_cell_after_appends":${arr(files1)},""" +
      s"""$serveFrag,$compact,"files_per_cell_after_compact":${arr(files2)},""" +
      s"""$serveCompact}""")
    spark.stop()
  }
}
