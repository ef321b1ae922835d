package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan of the reference's heterogeneous benchmark-result CSVs — operator
  * G8 (`Stage 1/Visualization/mm_perf_visualizer.py:22-37`, `Stage 2/…:33-48`,
  * `Stage 3/Visualization/mm_perf_parallel_visualizer.py:46-61`).
  *
  * The reference globs `results_*.csv` across three implementation dirs,
  * reads each with pandas, tags the originating file, and concatenates
  * despite 9 different schemas (SURVEY.md §1.1). Here: one multi-path CSV
  * scan per file + `unionByName(allowMissingColumns = true)` (A9 —
  * `pd.concat(ignore_index=True)` analog), everything read as string and
  * coerced later (the visualizers' dynamic-schema stance).
  *
  * Scale: schema drift is resolved per file at plan time; the data path
  * stays a plain distributed CSV scan, so a 100 TB results lake (many
  * files) parallelizes by file split with no driver involvement beyond
  * listing.
  */
object ResultsCsv {

  /** Basename of the originating file — the reference keeps
    * `source_file` for per-source series (`mm_perf_visualizer.py:30`). */
  private def sourceFile = regexp_extract(input_file_name(), "([^/]+)$", 1)

  /** Read one or more results CSVs (glob patterns allowed), tag
    * `source_file`, and union across schema drift. */
  def readResults(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths.map { p =>
      spark.read
        .option("header", "true")
        .csv(p)
        .withColumn("source_file", sourceFile)
    }.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Glob a directory the way the reference globs its three
    * implementation dirs. Files are enumerated driver-side (metadata
    * only) and read one-by-one: a single multi-file `spark.read.csv`
    * would force the first file's header onto every file, silently
    * corrupting the 9-schema drift this source exists to handle. */
  def readResultsDir(spark: SparkSession, dir: String,
                     pattern: String = "results_*.csv"): DataFrame = {
    // the glob itself reruns every call (cheap driver metadata), so
    // files added to the dir mid-session are seen — only the expensive
    // per-file header resolution + union assembly is cached, keyed by
    // the exact file list
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/$pattern"))
      .map(_.getPath.toString).sorted.toSeq
    require(files.nonEmpty, s"no files match $dir/$pattern")
    val perSession = planCache.synchronized {
      var m = Option(planCache.get(spark)).flatMap(r => Option(r.get())).orNull
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[Seq[String], DataFrame]()
        planCache.put(spark, new java.lang.ref.SoftReference(m))
      }
      m
    }
    perSession.computeIfAbsent(files, readResults(spark, _))
  }

  /** Assembled-union plan cache: per-file CSV resolution costs a driver
    * file read each, and four declared queries share the same source —
    * the DataFrame (an immutable logical plan) is safe to hand out
    * repeatedly. Keyed weakly by session, then by the globbed file list
    * (a new file ⇒ a new plan, never a stale union).
    *
    * The per-session map is held through a SoftReference: the cached
    * DataFrames strongly reference their SparkSession, so holding them
    * strongly here would keep the weak KEY reachable through the value
    * and the entry would never collect (the WeakHashMap javadoc's
    * value-refers-to-key trap). Softly held, the collector can sever
    * the value→key chain under memory pressure, after which the stale
    * session's entry is collectable — a session-churning process sheds
    * old plans instead of leaking every session's sessionState. */
  private val planCache =
    new java.util.WeakHashMap[SparkSession, java.lang.ref.SoftReference[
      java.util.concurrent.ConcurrentHashMap[Seq[String], DataFrame]]]()
}
