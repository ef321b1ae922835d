package graft

import org.apache.spark.sql.SparkSession

/** The reference's CLI grammar (SURVEY.md §2.4) as one entry point:
  *
  *   graft.Cli [algo] <sizes...> [-r|--repeats R] [--block BS]
  *             [--density D] [-p|--threads P] [--out DIR]
  *
  * Stage 1: `graft.Cli 64 128 256 -r 3`           (algo defaults basic)
  * Stage 2: `graft.Cli blocked 128 256 --block 64 --density 0.05`
  * Stage 3: `graft.Cli 256 512 1024 -p 8 -r 3`    (threads = local[p])
  *
  * Output: the reference-shaped results CSV (BenchHarness schema) under
  * --out (default ./results), one row per repeat (Q5), plus the rows on
  * stdout.
  */
object Cli {

  final case class CliConfig(bench: BenchConfig, threads: Int, out: String)

  val Algos: Set[String] = Set("basic", "blocked", "transposed", "sparse", "square")

  def parse(args: Seq[String]): CliConfig = {
    var algos = Vector.empty[String]
    var sizes = Vector.empty[Long]
    var repeats = 3
    var block = 64
    var density = 0.05
    var threads = 0
    var out = "results"
    var i = 0
    def arg(flag: String): String = {
      require(i + 1 < args.length, s"$flag requires a value")
      args(i + 1)
    }
    while (i < args.length) {
      args(i) match {
        case f @ ("-r" | "--repeats") => repeats = arg(f).toInt; i += 2
        case f @ "--block"            => block = arg(f).toInt; i += 2
        case f @ "--density"          => density = arg(f).toDouble; i += 2
        case f @ ("-p" | "--threads") => threads = arg(f).toInt; i += 2
        case f @ "--out"              => out = arg(f); i += 2
        case f @ "--algo"             => // Python-variant flag form
          val a = arg(f)
          require(Algos(a), s"unknown algo '$a' (expected one of ${Algos.mkString(", ")})")
          algos :+= a; i += 2
        case a if Algos(a)            => algos :+= a; i += 1
        case n                        =>
          val size = try n.toLong catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"unrecognized argument '$n' (not a flag, algo, or size)")
          }
          require(size > 0, s"size must be positive, got $size")
          sizes :+= size; i += 1
      }
    }
    require(sizes.nonEmpty, "at least one size required")
    CliConfig(
      BenchConfig(sizes = sizes,
        algos = if (algos.isEmpty) Seq("basic") else algos,
        repeats = repeats, blockSize = block, density = density),
      threads, out)
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args.toIndexedSeq)
    val cores =
      if (cfg.threads > 0) cfg.threads.toString
      else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = BenchHarness.run(spark, cfg.bench)
    BenchHarness.writeCsv(results, cfg.out)
    results.show(numRows = 1000, truncate = false)
    spark.stop()
  }
}
