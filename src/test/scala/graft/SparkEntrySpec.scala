package graft

/** Driver-contract invariants: every oracle entry has a query, the
  * flagship smoke query returns rows, and every declared query runs
  * non-empty at the smoke scale factor with a sane schema. */
class SparkEntrySpec extends SparkSpec {

  private val smokeDir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query functions tolerate concurrent invocation on a shared session") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import org.apache.spark.sql.functions.col
    // region_rollup registers a temp view; concurrent runs over
    // DIFFERENT scale factors must each aggregate their own data — a
    // fixed view name would let one run silently read the other's.
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val runs = dirs.map(d => Future {
      // grand-total row (both grouping columns NULL) carries the
      // supplier count, which differs 10x between the two sfs
      SparkEntry.queries("region_rollup")(spark, d)
        .filter(col("r_name").isNull && col("n_name").isNull)
        .collect().head.getAs[Long]("suppliers")
    })
    val totals = Await.result(Future.sequence(runs), 120.seconds)
    val expected = dirs.map(d =>
      Tables.supplier(spark, d).count())
    assert(totals === expected)
  }

  test("indexed serve memoizes its build: repeat invocations reuse one index dir") {
    // the r14 contract behind the serve-only bench number: the first
    // invocation builds the persisted index into a unique temp dir;
    // later invocations (and the probe2 sibling on the same corpus)
    // must SERVE from it, not rebuild — observable as exactly one new
    // graft_pq_index_* directory across three invocations
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def indexDirs(): Set[String] = tmp.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_pq_index_"))
      .map(_.getName).toSet
    val before = indexDirs()
    val a = SparkEntry.queries("ann_ivf_pq_indexed")(spark, smokeDir).count()
    val mid = indexDirs()
    val b = SparkEntry.queries("ann_ivf_pq_indexed")(spark, smokeDir).count()
    val c = SparkEntry.queries("ann_ivf_pq_indexed_probe2")(spark, smokeDir).count()
    val after = indexDirs()
    assert(a > 0 && b > 0 && c > 0)
    assert((mid -- before).size <= 1, "first invocation builds at most one dir")
    assert(after === mid,
      "repeat and probe2 invocations must serve from the memoized index")
  }

  test("every declared query runs non-empty at sf0.001 with unique columns") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, smokeDir)
        val cols = df.columns
        if (cols.distinct.length != cols.length)
          Some(s"$name: duplicate columns ${cols.mkString(",")}")
        else if (df.count() == 0)
          Some(s"$name: empty result")
        else None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
