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
