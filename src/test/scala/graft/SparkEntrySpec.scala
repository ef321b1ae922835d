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
    // region_rollup registers a temp view; concurrent runs must not
    // cross-contaminate (unique view names per invocation).
    val runs = (1 to 4).map(_ => Future {
      SparkEntry.queries("region_rollup")(spark, smokeDir).count()
    })
    val counts = Await.result(Future.sequence(runs), 120.seconds)
    assert(counts.distinct.length === 1 && counts.head > 0)
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
