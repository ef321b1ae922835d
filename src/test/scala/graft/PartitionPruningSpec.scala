package graft

import org.apache.spark.sql.functions._

/** Partition-layout discipline: a 100 TB events lake is written
  * partitioned by a coarse key, and point/range queries must prune to
  * the matching directories at PLAN time (PartitionFilters), never
  * scanning the rest. */
class PartitionPruningSpec extends SparkSpec {

  import spark.implicits._

  test("filters on the partition column prune partitions at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("events_part").toString
    Seq(
      (1L, "click", 1.0), (2L, "click", 2.0),
      (3L, "view", 3.0), (4L, "error", 4.0)
    ).toDF("event_id", "event_type", "value")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scanExec = q.queryExecution.executedPlan.collectLeaves().head
    // the partition predicate reaches the scan node...
    assert(scanExec.toString.contains("PartitionFilters") &&
      scanExec.toString.contains("event_type"), scanExec.toString)
    // ...and executing THIS plan reads only the matching partition's
    // files (inputFiles would lie — it reports the unpruned file index)
    val rows = q.queryExecution.executedPlan.execute().count()
    assert(rows === 2)
    val totalFiles = spark.read.parquet(dir).inputFiles.length
    val readFiles = scanExec.metrics("numFiles").value
    assert(readFiles < totalFiles,
      s"scan read $readFiles of $totalFiles files — no pruning")
  }
}
