package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Shared lake-file maintenance for the persisted indexes (the PQ
  * postings and the LSH band index are the same problem: partition
  * appends pile one file per touched partition per batch, and after B
  * ingest batches a pruned serve opens O(B) files per partition —
  * footer reads eat the pruning win).
  *
  * [[compactPartitioned]] rewrites rows UNCHANGED — pure file-layout
  * maintenance — hash-repartitioned ON the partition column so each
  * partition's rows land wholly in one task and the partitioned writer
  * emits exactly one file per partition. Staged beside the live
  * directory, then rename-swapped: never read-and-overwrite the same
  * path (Spark refuses it, and a failed in-place rewrite would destroy
  * the index). The two renames are atomic on HDFS-like filesystems; on
  * S3-consistency stores run single-writer with serving paused, or
  * adopt a manifest/table format — the contract every plain-parquet
  * lake compaction carries. Cadence: compact when files-per-partition
  * reaches a small multiple of 1; the rewrite cost is one scan + one
  * shuffle of fingerprint-width rows.
  */
object LakeMaintenance {

  def compactPartitioned(spark: SparkSession, dir: String,
                         partitionCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(dir)
    val stage = new Path(s"$dir.compact_stage")
    val retired = new Path(s"$dir.compact_old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stage, true)
    fs.delete(retired, true)
    spark.read.parquet(live.toString)
      .repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol)
      .parquet(stage.toString)
    if (!fs.rename(live, retired))
      sys.error(s"compactPartitioned: could not retire $live")
    if (!fs.rename(stage, live)) {
      fs.rename(retired, live) // roll back — the old layout stays live
      sys.error(s"compactPartitioned: could not promote $stage")
    }
    fs.delete(retired, true)
  }
}
