package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism guard for kernel-heavy per-row stages.
  *
  * Parquet scans can only split at row-group boundaries, so a table written
  * as few large row groups (the driver testdata is ONE row group per file)
  * scans as that many tasks regardless of `maxPartitionBytes` — and every
  * per-row kernel behind it (shingle/MinHash sketches, image codecs, RIFF
  * walks, bigram counting) then runs on a single core while the rest of the
  * machine idles. That is the "one huge unsplittable file" input-skew case:
  * fix by repartitioning immediately after the read — but ONLY when the scan
  * is actually narrow, because at production scale a 100 TB table has
  * thousands of row groups, the scan is already wide, and an unconditional
  * repartition would shuffle the whole corpus for nothing.
  *
  * The guard is scale-adaptive by construction: it compares the planned scan
  * partition count against the session's default parallelism (cores in local
  * mode, executor slots on a cluster) and inserts a deterministic
  * hash-repartition on the caller's row key only when narrower. The key is a
  * real column (never rand-derived), so retried tasks reproduce the same
  * row-to-partition assignment (SPARK-38388 posture).
  */
private[graft] object Scans {
  def spread(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
  }
}
