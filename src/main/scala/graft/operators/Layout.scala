package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Multi-dimensional data layout: Z-order clustering for min/max file
  * skipping, plus hive-style partition layout for dynamic partition
  * pruning.
  *
  * Why this exists at 100 TB: a table can only be SORTED on one key.
  * Queries that filter on a second column scan every file, because each
  * file's parquet footer min/max on that column spans the whole domain.
  * Z-ordering interleaves the bits of several columns into one cluster
  * key; sorting by it gives every file a tight min/max range on EVERY
  * participating column, so the scan planner (parquet row-group stats +
  * Spark file pruning) skips most of the table for a selective filter on
  * any of them. This is the same layout trick Delta Lake's OPTIMIZE
  * ZORDER BY applies; here it is a plain parquet write, no table format
  * required.
  *
  * The layout is an OPTIMIZATION ONLY: the row set is bit-identical to
  * the input under any layout (q60 puts one z-ordered roundtrip under the
  * dual-engine DuckDB gate), and LayoutSpec measures the actual file
  * skipping — a 2-D box probe touches strictly fewer z-ordered files than
  * single-column-sorted files on the same data.
  */
object Layout {

  /** Interleave the low `bits` bits of `bucketCols` (LongType bucket
    * indexes in [0, 2^bits)) into one Z-value: bit j of column k lands at
    * position j*n + k. Pure shift/and/or expression tree — stays inside
    * whole-stage codegen, no UDF. `bits * n` ≤ 62 keeps the result in a
    * non-negative Long.
    */
  def interleaveBits(bucketCols: Seq[Column], bits: Int): Column = {
    val n = bucketCols.size
    require(n >= 1, "at least one column")
    require(bits >= 1 && bits * n <= 62, s"bits*cols must be in [1,62], got ${bits * n}")
    val terms = for {
      (c, k) <- bucketCols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + k)
    terms.reduce(_.bitwiseOR(_)).cast(LongType)
  }

  /** Equal-width bucket index in [0, 2^bits): linear min/max scaling.
    * Nulls and a degenerate (min == max) domain map to bucket 0. Exact
    * for the uniform-ish columns it is meant for; for heavy-tailed
    * columns use [[rankBucket]] (equal-frequency) instead — equal-width
    * binning of a lognormal column collapses most rows into bucket 0 and
    * the z-curve degenerates to a sort on the other columns.
    */
  private def linearBucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val nb = 1L << bits
    if (!(hi > lo)) lit(0L)
    else {
      val raw = floor((c.cast(DoubleType) - lit(lo)) / lit(hi - lo) * lit(nb.toDouble))
      when(c.isNull, lit(0L))
        .otherwise(least(lit(nb - 1), greatest(lit(0L), raw.cast(LongType))))
    }
  }

  /** Equal-frequency bucket index in [0, nBoundaries]: the count of
    * boundaries ≤ v, folded over a broadcast boundary array literal (one
    * codegen'd loop per row — boundaries are 2^bits-1 elements, so keep
    * `bits` ≤ 8 in this mode). Nulls map to bucket 0.
    */
  private def rankBucket(c: Column, boundaries: Array[Double]): Column =
    when(c.isNull, lit(0L)).otherwise(
      aggregate(typedlit(boundaries), lit(0L),
        (acc, b) => acc + when(c.cast(DoubleType) >= b, 1L).otherwise(0L)))

  /** Add a `_z` cluster-key column interleaving `cols`.
    *
    * One bounded stats action per call (min/max, or quantile boundaries
    * in rank mode — ≤ 2^bits doubles per column on the driver, the same
    * bounded-driver-bytes posture as the Bloom build). `rankMode` buys
    * skew resistance: buckets are corpus quantiles, so every bucket holds
    * ~equal row counts no matter the value distribution.
    */
  def zOrdered(df: DataFrame, cols: Seq[String], bits: Int = 12,
               rankMode: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "at least one z-order column")
    val buckets: Seq[Column] =
      if (rankMode) {
        require(bits <= 8, s"rank mode folds 2^bits-1 boundaries per row; bits=$bits > 8")
        val nb = 1 << bits
        val probs = (1 until nb).map(_.toDouble / nb).toArray
        cols.map { c =>
          // relativeError 1/(4·nb): boundary placement error well under a
          // bucket width — layout quality, not correctness, is at stake
          val bs = df.stat.approxQuantile(c, probs, 0.25 / nb)
          rankBucket(col(c), bs)
        }
      } else {
        val statCols = cols.flatMap(c =>
          Seq(min(col(c).cast(DoubleType)), max(col(c).cast(DoubleType))))
        val row = df.agg(statCols.head, statCols.tail: _*).head()
        cols.zipWithIndex.map { case (c, i) =>
          // empty input or an all-null column yields null min/max: map the
          // whole (degenerate) domain to bucket 0, matching the documented
          // null policy, instead of an opaque NPE out of getDouble
          if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) lit(0L)
          else linearBucket(col(c), row.getDouble(2 * i), row.getDouble(2 * i + 1), bits)
        }
      }
    df.withColumn("_z", interleaveBits(buckets, bits))
  }

  /** Write `df` as `nChunks` z-contiguous parquet directories
    * (`z_chunk=K/`), rows sorted by `_z` within each file.
    *
    * Chunk id = the z-value's high bits (equal-width split of z-space) —
    * deterministic, no range-sampling pass (`repartitionByRange` samples
    * with a run-dependent seed; see Export.writeShards for the same
    * decision). Hash-partitioning the chunk ids can co-locate two chunks
    * in one task, but `partitionBy` still splits them into their own
    * directories, so every output file holds exactly one z-range —
    * locality is structural, not scheduling-dependent. Equal-width chunks
    * are balanced when buckets are (use rankMode for skewed columns — its
    * equal-frequency buckets make z-space density uniform by
    * construction).
    */
  def zOrderWrite(df: DataFrame, cols: Seq[String], path: String,
                  nChunks: Int, bits: Int = 12, rankMode: Boolean = false): Unit = {
    require(nChunks >= 1, "nChunks must be >= 1")
    // uniform contract with zOrdered: rank mode REQUIRES bits <= 8 (it
    // folds 2^bits-1 boundaries per row) — no silent clamping here that
    // zOrdered would then reject anyway
    val zSpace = 1L << (bits * cols.size)
    val chunkWidth = math.max(1L, zSpace / nChunks)
    zOrdered(df, cols, bits, rankMode)
      .withColumn("z_chunk", (col("_z") / chunkWidth).cast(LongType))
      .repartition(nChunks, col("z_chunk"))
      .sortWithinPartitions(col("z_chunk"), col("_z"))
      .drop("_z")
      .write.partitionBy("z_chunk").mode("overwrite").parquet(path)
  }

  /** Hive-style partitioned layout (`partCol=value/` directories): the
    * coarse-grained companion to z-ordering. Static filters on the
    * partition column prune directories at PLAN time; joins against a
    * filtered dimension prune them at RUN time via dynamic partition
    * pruning (LayoutSpec asserts the `dynamicpruning` subquery appears in
    * the physical plan). Partition columns must be low-cardinality — one
    * directory per value is the classic small-files bomb for high-
    * cardinality keys, which is what [[zOrderWrite]] is for.
    */
  def writePartitioned(df: DataFrame, partCol: String, path: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").parquet(path)

  /** Compact a small-files parquet directory into ~`targetFileBytes`
    * files — the operational companion to [[zOrderWrite]]: streaming
    * sinks and over-parallel writers leave thousands of KB-scale files,
    * and at 100 TB the file count itself becomes the bottleneck (driver
    * listing memory, task-per-file scheduling, footer-read storms). One
    * file-size estimate from the read's own file index (no data pass),
    * then a single round-robin repartition to the target count. Returns
    * the target count. Ordering within files is NOT preserved — compact
    * BEFORE sort/z-order steps, or re-run [[zOrderWrite]] instead when
    * clustering matters.
    */
  def compactSmallFiles(spark: SparkSession, path: String, outPath: String,
                        targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(path)
    // resolve sizes through the Hadoop FileSystem API, not java.io.File:
    // File.length() is 0 for any non-local scheme (hdfs://, s3a://), which
    // would silently collapse nFiles to 1 and rewrite 100 TB as one file
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val totalBytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hadoopConf).getFileStatus(p).getLen
    }.sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    df.repartition(nFiles).write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Per-file min/max of `cols` for every parquet part-file under `path`
    * — the harness view of what the scan planner's stats pruning sees.
    * Returns (file, col_min, col_max, …) one row per file. Test/audit
    * utility (reads the files; a production skipping check would read
    * footers only).
    */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
