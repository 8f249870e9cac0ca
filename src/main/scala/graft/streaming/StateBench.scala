package graft.streaming

import org.apache.spark.sql.SparkSession

/** Crash-isolated state-store throughput probe — a tiny main the bench
  * FORKS as a child JVM instead of running in-process.
  *
  * Why a fork: the RocksDB JNI logger callback can SIGSEGV when a
  * native background-flush thread logs through it during DB close
  * (`LoggerJniCallback::Logv`, observed in the r10 bench —
  * hs_err_pid842). The callback fires even at ERROR level (shutdown
  * flushes log unconditionally), so no conf reliably silences it; a
  * native crash cannot be caught in-process. Isolating the probe means
  * a segfault costs one retryable child exit instead of the whole
  * bench run and every metric after it.
  *
  * Protocol: args are probe names from {hdfs, rocksdb,
  * rocksdb_changelog}; each completed probe prints ONE line
  * `metric=<name> value=<rows/s>` to stdout, flushed immediately — a
  * crash mid-run loses only the probes not yet printed. Env knobs:
  * `SPARK_GRAFT_CPUS` (parallelism), `SPARK_GRAFT_STATE_ROWS`
  * (rows/s of the rate source, default 2M).
  */
object StateBench {

  val RocksProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def metricName(probe: String): String = probe match {
    case "hdfs" => "stream_state_rows_per_sec_hdfs"
    case "rocksdb" => "stream_state_rows_per_sec_rocksdb"
    case "rocksdb_changelog" => "stream_state_rows_per_sec_rocksdb_changelog"
    case other => throw new IllegalArgumentException(s"unknown probe: $other")
  }

  def main(args: Array[String]): Unit = {
    val probes = if (args.nonEmpty) args.toSeq
      else Seq("hdfs", "rocksdb", "rocksdb_changelog")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val rows = sys.env.get("SPARK_GRAFT_STATE_ROWS").map(_.toLong)
      .getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def measure(provider: Option[String],
        extra: Map[String, String]): Option[Double] = {
      // warm run pays source/sink setup + codegen + (for RocksDB) the
      // native library load, then the measured run
      EventsStream.statefulThroughput(spark, 100000L,
        providerClass = provider, minBatches = 2, extraConfs = extra)
      EventsStream.statefulThroughput(spark, rows,
        providerClass = provider, minBatches = 6, extraConfs = extra)
    }

    probes.foreach { p =>
      val r = p match {
        case "hdfs" => measure(None, Map.empty)
        case "rocksdb" => measure(Some(RocksProvider), Map.empty)
        case "rocksdb_changelog" => measure(Some(RocksProvider), Map(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
            -> "true"))
      }
      r.foreach { v =>
        // one line per completed probe, flushed NOW — the crash window
        // is the next probe's DB close, and this result must survive it
        println(f"metric=${metricName(p)} value=$v%.4f")
        System.out.flush()
      }
    }
    // Do NOT run Spark/StateStore teardown: `spark.stop()` closes every
    // loaded RocksDB instance, and that close races a native
    // background-flush thread against the JNI logger teardown
    // (`LoggerJniCallback::Logv` SEGV on a nulled callback ref —
    // hs_err_pid13496, r11; hs_err_pid842, r10). The crash window is
    // exactly this shutdown path, after every metric line above has
    // already been printed and flushed — so a hard halt loses nothing,
    // guarantees exit code 0, and leaves no hs_err artifact. Temp
    // checkpoint dirs are reclaimed by the OS tmpdir, not by us.
    System.out.flush()
    Runtime.getRuntime.halt(0)
  }
}
