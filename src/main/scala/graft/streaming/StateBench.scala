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
      // The recurring rocksdbjni SEGV (r10–r12 hs_err files, identical
      // LoggerJniCallback/_Hashtable frame at ~90 s elapsed every time)
      // is the state-store MAINTENANCE thread firing at its 60 s
      // default and asynchronously unloading the finished probes'
      // providers — the RocksDB close disposes the Java-side JNI
      // logger while a native background-flush thread is still logging
      // through it. The probe run is ~100 s and needs no maintenance
      // (no snapshot upload matters, temp checkpoints are discarded),
      // so push the interval past any possible run length: no
      // maintenance fires, no async close happens, and the final
      // halt() skips the teardown close — no close path ever runs.
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "6h")
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

    var completed = 0
    probes.foreach { p =>
      val r = p match {
        case "hdfs" => measure(None, Map.empty)
        case "rocksdb" => measure(Some(RocksProvider), Map.empty)
        case "rocksdb_changelog" => measure(Some(RocksProvider), Map(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
            -> "true"))
      }
      r.filter(v => v.isFinite && v > 0d).foreach { v =>
        // one line per completed probe, flushed NOW — any later native
        // fault loses only the probes not yet printed
        println(f"metric=${metricName(p)} value=$v%.4f")
        System.out.flush()
        completed += 1
      }
    }
    // Do NOT run Spark/StateStore teardown: `spark.stop()` closes every
    // loaded RocksDB instance, and that close races a native
    // background-flush thread against the JNI logger teardown
    // (`LoggerJniCallback::Logv` SEGV — hs_err_pid13496 r11,
    // hs_err_pid842 r10). With the maintenance interval pushed out
    // above, NO close path runs in this process at all. The halt code
    // reflects validated output (all requested probes printed a finite
    // positive metric), so a future partial/garbage run no longer
    // masquerades as success just by reaching end of main.
    //
    // Close the state stores for real before halting (r13, third
    // attempt — this time from EVIDENCE: the ErrorFile-captured hs_err
    // shows the SEGV is a native ROCKSDB BACKGROUND THREAD inside
    // BlockBasedTable::Open → PrefetchIndexAndFilterBlocks, racing
    // process exit — halt()'s ::exit runs librocksdbjni's static
    // destructors while the never-closed DBs are still compacting the
    // probe's 12M freshly-written rows; a sleep can't bound that, and
    // the JNI logger was never the culprit. RocksDB's close cancels
    // and WAITS for background work, and with the maintenance interval
    // pushed to 6h there is no concurrent maintenance unload (the
    // r10–r12 double-unload race that made teardown crash in the first
    // place) — so a single synchronous StateStore.stop() on this
    // thread is an orderly close. halt afterwards still skips the
    // Spark shutdown hooks.
    System.out.flush()
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => () }
    Runtime.getRuntime.halt(if (completed == probes.size) 0 else 3)
  }
}
