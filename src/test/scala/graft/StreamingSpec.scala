package graft

import graft.streaming.EventsStream

/** Streaming-tier specs beyond the q49/q50 parity gate. */
class StreamingSpec extends SparkSpec {

  test("rateThroughput measures positive engine rows/sec") {
    val rps = EventsStream.rateThroughput(
      spark, rowsPerSecond = 20000L, minBatches = 2)
    assert(rps > 0.0, s"expected positive throughput, got $rps")
  }
}
