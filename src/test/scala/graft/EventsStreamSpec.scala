package graft

import graft.streaming.EventsStream

class EventsStreamSpec extends SparkSpec {

  test("streaming windowed aggregate equals the batch aggregate") {
    val batch = EventsStream.windowedCountsBatch(spark, sfDir)
    val stream = EventsStream.windowedCountsStreaming(spark, sfDir, "events_stream_spec")
    assert(batch.count() > 0)
    assert(stream.exceptAll(batch).count() === 0, "streaming rows not in batch")
    assert(batch.exceptAll(stream).count() === 0, "batch rows not in streaming")
  }
}
