package graft.streaming

import java.sql.Timestamp

/** The Kinesis record envelope — exactly the fields the reference handler
  * reads (Handler.java:73-87,169-171; FIXTURES.md §A.2). In production this
  * schema comes from a Kinesis source connector; the zero-egress harness
  * produces it from MemoryStream/file sources.
  *
  * @param data payload bytes (UTF-8 JSON CDC doc, FIXTURES.md §A.1)
  * @param partitionKey preserved verbatim on forward (Handler.java:81)
  * @param sequenceNumber opaque, totally ordered per shard (Handler.java:73)
  * @param approximateArrivalTimestamp used for replication lag (Handler.java:87,97)
  * @param streamName parsed from eventSourceARN once per batch (Handler.java:63,169-171)
  */
case class KinesisRecord(
    data: Array[Byte],
    partitionKey: String,
    sequenceNumber: String,
    approximateArrivalTimestamp: Timestamp,
    streamName: String)

/** The CDC payload shape documented at README.md:11-16 — `key` is int64
  * (README.md:122: up to 10^10), `commitTimestamp` stays a STRING to keep
  * the reference's text-compare semantics (Handler.java:86; ISO-8601 UTC
  * strings order identically as text and as instants).
  */
case class CdcPayload(key: Long, commitTimestamp: String)
