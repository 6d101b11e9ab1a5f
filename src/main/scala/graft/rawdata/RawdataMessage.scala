package graft.rawdata

/** In-engine message row. Mirrors the reference's Avro record
  * (AvroRawdataProducer.java:44-50): 16-byte ULID id, optional ordering
  * group, sequence number, external position, named binary payloads.
  */
case class RawdataMessage(
    id: Array[Byte],
    orderingGroup: Option[String],
    sequenceNumber: Long,
    position: String,
    data: Map[String, Array[Byte]])
