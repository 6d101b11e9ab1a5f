package graft.rawdata

/** Typed failure parity with the reference rawdata API
  * (no.ssb.rawdata.api — the exception types AvroRawdataProducer.java:206
  * / AvroRawdataClient.java:89-115 throw), so a call-for-call migration
  * observes the same failure modes.
  *
  * RawdataClosedException extends IllegalStateException: use-after-close
  * IS an illegal state, and callers that caught the untyped form keep
  * working.
  */
class RawdataClosedException(what: String = "rawdata client")
  extends IllegalStateException(s"$what is closed")

/** reference RawdataNotBufferedException: publish(positions...) named a
  * position that was never buffered on this producer
  */
class RawdataNotBufferedException(position: String)
  extends IllegalStateException(s"position '$position' has not been buffered")

/** reference RawdataNoSuchPositionException: cursorOf(position, …) found
  * no message with that position inside the tolerance window
  */
class RawdataNoSuchPositionException(position: String)
  extends NoSuchElementException(s"no message with position '$position'")
