package graft.rawdata

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, PositionedReadable, RawLocalFileSystem, Seekable}

/** Test-only Hadoop FileSystem emulating the object-store failure modes
  * the reference's GCS backend is built around
  * (GCSSeekableInput.java's channel reopen, TopicAvroFileCache's
  * min-interval listing against an eventually-visible LIST):
  *
  *  - **stale listings**: with `visibilityLagMs > 0`, a file stays
  *    INVISIBLE to listStatus until `visibilityLagMs` after the first
  *    listing that could have seen it (point lookups — exists/open —
  *    stay strongly consistent, matching real object stores where LIST
  *    lags GET);
  *  - **read channel resets**: with `injectReadFaults` on, the FIRST
  *    read call against each file throws IOException once (then that
  *    file reads normally) — the transient reset a remote read channel
  *    produces.
  *
  * Registered under the `faulty:` scheme via
  * `fs.faulty.impl = graft.rawdata.FaultyFileSystem`; state is static so
  * Hadoop's FileSystem instance cache is irrelevant.
  */
class FaultyFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("faulty:///")
  override def getScheme: String = "faulty"
  // accept faulty:-scheme paths against the local backing store
  override def checkPath(path: Path): Unit = ()

  override def listStatus(f: Path): Array[FileStatus] = {
    val real = super.listStatus(f)
    val lag = FaultyFileSystem.visibilityLagMs
    if (lag <= 0) real
    else {
      val now = System.nanoTime() / 1000000L
      real.filter { st =>
        val first = FaultyFileSystem.firstSeen
          .computeIfAbsent(st.getPath.toString, _ => now)
        val visible = now - first >= lag
        if (!visible) FaultyFileSystem.suppressedListings.incrementAndGet()
        visible
      }
    }
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val real = super.open(f, bufferSize)
    if (!FaultyFileSystem.injectReadFaults) real
    else new FSDataInputStream(new FaultyFileSystem.FaultyStream(real, f.toString))
  }
}

object FaultyFileSystem {
  @volatile var visibilityLagMs: Long = 0L
  @volatile var injectReadFaults: Boolean = false

  private[rawdata] val firstSeen =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val faulted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val suppressedListings = new java.util.concurrent.atomic.AtomicLong()
  val injectedResets = new java.util.concurrent.atomic.AtomicLong()

  def reset(): Unit = {
    visibilityLagMs = 0L
    injectReadFaults = false
    firstSeen.clear()
    faulted.clear()
    suppressedListings.set(0L)
    injectedResets.set(0L)
  }

  /** true exactly once per path — the single reset that path gets */
  private def markFaulted(key: String): Boolean = faulted.add(key)

  /** Delegating stream that throws IOException on the first read call
    * its path ever sees, then behaves normally.
    */
  private final class FaultyStream(in: FSDataInputStream, key: String)
      extends java.io.InputStream with Seekable with PositionedReadable {
    private def maybeFault(): Unit =
      if (injectReadFaults && markFaulted(key)) {
        injectedResets.incrementAndGet()
        throw new java.io.IOException(s"injected channel reset: $key")
      }
    override def read(): Int = { maybeFault(); in.read() }
    override def read(b: Array[Byte], off: Int, len: Int): Int = { maybeFault(); in.read(b, off, len) }
    override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
      maybeFault(); in.read(position, buffer, offset, length)
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      maybeFault(); in.readFully(position, buffer, offset, length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit = {
      maybeFault(); in.readFully(position, buffer)
    }
    override def seek(pos: Long): Unit = in.seek(pos)
    override def getPos: Long = in.getPos
    override def seekToNewSource(targetPos: Long): Boolean = in.seekToNewSource(targetPos)
    override def skip(n: Long): Long = in.skip(n)
    override def available(): Int = in.available()
    override def close(): Unit = in.close()
  }
}
