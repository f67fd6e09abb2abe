package graft

import java.net.URI
import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

object TestFs {
  /** Number of file opens served by the custom scheme — proves reads
    * actually went through this FileSystem, not the default one. */
  @volatile var opens: Int = 0

  /** The value of `fs.testfs.readahead.range` as seen by the FileSystem
    * INSTANCE at open() time (r12): proves per-scheme tuning keys travel
    * the same Hadoop-conf channel `fs.s3a.readahead.range` would —
    * session conf → FileSystem.getConf → visible inside the connector
    * during the read. */
  @volatile var readaheadSeen: String = _
}

/** A local-disk Hadoop FileSystem registered under the `testfs://`
  * scheme: lets the RemoteIO storage_options analog be exercised
  * end-to-end against a NON-default scheme inside the sandbox (the real
  * object-store round-trip needs network + connector jars; the conf
  * application, scheme resolution, and FileSystem dispatch are identical
  * and are what this class makes observable). */
class TestFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("testfs:///")
  override def getScheme: String = "testfs"
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    TestFs.opens += 1
    TestFs.readaheadSeen = getConf.get("fs.testfs.readahead.range")
    super.open(f, bufferSize)
  }
}
