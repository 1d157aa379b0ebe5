package graft

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Test-only local filesystem under the `countfs:` scheme (registered
  * via META-INF/services so every `new Configuration()` resolves it)
  * that records which directories get LISTED — the observable for
  * "partition-filter-aware listing never touches excluded value dirs",
  * which neither exceptions (local listings don't fail) nor Hadoop's
  * statistics (RawLocalFileSystem doesn't count listStatus) can see. */
class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "countfs"
  override def getUri: java.net.URI = java.net.URI.create("countfs:///")
  override def listStatus(f: Path): Array[FileStatus] = {
    CountingFileSystem.listed.add(f.toUri.getPath)
    super.listStatus(f)
  }
}

object CountingFileSystem {
  val listed: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
