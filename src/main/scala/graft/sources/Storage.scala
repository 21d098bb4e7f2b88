package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Filesystem abstraction (reference core/Storage/Storage.scala:16-183 —
  * FSNode/LocalStorage/HDFSStorage + WriteMode, tmp sandbox, mtime cache).
  *
  * The reference maintains parallel Local/HDFS implementations; on Spark
  * the Hadoop `FileSystem` API already virtualizes local, HDFS, and object
  * stores behind one interface, so graft has ONE implementation keyed by
  * the path's scheme — the idiomatic re-expression, not a port. Preserved
  * capabilities: WriteMode semantics, a per-run tmp sandbox whose files are
  * tracked and bulk-deleted, `last(pattern)` (newest matching file) and
  * `isUnchanged` modification-time caching (the reference's cheap
  * "did the input move?" probe for incremental jobs).
  */
sealed trait WriteMode
object WriteMode {
  case object Overwrite extends WriteMode
  case object IgnoreIfExists extends WriteMode
  case object FailIfExists extends WriteMode
}

/** One file/directory handle bound to its Storage. */
case class FSNode(path: String, storage: Storage) {
  private def hPath = new Path(path)
  def exists: Boolean = storage.fs(path).exists(hPath)
  def isDirectory: Boolean = storage.fs(path).getFileStatus(hPath).isDirectory
  def delete(recurse: Boolean = false): Unit = storage.fs(path).delete(hPath, recurse)
  def modificationTime: Long = storage.fs(path).getFileStatus(hPath).getModificationTime

  def list(recursive: Boolean = false): Seq[FSNode] = {
    val fs = storage.fs(path)
    if (!fs.exists(hPath)) return Nil
    val out = Seq.newBuilder[FSNode]
    val it = fs.listFiles(hPath, recursive)
    while (it.hasNext) out += FSNode(it.next().getPath.toString, storage)
    out.result()
  }

  /** Newest file under this node whose NAME matches `pattern` (regex) —
    * reference `last(pattern)`: pick up the latest snapshot/export. */
  def last(pattern: String): Option[FSNode] = {
    val re = pattern.r
    list(recursive = true)
      .filter(n => re.findFirstIn(new Path(n.path).getName).isDefined)
      .sortBy(n => (-n.modificationTime, n.path))
      .headOption
  }

  def getContent: InputStream = storage.fs(path).open(hPath)
  def getContentAsString: String = {
    val in = getContent
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  def setContent(content: String, mode: WriteMode = WriteMode.FailIfExists): FSNode =
    setContent(new ByteArrayInputStream(content.getBytes(StandardCharsets.UTF_8)), mode)

  def setContent(content: InputStream, mode: WriteMode): FSNode = {
    val fs = storage.fs(path)
    mode match {
      case WriteMode.IgnoreIfExists if fs.exists(hPath) => return this
      case WriteMode.FailIfExists if fs.exists(hPath) =>
        throw new IllegalStateException(s"$path already exists")
      case _ =>
    }
    val out = fs.create(hPath, true)
    try content.transferTo(out) finally { out.close(); content.close() }
    this
  }

  def move(to: FSNode, mode: WriteMode): FSNode = {
    val fs = storage.fs(path)
    val dest = new Path(to.path)
    mode match {
      case WriteMode.IgnoreIfExists if fs.exists(dest) => return to
      case WriteMode.FailIfExists if fs.exists(dest) =>
        throw new IllegalStateException(s"${to.path} already exists")
      case WriteMode.Overwrite if fs.exists(dest) => fs.delete(dest, true)
      case _ =>
    }
    fs.mkdirs(dest.getParent)
    if (!fs.rename(hPath, dest))
      throw new java.io.IOException(s"cannot move $path -> ${to.path}")
    to
  }

  /** Modification-time probe with caching (reference `isUnchanged`):
    * true when the node's mtime equals the cached value from the previous
    * probe — lets incremental jobs skip recomputation when inputs are
    * stable. First probe returns false and primes the cache. */
  def isUnchanged: Boolean = {
    val mt = if (exists) modificationTime else -1L
    val prev = storage.mtimeCache.put(path, mt)
    prev.contains(mt)
  }
}

class Storage(conf: Configuration) extends Serializable {
  @transient private lazy val fsCache = mutable.Map.empty[String, FileSystem]
  private[sources] val mtimeCache = mutable.Map.empty[String, Long]
  private val tmpFiles = mutable.ArrayBuffer.empty[FSNode]
  private val runId = java.util.UUID.randomUUID().toString.take(10)

  private[sources] def fs(path: String): FileSystem = synchronized {
    val uri = new Path(path).toUri
    val key = Option(uri.getScheme).getOrElse("") + Option(uri.getAuthority).getOrElse("")
    fsCache.getOrElseUpdate(key, new Path(path).getFileSystem(conf))
  }

  def getNode(path: String): FSNode = FSNode(path, this)

  /** Per-run tmp sandbox (reference `sandBoxDir` + tmp tracking): nodes
    * created here are remembered and removed together by
    * [[removeMarkedFiles]]. */
  def sandboxDir: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_$runId"

  def getTmpNode(name: String): FSNode = synchronized {
    val n = FSNode(s"$sandboxDir/$name", this)
    tmpFiles += n
    n
  }

  def removeMarkedFiles(): Unit = synchronized {
    tmpFiles.foreach(n => if (n.exists) n.delete(recurse = true))
    tmpFiles.clear()
    val sandbox = getNode(sandboxDir)
    if (sandbox.exists) sandbox.delete(recurse = true)
  }
}

object Storage {
  /** Storage bound to the session's Hadoop configuration — resolves
    * local paths, hdfs://, s3a://, ... exactly as Spark itself would. */
  def forSpark(spark: SparkSession): Storage =
    new Storage(spark.sparkContext.hadoopConfiguration)
}
