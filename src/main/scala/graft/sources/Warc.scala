package graft.sources

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Page

/** WARC (ISO 28500 / WARC-1.0, the Common Crawl container) source + sink,
  * parsed with pure byte logic — no external archive library.
  *
  * Read path: `sc.binaryFiles` over `*.warc` / `*.warc.gz`, then a
  * STREAMING per-file record iterator — one task per file (the WARC split
  * unit: records are length-delimited within a file), constant memory per
  * task (one record payload at a time, never the whole file). Gzip is
  * detected by magic bytes; `GZIPInputStream` walks concatenated gzip
  * members transparently, which is exactly Common Crawl's `.warc.gz`
  * layout (one member per record). At crawl scale the corpus is many
  * GB-sized files, so file-level parallelism saturates a cluster.
  *
  * Only `response` records with an HTTP payload map to [[Page]] rows: url =
  * WARC-Target-URI, warc_ts = WARC-Date, html = the HTTP body (bytes after
  * the first CRLFCRLF of the payload). Other record types (warcinfo,
  * request, metadata) are counted but skipped.
  *
  * Write path: one `.warc` file per partition via `foreachPartition` —
  * embarrassingly parallel, no shuffle; each response record carries
  * Content-Length, WARC-Record-ID, and a minimal HTTP/1.1 header. The sink
  * writes through the Hadoop FileSystem API (the session's hadoopConfiguration
  * rides to the executors), so `dir` may be local, HDFS, or an object store
  * (s3a://) with no layout change. Each task attempt stages to an
  * attempt-unique `.tmp` name and renames into place on success — a
  * speculative or retried attempt can never interleave bytes into, or leave
  * a truncated tail in, the published file (the lenient record parser would
  * otherwise silently read a truncated archive as a shorter one).
  */
object Warc {

  private val CRLF = "\r\n"
  private val GZIP_MAGIC = Array[Byte](0x1f.toByte, 0x8b.toByte)

  /** One parsed WARC record: headers (original case preserved in values,
    * names lower-cased) + raw payload slice.
    */
  final case class Record(headers: Map[String, String], payload: Array[Byte]) {
    def recordType: String = headers.getOrElse("warc-type", "")
    def targetUri: Option[String] = headers.get("warc-target-uri")
    def date: Option[Timestamp] =
      headers.get("warc-date").flatMap { d =>
        try Some(Timestamp.from(Instant.parse(d))) catch { case _: Exception => None }
      }
  }

  /** Iterate the records of one WARC stream. STREAMING: at most one record
    * payload is in memory at a time, so GB-scale archive files parse under a
    * constant memory bound. Malformed or truncated trailing bytes end the
    * iteration rather than throwing: a truncated tail (killed crawler) must
    * not poison the whole file.
    */
  def records(in: java.io.InputStream): Iterator[Record] = new Iterator[Record] {
    private val buf = new java.io.BufferedInputStream(in, 64 * 1024)
    private var nextRec: Record = _
    advance()

    /** Read one header block (through the blank CRLF line); None at EOF or
      * on malformed bytes. Leading CRLFs (inter-record separators) skipped.
      * Bytes are accumulated and the block decoded as UTF-8 (ISO 28500
      * headers are UTF-8; a byte-as-char decode would mojibake a non-ASCII
      * WARC-Target-URI into a different url string).
      */
    private def readHeaderBlock(): Option[String] = {
      val bytes = new java.io.ByteArrayOutputStream(256)
      var c = buf.read()
      while (c == '\r' || c == '\n') c = buf.read()
      if (c < 0) return None
      var blanks = 0 // consecutive CRLF pairs seen
      while (c >= 0 && blanks < 2) {
        if (c == '\n') blanks += 1 else if (c != '\r') blanks = 0
        bytes.write(c)
        if (blanks < 2) c = buf.read()
      }
      if (blanks < 2) None
      else Some(new String(bytes.toByteArray, StandardCharsets.UTF_8))
    }

    private def readFully(n: Int): Option[Array[Byte]] = {
      val out = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = buf.read(out, off, n - off)
        if (r < 0) return None
        off += r
      }
      Some(out)
    }

    private def advance(): Unit = {
      nextRec = null
      val parsed = for {
        block <- readHeaderBlock()
        lines = block.split("\r\n")
        if lines.headOption.exists(_.startsWith("WARC/"))
        headers = lines.drop(1).flatMap { l =>
          val i = l.indexOf(':')
          if (i <= 0) None
          else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
        }.toMap
        len <- headers.get("content-length").flatMap(_.toLongOption)
        if len >= 0 && len <= Int.MaxValue
        payload <- readFully(len.toInt)
      } yield Record(headers, payload)
      nextRec = parsed.orNull
      if (nextRec == null) buf.close()
    }

    override def hasNext: Boolean = nextRec != null
    override def next(): Record = {
      val r = nextRec; advance(); r
    }
  }

  /** In-memory convenience overload (tests, small archives). */
  def records(bytes: Array[Byte]): Iterator[Record] =
    records(new java.io.ByteArrayInputStream(bytes))

  /** HTTP status code of a response payload's status line ("HTTP/1.1 200
    * OK" → 200). A payload that does not start with an HTTP status line
    * (bare-body archives) is treated as 200 — there is no header to
    * contradict success. Malformed status digits → -1 (callers drop it).
    */
  def httpStatus(payload: Array[Byte]): Int = {
    if (payload == null || payload.length < 5) return 200
    if (!(payload(0) == 'H' && payload(1) == 'T' && payload(2) == 'T' &&
        payload(3) == 'P' && payload(4) == '/')) return 200
    // skip to the first space, then read the 3-digit code
    var i = 5
    while (i < payload.length && payload(i) != ' ' && payload(i) != '\r') i += 1
    if (i >= payload.length || payload(i) != ' ') return -1
    i += 1
    var code = 0
    var n = 0
    while (i < payload.length && n < 3 && payload(i) >= '0' && payload(i) <= '9') {
      code = code * 10 + (payload(i) - '0'); i += 1; n += 1
    }
    if (n == 3) code else -1
  }

  /** HTTP body of a response payload: bytes after the first CRLFCRLF
    * (the status line + headers). A payload with no header separator is
    * returned whole (some archives store bare bodies).
    */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    payload
  }

  /** Read `*.warc` / `*.warc.gz` files under `path` into the pages shape.
    * `text`/`lang` stay null — they are produced downstream by X2/X3
    * extraction, exactly as for freshly fetched bytes.
    *
    * Each file is one task (`binaryFiles` hands a LAZY stream, so GB-scale
    * archives parse record-at-a-time under constant memory — nothing
    * materializes the whole file). `.gz` input is detected by magic bytes:
    * `GZIPInputStream` transparently walks concatenated gzip members, which
    * is exactly how Common Crawl lays out `.warc.gz` (one member per record)
    * — so member-per-record archives stream straight through.
    */
  def readPages(spark: SparkSession, path: String): Dataset[Page] = {
    import spark.implicits._
    val files = spark.sparkContext
      .binaryFiles(s"$path/*.warc*")
      .flatMap { case (_, pds) =>
        val raw = new java.io.BufferedInputStream(pds.open(), 64 * 1024)
        raw.mark(2)
        val m0 = raw.read(); val m1 = raw.read()
        raw.reset()
        val in =
          if (m0 == (GZIP_MAGIC(0) & 0xff) && m1 == (GZIP_MAGIC(1) & 0xff))
            new java.util.zip.GZIPInputStream(raw, 64 * 1024)
          else raw
        records(in)
          .filter(r => r.recordType == "response" && r.targetUri.isDefined &&
            // real archives carry 404/3xx response records whose error bodies
            // must not be ingested as successfully-fetched html — only 2xx
            // payloads become pages (bare bodies count as 200, see httpStatus)
            httpStatus(r.payload) / 100 == 2)
          .map(r => Page(
            url = r.targetUri.get,
            warc_ts = r.date.getOrElse(new Timestamp(0L)),
            html = httpBody(r.payload),
            text = null,
            lang = null))
      }
    spark.createDataset(files)
  }

  /** Hadoop Configuration is not Serializable; ship it to the executors via
    * its own writable form (the same trick Spark uses internally), so the
    * sink sees the session's filesystem settings (s3a credentials, etc.).
    */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Write pages as one uncompressed `.warc` file per partition (no
    * shuffle). Record IDs are deterministic from the url hash so re-runs
    * produce identical archives.
    *
    * IO goes through the Hadoop FileSystem API resolved from `dir`'s scheme
    * + the session's hadoopConfiguration — local fs, HDFS and object stores
    * (s3a://) all work with the same record encoding and one-file-per-
    * partition layout. Each attempt writes an ATTEMPT-UNIQUE `.tmp` path and
    * renames it over the final name only when fully written: concurrent
    * speculative/retried attempts cannot interleave bytes, and a killed
    * attempt leaves only a `.tmp` orphan, never a truncated published file
    * (which the deliberately lenient reader would silently accept as a
    * shorter archive). Rename is atomic on POSIX/HDFS; on S3A it is
    * copy+delete, still safe here because the source is attempt-unique.
    */
  def writePages(pages: DataFrame, dir: String): Unit = {
    val ds = pages.select(col("url"), col("warc_ts"), col("html"))
    val confSer = new SerializableHadoopConf(
      ds.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(confSer.value).mkdirs(dirPath)
    ds.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      // WARC/1.1 date (fractional seconds allowed — millisecond timestamps
      // round-trip losslessly; 1.0 would truncate to seconds), rendered in
      // UTC explicitly so the 'Z' is true regardless of session timezone
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .withZone(java.time.ZoneOffset.UTC)
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      // a PRIVATE FileSystem instance (NOT the JVM-cached one from
      // getFileSystem): setWriteChecksum mutates the instance, and the cache
      // shares one instance per (scheme, authority) across the whole
      // executor — flipping it there would silently strip .crc sidecars
      // from every OTHER writer (including Spark's own file sinks) for the
      // executor's lifetime. The private instance is closed below.
      val fs = org.apache.hadoop.fs.FileSystem.newInstance(
        new org.apache.hadoop.fs.Path(dir).toUri, confSer.value)
      // no .crc sidecars: local/checksum filesystems would litter the archive
      // dir with hidden checksum files the WARC layout doesn't use
      fs.setWriteChecksum(false)
      val fin = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.warc")
      val tmp = new org.apache.hadoop.fs.Path(dir,
        f".part-$pid%05d.warc.attempt-${tc.taskAttemptId()}%d.tmp")
      val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 64 * 1024)
      try {
        it.foreach { row =>
          val url = row.getString(0)
          val ts = fmt.format(row.getTimestamp(1).toInstant)
          val html = row.getAs[Array[Byte]](2)
          val http = s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html${CRLF}Content-Length: ${html.length}$CRLF$CRLF"
            .getBytes(StandardCharsets.UTF_8)
          val payloadLen = http.length + html.length
          val id = java.util.UUID.nameUUIDFromBytes(url.getBytes(StandardCharsets.UTF_8))
          val header =
            (s"WARC/1.1${CRLF}WARC-Type: response${CRLF}WARC-Target-URI: $url$CRLF" +
              s"WARC-Date: $ts${CRLF}WARC-Record-ID: <urn:uuid:$id>$CRLF" +
              s"Content-Type: application/http;msgtype=response$CRLF" +
              s"Content-Length: $payloadLen$CRLF$CRLF").getBytes(StandardCharsets.UTF_8)
          out.write(header); out.write(http); out.write(html)
          out.write(CRLF.getBytes); out.write(CRLF.getBytes)
        }
        out.close()
        // publish: Hadoop rename does not overwrite — clear a previous
        // attempt's file first; losing the rename race to another completed
        // attempt is fine (both files are complete and identical)
        if (fs.exists(fin)) fs.delete(fin, false)
        if (!fs.rename(tmp, fin) && !fs.exists(fin))
          throw new java.io.IOException(s"failed to publish $tmp -> $fin")
      } finally {
        try out.close() catch { case _: java.io.IOException => () }
        if (fs.exists(tmp)) fs.delete(tmp, false)
        try fs.close() catch { case _: java.io.IOException => () }
      }
    }
  }
}
