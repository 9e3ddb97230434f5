package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcReaderSpec extends SparkSpec {
  import spark.implicits._

  private def http(body: Array[Byte],
                   contentType: String = "text/html"): Array[Byte] = {
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: " + contentType +
      "\r\nServer: test\r\n\r\n").getBytes("ISO-8859-1")
    head ++ body
  }

  private def record(wtype: String, uri: String,
                     payload: Array[Byte]): Array[Byte] = {
    val head = (s"WARC/1.0\r\n" +
      s"WARC-Type: $wtype\r\n" +
      s"WARC-Record-ID: <urn:uuid:$wtype-${payload.length}>\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1")
    head ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  // the trap: an HTML body CONTAINING a WARC version line and CRLFCRLF —
  // only Content-Length byte accounting parses past it correctly
  private val trapHtml =
    "<html><body><p>quote: WARC/1.0\r\n\r\nnot a record</p></body></html>"
      .getBytes("UTF-8")
  private val binBody = Array[Byte](0, 13, 10, 13, 10, -1, 127, 0)

  private def writeWarc(dir: java.nio.file.Path, name: String,
                        bytes: Array[Byte]): Unit =
    java.nio.file.Files.write(dir.resolve(name), bytes)

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("warc")
    val warc =
      record("warcinfo", null, "software: graft-test\r\n".getBytes("ISO-8859-1")) ++
      record("response", "http://example.com/a", http(trapHtml)) ++
      record("request", "http://example.com/a",
        "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes("ISO-8859-1")) ++
      record("response", "http://example.com/bin",
        http(binBody, contentType = "application/octet-stream"))
    writeWarc(dir, "part-0.warc", warc)
    // the SAME records as one-member-per-record gzip (the .warc.gz shape)
    val gz = new java.io.ByteArrayOutputStream()
    Seq(
      record("warcinfo", null, "software: graft-test\r\n".getBytes("ISO-8859-1")),
      record("response", "http://example.com/a", http(trapHtml)),
      record("request", "http://example.com/a",
        "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes("ISO-8859-1")),
      record("response", "http://example.com/bin",
        http(binBody, contentType = "application/octet-stream"))
    ).foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(r); g.finish()
    }
    writeWarc(dir, "part-1.warc.gz", gz.toByteArray)
    dir.toString
  }

  test("records: byte-accounted boundaries, plain and member-gzipped files agree") {
    val dir = fixture()
    val recs = WarcReader.records(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("source_file").split("/").last,
        r.getAs[Int]("record_index"), r.getAs[String]("warc_type"),
        r.getAs[String]("target_uri"), r.getAs[Long]("content_length"),
        r.getAs[String]("parse_error")))
      .groupBy(_._1)
    // both files parse to the same 4 records, no errors
    for (f <- Seq("part-0.warc", "part-1.warc.gz")) {
      val rs = recs(f).sortBy(_._2)
      assert(rs.length == 4, s"$f: ${rs.mkString("\n")}")
      assert(rs.forall(_._6 == null))
      assert(rs.map(_._3).toSeq ==
        Seq("warcinfo", "response", "request", "response"))
      assert(rs(1)._4 == "http://example.com/a")
    }
    // the trap body survived byte-exact (WARC/1.0 inside HTML ignored)
    val payloads = WarcReader.records(spark, dir)
      .filter($"warc_type" === "response" &&
        $"target_uri" === "http://example.com/a")
      .select($"payload").collect()
    assert(payloads.length == 2)
    payloads.foreach { r =>
      val b = r.getAs[Array[Byte]](0)
      assert(new String(b, "UTF-8").contains("WARC/1.0\r\n\r\nnot a record"))
    }
  }

  test("httpResponses: status/header/body split; binary body byte-exact; html chains to text") {
    val dir = fixture()
    val resp = WarcReader.httpResponses(WarcReader.records(spark, dir))
      .filter($"source_file".endsWith("part-0.warc"))
      .collect().map(r => r.getAs[String]("target_uri") -> r).toMap
    val a = resp("http://example.com/a")
    assert(a.getAs[Int]("http_status") == 200)
    assert(a.getAs[String]("http_headers").contains("Content-Type: text/html"))
    val bin = resp("http://example.com/bin")
    assert(bin.getAs[Array[Byte]]("body").toSeq == binBody.toSeq)
    // the crawl chain: WARC -> HTTP body -> htmlToText
    val text = WarcReader.httpResponses(WarcReader.records(spark, dir))
      .filter($"target_uri" === "http://example.com/a" &&
        $"source_file".endsWith("part-0.warc"))
      .select(graft.operators.TextAnalysis.htmlToText($"body_utf8"))
      .collect()(0).getString(0)
    assert(text == "quote: WARC/1.0\nnot a record", s"'$text'")
  }

  test("malformed files: truncated payload and junk keep prior records, set parse_error") {
    val dir = java.nio.file.Files.createTempDirectory("warc-bad")
    val good = record("response", "http://ok", http("<p>x</p>".getBytes("UTF-8")))
    // claim 999 payload bytes, provide 3
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 999\r\n\r\nabc").getBytes("ISO-8859-1")
    writeWarc(dir, "t.warc", good ++ bad)
    writeWarc(dir, "junk.warc", "not a warc at all".getBytes("UTF-8"))
    val rows = WarcReader.records(spark, dir.toString).collect()
      .map(r => (r.getAs[String]("source_file").split("/").last,
        r.getAs[String]("warc_type"), r.getAs[String]("parse_error")))
    val t = rows.filter(_._1 == "t.warc")
    assert(t.length == 2)
    assert(t.exists(r => r._2 == "response" && r._3 == null))
    assert(t.exists(r => r._3 != null && r._3.contains("truncated")))
    val j = rows.filter(_._1 == "junk.warc")
    assert(j.length == 1 && j(0)._3 != null)
    // corrupt gzip: a parse_error row, never a task failure
    writeWarc(dir, "bad.warc.gz", Array[Byte](0x1f, -0x75, 9, 9, 9, 9))
    val g = WarcReader.records(spark, dir.toString).collect()
      .filter(_.getAs[String]("source_file").endsWith("bad.warc.gz"))
    assert(g.length == 1 &&
      g(0).getAs[String]("parse_error").startsWith("gzip decode failed"))
  }
}
