package graft

import graft.operators.WarcCodec

/** Pins the WARC record walker (qx69's kernel): Content-Length framing
  * against planted in-body record-boundary decoys, case-insensitive
  * header names, unknown-record-type skip, the HTTP unwrap consistency
  * check, and the throw-on-malformed contract shared with the other
  * real codecs (PPM/WAV/HTML). */
class WarcCodecSpec extends SparkTestBase {

  private def record(typ: String, content: String, extra: String = "",
                     lowerNames: Boolean = false): String = {
    val (t, cl) = if (lowerNames) ("warc-type", "content-length")
                  else ("WARC-Type", "Content-Length")
    s"WARC/1.0\r\n$t: $typ\r\n$extra$cl: ${content.length}\r\n\r\n$content\r\n\r\n"
  }

  private def httpMsg(status: String, body: String): String =
    s"HTTP/1.1 $status\r\nContent-Type: text/html\r\nContent-Length: ${body.length}\r\n\r\n$body"

  private def bytes(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("length framing survives an in-body record-boundary decoy") {
    val body = "<p>decoy: \r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n end</p>"
    val warc = record("warcinfo", "software: x\r\n") +
      record("response", httpMsg("200 OK", body),
        extra = "WARC-Target-URI: https://a/1\r\n")
    val f = WarcCodec.parse(bytes(warc))
    assert(f.nRecords === 2 && f.httpStatus === 200 && f.body === body)
    assert(f.uri === "https://a/1")
  }

  test("header names are case-insensitive; unknown types are skipped") {
    val warc = record("warcinfo", "a: b\r\n") +
      record("metadata", "via: seed") +
      record("response", httpMsg("404 Not Found", "gone"),
        extra = "warc-target-uri: https://a/2\r\n", lowerNames = true)
    val f = WarcCodec.parse(bytes(warc))
    assert(f.nRecords === 3 && f.nResponses === 1)
    assert(f.httpStatus === 404 && f.body === "gone" && f.uri === "https://a/2")
  }

  test("malformed input throws, never fabricates") {
    val ok = record("response", httpMsg("200 OK", "x"))
    // bad magic
    assertThrows[Exception](WarcCodec.parse(bytes("HTTP/1.1 200\r\n\r\nx")))
    // truncated content block
    assertThrows[Exception](WarcCodec.parse(bytes(ok.dropRight(6))))
    // broken record terminator
    assertThrows[Exception](WarcCodec.parse(bytes(ok.dropRight(4) + "XXXX")))
    // HTTP Content-Length inconsistent with actual body
    val lie = httpMsg("200 OK", "abc").replace("Content-Length: 3", "Content-Length: 9")
    assertThrows[Exception](WarcCodec.parse(bytes(record("response", lie))))
    // no response record at all
    assertThrows[Exception](WarcCodec.parse(bytes(record("warcinfo", "a: b\r\n"))))
  }
}
