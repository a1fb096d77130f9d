package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.WarcCodec

/** Top-level so Spark can build an Encoder without an outer scope. */
case class WarcPayload(doc_id: Long, warc: Array[Byte])

/** The WARC→HTTP→HTML codec chain is STATELESS, so [[WarcCodec.parseDF]]
  * runs unchanged on a streaming frame — the online crawl-archive
  * unwrap (a live WET job). Pinned: streamed rows equal the batch
  * decode of the same payloads across micro-batch splits and replay. */
class WarcStreamSpec extends SparkTestBase {

  private def page(id: Long): Array[Byte] = {
    val html = s"<html><head><title>D$id</title></head><body><p>doc $id body</p></body></html>"
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: ${html.length}\r\n\r\n$html"
    val info = "software: t\r\n"
    val warc =
      s"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: ${info.length}\r\n\r\n$info\r\n\r\n" +
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://s/$id\r\nContent-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
    warc.getBytes("ISO-8859-1")
  }

  

  test("streamed decode equals batch decode across splits and replay") {
    val ids = (1L to 40L).toSeq
    val batch = {
      import spark.implicits._
      WarcCodec.parseDF(ids.map(i => WarcPayload(i, page(i))).toDF())
        .collect().map(r => (r.getLong(0), r.getString(2), r.getString(7))).toSet
    }

    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[WarcPayload]
    val input = MemoryStream[WarcPayload]
    val q = WarcCodec.parseDF(input.toDS().toDF())
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").option("checkpointLocation", tmpDir("ckpt_ws")).start()
    try {
      ids.grouped(13).foreach { w =>
        input.addData(w.map(i => WarcPayload(i, page(i)))); q.processAllAvailable()
      }
      input.addData(ids.take(7).map(i => WarcPayload(i, page(i)))) // replay
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("warc_stream").distinct().collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(7))).toSet
    assert(got == batch)
    assert(batch.exists(_._3 == "doc 7 body"))
  }
}
