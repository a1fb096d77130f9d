package graft

import java.lang.reflect.Modifier

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.DriftStream
import graft.streaming.DriftStream.SrcShardFeats

/** The streaming state encoders must run CODEGEN'D, not interpreted
  * (round 17, r16 verdict #6). Root cause pinned here: a plain-
  * `private` nested Scala case class keeps a PRIVATE access flag in
  * its InnerClasses attribute; the JVM verifier ignores it but Janino
  * enforces it, so the generated state-encoder projection fails to
  * compile ("No applicable constructor/method found ... candidates
  * are: public long Hist.curId()" — the method exists but Janino
  * refuses the private member class) and Spark silently falls back to
  * interpreted encoders on EVERY state read/write of that stream.
  * Qualified private (`private[streaming]`) compiles to a public flag
  * and restores codegen. This suite (a) asserts the reflected
  * modifiers — `Class.getModifiers` reads the InnerClasses flags — of
  * every state case class in the streaming package, and (b) drives
  * the diagnosed pipeline (DriftStream) end to end while capturing
  * the projection loggers, asserting zero interpreter fallbacks. */
class StateEncoderCodegenSpec extends SparkTestBase {

  private val stateClasses = Seq(
    "graft.streaming.DriftStream$Hist",
    "graft.streaming.LogHistogramStream$Hist",
    "graft.streaming.SpanDedupStream$Claim",
    "graft.streaming.IndexStream$TermState",
    "graft.streaming.HllStream$Regs",
    "graft.streaming.DsirStream$Counts",
    "graft.streaming.ChunkDedupStream$Store",
    "graft.streaming.ChunkDedupStream$GStore",
    "graft.streaming.DistinctSketchStream$Sketch",
    "graft.streaming.CmsStream$Grid")

  test("every streaming state case class is Janino-visible (public InnerClasses flags)") {
    stateClasses.foreach { name =>
      val mods = Class.forName(name).getModifiers
      assert(Modifier.isPublic(mods) && !Modifier.isPrivate(mods),
        s"$name carries non-public InnerClasses flags (${Modifier.toString(mods)}) — " +
          "Janino will reject the generated state encoder and the stream runs interpreted")
    }
  }

  test("the drift pipeline's state encoder compiles — zero interpreter fallbacks") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "graft-codegen-capture", null, null, false,
      org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("falling back to interpreter mode"))
          captured.add(s"${e.getLoggerName}: $m")
      }
    }
    appender.start()
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val root = ctx.getConfiguration.getRootLogger
    root.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try {
      implicit val sqlCtx = spark.sqlContext
      implicit val enc = Encoders.product[SrcShardFeats]
      val input = MemoryStream[SrcShardFeats]
      val ckpt = tmpDir("ckpt_codegen")
      val q = DriftStream.histograms(input.toDS())
        .writeStream.format("memory").queryName("codegen_drift")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        input.addData(SrcShardFeats("s", 0, 1L, Seq(1L, 2L)))
        q.processAllAvailable()
        // second batch exercises the state DESERIALIZER (st.get) too
        input.addData(SrcShardFeats("s", 0, 2L, Seq(3L)))
        q.processAllAvailable()
      } finally q.stop()
      val model = DriftStream.modelFromCheckpoint(spark, ckpt)
      assert(model("s").values.sum === 3L)
    } finally {
      root.removeAppender("graft-codegen-capture")
      ctx.updateLoggers()
      appender.stop()
    }
    assert(captured.isEmpty,
      s"state encoder fell back to interpreted mode: ${captured.toArray.take(3).mkString("; ")}")
  }
}
