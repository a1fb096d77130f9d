package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomAgg, Hilbert2, LongDotProduct, MaxSim, PqAdc, TopKBy, ZOrder2, ZOrderN}

/** Engine extension point: registers the custom Catalyst expressions with
  * the session's FunctionRegistry, so SQL/expr() can call them by name.
  * Activate with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "long_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "long_dot expects exactly 2 arguments")
        LongDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "bloom_agg expects exactly 3 arguments")
        BloomAgg(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "pq_adc expects exactly 2 arguments")
        PqAdc(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "zorder2"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "zorder2 expects exactly 2 arguments")
        ZOrder2(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("zordern"),
      new ExpressionInfo(classOf[ZOrderN].getName, "zordern"),
      (children: Seq[Expression]) => {
        require(children.length >= 2 && children.length <= 4,
          "zordern expects 2 to 4 arguments")
        ZOrderN(children)
      }))
    ext.injectFunction((
      FunctionIdentifier("hilbert2"),
      new ExpressionInfo(classOf[Hilbert2].getName, "hilbert2"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "hilbert2 expects exactly 2 arguments")
        Hilbert2(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("max_sim"),
      new ExpressionInfo(classOf[MaxSim].getName, "max_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "max_sim expects exactly 3 arguments")
        MaxSim(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "topk_by"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "topk_by expects exactly 3 arguments")
        TopKBy(children.head, children(1), children(2))
      }))
  }
}
