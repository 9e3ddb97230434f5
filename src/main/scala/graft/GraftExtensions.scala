package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorExpressions.{DotProduct, L2Norm}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use, so `spark.sql("SELECT graft_dot(a, b) ...")`
  * works next to the Column API. Enable with:
  *
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * This is the (c)-tier extension surface of the build brief — the same
  * hook a custom Rule/Strategy would use; expressions are all the engine
  * needs today (SURVEY §4: no custom physical operators required).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import graft.functions.TextHash

  // int parameters arrive as literal expressions in SQL calls
  private def intArg(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_l2norm"),
      (children: Seq[Expression]) => L2Norm(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[TextHash.SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => TextHash.SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[TextHash.WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) =>
        TextHash.WordShingles(children(0), intArg(children(1), "graft_shingles"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[TextHash.MinHashHex].getName, "graft_minhash"),
      (children: Seq[Expression]) => TextHash.MinHashHex(children(0),
        intArg(children(1), "graft_minhash"), intArg(children(2), "graft_minhash"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_u64"),
      new ExpressionInfo(classOf[TextHash.MinHashU64].getName, "graft_minhash_u64"),
      (children: Seq[Expression]) => TextHash.MinHashU64(children(0),
        intArg(children(1), "graft_minhash_u64"),
        intArg(children(2), "graft_minhash_u64"))))
  }
}
