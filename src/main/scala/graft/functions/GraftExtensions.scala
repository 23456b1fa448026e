package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions so `spark.sql(...)` users get them too.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   — or spark.sql.extensions=graft.functions.GraftExtensions
  *
  *   SELECT minhash_sig(shingles(tokens, 3), 64) FROM docs
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSigExpr(args.head, intArg(args(1), "numHashes"))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      (args: Seq[Expression]) =>
        ShinglesExpr(args.head, intArg(args(1), "k"))))
  }
}
