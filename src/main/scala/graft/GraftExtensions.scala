package graft

import graft.functions.{CosineSim, DotProduct, RollingHashMinima, SimHashAgg, TopKAgg, TopKStrAgg}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL-callable functions, so `spark.sql` users
  * get them without touching the Scala API:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  *   SELECT doc_id, simhash_agg(tok) FROM toks GROUP BY doc_id
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator extension: the native as-of join's planner strategy
    // (logical node → AsOfJoinExec). Runtime sessions can also register
    // it lazily via AsOfJoin.ensureRegistered.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoin.AsOfJoinStrategy)
    // FROM-clause surface of the native as-of join:
    //   SELECT ... FROM asof_join('l', 'r', 'k1,k2', 'lt', 'rt')
    ext.injectTableFunction((
      new FunctionIdentifier("asof_join"),
      new ExpressionInfo(
        classOf[graft.plans.AsOfJoin.AsOfJoinPlan].getName, "asof_join"),
      (args: Seq[Expression]) => graft.plans.AsOfJoin.sqlBuilder(args)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      (args: Seq[Expression]) => SimHashAgg(args.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        if (args.length != 3) throw new IllegalArgumentException(
          "top_k expects (score, id, k)")
        val k = args(2) match {
          case e if e.foldable && (e.dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }) && e.eval() != null =>
            try Math.toIntExact(e.eval().asInstanceOf[Number].longValue())
            catch { case _: ArithmeticException =>
              throw new IllegalArgumentException(
                s"top_k: k out of Int range: ${e.eval()}")
            }
          case _ => throw new IllegalArgumentException(
            "top_k: k must be an integer literal")
        }
        // polymorphic on the id type: string ids ride the string-buffer
        // variant, everything numeric the primitive-array fast path
        import org.apache.spark.sql.types.StringType
        val agg = args(1).dataType match {
          case StringType => TopKStrAgg(args(0), args(1), k)
          case _ => TopKAgg(args(0), args(1), k)
        }
        agg.toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[RollingHashMinima].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        def intArg(i: Int, name: String): Int = args(i) match {
          case e if e.foldable && (e.dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }) =>
            val v = e.eval()
            if (v == null) throw new IllegalArgumentException(
              s"winnow_fingerprints: $name must not be null")
            try Math.toIntExact(v.asInstanceOf[Number].longValue())
            catch { case _: ArithmeticException =>
              throw new IllegalArgumentException(
                s"winnow_fingerprints: $name out of Int range: $v")
            }
          case _ => throw new IllegalArgumentException(
            s"winnow_fingerprints: $name must be an integer literal")
        }
        val k = if (args.length > 1) intArg(1, "k") else 8
        val w = if (args.length > 2) intArg(2, "w") else 16
        RollingHashMinima(args.head, k, w) // k/w positivity checked there
      }))
    ext.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(
        classOf[graft.functions.MisraGriesAgg].getName, "misra_gries"),
      (args: Seq[Expression]) => {
        if (args.length != 2) throw new IllegalArgumentException(
          "misra_gries expects (key, c)")
        graft.functions.MisraGriesAgg(args(0),
          intLiteral(args(1), "misra_gries", "c")).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("hll_registers"),
      new ExpressionInfo(
        classOf[graft.functions.HllAgg].getName, "hll_registers"),
      (args: Seq[Expression]) => {
        if (args.length != 2) throw new IllegalArgumentException(
          "hll_registers expects (hash64, p)")
        graft.functions.HllAgg(args(0),
          intLiteral(args(1), "hll_registers", "p")).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("md5_num"),
      new ExpressionInfo(
        classOf[graft.functions.Md5Num].getName, "md5_num"),
      (args: Seq[Expression]) => {
        if (args.length != 1) throw new IllegalArgumentException(
          "md5_num expects (str)")
        graft.functions.Md5Num(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix"),
      new ExpressionInfo(
        classOf[graft.functions.Md5Prefix].getName, "md5_prefix"),
      (args: Seq[Expression]) => {
        if (args.length != 2) throw new IllegalArgumentException(
          "md5_prefix expects (str, nHex)")
        graft.functions.Md5Prefix(args(0),
          intLiteral(args(1), "md5_prefix", "nHex"))
      }))
  }

  /** Foldable-integer argument extraction shared by the sketch
    * aggregates' SQL surfaces (same contract as top_k's k).
    */
  private def intLiteral(e: Expression, fn: String, name: String): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    e match {
      case l if l.foldable && (l.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }) && l.eval() != null =>
        try Math.toIntExact(l.eval().asInstanceOf[Number].longValue())
        catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"$fn: $name out of Int range: ${l.eval()}")
        }
      case _ => throw new IllegalArgumentException(
        s"$fn: $name must be an integer literal")
    }
  }
}
