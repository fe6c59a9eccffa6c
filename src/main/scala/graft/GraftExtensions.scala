package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BandSignatures, CosineSimilarity, JaroWinkler, LanguageId, SimHash64}

/** SparkSessionExtensions entry point: injects the engine's native
  * functions at session build, so both the Column API and SQL text can use
  * them without per-session registration calls.
  *
  * Usage:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(CosineSimilarity.name),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineSimilarity.name),
      (exprs: Seq[Expression]) => CosineSimilarity.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier(BandSignatures.name),
      new ExpressionInfo(classOf[BandSignatures].getName, BandSignatures.name),
      (exprs: Seq[Expression]) => BandSignatures.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier(LanguageId.name),
      new ExpressionInfo(classOf[LanguageId].getName, LanguageId.name),
      (exprs: Seq[Expression]) => LanguageId.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier(SimHash64.name),
      new ExpressionInfo(classOf[SimHash64].getName, SimHash64.name),
      (exprs: Seq[Expression]) => SimHash64.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier(JaroWinkler.name),
      new ExpressionInfo(classOf[JaroWinkler].getName, JaroWinkler.name),
      (exprs: Seq[Expression]) => JaroWinkler.build(exprs)))
    // native as-of join planner: sessions built with these extensions
    // plan AsOfJoinPlan without the per-session
    // AsOfJoin.ensureRegistered call (which remains for live sessions,
    // where getOrCreate ignores withExtensions)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
