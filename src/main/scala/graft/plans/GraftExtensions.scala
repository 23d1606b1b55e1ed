package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Engine integration with Spark's extension points
  * (`SparkSessionExtensions`) — the idiomatic packaging for custom
  * Catalyst surfaces, applied via `.withExtensions(new GraftExtensions)`
  * in [[graft.core.GraftSession]]:
  *
  *   1. The kernel expressions become native SQL functions
  *      (`strip_accents`, `array_cosine`, `unicode_normalize`,
  *      `shingle_hashes`, plus the `kmv_distinct` sketch aggregate) —
  *      `spark.sql("SELECT strip_accents(text) …")`
  *      plans the same Catalyst expression as the Column API, zero UDF
  *      overhead, and the names deliberately match the DuckDB oracle
  *      dialect so gate SQL reads the same on both engines.
  *
  *   2. [[VectorCartesianGuard]], an optimizer rule that FAILS any plan
  *      joining two embedding-carrying relations without a join
  *      condition — the registry's no-cartesian invariant
  *      ([[graft.runner.OperatorRegistry]]) enforced one level deeper,
  *      where it also catches hand-written DataFrame code. Opt-in
  *      (`spark.graft.failOnVectorCartesian=true`) because the
  *      query-side-small brute-force ANN tiers cross-join embeddings
  *      legitimately.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[kernels.StripAccents].getName, null, name, usage, "")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("strip_accents"),
      info("strip_accents", "strip_accents(str) - accent fold: NFD, drop combining marks, NFC"),
      (args: Seq[Expression]) => kernels.StripAccents(args.head)))

    ext.injectFunction((FunctionIdentifier("array_cosine"),
      info("array_cosine", "array_cosine(a, b) - cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => kernels.ArrayCosine(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize", "unicode_normalize(str[, form[, strip_controls]]) - Unicode normalization"),
      (args: Seq[Expression]) => kernels.UnicodeNormalize(
        args.head,
        if (args.length > 1) args(1) match {
          case Literal(f, _) => String.valueOf(f)
          case other => throw new IllegalArgumentException(s"form must be a literal, got $other")
        } else "NFC",
        if (args.length > 2) args(2) match {
          case Literal(b: Boolean, _) => b
          case other => throw new IllegalArgumentException(s"strip_controls must be a boolean literal, got $other")
        } else false)))

    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(str, w) - xxhash64 of the w-token shingles"),
      (args: Seq[Expression]) => kernels.ShingleHashes(args(0), intLit(args(1), "shingle width"))))

    ext.injectFunction((FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct", "kmv_distinct(hash64, k) - KMV distinct-count sketch over a pre-hashed column"),
      (args: Seq[Expression]) => graft.functions.KmvSketch(
        args(0), intLit(args(1), "k")).toAggregateExpression()))

    ext.injectFunction((FunctionIdentifier("topk_values"),
      info("topk_values",
        "topk_values(v, k[, largest]) - mergeable bounded top-k aggregate (map-side k-element heaps)"),
      (args: Seq[Expression]) => graft.functions.TopKAgg(
        args(0), intLit(args(1), "k"),
        if (args.length > 2) args(2) match {
          case Literal(b: Boolean, _) => b
          case other => throw new IllegalArgumentException(
            s"largest must be a boolean literal, got $other")
        } else true).toAggregateExpression()))

    ext.injectOptimizerRule(session => new VectorCartesianGuard(session))
  }
}

/** Fails (rather than silently plans) a join with NO condition where
  * BOTH inputs carry float/double array columns — at 100 TB that plan
  * is an O(n·m) shuffle of full embedding vectors, and it is always a
  * bug outside the deliberately query-side-small ANN brute tiers. The
  * optimizer sees the plan AFTER join-condition pushdown, so an inner
  * join whose predicate compares the two sides has a condition by now
  * and passes; only a genuine cartesian of two vector relations trips.
  * Running in the operator-optimization batch also means column pruning
  * has happened: a cartesian whose vector columns were pruned away
  * (e.g. a bare count over the product) does NOT trip — correctly,
  * since no vectors ride that shuffle.
  *
  * Off by default (`spark.graft.failOnVectorCartesian`, default
  * false); turn it on in production jobs where no brute-force tier is
  * expected.
  */
class VectorCartesianGuard(session: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private def carriesVectors(plan: LogicalPlan): Boolean =
    plan.output.exists(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val on = session.conf.getOption("spark.graft.failOnVectorCartesian").contains("true")
    if (on) plan.foreach {
      case j: Join if j.condition.isEmpty &&
          carriesVectors(j.left) && carriesVectors(j.right) =>
        throw new IllegalStateException(
          "Cartesian join of two embedding-carrying relations: at scale this " +
          "shuffles O(n*m) full vectors. Bucket one side (LSH / k-means / IVF) " +
          "or join on a key; if the cross product is genuinely intended " +
          "(query-side-small brute force), unset spark.graft.failOnVectorCartesian.")
      case _ => ()
    }
    plan
  }
}
