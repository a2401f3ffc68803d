package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Grouped top-k as a first-class operator (SURVEY §2.8 top-k; the
  * `Window.partitionBy(key).orderBy(score desc) + row_number <= k` idiom
  * sorts EVERY row of every group and shuffles the full input).
  *
  * This operator keeps one bounded min-heap per key:
  *  - partial phase (any distribution): each input partition emits at
  *    most k rows per key it saw;
  *  - final phase (clustered on key): merges the survivors.
  *
  * Shuffle volume drops from |input| to ≤ k·|keys|·|partitions|, and
  * nothing is ever fully sorted — the 100 TB difference between "top-10
  * neighbors per query" costing a corpus shuffle vs. a survivors
  * shuffle.
  */
final case class TopKPerKeyNode(keys: Seq[Expression], score: Expression,
                                tiebreak: Expression, k: Int,
                                child: LogicalPlan) extends UnaryNode {
  require(TopKPerKeyExec.scoreOrdering(score.dataType).isDefined,
    s"TopKPerKey score must be numeric, got ${score.dataType.catalogString}")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyExec {
  import org.apache.spark.sql.types._
  /** Numeric score types get their NATIVE interpreted ordering (None
    * for non-numeric — rejected at node construction, so a bad score
    * column fails fast instead of ClassCastException-ing mid-task).
    * Native means EXACT: a BIGINT or DECIMAL score is never widened to
    * double, so two scores differing only below double ulp (reachable
    * once scaled integers exceed 2^53) order identically here and in
    * the row_number window form the prune must agree with. */
  def scoreOrdering(dt: DataType): Option[Ordering[Any]] = dt match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType |
         ByteType | _: DecimalType =>
      Some(org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(dt).asInstanceOf[Ordering[Any]])
    case _ => None
  }
}

final case class TopKPerKeyExec(keys: Seq[Expression], score: Expression,
                                tiebreak: Expression, k: Int,
                                partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val scoreExpr = score
    val tieExpr = tiebreak
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      import org.apache.spark.sql.catalyst.expressions.BindReferences
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundScore = BindReferences.bindReference(scoreExpr, childOutput)
      val boundTie = BindReferences.bindReference(tieExpr, childOutput)
      // any orderable tiebreak type (long ids, uuid strings, ...) — not
      // just bigint; evaluated values may be buffer-backed (UTF8String),
      // so they are copied before entering the heap
      val baseOrd = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(tieExpr.dataType).asInstanceOf[Ordering[Any]]
      // null-tolerant with NULLS FIRST ascending — Spark's default for
      // Window.orderBy(tie) — so null-tie rows resolve identically to
      // the window row_number form (interpreted orderings NPE on nulls)
      val tieOrd: Ordering[Any] = new Ordering[Any] {
        override def compare(a: Any, b: Any): Int =
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else baseOrd.compare(a, b)
      }
      // DEEP copy: tie values may be views into the scan's reused row
      // buffer — not just UTF8String but UnsafeArrayData/UnsafeRow for
      // array/struct ties (any orderable type reaches here via the
      // window rewrite; r9 review caught the array case comparing
      // garbage once the buffer advanced). InternalRow.copyValue is
      // Spark's own any-type copier for exactly this.
      def copyTie(v: Any): Any =
        org.apache.spark.sql.catalyst.InternalRow.copyValue(v)
      // score ordering chosen from the static type (node construction
      // already rejected non-numeric score expressions); NATIVE, so
      // long/decimal scores compare exactly — see scoreOrdering
      val scoreOrd = TopKPerKeyExec.scoreOrdering(scoreExpr.dataType).get
      // per-key bounded heap; the root is the WEAKEST kept row under the
      // total order (score desc, tiebreak asc), i.e. the minimum score
      // with the maximum tiebreak — evicted when a better candidate
      // arrives, so ties resolve identically to the window form. A null
      // score is the weakest of all (Window desc orders NULLS LAST), so
      // it compares below every non-null score.
      val cmp = new java.util.Comparator[(Any, Any, InternalRow)] {
        override def compare(a: (Any, Any, InternalRow),
                             b: (Any, Any, InternalRow)): Int = {
          val c =
            if (a._1 == null && b._1 == null) 0
            else if (a._1 == null) -1
            else if (b._1 == null) 1
            else scoreOrd.compare(a._1, b._1)
          if (c != 0) c else tieOrd.compare(b._2, a._2)
        }
      }
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[(Any, Any, InternalRow)]]()
      while (it.hasNext) {
        val row = it.next()
        val s = boundScore.eval(row)
        val t = boundTie.eval(row)
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity is a HINT (the queue grows): cap it so a
          // large k doesn't eagerly allocate k+1 slots per key
          heap = new java.util.PriorityQueue[(Any, Any, InternalRow)](
            math.min(kk, 1024) + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add((s, copyTie(t), row.copy()))
        else if (cmp.compare((s, t, row), heap.peek()) > 0) {
          heap.poll(); heap.add((s, copyTie(t), row.copy()))
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach(h => h.forEach { case (_, _, r) => out += r })
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Column-name entry point for any grouped top-k consumer. */
object TopKPerKey {
  /** Prune `df` to (at most) the top-k rows per key under
    * (score desc, tie asc) WITHOUT ranking or sorting: output columns
    * unchanged, row order unspecified — follow with the row_number
    * window over the survivors when a rank column is needed. Shuffle
    * carries ≤ k·|keys|·|partitions| rows instead of the full input. */
  def prune(df: org.apache.spark.sql.DataFrame, keyCol: String, scoreCol: String,
            tieCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    // fail fast: the exec's heap comparator dereferences peek() on a
    // full-at-zero heap (r9 review) — and top-0 is a caller bug anyway
    require(k >= 1, s"TopKPerKey.prune: k must be >= 1, got $k")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val plan = ColumnBridge.logicalPlan(df)
    def attr(n: String) = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$n' in ${plan.output.map(_.name).mkString(", ")}"))
    ColumnBridge.ofRows(spark,
      TopKPerKeyNode(Seq(attr(keyCol)), attr(scoreCol), attr(tieCol), k, plan))
  }
}

/** Catalyst OPTIMIZER rule: rewrites the classic grouped-top-k idiom
  *
  *   Filter(rank <= k, Window(row_number() OVER (PARTITION BY keys
  *     ORDER BY score DESC, tie ASC) AS rank, child))
  *
  * into the same plan with [[TopKPerKeyNode]] inserted UNDER the
  * window — the window then ranks only the ≤ k·|keys| survivors the
  * bounded heaps let through, instead of sorting and shuffling every
  * input row. The rewrite is semantics-preserving because the node
  * prunes by EXACTLY the window's total order (score desc NULLS LAST,
  * tie asc NULLS FIRST — the exec's documented contract), so the
  * surviving set is precisely the rows whose row_number would be ≤ k.
  *
  * Conservative trigger conditions (anything else is left alone):
  * single row_number window expression; partition keys and sort
  * expressions are plain attributes; default null orderings; a numeric
  * score; the filter is a single `rank <= k` / `rank < k` comparison
  * on the window's own output attribute; k ≥ 1.
  *
  * Two accepted sort shapes:
  *  - (score DESC, tie ASC) — the fully-deterministic idiom; the heap
  *    prunes by exactly the window's total order.
  *  - (score DESC) alone — `row_number` over a NON-total order, where
  *    the window form itself breaks score ties by arrival order, i.e.
  *    nondeterministically. The rewrite passes the score as its own
  *    tiebreak (a no-op among tied rows): the heap keeps exactly k
  *    rows whose scores are ≥ every dropped row's score with boundary
  *    ties decided arbitrarily — precisely the set SOME valid
  *    execution of the original window would rank ≤ k. The rewrite
  *    adds no nondeterminism the query didn't already have, and
  *    tie-free data is bit-identical to the window form.
  *
  * Deploy: `spark.sql.extensions=graft.plans.GraftExtensions` (config
  * path) or `spark.experimental.extraOptimizations` (runtime path) —
  * either way existing window-form queries get the bounded-heap
  * physical shape with NO source change. */
object TopKWindowRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}

  private def limitOf(cond: Expression,
                      rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, _))
      if a.exprId == rank.exprId => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, _))
      if a.exprId == rank.exprId && v > Int.MinValue => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, _), a: Attribute)
      if a.exprId == rank.exprId => Some(v)
    case GreaterThan(Literal(v: Int, _), a: Attribute)
      if a.exprId == rank.exprId => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(partSpec, Seq(
            SortOrder(score: Attribute, Descending, NullsLast, _),
            SortOrder(tie: Attribute, Ascending, NullsFirst, _)), _)), _)),
          _, _, child, _))
      if !child.isInstanceOf[TopKPerKeyNode] &&
        // nonEmpty: a GLOBAL top-k (no PARTITION BY) must stay a
        // window — ClusteredDistribution(Nil) is rejected at planning
        partSpec.nonEmpty &&
        partSpec.forall(_.isInstanceOf[Attribute]) &&
        TopKPerKeyExec.scoreOrdering(score.dataType).isDefined =>
      limitOf(cond, alias.toAttribute) match {
        // upper bound: a huge k makes per-key heaps pointless (and the
        // plain window form is no worse) — leave those plans alone
        case Some(k) if k >= 1 && k <= (1 << 24) =>
          f.copy(child = w.copy(child =
            TopKPerKeyNode(partSpec, score, tie, k, child)))
        case _ => f
      }
    // single-sort-key form: row_number over (score DESC) only — the
    // window itself is tie-nondeterministic, so pruning with the score
    // as its own tiebreak yields a set some valid execution would rank
    // ≤ k (see the scaladoc's second accepted shape)
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(partSpec, Seq(
            SortOrder(score: Attribute, Descending, NullsLast, _)), _)), _)),
          _, _, child, _))
      if !child.isInstanceOf[TopKPerKeyNode] &&
        partSpec.nonEmpty &&
        partSpec.forall(_.isInstanceOf[Attribute]) &&
        TopKPerKeyExec.scoreOrdering(score.dataType).isDefined =>
      limitOf(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 && k <= (1 << 24) =>
          f.copy(child = w.copy(child =
            TopKPerKeyNode(partSpec, score, score, k, child)))
        case _ => f
      }
  }
}

/** Plans TopKPerKeyNode as final(partial(child)). */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, score, tiebreak, k, child) =>
      TopKPerKeyExec(keys, score, tiebreak, k, partial = false,
        TopKPerKeyExec(keys, score, tiebreak, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Injects the
  * top-k strategy and every native graft SQL function
  * ([[graft.functions.GraftFunctions.sqlBuilders]]) — the config-only
  * deploy path gets the full SQL surface with no Scala call. The
  * UDF-shaped extractors (`pdf_pages`, `graft_extract`, …) still come
  * from `GraftFunctions.register(spark)`: `spark.udf` does not exist
  * at injection time. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => TopKWindowRewrite)
    graft.functions.GraftFunctions.sqlBuilders.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftFunctions", name),
        builder))
    }
  }
}
