package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Backward as-of join as a NATIVE Catalyst operator — the (c) rung of
  * the extension ladder (custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`), used where composing built-ins genuinely changes the
  * plan shape: the compositional as-of ([[graft.ops.EventOps.evAsof]],
  * union + running-`last` window) materializes the unioned event
  * stream through one window pass, while this operator is the classic
  * streaming MERGE over two co-partitioned sorted children — no union
  * row inflation, no window buffer, one forward pass per partition.
  *
  * Semantics (pandas `merge_asof` / DuckDB `ASOF LEFT JOIN`): for each
  * left row, the single right row with equal key and the LARGEST right
  * time ≤ the left time; left rows with no such partner keep NULL
  * right columns. NULL keys and NULL times never match. Ties on equal
  * right (key, time) must be pre-deduplicated by the caller — the
  * match within an equal-time group is otherwise sort-nondeterministic
  * (same caveat as DuckDB's ASOF).
  *
  * 100 TB posture: `requiredChildDistribution` clusters both children
  * on the join key (EnsureRequirements aligns the two hash
  * partitionings, AQE-coalescible like any equi-join shuffle) and
  * `requiredChildOrdering` asks for (key, time) sort within
  * partitions, so the merge itself is O(|L| + |R|) per partition with
  * O(1) state — exactly a sort-merge join whose "match" is a running
  * last-row cursor instead of a buffered group.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None,
    direction: String = "backward") extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule making [[AsofJoinPlan]] transparent to column
  * pruning and left-side predicate pushdown — without it the node is
  * an opaque BinaryNode no built-in rule knows, so a consumer's
  * `.select`/`.filter` above `Asof.join` would silently full-scan both
  * children (wrong at 100 TB: a 2-column read of a wide fact table
  * must reach the parquet scan as a pruned ReadSchema).
  *
  *  - **Project pushdown**: `Project(p, asof)` prunes each child to
  *    the attributes `p` references plus the join keys/times. The
  *    inserted child Projects land directly above the scans where
  *    `PhysicalOperation` collapses them into ReadSchema at planning.
  *  - **Filter pushdown**: deterministic conjuncts referencing only
  *    LEFT attributes move below the join — safe because each left row
  *    maps independently (filtering left input ≡ filtering output).
  *    Right-side predicates are NOT pushed: filtering candidate right
  *    rows changes which row is the backward match, which is different
  *    from filtering the joined output.
  *
  * Runs in the `User Provided Optimizers` fixed-point batch (registered
  * by [[Asof.join]]); both cases are no-ops when nothing new can move,
  * so the fixed point is reached in one extra pass. */
object AsofJoinPruning extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsofJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic &&
          c.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
    case p @ Project(plist, a: AsofJoinPlan) =>
      val required = AttributeSet(plist.flatMap(_.references)) ++
        AttributeSet(a.leftKeys.flatMap(_.references)) ++
        AttributeSet(a.rightKeys.flatMap(_.references)) ++
        a.leftTime.references ++ a.rightTime.references
      def prune(child: LogicalPlan): LogicalPlan = {
        val kept = child.output.filter(required.contains)
        if (kept.size == child.output.size) child else Project(kept, child)
      }
      val (nl, nr) = (prune(a.left), prune(a.right))
      if (nl.eq(a.left) && nr.eq(a.right)) p
      else Project(plist, a.copy(left = nl, right = nr))
  }
}

/** Planner rule: one-to-one lowering of [[AsofJoinPlan]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tol, dir) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), tol, dir) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: co-partitioned on the key, both sides
  * sorted by (key, time), merged in one pass per partition. Rows held
  * across iterator steps are `copy()`-ed (sort/shuffle iterators reuse
  * their `UnsafeRow` buffers); everything else is zero-allocation per
  * row apart from the output projection. */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan,
    tolerance: Option[Long] = None,
    direction: String = "backward") extends BinaryExecNode {

  require(Seq("backward", "forward", "nearest").contains(direction),
    s"asof direction must be backward/forward/nearest, got '$direction'")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val allOutput = output
    val tol = tolerance
    val dir = direction
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOutput)
      val lTimeB = BindReferences.bindReference(lTimeExpr, leftOutput)
      val rTimeB = BindReferences.bindReference(rTimeExpr, rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      // numeric view of the time value — needed for the tolerance gate
      // and the forward/nearest distance compare. Times must be
      // integer-backed (timestamp/long = µs, date/int = days); the
      // plain backward join without tolerance never calls this.
      lazy val toNum: Any => Long = timeType match {
        case _: org.apache.spark.sql.types.LongType |
             _: org.apache.spark.sql.types.TimestampType |
             _: org.apache.spark.sql.types.TimestampNTZType =>
          v => v.asInstanceOf[Long]
        case _: org.apache.spark.sql.types.IntegerType |
             _: org.apache.spark.sql.types.DateType =>
          v => v.asInstanceOf[Int].toLong
        case other => throw new UnsupportedOperationException(
          s"asof tolerance/direction needs an integer-backed time type, " +
            s"got $other")
      }
      // tolerance gate over the match DISTANCE (≥ 0 by construction):
      // the best match is unchanged, the gate only decides whether it
      // is EMITTED — pandas merge_asof(tolerance=...) semantics
      val withinTol: Long => Boolean = tol match {
        case None => _ => true
        case Some(t) => d => d <= t
      }
      val nullRight = new GenericInternalRow(rightOutput.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(allOutput, allOutput)

      // the peeked right row (always a private copy), its key, its time
      var rRow: InternalRow = null
      var rKey: UnsafeRow = null
      var rTimeV: Any = null
      def advanceRight(): Unit = {
        rRow = null; rKey = null; rTimeV = null
        while (rRow == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rKeyProj(r)
          val tv = rTimeB.eval(r)
          if (!k.anyNull && tv != null) {
            rRow = r.copy(); rKey = k.copy(); rTimeV = tv
          }
        }
      }
      advanceRight()

      // running BACKWARD candidate for the CURRENT left key (the last
      // right row consumed with time ≤ the current left time); after
      // the consume loop, (rRow, rKey, rTimeV) is exactly the FORWARD
      // candidate — the first unconsumed right row, i.e. the smallest
      // right time > left time for this key (or a later key)
      var mRow: InternalRow = null
      var mKey: UnsafeRow = null
      var mTimeV: Any = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTimeB.eval(l)
        numOutputRows += 1
        if (lk.anyNull || lt == null) {
          resultProj(joined(l, nullRight))
        } else {
          if (mKey != null && keyOrd.compare(mKey, lk) != 0) {
            mRow = null; mKey = null; mTimeV = null
          }
          while (rKey != null && keyOrd.compare(rKey, lk) < 0) advanceRight()
          // forward wants strictly-¬(≥) consumed: consume < lt, keep
          // == lt as the forward candidate; backward/nearest consume ≤
          while (rKey != null && keyOrd.compare(rKey, lk) == 0 &&
              (if (dir == "forward") timeOrd.lt(rTimeV, lt)
               else timeOrd.lteq(rTimeV, lt))) {
            mRow = rRow; mKey = rKey; mTimeV = rTimeV
            advanceRight()
          }
          val fwdOk = rKey != null && keyOrd.compare(rKey, lk) == 0
          val chosen: InternalRow = dir match {
            case "backward" => // tol.isEmpty path never touches toNum,
              // so generic (non-integer) time types keep working there
              if (mRow == null) null
              else if (tol.isEmpty) mRow
              else if (withinTol(toNum(lt) - toNum(mTimeV))) mRow else null
            case "forward" =>
              if (fwdOk && withinTol(toNum(rTimeV) - toNum(lt))) rRow
              else null
            case _ => // nearest: closer of the two, tie → backward
              val bD = if (mRow != null) toNum(lt) - toNum(mTimeV)
                else Long.MaxValue
              val fD = if (fwdOk) toNum(rTimeV) - toNum(lt)
                else Long.MaxValue
              if (bD == Long.MaxValue && fD == Long.MaxValue) null
              else if (bD <= fD) { if (withinTol(bD)) mRow else null }
              else { if (withinTol(fD)) rRow else null }
          }
          resultProj(joined(l, if (chosen != null) chosen else nullRight))
        }
      }
    }
  }
}

/** Public entry point: `Asof.join(trades, quotes, Seq("sym"), Seq("sym"),
  * "t", "qt")` — resolves the named columns against each side, gives
  * the right side fresh expression ids (so self-joins can never alias),
  * registers the planner strategy on the session, and returns the
  * DataFrame of the custom plan. Right-side column names that collide
  * with left names should be renamed by the caller first. */
object Asof {
  /** As [[join]], with pandas `merge_asof(tolerance=...)` semantics:
    * the backward match is emitted only when `leftTime − rightTime ≤
    * tolerance` (units of the time column's integer backing —
    * microseconds for timestamps/µs longs, days for dates). The gate
    * never changes WHICH row is the best match, only whether the left
    * row keeps it or gets NULLs, so it costs one comparison per row in
    * the same single merge pass. */
  def joinTolerant(left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      tolerance: Long): DataFrame =
    join(left, right, leftOn, rightOn, leftTimeCol, rightTimeCol,
      Some(tolerance))

  /** As [[join]] with a match direction — the full pandas `merge_asof`
    * surface: `"backward"` (largest right time ≤ left, the default),
    * `"forward"` (smallest right time ≥ left), `"nearest"` (closer of
    * the two; a tie prefers backward). Forward/nearest need an
    * integer-backed time type; all run in the same single merge pass
    * (the forward candidate is simply the first unconsumed right row —
    * no second cursor, no lookahead buffer). */
  def joinDirected(left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      direction: String, tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftOn, rightOn, leftTimeCol, rightTimeCol,
      tolerance, direction)

  def join(left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AsofJoinPruning)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofJoinPruning
    }
    // Alias-project every right column: Alias mints fresh ExprIds, so
    // left/right outputs are disjoint even when both derive from the
    // same Dataset
    val r2 = right.select(right.columns.toSeq.map(n => right.col(n).as(n)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: column '$n' not found in [${plan.output.map(_.name).mkString(", ")}]"))
    PlanBridge.ofRows(spark, AsofJoinPlan(lPlan, rPlan,
      leftOn.map(attr(lPlan, _)), rightOn.map(attr(rPlan, _)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol), tolerance,
      direction))
  }
}
