package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join — the whole-operator extension path (SURVEY §4
  * preference (c)): a custom `LogicalPlan` node, planned by an injected
  * `Strategy` into a custom `SparkPlan` that declares its distribution
  * and ordering requirements and merges the two sorted sides in ONE pass.
  *
  * Why a physical operator when [[graft.operators.AsOf.join]] already
  * composes the semantics from union+window: the composed form carries
  * every left AND right row through the window sort and materializes the
  * filled payload per input row; this operator keeps a single buffered
  * payload row per key and never widens the left rows until output — at
  * 100 TB that is one fewer wide sort and no union materialization, with
  * the SAME single hash shuffle (EnsureRequirements inserts the
  * co-partitioning exchanges + per-partition sorts the node declares).
  *
  * Semantics: for each left row, the LAST right row (in (key, ts, payload)
  * sort order) of the same key with `r.ts <= l.ts`; left rows with no such
  * right row carry nulls. Identical tie-handling to the composed form
  * (struct-greatest payload at equal ts).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    key: String, tsCol: String,
    payloadCols: Seq[String]) extends BinaryNode {

  // Side-specific columns are carried BY NAME and resolved lazily against
  // the current children: when both sides derive from the same relation,
  // the analyzer's DeduplicateRelations renews the right child's exprIds,
  // and a generic old→new rewrite cannot fix Attribute fields here (the
  // old ids legitimately survive on the LEFT side — ambiguous). Name
  // resolution always tracks whatever ids the children currently expose.
  private def find(p: LogicalPlan, n: String): Attribute =
    p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"as-of column $n not in [${p.output.map(_.name).mkString(", ")}]"))
  def leftKey: Attribute = find(left, key)
  def leftTs: Attribute = find(left, tsCol)
  def rightKey: Attribute = find(right, key)
  def rightTs: Attribute = find(right, tsCol)
  def payload: Seq[Attribute] = payloadCols.map(find(right, _))

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // No Expression fields → the default (expression-derived) references are
  // empty; declare them so ColumnPruning keeps the join columns alive on
  // both children.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      Seq(leftKey, leftTs, rightKey, rightTs) ++ payload)

  override lazy val resolved: Boolean = childrenResolved &&
    Seq(key, tsCol).forall(n =>
      left.output.exists(_.name == n) && right.output.exists(_.name == n)) &&
    payloadCols.forall(n => right.output.exists(_.name == n))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsOfJoinPlan]] → [[AsOfJoinExec]]. Attributes are
  * resolved from the logical node at planning time — after analysis (and
  * its dedup) has frozen the ids. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.functions.GraftExtensions]]).
  */
case class AsOfJoinStrategy(spark: SparkSession) extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ AsOfJoinPlan(l, r, _, _, _) =>
      AsOfJoinExec(planLater(l), planLater(r),
        p.leftKey, p.leftTs, p.rightKey, p.rightTs, p.payload) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join.
  *
  * Requirements declared, not hand-built: `requiredChildDistribution`
  * makes EnsureRequirements co-partition both sides on the key (ONE hash
  * exchange each, reusing any existing partitioning), and
  * `requiredChildOrdering` gets per-partition sorts on (key, ts[, payload
  * tie-break]). `doExecute` then zips co-partitions and streams both
  * sorted iterators once, buffering exactly one payload row.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    // payload columns join the right-side sort as the deterministic
    // tie-break for duplicate (key, ts) — same rule as the composed form
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      payload.filter(a =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType))
        .map(a => SortOrder(a, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lOut = left.output
    val rOut = right.output
    val payloadLocal = payload
    val (lk, lt) = (leftKey, leftTs)
    val (rk, rt) = (rightKey, rightTs)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyEval = BindReferences.bindReference(lk: org.apache.spark.sql.catalyst.expressions.Expression, lOut)
      val lTsEval = BindReferences.bindReference(lt: org.apache.spark.sql.catalyst.expressions.Expression, lOut)
      val rKeyEval = BindReferences.bindReference(rk: org.apache.spark.sql.catalyst.expressions.Expression, rOut)
      val rTsEval = BindReferences.bindReference(rt: org.apache.spark.sql.catalyst.expressions.Expression, rOut)
      val payloadProj = UnsafeProjection.create(
        payloadLocal.map(a => BindReferences.bindReference(
          a: org.apache.spark.sql.catalyst.expressions.Expression, rOut)))
      // the payload side of the joined row can be the all-null no-match
      // row — bind it as NULLABLE or primitive reads skip the null check
      // and surface 0/false instead of null
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ payloadLocal.map(_.withNullability(true)))
      val nullPayload: InternalRow = new GenericInternalRow(payloadLocal.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rKeyV: Any = _
        private var rTsV: Any = _
        // Null-key/null-ts right rows can never be the as-of match of any
        // left row (the equi-key is null-rejecting, like the SQL ASOF
        // oracle's ON equality): skip them while advancing rather than
        // feed nulls into the interpreted orderings (which NPE). Ascending
        // sort puts them first, so they are consumed before any real work.
        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val cand = rIter.next()
            val kv = rKeyEval.eval(cand)
            val tv = rTsEval.eval(cand)
            if (kv != null && tv != null) { rRow = cand; rKeyV = kv; rTsV = tv }
          }
        }
        advanceRight()

        private var lastPayload: UnsafeRow = _
        // explicit presence flag — a null sentinel would conflate "no
        // previous left key" with a genuine null key value
        private var hasLastKey = false
        private var lastKey: Any = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKeyEval.eval(l)
          val t = lTsEval.eval(l)
          if (k == null || t == null) {
            // null left key/ts matches nothing, by the same null-rejecting
            // rule; the right cursor and buffer are left untouched
            return outProj(joined(l, nullPayload))
          }
          // new left key → buffered payload is stale
          if (!hasLastKey || keyOrd.compare(lastKey, k) != 0) {
            lastPayload = null
            lastKey = k
            hasLastKey = true
          }
          // consume right rows up to (k, t]: skip earlier keys, record
          // same-key rows with ts <= t (later rows overwrite — the sort
          // order makes "last" deterministic)
          var continue = rRow != null
          while (continue) {
            val c = keyOrd.compare(rKeyV, k)
            if (c < 0) advanceRight()
            else if (c == 0 && tsOrd.compare(rTsV, t) <= 0) {
              lastPayload = payloadProj(rRow).copy()
              advanceRight()
            } else continue = false
            if (rRow == null) continue = false
          }
          outProj(joined(l, if (lastPayload == null) nullPayload else lastPayload))
        }
      }
    }
  }
}
