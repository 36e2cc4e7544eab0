package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge

/** Native as-of join — a whole-operator Catalyst extension (logical node
  * + planner strategy + physical operator), the (c) altitude of the
  * custom-op preference order: the semantics ("for each left row, the
  * latest right row of the same key at or before it") are a JOIN, not an
  * expression, and no composition of built-ins yields the single-pass
  * merge plan below.
  *
  * vs the composed `q_asof_join` (union + running `last(ignoreNulls)`
  * window): same one shuffle per side, but NO union materialization, no
  * window buffering, and the right side streams through each partition
  * exactly once with O(1) carried state per key — at 100 TB the window
  * form pays sort+buffer over |left|+|right| rows while this merge pays
  * sort over each side separately and zero buffering.
  *
  * Execution contract (enforced through EnsureRequirements, not by hand):
  * both children hash-clustered on their join keys and sorted by
  * (keys, time) — the same contract SortMergeJoin declares — then
  * `doExecute` zips co-partitions and merges. Inner semantics: left rows
  * with no preceding right row are dropped (matches DuckDB `ASOF JOIN`).
  */
object AsOfJoin {

  /** Logical node. Output = left ⧺ right columns; resolved as soon as its
    * (already-analyzed) children are — the analyzer passes it through and
    * the optimizer treats it as an opaque barrier, which is correct: all
    * pushable work is expressed in the child plans by the caller.
    */
  case class AsOfJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ right.output
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy mapping the logical node 1:1 to the exec. */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ right.output

    override lazy val metrics = Map(
      "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

    // Rows come out in the left child's clustering and ordering — declare
    // it so a downstream window/agg on the same key reuses this exchange.
    override def outputPartitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def doExecute(): RDD[InternalRow] = {
      val numOutputRows = longMetric("numOutputRows")
      val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
      val lSchema = left.output; val rSchema = right.output
      val lTime = leftTime; val rTime = rightTime
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        // Project each side to (keys ⧺ time); the shared schema makes the
        // natural-ascending ordering comparable ACROSS sides.
        val keyTypes = (lKeyExprs :+ lTime).map(_.dataType)
        val lProj = UnsafeProjection.create(lKeyExprs :+ lTime, lSchema)
        val rProj = UnsafeProjection.create(rKeyExprs :+ rTime, rSchema)
        val keyOrd = Bridge.naturalRowOrdering(keyTypes.dropRight(1))
        val fullOrd = Bridge.naturalRowOrdering(keyTypes)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          // Right cursor: one row of lookahead, plus the last right row
          // whose (key, time) was consumed — the as-of candidate. O(1)
          // state; both must be copies (UnsafeRow buffers are reused).
          private var rHead: InternalRow = _
          private var rHeadKey: InternalRow = _
          private var candidate: InternalRow = _
          private var candidateKey: InternalRow = _
          private var pending: InternalRow = _
          advanceRight()

          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              val r = rIter.next()
              rHead = r.copy()
              rHeadKey = rProj(rHead).copy()
            } else { rHead = null; rHeadKey = null }

          private def findNext(): Unit =
            while (pending == null && lIter.hasNext) {
              val l = lIter.next()
              val lk = lProj(l)
              // Consume right rows at or before this left row: strictly
              // smaller key, or same key with time ≤ left time. The last
              // one consumed per key is the as-of match.
              while (rHead != null && fullOrd.compare(rHeadKey, lk) <= 0) {
                candidate = rHead
                candidateKey = rHeadKey
                advanceRight()
              }
              if (candidate != null &&
                  keyOrd.compare(candidateKey, lk) == 0)
                pending = joined(l, candidate)
            }

          override def hasNext: Boolean = { findNext(); pending != null }
          override def next(): InternalRow = {
            findNext()
            val out = pending; pending = null
            numOutputRows += 1
            out
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Make the strategy available to a session's planner. Idempotent;
    * callable at runtime (tests, the driver's session) — production
    * sessions get it via `spark.sql.extensions=graft.GraftExtensions`.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** As-of join `left` to `right` on equal `keys` with
    * right.`rightTimeCol` ≤ left.`leftTimeCol` (latest match wins,
    * inner). Right columns keep their names; callers project/rename
    * downstream.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    // Re-alias every right column: a fresh exprId per column makes the
    // two sides disjoint even when both derive from the same scan
    // (self-join case) — the same dedup the analyzer does for Join.
    val rightFresh = right.select(
      right.columns.map(n => right(n).as(n)).toIndexedSeq: _*)
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(rightFresh)
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof: column '$name' not in ${plan.output.map(_.name)}"))
    val (lk, rk) = (keys.map(resolve(lPlan, _)), keys.map(resolve(rPlan, _)))
    val (lt, rt) = (resolve(lPlan, leftTimeCol), resolve(rPlan, rightTimeCol))
    // The merge compares projected key/time rows with ONE ordering built
    // from the left types — a silent type mismatch would compare garbage.
    (lk :+ lt).zip(rk :+ rt).foreach { case (a, b) =>
      if (a.dataType != b.dataType) throw new IllegalArgumentException(
        s"asof: column '${a.name}' is ${a.dataType.sql} on the left but " +
          s"${b.dataType.sql} on the right — cast one side first")
    }
    Bridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt))
  }

  /** SQL surface for the native operator, as a table-valued function —
    * the same altitude as DuckDB's `ASOF JOIN` clause but reachable with
    * zero parser changes:
    *
    *   SELECT ... FROM asof_join('clicks', 'errors', 'user_id,region',
    *                             'ts', 'err_ts')
    *
    * Arguments: left table/view name, right table/view name, CSV key
    * column list, left time column, right time column — all string
    * literals (resolved at analysis time, so a typo fails the query, not
    * the job). Output = every left column, then every right column
    * EXCEPT the keys (which would duplicate the left's names and values
    * — the same de-dup `JOIN ... USING` performs). Plans through
    * `AsOfJoinPlan`, so SQL callers get the identical single-pass merge,
    * exchange reuse, and metrics as the Scala API.
    */
  def sqlBuilder(args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.types.StringType
    if (args.length != 5) throw new IllegalArgumentException(
      "asof_join expects (left_table, right_table, keys_csv, left_time, " +
        "right_time), all string literals")
    def strArg(i: Int, what: String): String = args(i) match {
      case e if e.foldable && e.dataType == StringType && e.eval() != null =>
        e.eval().toString
      case _ => throw new IllegalArgumentException(
        s"asof_join: $what must be a non-null string literal")
    }
    val spark = SparkSession.active
    val left = spark.table(strArg(0, "left_table"))
    val right = spark.table(strArg(1, "right_table"))
    val keys = strArg(2, "keys_csv").split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    if (keys.isEmpty) throw new IllegalArgumentException(
      "asof_join: keys_csv lists no key columns")
    val joined =
      asof(left, right, keys, strArg(3, "left_time"), strArg(4, "right_time"))
    val plan = Bridge.analyzed(joined)
    val nLeft = left.columns.length
    val dropIdx = keys.map(k => nLeft + right.columns.indexOf(k)).toSet
    org.apache.spark.sql.catalyst.plans.logical.Project(
      plan.output.zipWithIndex.collect { case (a, i) if !dropIdx(i) => a },
      plan)
  }

  /** Runtime registration of strategy + TVF for sessions built without
    * `spark.sql.extensions=graft.GraftExtensions`. Idempotent.
    */
  def ensureSqlRegistered(spark: SparkSession): Unit = {
    ensureRegistered(spark)
    Bridge.registerTableFunction(spark, "asof_join", sqlBuilder)
  }
}
