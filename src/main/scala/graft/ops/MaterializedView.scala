package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally maintained GROUP-BY materialized view over a
  * [[TxTable]] — the "materialized view maintenance" half of the
  * lakehouse design (Delta Live Tables / Snowflake MVs): the view's
  * aggregate state is itself a TxTable, and each refresh folds ONLY the
  * base table's row-level changes since the last refresh into it,
  * never rescanning base history.
  *
  * Maintained aggregates, two classes:
  *  - COUNT(*) (`n_rows`) and SUM (`<col>_sum`) are self-maintainable
  *    group homomorphisms: an insert adds, a delete subtracts, an
  *    update is its CDF delete+insert pair — every base write shape
  *    ([[TxTable.append]], [[TxTable.deleteVectorWhere]],
  *    [[TxTable.upsert]], [[TxTable.merge]], restore) maintains
  *    through one code path. AVG (`<col>_avg`) rides this class: the
  *    engine maintains a backing `sum` and a signed NON-NULL `count`
  *    and derives the average at read (SQL AVG null semantics — the
  *    standard store-sum-and-count MV device). STDDEV (`<col>_stddev`)
  *    and VARIANCE (`<col>_var`) ride it too: a backing
  *    sum-of-squares joins the sum and count (all three signed-
  *    foldable), and the sample moments derive at refresh — NULL below
  *    two non-null rows, exactly stddev_samp/var_samp.
  *  - MIN (`<col>_min`) and MAX (`<col>_max`) are homomorphisms under
  *    INSERTS only (fold via least/greatest); a delete may retire the
  *    extremum, so a delete-bearing window triggers a BOUNDED
  *    per-group recompute: only the groups the window's delete rows
  *    touch re-aggregate from the base head (a scoped semi-join scan),
  *    every other group keeps the O(window) fold — the shape real
  *    lakehouse MVs ship instead of per-group value multisets.
  *
  * Exactly-once without a sidecar: the refresh's OVERWRITE commit
  * carries its applied-base-version watermark IN the commit action tag
  * ([[TxTable.overwriteAs]], tag `mv-refresh-<v>`), so the state and
  * the bookkeeping land in one atomic CAS. A crashed-and-replayed
  * refresh sees `appliedVersion >= head` and no-ops; racing refreshers
  * converge because each commit's content is a pure function of the
  * window its tag names (the MV is always exactly "base aggregated as
  * of its tag", whichever refresh lands last — a stale-but-consistent
  * commit is caught up by the next refresh).
  *
  * Scale shape: the per-refresh cost is one CDF read of the changed
  * window (appends shuffle-free, rewrites bounded by touched files) +
  * one |groups|-row combine — base size never appears in the refresh
  * cost except through a delete-bearing MIN/MAX window, whose
  * recompute scans only the delete-touched groups' rows (group keys
  * broadcast below the base scan when small; stats-pruned like any
  * predicate read) — and the combine's full-outer join runs at MV
  * cardinality, which AQE broadcasts when small. The MV rewrite itself
  * is O(groups), the whole point of maintaining an aggregate instead
  * of recomputing it.
  */
final class MaterializedView private (spark: SparkSession, base: TxTable,
    mv: TxTable, groupCols: Seq[String], sumCols: Seq[String],
    minCols: Seq[String], maxCols: Seq[String],
    avgCols: Seq[String], stdCols: Seq[String], varCols: Seq[String],
    exprSums: Seq[(String, String)]) {

  import MaterializedView._

  /** Newest base version already folded in (from the refresh commits'
    * action tags, newest wins); -1 = nothing applied yet.
    *
    * BACKWARD name-probe from the head, not a full-log replay: every
    * refresh commit is tagged, so the newest tagged entry sits within
    * a few versions of the head (only foreign commits on the MV table
    * push it deeper) — O(1) entry reads per refresh instead of
    * O(refresh history). A missing entry (retention-cleaned below)
    * stops the walk, same reachable set as the old contiguous
    * replay's retention floor. */
  def appliedVersion: Long = {
    var v = mv.snapshot().version
    while (v >= 0) {
      mv.commitsBetween(v - 1, v).headOption match {
        case Some(c) if c.action.startsWith(Tag) =>
          return c.action.stripPrefix(Tag).toLong
        case Some(_) => v -= 1
        case None    => return -1L // cleaned below: no tag reachable
      }
    }
    -1L
  }

  /** The view's current state: `groupCols…, n_rows, <sumCol>_sum…,
    * <minCol>_min…, <maxCol>_max…, <avgCol>_avg…`. Averages are
    * PHYSICALLY materialized by every refresh — derived from the
    * maintained backing state (`<c>_sum` and the signed non-null
    * count `<c>_cnt`) with SQL AVG semantics exactly: nulls don't
    * count, an all-null group reads NULL — so a plain
    * `SELECT * FROM` over the MV's table serves them too; this
    * accessor additionally hides the backing columns the definition
    * didn't ask for. */
  def read(): DataFrame =
    if (hiddenState.isEmpty) mv.read() else mv.read().drop(hiddenState: _*)

  /** Fold base commits `(appliedVersion, head]` into the view. None =
    * already current. First refresh aggregates the head snapshot
    * directly (CDF from -1 would read the same rows as inserts). */
  def refresh(): Option[TxTable.Commit] = {
    val w = appliedVersion
    val head = base.snapshot().version
    if (head <= w) None
    else if (w < 0L)
      Some(mv.overwriteAs(s"$Tag$head",
        withDerived(fullAggregate(base.readAt(head)))))
    else {
      val (next, blocks) = fold(mv.read(), base.readChanges(w, head), head)
      // blocks release only AFTER the commit materialized the frame
      try Some(mv.overwriteAs(s"$Tag$head", withDerived(next)))
      finally Checkpoints.release(spark, blocks)
    }
  }

  /** Fold one pre-read CDF window ending at base version `upTo` —
    * the streaming face ([[maintainStream]]'s per-batch apply). The
    * watermark guard makes crash-replayed batches no-ops. */
  def foldBatch(changes: DataFrame, upTo: Long): Option[TxTable.Commit] = {
    val w = appliedVersion
    if (upTo <= w) None
    else {
      val cur = if (w < 0L) emptyState() else mv.read()
      val (next, blocks) = fold(cur, changes, upTo)
      try Some(mv.overwriteAs(s"$Tag$upTo", withDerived(next)))
      finally Checkpoints.release(spark, blocks)
    }
  }

  /** Continuous maintenance: the base's streaming CHANGE FEED drives
    * [[foldBatch]] per micro-batch. Restart-safe — the engine replays
    * the last un-committed batch, whose watermark the fold then
    * ignores. */
  def maintainStream(checkpointDir: String): StreamingQuery =
    spark.readStream.format("graft.sources.tx")
      .option("path", base.tableDir)
      .option("readChangeFeed", "true")
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, _: Long) =>
        if (!df.isEmpty) {
          val upTo = df.agg(max(col("_commit_version"))).head.getLong(0)
          foldBatch(df, upTo)
          ()
        }
      }
      .start()

  // ------------------------------------------------------------ internals

  private def hasExtrema: Boolean = minCols.nonEmpty || maxCols.nonEmpty

  /** Columns whose second moment (sum of squares) is maintained —
    * STDDEV and VARIANCE both derive from it (the standard
    * sum/sumsq/count MV device; all three backings are signed-foldable
    * homomorphisms, so deletes maintain like SUM with no recompute). */
  private def momentCols: Seq[String] = (stdCols ++ varCols).distinct

  /** Stored SUM-class state: the declared sums, plus each AVG's /
    * moment's backing sum (when not already declared) and its non-null
    * count — all signed-foldable homomorphisms, so every AVG/STDDEV/
    * VARIANCE maintains through the same code path as SUM (deletes
    * included; no recompute needed). */
  private def backingSums: Seq[String] =
    (avgCols ++ momentCols).distinct.filterNot(sumCols.contains)
  /** Columns with a maintained signed non-null count (AVG's divisor;
    * the moments' n). */
  private def cntCols: Seq[String] = (avgCols ++ momentCols).distinct
  private def sumNames: Seq[String] =
    (NRows +: sumCols.map(_ + "_sum")) ++
      backingSums.map(_ + "_sum") ++ cntCols.map(_ + "_cnt") ++
      momentCols.map(_ + "_sumsq") ++ exprSums.map(_._1)
  /** Internal backing columns [[read]] hides from the served view. */
  private def hiddenState: Seq[String] =
    backingSums.map(_ + "_sum") ++ cntCols.map(_ + "_cnt") ++
      momentCols.map(_ + "_sumsq")

  /** Materialize the derived averages onto a stored-state frame —
    * applied immediately before every refresh commit, so the stored
    * table itself serves `<c>_avg` to any reader. The fold machinery
    * itself never consumes the derived column (combine/fullAggregate
    * project the maintained aggregates explicitly), so it is pure
    * output, recomputed fresh each refresh. */
  private def withDerived(df: DataFrame): DataFrame = {
    // sample variance from the maintained moments:
    // (Σx² − (Σx)²/n) / (n−1), n = the signed non-null count; NULL for
    // n ≤ 1 (SQL var_samp/stddev_samp semantics), clamped at 0 against
    // the formula's floating-point cancellation residue (a constant
    // group's true variance is 0, not −1e−18)
    def variance(c: String): Column = {
      val n = col(c + "_cnt").cast("double")
      when(col(c + "_cnt") > 1L,
        greatest(
          (col(c + "_sumsq") -
            col(c + "_sum").cast("double") * col(c + "_sum") / n) /
            (n - 1.0),
          lit(0.0)))
    }
    val withAvg = avgCols.foldLeft(df)((d, c) =>
      d.withColumn(c + "_avg",
        when(col(c + "_cnt") > 0L, col(c + "_sum") / col(c + "_cnt"))))
    val withVar = varCols.foldLeft(withAvg)((d, c) =>
      d.withColumn(c + "_var", variance(c)))
    stdCols.foldLeft(withVar)((d, c) =>
      d.withColumn(c + "_stddev", sqrt(variance(c))))
  }
  private def extName: Seq[String] =
    minCols.map(_ + "_min") ++ maxCols.map(_ + "_max")
  private def aggNames: Seq[String] = sumNames ++ extName

  private def fullAggregate(df: DataFrame): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(NRows),
        (sumCols.map(c => sum(col(c)).as(c + "_sum")) ++
          backingSums.map(c => sum(col(c)).as(c + "_sum")) ++
          cntCols.map(c => count(col(c)).as(c + "_cnt")) ++
          // sumsq in double: a long column's squared sum would overflow
          // LongType under ANSI long before its variance is large
          momentCols.map(c => sum(col(c).cast("double") *
            col(c).cast("double")).as(c + "_sumsq")) ++
          // expression SUMs evaluate per base row (the expression is a
          // deterministic scalar over base columns, so it evaluates
          // identically on a CDF frame), then fold exactly like SUM
          exprSums.map { case (n, e) => sum(expr(e)).as(n) } ++
          minCols.map(c => min(col(c)).as(c + "_min")) ++
          maxCols.map(c => max(col(c)).as(c + "_max"))): _*)

  /** `current ⊕ window`, choosing the fold shape per aggregate class:
    * COUNT/SUM always fold signed; MIN/MAX fold (least/greatest) when
    * the window is pure inserts and fall back to the BOUNDED recompute
    * when it deletes — only delete-touched groups re-aggregate from
    * the base at `upTo`, the untouched remainder keeps the fold.
    * Returns the result plus the checkpoint block ids backing it; the
    * CALLER releases them after materializing (a localCheckpoint has
    * no lineage to recompute from once released). */
  private def fold(current: DataFrame, changes: DataFrame,
      upTo: Long): (DataFrame, Set[Int]) = {
    if (!hasExtrema) return (combine(current, deltaAggregate(changes)),
      Set.empty)
    // pins release on ANY exit: the caller's finally covers the pinned
    // ids only after this returns them, so a failure between the first
    // pin and the return (the delGroups pin materializing, the isEmpty
    // action, the prune-bounds head()) must release here or the blocks
    // leak for the session
    val (pinned, blocks) = Checkpoints.pin(changes)
    try fold0(current, pinned, blocks, upTo)
    catch {
      case scala.util.control.NonFatal(e) =>
        Checkpoints.release(spark, blocks)
        throw e
    }
  }

  private def fold0(current: DataFrame, pinned: DataFrame,
      blocks: Set[Int], upTo: Long): (DataFrame, Set[Int]) = {
    val (delGroups, dgBlocks) = Checkpoints.pin(
      pinned.where(col("_change_type") === "delete")
        .select(groupCols.map(col): _*).distinct())
    val all = blocks ++ dgBlocks
    try fold1(current, pinned, delGroups, all, upTo)
    catch {
      case scala.util.control.NonFatal(e) =>
        Checkpoints.release(spark, dgBlocks)
        throw e
    }
  }

  private def fold1(current: DataFrame, pinned: DataFrame,
      delGroups: DataFrame, all: Set[Int], upTo: Long)
      : (DataFrame, Set[Int]) = {
    val next =
      if (delGroups.isEmpty) combine(current, deltaAggregate(pinned))
      else {
        // rename the touched-group keys so the null-safe membership
        // joins below resolve unambiguously (NULL is a group in SQL)
        val dg = groupCols.foldLeft(delGroups)((df, c) =>
          df.withColumnRenamed(c, c + "_g"))
        def touched(df: DataFrame, joinType: String): DataFrame =
          df.join(dg, groupCols.map(c => col(c) <=> col(c + "_g"))
            .reduce(_ && _), joinType)
        // untouched groups: pure-insert remainder (any delete marked
        // its group), so the homomorphic fold stays exact for extrema
        val folded = combine(touched(current, "left_anti"),
          deltaAggregate(touched(pinned, "left_anti")))
        // touched groups: re-aggregate from the base at upTo, scoped
        // two ways. (1) FILE level: a single-key grouping prunes base
        // files through the logged stats via the touched keys'
        // [min,max] — the engine's stats-pruned read, pure I/O
        // reduction (NULL-keyed groups disable it: null never enters
        // min/max stats, so a range could wrongly drop a null-bearing
        // file). (2) ROW level: the semi-join below is the exact
        // filter either way, broadcast under the scan when small.
        val recomputeBase =
          if (groupCols.size == 1) {
            val g = groupCols.head
            val r = delGroups.agg(min(col(g)), max(col(g)),
              sum(when(col(g).isNull, 1L).otherwise(0L))).head()
            if (r.getLong(2) == 0L && !r.isNullAt(0))
              base.readPruned(upTo, Seq((g, Some(r.get(0)), Some(r.get(1)))))
            else base.readAt(upTo)
          } else base.readAt(upTo)
        val recomputed = fullAggregate(touched(recomputeBase, "left_semi"))
        folded.unionByName(recomputed)
      }
    (next, all)
  }

  /** Signed aggregate of a CDF frame: inserts +1, deletes -1 for the
    * COUNT/SUM class; plain min/max for extrema (callers only hand
    * pure-insert frames in when extrema are maintained — [[fold]]
    * routes delete-bearing windows to the recompute). */
  private def deltaAggregate(changes: DataFrame): DataFrame = {
    val sign: Column =
      when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    changes.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as(NRows),
        (sumCols.map(c => sum(col(c) * sign).as(c + "_sum")) ++
          backingSums.map(c => sum(col(c) * sign).as(c + "_sum")) ++
          cntCols.map(c => sum(when(col(c).isNotNull, sign)
            .otherwise(lit(0L))).as(c + "_cnt")) ++
          momentCols.map(c => sum(col(c).cast("double") *
            col(c).cast("double") * sign).as(c + "_sumsq")) ++
          exprSums.map { case (n, e) => sum(expr(e) * sign).as(n) } ++
          minCols.map(c => min(col(c)).as(c + "_min")) ++
          maxCols.map(c => max(col(c)).as(c + "_max"))): _*)
  }

  /** `current ⊕ delta`: full-outer on the group keys, null-safe adds
    * for COUNT/SUM, least/greatest for MIN/MAX (both skip the NULL an
    * absent side contributes), groups emptied by deletes dropped.
    * Runs at MV cardinality.
    *
    * The join is NULL-SAFE (`<=>`) on every key: SQL GROUP BY makes
    * NULL a group, and an equality join would keep the current and
    * delta NULL-group rows apart — two NULL rows in the view and a
    * count that never converges. */
  private def combine(current: DataFrame, delta: DataFrame): DataFrame = {
    val d0 = aggNames.foldLeft(delta)((df, c) =>
      df.withColumnRenamed(c, c + "_d"))
    val d = groupCols.foldLeft(d0)((df, c) =>
      df.withColumnRenamed(c, c + "_g"))
    val cond = groupCols.map(c => col(c) <=> col(c + "_g"))
      .reduce(_ && _)
    current.join(d, cond, "full_outer")
      .select(groupCols.map(c => coalesce(col(c), col(c + "_g")).as(c)) ++
        sumNames.map(c =>
          (coalesce(col(c), lit(0L)) + coalesce(col(c + "_d"), lit(0L)))
            .as(c)) ++
        minCols.map(c => least(col(c + "_min"), col(c + "_min_d"))
          .as(c + "_min")) ++
        maxCols.map(c => greatest(col(c + "_max"), col(c + "_max_d"))
          .as(c + "_max")): _*)
      .where(col(NRows) > 0L)
  }

  /** Zero-group state with the MV's exact schema — the fold base when
    * the first window arrives through [[foldBatch]] (group/sum column
    * types derive from the CHANGE frame itself, so no base read). */
  private def emptyState(): DataFrame =
    fullAggregate(base.snapshot().read(spark)).limit(0)
}

object MaterializedView {

  /** Refresh commits' action-tag prefix; the rest is the applied base
    * version. */
  private[ops] val Tag = "mv-refresh-"

  /** The maintained COUNT(*) column. */
  val NRows = "n_rows"

  /** Open (or create) the view state at `mvDir` over `base`, grouping
    * by `groupCols` and maintaining `SUM(c) AS c_sum` per `sumCols`
    * (plus `n_rows`). */
  def apply(spark: SparkSession, base: TxTable, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String]): MaterializedView =
    apply(spark, base, mvDir, groupCols, sumCols, Nil, Nil)

  /** Full surface: additionally `MIN(c) AS c_min` per `minCols` and
    * `MAX(c) AS c_max` per `maxCols` (delete-bearing windows trigger
    * the bounded per-group recompute — see the class doc). */
  def apply(spark: SparkSession, base: TxTable, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String]): MaterializedView =
    apply(spark, base, mvDir, groupCols, sumCols, minCols, maxCols, Nil)

  /** Full surface with AVG: `AVG(c) AS c_avg` per `avgCols`, derived
    * at read from maintained `sum` + non-null `count` backing state
    * (SQL AVG null semantics; deletes fold, no recompute needed). */
  def apply(spark: SparkSession, base: TxTable, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String],
      avgCols: Seq[String]): MaterializedView =
    apply(spark, base, mvDir, groupCols, sumCols, minCols, maxCols,
      avgCols, Nil, Nil)

  /** Full surface with second moments: `STDDEV(c) AS c_stddev` per
    * `stdCols` and `VARIANCE(c) AS c_var` per `varCols` (sample
    * semantics, NULL below two non-null rows, like SQL
    * stddev_samp/var_samp) — maintained via a backing sum,
    * sum-of-squares, and signed non-null count, all SUM-class
    * homomorphisms, so deletes fold with no recompute. */
  def apply(spark: SparkSession, base: TxTable, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String],
      avgCols: Seq[String], stdCols: Seq[String],
      varCols: Seq[String]): MaterializedView =
    apply(spark, base, mvDir, groupCols, sumCols, minCols, maxCols,
      avgCols, stdCols, varCols, Nil)

  /** Full surface with EXPRESSION sums: each `(name, exprSql)` of
    * `exprSums` maintains `SUM(exprSql) AS name` — the expression must
    * be a DETERMINISTIC scalar over base columns (it evaluates per CDF
    * row before the signed fold; the SQL face validates determinism at
    * CREATE, API callers own it here — a non-deterministic expression
    * would silently drift the state under deletes). */
  def apply(spark: SparkSession, base: TxTable, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String],
      avgCols: Seq[String], stdCols: Seq[String],
      varCols: Seq[String], exprSums: Seq[(String, String)])
      : MaterializedView =
    new MaterializedView(spark, base, TxTable(spark, mvDir),
      groupCols, sumCols, minCols, maxCols, avgCols, stdCols, varCols,
      exprSums)
}
