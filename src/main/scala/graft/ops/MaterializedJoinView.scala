package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained GROUP-BY materialized view over an INNER
  * EQUI-JOIN of two [[TxTable]]s — the star-schema rollup shape
  * (`fact JOIN dim ON k GROUP BY dim.attr`) that single-table MVs
  * ([[MaterializedView]]) refuse. Maintenance rides the bilinearity of
  * the join over signed row multisets:
  *
  *   A₁⋈B₁ − A₀⋈B₀ = ΔA⋈B₀ + A₁⋈ΔB
  *
  * — exact, not an approximation: ΔA (the left CDF window, deletes
  * signed −1) joins the RIGHT side at its OLD version, the left side
  * at its NEW version joins ΔB, and the two signed row sets aggregate
  * and fold into the state exactly like a single-table window. Both
  * evaluations read PINNED versions (`readAt`/`readChanges`), so a
  * concurrent writer on either base cannot tear the cut.
  *
  * Maintained aggregates: COUNT(*) (`n_rows`) and SUM (`<col>_sum`) —
  * the signed-foldable class, where a delete-bearing window folds with
  * no recompute. MIN/MAX/AVG/DISTINCT over a join refuse at the SQL
  * face (extrema would need a bounded recompute over the JOIN, a
  * different cost shape).
  *
  * Exactly-once via the same watermark-in-tag device as the
  * single-table view, extended to both bases: each refresh commit's
  * action is `mv-refresh-<vA>:<vB>`, so the state and BOTH applied
  * versions land in one atomic CAS, replays no-op, and racing
  * refreshers converge to whichever consistent cut landed last.
  *
  * Scale shape: a refresh pays O(ΔA ⋈ B) + O(A ⋈ ΔB) — the canonical
  * incremental-join cost, with the window side broadcast below the
  * base scan when small and the base side's scan prunable through the
  * join keys (runtime filters at execution; never a re-aggregation of
  * the full join) — plus one |groups|-row combine. Base-pair size
  * appears nowhere: the full join materializes exactly once, at the
  * first population.
  */
final class MaterializedJoinView private (spark: SparkSession,
    a: TxTable, b: TxTable, mv: TxTable, groupCols: Seq[String],
    sumCols: Seq[String], leftKeys: Seq[String],
    rightKeys: Seq[String]) {

  import MaterializedView.{NRows, Tag}

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "join view needs equi-join keys, paired 1:1")
  require(groupCols.nonEmpty, "join view needs at least one GROUP BY column")

  /** Which side serves each referenced (group/sum) column — resolved
    * once against the two schemas; a name on BOTH sides is ambiguous
    * and refused (the SQL face validates the same way at CREATE). */
  private lazy val (aCols, bCols): (Set[String], Set[String]) = {
    val as = a.read().columns.toSet
    val bs = b.read().columns.toSet
    val refs = (groupCols ++ sumCols).distinct
    refs.foreach { c =>
      require(as.contains(c) || bs.contains(c),
        s"join view column $c exists on neither side")
      require(!(as.contains(c) && bs.contains(c)),
        s"join view column $c is ambiguous (both sides carry it)")
    }
    (refs.filter(as.contains).toSet, refs.filter(bs.contains).toSet)
  }

  /** Newest applied (left, right) base versions from the refresh tags
    * (the single-table backward name-probe, two-version payload);
    * (-1, -1) = never populated. */
  def appliedVersions: (Long, Long) = {
    var v = mv.snapshot().version
    while (v >= 0) {
      mv.commitsBetween(v - 1, v).headOption match {
        case Some(c) if c.action.startsWith(Tag) =>
          val payload = c.action.stripPrefix(Tag)
          val i = payload.indexOf(':')
          require(i > 0, s"join view refresh tag without a version " +
            s"pair: ${c.action} (is this a single-table view?)")
          return (payload.take(i).toLong, payload.drop(i + 1).toLong)
        case Some(_) => v -= 1
        case None    => return (-1L, -1L)
      }
    }
    (-1L, -1L)
  }

  /** The view's current state: `groupCols…, n_rows, <sumCol>_sum…`. */
  def read(): DataFrame = mv.read()

  /** Fold both bases' windows `(wA, hA] × (wB, hB]` into the view.
    * None = already current on both sides. */
  def refresh(): Option[TxTable.Commit] = {
    val (wA, wB) = appliedVersions
    val hA = a.snapshot().version
    val hB = b.snapshot().version
    if (hA <= wA && hB <= wB) return None
    require(hA >= wA && hB >= wB,
      s"base went backwards: applied ($wA,$wB), heads ($hA,$hB)")
    val frame =
      if (wA < 0L)
        aggregate(joined(sideA(a.readAt(hA), lit(1L)),
          sideB(b.readAt(hB))))
      else {
        // ΔA ⋈ B@wB ∪ A@hA ⋈ ΔB, every row carrying its CDF sign —
        // one aggregation over the union, then the signed combine
        val steps = Seq(
          if (hA > wA)
            Some(joined(sideA(a.readChanges(wA, hA), sign),
              sideB(b.readAt(wB))))
          else None,
          if (hB > wB)
            Some(joined(sideA(a.readAt(hA), lit(1L)),
              sideB(b.readChanges(wB, hB), Some(sign))))
          else None).flatten
        combine(mv.read(), aggregate(steps.reduce(_ unionByName _)))
      }
    Some(mv.overwriteAs(s"$Tag$hA:$hB", frame))
  }

  // ------------------------------------------------------------ internals

  private def sign: Column =
    when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))

  private def sumNames: Seq[String] = NRows +: sumCols.map(_ + "_sum")

  /** Left frame projected to join keys + its referenced columns + the
    * row's sign (`__w`): +1 on snapshot reads, the CDF sign on delta
    * reads. Keys rename to neutral names so the equi-join never
    * collides with a referenced column. */
  private def sideA(df: DataFrame, w: Column): DataFrame =
    df.select(leftKeys.zipWithIndex.map { case (k, i) =>
      col(k).as(s"__k$i") } ++
      aCols.toSeq.sorted.map(col) :+ w.as("__w"): _*)

  /** Right frame projected to join keys + its referenced columns
    * (+ the CDF sign when this side is the delta). */
  private def sideB(df: DataFrame, s: Option[Column] = None): DataFrame =
    df.select(rightKeys.zipWithIndex.map { case (k, i) =>
      col(k).as(s"__j$i") } ++
      bCols.toSeq.sorted.map(col) ++
      s.map(_.as("__wb")).toSeq: _*)

  /** Inner equi-join of the projected sides; the joined row's weight
    * is the product of the sides' signs (exactly one side is ever a
    * delta, the other contributes +1). NULL keys drop on both the
    * full and delta paths — inner-join semantics, consistently. */
  private def joined(fa: DataFrame, fb: DataFrame): DataFrame = {
    val cond = leftKeys.indices.map(i => col(s"__k$i") === col(s"__j$i"))
      .reduce(_ && _)
    val j = fa.join(fb, cond, "inner")
    val weighted =
      if (j.columns.contains("__wb"))
        j.withColumn("__w", col("__w") * col("__wb"))
      else j
    weighted.select(groupCols.map(col) ++ sumCols.map(col) :+
      col("__w"): _*)
  }

  /** Signed aggregate of weighted join rows. */
  private def aggregate(rows: DataFrame): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__w")).as(NRows),
        sumCols.map(c => sum(col(c) * col("__w")).as(c + "_sum")): _*)

  /** `current ⊕ delta`: null-safe full-outer on the group keys, signed
    * adds, groups emptied by deletes dropped — the single-table
    * combine, at MV cardinality. */
  private def combine(current: DataFrame, delta: DataFrame): DataFrame = {
    val d0 = sumNames.foldLeft(delta)((df, c) =>
      df.withColumnRenamed(c, c + "_d"))
    val d = groupCols.foldLeft(d0)((df, c) =>
      df.withColumnRenamed(c, c + "_g"))
    val cond = groupCols.map(c => col(c) <=> col(c + "_g"))
      .reduce(_ && _)
    current.join(d, cond, "full_outer")
      .select(groupCols.map(c => coalesce(col(c), col(c + "_g")).as(c)) ++
        sumNames.map(c =>
          (coalesce(col(c), lit(0L)) + coalesce(col(c + "_d"), lit(0L)))
            .as(c)): _*)
      .where(col(NRows) > 0L)
  }
}

object MaterializedJoinView {

  /** Open (or create) the join-view state at `mvDir` over
    * `a INNER JOIN b ON leftKeys = rightKeys`, grouping by `groupCols`
    * and maintaining `n_rows` plus `SUM(c) AS c_sum` per `sumCols`.
    * Group/sum columns are plain names each resolving to exactly one
    * side. */
  def apply(spark: SparkSession, a: TxTable, b: TxTable, mvDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      leftKeys: Seq[String], rightKeys: Seq[String])
      : MaterializedJoinView =
    new MaterializedJoinView(spark, a, b, TxTable(spark, mvDir),
      groupCols, sumCols, leftKeys, rightKeys)
}
