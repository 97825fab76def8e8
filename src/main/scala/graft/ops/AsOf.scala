package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the temporal join a training-data /
  * event pipeline needs constantly: enrich every probe row with the
  * latest build row whose `time` is ≤ the probe's, per key.
  *
  * Implementation is the SCALABLE form: tag and union the two inputs,
  * then one window pass per key carrying the last non-null build payload
  * forward. Exactly one shuffle (the window's partitionBy), linear work,
  * bounded memory — no time-range self-join, which explodes
  * quadratically on hot keys and cannot be hash-planned. Equal
  * timestamps match (build sorts before probe at the same instant, so a
  * probe row sees a same-timestamp build row — DuckDB/QuestDB ASOF
  * semantics).
  *
  * The build side must be unique per (key, time) — pre-aggregate it —
  * otherwise "the" most recent row is undefined in any engine.
  */
object AsOf {

  /** @param probe   rows to enrich (all columns kept)
    * @param build   rows providing the payload; unique per (key, time)
    * @param key     equi-join column name (same name both sides)
    * @param time    event-time column name (same name both sides)
    * @param payload build columns to carry onto each probe row (emitted
    *                nullable: null when no build row precedes the probe)
    */
  def asOfJoin(
      probe: DataFrame, build: DataFrame,
      key: String, time: String, payload: Seq[String]): DataFrame = {
    val tagged = build
      .select(col(key), col(time),
        struct(payload.map(col): _*).as("__asof_payload"))
      .withColumn("__is_probe", lit(0))
      .unionByName(
        probe.withColumn("__is_probe", lit(1)),
        allowMissingColumns = true)
    // build-before-probe at equal time: carry includes same-instant builds
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("__is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      .withColumn("__asof", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .where(col("__is_probe") === 1)
    val out = probe.columns.map(col) ++
      payload.map(p => col("__asof").getField(p).as(p))
    carried.select(out: _*)
  }
}
