package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Relational upsert — the MERGE of transactional table formats,
  * expressed over plain parquet-backed frames (no Delta jar ships
  * offline; see README). The semantics are Delta's
  * `whenMatched.updateAll / whenNotMatched.insertAll`:
  * every key present in `updates` takes the update row wholesale,
  * every other target row passes through.
  *
  * Scale shape: one anti-join plus a union — the anti-join shuffles on
  * the key (or broadcasts when `updates` is small, which is the common
  * CDC case: a day's changes against a full snapshot), and the union is
  * plan-level only (no data movement). Rewriting only affected
  * partitions (classic hive-style `replaceWhere`) composes on top by
  * filtering both sides to the touched partition values first.
  */
object Upsert {

  /** Latest-wins merge of `updates` into `target` on `keys`. `updates`
    * must carry the full target schema (insert/update rows are taken
    * verbatim). Duplicate keys WITHIN `updates` are the caller's bug —
    * both rows would survive, exactly like SQL MERGE's multiple-match
    * error, so dedupe upstream. */
  def latestWins(
      target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "latestWins requires at least one key column")
    target
      .join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
  }
}
