package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine's public surface.
  *
  * @param name    stable key, referenced by the correctness/bench harness
  * @param build   DataFrame producer over a testdata scale-factor directory
  * @param oracle  equivalent ANSI SQL runnable by DuckDB over the same
  *                parquet tables; None for ops whose semantics are not
  *                SQL-expressible (those get a weaker rows-only check)
  * @param bench   include in the headline benchmark set
  * @param benchBuild two-stage variant for queries whose `build` writes to
  *                disk: the outer call performs the write ONCE (untimed
  *                setup — temp-dir churn would otherwise dominate the
  *                measurement), the returned thunk builds the read-side
  *                plan the bench times per run. Queries with `benchBuild`
  *                are benched even when `bench = false`.
  * @param verify  include in the Verify/oracle correctness dump. False
  *                only for queries whose input is NOT the sf-directory
  *                tables (e.g. the immigration reference dataset) — those
  *                carry their own golden assertions instead.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true,
    benchBuild: Option[(SparkSession, String) => () => DataFrame] = None,
    verify: Boolean = true)

object Registry {
  /** Full query surface, assembled per module. Order is stable. */
  def all: Seq[GraftQuery] =
    Relational.queries ++ TrainingData.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      CorpusOps.queries ++ ExtendedQueries.queries ++
      TxDmlQueries.queries ++ GraphQueries.queries ++
      BpeQueries.queries ++ ImmigrationBench.queries

  def byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
}
