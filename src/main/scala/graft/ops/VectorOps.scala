package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector math as native Catalyst column trees (no UDFs), plus
  * the random-hyperplane LSH used for approximate nearest-neighbor
  * search.
  *
  * All arithmetic is double-precision left-to-right folds so an external
  * SQL oracle computing `list_sum(list_transform(...))` reproduces the
  * exact same floating-point results.
  */
object VectorOps {

  /** Element-wise dot product of two double arrays (portable HOF fold —
    * interpreted; use [[dotNative]] on hot paths). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Codegen'd dot product / L2 norm via the engine's native Catalyst
    * expressions (see [[graft.functions.VectorExpressions]]) — identical
    * left-to-right summation, so results match [[dot]]/[[norm2]] and the
    * SQL oracle bit-for-bit. Requires the functions registered on the
    * session (`VectorExpressions.register`). */
  def dotNative(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def normNative(a: Column): Column = call_function("vec_norm", a)

  /** Cosine similarity; null-safe only in that degenerate zero-norm
    * vectors yield null (division by zero → null in non-ANSI ops is a
    * trap; the testdata has no zero vectors and ANSI divide-by-zero on
    * doubles yields Infinity, never thrown). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Deterministic pseudo-random hyperplanes: `planes × dims` values in
    * [-1, 1], 4-decimal-rounded so they can be embedded as literals in
    * oracle SQL. Plain 48-bit LCG (java.util.Random's constants) from a
    * fixed seed — no runtime randomness, identical every run. */
  def hyperplanes(planes: Int, dims: Int, seed: Long = 20260812L): Seq[Seq[Double]] = {
    var s = (seed ^ 0x5DEECE66DL) & ((1L << 48) - 1)
    def next(): Double = {
      s = (s * 0x5DEECE66DL + 0xBL) & ((1L << 48) - 1)
      val u = (s >>> 22).toDouble / (1L << 26).toDouble // [0,1)
      math.rint((u * 2 - 1) * 1e4) / 1e4
    }
    Seq.fill(planes)(Seq.fill(dims)(next()))
  }

  /** Literal column for one hyperplane. */
  def planeCol(p: Seq[Double]): Column = array(p.map(lit): _*)

  /** Sign-bucket id of a vector under the given hyperplanes: bit `i` set
    * iff `dot(v, plane_i) > 0`. With `p` planes the corpus splits into
    * ≤ 2^p buckets; neighbors agree on buckets with probability
    * `1 - angle/π` per plane (random-hyperplane LSH). */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, planeCol(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB-SQL rendering of the same plane dot product over vector
    * expression `v` (1-based list indexing). */
  def sqlPlaneDot(v: String, plane: Seq[Double]): String = {
    val lits = plane.mkString("[", ", ", "]")
    s"list_sum(list_transform(generate_series(1, ${plane.size}), i -> $v[i] * ($lits)[i]))"
  }

  def sqlLshBucket(v: String, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${sqlPlaneDot(v, p)} > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Default broadcast ceiling for [[lshNearDupPairs]]: the bucketed
    * corpus (ids + 64-double vectors) must fit one executor-resident
    * broadcast with headroom. */
  val NearDupBroadcastBytes: Long = 64L << 20

  /** Cosine near-dup pairs (cos ≥ `minCos`) blocked by hyperplane-LSH
    * bucket, with a size-adaptive join strategy (the house pattern —
    * mirrors `Dedup.verifyPairs`):
    *
    *  - small corpus (optimizer size estimate ≤ `broadcastBytes`): the
    *    build side broadcasts, so the probe scan stays fully parallel
    *    regardless of bucket count;
    *  - large corpus: a plain bucket-key equi-join — both sides shuffle
    *    by bucket hash, nothing driver-resident. Parallelism is then
    *    bucket-bounded, so callers at scale pass MORE `planes` (buckets
    *    ≫ cores; recall per pair decays per plane, compensate with band
    *    OR-ing as in MinHash if needed).
    *
    * The switch reads plan STATISTICS (file sizes at the scan), not a
    * count job — free, and exactly the signal Spark's own broadcast
    * planning uses. Input needs `vec_id`, `v`, `nrm` columns; output is
    * (bucket, a_id, b_id, cos_sim). */
  def lshNearDupPairs(
      emb: DataFrame, planes: Seq[Seq[Double]], minCos: Double,
      broadcastBytes: Long = NearDupBroadcastBytes): DataFrame = {
    val e = emb.withColumn("bucket", lshBucket(col("v"), planes))
    val bytes = emb.queryExecution.optimizedPlan.stats.sizeInBytes
    // past the ceiling the broadcast is FORBIDDEN, not merely unhinted:
    // the planner's own size estimate (post-projection) can undershoot
    // and re-introduce a driver-scale corpus broadcast — the merge hint
    // keeps the join shuffle-based; AQE may still pick shuffled-hash
    val build =
      if (bytes <= broadcastBytes) broadcast(e.as("b"))
      else e.as("b").hint("merge")
    e.as("a").join(build,
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.bucket").as("bucket"),
        col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(dotNative(col("a.v"), col("b.v"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      .where(col("cos_sim") >= minCos)
  }

  /** Cosine near-dup pairs (cos ≥ `minCos`) blocked by an explicit
    * `labelCol` — the natural partition key when one exists
    * ([[lshNearDupPairs]] is the label-free variant). EXACT within a
    * label: every same-label pair is scored, so blocking never loses a
    * true near-dup (unlike LSH blocking, which trades recall for
    * candidate count).
    *
    * Size-adaptive, same statistics-driven switch as
    * [[lshNearDupPairs]]:
    *
    *  - small corpus (scan size estimate ≤ `broadcastBytes`): the build
    *    side broadcasts — the probe scan stays fully parallel even with
    *    a handful of labels;
    *  - large corpus: a SALTED shuffle join on `(label, salt)`. A plain
    *    label-key shuffle caps parallelism at |labels| (often ~10);
    *    broadcasting instead is a driver/executor OOM at 100 TB. Salting
    *    restores parallelism without either: the probe row takes one
    *    deterministic salt `hash(vec_id) mod R`, the build row is
    *    replicated to all `R` salts, so each (a, b) pair meets exactly
    *    once — at a's salt — and the shuffle key has |labels| × R
    *    distinct values. Build-side volume grows ×R; pick R ≈
    *    cores / |labels| (default 32 covers local[32] and one executor
    *    wave on a real cluster).
    *
    * Input needs `vec_id`, `v`, `nrm` and `labelCol`; output is
    * (label, a_id, b_id, cos_sim). */
  def labelNearDupPairs(
      emb: DataFrame, labelCol: String, minCos: Double,
      saltReplicas: Int = 32,
      broadcastBytes: Long = NearDupBroadcastBytes): DataFrame = {
    require(saltReplicas >= 1, "saltReplicas must be >= 1")
    val bytes = emb.queryExecution.optimizedPlan.stats.sizeInBytes
    val joined =
      if (bytes <= broadcastBytes) {
        emb.as("a").join(broadcast(emb.as("b")),
          col(s"a.$labelCol") === col(s"b.$labelCol") &&
            col("a.vec_id") < col("b.vec_id"))
      } else {
        // deterministic probe salt; build replicated to every salt so
        // each ordered pair meets exactly once. merge hint (not a bare
        // un-hinted join) forbids the planner re-broadcasting the
        // replicated side off an undershooting size estimate.
        val probe = emb
          .withColumn("salt", pmod(hash(col("vec_id")), lit(saltReplicas)))
        val build = emb
          .withColumn("salt",
            explode(array((0 until saltReplicas).map(lit): _*)))
          .hint("merge")
        probe.as("a").join(build.as("b"),
          col(s"a.$labelCol") === col(s"b.$labelCol") &&
            col("a.salt") === col("b.salt") &&
            col("a.vec_id") < col("b.vec_id"))
      }
    joined
      .select(col(s"a.$labelCol").as("label"),
        col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(dotNative(col("a.v"), col("b.v"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      .where(col("cos_sim") >= minCos)
  }
}
