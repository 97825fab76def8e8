package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Bpe.train]] against hand-computed merges (the classic
  * hug/pug/pun/bun/hugs teaching vocabulary), greedy-left overlap
  * semantics, early exhaustion, and the encode join. */
class BpeSpec extends SparkTestBase {

  private def words(ws: (String, Long)*) = {
    import spark.implicits._
    ws.toDF("word", "freq")
  }

  test("learns the classic merges in order with correct counts") {
    // pairs round 1: (u,g)=10+5+5=20 wins over (p,u)=17, (h,u)=15...
    // round 2: (u,n)=12+4=16; round 3: (h,ug)=10+5=15
    val (merges, seg) = Bpe.train(
      words(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L),
        ("hugs", 5L)), nMerges = 3)
    assert(merges.map(m => (m.rank, m.left, m.right, m.pair_count)) ===
      Seq((1, "u", "g", 20L), (2, "u", "n", 16L), (3, "h", "ug", 15L)))
    val segs = seg.collect().map(r =>
      r.getString(0) -> r.getString(2)).toMap
    assert(segs("hug") === "hug")
    assert(segs("pug") === "p ug")
    assert(segs("pun") === "p un")
    assert(segs("hugs") === "hug s")
  }

  test("overlapping pairs merge greedy-left, like the reference walk") {
    val (merges, seg) = Bpe.train(words(("aaa", 1L)), nMerges = 1)
    assert(merges.head.left === "a" && merges.head.right === "a")
    assert(seg.select("seg").head().getString(0) === "aa a")
  }

  test("exhausts early when no pair remains; single-char words are inert") {
    val (merges, _) = Bpe.train(words(("ab", 1L), ("x", 9L)), nMerges = 10)
    assert(merges.size === 1) // only (a, b) exists; then nothing
    assert(merges.head.rank === 1)
  }

  test("encodeCounts joins the trained vocabulary per document") {
    import spark.implicits._
    val docs = Seq((1L, "hug hugs hug"), (2L, "pun")).toDF("doc_id", "text")
    val (_, seg) = Bpe.train(
      words(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L),
        ("hugs", 5L)), nMerges = 3)
    val out = Bpe.encodeCounts(docs, seg).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: hug(1 sym) + hugs(2 syms: 'hug s') + hug(1) = 4 bpe, 3 ws
    assert(out(1L) === ((4L, 3L)))
    // doc 2: pun -> 'p un' = 2 bpe, 1 ws
    assert(out(2L) === ((2L, 1L)))
  }

  test("merge rewrite semantics match the SQL doubled-space idiom") {
    // pin Spark's replace() to the same left-to-right non-overlapping
    // contract the DuckDB oracle uses
    import spark.implicits._
    val r = Seq("a b a b").toDF("seg").select(
      trim(replace(replace(
        concat(lit(" "), replace(col("seg"), lit(" "), lit("  ")),
          lit(" ")),
        lit(" a  b "), lit(" ab ")), lit("  "), lit(" "))))
      .head().getString(0)
    assert(r === "ab ab")
  }
}
