package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[GraphQueries.encKey]]/[[GraphQueries.decKey]] — the r17 label-prop
  * key narrowing is only sound if the long encoding is (a) an exact
  * round-trip and (b) ORDER-ISOMORPHIC to the 'p'||k / 's'||k strings:
  * LPA tie-breaks compare labels, so any order disagreement would
  * change the propagated trajectory vs the string-keyed oracle. */
class GraphKeyCodecSpec extends SparkTestBase {

  // exercise every digit-length boundary plus prefix-of-each-other
  // pairs ("1"/"10"/"100"/"1000", "2" vs "10", "11" vs "105") where the
  // lexicographic-vs-numeric divergence lives
  private val ks: Seq[Long] = Seq(1L, 2L, 9L, 10L, 11L, 99L, 100L, 101L,
    105L, 999L, 1000L, 1001L, 9999L, 10000L, 20000L, 123456L, 999999999L)

  private def rows = {
    import spark.implicits._
    ks.flatMap(k => Seq(("s", k), ("p", k))).toDF("pfx", "k")
  }

  test("decKey(encKey(k)) round-trips both prefixes at every length") {
    val out = rows.select(col("pfx"), col("k"),
      GraphQueries.decKey(GraphQueries.encKey(sPrefix = true, col("k")))
        .as("s_dec"),
      GraphQueries.decKey(GraphQueries.encKey(sPrefix = false, col("k")))
        .as("p_dec"))
      .collect()
    out.foreach { r =>
      assert(r.getString(2) === s"s${r.getLong(1)}")
      assert(r.getString(3) === s"p${r.getLong(1)}")
    }
  }

  test("long order is isomorphic to lexicographic string order") {
    val enc = rows.select(
      concat(col("pfx"), col("k")).as("str"),
      when(col("pfx") === "s",
        GraphQueries.encKey(sPrefix = true, col("k")))
        .otherwise(GraphQueries.encKey(sPrefix = false, col("k")))
        .as("enc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    for ((s1, e1) <- enc; (s2, e2) <- enc) {
      assert(Integer.signum(s1.compareTo(s2)) ===
        java.lang.Long.signum(java.lang.Long.compare(e1, e2)),
        s"order mismatch: $s1 ($e1) vs $s2 ($e2)")
    }
  }
}
