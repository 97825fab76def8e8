package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction patterns + scrub, shared by the curation pipeline and
  * the query surface (the oracle SQL interpolates the SAME pattern
  * strings, so engine and oracle can never drift).
  *
  * Patterns live in the RE2 ∩ java.util.regex common dialect: character
  * classes, bounded repetition and `\b` only — no backreferences, no
  * lookaround — so any engine with either regex library runs them
  * identically. Scrubbing is pure per-row column algebra: at 100 TB it
  * runs at scan speed with no shuffle. */
object Redaction {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Emails then IPv4s replaced with typed placeholders. Order matters
    * only in that neither pattern may match the other's placeholder —
    * `<EMAIL>`/`<IP>` match neither pattern. */
  def scrub(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")
}
