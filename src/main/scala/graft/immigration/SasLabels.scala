package graft.immigration

/** Driver-side parser for SAS `proc format` label files — the reference's
  * dimension-table source (ref `etl.py:101-125`, data at
  * `data/I94_SAS_Labels_Descriptions.SAS`).
  *
  * Exact semantics reproduced (each has a golden test):
  *  - the block starts at the FIRST occurrence of the label name (which
  *    for every label in the file is inside a comment line) and ends at
  *    the first `;` after it;
  *  - only lines with exactly one `=` yield a (code, value) pair;
  *  - each side is whitespace-trimmed FIRST, then stripped of leading and
  *    trailing apostrophes — so a quoted code with interior trailing
  *    space (`'CP '`) keeps its space;
  *  - the I94VISA block has no `value` statement at all: its pairs live
  *    in a comment block, terminated by the `;` of a later statement.
  */
object SasLabels {

  def stripApostrophes(s: String): String =
    s.dropWhile(_ == '\'').reverse.dropWhile(_ == '\'').reverse

  /** All (code, value) pairs of one label block. */
  def parse(fileContent: String, labelName: String): Seq[(String, String)] = {
    val start = fileContent.indexOf(labelName)
    require(start >= 0, s"label $labelName not found")
    val fromLabel = fileContent.substring(start)
    val block = fromLabel.substring(0, fromLabel.indexOf(';'))
    block.split("\n", -1).iterator.flatMap { line =>
      line.split("=", -1) match {
        case Array(code, value) =>
          Some(stripApostrophes(code.trim) -> stripApostrophes(value.trim))
        case _ => None // comment / value-statement / multi-`=` lines
      }
    }.toSeq
  }

  def parseFile(path: String, labelName: String): Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(path)
    try parse(src.mkString, labelName)
    finally src.close()
  }
}
