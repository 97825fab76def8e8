package graft.immigration

import org.scalatest.funsuite.AnyFunSuite

class SasLabelsSpec extends AnyFunSuite {

  private val RefFile = "/root/reference/data/I94_SAS_Labels_Descriptions.SAS"
  private lazy val content = {
    val src = scala.io.Source.fromFile(RefFile)
    try src.mkString finally src.close()
  }

  test("golden block cardinalities match the reference notebook") {
    assert(SasLabels.parse(content, "I94RES").size === 289)
    assert(SasLabels.parse(content, "I94PORT").size === 660)
    assert(SasLabels.parse(content, "I94ADDR").size === 55)
    assert(SasLabels.parse(content, "I94MODE").size === 4)
    assert(SasLabels.parse(content, "I94VISA").size === 3)
  }

  test("quoted code with interior trailing space is preserved ('CP ')") {
    val ports = SasLabels.parse(content, "I94PORT").toMap
    assert(ports.contains("CP "))
    assert(ports("CP ") === "No PORT Code (CP)")
  }

  test("I94VISA parses from a comment block (no value statement)") {
    assert(SasLabels.parse(content, "I94VISA") ===
      Seq("1" -> "Business", "2" -> "Pleasure", "3" -> "Student"))
  }

  test("I94MODE exact entries") {
    assert(SasLabels.parse(content, "I94MODE") ===
      Seq("1" -> "Air", "2" -> "Sea", "3" -> "Land", "9" -> "Not reported"))
  }

  test("CRLF lines are trimmed before quote stripping") {
    val block = "LBL\n 'A' = 'x'\r\n 'B '\t=\t'y z'\r\n;"
    assert(SasLabels.parse(block, "LBL") === Seq("A" -> "x", "B " -> "y z"))
  }

  test("lines without exactly one '=' are skipped") {
    val block = "LBL\ncomment line\na = b = c\n 1 = 'one'\n;"
    assert(SasLabels.parse(block, "LBL") === Seq("1" -> "one"))
  }

  test("property: arbitrary k = 'v' blocks round-trip (seeded)") {
    val rnd = new scala.util.Random(42)
    def token(): String =
      Seq.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar).mkString
    for (_ <- 1 to 200) {
      val pairs = Seq.fill(1 + rnd.nextInt(20))(token() -> token())
      val block = "HDR\n" +
        pairs.map { case (k, v) => s"  '$k' = '$v'" }.mkString("\n") + "\n;"
      assert(SasLabels.parse(block, "HDR") === pairs)
    }
  }

  test("all I94RES country codes are numeric-parsable (ANSI cast safety)") {
    SasLabels.parse(content, "I94RES").foreach { case (code, _) =>
      assert(code.toDoubleOption.isDefined, s"non-numeric country code: $code")
    }
  }
}
