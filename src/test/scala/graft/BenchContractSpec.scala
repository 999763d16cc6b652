package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench output is a driver contract: ONE parseable JSON line,
  * short enough for log-tail capture, locale-independent, with every
  * registered query priced and failures listed. Round 1 lost its bench
  * numbers to exactly this (an overlong line the driver could not
  * parse) — pin it.
  */
class BenchContractSpec extends AnyFunSuite {

  private def allNames = SparkEntry.queries.keys.toSeq.sorted

  test("rendered line is bounded, complete, and structurally sound") {
    val results = allNames.zipWithIndex.map { case (n, i) =>
      (n, 1234.5678 + i, i % 7 != 0)
    }
    val line = Bench.renderJson(results, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 3000, s"line too long for tail capture: ${line.length}")
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
    allNames.foreach(n => assert(line.contains("\"" + n + "\":"), n))
    assert(line.contains("\"failed\":[\"" + allNames.head + "\""))
    // ms-rounded values only — no full-precision doubles
    assert(line.contains("\"" + allNames.head + "\":1234.568"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("rendering is locale-independent (no decimal commas)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.renderJson(Seq(("q_x", 0.1239, true)), "sf")
      assert(line.contains("\"q_x\":0.124"), line)
      assert(!line.contains("0,124"), s"decimal comma corrupts JSON: $line")
    } finally java.util.Locale.setDefault(prev)
  }

  test("empty results render a valid zero line") {
    val line = Bench.renderJson(Nil, "sf")
    assert(line.contains("\"value\":0.000") && line.contains("\"failed\":[]"))
  }
}
