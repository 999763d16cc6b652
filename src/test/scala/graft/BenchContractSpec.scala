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

  test("full rendering is complete and structurally sound") {
    val results = allNames.zipWithIndex.map { case (n, i) =>
      (n, 1234.5678 + i, i % 7 != 0, 1234.0 + i, 1236.0 + i)
    }
    val line = Bench.renderJson(results, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
    allNames.foreach(n => assert(line.contains("\"" + n + "\":"), n))
    assert(line.contains("\"failed\":[\"" + allNames.head + "\""))
    // ms-rounded values only — no full-precision doubles
    assert(line.contains("\"" + allNames.head + "\":1234.568"))
    // spread bands make noise attributable from the artifact alone
    assert(line.contains("\"spread\":{\"" + allNames.head + "\":[1234.000,1236.000]"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("short stdout line fits the driver tail window at any query count") {
    val results = allNames.zipWithIndex.map { case (n, i) =>
      (n, 1234.5678 + i, true, 1234.0 + i, 1236.0 + i)
    }
    val line = Bench.renderShortJson(results, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    // rounds 1-3 shipped parsed:null: the ~2.3 KB full line overflowed
    // the driver's ~2.2 KB tail capture. Keep ample margin.
    assert(line.length < 1500, s"line too long for tail capture: ${line.length}")
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
    assert(line.contains("\"n_all\":" + allNames.size))
    // total is over ALL queries, not just the reported subset
    val expectedTotal = results.map(_._2).sum
    assert(line.contains("\"value\":" + f"$expectedTotal%.3f"))
    // the slowest query is always present; the fastest is elided
    val slowest = results.maxBy(_._2)._1
    val fastest = results.minBy(_._2)._1
    assert(line.contains("\"" + slowest + "\":"))
    assert(!line.contains("\"" + fastest + "\":") || allNames.size <= 30)
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("short line never truncates the failed list") {
    val results = allNames.zipWithIndex.map { case (n, i) => (n, i.toDouble, false, i.toDouble, i.toDouble) }
    val line = Bench.renderShortJson(results, "sf")
    allNames.foreach(n => assert(line.contains("\"" + n + "\""), n))
  }

  test("latest bench artifact has no pathological spread band") {
    // the r7 warm-up artifact (q_dedup_canonical median 10.85, spread
    // [5.0, 13.7]) reached the judge before the build: gate it here
    // instead. Its signature is MEDIAN ≫ MIN — the plan's floor (min)
    // proves what steady state can do while most reps pay a recurring
    // artifact. Scheduler noise has the opposite shape (median ≈ min,
    // one outlying max: q_t4_except [0.49, 1.75] around a 0.55 median),
    // so a max/min ratio test cannot separate the two — and at 2.7×,
    // the r7 artifact would have PASSED a 3× ratio gate. Flag when the
    // median doubles the min and the gap is material (> 1 s).
    val p = java.nio.file.Paths.get("BENCH_LAST.json")
    assume(java.nio.file.Files.exists(p), "no BENCH_LAST.json in repo root")
    val json = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val at = json.indexOf("\"spread\":")
    assert(at >= 0, "artifact has no spread map — stale bench format")
    val med = """"([^"]+)":([0-9.]+)""".r
    val medians = med.findAllMatchIn(json.substring(0, at))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val band = """"([^"]+)":\[([0-9.]+),([0-9.]+)\]""".r
    val bad = band.findAllMatchIn(json.substring(at)).flatMap { m =>
      val (n, lo) = (m.group(1), m.group(2).toDouble)
      val mid = medians.getOrElse(n, lo)
      if (mid > lo * 2 && mid - lo > 1.0)
        Some(f"$n median $mid%.2f vs min $lo%.2f")
      else None
    }.toSeq
    assert(bad.isEmpty,
      s"median>>min — recurring warm-up/GC artifact in: ${bad.mkString(", ")}")
  }

  test("latest bench artifact ran every query (failed list empty)") {
    // round 8 shipped 49 queries absent from the bench because the
    // events reader broke on regenerated fixtures — the artifact said so
    // in `failed` and nothing gated it. A non-empty failed list is a
    // red build, period.
    val p = java.nio.file.Paths.get("BENCH_LAST.json")
    assume(java.nio.file.Files.exists(p), "no BENCH_LAST.json in repo root")
    val json = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val at = json.indexOf("\"failed\":[")
    assert(at >= 0, "artifact has no failed list — stale bench format")
    assert(json.startsWith("]", at + "\"failed\":[".length),
      "bench artifact lists failed queries: " +
        json.substring(at, math.min(json.length, at + 300)))
  }

  test("median averages the two middle elements for even n") {
    assert(Bench.median(Seq(1.0, 2.0, 4.0)) == 2.0)
    assert(Bench.median(Seq(1.0, 2.0, 4.0, 9.0)) == 3.0)
    assert(Bench.median(Nil) == 0.0)
  }

  test("rendering is locale-independent (no decimal commas)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.renderJson(Seq(("q_x", 0.1239, true, 0.1239, 0.1239)), "sf")
      assert(line.contains("\"q_x\":0.124"), line)
      assert(!line.contains("0,124"), s"decimal comma corrupts JSON: $line")
    } finally java.util.Locale.setDefault(prev)
  }

  test("empty results render a valid zero line") {
    val line = Bench.renderJson(Nil, "sf")
    assert(line.contains("\"value\":0.000") && line.contains("\"failed\":[]"))
  }
}
