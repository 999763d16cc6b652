package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** The promote-and-render transaction must be FAILURE-ATOMIC: a
  * malformed/truncated runtime BENCH_LAST.json (a killed bench, a
  * partial write, a wrong-SF slice) must leave both the committed
  * snapshot of record (BENCH_DOC.json) and SCALING.md byte-identical —
  * validation happens by rendering BEFORE the copy. A clobbered
  * BENCH_DOC.json would poison every later --check / ScalingDocSpec
  * run with numbers no bench produced.
  */
class RenderPromoteSpec extends AnyFunSuite {
  private val goodBench =
    """{"value": 10.0,
      | "queries": {"q_etl_scale_cdc": 2.0, "q_etl_scale_load": 1.5,
      |             "q_etl_cdc_batch": 1.0, "q_etl_initial_load": 2.5},
      | "rows": {"q_etl_scale_cdc": 100000, "q_etl_scale_load": 15005},
      | "failed": [], "volatile": []}""".stripMargin
  private val goodSf1 =
    """{"sf01": {"q_x": 1.0}, "sf1": {"q_x": 2.0}, "slope": {"q_x": 2.0}}"""
  private val doc =
    """# scratch
      |<!-- BEGIN GENERATED: bench-summary (runMain graft.tools.RenderScaling) -->
      |stale
      |<!-- END GENERATED: bench-summary -->
      |prose
      |<!-- BEGIN GENERATED: sf1-slopes (runMain graft.tools.RenderScaling) -->
      |stale
      |<!-- END GENERATED: sf1-slopes -->
      |""".stripMargin

  private def scratch(benchLast: Option[String]): Path = {
    val d = Files.createTempDirectory("render-promote")
    Files.writeString(d.resolve("SCALING.md"), doc)
    Files.writeString(d.resolve("BENCH_DOC.json"), goodBench)
    Files.writeString(d.resolve("BENCH_sf1.json"), goodSf1)
    benchLast.foreach(s => Files.writeString(d.resolve("BENCH_LAST.json"), s))
    d
  }

  test("a truncated BENCH_LAST.json fails the render and BENCH_DOC + doc survive untouched") {
    // both failure classes: unparseable JSON, and parseable-but-partial
    // (missing the scale queries benchSummary requires)
    val partial = """{"value": 1.0, "queries": {"q_other": 1.0}}"""
    Seq(goodBench.take(40), partial).foreach { bad =>
      val d = scratch(Some(bad))
      intercept[Exception] {
        graft.tools.RenderScaling.promoteAndRender(d)
      }
      assert(Files.readString(d.resolve("BENCH_DOC.json")) == goodBench,
        "the committed snapshot of record was clobbered by an invalid runtime artifact")
      assert(Files.readString(d.resolve("SCALING.md")) == doc,
        "the doc was rewritten from an invalid runtime artifact")
    }
  }

  test("render-only re-renders from the snapshot and NEVER promotes a lying-around BENCH_LAST.json") {
    // the mk_sf1.py hazard: the sf1 sweep re-renders the doc for ITS
    // artifact, but a default (promoting) render there would copy any
    // untracked runtime file — possibly a stale or contended full-fleet
    // run — over the committed snapshot of record as a side effect
    val fresh = goodBench.replace("\"q_etl_scale_cdc\": 2.0",
      "\"q_etl_scale_cdc\": 4.0")
    val d = scratch(Some(fresh))
    val differed = graft.tools.RenderScaling.renderOnly(d)
    assert(differed, "the unpromoted-runtime-artifact signal must fire")
    assert(Files.readString(d.resolve("BENCH_DOC.json")) == goodBench,
      "render-only must never write the snapshot of record")
    assert(Files.readString(d.resolve("BENCH_LAST.json")) == fresh)
    val rendered = Files.readString(d.resolve("SCALING.md"))
    // numbers come from the COMMITTED snapshot, not the runtime file
    assert(rendered.contains("50.0k events/s"), rendered) // 100000 / 2.0 s
    assert(!rendered.contains("25.0k events/s"),
      "render-only spliced numbers from the unpromoted runtime artifact")
    // and with no runtime file at all it renders quietly
    val d2 = scratch(None)
    assert(!graft.tools.RenderScaling.renderOnly(d2))
    assert(Files.readString(d2.resolve("SCALING.md")).contains("50.0k events/s"))
  }

  test("a valid BENCH_LAST.json promotes and renders; absent one, the snapshot re-renders") {
    val fresh = goodBench.replace("\"q_etl_scale_cdc\": 2.0",
      "\"q_etl_scale_cdc\": 4.0")
    val d = scratch(Some(fresh))
    graft.tools.RenderScaling.promoteAndRender(d)
    assert(Files.readString(d.resolve("BENCH_DOC.json")) == fresh,
      "a validated fresh artifact must be promoted to the snapshot of record")
    val rendered = Files.readString(d.resolve("SCALING.md"))
    assert(rendered.contains("25.0k events/s"), rendered) // 100000 / 4.0 s
    assert(!rendered.contains("stale"), "generated blocks not spliced")
    // no fresh run: re-render from the snapshot (prose-edit path)
    val d2 = scratch(None)
    graft.tools.RenderScaling.promoteAndRender(d2)
    assert(Files.readString(d2.resolve("BENCH_DOC.json")) == goodBench)
    assert(Files.readString(d2.resolve("SCALING.md"))
      .contains("50.0k events/s")) // 100000 / 2.0 s
  }
}
