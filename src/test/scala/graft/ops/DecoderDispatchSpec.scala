package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark
import Multimodal._

/** The multimodal decode seam: dispatch picks the right kernel for the
  * environment, and the external-process path produces identical output
  * to the stub (its worker falls back to the same md5 arithmetic when
  * no codec is importable) — so q_mm_features is green in BOTH modes
  * wherever python3 exists, codecs or not.
  */
class DecoderDispatchSpec extends AnyFunSuite {

  private def python3Available: Boolean =
    try new ProcessBuilder("python3", "-c", "pass").start().waitFor() == 0
    catch { case _: java.io.IOException => false }

  test("explicit env override wins; unknown names fail loudly") {
    assert(resolveDecoder(Map("GRAFT_MM_DECODER" -> "stub")) == StubDecoder)
    assert(resolveDecoder(Map("GRAFT_MM_DECODER" -> "python")) ==
      PythonProcessDecoder())
    intercept[IllegalArgumentException] {
      resolveDecoder(Map("GRAFT_MM_DECODER" -> "gpu"))
    }
  }

  test("auto-dispatch selects the stub when no codec answers the probe") {
    // this container ships no PIL: the probe must fail and dispatch must
    // land on the stub (a codec-capable env flips both, legitimately)
    if (!codecProbe()) assert(resolveDecoder(Map.empty) == StubDecoder)
    else assert(resolveDecoder(Map.empty) == PythonProcessDecoder())
  }

  test("python worker round-trip equals the stub kernel payload-for-payload") {
    assume(python3Available, "no python3 on PATH")
    val payloads = Seq("hello", "wörld ß 密", "", "x" * 10000)
      .map(_.getBytes("UTF-8"))
    val stub = StubDecoder.decodePartition(payloads.iterator).toSeq
    val ext = PythonProcessDecoder().decodePartition(payloads.iterator).toSeq
    assert(ext == stub)
  }

  test("missing interpreter on the executor falls back to stub arithmetic") {
    // heterogeneous-fleet path: the decoder was selected (driver probe
    // passed) but THIS node cannot start the interpreter — the partition
    // must still produce the stub features, not fail the task
    val payloads = Seq("alpha", "beta").map(_.getBytes("UTF-8"))
    val stub = StubDecoder.decodePartition(payloads.iterator).toSeq
    val got = PythonProcessDecoder("/nonexistent/python3")
      .decodePartition(payloads.iterator).toSeq
    assert(got == stub)
  }

  test("partial consumption does not hang or leak (limit-shaped take)") {
    assume(python3Available, "no python3 on PATH")
    // take(1) abandons the iterator before the clean-exit tail; outside
    // a real task the completion listener can't fire, but the call must
    // still return promptly with correct rows (the worker dies with the
    // JVM via destroyForcibly-on-task-end in cluster runs)
    val payloads = (1 to 200).map(i => s"payload $i".getBytes("UTF-8"))
    val one = PythonProcessDecoder()
      .decodePartition(payloads.iterator).take(1).toSeq
    assert(one == StubDecoder.decodePartition(payloads.take(1).iterator).toSeq)
  }

  test("real PNG fixtures decode to true dimensions, not stub arithmetic") {
    assume(python3Available, "no python3 on PATH")
    // generated 8-bit PNGs (src/test/resources/media, pure-stdlib
    // synthesis — no external assets): the worker must REALLY decode
    // them — via PIL where installed, else the stdlib PNG parser — and
    // report true (w, h, channels, mean-luma), which provably differ
    // from the md5 stub features. Mixed with a text payload to prove
    // the per-frame dispatch: same batch, decode for media, md5 for
    // text.
    def fixture(name: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        getClass.getResource(s"/media/$name").toURI))
    val payloads = Seq(fixture("rgb_gradient.png"),
      fixture("gray_checker.png"), fixture("rgb_stripes.png"),
      "just text".getBytes("UTF-8"))
    val got = PythonProcessDecoder().decodePartition(payloads.iterator).toSeq
    val stub = StubDecoder.decodePartition(payloads.iterator).toSeq
    assert(got(0) == ((3, 2, 3, 39.833333333333336)), got(0).toString)
    assert(got(1) == ((4, 4, 1, 127.5)), got(1).toString)
    assert(got(2) == ((8, 5, 3, 92.0)), got(2).toString)
    (0 to 2).foreach(i => assert(got(i) != stub(i), s"fixture $i hit the stub"))
    assert(got(3) == stub(3), "text payload must still use md5 arithmetic")
  }

  test("JPEG fixtures parse real SOF dimensions, not stub arithmetic") {
    assume(python3Available, "no python3 on PATH")
    // generated structurally-valid JPEGs (src/test/resources/media,
    // stdlib synthesis): a baseline (SOF0, 3-component) and a
    // progressive (SOF2, grayscale) frame header. The worker must
    // report the TRUE (w, h, channels) from the frame header; the mean
    // stays md5-stub by contract (no stdlib entropy decoder), which
    // also holds under PIL — these fixtures carry no decodable scan
    // data, so PIL refuses them and the stdlib parser takes over.
    def fixture(name: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        getClass.getResource(s"/media/$name").toURI))
    val payloads = Seq(fixture("rgb_baseline.jpg"),
      fixture("gray_progressive.jpg"), "just text".getBytes("UTF-8"))
    val got = PythonProcessDecoder().decodePartition(payloads.iterator).toSeq
    val stub = StubDecoder.decodePartition(payloads.iterator).toSeq
    assert(got(0) == ((17, 9, 3, stub(0)._4)), got(0).toString)
    assert(got(1) == ((33, 21, 1, stub(1)._4)), got(1).toString)
    (0 to 1).foreach(i =>
      assert(got(i) != stub(i), s"fixture $i dims hit the stub"))
    assert(got(2) == stub(2), "text payload must still use md5 arithmetic")
  }

  test("q_mm_features is identical under both decoders (end-to-end)") {
    assume(python3Available, "no python3 on PATH")
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val a = Multimodal.mediaFeaturesWith(spark, d, StubDecoder)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = Multimodal.mediaFeaturesWith(spark, d, PythonProcessDecoder())
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.length > 0 && a.sameElements(b))
  }
}
