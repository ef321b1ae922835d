package graft

import java.io.ByteArrayInputStream
import javax.xml.parsers.DocumentBuilderFactory

import graft.viz.{PlotSeries, SvgPlot}

/** The A17 rendering surface: deterministic SVG line charts over
  * declared query results (the reference's matplotlib visualizers,
  * re-expressed engine-side). */
class SvgPlotSpec extends SparkSpec {

  private def wellFormed(svg: String): Boolean = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.newDocumentBuilder()
      .parse(new ByteArrayInputStream(svg.getBytes("UTF-8")))
    true
  }

  test("render is deterministic, well-formed, and maps data to plot bounds") {
    val series = Seq(
      PlotSeries("java", Seq((1.0, 10.0), (8.0, 2.0), (4.0, 3.0))),
      PlotSeries("c", Seq((1.0, 5.0), (4.0, 1.5), (8.0, 1.0))))
    val svg = SvgPlot.render(series, "Time vs Threads", "Threads", "ms")
    assert(svg === SvgPlot.render(series, "Time vs Threads", "Threads", "ms"))
    assert(wellFormed(svg))
    assert("<polyline ".r.findAllIn(svg).length === 2)
    assert(svg.contains(">java</text>") && svg.contains(">c</text>"))
    assert(svg.contains(">Time vs Threads</text>"))
    // x-extent points land exactly on the plot edges (margins 70/30 at
    // width 800), and points arrive x-sorted regardless of input order
    val path = "points=\"([^\"]+)\"".r.findFirstMatchIn(svg).get.group(1)
    val ptsX = path.split(" ").map(_.split(",")(0).toDouble)
    assert(ptsX.head === 70.0 && ptsX.last === 770.0)
    assert(ptsX.sorted.toSeq === ptsX.toSeq)
  }

  test("log scales place decades and drop non-positive points") {
    val svg = SvgPlot.render(
      Seq(PlotSeries("py", Seq((1.0, 1.0), (100.0, 100.0), (10.0, 0.0)))),
      "loglog", "n", "ms", logX = true, logY = true)
    assert(wellFormed(svg))
    // the y=0 point is unplottable on a log axis and must be dropped
    val path = "points=\"([^\"]+)\"".r.findFirstMatchIn(svg).get.group(1)
    assert(path.split(" ").length === 2)
    // decade gridlines labeled
    assert(svg.contains(">1</text>") && svg.contains(">10</text>") &&
      svg.contains(">100</text>"))
  }

  test("series beyond the fixed palette are rejected, not color-cycled") {
    val many = (1 to 9).map(i => PlotSeries(s"s$i", Seq((0.0, i.toDouble), (1.0, i.toDouble))))
    val ex = intercept[IllegalArgumentException] {
      SvgPlot.render(many, "t", "x", "y")
    }
    assert(ex.getMessage.contains("palette"))
  }

  test("parallelPlots writes the Stage-3 visualizer's per-size chart trio") {
    import spark.implicits._
    val se = Seq(
      ("c", 256L, 1L, 100.0, 1.0, 1.0), ("c", 256L, 4L, 30.0, 3.3, 0.83),
      ("java", 256L, 1L, 200.0, 1.0, 1.0), ("java", 256L, 4L, 60.0, 3.3, 0.83),
      ("c", 512L, 1L, 800.0, 1.0, 1.0), ("c", 512L, 4L, 250.0, 3.2, 0.8))
      .toDF("lang", "size", "threads", "avg_time_ms", "speedup", "efficiency")
    val dir = java.nio.file.Files.createTempDirectory("svgplots").toString
    val written = SvgPlot.parallelPlots(se, dir)
    val names = written.map(_.getFileName.toString).toSet
    assert(names === Set(
      "parallel_speedup_256.svg", "parallel_efficiency_256.svg",
      "parallel_time_256.svg", "parallel_speedup_512.svg",
      "parallel_efficiency_512.svg", "parallel_time_512.svg"))
    written.foreach { p =>
      assert(wellFormed(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")))
    }
  }

  test("stage2Plots renders the dense-vs-sparse time and memory charts") {
    val cleaned = graft.operators.Analytics.cleanResults(
      graft.sources.ResultsCsv.readResultsDir(spark,
        "/root/repo/src/test/resources/results_csv"))
    val dir = java.nio.file.Files.createTempDirectory("svgstage2").toString
    val written = SvgPlot.stage2Plots(cleaned, dir)
    val names = written.map(_.getFileName.toString).toSet
    assert(names === Set(
      "mm_perf_dense_time.svg", "mm_perf_dense_memory.svg",
      "mm_perf_sparse_time.svg", "mm_perf_sparse_memory.svg"))
    val byName = written.map(p => p.getFileName.toString ->
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")).toMap
    byName.values.foreach(svg => assert(wellFormed(svg)))
    // series = (LANG - algo): the dense cluster carries the opt rows'
    // dense algos, the sparse cluster only the sparse ones
    val dense = byName("mm_perf_dense_time.svg")
    assert(dense.contains(">C - blocked</text>") &&
      dense.contains(">JAVA - basic</text>") &&
      dense.contains(">PYTHON - basic</text>"))
    assert(!dense.contains("sparse"))
    val sparse = byName("mm_perf_sparse_time.svg")
    assert(sparse.contains(">JAVA - sparse</text>") &&
      sparse.contains(">PYTHON - sparse</text>"))
    // memory resolves per-lang (A14): the java opt rows only carry
    // heap_now_mb, which must still plot through the fallback chain
    val mem = byName("mm_perf_dense_memory.svg")
    assert(mem.contains(">JAVA - basic</text>"))
    // deterministic: a second render writes identical bytes
    val dir2 = java.nio.file.Files.createTempDirectory("svgstage2b").toString
    val again = SvgPlot.stage2Plots(cleaned, dir2)
      .map(p => p.getFileName.toString ->
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")).toMap
    assert(again === byName)
  }
}
