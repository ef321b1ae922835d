package graft.viz

import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** One named line on a chart. Points are (x, y) in data space. */
final case class PlotSeries(name: String, points: Seq[(Double, Double)])

/** Engine-side rendering of the reference's visualizer surface (A17):
  * multi-series line charts — speedup/efficiency/time vs threads
  * (`Stage 3/Visualization/mm_perf_parallel_visualizer.py:77-155`) and
  * time vs size (`Stage 1/Visualization/mm_perf_visualizer.py:50-70`) —
  * as dependency-free, deterministic SVG instead of matplotlib PNGs
  * (no native rasterizer belongs in an engine library; SVG is
  * byte-reproducible, so specs can assert the rendering).
  *
  * The `.collect()` here is NOT a distributed-operator anti-pattern:
  * a plot's input is a declared aggregate query's result (dozens of
  * rows of (series, x, y) — metadata scale by construction); rendering
  * is inherently a driver/edge step.
  *
  * Chart discipline: categorical series colors in a fixed
  * colorblind-validated order (never cycled past the palette — more
  * than 8 series is a misuse of a line chart), identity double-encoded
  * by marker shape + legend text (color is never the only channel),
  * 2px lines with 8px markers, recessive grid, one y-axis.
  */
object SvgPlot {

  /** Fixed categorical order — CVD-validated (adjacent-pair ΔE ≥ 8). */
  private val Palette = Vector(
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948")
  private val TextPrimary = "#262625"
  private val TextMuted = "#6b6a66"
  private val Grid = "#e6e5e0"

  private def fmt(d: Double): String = {
    val s = "%.6g".formatLocal(Locale.ROOT, d)
    // trim trailing zeros ("1.50000" -> "1.5", "100.000" -> "100")
    if (s.contains('.') && !s.contains('e') && !s.contains('E'))
      s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
    else s
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** ~5 "nice" linear ticks covering [lo, hi]. */
  private[viz] def linearTicks(lo: Double, hi: Double): Seq[Double] = {
    val range = math.max(hi - lo, 1e-12)
    val raw = range / 5.0
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val step = Seq(1.0, 2.0, 5.0, 10.0).map(_ * mag).minBy(s => math.abs(s - raw))
    val first = math.ceil(lo / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ <= hi + step * 1e-9).toSeq
  }

  /** Decade ticks covering [lo, hi], both > 0. */
  private[viz] def logTicks(lo: Double, hi: Double): Seq[Double] = {
    val d0 = math.floor(math.log10(lo)).toInt
    val d1 = math.ceil(math.log10(hi)).toInt
    (d0 to d1).map(d => math.pow(10, d))
  }

  /** Render a multi-series line chart to an SVG string (pure — same
    * input, same bytes). Series are drawn in sorted-name order so
    * color assignment is stable across runs and filters. */
  def render(series: Seq[PlotSeries], title: String,
             xLabel: String, yLabel: String,
             logX: Boolean = false, logY: Boolean = false,
             width: Int = 800, height: Int = 600): String = {
    require(series.nonEmpty, "render requires at least one series")
    require(series.size <= Palette.size,
      s"${series.size} series exceed the fixed categorical palette " +
        s"(${Palette.size}); fold into fewer series or facet into " +
        "multiple charts instead of cycling colors")
    val ordered = series.sortBy(_.name).map { s =>
      val pts = s.points
        .filter(p => (!logX || p._1 > 0) && (!logY || p._2 > 0))
        .sortBy(_._1)
      require(pts.nonEmpty, s"series '${s.name}' has no plottable points")
      s.copy(points = pts)
    }
    val xs = ordered.flatMap(_.points.map(_._1))
    val ys = ordered.flatMap(_.points.map(_._2))
    val (xLo, xHi) = (xs.min, xs.max)
    val (yLo0, yHi0) = (ys.min, ys.max)
    // headroom so the top marker never clips; flat series get a band
    val (yLo, yHi) =
      if (logY) (yLo0 / 1.5, yHi0 * 1.5)
      else if (yHi0 == yLo0) (yLo0 - math.max(math.abs(yLo0) * 0.1, 1.0),
        yHi0 + math.max(math.abs(yHi0) * 0.1, 1.0))
      else (yLo0 - (yHi0 - yLo0) * 0.05, yHi0 + (yHi0 - yLo0) * 0.05)
    val (mL, mR, mT, mB) = (70, 30, 50, 60)
    val (pw, ph) = (width - mL - mR, height - mT - mB)
    def sx(x: Double): Double =
      if (logX) mL + pw * (math.log10(x) - math.log10(xLo)) /
        math.max(math.log10(xHi) - math.log10(xLo), 1e-12)
      else mL + pw * (x - xLo) / math.max(xHi - xLo, 1e-12)
    def sy(y: Double): Double =
      if (logY) mT + ph - ph * (math.log10(y) - math.log10(yLo)) /
        math.max(math.log10(yHi) - math.log10(yLo), 1e-12)
      else mT + ph - ph * (y - yLo) / math.max(yHi - yLo, 1e-12)

    val xTicks = (if (logX) logTicks(xLo, xHi) else linearTicks(xLo, xHi))
      .filter(t => t >= (if (logX) xLo else xLo) && t <= xHi)
    val yTicks = (if (logY) logTicks(yLo, yHi) else linearTicks(yLo, yHi))
      .filter(t => t >= yLo && t <= yHi)

    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">"""
    sb ++= s"""<rect width="$width" height="$height" fill="#ffffff"/>"""
    sb ++= s"""<text x="${width / 2}" y="28" text-anchor="middle" font-family="sans-serif" font-size="16" fill="$TextPrimary">${esc(title)}</text>"""
    // recessive grid + tick labels (text tokens, never series color)
    yTicks.foreach { t =>
      val y = sy(t)
      sb ++= f"""<line x1="$mL" y1="$y%.1f" x2="${mL + pw}" y2="$y%.1f" stroke="$Grid" stroke-width="1"/>"""
      sb ++= f"""<text x="${mL - 8}" y="${y + 4}%.1f" text-anchor="end" font-family="sans-serif" font-size="11" fill="$TextMuted">${fmt(t)}</text>"""
    }
    xTicks.foreach { t =>
      val x = sx(t)
      sb ++= f"""<line x1="$x%.1f" y1="$mT" x2="$x%.1f" y2="${mT + ph}" stroke="$Grid" stroke-width="1"/>"""
      sb ++= f"""<text x="$x%.1f" y="${mT + ph + 18}" text-anchor="middle" font-family="sans-serif" font-size="11" fill="$TextMuted">${fmt(t)}</text>"""
    }
    // axes
    sb ++= s"""<line x1="$mL" y1="${mT + ph}" x2="${mL + pw}" y2="${mT + ph}" stroke="$TextMuted" stroke-width="1"/>"""
    sb ++= s"""<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + ph}" stroke="$TextMuted" stroke-width="1"/>"""
    sb ++= s"""<text x="${mL + pw / 2}" y="${height - 14}" text-anchor="middle" font-family="sans-serif" font-size="13" fill="$TextPrimary">${esc(xLabel)}</text>"""
    sb ++= s"""<text x="18" y="${mT + ph / 2}" text-anchor="middle" font-family="sans-serif" font-size="13" fill="$TextPrimary" transform="rotate(-90 18 ${mT + ph / 2})">${esc(yLabel)}</text>"""
    // series: 2px line + 8px marker, shape double-encodes identity
    ordered.zipWithIndex.foreach { case (s, idx) =>
      val color = Palette(idx)
      val pts = s.points.map(p => (sx(p._1), sy(p._2)))
      val path = pts.map { case (x, y) => f"$x%.1f,$y%.1f" }.mkString(" ")
      sb ++= s"""<polyline points="$path" fill="none" stroke="$color" stroke-width="2"/>"""
      pts.foreach { case (x, y) => sb ++= marker(idx, x, y, color) }
    }
    // legend (top-right, inside the plot margin): marker + text token
    ordered.zipWithIndex.foreach { case (s, idx) =>
      val (lx, ly) = (mL + pw - 110, mT + 10 + idx * 20)
      sb ++= marker(idx, lx, ly, Palette(idx))
      sb ++= s"""<text x="${lx + 12}" y="${ly + 4}" font-family="sans-serif" font-size="12" fill="$TextPrimary">${esc(s.name)}</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** 8px markers, one shape per palette slot. */
  private def marker(idx: Int, x: Double, y: Double, color: String): String =
    idx % 4 match {
      case 0 => f"""<circle cx="$x%.1f" cy="$y%.1f" r="4" fill="$color"/>"""
      case 1 => f"""<rect x="${x - 4}%.1f" y="${y - 4}%.1f" width="8" height="8" fill="$color"/>"""
      case 2 => f"""<polygon points="$x%.1f,${y - 5}%.1f ${x - 4.5}%.1f,${y + 4}%.1f ${x + 4.5}%.1f,${y + 4}%.1f" fill="$color"/>"""
      case _ => f"""<polygon points="$x%.1f,${y - 5}%.1f ${x + 5}%.1f,$y%.1f $x%.1f,${y + 5}%.1f ${x - 5}%.1f,$y%.1f" fill="$color"/>"""
    }

  /** Chart a `(series, x, y)` projection of any DataFrame. */
  def lineChart(df: DataFrame, xCol: String, yCol: String, seriesCol: String,
                title: String, xLabel: String, yLabel: String,
                logX: Boolean = false, logY: Boolean = false,
                width: Int = 800, height: Int = 600): String = {
    val rows = df.select(col(seriesCol).cast("string"),
        col(xCol).cast("double"), col(yCol).cast("double"))
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val series = rows.groupBy(_._1).toSeq.map { case (name, pts) =>
      PlotSeries(name, pts.map(p => (p._2, p._3)).toSeq)
    }
    render(series, title, xLabel, yLabel, logX, logY, width, height)
  }

  def save(svg: String, path: String): java.nio.file.Path =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      svg.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The Stage-3 visualizer's full output
    * (`mm_perf_parallel_visualizer.py:161-166`): per matrix size, three
    * charts over the `speedup_efficiency` query result
    * (lang, size, threads, avg_time_ms, speedup, efficiency) —
    * speedup & efficiency linear, execution time log-y. Returns the
    * written paths. */
  def parallelPlots(speedupEff: DataFrame, outDir: String): Seq[java.nio.file.Path] = {
    val sizes = speedupEff.select(col("size").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    sizes.flatMap { n =>
      val sub = speedupEff.filter(col("size") === n)
      Seq(
        save(lineChart(sub, "threads", "speedup", "lang",
          s"Speedup vs Threads (n = $n)", "Threads (p)", "Speedup (T1 / Tp)"),
          s"$outDir/parallel_speedup_$n.svg"),
        save(lineChart(sub, "threads", "efficiency", "lang",
          s"Efficiency vs Threads (n = $n)", "Threads (p)", "Efficiency (Speedup / p)"),
          s"$outDir/parallel_efficiency_$n.svg"),
        save(lineChart(sub, "threads", "avg_time_ms", "lang",
          s"Execution Time vs Threads (n = $n)", "Threads (p)",
          "Execution Time (ms, log scale)", logY = true),
          s"$outDir/parallel_time_$n.svg"))
    }.toSeq
  }

  /** The Stage-1 visualizer's time plot (`mm_perf_visualizer.py:50-70`):
    * execution time vs matrix size, log-log, one line per lang, over
    * the `bench_avg_time` query result. */
  def timeVsSizePlot(avgTime: DataFrame, outPath: String): java.nio.file.Path =
    save(lineChart(avgTime, "size", "avg_time_ms", "lang",
      "Matrix Multiplication Performance Comparison", "Matrix size (N)",
      "Average execution time (ms)", logX = true, logY = true),
      outPath)

  /** The Stage-2 visualizer's full output
    * (`Stage 2/Visualization/mm_perf_visualizer.py:69-125`): the dense
    * cluster (basic/blocked/transposed) vs the sparse cluster, each as
    * a log-log time chart and a log-log peak-memory chart — four
    * figures over the cleaned results union (`results_union_clean`'s
    * relation). Series key is "LANG - algo", the reference's legend
    * label; the reference double-encodes with color=lang + marker=algo,
    * the engine's chart discipline gives each series its own palette
    * slot + marker shape instead. Memory resolves per-language with the
    * peak fallback (A14, [[graft.operators.Analytics.peakMemoryExpr]]).
    * A cluster with no rows renders no chart, matching the reference's
    * empty-group skip. Returns the written paths. */
  def stage2Plots(cleanResults: DataFrame, outDir: String): Seq[java.nio.file.Path] = {
    import org.apache.spark.sql.functions.{concat_ws, upper}
    import graft.operators.Analytics
    val keyed = cleanResults
      .withColumn("series", concat_ws(" - ", upper(col("lang")), col("algo")))
      .withColumn("peak_mem_mb", Analytics.peakMemoryExpr)
    val clusters = Seq(
      ("mm_perf_dense", "Dense (basic / blocked / transposed)",
        Analytics.denseAlgos(keyed)),
      // U+00D7 multiplication sign, matching the reference title
      // verbatim (Stage 2/Visualization/mm_perf_visualizer.py:125) —
      // SVG is UTF-8, so no ASCII substitution is needed
      ("mm_perf_sparse", "Sparse (CSR × Dense)", Analytics.sparseAlgos(keyed)))
    clusters.flatMap { case (prefix, label, sub) =>
      if (sub.isEmpty) Nil
      else Seq(
        save(lineChart(sub, "size", "avg_time_ms", "series",
          s"Optimized Matrix Multiplication ($label) - Performance",
          "Matrix size (N)", "Average execution time (ms)",
          logX = true, logY = true), s"$outDir/${prefix}_time.svg"),
        save(lineChart(sub.filter(col("peak_mem_mb").isNotNull),
          "size", "peak_mem_mb", "series",
          s"Optimized Matrix Multiplication ($label) - Memory",
          "Matrix size (N)", "Peak memory (MB)",
          logX = true, logY = true), s"$outDir/${prefix}_memory.svg"))
    }
  }
}
