package graft.io

import org.apache.spark.sql.DataFrame

/** S5 chart sink — the reference's matplotlib PNG reports
  * (`/root/reference/main.py:570-787`: horizontal bar charts for industry
  * counts / top channels / word frequency, with value labels and
  * thousands-separator axes; time-series plots) re-expressed as
  * dependency-free SVG: vector output, no imaging libraries, and Unicode
  * text (incl. RTL Persian) renders natively — no font-file juggling or
  * glyph reshaping (`main.py:580-593`).
  *
  * Scale contract: a chart input is by definition a top-K REPORT (tens of
  * rows), never a fact table — the sink takes the first `maxRows` of the
  * already-ordered report and the collect is bounded by that constant. All
  * heavy aggregation happened upstream in the distributed plan.
  */
object ChartSink {

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  /** Thousands separator, reference `thousands_fmt` (`main.py:596-597`). */
  def fmt(v: Double): String = {
    val asLong = v.toLong
    if (v == asLong) "%,d".formatLocal(java.util.Locale.US, asLong)
    else "%,.2f".formatLocal(java.util.Locale.US, v)
  }

  /** Horizontal bar chart (the reference's dominant chart form). */
  def barChartSvg(
      rows: Seq[(String, Double)], title: String,
      width: Int = 900, barHeight: Int = 28): String = {
    val n = rows.size
    val top = 60
    val labelW = 220
    val gap = 8
    val height = top + n * (barHeight + gap) + 30
    val maxV = math.max(rows.map(_._2).foldLeft(0.0)(math.max), 1e-9)
    val plotW = width - labelW - 120
    val bars = rows.zipWithIndex.map { case ((label, v), i) =>
      val y = top + i * (barHeight + gap)
      val w = math.max((v / maxV * plotW).round.toInt, 0)
      s"""  <text x="${labelW - 8}" y="${y + barHeight * 0.7}" text-anchor="end" font-size="14">${esc(label)}</text>
  <rect x="$labelW" y="$y" width="$w" height="$barHeight" fill="#4878a8"/>
  <text x="${labelW + w + 6}" y="${y + barHeight * 0.7}" font-size="13" fill="#333">${fmt(v)}</text>"""
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" font-family="sans-serif">
  <text x="${width / 2}" y="32" text-anchor="middle" font-size="22" font-weight="bold">${esc(title)}</text>
$bars
</svg>
"""
  }

  /** Time-series line chart (the reference's resampled trend plots). */
  def lineChartSvg(
      rows: Seq[(String, Double)], title: String,
      width: Int = 900, height: Int = 360): String = {
    val top = 60
    val left = 80
    val plotW = width - left - 40
    val plotH = height - top - 60
    val n = rows.size
    val maxV = math.max(rows.map(_._2).foldLeft(0.0)(math.max), 1e-9)
    def x(i: Int) = left + (if (n <= 1) 0.0 else i.toDouble / (n - 1) * plotW)
    def y(v: Double) = top + plotH - v / maxV * plotH
    val pts = rows.zipWithIndex
      .map { case ((_, v), i) => f"${x(i)}%.1f,${y(v)}%.1f" }.mkString(" ")
    val xLabels = rows.zipWithIndex
      .filter { case (_, i) => n <= 12 || i % math.max(n / 12, 1) == 0 }
      .map { case ((label, _), i) =>
        s"""  <text x="${x(i)}" y="${height - 18}" text-anchor="middle" font-size="11">${esc(label)}</text>"""
      }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" font-family="sans-serif">
  <text x="${width / 2}" y="32" text-anchor="middle" font-size="22" font-weight="bold">${esc(title)}</text>
  <line x1="$left" y1="${top + plotH}" x2="${left + plotW}" y2="${top + plotH}" stroke="#333"/>
  <text x="${left - 10}" y="${top + 5}" text-anchor="end" font-size="12">${fmt(maxV)}</text>
  <text x="${left - 10}" y="${top + plotH}" text-anchor="end" font-size="12">0</text>
  <polyline points="$pts" fill="none" stroke="#4878a8" stroke-width="2"/>
$xLabels
</svg>
"""
  }

  /** First `maxRows` of an already-ordered 2-column report as (label, value)
    * pairs; the bounded collect is the sink's contract (see class doc). */
  private def reportRows(df: DataFrame, labelCol: String, valueCol: String,
      maxRows: Int): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions.col
    df.select(col(labelCol).cast("string"), col(valueCol).cast("double"))
      .limit(maxRows)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse(""), r.getDouble(1)))
      .toSeq
  }

  def writeBarChart(df: DataFrame, labelCol: String, valueCol: String,
      title: String, path: String, maxRows: Int = 50): Unit =
    writeSvg(path, barChartSvg(reportRows(df, labelCol, valueCol, maxRows), title))

  def writeLineChart(df: DataFrame, labelCol: String, valueCol: String,
      title: String, path: String, maxRows: Int = 500): Unit =
    writeSvg(path, lineChartSvg(reportRows(df, labelCol, valueCol, maxRows), title))

  private def writeSvg(path: String, svg: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, svg)
    ()
  }
}
