package graft.metrics

/** W4: static HTML report rendered from the rollups — the funnel,
  * bottleneck ranking, retention waterfall, and per-operator tables of
  * the reference's plotly report (framework/metrics/reporter.py: funnel
  * :636, bottleneck :1014-range views), as dependency-free inline SVG.
  * The interactive charts read the W3 parquet contract, which any BI
  * tool can also consume — SURVEY.md §2.11 keeps the plotly port out of
  * engine scope.
  */
object HtmlReport {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Whole-run retention funnel: one trapezoid segment per operator
    * boundary, width proportional to surviving rows.
    */
  private def funnelSvg(run: RunRollup): String = {
    val boundaries =
      run.stages.flatMap(s => s.operators.map(c => (s"${s.stageName}/${c.name}", c.output)))
    if (boundaries.isEmpty) return ""
    val w = 640; val rowH = 34; val labelW = 260
    val maxV = math.max(run.input, 1L)
    val rows = (("input", run.input) +: boundaries).zipWithIndex
    val h = rows.size * rowH + 8
    val sb = new StringBuilder(s"""<svg width="$w" height="$h" role="img">""")
    rows.foreach { case ((name, v), i) =>
      val y = i * rowH + 4
      val bw = math.max(((w - labelW - 8) * v) / maxV, 2L)
      val x = labelW + ((w - labelW - 8) - bw) / 2
      sb ++= s"""<rect x="$x" y="$y" width="$bw" height="${rowH - 10}" fill="#4a90d9" opacity="0.85"/>"""
      sb ++= s"""<text x="${labelW - 8}" y="${y + 16}" text-anchor="end" font-size="12">${esc(name)}</text>"""
      sb ++= s"""<text x="${x + bw + 6}" y="${y + 16}" font-size="12">$v</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Operators ranked by rows dropped — the bottleneck view. */
  private def bottleneckTable(run: RunRollup): String = {
    val drops = run.stages.flatMap(s => s.operators.map(c =>
      (s.stageName, c.name, c.input - c.output, 100.0 - c.passRate)))
      .filter(_._3 > 0).sortBy(-_._3)
    if (drops.isEmpty) return ""
    val maxDrop = math.max(drops.head._3, 1L)
    val sb = new StringBuilder("<h2>Bottlenecks (rows dropped)</h2>\n")
    sb ++= "<table><tr><th>stage</th><th>operator</th><th>dropped</th><th>drop&nbsp;rate</th><th></th></tr>\n"
    drops.foreach { case (st, op, d, rate) =>
      val bw = math.max((d * 200) / maxDrop, 1L)
      sb ++= f"<tr><td>${esc(st)}</td><td>${esc(op)}</td><td>$d</td><td>$rate%.2f%%</td>" +
        f"""<td><span class="bar drop" style="width:${bw}px"></span></td></tr>%n"""
    }
    sb ++= "</table>\n"
    sb.toString
  }

  def render(run: RunRollup): String = {
    val sb = new StringBuilder
    sb ++= s"""<!DOCTYPE html><html><head><meta charset="utf-8">
      |<title>${esc(run.runId)}</title><style>
      |body{font-family:sans-serif;margin:2em;color:#222}
      |table{border-collapse:collapse;margin:1em 0}
      |td,th{border:1px solid #ccc;padding:4px 10px;text-align:right}
      |th{background:#f4f4f4}td:first-child,th:first-child{text-align:left}
      |.bar{background:#4a90d9;height:12px;display:inline-block}
      |.bar.drop{background:#d9534f}
      |</style></head><body>
      |<h1>Pipeline run ${esc(run.runId)}</h1>
      |<p>${run.stages.size} stage(s) &middot; ${run.input} in &rarr; ${run.output} out
      | &middot; pass rate ${f"${run.passRate}%.2f"}%%
      | &middot; ${f"${run.durationSec}%.2f"}s
      | &middot; ${f"${run.avgThroughput}%.0f"} rec/s</p>
      |<h2>Retention funnel</h2>
      |""".stripMargin
    sb ++= funnelSvg(run)
    sb ++= bottleneckTable(run)
    run.stages.foreach { s =>
      sb ++= s"<h2>Stage: ${esc(s.stageName)}</h2>\n"
      sb ++= "<table><tr><th>operator</th><th>input</th><th>output</th>" +
        "<th>pass&nbsp;rate</th><th>time&nbsp;(s)</th><th>funnel</th></tr>\n"
      val maxIn = math.max(s.operators.map(_.input).foldLeft(1L)(math.max), 1L)
      s.operators.foreach { c =>
        val w = math.max((c.output * 200) / maxIn, 1L)
        sb ++= f"<tr><td>${esc(c.name)}</td><td>${c.input}</td><td>${c.output}</td>" +
          f"<td>${c.passRate}%.2f%%</td><td>${c.timeSec}%.3f</td>" +
          f"""<td><span class="bar" style="width:${w}px"></span></td></tr>%n"""
      }
      sb ++= "</table>\n"
    }
    sb ++= "</body></html>\n"
    sb.toString
  }

  def write(run: RunRollup, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, render(run))
  }
}
