package graft.metrics

/** W4 (minimal): static HTML report rendered from the rollups — the
  * funnel + per-operator table subset of the reference's plotly report
  * (framework/metrics/reporter.py; its interactive charts read the W3
  * parquet contract, which any BI tool can also consume — SURVEY.md
  * §2.11 keeps the full port out of engine scope).
  */
object HtmlReport {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def render(run: RunRollup): String = {
    val sb = new StringBuilder
    sb ++= s"""<!DOCTYPE html><html><head><meta charset="utf-8">
      |<title>${esc(run.runId)}</title><style>
      |body{font-family:sans-serif;margin:2em;color:#222}
      |table{border-collapse:collapse;margin:1em 0}
      |td,th{border:1px solid #ccc;padding:4px 10px;text-align:right}
      |th{background:#f4f4f4}td:first-child,th:first-child{text-align:left}
      |.bar{background:#4a90d9;height:12px;display:inline-block}
      |</style></head><body>
      |<h1>Pipeline run ${esc(run.runId)}</h1>
      |<p>${run.stages.size} stage(s) &middot; ${run.input} in &rarr; ${run.output} out
      | &middot; pass rate ${f"${run.passRate}%.2f"}%%
      | &middot; ${f"${run.durationSec}%.2f"}s</p>
      |""".stripMargin
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
