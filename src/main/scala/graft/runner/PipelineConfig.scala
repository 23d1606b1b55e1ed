package graft.runner

import scala.jdk.CollectionConverters._

/** Typed view over YAML-parsed params (snakeyaml yields java types). */
final case class Params(m: Map[String, Any]) {
  def str(k: String): Option[String] = m.get(k).map(_.toString)
  def str(k: String, d: String): String = str(k).getOrElse(d)
  def long(k: String): Option[Long] = m.get(k).map(_.asInstanceOf[Number].longValue())
  def long(k: String, d: Long): Long = long(k).getOrElse(d)
  def int(k: String, d: Int): Int = long(k).map(_.toInt).getOrElse(d)
  def double(k: String, d: Double): Double =
    m.get(k).map(_.asInstanceOf[Number].doubleValue()).getOrElse(d)
  def bool(k: String, d: Boolean): Boolean =
    m.get(k).map(_.asInstanceOf[Boolean].booleanValue()).getOrElse(d)
  def strList(k: String): Seq[String] =
    m.get(k).map(_.asInstanceOf[java.util.List[Any]].asScala.toSeq.map(_.toString)).getOrElse(Nil)
  def longMap(k: String): Map[String, Long] = m.get(k) match {
    case Some(jm: java.util.Map[_, _]) =>
      jm.asScala.map { case (kk, vv) =>
        kk.toString -> vv.asInstanceOf[Number].longValue() }.toMap
    case Some(sm: Map[_, _]) =>
      sm.map { case (kk, vv) => kk.toString -> vv.asInstanceOf[Number].longValue() }
    case _ => Map.empty
  }
  def doubleMap(k: String): Map[String, Double] = m.get(k) match {
    case Some(jm: java.util.Map[_, _]) =>
      jm.asScala.map { case (kk, vv) =>
        kk.toString -> vv.asInstanceOf[Number].doubleValue() }.toMap
    case Some(sm: Map[_, _]) =>
      sm.map { case (kk, vv) => kk.toString -> vv.asInstanceOf[Number].doubleValue() }
    case _ => Map.empty
  }
}

final case class OperatorConf(name: String, params: Params)
final case class StageConf(name: String, operators: Seq[OperatorConf])
final case class LoaderConf(tpe: String, params: Params)
final case class WriterConf(tpe: String, params: Params)
final case class ExecutorConf(
    maxSamples: Option[Long], rejectedEnabled: Boolean,
    metricsEnabled: Boolean, metricsPath: Option[String], reportPath: Option[String],
    /** metrics.publish_path: publish the report as index.html under this
      * Hadoop-compatible URI (the reference's HF-Space static publish,
      * reporter.py:1258). */
    reportPublishPath: Option[String] = None,
    checkpointPath: Option[String] = None,
    /** "cache" (default): persist the annotated chain once and serve both
      * writes from it — best when the chain is compute-heavy (decode,
      * inference). "recompute": no cache, two source scans — best when
      * the chain is cheap and caching 100 TB of annotated rows costs
      * more than a second scan.
      */
    rejectedMaterialize: String = "cache",
    /** metrics.timed: profile mode — one action per operator boundary so
      * wall time is attributable per operator (the reference's
      * per-operator total_time). Costs recomputation; ignored when
      * reject routing is on (the disposition pass is single-action).
      */
    metricsTimed: Boolean = false)

/** The engine's only IR, exactly like the reference: a config tree
  * `data_loader → stages[{operators[]}] → data_writer → executor`
  * (framework/config.py:140-214). Operator order is execution order; no
  * plan rewriting happens here — Catalyst does the optimizing.
  */
final case class PipelineConf(
    loader: LoaderConf,
    stages: Seq[StageConf],
    writer: WriterConf,
    executor: ExecutorConf)

object PipelineConf {

  def fromYamlFile(path: String): PipelineConf =
    fromYaml(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  def fromYaml(text: String): PipelineConf = {
    val root = asMap(new org.yaml.snakeyaml.Yaml().load[Any](text))

    def params(m: Map[String, Any]): Params =
      Params(m.get("params").map(asMap).getOrElse(Map.empty))

    val loaderM = asMap(root.getOrElse("data_loader",
      throw new IllegalArgumentException("config missing data_loader")))
    val writerM = asMap(root.getOrElse("data_writer",
      throw new IllegalArgumentException("config missing data_writer")))

    val stages = root.get("stages").map(_.asInstanceOf[java.util.List[Any]].asScala.toSeq)
      .getOrElse(Nil).map { s =>
        val sm = asMap(s)
        val ops = sm.get("operators").map(_.asInstanceOf[java.util.List[Any]].asScala.toSeq)
          .getOrElse(Nil).map { o =>
            val om = asMap(o)
            OperatorConf(om("name").toString, params(om))
          }
        StageConf(sm("name").toString, ops)
      }

    val execM = root.get("executor").map(asMap).getOrElse(Map.empty[String, Any])
    val rejM = execM.get("rejected_samples").map(asMap).getOrElse(Map.empty[String, Any])
    val metM = execM.get("metrics").map(asMap).getOrElse(Map.empty[String, Any])
    val ckptM = execM.get("checkpoint").map(asMap).getOrElse(Map.empty[String, Any])
    val executor = ExecutorConf(
      maxSamples = execM.get("max_samples").map(_.asInstanceOf[Number].longValue()),
      rejectedEnabled = rejM.get("enabled").exists(_.asInstanceOf[Boolean]),
      metricsEnabled = metM.get("enabled").exists(_.asInstanceOf[Boolean]),
      metricsPath = metM.get("output_path").map(_.toString),
      reportPath = metM.get("report_path").map(_.toString),
      reportPublishPath = metM.get("publish_path").map(_.toString),
      checkpointPath = ckptM.get("path").map(_.toString),
      rejectedMaterialize = rejM.get("materialize").map(_.toString).getOrElse("cache"),
      metricsTimed = metM.get("timed").exists(_.asInstanceOf[Boolean]))

    PipelineConf(
      LoaderConf(loaderM("type").toString, params(loaderM)),
      stages,
      WriterConf(writerM("type").toString, params(writerM)),
      executor)
  }

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, x) => k.toString -> x }.toMap
    case other => throw new IllegalArgumentException(s"expected a YAML mapping, got $other")
  }
}
