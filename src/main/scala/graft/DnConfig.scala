package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/**
 * dn's persistent configuration: named datasources and per-datasource
 * metrics, stored as a JSON file (the analog of the reference's
 * `~/.dragnetrc`, lib/config-common.js + config-local.js). Save is
 * atomic (tmp file + move), mirroring the reference's tmp-rename dance.
 *
 * The `backend` field is kept for CLI parity, but every backend resolves
 * through the Hadoop FS abstraction — a `file:/`, `hdfs:/` or `s3a:/`
 * path is the same code path, which is graft's answer to the reference's
 * file/manta backend split (lib/datasource-file.js,
 * lib/datasource-manta.js).
 */
object DnConfig {

  final case class Datasource(
      name: String,
      backend: String,
      path: String,
      indexPath: Option[String],
      timeField: Option[String],
      timeFormat: Option[String],
      dataFormat: Option[String],
      filter: Option[String]) // krill JSON, validated on add

  final case class Metric(
      name: String,
      datasource: String,
      breakdowns: String, // attr-spec string, e.g. "host,latency[aggr=quantize]"
      filter: Option[String])

  final case class Config(
      datasources: Vector[Datasource],
      metrics: Vector[Metric]) {

    def datasource(name: String): Option[Datasource] =
      datasources.find(_.name == name)

    def metricsFor(ds: String): Vector[Metric] =
      metrics.filter(_.datasource == ds)

    def datasourceAdd(ds: Datasource): Config = {
      if (datasource(ds.name).isDefined)
        throw new GraftException(s"datasource exists: \"${ds.name}\"")
      validate(ds)
      copy(datasources = datasources :+ ds)
    }

    def datasourceUpdate(name: String, f: Datasource => Datasource): Config = {
      val old = datasource(name).getOrElse(
        throw new GraftException(s"unknown datasource: \"$name\""))
      val updated = f(old)
      validate(updated)
      copy(datasources = datasources.map(d => if (d.name == name) updated else d))
    }

    def datasourceRemove(name: String): Config = {
      if (datasource(name).isEmpty)
        throw new GraftException(s"unknown datasource: \"$name\"")
      // a datasource's metrics go with it (they're meaningless without it)
      copy(datasources = datasources.filterNot(_.name == name),
        metrics = metrics.filterNot(_.datasource == name))
    }

    def metricAdd(m: Metric): Config = {
      if (datasource(m.datasource).isEmpty)
        throw new GraftException(s"unknown datasource: \"${m.datasource}\"")
      if (metricsFor(m.datasource).exists(_.name == m.name))
        throw new GraftException(
          s"metric exists: \"${m.name}\" on \"${m.datasource}\"")
      try AttrParser.parse(m.breakdowns) // validate eagerly
      catch { case e: IllegalArgumentException =>
        throw new GraftException(s"bad breakdowns: ${e.getMessage}") }
      m.filter.foreach(graft.filter.Krill.parse)
      copy(metrics = metrics :+ m)
    }

    def metricRemove(ds: String, name: String): Config = {
      if (!metricsFor(ds).exists(_.name == name))
        throw new GraftException(s"unknown metric: \"$name\" on \"$ds\"")
      copy(metrics =
        metrics.filterNot(m => m.datasource == ds && m.name == name))
    }

    private def validate(ds: Datasource): Unit = {
      if (ds.path.isEmpty) throw new GraftException("\"path\" is required")
      ds.filter.foreach(graft.filter.Krill.parse)
      ds.dataFormat.foreach { f =>
        if (f != "json" && f != "json-skinner" && f != "parquet")
          throw new GraftException(s"unsupported data-format: \"$f\"")
      }
    }
  }

  val Empty: Config = Config(Vector.empty, Vector.empty)

  /** Config file location: $GRAFT_CONFIG, else ~/.graftrc. */
  def defaultPath: Path = sys.env.get("GRAFT_CONFIG").map(Paths.get(_))
    .getOrElse(Paths.get(sys.props("user.home"), ".graftrc"))

  private val mapper = new ObjectMapper()

  def load(path: Path = defaultPath): Config = {
    if (!Files.exists(path)) return Empty
    val root =
      try mapper.readTree(Files.readString(path))
      catch { case e: com.fasterxml.jackson.core.JacksonException =>
        throw new GraftException(
          s"corrupt config file $path: ${e.getMessage}") }
    def strOpt(n: JsonNode, k: String): Option[String] =
      Option(n.get(k)).filterNot(_.isNull).map(_.asText)
    // structurally invalid entries (valid JSON, missing required keys)
    // must fail like corrupt JSON, not with a NullPointerException
    def req(n: JsonNode, k: String): String = strOpt(n, k).getOrElse(
      throw new GraftException(
        s"corrupt config file $path: entry missing \"$k\": $n"))
    val dss = Option(root.get("datasources")).map(_.elements()).map { it =>
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).map { n =>
        Datasource(req(n, "name"), strOpt(n, "backend").getOrElse("file"),
          req(n, "path"), strOpt(n, "indexPath"), strOpt(n, "timeField"),
          strOpt(n, "timeFormat"), strOpt(n, "dataFormat"), strOpt(n, "filter"))
      }.toVector
    }.getOrElse(Vector.empty)
    val ms = Option(root.get("metrics")).map(_.elements()).map { it =>
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).map { n =>
        Metric(req(n, "name"), req(n, "datasource"),
          req(n, "breakdowns"), strOpt(n, "filter"))
      }.toVector
    }.getOrElse(Vector.empty)
    Config(dss, ms)
  }

  def save(cfg: Config, path: Path = defaultPath): Unit = {
    val root = mapper.createObjectNode()
    val dsArr = root.putArray("datasources")
    cfg.datasources.foreach { d =>
      val n = dsArr.addObject()
      n.put("name", d.name).put("backend", d.backend).put("path", d.path)
      putOpt(n, "indexPath", d.indexPath)
      putOpt(n, "timeField", d.timeField)
      putOpt(n, "timeFormat", d.timeFormat)
      putOpt(n, "dataFormat", d.dataFormat)
      putOpt(n, "filter", d.filter)
    }
    val mArr = root.putArray("metrics")
    cfg.metrics.foreach { m =>
      val n = mArr.addObject()
      n.put("name", m.name).put("datasource", m.datasource)
        .put("breakdowns", m.breakdowns)
      putOpt(n, "filter", m.filter)
    }
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    if (path.getParent != null) Files.createDirectories(path.getParent)
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def putOpt(n: ObjectNode, k: String, v: Option[String]): Unit =
    v.foreach(n.put(k, _))
}
