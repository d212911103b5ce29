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

  /** A named CURATION profile — everything `dn curate NAME` needs to
    * drive the closed-loop pipeline (corpus_pipeline_full) the way
    * datasources+metrics drive the dragnet side: source tables, the
    * domain blocklist floor, per-source pack quotas, the HTML stage-0
    * switch, split/packing knobs, and where the manifest lands. */
  final case class Curation(
      name: String,
      docs: String,         // documents parquet path
      embeddings: String,   // embeddings parquet path (vec_id-aligned)
      out: Option[String],  // manifest output dir; absent = print-only
      domainFloorMilli: Option[Long], // row-91 blocklist floor, milli-logits
      quotas: Option[String], // "src0:1200,src1:-1" (-1 = uncapped)
      fromHtml: Boolean,    // row-100 extraction as stage 0
      evalMod: Int,         // eval split: doc_id % evalMod == 0
      seqLen: Int,
      shards: Int,
      /** Alternative to explicit quotas: SOLVE them — mixture weights
        * ("src0:3,src1:1", all named sources required, positive) fed
        * to the row-104 water-filling allocator over the corpus's
        * actual availability; the solved per-source token allocations
        * become the pack-tail caps. */
      weights: Option[String] = None,
      /** Budget for the solve, as a fraction of total corpus tokens. */
      budgetNum: Long = 9L,
      budgetDen: Long = 10L,
      /** Stage D's contamination action: `doc` (drop the whole
        * document, row 38) or `chunk` (excise the contaminated chunks
        * and keep the rest, row 105 — corpus_pipeline_surgical). */
      decontam: String = "doc",
      /** Row-116 language quotas at the pack tail: "en:3000,es:2000",
        * keyed on the PREDICTED langid bucket of the curated text
        * (-1 = explicitly uncapped). Applied before the per-source
        * quota when both are set. */
      langQuotas: Option[String] = None,
      /** Row-117 epoch seed: shuffle the pack layout globally and
        * replayably (shard + within-shard order follow
        * h60(seed:doc_id)); absent = the id-deterministic layout. */
      shuffleSeed: Option[Long] = None,
      /** Row-120 audit artifact: also write the per-doc disposition
        * ledger (which stage removed each doc, or 'packed') to this
        * path when the curation runs. Absent = manifest only. */
      ledgerOut: Option[String] = None)

  /** Parse a quotas flag: comma-separated `source:cap` entries, cap a
    * long (-1 = explicitly uncapped). */
  def parseQuotas(s: Option[String]): Seq[(String, Long)] =
    s.toSeq.flatMap(_.split(",").toSeq.filter(_.nonEmpty).map { e =>
      val i = e.lastIndexOf(':')
      if (i <= 0 || i == e.length - 1)
        throw new GraftException(s"bad quota entry: \"$e\" (want source:cap)")
      val cap = e.substring(i + 1).toLongOption.getOrElse(
        throw new GraftException(s"bad quota cap in \"$e\""))
      e.substring(0, i) -> cap
    })

  /** Parse a weights flag: same grammar as quotas but every weight
    * must be strictly positive (a mixture weight, not a cap). */
  def parseWeights(s: Option[String]): Map[String, Long] = {
    val w = parseQuotas(s).toMap
    w.foreach { case (src, v) =>
      if (v <= 0) throw new GraftException(
        s"mixture weight must be positive: \"$src:$v\"")
    }
    w
  }

  final case class Config(
      datasources: Vector[Datasource],
      metrics: Vector[Metric],
      curations: Vector[Curation] = Vector.empty) {

    def curation(name: String): Option[Curation] =
      curations.find(_.name == name)

    def curationAdd(c: Curation): Config = {
      if (curation(c.name).isDefined)
        throw new GraftException(s"curation exists: \"${c.name}\"")
      if (c.docs.isEmpty || c.embeddings.isEmpty)
        throw new GraftException("\"docs\" and \"embeddings\" are required")
      parseQuotas(c.quotas) // validate eagerly, like metric breakdowns
      parseQuotas(c.langQuotas)
      parseWeights(c.weights)
      if (c.quotas.isDefined && c.weights.isDefined)
        throw new GraftException(
          "quotas and weights are mutually exclusive: explicit caps OR " +
            "a solved mixture, not both")
      if (c.budgetNum < 1 || c.budgetDen < 1 || c.budgetNum > c.budgetDen)
        throw new GraftException("budget must be a fraction in (0, 1]")
      if (c.evalMod < 2)
        throw new GraftException("eval-mod must be >= 2")
      if (c.seqLen < 1 || c.shards < 1)
        throw new GraftException("seq-len and shards must be >= 1")
      if (c.decontam != "doc" && c.decontam != "chunk")
        throw new GraftException(
          s"""bad decontam: "${c.decontam}" (want doc or chunk)""")
      copy(curations = curations :+ c)
    }

    def curationRemove(name: String): Config = {
      if (curation(name).isEmpty)
        throw new GraftException(s"unknown curation: \"$name\"")
      copy(curations = curations.filterNot(_.name == name))
    }

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
    val cs = Option(root.get("curations")).map(_.elements()).map { it =>
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).map { n =>
        Curation(req(n, "name"), req(n, "docs"), req(n, "embeddings"),
          strOpt(n, "out"),
          Option(n.get("domainFloorMilli")).filterNot(_.isNull)
            .map(_.asLong),
          strOpt(n, "quotas"),
          Option(n.get("fromHtml")).exists(_.asBoolean),
          Option(n.get("evalMod")).map(_.asInt).getOrElse(97),
          Option(n.get("seqLen")).map(_.asInt).getOrElse(256),
          Option(n.get("shards")).map(_.asInt).getOrElse(8),
          strOpt(n, "weights"),
          Option(n.get("budgetNum")).map(_.asLong).getOrElse(9L),
          Option(n.get("budgetDen")).map(_.asLong).getOrElse(10L),
          strOpt(n, "decontam").getOrElse("doc"),
          strOpt(n, "langQuotas"),
          Option(n.get("shuffleSeed")).filterNot(_.isNull).map(_.asLong),
          strOpt(n, "ledgerOut"))
      }.toVector
    }.getOrElse(Vector.empty)
    Config(dss, ms, cs)
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
    val cArr = root.putArray("curations")
    cfg.curations.foreach { c =>
      val n = cArr.addObject()
      n.put("name", c.name).put("docs", c.docs)
        .put("embeddings", c.embeddings)
      putOpt(n, "out", c.out)
      c.domainFloorMilli.foreach(n.put("domainFloorMilli", _))
      putOpt(n, "quotas", c.quotas)
      n.put("fromHtml", c.fromHtml)
      n.put("evalMod", c.evalMod).put("seqLen", c.seqLen)
        .put("shards", c.shards)
      putOpt(n, "weights", c.weights)
      n.put("budgetNum", c.budgetNum).put("budgetDen", c.budgetDen)
      n.put("decontam", c.decontam)
      putOpt(n, "langQuotas", c.langQuotas)
      c.shuffleSeed.foreach(n.put("shuffleSeed", _))
      putOpt(n, "ledgerOut", c.ledgerOut)
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
