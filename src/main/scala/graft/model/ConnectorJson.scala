package graft.model

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import scala.collection.JavaConverters._

/** JSON front-end for the declarative model — the reference's users write
  * `Connector`/`Pipeline` objects as JSON config (src/types.ts:242-301);
  * this parses the same shape into the Scala model, so a reference
  * pipeline definition ports by changing nothing but the engine.
  *
  * Shape (all fields optional except table):
  * {
  *   "table": "lineitem",
  *   "fields": ["l_orderkey"],
  *   "filters": [{"field": "l_quantity", "operator": "<", "value": 24}],
  *   "sort": [{"field": "l_orderkey", "type": "asc"}],
  *   "limit": 100, "offset": 0,
  *   "transformations": [{"type": "uppercase", "field": "x", "to": "y", ...}]
  * }
  */
object ConnectorJson {
  private val mapper = new ObjectMapper()

  private def anyOf(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isArray) n.elements().asScala.map(anyOf).toSeq
    else n.asText()

  private def strSeq(n: JsonNode): Seq[String] =
    if (n == null) Nil else n.elements().asScala.map(_.asText()).toSeq

  private def opt(n: JsonNode, f: String): Option[JsonNode] =
    Option(n.get(f)).filterNot(_.isNull)

  def parseFilter(n: JsonNode): Filter =
    Filter(
      field = n.get("field").asText(),
      operator = n.get("operator").asText(),
      value = anyOf(n.get("value")))

  def parseSort(n: JsonNode): Sort =
    Sort(n.get("field").asText(),
      ascending = opt(n, "type").forall(_.asText() != "desc"))

  def parseTransformation(n: JsonNode): Transformation =
    Transformation(
      `type` = n.get("type").asText(),
      field = opt(n, "field").map(_.asText()).orNull,
      to = opt(n, "to").map(_.asText()).orNull,
      properties = strSeq(n.get("properties")),
      glue = opt(n, "glue").map(_.asText()).getOrElse(" "),
      delimiter = opt(n, "delimiter").map(_.asText()).getOrElse(","),
      search = opt(n, "search").map(_.asText()).orNull,
      replace = opt(n, "replace").map(_.asText()).orNull,
      prefix = opt(n, "prefix").map(_.asText()).orNull,
      suffix = opt(n, "suffix").map(_.asText()).orNull,
      pattern = opt(n, "pattern").map(_.asText()).orNull,
      start = opt(n, "start").map(_.asInt()).getOrElse(0),
      end = opt(n, "end").map(_.asInt()).getOrElse(Int.MaxValue),
      fields = strSeq(n.get("fields")))

  def parseJoin(n: JsonNode): JoinSpec =
    JoinSpec(
      table = n.get("table").asText(),
      leftOn = n.get("leftOn").asText(),
      rightOn = n.get("rightOn").asText(),
      joinType = opt(n, "type").map(_.asText()).getOrElse("inner"),
      broadcastRight = opt(n, "broadcast").exists(_.asBoolean()))

  def parseAgg(n: JsonNode): AggSpec =
    AggSpec(
      function = n.get("function").asText(),
      field = opt(n, "field").map(_.asText()).orNull,
      as = opt(n, "as").map(_.asText()).orNull)

  def parseGroupBy(n: JsonNode): GroupBySpec =
    GroupBySpec(
      fields = strSeq(n.get("fields")),
      aggs = opt(n, "aggs").map(_.elements().asScala.map(parseAgg).toSeq).getOrElse(Nil),
      having = opt(n, "having").map(_.elements().asScala.map(parseFilter).toSeq).getOrElse(Nil))

  def parseWindow(n: JsonNode): WindowFnSpec =
    WindowFnSpec(
      function = n.get("function").asText(),
      field = opt(n, "field").map(_.asText()).orNull,
      as = opt(n, "as").map(_.asText()).orNull,
      partitionBy = strSeq(n.get("partitionBy")),
      orderBy = opt(n, "orderBy").map(_.elements().asScala.map(parseSort).toSeq).getOrElse(Nil),
      offset = opt(n, "offset").map(_.asInt()).getOrElse(1))

  def parse(json: String): Connector = {
    val root = mapper.readTree(json)
    require(root.hasNonNull("table"), "connector JSON requires 'table'")
    Connector(
      table = root.get("table").asText(),
      fields = strSeq(root.get("fields")),
      filters = opt(root, "filters").map(_.elements().asScala.map(parseFilter).toSeq).getOrElse(Nil),
      sort = opt(root, "sort").map(_.elements().asScala.map(parseSort).toSeq).getOrElse(Nil),
      limit = opt(root, "limit").map(_.asLong()).getOrElse(1000000L),
      offset = opt(root, "offset").map(_.asLong()).getOrElse(0L),
      transformations = opt(root, "transformations")
        .map(_.elements().asScala.map(parseTransformation).toSeq).getOrElse(Nil),
      joins = opt(root, "joins").map(_.elements().asScala.map(parseJoin).toSeq).getOrElse(Nil),
      groupBy = opt(root, "groupBy").map(parseGroupBy),
      windows = opt(root, "windows").map(_.elements().asScala.map(parseWindow).toSeq).getOrElse(Nil),
      sample = opt(root, "sample").map(n => SampleSpec(
        column = n.get("column").asText(),
        percent = n.get("percent").asInt(),
        salt = opt(n, "salt").map(_.asText()).getOrElse("graft"))),
      upsert = opt(root, "upsert").map(n => UpsertSpec(
        keys = strSeq(n.get("keys")),
        versionCols = strSeq(n.get("versionCols")))),
      dedup = opt(root, "dedup").map(n => DedupSpec(keys = strSeq(n.get("keys")))))
  }
}
