package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Executes a compiled [[MongoFind.FindCommand]] against a local
  * DataFrame with MongoDB `find` semantics — the offline proof that the
  * compiled dialect is EXECUTABLE, not just well-formed (the wire
  * adapter stays the documented non-goal seam; a stock driver would
  * consume the same documents). The interpreter re-reads the command
  * from its JSON rendering — exactly the bytes a driver would receive —
  * so a serialization bug can't hide behind the in-memory objects.
  *
  * Mongo semantics honored where they differ from SQL three-valued
  * logic (reference behavior: adapters/mongodb/src/index.ts:222-228
  * assembles find→project→sort→limit→skip; the matching rules are the
  * server's):
  *  - `{f: null}` / `{$eq: null}` match null AND missing → `isNull`
  *  - `$ne v` matches documents where the field is null (Mongo:
  *    absent-or-different), unlike SQL `<>`; `$nin [..]` does too
  *    UNLESS null is itself in the list (null equals null in find
  *    matching, so an absent field is then "in" the list)
  *  - range operators ($gt/$gte/$lt/$lte) never match null (BSON type
  *    bracketing) — SQL null-propagation coincides, no special case
  *  - `$regex` is find-anywhere (Java regex `find()` ≡ Spark RLIKE)
  *  - sort: ascending puts nulls first, descending puts them last
  *    (BSON order: Null sorts before numbers/strings)
  *  - cursor chain applies skip BEFORE limit
  */
object MongoFindInterpreter {

  private val mapper = new ObjectMapper()

  private def litOf(n: JsonNode): Column =
    if (n.isNull) lit(null)
    else if (n.isBoolean) lit(n.booleanValue)
    else if (n.isIntegralNumber) lit(n.longValue)
    else if (n.isFloatingPointNumber) lit(n.doubleValue)
    else lit(n.asText)

  /** (non-null-element membership predicate, list-contains-null) —
    * the shared pieces $in and $nin combine with opposite null rules. */
  private def listParts(field: String, arr: JsonNode): (Column, Boolean) = {
    val (nulls, vals) = arr.elements.asScala.toSeq.partition(_.isNull)
    val inVals =
      if (vals.isEmpty) lit(false)
      else vals.map(v => col(field) === litOf(v)).reduce(_ || _)
    (inVals, nulls.nonEmpty)
  }

  private def inList(field: String, arr: JsonNode): Column = {
    val (inVals, hasNull) = listParts(field, arr)
    if (hasNull) inVals || col(field).isNull else inVals
  }

  private def opPredicate(field: String, op: String, v: JsonNode): Column = op match {
    case "$gt"  => col(field) > litOf(v)
    case "$gte" => col(field) >= litOf(v)
    case "$lt"  => col(field) < litOf(v)
    case "$lte" => col(field) <= litOf(v)
    case "$eq"  => if (v.isNull) col(field).isNull else col(field) === litOf(v)
    case "$ne"  =>
      if (v.isNull) col(field).isNotNull
      else col(field).isNull || col(field) =!= litOf(v)
    case "$in"  => inList(field, v)
    case "$nin" =>
      // Mongo: a null/missing field matches $nin UNLESS null is itself
      // in the list (null "equals" null in find matching)
      val (inVals, hasNull) = listParts(field, v)
      val nonNullMiss = col(field).isNotNull && !inVals
      if (hasNull) nonNullMiss else nonNullMiss || col(field).isNull
    case "$regex" => col(field).rlike(v.asText)
    case other => throw new IllegalArgumentException(
      s"unsupported find operator '$other' on field '$field'")
  }

  /** field spec → predicate: an operator document AND-combines its
    * operators; a bare value is equality (null-safe, Mongo style). */
  private def fieldPredicate(field: String, spec: JsonNode): Column =
    if (spec.isObject && spec.fieldNames.asScala.forall(_.startsWith("$")))
      spec.fields.asScala.map(e => opPredicate(field, e.getKey, e.getValue))
        .reduce(_ && _)
    else if (spec.isNull) col(field).isNull
    else col(field) === litOf(spec)

  def execute(df: DataFrame, cmd: MongoFind.FindCommand): DataFrame = {
    val query = mapper.readTree(cmd.queryJson)
    val filtered = query.fields.asScala.foldLeft(df) { (d, e) =>
      d.filter(fieldPredicate(e.getKey, e.getValue))
    }
    val projected = cmd.projectionJson match {
      case Some(p) =>
        val fields = mapper.readTree(p).fieldNames.asScala.toSeq
        filtered.select(fields.map(col): _*)
      case None => filtered
    }
    val sorted = cmd.sortJson match {
      case Some(s) =>
        val keys = mapper.readTree(s).fields.asScala.toSeq.map { e =>
          if (e.getValue.asInt == 1) col(e.getKey).asc_nulls_first
          else col(e.getKey).desc_nulls_last
        }
        projected.orderBy(keys: _*)
      case None => projected
    }
    val skipped = cmd.skip.fold(sorted)(n => sorted.offset(n.toInt))
    cmd.limit.fold(skipped)(n => skipped.limit(n.toInt))
  }
}
