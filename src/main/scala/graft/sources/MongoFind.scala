package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.model.{Connector, Filter, Sort}

/** Compiler from the declarative Connector surface to a MongoDB
  * find-command — the reference's Mongo dialect (buildMongoQuery /
  * buildProjection / buildSort, adapters/mongodb/src/index.ts:99-151,
  * and the cursor assembly find→project→sort→limit→skip at :222-228),
  * reproduced as a PURE function so the dialect is testable without a
  * wire connection (the driver jar isn't available offline; a live
  * adapter would feed [[FindCommand.queryJson]] straight to
  * `collection.find`).
  *
  * Faithful reference behaviors:
  *  - filters AND-merge into ONE document keyed by field; a later filter
  *    on the same field OVERWRITES the earlier one (the reference's
  *    `Object.assign(query, ...)` per filter, :124-126)
  *  - `=` compiles to a bare value, comparisons to $gt/$lt/$gte/$lte/$ne
  *  - projection = {field: 1}, sort = {field: 1|-1}
  *
  * Engine extension (same honest superset as the REST source's param
  * compilation): the rest of the §2.2 operator set — in/not_in ($in/
  * $nin), between ($gte+$lte), contains/starts_with ($regex, quoted),
  * is_null/is_not_null ($eq null / $ne null). Unknown operators fall
  * back to equality, exactly like the reference's `default` branch.
  */
object MongoFind {

  private val mapper = new ObjectMapper()

  final case class FindCommand(query: ObjectNode, projection: Option[ObjectNode],
                               sort: Option[ObjectNode], limit: Option[Long],
                               skip: Option[Long]) {
    def queryJson: String = query.toString
    def projectionJson: Option[String] = projection.map(_.toString)
    def sortJson: Option[String] = sort.map(_.toString)
  }

  private def putValue(n: ObjectNode, field: String, v: Any): Unit = v match {
    case null       => n.putNull(field)
    case b: Boolean => n.put(field, b)
    case i: Int     => n.put(field, i.toLong)
    case l: Long    => n.put(field, l)
    case d: Double  => n.put(field, d)
    case f: Float   => n.put(field, f.toDouble)
    case other      => n.put(field, String.valueOf(other))
  }

  private def opNode(op: String, v: Any): ObjectNode = {
    val n = mapper.createObjectNode()
    putValue(n, op, v)
    n
  }

  /** Regex-escape a literal for $regex (contains / starts_with). */
  private def quoteRegex(s: String): String =
    s.replaceAll("""([.\\+*?\[\]^$(){}=!<>|:#-])""", """\\$1""")

  def compileFilter(query: ObjectNode, f: Filter): Unit = f.operator match {
    case "="  => putValue(query, f.field, f.value)
    case ">"  => query.set(f.field, opNode("$gt", f.value)); ()
    case "<"  => query.set(f.field, opNode("$lt", f.value)); ()
    case ">=" => query.set(f.field, opNode("$gte", f.value)); ()
    case "<=" => query.set(f.field, opNode("$lte", f.value)); ()
    case "!=" => query.set(f.field, opNode("$ne", f.value)); ()
    case "in" | "not_in" =>
      val arr = mapper.createArrayNode()
      // same type mapping as the scalar putValue path — stringifying a
      // boolean/float/null element would make $in match nothing
      def addElem(v: Any): Unit = v match {
        case null       => arr.addNull()
        case b: Boolean => arr.add(b)
        case i: Int     => arr.add(i.toLong)
        case l: Long    => arr.add(l)
        case d: Double  => arr.add(d)
        case fl: Float  => arr.add(fl.toDouble)
        case other      => arr.add(String.valueOf(other))
      }
      f.value match {
        case vs: Seq[_] => vs.foreach(addElem)
        case other      => addElem(other)
      }
      val n = mapper.createObjectNode()
      n.set[ObjectNode](if (f.operator == "in") "$in" else "$nin", arr)
      query.set(f.field, n); ()
    case "between" =>
      val bounds = f.value match {
        case vs: Seq[_] if vs.size == 2 => vs
        case other => throw new IllegalArgumentException(
          s"between on '${f.field}' requires a [lo, hi] pair, got: $other")
      }
      val Seq(lo, hi) = bounds
      val n = mapper.createObjectNode()
      putValue(n, "$gte", lo); putValue(n, "$lte", hi)
      query.set(f.field, n); ()
    case "contains" =>
      query.set(f.field, opNode("$regex", quoteRegex(String.valueOf(f.value)))); ()
    case "starts_with" =>
      query.set(f.field, opNode("$regex", "^" + quoteRegex(String.valueOf(f.value)))); ()
    case "is_null"     => query.set(f.field, opNode("$eq", null)); ()
    case "is_not_null" => query.set(f.field, opNode("$ne", null)); ()
    // the reference's default branch: unknown operator → equality
    case _ => putValue(query, f.field, f.value)
  }

  def compile(c: Connector): FindCommand = {
    val query = mapper.createObjectNode()
    c.filters.foreach(compileFilter(query, _)) // per-field last-wins, like Object.assign
    val projection =
      if (c.fields.nonEmpty) {
        val p = mapper.createObjectNode()
        c.fields.foreach(p.put(_, 1))
        Some(p)
      } else None
    val sort =
      if (c.sort.nonEmpty) {
        val s = mapper.createObjectNode()
        c.sort.foreach { case Sort(field, asc) => s.put(field, if (asc) 1 else -1) }
        Some(s)
      } else None
    FindCommand(query, projection, sort,
      limit = if (c.limit > 0 && c.limit < Long.MaxValue) Some(c.limit) else None,
      skip = if (c.offset > 0) Some(c.offset) else None)
  }
}
