package graft.query

import graft.bson._

import scala.collection.immutable.ListMap

/** Templated update DSL: JSON query/update templates with `$name`
  * placeholders bound per record — the behavioral surface of the
  * reference's JSONPigReplace engine (pig/.../JSONPigReplace.java:93-199)
  * and MongoUpdateStorage (pig/.../MongoUpdateStorage.java:111-167),
  * reimplemented over the BSON ADT.
  *
  * Example: template `{"$set": {"bc10Year": "$avg"}}` with a row
  * `{avg: 4.25}` binds to `{"$set": {"bc10Year": 4.25}}`.
  */
object UpdateDsl {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  /** Parse a template once; bind per row. */
  final case class Template(ast: JValue) {
    def bind(row: BDoc): BDoc = toDoc(ast, row) match {
      case d: BDoc => d
      case other => throw new IllegalArgumentException(s"template is not a document: $other")
    }
  }

  def parse(template: String): Template = Template(JsonMethods.parse(template))

  private def toDoc(j: JValue, row: BDoc): BsonValue = j match {
    case JObject(fields) =>
      BDoc(ListMap(fields.map { case (k, v) => k -> toDoc(v, row) }: _*))
    case JArray(items) => BArray(items.map(toDoc(_, row)).toVector)
    case JString(s) if s.startsWith("$") && s.length > 1 && !s.startsWith("$$") =>
      // placeholder: bound from the row (dotted paths allowed)
      row.getPath(s.drop(1)).getOrElse(
        throw new IllegalArgumentException(s"no field '${s.drop(1)}' to bind $s"))
    case JString(s) if s.startsWith("$$") => BString(s.drop(1)) // escaped literal $
    case JString(s) => BString(s)
    case JInt(x) if x.isValidInt => BInt32(x.toInt)
    case JInt(x) => BInt64(x.toLong)
    case JLong(x) => BInt64(x)
    case JDouble(x) => BDouble(x)
    case JDecimal(x) => BDouble(x.toDouble)
    case JBool(b) => BBool(b)
    case JNull => BNull
    case other => throw new IllegalArgumentException(s"unsupported template node $other")
  }

  /** Build an [[UpdateModel]] from bound query/update templates. */
  def model(queryTemplate: Template, updateTemplate: Template, row: BDoc,
      upsert: Boolean, multi: Boolean): UpdateModel = {
    val q = queryTemplate.bind(row)
    val query = q.fields.foldLeft[BQuery](BQuery.True) {
      case (acc, (k, v)) => BQuery.and(acc, BQuery.Eq(k, v))
    }
    UpdateModel(query, updateTemplate.bind(row), upsert = upsert, multi = multi)
  }
}
