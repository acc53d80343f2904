package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.model.Transformation

/** The reference's scalar transform library re-expressed as Spark Column
  * expressions (reference: src/utils/transform.ts:14-181; SURVEY §2.3
  * T1-T12). Each op adds/overwrites one column; ops apply sequentially in
  * declaration order (reference transform.ts:14-17). Everything here stays
  * inside whole-stage codegen — no UDFs — so the per-row JS loop of the
  * reference becomes a single generated projection.
  *
  * JS-fidelity notes (SURVEY §7.4) are encoded per-op below and pinned by
  * golden vectors in TransformsSpec (ported from tests/transform.test.ts).
  */
object Transforms {

  /** JS `String(v)` with null→'' — the reference's usual null handling
    * (e.g. transform.ts:47 `value ? String(value) : ''`).
    */
  private def jsString(c: Column): Column = coalesce(c.cast(StringType), lit(""))

  /** JS falsy test for concat's `filter(Boolean)` (transform.ts:24):
    * null/undefined, '', 0, NaN, false are all dropped.
    */
  private def falsyToNull(c: Column): Column = {
    val s = c.cast(StringType)
    when(
      c.isNull || s === "" || s === "0" || s === "0.0" ||
        s === "false" || s === "NaN",
      lit(null).cast(StringType)
    ).otherwise(s)
  }

  /** T10 `toNumber` — JS `parseFloat(String(v)) || 0`: prefix-parse
    * ("12abc"→12, "abc"→0, ""→0), and `|| 0` also maps NaN and 0 to 0
    * (transform.ts:127-137). regexp prefix-extract + cast reproduces it
    * without leaving codegen.
    */
  def toNumber(c: Column): Column = {
    // leading-whitespace class matches JS trim: space \t \n \r \f \v
    val prefix = regexp_extract(
      c.cast(StringType),
      "^[ \\t\\n\\r\\f\\x0B]*([-+]?(?:[0-9]+\\.?[0-9]*(?:[eE][-+]?[0-9]+)?|\\.[0-9]+(?:[eE][-+]?[0-9]+)?))",
      1
    )
    val parsed = coalesce(when(prefix === "", lit(0.0)).otherwise(prefix.cast("double")), lit(0.0))
    // `|| 0` collapses -0 to +0 in JS; match the native JsToNumber expr
    when(parsed === 0.0, lit(0.0)).otherwise(parsed)
  }

  /** T1 `concat` — join with glue, skipping falsy values (transform.ts:18-29). */
  def concatT(properties: Seq[String], glue: String): Column =
    concat_ws(glue, properties.map(p => falsyToNull(col(p))): _*)

  /** T11 `extract` — regex: group 1 else whole match, no match → '';
    * slice mode: JS slice [start,end) (transform.ts:139-155).
    */
  def extractT(c: Column, pattern: Option[String], start: Int, end: Int): Column =
    pattern match {
      case Some(p) =>
        // JS `match[1] ?? match[0]`: group-count is known at plan time, so
        // resolve the fallback here instead of per-row (Spark rejects a
        // group index beyond the pattern's group count).
        val nGroups = java.util.regex.Pattern.compile(p).matcher("").groupCount()
        if (nGroups == 0) regexp_extract(jsString(c), p, 0)
        else {
          val g1 = regexp_extract(jsString(c), p, 1)
          val g0 = regexp_extract(jsString(c), p, 0)
          when(g1 =!= "", g1).otherwise(g0)
        }
      case None =>
        val s = jsString(c)
        val from = start + 1 // Spark substring is 1-based
        val len = math.max(0, (if (end == Int.MaxValue) Int.MaxValue - 1 else end) - start)
        substring(s, from, len)
    }

  /** Compile one Transformation to a (DataFrame => DataFrame) stage. */
  def compile(t: Transformation): DataFrame => DataFrame = {
    val target = Option(t.to).getOrElse(t.field)
    t.`type` match {
      case "concat" =>
        df => df.withColumn(Option(t.to).getOrElse("concat"), concatT(t.properties, t.glue))
      case "renameKey" =>
        // dotted-path copy, original kept (transform.ts:31-41)
        df => df.withColumn(t.to, col(t.field))
      case "uppercase" => df => df.withColumn(target, upper(jsString(col(t.field))))
      case "lowercase" => df => df.withColumn(target, lower(jsString(col(t.field))))
      case "trim"      => df => df.withColumn(target, trim(jsString(col(t.field))))
      case "split" =>
        // JS splits on the literal delimiter; Spark split takes a regex →
        // quote it (transform.ts:79-89; SURVEY §2.3 T6).
        df => df.withColumn(target, split(jsString(col(t.field)), java.util.regex.Pattern.quote(t.delimiter)))
      case "replace" =>
        // JS `new RegExp(search, 'g')` — global regex replace (transform.ts:91-101)
        df => df.withColumn(target, regexp_replace(jsString(col(t.field)), t.search, t.replace))
      case "addPrefix" =>
        df => df.withColumn(target, concat(lit(t.prefix), jsString(col(t.field))))
      case "addSuffix" =>
        df => df.withColumn(target, concat(jsString(col(t.field)), lit(t.suffix)))
      case "toNumber" => df => df.withColumn(target, toNumber(col(t.field)))
      case "extract" =>
        df => df.withColumn(target, extractT(col(t.field), Option(t.pattern), t.start, t.end))
      case "mergeObjects" =>
        // struct of listed fields (transform.ts:157-172); JS drops absent
        // keys dynamically — Spark schema is static, absent => null
        // (accepted divergence, SURVEY §2.3 T12).
        df => df.withColumn(t.to, struct(t.fields.map(col): _*))
      case other =>
        // reference warns and skips unknown types (transform.ts:174-176)
        df => { System.err.println(s"[transform] unknown type '$other' — skipped"); df }
    }
  }

  /** Sequential fold in declaration order (transform.ts:14-17). */
  def applyAll(df: DataFrame, ts: Seq[Transformation]): DataFrame =
    ts.foldLeft(df)((d, t) => compile(t)(d))
}
