package graft.result

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.Render

/** W3C SPARQL-Results-JSON serializer (reference
  * `src/to_json_result.rs:8-103`): `{"head":{"vars":[…]},
  * "results":{"bindings":[{var:{"type":…,"value":…,"xml:lang"?,
  * "datatype"?}}…]}}`; unbound/Null cells are omitted from their
  * binding; ASK renders `{"head":{"vars":[]},"boolean":…}`.
  *
  * The rendering happens distributed (type/value/lang/datatype computed
  * as Column expressions); only the final JSON assembly collects — the
  * sink is for protocol responses, which are bounded result sets
  * (`src/server.rs:114-118`).
  */
object JsonResults {

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Serialize a term-column result (from [[graft.sparql.Sparql.query]]). */
  def toJson(df: DataFrame, limit: Int = 1000000): String = {
    if (df.columns.sameElements(Array("boolean"))) {
      val b = df.head().getBoolean(0)
      return s"""{"head":{"vars":[]},"boolean":$b}"""
    }
    val vars = df.columns.toSeq
    // render per-variable fields distributed, collect only strings
    val rendered = df.select(vars.flatMap { v =>
      val t = col(v)
      Seq(
        Render.rdfType(t).as(s"${v}__type"),
        Render.lex(t).as(s"${v}__value"),
        Render.langTag(t).as(s"${v}__lang"),
        Render.datatype(t).as(s"${v}__dt"),
        (t.isNull || t.getField("kind") === "null").as(s"${v}__null"))
    }: _*)
    val rows = rendered.limit(limit).collect()
    val bindings = rows.map { row =>
      val fields = vars.zipWithIndex.flatMap { case (v, i) =>
        val base = i * 5
        val isNull = row.getBoolean(base + 4)
        if (isNull) None
        else {
          val sb = new StringBuilder
          sb.append('"').append(esc(v)).append("\":{\"type\":\"")
            .append(row.getString(base)).append("\",\"value\":\"")
            .append(esc(Option(row.getString(base + 1)).getOrElse("")))
            .append('"')
          Option(row.getString(base + 2)).foreach(l => sb.append(",\"xml:lang\":\"").append(esc(l)).append('"'))
          Option(row.getString(base + 3)).foreach(d => sb.append(",\"datatype\":\"").append(esc(d)).append('"'))
          sb.append('}')
          Some(sb.toString)
        }
      }
      fields.mkString("{", ",", "}")
    }
    val head = vars.map(v => "\"" + esc(v) + "\"").mkString("[", ",", "]")
    s"""{"head":{"vars":$head},"results":{"bindings":${bindings.mkString("[", ",", "]")}}}"""
  }
}
