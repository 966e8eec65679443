package graft.filter

import graft.flow.FlowSchema
import org.apache.spark.sql.Column

import Ast._

/** One entry of a `fields` list: `[src|dst] name [asc|desc]` where name is
  * an aggregable measure, a logical dimension, or a function call
  * (reference filter-parser.c:393-485 parse_field). Carries the derived
  * SQL-safe output name (non-alnum → '_', reference filter-parser.c:305-346).
  */
final case class FieldSpec(
    text: String,           // original text minus asc/desc suffix
    sqlName: String,        // SQL-safe column name
    dir: Dir,
    name: String,           // field/measure name, lowercase ("" for funcs)
    func: Option[FuncCall],
    descending: Boolean,
    isAggr: Boolean,
    scale: Long) {

  /** The Column this spec projects (key fields; aggr handled separately). */
  def column(env: FilterEnv): Column = func match {
    case Some(fn) => Compiler.funcColumn(fn, env)
    case None     => Compiler.argColumn(FieldRef(dir, name), env)
  }
}

object FieldSpec {

  /** Parse one fields entry, e.g. "octets desc", "src host",
    * "div(octets,packets) asc", "mfreq(src port,dst port)". */
  def parse(input: String,
            measures: Map[String, Long] =
              FlowSchema.measures.map(m => m.name -> m.scale).toMap,
            fieldNames: Set[String] =
              FlowSchema.logicalFields.map(_.name).toSet)
      : Either[String, FieldSpec] = {
    val trimmed = input.trim
    val lower = trimmed.toLowerCase
    val (body, desc) =
      if (lower.endsWith(" desc")) (trimmed.dropRight(5).trim, true)
      else if (lower.endsWith(" asc")) (trimmed.dropRight(4).trim, false)
      else (trimmed, false)

    val sqlName = body.map(c => if (c.isLetterOrDigit) c else '_')

    // function call?
    if (body.contains("(")) {
      // reuse the filter parser on "<func> 0" and strip the comparison
      Parser.parse(body + " 0", fieldNames ++ measures.keySet).flatMap {
        case FuncRule(fn, _) =>
          Right(FieldSpec(body, sqlName, Dir.Both, "", Some(fn), desc,
            isAggr = false, scale = 1))
        case other => Left(s"Not a function field: '$body' ($other)")
      }
    } else {
      val parts = body.split("\\s+").toSeq
      val (dir, nameParts) = parts.head.toLowerCase match {
        case "src" => (Dir.Src: Dir, parts.tail)
        case "dst" => (Dir.Dst: Dir, parts.tail)
        case _     => (Dir.Both: Dir, parts)
      }
      if (nameParts.isEmpty) Left(s"Empty field name in '$input'")
      else {
        val nm = nameParts.mkString(" ").toLowerCase
        measures.get(nm) match {
          case Some(scale) =>
            Right(FieldSpec(body, sqlName, Dir.Both, nm, None, desc,
              isAggr = true, scale = scale))
          case None if fieldNames.contains(nm) =>
            Right(FieldSpec(body, sqlName, dir, nm, None, desc,
              isAggr = false, scale = 1))
          case None => Left(s"Unknown field '$nm' in '$input'")
        }
      }
    }
  }

  def parseAll(inputs: Seq[String]): Either[String, Seq[FieldSpec]] = {
    val parsed = inputs.map(parse(_))
    parsed.collectFirst { case Left(e) => e } match {
      case Some(err) => Left(err)
      case None      => Right(parsed.collect { case Right(f) => f })
    }
  }
}
