package graft.cypher

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Ast.Lit

/** `date.convert_format(temporal, current_format, convert_to)`
  * (reference `query_modules/date.py:171` DateFormatUtil): conversion
  * between the named ISO formats as pure Column expressions. The wall
  * time is preserved exactly like the python implementation (an offset
  * is carried as TEXT alongside the wall clock, never applied to it);
  * zone names in `[...]` are stripped on parse; converting to an
  * `iso_offset_*` format without an input offset raises; converting to
  * the zoned/date_time formats attaches `+00:00` to naive inputs.
  * Fractional seconds are dropped (the python keeps up to 6 digits —
  * divergence documented here; the reference's own tests don't exercise
  * them). Format names must be literals — they select the parse/format
  * PATTERN at plan time. */
private[graft] object DateConvert {

  val formatNames: Seq[String] = Seq(
    "basic_iso_date", "iso_local_date", "iso_offset_date", "iso_date",
    "iso_local_time", "iso_offset_time", "iso_time",
    "iso_local_date_time", "iso_offset_date_time", "iso_zoned_date_time",
    "iso_date_time")

  private def litName(e: Option[Ast.Expr], what: String): String = e match {
    case Some(Lit(s: String)) =>
      val l = s.toLowerCase
      if (!formatNames.contains(l))
        throw new IllegalArgumentException(s"Unsupported date format: $s")
      l
    case _ => throw new IllegalArgumentException(
      s"date.convert_format: $what must be a literal format name " +
        s"(one of ${formatNames.mkString(", ")})")
  }

  private val OffsetRe = "([+-]\\d{2}:\\d{2}|[+-]\\d{4}|Z)$"

  def convertFormat(
      c0: Column, cur0: Option[Ast.Expr], to0: Option[Ast.Expr]): Column = {
    val cur = litName(cur0, "current_format")
    val to = litName(to0, "convert_to")
    val c = c0.cast("string")
    val blank = c.isNull || trim(c) === ""
    val noZone = regexp_replace(c, "\\[[^\\]]*\\]$", "")
    val offset = regexp_extract(noZone, OffsetRe, 1)
    val wall = regexp_replace(
      regexp_replace(noZone, OffsetRe, ""), "\\.\\d+", "")
    val hasOff = offset =!= ""
    val offNorm = when(offset === "Z", lit("+00:00"))
      .otherwise(
        regexp_replace(offset, "^([+-]\\d{2}):?(\\d{2})$", "$1:$2"))
    val parsePat = cur match {
      case "basic_iso_date" => "yyyyMMdd"
      case "iso_local_date" | "iso_date" | "iso_offset_date" => "yyyy-MM-dd"
      case "iso_local_time" | "iso_time" | "iso_offset_time" => "HH:mm:ss"
      case _ => "yyyy-MM-dd'T'HH:mm:ss"
    }
    val ts = to_timestamp(wall, parsePat)
    def needOff(out: Column): Column =
      when(hasOff, out).otherwise(raise_error(concat(
        lit("Error converting '"), c,
        lit(s"' from '$cur' to '$to': missing timezone"))))
    val out: Column = to match {
      case "basic_iso_date" => date_format(ts, "yyyyMMdd")
      case "iso_local_date" => date_format(ts, "yyyy-MM-dd")
      case "iso_offset_date" =>
        needOff(concat(date_format(ts, "yyyy-MM-dd"), offNorm))
      case "iso_date" =>
        when(hasOff, concat(date_format(ts, "yyyy-MM-dd"), offNorm))
          .otherwise(date_format(ts, "yyyy-MM-dd"))
      case "iso_local_time" => date_format(ts, "HH:mm:ss")
      case "iso_offset_time" =>
        needOff(concat(date_format(ts, "HH:mm:ss"), offNorm))
      case "iso_time" =>
        when(hasOff, concat(date_format(ts, "HH:mm:ss"), offNorm))
          .otherwise(date_format(ts, "HH:mm:ss"))
      case "iso_local_date_time" =>
        date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
      case "iso_offset_date_time" =>
        needOff(concat(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), offNorm))
      case _ => // iso_zoned_date_time / iso_date_time: naive gets UTC
        concat(
          date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
          when(hasOff, offNorm).otherwise(lit("+00:00")))
    }
    when(blank, lit(null).cast("string")).otherwise(out)
  }
}
