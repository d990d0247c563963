package graft.mql

import graft.model.Meta

/** Projection-spec normalization (reference: metrique/parse.py:37-71
  * `parse_fields`, tested in the reference's test_parse.py:22-51).
  *
  * Accepts a csv string, a list of names, or the all-fields markers
  * (`"~"` / null / true). Output is normalized (lowercased, trimmed),
  * deduped, and sorted; `Nil` means "all fields".
  */
object Fields {

  /** Parse a csv field spec; returns Nil for "all fields". */
  def parseFields(spec: String): Seq[String] = spec match {
    case null | "" | "~" => Nil
    case s =>
      normalize(s.split(",").toSeq)
  }

  def parseFields(spec: Seq[String]): Seq[String] =
    if (spec == null || spec.isEmpty) Nil else normalize(spec)

  private def normalize(names: Seq[String]): Seq[String] =
    names.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct.sorted

  /** Append the always-present meta fields to a non-empty projection
    * (reference: sqlalchemy.py:264-273 `_apply_default_fields`).
    */
  def applyDefaultFields(fields: Seq[String]): Seq[String] =
    if (fields.isEmpty) fields
    else (fields ++ Seq(Meta.START, Meta.END, Meta.OID)).distinct
}
