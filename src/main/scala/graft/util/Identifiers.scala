package graft.util

import java.text.Normalizer
import scala.collection.mutable

/** Deterministic identifier normalizer (pure, driver-side).
  *
  * Semantics derived from the reference's column-name cleaning convention
  * (see /root/reference Proceso_Airflow/dags/notebooks/bronze_processor.py:108-150
  * and bronze_full_load.ipynb:cell 25): NFKD accent stripping, forbidden-char
  * replacement, lowercase, digit-prefix guard, SQL-reserved-word suffix,
  * truncation, and per-table collision dedup with `_2`, `_3`… suffixes.
  * Re-implemented from scratch on the JDK (`java.text.Normalizer`).
  */
object Identifiers {

  /** SQL reserved words that get a `_col` suffix (e.g. `Group` -> `group_col`). */
  val ReservedWords: Set[String] = Set(
    "all", "alter", "and", "any", "as", "asc", "between", "by", "case",
    "cast", "check", "column", "constraint", "create", "cross", "current",
    "date", "default", "delete", "desc", "distinct", "drop", "else", "end",
    "except", "exists", "false", "foreign", "from", "full", "grant", "group",
    "having", "in", "index", "inner", "insert", "intersect", "into", "is",
    "join", "key", "left", "like", "limit", "not", "null", "offset", "on",
    "or", "order", "outer", "primary", "references", "right", "select",
    "table", "then", "time", "timestamp", "true", "union", "update", "user",
    "when", "where")

  /** Normalize one raw identifier. Pure and total: never returns an empty or
    * invalid name. `maxLen` mirrors the target catalog's identifier limit. */
  def clean(raw: String, maxLen: Int = 128): String = {
    // NFKD + drop combining marks == accent strip ("Región" -> "Region")
    val noAccents = Normalizer.normalize(raw, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}+", "")
    var s = noAccents
      .replaceAll("[ ,;{}()\\n\\t=]+", "_") // structural separators -> _
      .replaceAll("[.\\-/\\\\]+", "_")      // path-ish punctuation -> _
      .replaceAll("[^A-Za-z0-9_]", "")      // anything else dropped
      .replaceAll("_+", "_")                // collapse runs
      .stripPrefix("_").stripSuffix("_")
      .toLowerCase
    if (s.isEmpty) s = "col"
    if (s.head.isDigit) s = "c_" + s
    if (ReservedWords.contains(s)) s = s + "_col"
    s.take(maxLen)
  }

  /** Normalize a full column list with collision dedup: second occurrence of
    * a cleaned name becomes `name_2`, third `name_3`, … (order-stable). */
  def cleanAll(names: Seq[String], maxLen: Int = 128): Seq[String] = {
    val seen = mutable.HashMap.empty[String, Int]
    names.map { n =>
      val c = clean(n, maxLen)
      val k = seen.getOrElse(c, 0)
      seen.update(c, k + 1)
      if (k == 0) c else s"${c}_${k + 1}"
    }
  }
}
