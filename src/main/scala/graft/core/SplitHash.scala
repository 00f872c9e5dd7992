package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE train/val/test hash-split rule (80/10/10 over the first 8 hex
  * digits of md5("split:" + id)) — the single source of truth shared by
  * the split itself (`ta_split`) and every audit that reasons about it
  * (`ta_split_ks`, `dedup_split_leakage`). Both the Column form and the
  * DuckDB CASE form live here so a change to the rule (fractions, salt,
  * hash width) cannot leave an audit silently checking a different
  * split than the one in production. */
object SplitHash {

  /** Pure projection: the split label of an id column. */
  def splitCol(id: Column): Column = {
    val h = substring(
      md5(encode(concat(lit("split:"), id.cast("string")), "UTF-8")), 1, 8)
    val frac = conv(h, 16, 10).cast("long").cast("double") / lit(4294967296.0)
    when(frac < 0.8, "train").when(frac < 0.9, "val").otherwise("test")
  }

  /** The same rule as a DuckDB CASE expression over `idCol`. */
  def splitSql(idCol: String): String =
    s"""CASE WHEN CAST(concat('0x',
       |      substr(md5('split:' || CAST($idCol AS VARCHAR)), 1, 8))
       |      AS BIGINT) / 4294967296.0 < 0.8 THEN 'train'
       |     WHEN CAST(concat('0x',
       |      substr(md5('split:' || CAST($idCol AS VARCHAR)), 1, 8))
       |      AS BIGINT) / 4294967296.0 < 0.9 THEN 'val'
       |     ELSE 'test' END""".stripMargin.replaceAll("\n", " ")
}
