package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Physical-name → Column helpers. */
object Cols {

  /** A physical column name as a single-identifier Column.
    *
    * `col(name)` PARSES its argument — a column literally named
    * "a.b" becomes struct-field access on `a` — so any code path
    * that turns a PHYSICAL schema field name (from a StructType or
    * `df.columns`) into a Column must quote it as one identifier;
    * backticks inside the name escape by doubling, the standard SQL
    * identifier convention.
    */
  def quoted(name: String): Column = col(s"`${name.replace("`", "``")}`")
}
