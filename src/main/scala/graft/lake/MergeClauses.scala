package graft.lake

import org.apache.spark.sql.Column

/** Clause forms for [[ManifestTable.mergeInto]] — the general
  * `MERGE INTO` shape (SURVEY §2.9 L1; the SQL statement surface in
  * [[graft.sql.GraftDmlRules]] lowers Spark's parsed MERGE plan onto
  * these). Conditions are optional (`None` = always applies); clauses
  * evaluate first-match-wins per row, like the SQL standard.
  */
sealed trait MergeMatchedClause {
  def condition: Option[Column]
}

/** `WHEN [NOT] MATCHED [BY SOURCE] [AND cond] THEN UPDATE SET ...`.
  * `set` maps target column name → new-value expression; expressions
  * see the OLD row (all assignments evaluate simultaneously, ANSI
  * UPDATE semantics) and, for matched clauses, the matching source
  * row's columns. Unassigned columns keep their value.
  */
final case class MergeUpdateClause(condition: Option[Column],
    set: Map[String, Column]) extends MergeMatchedClause

/** `WHEN [NOT] MATCHED [BY SOURCE] [AND cond] THEN DELETE`. */
final case class MergeDeleteClause(condition: Option[Column])
    extends MergeMatchedClause

/** `WHEN NOT MATCHED [AND cond] THEN INSERT (...) VALUES (...)`.
  * `values` maps target column name → expression over the source row;
  * unassigned target columns insert as NULL.
  */
final case class MergeInsertClause(condition: Option[Column],
    values: Map[String, Column])
