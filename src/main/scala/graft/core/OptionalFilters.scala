package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** The reference's flagship predicate idiom (SURVEY §2.3 F1/F2): a stack
  * of *optional* query parameters, each contributing a conjunct only when
  * present. The reference encodes this as `(:p IS NULL OR col op :p)` SQL
  * (reference `app/api/v2/queries.py:17-23`), which defeats index use /
  * pushdown. The Spark-native form builds only the defined predicates, so
  * Catalyst pushes every conjunct into the parquet scan (visible as
  * `PushedFilters` in `.explain("formatted")`).
  */
object OptionalFilters {

  /** Apply every defined predicate as a conjunct. */
  def apply(df: DataFrame, preds: Option[Column]*): DataFrame =
    preds.flatten.foldLeft(df)(_ filter _)

  /** Equality conjunct when the parameter is present. */
  def eqOpt[T](col: Column, v: Option[T]): Option[Column] = v.map(col === _)

  /** Lower-bound conjunct when present. */
  def geOpt[T](col: Column, v: Option[T]): Option[Column] = v.map(col >= _)

  /** Upper-bound conjunct when present. */
  def leOpt[T](col: Column, v: Option[T]): Option[Column] = v.map(col <= _)
}
