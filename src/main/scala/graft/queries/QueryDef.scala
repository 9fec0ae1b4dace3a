package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded operator query: the Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle over the same parquet
  * tables. Column names/order must match between the two — the driver
  * sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def toQueryMap(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  def toOracleMap(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
