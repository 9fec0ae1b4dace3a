package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (and the training-data
  * extras) is exposed as a named query over /root/testdata parquet,
  * with a DuckDB oracle where the semantics are SQL-expressible.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    StreamOps.defs ++ Relational.defs ++ TemporalOps.defs ++ TextOps.defs ++
      PipelineOps.defs ++ VectorOps.defs ++ AnalyticsOps.defs ++
      CurationOps.defs ++ CorpusOps.defs ++ EngineOps.defs ++ EngineDemos.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("r1_check_tail")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.toQueryMap(allDefs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryDef.toOracleMap(allDefs)
}
