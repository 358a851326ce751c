package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CurationQueries, DedupQueries, GQuery, JoinQueries, LayoutQueries, MultimodalQueries, Parity, SimilarityQueries, StreamReplayQueries, TemporalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the north-star extensions) is
  * registered here as a named batch query; entries with a DuckDB oracle
  * participate in the driver's hash-compare, the rest get rows-only checks.
  */
object SparkEntry {

  /** Full registry, one GQuery per implemented operator. */
  def registry: Seq[GQuery] =
    Parity.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ JoinQueries.queries ++
      MultimodalQueries.queries ++ StreamReplayQueries.queries ++
      TemporalQueries.queries ++ CurationQueries.queries ++
      LayoutQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Parity.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap

  /** Queries whose oracle pins structure (rows/schema/order) rather than
    * values — the hash column is expected red by design. EMPTY since
    * round 11 (`dedup_simhash`, the last member, became a full hash gate
    * when its batch default switched to the engine-neutral md5-prefix
    * token hash). Kept as the mechanical source for COVERAGE.md's
    * "0 structural oracles" claim (CoverageAuditSpec gates it): any
    * future structural exception must be declared here to be counted. */
  def structuralOracles: Set[String] = Set.empty
}
