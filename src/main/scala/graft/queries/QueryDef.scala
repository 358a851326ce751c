package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query.
  *
  * @param name   stable key (drives CORRECTNESS_r{N}.json per-query rows)
  * @param run    (spark, sfDir) => result. MUST be deterministic: every
  *               query ends with a total ORDER BY so the driver's
  *               hash-compare sees identical row order from both engines.
  * @param oracle equivalent DuckDB SQL over the same parquet tables, with
  *               identical column NAMES and TYPES (aggregates cast to
  *               BIGINT/DOUBLE/VARCHAR explicitly — DuckDB's default
  *               HUGEINT/DECIMAL results would hash-mismatch). None for
  *               non-SQL-expressible ops → driver records rows-only check.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  /** Numeric-stability contract used across all queries:
    * money/measure doubles are cast to DECIMAL(18,4) BEFORE summing (exact,
    * order-independent arithmetic in both engines), and the final aggregate
    * is cast back to DOUBLE — so Spark and DuckDB produce bit-identical
    * doubles regardless of execution order / parallelism. */
  val decimalNote: String = "sum(CAST(x AS DECIMAL(18,4))) :: DOUBLE"
}
