package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Line-delimited JSON (JSONL) corpus IO — the interchange format large
  * text corpora actually arrive in (one JSON document per line, sharded
  * across files), read ROBUSTLY: at 100 TB a malformed line is a
  * statistical certainty, and a reader that either crashes on it or
  * silently drops it is wrong in both directions. The contract here is
  * the same as the streaming envelope path (`Ingest.validate`,
  * `spark_consumer.py:19-25`'s parse-or-reject shape): every input line
  * lands in exactly one of {parsed row, quarantine row}, and the
  * quarantine is queryable.
  *
  * Mechanics: PERMISSIVE mode with `columnNameOfCorruptRecord` — a
  * malformed line yields a row with all schema fields null and the raw
  * line preserved in [[CorruptCol]]; [[quarantine]]/[[valid]] split the
  * frame. The schema is EXPLICIT by design: schema inference would scan
  * the corpus twice and silently widen types on dirty data.
  *
  * Scale notes, at the call site because they bite at 100 TB:
  *  - uncompressed / zstd-in-parquet-recode JSONL splits by line, so
  *    parallelism is `maxPartitionBytes`-driven like any text scan; but
  *    gzip SHARDS are each one split — a corpus of few large .json.gz
  *    files serializes the scan no matter the cluster size. Re-shard or
  *    recode first.
  *  - JSONL is the INGEST format, not the processing format: one pass to
  *    parquet ([[toParquet]]) buys columnar pruning + predicate pushdown
  *    for every later query; keeping analytics on raw JSONL re-parses
  *    every byte per query.
  */
object CorpusIO {

  /** Column holding the raw text of lines that failed to parse. */
  val CorruptCol = "_corrupt_record"

  /** Read a JSONL corpus with an explicit schema; malformed lines are
    * captured in [[CorruptCol]], never dropped and never fatal. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** The rows that parsed (quarantine column stripped). */
  def valid(df: DataFrame): DataFrame =
    df.filter(df.col(CorruptCol).isNull).drop(CorruptCol)

  /** The rejected raw lines — the side-output a pipeline monitors and
    * replays after a schema fix, mirroring `Ingest.validate`'s reject
    * frame.
    *
    * Persist the parsed frame before splitting it with [[valid]] +
    * [[quarantine]] (as [[toParquet]] does): one scan then serves both
    * sides, and Spark disallows a corrupt-record-ONLY projection pushed
    * straight down to a raw JSON scan (SPARK-21610 — the raw line is
    * only retained while some data column is also required). */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(df.col(CorruptCol).isNotNull).select(df.col(CorruptCol))

  /** Write a frame as JSONL shards (one JSON object per line; shard
    * count = partition count, so repartition first to set shard size). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a CSV corpus under the SAME parse-or-quarantine contract as
    * [[readJsonl]]: explicit schema, PERMISSIVE mode, and every line that
    * fails to parse (wrong column count, a value that won't cast to its
    * declared type) lands raw in [[CorruptCol]] instead of crashing the
    * job or vanishing.
    *
    * `multiLine` is the CSV-specific scale trap, off by default: RFC-4180
    * quoting allows embedded newlines, but honoring them forces
    * `multiLine=true`, and a multiLine CSV file CANNOT be split — each
    * file becomes one task regardless of size (same failure shape as
    * gzip JSONL shards above). A corpus whose text column carries
    * newlines should be recoded through [[writeJsonl]]/parquet instead;
    * enable `multiLine` only for small, already-sharded inputs. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header)
      .option("multiLine", multiLine)
      // match our writer (and RFC 4180): quotes escaped by doubling, not
      // backslash — Spark's reader default is backslash, a mismatch that
      // silently corrupts any field containing a quote
      .option("escape", "\"")
      .csv(path)

  /** Write CSV shards with RFC-4180 quoting (quote doubling), headers on
    * each shard. Fields containing the delimiter, quotes, or newlines are
    * quoted by the writer; reading embedded newlines back needs
    * `multiLine=true` — see the [[readCsv]] scale note. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("header", header)
      .option("escape", "\"")
      .csv(path)

  /** The one-pass ingest recode: parsed rows to parquet (the processing
    * format), quarantined raw lines to a side directory. Returns
    * (n_valid, n_quarantined) — the same counters the ingest path
    * exposes ([[Ingest]]). */
  def toParquet(spark: SparkSession, jsonlPath: String, schema: StructType,
                outPath: String): (Long, Long) = {
    val df = readJsonl(spark, jsonlPath, schema)
    // one materialization serves both writes and both counts
    df.persist()
    try {
      val good = valid(df)
      val bad = quarantine(df)
      good.write.mode("overwrite").parquet(s"$outPath/data")
      val nBad = bad.count()
      if (nBad > 0)
        bad.write.mode("overwrite").text(s"$outPath/quarantine")
      (df.count() - nBad, nBad)
    } finally { df.unpersist(); () }
  }
}
