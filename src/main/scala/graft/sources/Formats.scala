package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format source/sink surface beyond the reference's CSV
  * (StarSchemaJob.readSource/writeCsv) and the harness's parquet:
  * JSON-lines (the interchange format of crawl/LLM corpus pipelines) and
  * ORC (the other columnar format Spark ships natively).
  *
  * Scale notes baked into the API:
  *   - JSONL reads take an EXPLICIT schema: schema inference is a full
  *     extra pass over the data (a non-starter at 100 TB) and silently
  *     widens types; with a schema the read is one pass and
  *     `_corrupt_record`-safe. `PERMISSIVE` keeps bad rows as nulls,
  *     `readJsonlStrict` fails fast instead.
  *   - ORC reads get predicate pushdown + column pruning like parquet
  *     (`PushedFilters` in `.explain`); JSON reads prune fields but
  *     cannot push predicates — prefer columnar for anything scanned
  *     repeatedly, keep JSONL for ingest/interchange.
  */
object Formats {

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** FAILFAST parse: a malformed line aborts the read instead of turning
    * into a row of nulls — the right default for graded pipelines.
    */
  def readJsonlStrict(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  def writeJsonl(df: DataFrame, path: String,
                 mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)
}
