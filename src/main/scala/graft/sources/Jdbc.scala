package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference's stated approach is "DataFrame
  * transformations over JDBC sources", so the engine exposes the standard
  * Spark JDBC surface with the scale knobs made explicit.
  *
  * Scale design: `read` is a SINGLE-partition scan (fine for dimension
  * tables); `readPartitioned` is the fact-table path — `numPartitions`
  * concurrent range-bounded queries on an indexed numeric column, each
  * executor pulling its own slice (the JDBC equivalent of a parallel file
  * scan). Catalyst pushes filters and column pruning into the generated
  * SQL on both (`PushedFilters` in `.explain`), so a `select(a).filter(p)`
  * never drags the full table across the wire. Writes batch
  * `batchsize` rows per round trip.
  */
object Jdbc {

  /** Single-partition read — dimension-table sized inputs. */
  def read(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, p)
  }

  /** Parallel range-partitioned read: `numPartitions` queries over
    * `[lower, upper]` strides of `partCol` — the fact-table path.
    * Rows outside the bounds are still read (they land in the first/last
    * stride), so the bounds tune parallelism, never correctness.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partCol: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      props: Map[String, String] = Map.empty): DataFrame = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, p)
  }

  /** Batched JDBC write. `batchSize` rows per executeBatch round trip;
    * each write task opens one connection, so write parallelism =
    * DataFrame partitions (repartition to the pool the database can
    * absorb).
    */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.ErrorIfExists,
            batchSize: Int = 10000,
            props: Map[String, String] = Map.empty): Unit = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    // after props: the explicit parameter wins over a stray map entry
    p.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, p)
  }
}
