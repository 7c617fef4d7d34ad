package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1).
  *
  * Parquet is the primary format (S1/S2); headerless CSV with positional
  * schema matches the reference's factor-matrix exports (S5/S6); `jdbc`
  * covers the SQLite metadata databases (S4). This offline build ships no
  * SQLite JDBC driver, so the supported S4 contract is: convert each SQLite
  * table to parquet once (outside the engine) and read it with `parquet` —
  * the EDA pipeline's `SELECT * FROM songs` then behaves identically. The
  * `sqlite` method below is the online-cluster path, kept for API parity.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Headerless CSV with schema assigned by position (EDA cell 23's
    * pandas `names=` idiom).
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "false").csv(path)

  /** S4: one SQLite table via JDBC. Requires org.xerial:sqlite-jdbc on the
    * cluster classpath; not resolvable in this offline build — use the
    * parquet-converted table instead (see object scaladoc).
    */
  def sqlite(spark: SparkSession, dbPath: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", s"jdbc:sqlite:$dbPath")
      .option("dbtable", table)
      .load()

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Single-file CSV export (S6/S7) — coalesce(1) serializes the final
    * stage; only for export-sized frames (factor matrices, genre tables),
    * never for fact data.
    */
  def writeSingleCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", header.toString).csv(path)
}
