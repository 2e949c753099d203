package graft.ml

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingestion + feature engineering for the play-by-play data.
  *
  * Derivations mirror the reference's semantics but are computed
  * declaratively so Catalyst can prune/push them down:
  *  - `month_day` = MM*100 + DD (reference builds it by string concat,
  *    `assets/app_nfl.py:263`; arithmetic over date parts is
  *    equivalent and codegen-friendly).
  *  - `PlayType_lag` = previous play's PlayType within (GameID, Drive)
  *    ordered by descending TimeSecs (clock counts down), defaulting
  *    to "FirstPlay" at drive start (column semantics per SURVEY.md
  *    §2.2 "Implied lag"; reference ships it precomputed in the CSV).
  *
  * Scale: the lag window shuffles once on (GameID, Drive) — the
  * natural partitioning for play-by-play data; every other derivation
  * is row-local.
  */
object PlayFeatures {

  /** Read a headerless `nfldata2.csv`-shaped file with the explicit
    * 25-column schema. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(PlaySchema.schema)
      .option("header", "false")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSX")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** month_day from the Date column: MM*100 + DD. */
  def withMonthDay(df: DataFrame): DataFrame =
    df.withColumn("month_day_derived",
      (month(col("Date")) * 100 + dayofmonth(col("Date"))).cast("int"))

  /** PlayType_lag from PlayType: lag(1) over (GameID, Drive) ordered by
    * TimeSecs descending (play order within a drive), "FirstPlay" when
    * there is no previous play. */
  def withPlayTypeLag(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("GameID"), col("Drive"))
      .orderBy(col("TimeSecs").desc)
    df.withColumn("PlayType_lag_derived",
      coalesce(lag(col("PlayType"), 1).over(w), lit("FirstPlay")))
  }

  /** Full feature derivation from raw columns (ignores the
    * pre-computed month_day / PlayType_lag in the CSV). */
  def derive(df: DataFrame): DataFrame =
    withPlayTypeLag(withMonthDay(df))
      .drop("month_day", "PlayType_lag")
      .withColumnRenamed("month_day_derived", "month_day")
      .withColumnRenamed("PlayType_lag_derived", "PlayType_lag")
}
