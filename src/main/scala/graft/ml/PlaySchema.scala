package graft.ml

import org.apache.spark.sql.types._

/** Schema of the reference's play-by-play table: headerless 25-column
  * CSV (column list from reference `assets/app_nfl.py:347-375` and
  * `sklearn_deployment/main.py:36`; types per SURVEY.md §1.2 /
  * FIXTURES.md §A).
  */
object PlaySchema {

  val schema: StructType = StructType(Seq(
    StructField("Date", TimestampType),
    StructField("GameID", LongType),
    StructField("Drive", IntegerType),
    StructField("qtr", IntegerType),
    StructField("down", IntegerType),
    StructField("time", StringType),
    StructField("TimeUnder", IntegerType),
    StructField("TimeSecs", IntegerType),
    StructField("PlayTimeDiff", IntegerType),
    StructField("yrdline100", IntegerType),
    StructField("ydstogo", IntegerType),
    StructField("ydsnet", IntegerType),
    StructField("FirstDown", IntegerType),
    StructField("posteam", StringType),
    StructField("DefensiveTeam", StringType),
    StructField("Yards_Gained", IntegerType),
    StructField("Touchdown", IntegerType),
    StructField("PlayType", StringType),
    StructField("PassLength", StringType),
    StructField("PassLocation", StringType),
    StructField("RunLocation", StringType),
    StructField("PosTeamScore", IntegerType),
    StructField("DefTeamScore", IntegerType),
    StructField("month_day", IntegerType),
    StructField("PlayType_lag", StringType),
  ))

  /** The 8 numeric feature columns assembled for the GBT models
    * (reference VectorAssembler metadata,
    * `assets/static/assets/nfl_model_pass/stages/1_VectorAssembler_*`). */
  val featureCols: Seq[String] = Seq(
    "qtr", "down", "TimeSecs", "yrdline100", "ydstogo", "ydsnet",
    "month_day", "PlayType_lag_index")

  val labelCol: String = "Yards_Gained"

  /** 32 NFL team codes (reference `assets/app_nfl.py:34`). */
  val teams: Seq[String] = Seq(
    "ARI", "ATL", "BAL", "BUF", "CAR", "CHI", "CIN", "CLE", "DAL", "DEN",
    "DET", "GB", "HOU", "IND", "JAC", "KC", "LA", "MIA", "MIN", "NE",
    "NO", "NYG", "NYJ", "OAK", "PHI", "PIT", "SD", "SEA", "SF", "TB",
    "TEN", "WAS")
}
