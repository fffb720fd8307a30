package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CitySpec extends SparkSpec {
  import spark.implicits._

  // Reference AQI oracle, transcribed from the EPA piecewise-linear
  // breakpoints (air_quality_simulator.py:95-117): int() truncation.
  private def refAqi(pm25: Double): (Int, String) =
    if (pm25 <= 12.0) (((50.0 / 12.0) * pm25).toInt, "Good")
    else if (pm25 <= 35.4) ((50 + (50.0 / 23.4) * (pm25 - 12.0)).toInt, "Moderate")
    else if (pm25 <= 55.4) ((100 + (50.0 / 20.0) * (pm25 - 35.4)).toInt, "Unhealthy for Sensitive Groups")
    else if (pm25 <= 150.4) ((150 + (50.0 / 95.0) * (pm25 - 55.4)).toInt, "Unhealthy")
    else if (pm25 <= 250.4) ((200 + (100.0 / 100.0) * (pm25 - 150.4)).toInt, "Very Unhealthy")
    else ((300 + (200.0 / 249.6) * math.min(pm25 - 250.4, 249.6)).toInt, "Hazardous")

  test("AQI matches reference at all breakpoints and interior points") {
    val pts = Seq(0.0, 5.0, 11.9, 12.0, 12.1, 20.0, 35.4, 35.5, 50.0, 55.4,
      55.5, 100.0, 150.4, 150.5, 200.0, 250.4, 250.5, 260.0, 400.0, 500.0, 600.0)
    val got = pts.toDF("pm25")
      .select($"pm25", City.aqiValue($"pm25").as("aqi"), City.aqiCategory($"pm25").as("cat"))
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getString(2)))
    got.foreach { case (pm, aqi, cat) =>
      val (ea, ec) = refAqi(pm)
      assert(aqi == ea, s"aqi($pm): got $aqi want $ea")
      assert(cat == ec, s"cat($pm): got $cat want $ec")
    }
  }

  test("AQI null in, null out; Hazardous cap at 500") {
    val df = Seq[Option[Double]](None, Some(1e9)).toDF("pm25")
      .select(City.aqiValue($"pm25"), City.aqiCategory($"pm25")).collect()
    assert(df(0).isNullAt(0) && df(0).isNullAt(1))
    assert(df(1).getInt(0) == 500 && df(1).getString(1) == "Hazardous")
  }

  test("SQL-surface functions equal the Column forms across the sweep (U4)") {
    City.registerSqlFunctions(spark)
    val pts = Seq(0.0, 11.9, 12.0, 12.1, 35.4, 55.4, 150.4, 250.4, 250.5, 600.0)
    pts.toDF("pm25").createOrReplaceTempView("city_spec_pm")
    val sql = spark.sql(
      """SELECT pm25, aqi_value(pm25) AS a, aqi_category(pm25) AS c,
                congestion_occupancy(pm25 / 600.0) AS g,
                parking_status(pm25 / 600.0) AS p,
                dynamic_price(2.5, pm25 / 600.0) AS d
         FROM city_spec_pm ORDER BY pm25""").collect()
    val colForm = pts.toDF("pm25")
      .select($"pm25", City.aqiValue($"pm25"), City.aqiCategory($"pm25"),
        City.congestionOccupancy($"pm25" / 600.0),
        City.parkingStatus($"pm25" / 600.0),
        City.dynamicPrice(lit(2.5), $"pm25" / 600.0))
      .orderBy("pm25").collect()
    sql.zip(colForm).foreach { case (s, c) =>
      assert(s.toSeq == c.toSeq, s"SQL vs Column mismatch at pm25=${s.get(0)}")
    }
    // NULL in → NULL out through the SQL surface too
    val nullRow = spark.sql("SELECT aqi_value(CAST(NULL AS DOUBLE)) AS a").collect().head
    assert(nullRow.isNullAt(0))
  }

  test("system-topic filter and occupancy-rate aggregate (P6/A10)") {
    val topics = Seq("$SYS/broker/load", "air_quality/AQ_1/data", "$SYSTEM_X")
      .toDF("t")
    val sys_ = topics.filter(City.isSystemTopic($"t")).collect().map(_.getString(0))
    assert(sys_.toSeq == Seq("$SYS/broker/load")) // prefix match, not substring
    val spots = Seq(true, true, true, false).map(Tuple1(_)).toDF("occupied")
    val rate = spots.agg(City.occupancyRate($"occupied")).collect().head.getDouble(0)
    assert(rate == 0.75)
  }

  test("congestion two-factor vs occupancy-only diverge as in reference") {
    val rows = Seq(
      (0.9, 100.0, "high", "high"),   // occupancy forces high in both
      (0.3, 15.0, "high", "low"),     // slow speed: high only for 2-factor
      (0.6, 100.0, "medium", "medium"),
      (0.3, 35.0, "medium", "low"),
      (0.3, 80.0, "low", "low"))
    val got = rows.map(r => (r._1, r._2)).toDF("occ", "speed")
      .select(City.congestionTwoFactor($"occ", $"speed"), City.congestionOccupancy($"occ"))
      .collect()
    rows.zip(got).foreach { case ((o, s, e2, e1), r) =>
      assert(r.getString(0) == e2, s"twoFactor($o,$s)")
      assert(r.getString(1) == e1, s"occupancy($o)")
    }
  }

  test("parking status exact cutoffs and dynamic price rounding") {
    val rows = Seq((0.95, "full"), (0.949, "high"), (0.80, "high"),
      (0.799, "medium"), (0.50, "medium"), (0.499, "low"), (0.0, "low"))
    val got = rows.map(_._1).toDF("rate")
      .select(City.parkingStatus($"rate"), City.dynamicPrice(lit(2.0), $"rate"))
      .collect()
    rows.zip(got).foreach { case ((rate, exp), r) =>
      assert(r.getString(0) == exp, s"status($rate)")
      assert(r.getDouble(1) == math.rint(2.0 * (1 + rate * 0.5) * 100) / 100, s"price($rate)")
    }
  }

  test("ISO parse handles Z, naive, micros; falls back for garbage") {
    val fb = to_timestamp(lit("1999-01-01 00:00:00"))
    val got = Seq("2026-01-11T14:05:30.123456", "2026-01-11T14:05:30Z", "not-a-ts")
      .toDF("s").select(City.parseIsoTs($"s", fb).cast("string")).collect().map(_.getString(0))
    assert(got(0) == "2026-01-11 14:05:30.123456")
    assert(got(1) == "2026-01-11 14:05:30")
    assert(got(2) == "1999-01-01 00:00:00")
  }

  test("partition cols are zero-padded event-time keys") {
    val got = Seq("2026-03-05T04:09:30").toDF("s")
      .select(City.partitionCols(to_timestamp($"s")): _*).collect().head
    assert(got.toSeq == Seq("2026", "03", "05", "04"))
  }

  test("topic routing: first-match prefix with raw-data default") {
    val cases = Seq(
      "air_quality/AQ_LUX_001/data" -> "smart-city-air-quality",
      "parking/PARK_LUX_001/status" -> "smart-city-parking",
      "traffic/sumo/edges/e1" -> "smart-city-traffic-edges",
      "traffic/sumo/vehicles/v1" -> "smart-city-traffic-vehicles",
      "traffic/sumo/traffic_lights/t1" -> "smart-city-traffic-lights",
      "traffic/sumo/simulation" -> "smart-city-simulation-stats",
      "unknown/topic" -> "smart-city-raw-data")
    val got = cases.map(_._1).toDF("t").select(City.routeTopic($"t")).collect()
    cases.zip(got).foreach { case ((t, exp), r) => assert(r.getString(0) == exp, t) }
  }

  test("device key coalesce falls back to last topic segment") {
    val df = Seq(
      (Some("S1"), None: Option[String], "a/b/c"),
      (None, Some("P1"), "a/b/c"),
      (None, None, "air_quality/AQ1/data")).toDF("sensor_id", "parking_lot_id", "topic")
    val got = df.select(City.deviceKey($"topic", $"sensor_id", $"parking_lot_id",
      lit(null), lit(null), lit(null))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("S1", "P1", "data"))
  }

  test("durations and unit conversion") {
    val df = Seq(("2026-01-01 00:00:00", "2026-01-01 00:01:30")).toDF("a", "b")
      .select(City.durationSeconds(to_timestamp($"a"), to_timestamp($"b")).as("s"),
        City.durationMinutes(to_timestamp($"a"), to_timestamp($"b")).as("m"),
        City.kmh(lit(10.0)).as("k"))
    val r = df.collect().head
    assert(r.getDouble(0) == 90.0 && r.getDouble(1) == 1.5 && r.getDouble(2) == 36.0)
  }

  test("bbox centroid integer division") {
    val r = Seq((10, 20, 31, 41)).toDF("x1", "y1", "x2", "y2")
      .select(City.bboxCentroid($"x1", $"y1", $"x2", $"y2")).collect().head.getStruct(0)
    assert(r.getInt(0) == 20 && r.getInt(1) == 30)
  }
}
