package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does from_json with variant fields beat whole-doc try_parse_json for
  * declared-keys rivers? (throwaway analysis tool)
  */
object ProfileFromJson {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val ev = graft.Tables.events(spark, dir).cache()
    ev.count()

    val json = to_json(struct(
      md5(col("event_id").cast("string")).as("@id"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("@opprettet"),
      col("event_type").as("@event_name"),
      lit(0).as("system_read_count"),
      col("event_id")))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $label ($n rows)")
    }

    val keys = Seq("@id", "@opprettet", "@event_name", "system_read_count", "event_id")

    // does variant-typed struct field work in from_json?
    val ddl = keys.map(k => s"`$k` variant").mkString("struct<", ", ", ">")
    try {
      val r = spark.range(1).select(
        from_json(lit("""{"@id":"x","system_read_count":3}"""), ddl, new java.util.HashMap[String, String]()).as("m"))
        .select(col("m.@id").cast("string"), schema_of_variant(col("m.system_read_count"))).first()
      println(s"variant-field from_json works: $r")
    } catch { case e: Throwable => println(s"variant-field from_json FAILED: ${e.getMessage.take(300)}") }

    for (rep <- 1 to 2) {
      time(s"variant path: parse + 5 presence checks + 5 reads (rep $rep)") {
        val m = try_parse_json(json)
        val checks = keys.map { k =>
          val v = try_variant_get(m, s"$$['$k']", "variant")
          (v.isNotNull && !is_variant_null(v)).as(s"c_$k")
        }
        val reads = keys.map(k => try_variant_get(m, s"$$['$k']", "string").as(s"r_$k"))
        ev.select(checks ++ reads: _*).filter(col("c_@id")).count()
      }
      time(s"from_json variant-fields path (rep $rep)") {
        val m = from_json(json, ddl, new java.util.HashMap[String, String]())
        val checks = keys.map { k =>
          val v = m.getField(k)
          (v.isNotNull && !is_variant_null(v)).as(s"c_$k")
        }
        val reads = keys.map(k => m.getField(k).cast("string").as(s"r_$k"))
        ev.select(checks ++ reads: _*).filter(col("c_@id")).count()
      }
      time(s"from_json string-typed fields (rep $rep)") {
        val ddl2 = keys.map(k => s"`$k` string").mkString("struct<", ", ", ">")
        val m = from_json(json, ddl2, new java.util.HashMap[String, String]())
        val reads = keys.map(k => m.getField(k).as(s"r_$k"))
        ev.select(reads :+ m.getField("@id").isNotNull.as("c"): _*).filter(col("c")).count()
      }
    }
    spark.stop()
  }
}
