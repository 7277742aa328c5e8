package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profile of the variant hot path (throwaway analysis tool): where
  * does the m-suite's time go — JSON build, parse, variant reads, or the
  * rule machinery?
  */
object ProfileVariant {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val ev = graft.Tables.events(spark, dir).cache()
    ev.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $label ($n rows)")
    }

    val json = to_json(struct(
      md5(col("event_id").cast("string")).as("@id"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("@opprettet"),
      col("event_type").as("@event_name"),
      lit(0).as("system_read_count"),
      col("event_id")))

    time("baseline count")(ev.count())
    time("build json only")(ev.select(json.as("j")).filter(length(col("j")) > 0).count())
    time("build + parse")(ev.select(try_parse_json(json).as("m"))
      .filter(col("m").isNotNull).count())
    time("build + parse + 1 vget")(ev.select(
      try_variant_get(try_parse_json(json), "$.event_id", "bigint").as("x"))
      .filter(col("x").isNotNull).count())
    time("build + parse + 12 vget") {
      val m = try_parse_json(json)
      val cols = (0 until 12).map(i =>
        try_variant_get(m, "$['@id']", "string").substr(lit(1), lit(i + 1)).as(s"c$i"))
      ev.select(cols: _*).filter(col("c0").isNotNull).count()
    }
    time("schema_of_variant x6") {
      val m = try_parse_json(json)
      val cols = (0 until 6).map(i =>
        schema_of_variant(try_variant_get(m, "$['@id']", "variant")).substr(lit(1), lit(i + 1)).as(s"c$i"))
      ev.select(cols: _*).filter(col("c0").isNotNull).count()
    }
    time("full m7")(graft.SparkEntry.queries("m7_envelope")(spark, dir).count())

    // does an explicit projection boundary give parse-once? (CollapseProject
    // refuses to inline an expensive expr referenced many times)
    time("m7-like, two-phase parse") {
      val parsed = ev.select(col("event_id").as("eid"), try_parse_json(json).as("m"))
      val m = col("m")
      val reads = Seq(
        try_variant_get(m, "$['@id']", "string").as("id"),
        try_variant_get(m, "$['@opprettet']", "string").as("opprettet"),
        try_variant_get(m, "$['@event_name']", "string").as("event_name"),
        try_variant_get(m, "$.system_read_count", "int").as("rc"),
        try_variant_get(m, "$.event_id", "bigint").as("event_id"))
      val checks = (0 until 5).map(i =>
        (try_variant_get(m, "$['@id']", "variant").isNotNull &&
          !is_variant_null(try_variant_get(m, "$['@id']", "variant"))).as(s"p$i"))
      parsed.select((reads ++ checks): _*).orderBy(col("id")).count()
    }
    time("m7-like, single-phase (inline parse)") {
      val m = try_parse_json(json)
      val reads = Seq(
        try_variant_get(m, "$['@id']", "string").as("id"),
        try_variant_get(m, "$['@opprettet']", "string").as("opprettet"),
        try_variant_get(m, "$['@event_name']", "string").as("event_name"),
        try_variant_get(m, "$.system_read_count", "int").as("rc"),
        try_variant_get(m, "$.event_id", "bigint").as("event_id"))
      val checks = (0 until 5).map(i =>
        (try_variant_get(m, "$['@id']", "variant").isNotNull &&
          !is_variant_null(try_variant_get(m, "$['@id']", "variant"))).as(s"p$i"))
      ev.select((reads ++ checks): _*).orderBy(col("id")).count()
    }
    import graft.messages.{River, Validation}
    val river5 = River().validate(
      Validation.requireKey("@id"), Validation.requireKey("@opprettet"),
      Validation.requireKey("@event_name"), Validation.requireKey("system_read_count"),
      Validation.requireKey("event_id"))
    time("attach(5 rules).all count")(river5.attach(ev, json).all.count())
    time("attach(5 rules).all select status")(
      river5.attach(ev, json).all.select(col("status")).filter(length(col("status")) > 0).count())
    time("attach(5 rules).passed")(river5.attach(ev, json).passed.count())
    time("attach(5 rules).passed + 6 reads") {
      val r = river5.attach(ev, json)
      r.passed.select(
        r.packetAs("event_id", "bigint"), r.packetAs("@id", "string"),
        r.packetAs("@opprettet", "string"), r.packetAs("@event_name", "string"),
        r.packetAs("system_read_count", "int")).count()
    }
    val river1 = River().validate(Validation.requireKey("@id"))
    time("attach(1 rule).passed")(river1.attach(ev, json).passed.count())
    spark.stop()
  }
}
