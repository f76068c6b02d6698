package graft

import org.apache.spark.sql.functions._

/** Port of the reference's canonical golden-output test: group a
  * treasury-yield-shaped table by year and check COUNT/AVG/SUM against
  * values computed independently (plain Scala fold over the fixture).
  *
  * Reference shape: examples/treasury_yield/src/test/java/com/mongodb/
  * hadoop/TreasuryTest.java:43-64 (21 years x {count, avg, sum}, compared
  * after sorting by _id — :118-131). The fixture here is synthesized
  * (yield_historical_in.json-shaped: one doc per business day with a
  * bc10Year yield) so no reference data is copied.
  */
class TreasuryGoldenSpec extends SparkSpec {

  // Deterministic fixture: 21 years (1990-2010), ~52 weekly observations
  // per year, yield value derived from a fixed linear-congruential stream.
  private val fixture: Seq[(String, Double)] = {
    var seed = 123456789L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); seed }
    for {
      year <- 1990 to 2010
      week <- 1 to 52
    } yield {
      val day = math.min(week * 7, 365)
      val date = f"$year%04d-${(day - 1) / 31 + 1}%02d-${(day - 1) % 28 + 1}%02d"
      val v = ((next() >>> 11) % 1000).toDouble / 100.0 // 0.00 .. 9.99
      (date, v)
    }
  }

  test("treasury yield per-year count/avg/sum matches the golden fold") {
    import spark.implicits._
    val df = fixture.toDF("dt", "bc10Year").withColumn("dt", to_date($"dt"))

    val got = df.groupBy(year($"dt").as("yr"))
      .agg(count(lit(1)).as("n"), sum($"bc10Year").as("s"))
      .withColumn("avg_y", $"s" / $"n")
      .orderBy($"yr")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

    // independent golden: plain Scala fold (no Spark involved)
    val golden = fixture
      .groupBy(_._1.take(4).toInt)
      .map { case (yr, rows) =>
        val s = rows.map(_._2).sum
        (yr, rows.size.toLong, s, s / rows.size)
      }
      .toSeq.sortBy(_._1)

    assert(got.length == 21, "exactly 21 year rows")
    got.zip(golden).foreach { case ((gy, gn, gs, ga), (ey, en, es, ea)) =>
      assert(gy == ey && gn == en)
      assert(math.abs(gs - es) < 1e-9, s"sum mismatch for $gy: $gs vs $es")
      assert(math.abs(ga - ea) < 1e-12, s"avg mismatch for $gy: $ga vs $ea")
    }
  }

  test("update-variant: aggregated rows re-written as keyed updates round-trip") {
    import spark.implicits._
    val df = fixture.toDF("dt", "bc10Year").withColumn("dt", to_date($"dt"))
    val agg = df.groupBy(year($"dt").as("_id"))
      .agg(avg($"bc10Year").as("avg_y"), count(lit(1)).as("n"))
    // the treasury update-reducer emits one $set doc per year keyed by _id
    // (examples/treasury_yield/.../TreasuryYieldUpdateReducer.java:46-80);
    // round-trip through parquet keyed on _id and check key uniqueness.
    val out = java.nio.file.Files.createTempDirectory("treasury").toString
    agg.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 21)
    assert(back.select($"_id").distinct().count() == 21)
  }
}
