package graft.plans

import graft.SparkSpec
import graft.bson._
import graft.files.BsonFiles
import graft.functions.GraftFunctions

import java.nio.file.Files

class ObjectIdRangeRuleSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val before = classic.experimental.extraOptimizations
    classic.experimental.extraOptimizations = before :+ ObjectIdRangeRule
    try f finally classic.experimental.extraOptimizations = before
  }

  test("seconds predicate derives the oid string-range conjunct") {
    // NOTE: in this shared session the rule runs via
    // experimental.extraOptimizations, which executes AFTER the V2
    // pushdown batch — so assert the derived conjunct + semantics here;
    // the actual source pushdown (rule injected via GraftExtensions runs
    // inside the operator-optimization batch, before pushdown) is driven
    // end-to-end in a fresh JVM by the verification probe.
    val dir = Files.createTempDirectory("oidrule").toString
    // canonical lowercase oids with seconds 0..999
    val docs = (0 until 1000).map(i => BDoc(
      "oid" -> BString(f"$i%08x" + "ab" * 8), "v" -> BInt32(i)))
    BsonFiles.write(s"$dir/data.bson", docs.iterator)
    withRule {
      val df = spark.read.format("graftbson").load(dir)
        .filter(GraftFunctions.objectid_to_seconds(org.apache.spark.sql.functions.col("oid")) >= 990L)
      assert(df.count() == 10)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("000003de0000000000000000"), // 990 = 0x3de
        s"derived range conjunct missing:\n$optimized")
    }
  }

  test("equality and strict bounds derive two-sided / shifted ranges") {
    import spark.implicits._
    withRule {
      val df = (0 until 256).map(i => f"$i%08x" + "00" * 8).toDF("oid")
      val eq = df.filter(GraftFunctions.objectid_to_seconds($"oid") === 7L)
      assert(eq.count() == 1)
      val gt = df.filter(GraftFunctions.objectid_to_seconds($"oid") > 250L)
      assert(gt.count() == 5) // 251..255
      val lt = df.filter(GraftFunctions.objectid_to_seconds($"oid") < 3L)
      assert(lt.count() == 3)
      val lte = df.filter(GraftFunctions.objectid_to_seconds($"oid") <= 3L)
      assert(lte.count() == 4)
    }
  }

  test("rule preserves semantics for rows the original predicate rejects") {
    import spark.implicits._
    withRule {
      // malformed oids: original predicate is null -> filtered out, and
      // the added conjunct must not resurrect them
      val df = Seq("zzzzzzzzzzzzzzzzzzzzzzzz", "deadbeef" + "00" * 8, "short")
        .toDF("oid")
      val got = df.filter(GraftFunctions.objectid_to_seconds($"oid") >= 0L)
        .collect().map(_.getString(0))
      assert(got.toSeq == Seq("deadbeef" + "00" * 8))
    }
  }

  test("uppercase ObjectIds are not silently filtered by the derived range") {
    import spark.implicits._
    withRule {
      // objectid_to_seconds accepts any case, so the derived string range
      // must too: a raw-column conjunct would drop "DEADBEEF..." ('F' < 'f')
      val df = Seq("DEADBEEF" + "00" * 8, "deadbeef" + "00" * 8, "00000001" + "00" * 8)
        .toDF("oid")
      val got = df.filter(GraftFunctions.objectid_to_seconds($"oid") >= 2L)
        .collect().map(_.getString(0)).toSet
      assert(got === Set("DEADBEEF" + "00" * 8, "deadbeef" + "00" * 8))
    }
  }

  test("assume_canonical opt-in restores the raw-column (pushable) conjunct") {
    import spark.implicits._
    withRule {
      spark.conf.set(ObjectIdRangeRule.AssumeCanonicalKey, "true")
      try {
        val df = Seq("0000000a" + "00" * 8, "00000001" + "00" * 8).toDF("oid")
          .filter(GraftFunctions.objectid_to_seconds($"oid") >= 10L)
        assert(df.count() === 1)
        val optimized = df.queryExecution.optimizedPlan.toString
        assert(!optimized.toLowerCase.contains("lower("),
          s"canonical mode must not wrap the column:\n$optimized")
      } finally spark.conf.unset(ObjectIdRangeRule.AssumeCanonicalKey)
    }
  }

  test("rule is idempotent (no conjunct explosion at fixed point)") {
    import spark.implicits._
    withRule {
      val df = Seq("00000001" + "00" * 8).toDF("oid")
        .filter(GraftFunctions.objectid_to_seconds($"oid") >= 1L)
      val optimized = df.queryExecution.optimizedPlan.toString
      val occurrences = "000000010000000000000000".r.findAllIn(optimized).size
      assert(occurrences <= 2, s"conjunct explosion:\n$optimized")
      assert(df.count() == 1)
    }
  }
}
