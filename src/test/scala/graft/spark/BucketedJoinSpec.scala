package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.SpanGen

/** The 100-TB plan shape for the checker state join (SURVEY §4
  * "Partitioning"): when the input snapshot and the previous-state table are
  * both bucketed by doc_id with the same bucket count, Spark's
  * storage-partitioned (bucketed) join runs the C1/C2 classification with
  * ZERO Exchange — at 10^12 docs this is the difference between shuffling
  * the whole corpus and shuffling nothing. The pipeline code is unchanged
  * (bucketing is a storage property); this spec pins both the plan shape
  * and result equality against the unbucketed path.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed input + state tables: checker join plans with zero shuffles, same result") {
    val input = SpanGen.checkerDocs(spark, dir).toDF()
    val prev = SpanGen.prevState(spark, dir)

    spark.sql("DROP TABLE IF EXISTS graft_b_input")
    spark.sql("DROP TABLE IF EXISTS graft_b_prev")
    // the in-memory catalog forgets tables across JVMs but their warehouse
    // dirs survive — remove them so CTAS can claim the location
    Seq("graft_b_input", "graft_b_prev").foreach { t =>
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
        f.delete(): Unit
      }
      rec(new java.io.File(s"spark-warehouse/$t"))
    }
    input.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("graft_b_input")
    prev.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("graft_b_prev")

    // at this tiny scale the planner rightly prefers broadcast (bucketing
    // "disabled by query planner"); pin the 100-TB shape — where NEITHER
    // side fits in memory — by disabling auto-broadcast for the assertion
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bIn = spark.table("graft_b_input")
      val bPrev = spark.table("graft_b_prev")
      val classified = Checker.classify(bIn, bPrev)

      // plan shape: sort-merge join straight over the bucketed scans —
      // no shuffle exchange on either side
      val plan = classified.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)

      // result equality vs the unbucketed path
      val expected = Checker.classify(input, prev)
        .select("doc_id", "update_reason", "route")
      val got = classified.select("doc_id", "update_reason", "route")
      assert(got.exceptAll(expected).count() == 0)
      assert(expected.exceptAll(got).count() == 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    spark.sql("DROP TABLE IF EXISTS graft_b_input")
    spark.sql("DROP TABLE IF EXISTS graft_b_prev"): Unit
  }

  test("sorted one-file-per-bucket tables + legacy outputOrdering flag: Sort-free join, same result") {
    val input = SpanGen.checkerDocs(spark, dir).toDF()
    val prev = SpanGen.prevState(spark, dir)

    Seq("graft_s_input", "graft_s_prev").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
        f.delete(): Unit
      }
      rec(new java.io.File(s"spark-warehouse/$t"))
    }
    // PRECONDITION of the flag (cf. BenchCore.assertOneFilePerBucket): each
    // bucket must be exactly ONE file, or the scan concatenates sorted runs
    // unmerged and the Sort-free join is silently WRONG. repartition on the
    // bucket key before bucketBy guarantees it.
    input.repartition(8, col("doc_id")).write
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("graft_s_input")
    prev.repartition(8, col("doc_id")).write
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("graft_s_prev")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val classified = Checker.classify(
        spark.table("graft_s_input"), spark.table("graft_s_prev"))
      // the plan the bench publishes: scan -> merge-join, no Exchange AND
      // no Sort on either side (the flag trusts the buckets' SORTED BY)
      val plan = classified.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // a Sort node renders as "+- Sort [" or ":- Sort [" depending on its
      // branch position — reject both
      assert(!plan.matches("(?s).*[-+:]- Sort \\[.*"), s"Sort survived the flag:\n$plan")

      val expected = Checker.classify(input, prev)
        .select("doc_id", "update_reason", "route")
      val got = classified.select("doc_id", "update_reason", "route")
      assert(got.exceptAll(expected).count() == 0)
      assert(expected.exceptAll(got).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
    spark.sql("DROP TABLE IF EXISTS graft_s_input")
    spark.sql("DROP TABLE IF EXISTS graft_s_prev"): Unit
  }
}
