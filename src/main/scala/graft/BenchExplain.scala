package graft

import graft.spark.Pipeline

/** Prints the formatted physical plan of the bench pipeline over the cached
  * bucketed tables — for auditing that the state join plans zero Exchange,
  * whether the bucket-sorted files avoid a Sort, and where codegen spans
  * break. `runMain graft.BenchExplain` (needs a populated bench work dir).
  */
object BenchExplain {
  def main(args: Array[String]): Unit = {
    val spark = BenchCore.session(8)
    BenchCore.registerTables(spark, BenchCore.fastDir("graft-bench"))
    val df = Pipeline.run(spark,
      spark.table("graft_bench_input"), spark.table("graft_bench_prev"), None,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "explain", 8).toDF()
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
