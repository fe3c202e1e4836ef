package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared machinery of the store-backed foreachBatch ingest stages
  * ([[StreamingDedup.nearDupIngest]], [[StreamingCurate.curateIngest]]):
  * the idempotent partition key and the own-partition-excluding store
  * read. Factored so the delivery semantics cannot drift between stages.
  */
private[streaming] object IngestStores {

  /** Partition key = micro-batch id + an order-independent XOR content
    * hash of the batch: a REPLAY of the same batch (same content) lands
    * on the same directory and overwrites it with identical deterministic
    * bytes (idempotent without a transactional store), while a
    * fresh-checkpoint restart — whose batch ids reset to 0 over DIFFERENT
    * content — lands on new directories instead of destroying prior runs'
    * partitions. One tiny action per micro-batch.
    */
  def partitionKey(batch: DataFrame, batchId: Long): String = {
    val k = batch.select(
      conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":"), md5(col("text")))), 1, 8), 16, 10)
        .cast("long").as("_k"))
      .agg(expr("bit_xor(_k)")).head().get(0)
    val ck = if (k == null) "empty" else java.lang.Long.toHexString(k.asInstanceOf[Long])
    s"$batchId-$ck"
  }

  /** Read an accumulated store directory, EXCLUDING the current batch's
    * own partition: a replayed batch would otherwise find its previous
    * attempt's rows, mark itself 100% duplicate, and overwrite its output
    * with nothing. Only a MISSING directory reads as an empty store (the
    * first batch); any real read failure must fail the batch so Spark
    * retries it — a swallowed transient error would silently release a
    * whole batch of duplicates and pollute the store. A pre-seeded flat
    * store (no batch partition dirs) has no own-partition to exclude.
    */
  def readScoped(batch: DataFrame, dir: String, part: String,
      keep: Seq[String], empty: => DataFrame): DataFrame = {
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) empty
    else {
      val df = spark.read.parquet(dir)
      val scoped = if (df.columns.contains("batch"))
        df.filter(col("batch") =!= part) else df
      scoped.select(keep.map(col): _*)
    }
  }
}
