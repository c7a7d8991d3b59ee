import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PartCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val d = graft.etl.IngestOps.table(spark, dir, "documents")
    val existing = d.filter(col("source") === "src0")
    val incoming = d.filter(col("source") =!= "src0")
    import graft.ext.{Dedup, TextOps}
    val tagged = existing.select(col("doc_id"), lit(true).as("_ex"), col("text"))
      .unionByName(incoming.select(col("doc_id"), lit(false).as("_ex"), col("text")))
    val toks = graft.etl.CacheRegistry.persist(tagged.select(col("doc_id"), col("_ex"),
      array_sort(array_distinct(TextOps.fastTokens(col("text")))).as("toks")))
    val b = graft.etl.CacheRegistry.persist(Dedup.bandBuckets(
      Dedup.minhashFromTokens(
        toks.select(col("doc_id"), col("_ex"), explode(col("toks")).as("tok")),
        carry = Seq("_ex")), carry = Seq("_ex")))
    println("b parts = " + b.rdd.getNumPartitions)
    val x = b.withColumn("_salt", pmod(hash(col("doc_id")), lit(16)))
    val y = b.withColumn("_salt", explode(array((0 until 16).map(lit(_)): _*)))
    val pairs = x.as("x").join(y.as("y"),
        col("x.bi") === col("y.bi") && col("x.band") === col("y.band") &&
          col("x._salt") === col("y._salt") &&
          (col("x.doc_id") < col("y.doc_id") ||
            (col("x.doc_id") === col("y.doc_id") && col("x._ex") && !col("y._ex"))) &&
          !(col("x._ex") && col("y._ex")))
      .select(col("x.doc_id").as("doc_a"), col("x._ex").as("ex_a"),
        col("y.doc_id").as("doc_b"), col("y._ex").as("ex_b"))
    println("pairs parts = " + pairs.rdd.getNumPartitions)
    println("pairs count = " + pairs.count())
    spark.stop()
  }
}
