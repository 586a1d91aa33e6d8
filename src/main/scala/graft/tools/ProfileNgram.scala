package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** Dev scratch: stage-by-stage timing of the ngram dedup pipeline. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(100000).selectExpr("sum(id)").collect() // warmup
    val docs = Tables.documents(spark, sfDir)
    val ws = filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "")
    val sh = docs.select(col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("ws")) - 2), i =>
          concat_ws(" ", element_at(col("ws"), i),
            element_at(col("ws"), i + 1), element_at(col("ws"), i + 2)))).as("sg"))
    val shc = time("shingle materialize")(graft.engine.Materialize.diskBacked(sh))
    time("shingle count")(shc.count())
    val postings = shc.select(col("doc_id"), explode(col("sg")).as("s"))
    time("postings count")(postings.count())
    val rare = postings.groupBy(col("s")).agg(Num.countStar.as("df"))
      .filter(col("df") >= 2 && col("df") <= 10).select(col("s"))
    time("rare count")(rare.count())
    val indexed = postings.join(rare, Seq("s"))
    time("indexed count")(indexed.count())
    val cand = indexed.as("a").join(indexed.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(Num.countStar.as("n"))
      .filter(col("n") >= 2)
    time("cand count")(cand.count())
    val x = shc.select(col("doc_id").as("doc_a"), col("sg").as("sg_a"))
    val y = shc.select(col("doc_id").as("doc_b"), col("sg").as("sg_b"))
    val verified = cand.select(col("doc_a"), col("doc_b"))
      .join(x, Seq("doc_a")).join(y, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sg_a"), col("sg_b"))).cast("double") /
          size(array_union(col("sg_a"), col("sg_b")))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    time("verified count")(verified.count())
    spark.stop()
  }
}
