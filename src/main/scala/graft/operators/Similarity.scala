package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Similarity-search operators over the `embeddings` vector column
  * (SURVEY.md §2.11 X3). Vectors are `array<float>`; all arithmetic is done
  * in double with a pinned left-to-right fold so Spark and the DuckDB oracle
  * produce bit-identical cosines (IEEE multiply/add/sqrt/divide are
  * deterministic once the operand order is fixed — see graft.engine.Num for
  * the same reasoning on sums).
  *
  * Scale story (100 TB corpus, small query set): the query side is bounded
  * and explicitly broadcast, so the corpus is scanned exactly once per
  * executor with no shuffle — brute force is O(|Q|·N) but embarrassingly
  * parallel and the right baseline. The scale path when |Q| grows is
  * `q_ann_lsh`: random-hyperplane LSH buckets both sides so only
  * same-bucket pairs are scored (candidate generation identical in spirit
  * to Dedup's MinHash banding). Norm-bound pruning (|cos| ≤ 1 ⇒ skip blocks
  * whose best possible dot < current k-th) composes on top for exact top-k.
  */
object Similarity {

  /** Number of query vectors (vec_id < QueryCount) and neighbors kept. */
  val QueryCount = 10
  val TopK = 5

  /** Left-to-right fold sum of an array<double> — matches the oracle's
    * list_reduce with a prepended 0.0. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  private def toDouble(arr: Column): Column =
    transform(arr, x => x.cast("double"))

  /** X3 `q_cosine_topk`: exact brute-force cosine top-k of every corpus
    * vector against each query vector (self excluded). */
  def cosineTopkQ(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"))
      .withColumn("nsq", foldSum(transform(col("emb"), x => x * x)))
    val queries = emb.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nsq").as("q_nsq"))
    val dot = foldSum(zip_with(col("q_emb"), col("emb"), (x, y) => x * y))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    emb.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (dot / (sqrt(col("q_nsq")) * sqrt(col("nsq")))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  val cosineTopkOracle: String =
    s"""WITH emb AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings
       |), n AS (
       |  SELECT vec_id, e,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(e, x -> x*x)), (a,b) -> a+b) AS nsq
       |  FROM emb
       |), pairs AS (
       |  SELECT q.vec_id AS q_id, b.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(1, len(q.e)+1), i -> q.e[i]*b.e[i])),
       |      (a,b) -> a+b) / (sqrt(q.nsq) * sqrt(b.nsq)) AS cosine
       |  FROM n q JOIN n b ON b.vec_id <> q.vec_id
       |  WHERE q.vec_id < ${QueryCount}
       |)
       |SELECT q_id, rank, neighbor_id, cosine FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM pairs) t
       |WHERE rank <= ${TopK}
       |ORDER BY q_id, rank""".stripMargin
}
