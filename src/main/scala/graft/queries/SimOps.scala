package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.Fns._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.K (vectors) — similarity search + multimodal join.
  *
  * Exact brute-force cosine top-k is the correctness baseline; the
  * LSH-bucketed scale path lives in `ann_lsh_topk` (non-oracle). Dot products
  * fold left-to-right (Spark `aggregate`, DuckDB `list_sum`) so both engines
  * produce the identical IEEE double.
  */
object SimOps extends QueryPack {

  /** Sequential left-to-right dot product of two float-array columns. */
  private[graft] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private[graft] def norm(a: Column): Column = sqrt(dot(a, a))

  def queries: Seq[Q] = Seq(
    // Brute-force cosine top-5 for 20 query vectors vs the whole table.
    Q(
      "sim_cosine_topk",
      Some("""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
             |p AS (
             |  SELECT q.vec_id AS qa, e.vec_id AS qb,
             |    list_sum(list_transform(list_zip(q.embedding, e.embedding),
             |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) AS dot,
             |    sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
             |    sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
             |  FROM q, embeddings e WHERE q.vec_id <> e.vec_id),
             |c AS (SELECT qa, qb, ROUND(dot / (na * nb), 6) AS cos FROM p),
             |r AS (SELECT *, row_number() OVER (PARTITION BY qa
             |                                   ORDER BY cos DESC, qb) AS rn
             |      FROM c)
             |SELECT qa, qb, cos, CAST(rn AS INT) AS rn
             |FROM r WHERE rn <= 5 ORDER BY qa, rn""".stripMargin),
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qa"), col("embedding").as("ea"))
        val all = e.select(col("vec_id").as("qb"), col("embedding").as("eb"))
        val w = Window.partitionBy("qa").orderBy(col("cos").desc, col("qb"))
        broadcast(q).crossJoin(all)
          .filter(col("qa") =!= col("qb"))
          .select(
            col("qa"), col("qb"),
            round(dot(col("ea"), col("eb")) / (norm(col("ea")) * norm(col("eb"))), 6)
              .as("cos"))
          .withColumn("rn", row_number().over(w).cast("int"))
          .filter(col("rn") <= 5)
          .orderBy("qa", "rn")
      }),

    // Multimodal columns: text features joined with the vector modality.
    Q(
      "multimodal_join_textvec",
      Some("""SELECT d.doc_id, d.n_chars,
             |  CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens,
             |  ROUND(sqrt(list_sum(list_transform(e.embedding,
             |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2
             |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
             |ORDER BY d.doc_id""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "documents")
          .join(Tables(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
          .select(
            col("doc_id"), col("n_chars"),
            size(split(col("text"), " ")).cast("int").as("n_tokens"),
            round(norm(col("embedding")), 4).as("l2"))
          .orderBy("doc_id")))
}
