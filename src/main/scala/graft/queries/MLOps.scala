package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.Fns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.J — the reference's core compute, relationalized.
  *
  * Reference analogs: `nn.Conv` 5x5 / gaussian_filter 2-D convolution
  * (`trainer/flax_model.py:156,73` — conv-as-join), `jax.nn.standardize`
  * (`:243` — z-score), `nn.Dense` matvec (`:160,173`), softmax+argmax head
  * (`:188,195`), and the full permute->batch->grad->update training loop
  * (`:229-260` — iterative gradient descent).
  */
object MLOps extends QueryPack {

  def queries: Seq[Q] = Seq(
    // 2-D convolution as a relation: sparse grid (user x day) self-joined
    // against a 9-row kernel-offset table, then group-sum. Scales to any
    // raster: the offset table broadcasts, the grid shuffles once on its key.
    Q(
      "ml_conv2d_join_agg",
      Some("""WITH grid AS (
             |  SELECT user_id AS u,
             |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS d,
             |         CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |offs AS (SELECT a.dy, b.dx
             |         FROM (VALUES (-1), (0), (1)) a(dy), (VALUES (-1), (0), (1)) b(dx)),
             |conv AS (
             |  SELECT g.u, g.d, SUM(n.c) AS s
             |  FROM grid g JOIN offs o ON TRUE
             |  JOIN grid n ON n.u = g.u + o.dy AND n.d = g.d + o.dx
             |  GROUP BY 1, 2)
             |SELECT u, d, ROUND(CAST(s AS DOUBLE) / 9.0, 6) AS conv
             |FROM conv ORDER BY u, d""".stripMargin),
      (s, dir) => {
        val grid = Tables(s, dir, "events")
          .groupBy(
            col("user_id").as("u"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("int").as("d"))
          .agg(cnt.as("c"))
        val offs = s.createDataFrame(
          for { dy <- Seq(-1, 0, 1); dx <- Seq(-1, 0, 1) } yield (dy, dx))
          .toDF("dy", "dx")
        val n = grid.select(col("u").as("nu"), col("d").as("nd"), col("c").as("nc"))
        grid.crossJoin(broadcast(offs))
          .join(n, col("nu") === col("u") + col("dy") && col("nd") === col("d") + col("dx"))
          .groupBy("u", "d")
          .agg(sum("nc").as("s"))
          .select(col("u"), col("d"), round(col("s").cast("double") / 9.0, 6).as("conv"))
          .orderBy("u", "d")
      }),

    // Per-group standardize: exact decimal moments per segment, broadcast
    // back — one shuffle of the small agg, zero shuffles of the fact rows.
    Q(
      "ml_zscore_standardize",
      Some("""WITH j AS (
             |  SELECT c_mktsegment AS seg, o_orderkey, o_totalprice AS v
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |s AS (
             |  SELECT seg, CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(v * v AS DECIMAL(30,10))) AS DOUBLE) AS s2,
             |    COUNT(*) AS n
             |  FROM j GROUP BY seg)
             |SELECT j.o_orderkey, j.seg,
             |  ROUND((j.v - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS z
             |FROM j JOIN s ON j.seg = s.seg ORDER BY j.o_orderkey""".stripMargin),
      (s, dir) => {
        val j = Tables(s, dir, "orders")
          .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_orderkey"), col("o_totalprice").as("v"))
        val stats = j.groupBy("seg").agg(
          dsum(col("v")).as("s1"),
          sum((col("v") * col("v")).cast(DecimalType(30, 10))).cast("double").as("s2"),
          cnt.as("n"))
        j.join(broadcast(stats), "seg")
          .select(
            col("o_orderkey"), col("seg"),
            round((col("v") - col("s1") / col("n")) /
              sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 6)
              .as("z"))
          .orderBy("o_orderkey")
      }),

    // Dense layer as matvec against a fixed +/-1 weight vector; sequential
    // left-to-right fold in both engines.
    Q(
      "ml_dense_matvec",
      Some("""SELECT vec_id,
             |  ROUND(list_sum(list_transform(range(1, 65),
             |    i -> CAST(embedding[i] AS DOUBLE)
             |         * (CASE WHEN i % 2 = 1 THEN 1.0 ELSE -1.0 END))), 4) AS dot
             |FROM embeddings ORDER BY vec_id""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "embeddings")
          .select(
            col("vec_id"),
            round(
              aggregate(sequence(lit(1), lit(64)), lit(0.0),
                (acc, i) =>
                  acc + element_at(col("embedding"), i.cast("int")).cast("double") *
                    when(i % 2 === 1, 1.0).otherwise(-1.0)), 4).as("dot"))
          .orderBy("vec_id")),

    // Inference head: argmax over the first 10 dims with a deterministic
    // first-max tie-break (position ascending).
    Q(
      "ml_softmax_argmax_infer",
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(i AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS v
             |  FROM embeddings, (SELECT unnest(range(1, 11)) AS i) t),
             |r AS (SELECT vec_id, i, v,
             |        row_number() OVER (PARTITION BY vec_id ORDER BY v DESC, i) AS rn
             |      FROM e)
             |SELECT vec_id, CAST(i - 1 AS INT) AS pred_class, ROUND(v, 6) AS logit
             |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("vec_id").orderBy(col("v").desc, col("i"))
        Tables(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 10)))
          .select(
            col("vec_id"), (col("pos") + 1).cast("int").as("i"),
            col("col").cast("double").as("v"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("vec_id"), (col("i") - 1).cast("int").as("pred_class"),
            round(col("v"), 6).as("logit"))
          .orderBy("vec_id")
      }),

    // The training loop: 3 fixed gradient-descent steps for
    // l_extendedprice ~ l_quantity. Each step is one distributed aggregate
    // (exact decimal sums); the driver only carries the 2 scalars (w, b) —
    // no collect of data rows. Iterative => no single-SQL oracle.
    Q(
      "ml_train_gd_iterations",
      None,
      (s, dir) => {
        // Sufficient statistics: for a quadratic loss the gradient and SSE
        // are closed-form in (n, Sx, Sy, Sxx, Sxy, Syy) — ONE distributed
        // pass gathers exact decimal moments, then every GD iteration is
        // pure driver arithmetic. At 100 TB this is the difference between
        // one scan and one scan per epoch.
        val m = Tables(s, dir, "lineitem")
          .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
          .agg(
            cnt.as("n"),
            dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
            dsumWide(col("x") * col("x")).as("sxx"),
            dsumWide(col("x") * col("y")).as("sxy"),
            dsumWide(col("y") * col("y")).as("syy"))
          .head()
        val n = m.getLong(0).toDouble
        val (sx, sy, sxx, sxy, syy) =
          (m.getDouble(1), m.getDouble(2), m.getDouble(3), m.getDouble(4), m.getDouble(5))
        var w = 0.0
        var b = 0.0
        val lr = 0.001
        val hist = (1 to 3).map { it =>
          // gw = sum((w x + b - y) x); gb = sum(w x + b - y); sse likewise.
          val gw = w * sxx + b * sx - sxy
          val gb = w * sx + n * b - sy
          val sse = w * w * sxx + 2 * w * b * sx - 2 * w * sxy +
            n * b * b - 2 * b * sy + syy
          val mse = sse / n
          w -= lr * 2.0 * gw / n
          b -= lr * 2.0 * gb / n
          (it, w, b, mse)
        }
        s.createDataFrame(hist).toDF("iter", "w", "b", "mse")
      }),

    // Lloyd's k-means over the embeddings (k=8, 3 iterations, deterministic
    // init = vectors 0..7). Model state (8 x 64 centroids) lives on the
    // driver and enters each iteration as broadcast literals — the data
    // never leaves the cluster, each iteration is one scan + one shuffle of
    // (cluster, dim) partial sums; assignment distance uses the native
    // graft_dot codegen expression. Iterative => no single-SQL oracle;
    // KMeansSpec asserts WCSS monotonicity and assignment optimality.
    Q(
      "ml_kmeans_iterations",
      None,
      (s, dir) => {
        graft.functions.Native.register(s)
        import org.apache.spark.sql.functions.{call_function => cf}
        val e = Tables(s, dir, "embeddings").select("vec_id", "embedding")
        val dim = 64
        val k = 8
        var centroids: Array[Array[Float]] = e
          .filter(col("vec_id") < k).orderBy("vec_id")
          .collect()
          .map(_.getSeq[Float](1).toArray)
        val hist = (1 to 3).map { it =>
          val cLits = centroids.map(c => array(c.map(lit): _*))
          // |x - c|^2 = x.x - 2 x.c + c.c ; x.x constant per row, omit.
          val dists = cLits.zipWithIndex.map { case (c, i) =>
            (cf("graft_dot", c, c) - lit(2.0) * cf("graft_dot", col("embedding"), c))
              .as(s"d$i")
          }
          val assigned = e.select(
            (col("vec_id") +: col("embedding") +: dists): _*)
          val clusterCol = (1 until k).foldLeft(
            struct(col("d0").as("d"), lit(0).as("c"))) { (best, i) =>
            when(col(s"d$i") < best("d"),
              struct(col(s"d$i").as("d"), lit(i).as("c"))).otherwise(best)
          }
          val withCluster = assigned
            .select(col("vec_id"), col("embedding"), clusterCol.as("best"))
            .select(col("vec_id"), col("embedding"), col("best.c").as("cluster"))
          // ONE job per iteration: per-cluster count, per-dim sums (new
          // centroid numerators) and sum|x|^2 — WCSS for the old centroids
          // follows in closed form: sum|x|^2 - 2 c.Sx + n|c|^2 per cluster.
          val aggCols =
            count(lit(1)).as("cnt") +:
              sum(cf("graft_dot", col("embedding"), col("embedding"))).as("sxx") +:
              (0 until dim).map(j =>
                sum(element_at(col("embedding"), j + 1).cast("double")).as(s"s$j"))
          val rows = withCluster.groupBy("cluster")
            .agg(aggCols.head, aggCols.tail: _*)
            .collect()
          val next = Array.fill(k, dim)(0.0f)
          val counts = Array.fill(k)(0L)
          var wcss = 0.0
          rows.foreach { r =>
            val c = r.getInt(0)
            val nC = r.getLong(1)
            counts(c) = nC
            val sxx = r.getDouble(2)
            var dotCS = 0.0
            var cc = 0.0
            for (j <- 0 until dim) {
              val sj = r.getDouble(3 + j)
              next(c)(j) = (sj / nC).toFloat
              dotCS += centroids(c)(j).toDouble * sj
              cc += centroids(c)(j).toDouble * centroids(c)(j).toDouble
            }
            wcss += sxx - 2 * dotCS + nC * cc
          }
          // Keep empty clusters' previous centroid.
          for (c <- 0 until k if counts(c) == 0) next(c) = centroids(c)
          centroids = next
          (it, math.round(wcss * 10000) / 10000.0, counts.count(_ > 0))
        }
        s.createDataFrame(hist).toDF("iter", "wcss", "nonempty_clusters")
      }),

    // MLlib interop — MinHashLSH over hashed token sets: the platform's own
    // implementation of the dedup_minhash_lsh pipeline (HashingTF sparse
    // vectors -> signature -> approxSimilarityJoin). Seeded => repeatable,
    // but signature internals are engine-specific => no SQL oracle.
    Q(
      "dedup_minhash_mllib",
      None,
      (s, dir) => {
        import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, Tokenizer}
        val docs = Tables(s, dir, "documents")
          .filter(col("doc_id") < 200)
          .select("doc_id", "text")
        val toks = new Tokenizer().setInputCol("text").setOutputCol("toks")
          .transform(docs)
        val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
          .setBinary(true).setNumFeatures(1 << 18)
          .transform(toks)
        val model = new MinHashLSH().setInputCol("features")
          .setOutputCol("sig").setNumHashTables(16).setSeed(42L)
          .fit(tf)
        model.approxSimilarityJoin(tf, tf, 0.5, "jaccard_dist")
          .select(
            col("datasetA.doc_id").as("da"),
            col("datasetB.doc_id").as("db"),
            round(col("jaccard_dist"), 6).as("jaccard_dist"))
          .filter(col("da") < col("db"))
          .orderBy(col("jaccard_dist"), col("da"), col("db"))
          .limit(50)
      }),

    // MLlib interop — the platform KMeans (k-means|| init, seeded) over the
    // same embeddings as ml_kmeans_iterations; cluster-size profile output.
    Q(
      "ml_kmeans_mllib",
      None,
      (s, dir) => {
        import org.apache.spark.ml.feature.VectorAssembler
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.linalg.Vectors
        val toVec = udf((a: Seq[Float]) =>
          Vectors.dense(a.map(_.toDouble).toArray))
        val data = Tables(s, dir, "embeddings")
          .select(col("vec_id"), toVec(col("embedding")).as("features"))
        val model = new KMeans().setK(8).setMaxIter(3).setSeed(42L)
          .setFeaturesCol("features")
          .fit(data)
        model.transform(data)
          .groupBy(col("prediction"))
          .agg(cnt.as("n"))
          .select(col("n"))
          .orderBy(col("n").desc)
          .withColumn("size_rank",
            row_number().over(
              org.apache.spark.sql.expressions.Window
                .orderBy(col("n").desc)).cast("int"))
      }))
}
