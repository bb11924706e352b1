package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.Fns._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.K (vectors) — similarity search + multimodal columns.
  *
  * Exact brute-force cosine top-k is the correctness baseline;
  * `sim_ann_lsh_topk` is the sub-linear scale path (random-hyperplane LSH:
  * each vector hashes to one of 2^8 buckets, candidate search stays inside
  * the bucket — at 100 TB the bucket id becomes the shuffle/partition key and
  * no full pairwise join ever forms). Dot products fold left-to-right (Spark
  * `aggregate`, DuckDB `list_sum`) so both engines produce the identical
  * IEEE double.
  */
object SimOps extends QueryPack {

  /** Typed rows for the mapPartitions decode path. */
  final case class DocBlob(
      doc_id: Long, lang: String, source: String, blob: Array[Byte])
  final case class DocFeatures(
      doc_id: Long, lang: String, source: String, n_bytes: Int,
      content_md5: String, frame_w: Int, frame_h: Int, n_frames: Int)

  /** Sequential left-to-right dot product of two float-array columns —
    * declarative higher-order-function form (CodegenFallback; kept as the
    * readable reference implementation and for the NativeDotSpec
    * equivalence assertion).
    */
  private[graft] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private[graft] def norm(a: Column): Column = sqrt(dot(a, a))

  /** Native-codegen dot product (graft.functions.DotProduct) — bit-equal to
    * [[dot]], one fused loop inside whole-stage codegen. Queries call
    * [[native]] first to register it in the session.
    */
  private[graft] def ndot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  private[graft] def nnorm(a: Column): Column = sqrt(ndot(a, a))

  /** Fused native cosine (graft.functions.CosineSim): one loop instead of
    * the three traversals of `ndot(a,b)/(nnorm(a)*nnorm(b))`; bit-equal to
    * that composed form (NativeDotSpec), so oracle results are unchanged.
    */
  private[graft] def ncos(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  private def native(s: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.Native.register(s)

  /** Deterministic pseudo-random hyperplanes for LSH bucketing: 16 planes x
    * 64 dims of small integers in [-6, 6] (4 hash tables x 4 planes).
    * Public knowledge (Charikar random-projection LSH); fixed integers keep
    * both engines exact.
    */
  private[graft] val NumTables = 4
  private[graft] val Planes: Array[Array[Int]] =
    Array.tabulate(16, 64)((i, j) => ((19 * i + 7 * j) % 13) - 6)

  private def planeLit(i: Int): Column =
    array(Planes(i).toIndexedSeq.map(w => lit(w.toFloat)): _*)

  /** Product-quantization parameters: 4 subspaces x 16 dims, 4 codewords
    * per subspace, deterministic small-integer codebook (public-knowledge
    * PQ/ADC design, Jegou et al.; fixed integers keep both engines exact).
    */
  private[graft] val PqSubs = 4
  private[graft] val PqSubDim = 16
  private[graft] val PqCodes = 4
  private[graft] val PqCodebook: Array[Array[Array[Int]]] =
    Array.tabulate(PqSubs, PqCodes, PqSubDim)(
      (si, c, j) => ((3 * si + 5 * c + j) % 7) - 3)

  /** |codeword|^2, exact in Int arithmetic, inlined as a literal in both
    * engines.
    */
  private def pqCc(si: Int, c: Int): Double =
    PqCodebook(si)(c).map(w => w * w).sum.toDouble

  private def planeSql(i: Int): String =
    Planes(i).mkString("[", ", ", "]::DOUBLE[]")

  /** DuckDB twin of [[dot]] against plane i. */
  private def duckPlaneDot(i: Int): String =
    s"list_sum(list_transform(list_zip(embedding, ${planeSql(i)}), " +
      "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))"

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
        native(s)
        val e = Tables(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qa"), col("embedding").as("ea"))
        val all = e.select(col("vec_id").as("qb"), col("embedding").as("eb"))
        val w = Window.partitionBy("qa").orderBy(col("cos").desc, col("qb"))
        broadcast(q).crossJoin(all)
          .filter(col("qa") =!= col("qb"))
          .select(
            col("qa"), col("qb"),
            round(ncos(col("ea"), col("eb")), 6)
              .as("cos"))
          .withColumn("rn", row_number().over(w).cast("int"))
          .filter(col("rn") <= 5)
          .orderBy("qa", "rn")
      }),

    // Near-duplicate pairs by embedding cosine (the dense-vector twin of the
    // token-set dedup family in DedupOps).
    Q(
      "sim_cosine_neardup",
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
             |p AS (
             |  SELECT x.vec_id AS va, y.vec_id AS vb,
             |    list_sum(list_transform(list_zip(x.embedding, y.embedding),
             |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) AS dot,
             |    sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS na,
             |    sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nb
             |  FROM e x JOIN e y ON x.vec_id < y.vec_id)
             |SELECT va, vb, ROUND(dot / (na * nb), 6) AS cos
             |FROM p ORDER BY cos DESC, va, vb LIMIT 20""".stripMargin),
      (s, dir) => {
        native(s)
        val e = Tables(s, dir, "embeddings").filter(col("vec_id") < 200)
        val x = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
        val y = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
        x.join(y, col("va") < col("vb"))
          .select(col("va"), col("vb"),
            round(ncos(col("ea"), col("eb")), 6)
              .as("cos"))
          .orderBy(col("cos").desc, col("va"), col("vb"))
          .limit(20)
      }),

    // ANN via multi-table random-hyperplane LSH: L=4 hash tables of 4 sign
    // bits each (planes 4t..4t+3 -> 16 buckets per table); candidates = ids
    // sharing a (table, bucket) cell with the query, union over tables; then
    // exact cosine + top-3 within candidates. Each vector explodes into L
    // rows keyed (t, bucket) — an EQUI-join shuffle key, so at 100 TB this
    // hash-partitions by cell and never forms a pairwise product (an OR of
    // bucket equalities would degrade to nested-loop). Recall ~52% at 1/3 of
    // the data scanned on sf0.001 (asserted in AnnRecallSpec); deterministic
    // planes keep it oracle-checkable.
    Q(
      "sim_ann_lsh_topk", {
        def bucketSql(t: Int): String = (0 until 4)
          .map(i => s"(CASE WHEN ${duckPlaneDot(4 * t + i)} > 0 THEN ${1 << i} ELSE 0 END)")
          .mkString(" + ")
        val cells = (0 until NumTables)
          .map(t => s"SELECT vec_id, $t AS t, CAST(${bucketSql(t)} AS INT) AS bucket FROM embeddings")
          .mkString("\n  UNION ALL ")
        Some(s"""WITH cells AS ($cells),
                |cand AS (
                |  SELECT DISTINCT q.vec_id AS qa, c.vec_id AS qb
                |  FROM cells q JOIN cells c
                |    ON q.t = c.t AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
                |  WHERE q.vec_id < 20),
                |p AS (
                |  SELECT cand.qa, cand.qb,
                |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
                |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) AS dot,
                |    sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS na,
                |    sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nb
                |  FROM cand JOIN embeddings a ON cand.qa = a.vec_id
                |            JOIN embeddings b ON cand.qb = b.vec_id),
                |sc AS (SELECT qa, qb, ROUND(dot / (na * nb), 6) AS cos FROM p),
                |r AS (SELECT *, row_number() OVER (PARTITION BY qa
                |                                   ORDER BY cos DESC, qb) AS rn
                |      FROM sc)
                |SELECT qa, qb, cos, CAST(rn AS INT) AS rn
                |FROM r WHERE rn <= 3 ORDER BY qa, rn""".stripMargin)
      },
      (s, dir) => {
        native(s)
        val e = Tables(s, dir, "embeddings")
        def bucketCol(t: Int): Column = (0 until 4)
          .map(i => when(ndot(col("embedding"), planeLit(4 * t + i)) > 0, 1 << i).otherwise(0))
          .reduce(_ + _)
        val cells = (0 until NumTables).map { t =>
          e.select(col("vec_id"), lit(t).as("t"), bucketCol(t).cast("int").as("bucket"))
        }.reduce(_ unionAll _)
        val cand = cells.as("q")
          .join(cells.as("c"),
            col("q.t") === col("c.t") && col("q.bucket") === col("c.bucket") &&
              col("q.vec_id") =!= col("c.vec_id"))
          .filter(col("q.vec_id") < 20)
          .select(col("q.vec_id").as("qa"), col("c.vec_id").as("qb"))
          .distinct()
        val w = Window.partitionBy("qa").orderBy(col("cos").desc, col("qb"))
        cand
          .join(e.select(col("vec_id").as("qa"), col("embedding").as("ea")), "qa")
          .join(e.select(col("vec_id").as("qb"), col("embedding").as("eb2")), "qb")
          .select(col("qa"), col("qb"),
            round(ncos(col("ea"), col("eb2")), 6)
              .as("cos"))
          .withColumn("rn", row_number().over(w).cast("int"))
          .filter(col("rn") <= 3)
          .orderBy("qa", "rn")
      }),

    // Multimodal binary-column plumbing: text re-encoded as an opaque blob
    // with typed metadata, "decoded" by a deterministic stub (real decoders
    // aren't in this container — the Spark-side schema/plumbing is the real
    // part; frame_w/frame_h/n_frames stand in for image/video probe output).
    Q(
      "multimodal_decode_features",
      Some("""SELECT doc_id, lang, source,
             |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             |  md5(text) AS content_md5,
             |  CAST(octet_length(encode(text)) % 640 AS INT) AS frame_w,
             |  CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS frame_h,
             |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        native(s)
        val blob = encode(col("text"), "UTF-8")
        val nBytes = length(blob)
        Tables(s, dir, "documents")
          .select(
            col("doc_id"), col("lang"), col("source"),
            nBytes.cast("int").as("n_bytes"),
            md5(blob).as("content_md5"),
            (nBytes % 640).cast("int").as("frame_w"),
            ((nBytes * 7) % 480).cast("int").as("frame_h"),
            (nBytes % 30 + 1).cast("int").as("n_frames"))
          .orderBy("doc_id")
      }),

    // ANN via IVF (inverted-file index): coarse quantizer = 8 fixed
    // centroids (vectors 0..7 — deterministic, so oracle-checkable); every
    // vector is assigned to its nearest centroid (the inverted list), each
    // query probes its 2 nearest lists and exact-scores only those
    // candidates. At 100 TB the list id is the partition key — the classic
    // cluster-prune alternative to LSH bucketing.
    Q(
      "sim_ann_ivf_topk", {
        val dotQC =
          """list_sum(list_transform(list_zip(e.embedding, c.embedding),
            |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))""".stripMargin
        Some(s"""WITH cents AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 8),
                |dists AS (
                |  SELECT e.vec_id, c.cid,
                |    list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
                |      - 2 * $dotQC AS dist
                |  FROM embeddings e, cents c),
                |assigned AS (
                |  SELECT vec_id, cid FROM (
                |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                |    FROM dists) WHERE rn = 1),
                |probes AS (
                |  SELECT vec_id, cid FROM (
                |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                |    FROM dists WHERE vec_id < 20) WHERE rn <= 2),
                |cand AS (
                |  SELECT DISTINCT p.vec_id AS qa, a.vec_id AS qb
                |  FROM probes p JOIN assigned a ON p.cid = a.cid AND p.vec_id <> a.vec_id),
                |sc AS (
                |  SELECT cand.qa, cand.qb,
                |    ROUND(list_sum(list_transform(list_zip(x.embedding, y.embedding),
                |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
                |      / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
                |       * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6) AS cos
                |  FROM cand JOIN embeddings x ON cand.qa = x.vec_id
                |            JOIN embeddings y ON cand.qb = y.vec_id),
                |r AS (SELECT *, row_number() OVER (PARTITION BY qa ORDER BY cos DESC, qb) AS rn FROM sc)
                |SELECT qa, qb, cos, CAST(rn AS INT) AS rn
                |FROM r WHERE rn <= 3 ORDER BY qa, rn""".stripMargin)
      },
      (s, dir) => {
        native(s)
        val e = Tables(s, dir, "embeddings")
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("ce"))
        // |x - c|^2 - |x|^2 = |c|^2 - 2 x.c  (the |x|^2 term is rank-free)
        val dists = e.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cid"),
            (ndot(col("ce"), col("ce")) - lit(2.0) * ndot(col("embedding"), col("ce")))
              .as("dist"))
        val wd = Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))
        val ranked = dists.withColumn("rn", row_number().over(wd))
        val assigned = ranked.filter(col("rn") === 1)
          .select(col("vec_id").as("qb"), col("cid"))
        val probes = ranked.filter(col("vec_id") < 20 && col("rn") <= 2)
          .select(col("vec_id").as("qa"), col("cid"))
        val cand = probes.join(assigned, "cid")
          .filter(col("qa") =!= col("qb"))
          .select("qa", "qb").distinct()
        val ws = Window.partitionBy("qa").orderBy(col("cos").desc, col("qb"))
        cand
          .join(e.select(col("vec_id").as("qa"), col("embedding").as("ea")), "qa")
          .join(e.select(col("vec_id").as("qb"), col("embedding").as("eb2")), "qb")
          .select(col("qa"), col("qb"),
            round(ncos(col("ea"), col("eb2")), 6)
              .as("cos"))
          .withColumn("rn", row_number().over(ws).cast("int"))
          .filter(col("rn") <= 3)
          .orderBy("qa", "rn")
      }),

    // ANN via PRODUCT QUANTIZATION (asymmetric distance computation): the
    // 64-dim vector splits into 4 subspaces of 16 dims; each subspace
    // quantizes to the nearest of 4 fixed codewords, so every vector
    // compresses to 4 small codes (1 byte total vs 256 bytes of floats) —
    // at 100 TB the scan runs over the code table, never the raw vectors.
    // A query precomputes its 4x4 lookup table of exact sub-distances once;
    // per candidate the approximate distance is 4 table lookups. Fixed
    // integer codebook => both engines compute identical doubles and the
    // whole path is oracle-checkable.
    Q(
      "sim_ann_pq_topk", {
        def cbSql(si: Int, c: Int): String =
          PqCodebook(si)(c).mkString("[", ", ", "]::DOUBLE[]")
        def subSql(si: Int): String =
          s"embedding[${si * PqSubDim + 1}:${(si + 1) * PqSubDim}]"
        def dotSql(si: Int, c: Int): String =
          s"list_sum(list_transform(list_zip(${subSql(si)}, ${cbSql(si, c)}), " +
            "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))"
        def qqSql(si: Int): String =
          s"list_sum(list_transform(${subSql(si)}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        // code_s = index of first-minimal (cc - 2 v.c) over the 4 codewords.
        def codeSql(si: Int): String = {
          val ds = (0 until PqCodes).map(c => s"(${pqCc(si, c)} - 2 * ${dotSql(si, c)})")
          s"""CASE WHEN ${ds(0)} <= ${ds(1)} AND ${ds(0)} <= ${ds(2)} AND ${ds(0)} <= ${ds(3)} THEN 0
             |     WHEN ${ds(1)} <= ${ds(2)} AND ${ds(1)} <= ${ds(3)} THEN 1
             |     WHEN ${ds(2)} <= ${ds(3)} THEN 2 ELSE 3 END AS code$si""".stripMargin
        }
        val codeCols = (0 until PqSubs).map(codeSql).mkString(",\n")
        val lutCols = (for (si <- 0 until PqSubs; c <- 0 until PqCodes) yield
          s"${qqSql(si)} - 2 * ${dotSql(si, c)} + ${pqCc(si, c)} AS ql_${si}_$c")
          .mkString(",\n")
        val adistSql = (0 until PqSubs).map { si =>
          s"(CASE code$si ${(0 until PqCodes)
            .map(c => s"WHEN $c THEN ql_${si}_$c").mkString(" ")} END)"
        }.mkString(" + ")
        Some(s"""WITH codes AS (SELECT vec_id AS qb, $codeCols FROM embeddings),
                |q AS (SELECT vec_id AS qa, $lutCols FROM embeddings WHERE vec_id < 20),
                |p AS (SELECT qa, qb, $adistSql AS adist
                |      FROM q, codes WHERE qa <> qb),
                |r AS (SELECT qa, qb, adist,
                |        row_number() OVER (PARTITION BY qa ORDER BY adist, qb) AS rn
                |      FROM p)
                |SELECT qa, qb, ROUND(adist, 6) AS adist, CAST(rn AS INT) AS rn
                |FROM r WHERE rn <= 3 ORDER BY qa, rn""".stripMargin)
      },
      (s, dir) => {
        native(s)
        val e = Tables(s, dir, "embeddings")
        def subv(si: Int): Column =
          slice(col("embedding"), si * PqSubDim + 1, PqSubDim)
        def cbLit(si: Int, c: Int): Column =
          array(PqCodebook(si)(c).toIndexedSeq.map(w => lit(w.toFloat)): _*)
        val codeCols = (0 until PqSubs).map { si =>
          val ds = (0 until PqCodes).map(c =>
            lit(pqCc(si, c)) - lit(2.0) * ndot(subv(si), cbLit(si, c)))
          when(ds(0) <= ds(1) && ds(0) <= ds(2) && ds(0) <= ds(3), 0)
            .when(ds(1) <= ds(2) && ds(1) <= ds(3), 1)
            .when(ds(2) <= ds(3), 2)
            .otherwise(3)
            .as(s"code$si")
        }
        val codes = e.select((col("vec_id").as("qb") +: codeCols): _*)
        val lutCols = for (si <- 0 until PqSubs; c <- 0 until PqCodes) yield
          (ndot(subv(si), subv(si)) - lit(2.0) * ndot(subv(si), cbLit(si, c)) +
            lit(pqCc(si, c))).as(s"ql_${si}_$c")
        val q = e.filter(col("vec_id") < 20)
          .select((col("vec_id").as("qa") +: lutCols.toIndexedSeq): _*)
        val adist = (0 until PqSubs).map { si =>
          element_at(
            array((0 until PqCodes).map(c => col(s"ql_${si}_$c")): _*),
            col(s"code$si") + 1)
        }.reduce(_ + _)
        val w = Window.partitionBy("qa").orderBy(col("adist"), col("qb"))
        broadcast(q).crossJoin(codes)
          .filter(col("qa") =!= col("qb"))
          .withColumn("adist", adist)
          .withColumn("rn", row_number().over(w).cast("int"))
          .filter(col("rn") <= 3)
          .select(col("qa"), col("qb"), round(col("adist"), 6).as("adist"), col("rn"))
          .orderBy("qa", "rn")
      }),

    // The same stub decode through the typed per-partition batch path
    // (Dataset.mapPartitions — the JVM analog of mapInPandas): one decoder
    // instance per partition processes an iterator of blob records, exactly
    // the shape a real image/audio decoder needs (expensive init amortized
    // per partition, streaming batches, no driver collect). Result is
    // bit-identical to the declarative multimodal_decode_features, so it
    // shares that oracle.
    Q(
      "multimodal_decode_mappartitions",
      Some("""SELECT doc_id, lang, source,
             |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             |  md5(text) AS content_md5,
             |  CAST(octet_length(encode(text)) % 640 AS INT) AS frame_w,
             |  CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS frame_h,
             |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"),
            encode(col("text"), "UTF-8").as("blob"))
          .as[DocBlob]
          .mapPartitions { it =>
            // Per-partition "decoder" init (stands in for an image/audio
            // codec handle); reset per record.
            val md = java.security.MessageDigest.getInstance("MD5")
            it.map { d =>
              md.reset()
              val hex = md.digest(d.blob).map("%02x".format(_)).mkString
              val n = d.blob.length
              DocFeatures(d.doc_id, d.lang, d.source, n, hex,
                n % 640, (n * 7) % 480, n % 30 + 1)
            }
          }
          .toDF()
          .orderBy("doc_id")
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
      (s, dir) => {
        native(s) // register graft_dot — must not rely on session ordering
        Tables(s, dir, "documents")
          .join(Tables(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
          .select(
            col("doc_id"), col("n_chars"),
            size(split(col("text"), " ")).cast("int").as("n_tokens"),
            round(nnorm(col("embedding")), 4).as("l2"))
          .orderBy("doc_id")
      }))
}
