package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.J (transformer block components) — the north-star
  * training-pipeline extensions the reference's conv/dense model family
  * stops short of: LayerNorm/RMSNorm, rotary position embedding, scaled
  * dot-product attention, and a low-rank (LoRA) adapter matvec, each
  * relationalized over the `embeddings` table (FLOAT[64] vectors).
  *
  * Shared scale design: every query is a MAP-SIDE pass over the vectors —
  * per-row native dot products (`graft_dot`, whole-stage codegen) against
  * small literal weight vectors — followed by one tiny grouped aggregate
  * (10 labels / 32 positions / 16 buckets). Nothing shuffles except the
  * few-hundred-byte final groups, so the plans are embarrassingly parallel
  * at 100 TB: 1000 executors each fold their partitions and emit partial
  * decimal sums. Attention is the one genuinely pairwise operator, and its
  * quadratic stays GROUP-LOCAL (sequences of 8 tokens joined on their
  * sequence id — one co-partitioned shuffle, never a corpus-wide product).
  *
  * Exactness dialect: all learned weights are exact binary rationals
  * (k/16, k/128) so FLOAT literals and DOUBLE literals denote identical
  * values; dot products fold left-to-right on both engines (proven by the
  * cosine family); trig for RoPE is PRECOMPUTED on the JVM once per
  * (position, pair) and inlined as double literals into BOTH the Spark
  * plan and the DuckDB oracle — query time is trig-free, exactly how
  * production rotary caches work. Only attention calls a transcendental
  * (exp/ln) at query time, following the agg_softmax_xent precedent:
  * ROUND 8dp after the transcendental, exact DECIMAL sums after that.
  */
object TransformerOps extends QueryPack {

  /** Σ x_i — native dot against ones (x_i * 1.0 is exact, fold unchanged). */
  private def ndot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  private def fvec(xs: Seq[Double]): Column =
    typedlit[Array[Float]](xs.map(_.toFloat).toArray)

  /** Exact-decimal literal for a double that is an exact binary rational
    * (k/16, k/128 …): java.math.BigDecimal prints the exact expansion, so
    * the SQL literal parses back to the identical double in DuckDB.
    */
  private def exact(d: Double): String = new java.math.BigDecimal(d).toPlainString

  private def list(xs: Seq[Double], f: Double => String): String =
    xs.map(f).mkString("[", ", ", "]")

  // ---- deterministic "learned" parameters (integer-derived, see each use)
  private val Ones: Seq[Double] = Seq.fill(64)(1.0)
  private val LnW: Seq[Double] = (1 to 64).map(i => ((i * 37) % 11 - 5).toDouble)
  private val RmsW: Seq[Double] = (1 to 64).map(i => ((i * 23) % 13 - 6).toDouble)
  private val LnWSum: Double = LnW.sum

  def queries: Seq[Q] = Seq(

    // LayerNorm + RMSNorm statistics, sufficient-statistics form: the
    // normalized vector never materializes — Σ((x_i−μ)/σ·w_i) rewrites to
    // (x·w − μ·Σw)/σ with μ, σ from the same two native dots (x·1, x·x)
    // the dstddev dialect uses. Two passes of fused codegen per row, zero
    // allocation; the checksum weights w are a fixed integer probe vector
    // (a reduction witness: Σ of the normalized values alone would cancel
    // to ~0 by construction). ROUND 6dp per row, exact decimal group sums.
    Q(
      "ml_layernorm_rmsnorm",
      Some {
        val sx = "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.0))"
        val sxx = "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        val dw = s"list_sum(list_transform(list_zip(embedding, ${list(LnW, exact)}), z -> CAST(z[1] AS DOUBLE) * z[2]))"
        val dv = s"list_sum(list_transform(list_zip(embedding, ${list(RmsW, exact)}), z -> CAST(z[1] AS DOUBLE) * z[2]))"
        s"""WITH s AS (
           |  SELECT label, $sx AS sx, $sxx AS sxx, $dw AS dw, $dv AS dv
           |  FROM embeddings),
           |n AS (
           |  SELECT label,
           |    sqrt((sxx - sx * sx / 64.0) / 64.0 + 1e-5) AS sd,
           |    sqrt(sxx / 64.0 + 1e-5) AS rms,
           |    sx / 64.0 AS mu, dw, dv
           |  FROM s),
           |c AS (
           |  SELECT label,
           |    ROUND((dw - mu * (${exact(LnWSum)})) / sd, 6) AS ln_chk,
           |    ROUND(dv / rms, 6) AS rms_chk,
           |    ROUND(sd, 6) AS sd6
           |  FROM n)
           |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           |  ROUND(CAST(SUM(CAST(ln_chk AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS ln_avg,
           |  ROUND(CAST(SUM(CAST(rms_chk AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS rms_avg,
           |  ROUND(CAST(SUM(CAST(sd6 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS sd_avg
           |FROM c GROUP BY label ORDER BY label""".stripMargin
      },
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val x = col("embedding")
        val sx = ndot(x, fvec(Ones))
        val sxx = ndot(x, x)
        val mu = col("sx") / 64.0
        val sd = sqrt((col("sxx") - col("sx") * col("sx") / 64.0) / 64.0 + 1e-5)
        val rms = sqrt(col("sxx") / 64.0 + 1e-5)
        def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
        e.select(col("label"), sx.as("sx"), sxx.as("sxx"),
            ndot(x, fvec(LnW)).as("dw"), ndot(x, fvec(RmsW)).as("dv"))
          .select(col("label"),
            round((col("dw") - mu * lit(LnWSum)) / sd, 6).as("ln_chk"),
            round(col("dv") / rms, 6).as("rms_chk"),
            round(sd, 6).as("sd6"))
          .groupBy("label")
          .agg(
            count(lit(1)).cast("long").as("n"),
            round(sum(dec6(col("ln_chk"))).cast("double") / count(lit(1)), 6).as("ln_avg"),
            round(sum(dec6(col("rms_chk"))).cast("double") / count(lit(1)), 6).as("rms_avg"),
            round(sum(dec6(col("sd6"))).cast("double") / count(lit(1)), 6).as("sd_avg"))
          .oracleOrder("label")
      }),

    // Rotary position embedding with a PRECOMPUTED coefficient cache: the
    // (cos, sin) pair for every (position p = vec_id % 32, frequency j) is
    // folded with the integer probe weights into ONE 64-wide coefficient
    // vector per position on the JVM (m[2j−1] = cosθ·wa + sinθ·wb,
    // m[2j] = −sinθ·wa + cosθ·wb, θ = p·10000^(−2(j−1)/64)), so the rotated
    // checksum Σ_j (y1·wa + y2·wb) is exactly dot(x, m_p). Query time is
    // trig-free on both engines: Spark joins the 32-row broadcast cache and
    // zip-folds; the oracle carries the identical doubles as a VALUES list.
    // At 100 TB the cache is a few KB broadcast; the scan stays map-only.
    Q(
      "ml_rope_rotate",
      Some {
        val rows = RopeCoef.map { case (p, m) =>
          s"($p, ${list(m, _.toString)}::DOUBLE[])"
        }.mkString(",\n    ")
        s"""WITH m(pos, coef) AS (VALUES
           |    $rows),
           |c AS (
           |  SELECT CAST(e.vec_id % 32 AS INT) AS pos,
           |    ROUND(list_sum(list_transform(list_zip(e.embedding, m.coef),
           |      z -> CAST(z[1] AS DOUBLE) * z[2])), 4) AS chk
           |  FROM embeddings e JOIN m ON CAST(e.vec_id % 32 AS INT) = m.pos)
           |SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
           |  ROUND(CAST(SUM(CAST(chk AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS chk_avg
           |FROM c GROUP BY pos ORDER BY pos""".stripMargin
      },
      (s, dir) => {
        import s.implicits._
        val cache = RopeCoef.map { case (p, m) => (p, m) }.toDF("pos", "coef")
        val e = Tables(s, dir, "embeddings")
          .select((col("vec_id") % 32).cast("int").as("pos"), col("embedding"))
        val folded = aggregate(
          zip_with(col("embedding"), col("coef"), (x, m) => x.cast("double") * m),
          lit(0.0), (acc, v) => acc + v)
        e.join(broadcast(cache), "pos")
          .select(col("pos"), round(folded, 4).as("chk"))
          .groupBy("pos")
          .agg(
            count(lit(1)).cast("long").as("n"),
            round(sum(col("chk").cast(DecimalType(18, 4))).cast("double")
              / count(lit(1)), 4).as("chk_avg"))
          .oracleOrder("pos")
      }),

    // Scaled dot-product attention over 8-token sequences (gid = vec_id
    // div 8): first-token query against all keys in its sequence — scores
    // s = dot/√d·τ, max-subtracted softmax, then per-sequence attention
    // entropy and the argmax key, rolled up per gid-bucket. The quadratic
    // is group-local: both sides shuffle ONCE on gid (8×8 dots per group),
    // and all window functions reuse that single gid partitioning — the
    // 100 TB plan is one exchange, group-local compute, tiny rollup.
    // exp/ln follow the agg_softmax_xent dialect: ROUND 8dp after each
    // transcendental, exact decimal sums beyond.
    Q(
      "ml_attention_entropy",
      Some("""WITH t AS (
             |  SELECT vec_id // 8 AS gid, CAST(vec_id % 8 + 1 AS INT) AS kpos, embedding
             |  FROM embeddings),
             |p AS (
             |  SELECT k.gid, k.kpos,
             |    ROUND(list_sum(list_transform(list_zip(q.embedding, k.embedding),
             |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) * 4.0, 8) AS s
             |  FROM t q JOIN t k ON q.gid = k.gid AND q.kpos = 1),
             |x AS (
             |  SELECT gid, kpos,
             |    ROUND(exp(s - MAX(s) OVER (PARTITION BY gid)), 8) AS ex
             |  FROM p),
             |w AS (
             |  SELECT gid, kpos,
             |    ROUND(ex / CAST(SUM(CAST(ex AS DECIMAL(18,8))) OVER (PARTITION BY gid) AS DOUBLE), 6) AS w
             |  FROM x),
             |g AS (
             |  SELECT gid, kpos, w, MAX(w) OVER (PARTITION BY gid) AS maxw
             |  FROM w),
             |a AS (
             |  SELECT gid,
             |    ROUND(CAST(SUM(CAST(ROUND(CASE WHEN w > 0 THEN -w * ln(w) ELSE 0.0 END, 8)
             |      AS DECIMAL(18,8))) AS DOUBLE), 6) AS h,
             |    MAX(w) AS top_w,
             |    MIN(CASE WHEN w = maxw THEN kpos END) AS top_k
             |  FROM g GROUP BY gid)
             |SELECT CAST(gid % 16 AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
             |  ROUND(CAST(SUM(CAST(h AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS h_avg,
             |  ROUND(CAST(SUM(CAST(top_w AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS topw_avg,
             |  CAST(SUM(top_k) AS BIGINT) AS topk_sum
             |FROM a GROUP BY 1 ORDER BY bucket""".stripMargin),
      (s, dir) => {
        val t = Tables(s, dir, "embeddings")
          .select(expr("vec_id div 8").as("gid"),
            (col("vec_id") % 8 + 1).cast("int").as("kpos"), col("embedding"))
        val q = t.filter(col("kpos") === 1)
          .select(col("gid"), col("embedding").as("qe"))
        val byGid = Window.partitionBy("gid")
        val scored = t.join(q, "gid")
          .select(col("gid"), col("kpos"),
            round(ndot(col("qe"), col("embedding")) * 4.0, 8).as("s"))
          .withColumn("ex", round(exp(col("s") - max("s").over(byGid)), 8))
          .withColumn("w", round(col("ex") /
            sum(col("ex").cast(DecimalType(18, 8))).over(byGid).cast("double"), 6))
          .withColumn("maxw", max("w").over(byGid))
        val ent = round(when(col("w") > 0, -col("w") * log(col("w"))).otherwise(0.0), 8)
        scored.groupBy("gid")
          .agg(
            round(sum(ent.cast(DecimalType(18, 8))).cast("double"), 6).as("h"),
            max("w").as("top_w"),
            min(when(col("w") === col("maxw"), col("kpos"))).as("top_k"))
          .groupBy((col("gid") % 16).cast("int").as("bucket"))
          .agg(
            count(lit(1)).cast("long").as("n"),
            round(sum(col("h").cast(DecimalType(18, 6))).cast("double")
              / count(lit(1)), 6).as("h_avg"),
            round(sum(col("top_w").cast(DecimalType(18, 6))).cast("double")
              / count(lit(1)), 6).as("topw_avg"),
            sum("top_k").cast("long").as("topk_sum"))
          .oracleOrder("bucket")
      }),

    // LoRA adapter matvec, merge-then-apply identity: y = D·x + α·B(A·x)
    // with rank-4 A (4 native dots per row — the explicit low-rank path),
    // diagonal dense D, and the checksum probe v folded through B on the
    // JVM (Σ_i y_i·v_i = x·(D∘v) + α·Σ_j h_j·(B^T v)_j — the standard
    // merged-adapter algebra). Every parameter is an exact binary rational
    // (k/16, k/128), so float literals, double literals, and decimal SQL
    // literals all denote identical values: the query is bit-exact with
    // zero rounding risk until the single final ROUND.
    Q(
      "ml_lora_matvec",
      Some {
        val hs = (1 to 4).map { j =>
          s"list_sum(list_transform(list_zip(embedding, ${list(LoraA(j - 1), exact)}), z -> CAST(z[1] AS DOUBLE) * z[2])) AS h$j"
        }.mkString(",\n    ")
        val merged = (1 to 4).map(j => s"h$j * (${exact(LoraBtv(j - 1))})").mkString(" + ")
        s"""WITH s AS (
           |  SELECT label,
           |    list_sum(list_transform(list_zip(embedding, ${list(LoraDv, exact)}), z -> CAST(z[1] AS DOUBLE) * z[2])) AS dx,
           |    $hs
           |  FROM embeddings),
           |c AS (
           |  SELECT label,
           |    ROUND(dx + 0.5 * ($merged), 6) AS chk,
           |    ROUND(h1, 6) AS h1r
           |  FROM s)
           |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           |  ROUND(CAST(SUM(CAST(chk AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS lora_avg,
           |  ROUND(CAST(SUM(CAST(h1r AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS h1_avg
           |FROM c GROUP BY label ORDER BY label""".stripMargin
      },
      (s, dir) => {
        val x = col("embedding")
        val merged = (1 to 4).map(j => col(s"h$j") * lit(LoraBtv(j - 1)))
          .reduceLeft(_ + _)
        Tables(s, dir, "embeddings")
          .select(col("label") +: ndot(x, fvec(LoraDv)).as("dx") +:
            (1 to 4).map(j => ndot(x, fvec(LoraA(j - 1))).as(s"h$j")): _*)
          .select(col("label"),
            round(col("dx") + lit(0.5) * merged, 6).as("chk"),
            round(col("h1"), 6).as("h1r"))
          .groupBy("label")
          .agg(
            count(lit(1)).cast("long").as("n"),
            round(sum(col("chk").cast(DecimalType(18, 6))).cast("double")
              / count(lit(1)), 6).as("lora_avg"),
            round(sum(col("h1r").cast(DecimalType(18, 6))).cast("double")
              / count(lit(1)), 6).as("h1_avg"))
          .oracleOrder("label")
      }))

  /** Rotary cache: per position p ∈ [0,32), the 64-wide merged coefficient
    * vector (see ml_rope_rotate). Computed once on the JVM; both the Spark
    * broadcast table and the oracle VALUES list carry these exact doubles
    * (Double.toString shortest-repr round-trips identically in DuckDB).
    */
  private[queries] val RopeCoef: Seq[(Int, Seq[Double])] = (0 until 32).map { p =>
    val m = (1 to 32).flatMap { j =>
      val theta = p * math.pow(10000.0, -(2.0 * (j - 1)) / 64.0)
      val c = math.cos(theta)
      val s = math.sin(theta)
      val wa = ((j * 29) % 13 - 6).toDouble
      val wb = ((j * 19) % 11 - 5).toDouble
      Seq(c * wa + s * wb, -s * wa + c * wb)
    }
    (p, m)
  }

  /** LoRA down-projection A (4×64), entries k/16 ∈ [−9/16, 9/16]. */
  private[queries] val LoraA: Seq[Seq[Double]] = (1 to 4).map { j =>
    (1 to 64).map(i => ((j * 31 + i * 17) % 19 - 9) / 16.0)
  }

  /** Up-projection B (64×4) entries k/16; folded against the integer probe
    * v_i = ((i·23+5) % 13) − 6 into B^T·v (exact sums of k/16).
    */
  private[queries] val LoraBtv: Seq[Double] = (1 to 4).map { j =>
    (1 to 64).map { i =>
      val b = ((i * 13 + j * 7) % 17 - 8) / 16.0
      val v = ((i * 23 + 5) % 13 - 6).toDouble
      b * v
    }.sum
  }

  /** Diagonal dense path D∘v: d_i = 1 + (i%7)/128, times the probe v_i —
    * exact binary rationals, float-representable.
    */
  private[queries] val LoraDv: Seq[Double] = (1 to 64).map { i =>
    (1.0 + (i % 7) / 128.0) * (((i * 23 + 5) % 13) - 6).toDouble
  }
}
