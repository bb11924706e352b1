package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.Fns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.B — projection / filter / cleaning.
  *
  * Reference analogs: channel selection (`trainer/flax_inference.ipynb` cells
  * 7/17), the [200, 330] K validity mask + clip + smoothed imputation
  * (`trainer/flax_model.py:70-95`), and skipping incomplete examples
  * (`:62-64`).
  */
object Cleaning extends QueryPack {

  def queries: Seq[Q] = Seq(
    Q(
      "project_select_channel",
      Some("""SELECT p_partkey, p_brand, p_retailprice
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "part")
          .select("p_partkey", "p_brand", "p_retailprice")
          .oracleOrder("p_partkey")),

    Q(
      "filter_range_validity",
      Some("""SELECT * FROM lineitem WHERE l_quantity BETWEEN 10 AND 20
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(col("l_quantity").between(10, 20))
          .oracleOrder("l_orderkey", "l_linenumber")),

    Q(
      "filter_compound_or",
      Some("""SELECT event_id, value FROM events
             |WHERE value < 10 OR value > 180 ORDER BY event_id""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "events")
          .filter(col("value") < 10 || col("value") > 180)
          .select("event_id", "value")
          .oracleOrder("event_id")),

    Q(
      "clip_least_greatest",
      Some("""SELECT o_orderkey,
             |       ROUND(greatest(1000.0, least(50000.0, o_totalprice)), 2) AS clipped
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            round(greatest(lit(1000.0), least(lit(50000.0), col("o_totalprice"))), 2)
              .as("clipped"))
          .oracleOrder("o_orderkey")),

    // np.where(invalid, smoothed, original): replace outliers by the exact
    // per-group mean (decimal-sum window, order-independent at any scale).
    Q(
      "impute_when_otherwise",
      Some("""SELECT event_id, event_type,
             |  ROUND(CASE WHEN value > 190
             |    THEN CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY event_type) AS DOUBLE)
             |         / COUNT(*) OVER (PARTITION BY event_type)
             |    ELSE value END, 6) AS imputed
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("event_type")
        val mean =
          sum(col("value").cast(DecimalType(18, 6))).over(w).cast("double") /
            count(lit(1)).over(w)
        Tables(s, dir, "events")
          .select(
            col("event_id"),
            col("event_type"),
            round(when(col("value") > 190, mean).otherwise(col("value")), 6)
              .as("imputed"))
          .oracleOrder("event_id")
      }),

    // The reference's actual cleaning pipeline composed end-to-end
    // (trainer/flax_model.py:79-95): cell values outside the valid range
    // are replaced by the GAUSSIAN-smoothed 3x3-neighborhood value
    // (`gaussian_filter(..., sigma=1)`, flax_model.py:73 — smoothing reads
    // ALL cells, invalid included, exactly like the reference), then the
    // whole surface is clipped to the range. The kernel is the binomial
    // [1,2,1]⊗[1,2,1]/16 — the standard fixed-RATIONAL discretization of
    // the sigma=1 Gaussian — carried as an integer `w` column on the
    // broadcast offset table so the weighted neighbor sums stay exact
    // DECIMAL. Grid = (user, day) over events, valid range = [10, 180]
    // (analog of the [200, 330] K LST band). The offset table broadcasts;
    // the grid shuffles once on its key. Numerics: per-cell and weighted
    // neighbor sums stay exact DECIMAL until ONE final double division, so
    // every emitted double is bit-identical across engines and shuffle
    // orders — no ROUND knife-edges (an intermediate double->DECIMAL(30,10)
    // re-cast here once manufactured an exact round-half tie at sf0.01).
    Q(
      "clean_impute_neighborhood_clip",
      Some("""WITH grid AS (
             |  SELECT user_id AS u,
             |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS d,
             |         SUM(CAST(value AS DECIMAL(18,6))) AS sv,
             |         COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |offs AS (SELECT a.dy, b.dx, a.wy * b.wx AS w
             |         FROM (VALUES (-1, 1), (0, 2), (1, 1)) a(dy, wy),
             |              (VALUES (-1, 1), (0, 2), (1, 1)) b(dx, wx)),
             |sm AS (
             |  SELECT g.u, g.d,
             |    CAST(g.sv AS DOUBLE) / g.n AS v,
             |    CAST(SUM(o.w * ng.sv) AS DOUBLE) / SUM(o.w * ng.n) AS smoothed
             |  FROM grid g JOIN offs o ON TRUE
             |  JOIN grid ng ON ng.u = g.u + o.dy AND ng.d = g.d + o.dx
             |  GROUP BY g.u, g.d, g.sv, g.n)
             |SELECT u, d,
             |  greatest(10.0, least(180.0,
             |    CASE WHEN v < 10 OR v > 180 THEN smoothed ELSE v END)) AS cleaned
             |FROM sm ORDER BY u, d""".stripMargin),
      (s, dir) => {
        // Cell sums as exact cents longs (Fns.cents — value is exact 2-dp):
        // value-identical to the oracle's DECIMAL(18,6) cell sums, with the
        // /100.0 folded into each consumer's double conversion.
        val grid = Tables(s, dir, "events")
          .groupBy(
            col("user_id").as("u"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("int").as("d"))
          .agg(
            sum(cents(col("value"))).as("sv"),
            cnt.as("n"))
        // Binomial sigma=1 kernel: weight = wy(dy) * wx(dx), wy = (1,2,1).
        def bw(o: Int): Int = if (o == 0) 2 else 1
        val offs = s.createDataFrame(
          for { dy <- Seq(-1, 0, 1); dx <- Seq(-1, 0, 1) }
            yield (dy, dx, bw(dy) * bw(dx)))
          .toDF("dy", "dx", "w")
        val ng = grid.select(
          col("u").as("nu"), col("d").as("nd"),
          col("sv").as("nsv"), col("n").as("nn"))
        val sm = grid.crossJoin(broadcast(offs))
          .join(ng, col("nu") === col("u") + col("dy") && col("nd") === col("d") + col("dx"))
          .groupBy("u", "d", "sv", "n")
          .agg(
            (sum(col("w") * col("nsv")).cast("double") / 100.0 /
              sum(col("w") * col("nn"))).as("smoothed"))
          .withColumn("v", col("sv").cast("double") / 100.0 / col("n"))
        sm.select(
          col("u"), col("d"),
          greatest(lit(10.0), least(lit(180.0),
            when(col("v") < 10 || col("v") > 180, col("smoothed"))
              .otherwise(col("v")))).as("cleaned"))
          .oracleOrder("u", "d")
      }),

    Q(
      "dropna_invalid_rows",
      Some("""SELECT doc_id, lang FROM documents
             |WHERE lang IS NOT NULL AND n_chars > 50 ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "documents")
          .na.drop(Seq("lang"))
          .filter(col("n_chars") > 50)
          .select("doc_id", "lang")
          .oracleOrder("doc_id")))
}
