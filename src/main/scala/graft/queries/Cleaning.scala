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
          .orderBy("p_partkey")),

    Q(
      "filter_range_validity",
      Some("""SELECT * FROM lineitem WHERE l_quantity BETWEEN 10 AND 20
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(col("l_quantity").between(10, 20))
          .orderBy("l_orderkey", "l_linenumber")),

    Q(
      "filter_compound_or",
      Some("""SELECT event_id, value FROM events
             |WHERE value < 10 OR value > 180 ORDER BY event_id""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "events")
          .filter(col("value") < 10 || col("value") > 180)
          .select("event_id", "value")
          .orderBy("event_id")),

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
          .orderBy("o_orderkey")),

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
          .orderBy("event_id")
      }),

    // The reference's actual cleaning pipeline composed end-to-end
    // (trainer/flax_model.py:79-95): values outside the valid range are
    // replaced by their smoothed 3x3-neighborhood mean (the relational
    // gaussian_filter analog — smoothing reads ALL cells, invalid included,
    // exactly like the reference), then the whole surface is clipped to the
    // range. Grid = (user, day) over events, valid range = [10, 180]
    // (analog of the [200, 330] K LST band). The offset table broadcasts;
    // the grid shuffles once on its key; neighbor sums are exact DECIMAL so
    // merge order cannot perturb the imputed values at any scale.
    Q(
      "clean_impute_neighborhood_clip",
      Some("""WITH grid AS (
             |  SELECT user_id AS u,
             |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS d,
             |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
             |  FROM events GROUP BY 1, 2),
             |offs AS (SELECT a.dy, b.dx
             |         FROM (VALUES (-1), (0), (1)) a(dy), (VALUES (-1), (0), (1)) b(dx)),
             |sm AS (
             |  SELECT g.u, g.d, g.v,
             |    CAST(SUM(CAST(n.v AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS smoothed
             |  FROM grid g JOIN offs o ON TRUE
             |  JOIN grid n ON n.u = g.u + o.dy AND n.d = g.d + o.dx
             |  GROUP BY 1, 2, 3)
             |SELECT u, d,
             |  ROUND(greatest(10.0, least(180.0,
             |    CASE WHEN v < 10 OR v > 180 THEN smoothed ELSE v END)), 6) AS cleaned
             |FROM sm ORDER BY u, d""".stripMargin),
      (s, dir) => {
        val grid = Tables(s, dir, "events")
          .groupBy(
            col("user_id").as("u"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("int").as("d"))
          .agg((dsum(col("value")) / cnt).as("v"))
        val offs = s.createDataFrame(
          for { dy <- Seq(-1, 0, 1); dx <- Seq(-1, 0, 1) } yield (dy, dx))
          .toDF("dy", "dx")
        val n = grid.select(
          col("u").as("nu"), col("d").as("nd"), col("v").as("nv"))
        val sm = grid.crossJoin(broadcast(offs))
          .join(n, col("nu") === col("u") + col("dy") && col("nd") === col("d") + col("dx"))
          .groupBy("u", "d", "v")
          .agg((sum(col("nv").cast(DecimalType(30, 10))).cast("double") / cnt)
            .as("smoothed"))
        sm.select(
          col("u"), col("d"),
          round(greatest(lit(10.0), least(lit(180.0),
            when(col("v") < 10 || col("v") > 180, col("smoothed"))
              .otherwise(col("v")))), 6).as("cleaned"))
          .orderBy("u", "d")
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
          .orderBy("doc_id")))
}
