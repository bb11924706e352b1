package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.Fns._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.H — scalar functions (string / date / math / array / JSON).
  *
  * Reference analogs: min-max render normalization
  * (`trainer/flax_inference.ipynb` cell 7), hex-palette string slicing
  * (cell 8), the 6-month horizon + epoch bucketing (`README.md:6`), per-pixel
  * channel arrays (`trainer/flax_model.py:83-94`), the config dict
  * (`:393-399`), and np.interp palette interpolation (cell 8).
  */
object Scalars extends QueryPack {

  def queries: Seq[Q] = Seq(
    // Global min-max normalize: one tiny agg broadcast against the table —
    // no per-row shuffle at any scale.
    Q(
      "scalar_minmax_normalize",
      Some("""SELECT o_orderkey, ROUND((o_totalprice - mn) / (mx - mn), 6) AS norm
             |FROM orders CROSS JOIN
             |  (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders) s
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val stats = o.agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
        o.crossJoin(broadcast(stats))
          .select(
            col("o_orderkey"),
            round((col("o_totalprice") - col("mn")) / (col("mx") - col("mn")), 6)
              .as("norm"))
          .oracleOrder("o_orderkey")
      }),

    // Bitwise function family (hash/sketch building blocks; DuckDB: xor()
    // function, Spark: ^ operator — same 2's-complement semantics).
    Q(
      "scalar_bitwise_funcs",
      Some("""SELECT event_id,
             |  event_id & 255 AS b_and,
             |  event_id | 4096 AS b_or,
             |  xor(event_id, 21845) AS b_xor,
             |  event_id << 3 AS b_shl,
             |  event_id >> 2 AS b_shr,
             |  CAST(bit_count(event_id) AS INT) AS b_pop
             |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "events")
          .filter(col("event_id") < 500)
          .select(
            col("event_id"),
            col("event_id").bitwiseAND(lit(255L)).as("b_and"),
            col("event_id").bitwiseOR(lit(4096L)).as("b_or"),
            col("event_id").bitwiseXOR(lit(21845L)).as("b_xor"),
            expr("event_id << 3").as("b_shl"),
            expr("event_id >> 2").as("b_shr"),
            bit_count(col("event_id")).cast("int").as("b_pop"))
          .oracleOrder("event_id")),

    Q(
      "scalar_string_funcs",
      Some("""SELECT doc_id, substr(text, 1, 20) AS prefix,
             |  CAST(length(text) AS BIGINT) AS len, upper(lang) AS lang_u,
             |  concat(lang, '-', source) AS tag,
             |  replace(source, 'src', 'S') AS src_code
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            substring(col("text"), 1, 20).as("prefix"),
            length(col("text")).cast("long").as("len"),
            upper(col("lang")).as("lang_u"),
            concat(col("lang"), lit("-"), col("source")).as("tag"),
            expr("replace(source, 'src', 'S')").as("src_code"))
          .oracleOrder("doc_id")),

    Q(
      "scalar_date_funcs",
      Some("""WITH b AS (
             |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket, o_totalprice
             |  FROM orders)
             |SELECT bucket, CAST(year(bucket) AS INT) AS y, CAST(month(bucket) AS INT) AS m,
             |  CAST(bucket + INTERVAL 6 MONTH AS DATE) AS bucket_plus6,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM b GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "orders")
          .select(
            date_trunc("month", col("o_orderdate")).cast("date").as("bucket"),
            col("o_totalprice"))
          .groupBy(
            col("bucket"),
            year(col("bucket")).cast("int").as("y"),
            month(col("bucket")).cast("int").as("m"),
            add_months(col("bucket"), 6).as("bucket_plus6"))
          .agg(dsum(col("o_totalprice")).as("rev"), cnt.as("n"))
          .oracleOrder("bucket")),

    // Array ops over the 64-dim embedding column; the element sum folds
    // left-to-right in both engines (Spark aggregate() vs DuckDB list_sum).
    Q(
      "scalar_array_funcs",
      Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS sz,
             |  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
             |  ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS total
             |FROM embeddings ORDER BY vec_id""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).cast("int").as("sz"),
            round(element_at(col("embedding"), 1).cast("double"), 6).as("first_elem"),
            round(
              aggregate(col("embedding"), lit(0.0),
                (acc, x) => acc + x.cast("double")), 4).as("total"))
          .oracleOrder("vec_id")),

    Q(
      "scalar_map_json",
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy("event_type")
          .agg(
            sum(get_json_object(col("props"), "$.k").cast("int")).cast("long").as("sum_k"),
            cnt.as("n"))
          .oracleOrder("event_type")),

    // np.interp over breakpoints (0,0)-(100,50)-(200,250) as pure arithmetic.
    Q(
      "scalar_piecewise_interp",
      Some("""SELECT event_id, value,
             |  ROUND(CASE WHEN value <= 100 THEN value * 0.5
             |             ELSE 50 + (value - 100) * 2.0 END, 6) AS interp
             |FROM events WHERE value >= 0 AND value <= 200
             |ORDER BY event_id""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "events")
          .filter(col("value") >= 0 && col("value") <= 200)
          .select(
            col("event_id"), col("value"),
            round(
              when(col("value") <= 100, col("value") * 0.5)
                .otherwise(lit(50) + (col("value") - 100) * 2.0), 6).as("interp"))
          .oracleOrder("event_id")),

    // URL parsing — the door to domain-level curation (per-domain caps,
    // blocklists, provenance stats all key on HOST). URLs are synthesized
    // deterministically from document fields, then Spark's codegen'd
    // parse_url extracts HOST / PATH / QUERY-param; the DuckDB twin uses
    // regexp_extract with one shared pattern per component, which pins the
    // (public, RFC-3986-ish) semantics the query relies on. The per-domain
    // rollup groups on the ~|sources| distinct hosts — tiny key space,
    // map-side combine collapses the corpus before the shuffle.
    Q(
      "scalar_url_parse",
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
             |      || '?lang=' || lang || '&ch=' || CAST(n_chars AS VARCHAR) AS url
             |  FROM documents),
             |p AS (
             |  SELECT doc_id,
             |    regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
             |    regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
             |    regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param
             |  FROM u)
             |SELECT host, lang_param, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
             |  CAST(MAX(length(path)) AS BIGINT) AS max_path_len
             |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        val url = concat(
          lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id").cast("string"), lit("?lang="), col("lang"),
          lit("&ch="), col("n_chars").cast("string"))
        Tables(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .select(
            col("doc_id"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"))
          .groupBy("host", "lang_param")
          .agg(
            cnt.as("n_docs"),
            min("doc_id").cast("long").as("first_doc"),
            max(length(col("path"))).cast("long").as("max_path_len"))
          .oracleOrder("host", "lang_param")
      }),

    // Haversine great-circle leg distances over each user's event trail —
    // the geodesic primitive of the reference's domain (geospatial rasters;
    // the generalization of pixel-grid adjacency to true sphere distance).
    // Points are derived deterministically from the event stream (lat from
    // the measure, lon from the event id); consecutive legs come from ONE
    // lag window on the same user_id shuffle the sessionizer uses.
    // Determinism: both engines evaluate the identical sin/cos/asin chain
    // on identical doubles; per-leg km is rounded to 4dp before the exact
    // decimal path sum, so libm last-ulp drift (~1e-12 km) sits 8 orders
    // below the rounding grain. The LEAST(1.0, …) guard keeps float
    // round-up at antipodal-ish legs from pushing asin out of domain.
    Q(
      "scalar_haversine_legs",
      Some("""WITH p AS (SELECT user_id, event_id, ts, value * 0.5 - 45 AS lat,
             |             CAST(event_id % 360 AS DOUBLE) - 180 AS lon FROM events),
             |l AS (SELECT user_id, lat, lon,
             |        lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
             |      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |d AS (SELECT user_id,
             |        2 * 6371.0088 * asin(LEAST(1.0, sqrt(
             |          sin(radians(lat - plat)/2) * sin(radians(lat - plat)/2)
             |          + cos(radians(plat)) * cos(radians(lat))
             |            * sin(radians(lon - plon)/2) * sin(radians(lon - plon)/2)))) AS leg
             |      FROM l WHERE plat IS NOT NULL)
             |SELECT CAST(user_id AS BIGINT) AS user_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_legs,
             |  ROUND(CAST(CAST(SUM(CAST(ROUND(leg, 4) AS DECIMAL(18,4)))
             |    AS VARCHAR) AS DOUBLE), 4) AS total_km
             |FROM d GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.DecimalType
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val dphi = radians(col("lat") - col("plat")) / 2
        val dlam = radians(col("lon") - col("plon")) / 2
        val leg = sin(dphi) * sin(dphi) +
          cos(radians(col("plat"))) * cos(radians(col("lat"))) *
            sin(dlam) * sin(dlam)
        Tables(s, dir, "events")
          .select(
            col("user_id"), col("event_id"), col("ts"),
            (col("value") * 0.5 - 45).as("lat"),
            (col("event_id") % 360).cast("double").minus(180).as("lon"))
          .select(
            col("user_id"), col("lat"), col("lon"),
            lag("lat", 1).over(w).as("plat"),
            lag("lon", 1).over(w).as("plon"))
          .filter(col("plat").isNotNull)
          .select(
            col("user_id").cast("long"),
            (asin(least(lit(1.0), sqrt(leg))) * 6371.0088 * 2).as("leg"))
          .groupBy("user_id")
          .agg(
            cnt.as("n_legs"),
            round(sum(round(col("leg"), 4).cast(DecimalType(18, 4)))
              .cast("double"), 4).as("total_km"))
          .oracleOrder("user_id")
      }))
}
