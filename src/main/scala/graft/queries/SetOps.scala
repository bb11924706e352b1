package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.Fns._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.G — set operations.
  *
  * Reference analogs: np.concatenate across npz shards
  * (`trainer/flax_model.py:118-120` — UNION ALL), holdout = all - train
  * (`:126-131` — EXCEPT), all-keys-present intersection (`:62-64` —
  * INTERSECT).
  */
object SetOps extends QueryPack {

  def queries: Seq[Q] = Seq(
    Q(
      "union_all_concat",
      Some("""WITH u AS (
             |  SELECT * FROM events WHERE ts <  TIMESTAMP '2024-01-16 00:00:00'
             |  UNION ALL
             |  SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
             |SELECT CAST(date_trunc('month', ts) AS DATE) AS month, event_type,
             |       CAST(COUNT(*) AS BIGINT) AS n
             |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        ev.filter(col("ts") < cut)
          .unionAll(ev.filter(col("ts") >= cut))
          .groupBy(
            date_trunc("month", col("ts")).cast("date").as("month"),
            col("event_type"))
          .agg(cnt.as("n"))
          .oracleOrder("month", "event_type")
      }),

    Q(
      "except_holdout",
      Some("""SELECT c_custkey FROM customer
             |EXCEPT
             |SELECT o_custkey AS c_custkey FROM orders
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "customer").select("c_custkey")
          .except(Tables(s, dir, "orders").select(col("o_custkey").as("c_custkey")))
          .oracleOrder("c_custkey")),

    Q(
      "intersect_common",
      Some("""SELECT l_partkey AS p_partkey FROM lineitem
             |INTERSECT
             |SELECT p_partkey FROM part WHERE p_size > 25
             |ORDER BY p_partkey""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "lineitem").select(col("l_partkey").as("p_partkey"))
          .intersect(Tables(s, dir, "part").filter(col("p_size") > 25).select("p_partkey"))
          .oracleOrder("p_partkey"),
      // Output cardinality tracks the distinct-key volume (data-linear) —
      // declared for the scale probe (VERDICT r14 item 8).
      outputLinear = true))
}
