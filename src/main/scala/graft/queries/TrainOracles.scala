package graft.queries

/** DuckDB oracles for the iterative training family (§2.J).
  *
  * These loops were "no single-SQL oracle" while they used `math.pow`
  * (libm-dependent) — but with bias corrections computed by repeated
  * multiplication ([[graft.ml.GradientDescent]] `ipow`), every quantity in
  * the trace is (a) an exact-decimal sufficient statistic (bit-equal across
  * engines — the `agg_corr_covar` idiom), or (b) a fixed chain of IEEE-754
  * `+ - * / sqrt` scalar ops, which any engine reproduces bit-for-bit WHEN
  * THE OPERATION ORDER IS IDENTICAL. The fixed low iteration counts (3-5)
  * unroll into a CTE chain whose expressions mirror the Scala step
  * functions token for token: every product chain associates left, every
  * constant is written in e-notation so DuckDB parses it as DOUBLE (a bare
  * `0.9` literal would be DECIMAL and change the arithmetic), and the
  * gradient/SSE/update forms copy `GradientDescent.step`/`stepAdam`/`mse`
  * exactly. Iterations are unrolled at ORACLE-GENERATION time; the engine
  * side stays one distributed moments pass + driver arithmetic.
  */
private[queries] object TrainOracles {

  /** Decimal sum → double routed through VARCHAR: DuckDB's direct
    * DECIMAL→DOUBLE cast is not correctly rounded (measured 1-ulp-high on
    * sf0.001's Σ qty·price), while its VARCHAR→DOUBLE strtod is — and
    * Spark's Decimal.toDouble (BigDecimal.doubleValue) is correctly
    * rounded too, so only the string route makes both engines produce the
    * SAME double from the same exact decimal. An ulp here is not cosmetic:
    * the trace is a fixed-point-sensitive iteration, and a 1-ulp stat
    * shifted a round-6 boundary in testing.
    */
  private def d2d(sumExpr: String): String =
    s"CAST(CAST($sumExpr AS VARCHAR) AS DOUBLE)"

  /** Exact decimal moments of (x=l_quantity, y=l_extendedprice): the SQL
    * twin of `GradientDescent.moments` (same DECIMAL(18,6)/(30,10) policy
    * as `Fns.dsum`/`dsumWide`).
    */
  private val stats: String =
    s"""s AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${d2d("SUM(CAST(l_quantity AS DECIMAL(18,6)))")} AS sx,
       |    ${d2d("SUM(CAST(l_extendedprice AS DECIMAL(18,6)))")} AS sy,
       |    ${d2d("SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,10)))")} AS sxx,
       |    ${d2d("SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,10)))")} AS sxy,
       |    ${d2d("SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,10)))")} AS syy
       |  FROM lineitem)""".stripMargin

  /** Shared SSE/n probe — `GradientDescent.mse`, token for token. */
  private def mseExpr(p: String = ""): String =
    s"(w*w*${p}sxx + 2e0*w*b*${p}sx - 2e0*w*${p}sxy + ${p}n*b*b - 2e0*b*${p}sy + ${p}syy)/${p}n"

  /** One plain-GD iteration (`GradientDescent.step`, lr=1e-3):
    * gw = w·sxx + b·sx − sxy ; gb = w·sx + n·b − sy ;
    * w' = w − ((lr·2)·gw)/n (left-assoc, as Scala parses it).
    */
  private def gdIter(k: Int): String =
    s"""g$k AS (SELECT n, sx, sy, sxx, sxy, syy, w, b,
       |  w*sxx + b*sx - sxy AS gw, w*sx + n*b - sy AS gb,
       |  ${mseExpr()} AS mse
       |  FROM st${k - 1}),
       |st$k AS (SELECT n, sx, sy, sxx, sxy, syy, mse,
       |  w - 1e-3*2e0*gw/n AS w, b - 1e-3*2e0*gb/n AS b FROM g$k)""".stripMargin

  /** One Adam iteration (`GradientDescent.stepAdam`, lr=1e-3, b1=0.9,
    * b2=0.999, eps=1e-8). b1p/b2p carry the running 0.9^t / 0.999^t
    * multiply chains (the Scala `ipow` sequence); `carry` names extra
    * columns (eval-split stats) to thread through unchanged.
    */
  private def adamIter(k: Int, carry: Seq[String] = Nil): String = {
    val c = if (carry.isEmpty) "" else carry.mkString(", ", ", ", "")
    s"""g$k AS (SELECT n, sx, sy, sxx, sxy, syy, w, b, mw, mb, vw, vb, b1p, b2p$c,
       |  2e0*(w*sxx + b*sx - sxy)/n AS gw,
       |  2e0*(w*sx + n*b - sy)/n AS gb,
       |  ${mseExpr()} AS mse
       |  FROM st${k - 1}),
       |m$k AS (SELECT n, sx, sy, sxx, sxy, syy, w, b, mse$c,
       |  9e-1*mw + (1e0-9e-1)*gw AS mw,
       |  9e-1*mb + (1e0-9e-1)*gb AS mb,
       |  999e-3*vw + (1e0-999e-3)*gw*gw AS vw,
       |  999e-3*vb + (1e0-999e-3)*gb*gb AS vb,
       |  b1p*9e-1 AS b1p, b2p*999e-3 AS b2p
       |  FROM g$k),
       |st$k AS (SELECT n, sx, sy, sxx, sxy, syy, mw, mb, vw, vb, b1p, b2p, mse$c,
       |  w - 1e-3*(mw/(1e0-b1p))/(sqrt(vw/(1e0-b2p)) + 1e-8) AS w,
       |  b - 1e-3*(mb/(1e0-b1p))/(sqrt(vb/(1e0-b2p)) + 1e-8) AS b
       |  FROM m$k)""".stripMargin
  }

  /** `ml_train_gd_iterations`: (iter, w, b, mse) rows, mse pre-update. */
  def gdSql(iters: Int): String = {
    val ctes = (stats +:
      "st0 AS (SELECT *, 0e0 AS w, 0e0 AS b FROM s)" +:
      (1 to iters).map(gdIter)).mkString(",\n")
    val rows = (1 to iters)
      .map(k => s"SELECT CAST($k AS INT) AS iter, w, b, mse FROM st$k")
      .mkString("\nUNION ALL ")
    s"WITH $ctes\n$rows\nORDER BY iter"
  }

  /** `ml_train_adam_iterations`: same shape under Adam. */
  def adamSql(iters: Int): String = {
    val ctes = (stats +:
      """st0 AS (SELECT *, 0e0 AS w, 0e0 AS b, 0e0 AS mw, 0e0 AS mb,
        |  0e0 AS vw, 0e0 AS vb, 1e0 AS b1p, 1e0 AS b2p FROM s)""".stripMargin +:
      (1 to iters).map(adamIter(_))).mkString(",\n")
    val rows = (1 to iters)
      .map(k => s"SELECT CAST($k AS INT) AS iter, w, b, mse FROM st$k")
      .mkString("\nUNION ALL ")
    s"WITH $ctes\n$rows\nORDER BY iter"
  }

  /** `ml_train_checkpoint_resume`: the GD trace with the resumed leg's
    * columns duplicated and bit_equal=TRUE — the ENGINE asserts resumed ≡
    * uninterrupted internally (zip + raw-bits compare); the oracle pins
    * both legs to the independently computed SQL trace.
    */
  def resumeSql(iters: Int): String = {
    val ctes = (stats +:
      "st0 AS (SELECT *, 0e0 AS w, 0e0 AS b FROM s)" +:
      (1 to iters).map(gdIter)).mkString(",\n")
    val rows = (1 to iters)
      .map(k => s"""SELECT CAST($k AS INT) AS iter, w, b, mse,
                   |  w AS w_resumed, b AS b_resumed, mse AS mse_resumed,
                   |  TRUE AS bit_equal FROM st$k""".stripMargin)
      .mkString("\nUNION ALL ")
    s"WITH $ctes\n$rows\nORDER BY iter"
  }

  /** `ml_train_eval_epochs`: the seeded 90/10 split (SeededSplit's md5
    * bucket, the `ml_train_test_split` idiom) feeds ONE grouped moments
    * pass; each epoch is an Adam step on the train stats plus an MSE probe
    * of the post-update state on the eval stats. Output
    * (metric, epoch, value) rows.
    */
  def trainEvalSql(epochs: Int): String = {
    val evalCols = Seq("en", "esx", "esy", "esxx", "esxy", "esyy")
    val split =
      """li AS (
        |  SELECT CAST(l_orderkey*8 + l_linenumber AS VARCHAR) AS ks,
        |    l_quantity AS x, l_extendedprice AS y
        |  FROM lineitem),
        |sp AS (
        |  SELECT CASE WHEN CAST(('0x'||substr(md5(ks||':42'),1,15)) AS BIGINT)
        |           % 100 < 90
        |         THEN 'train' ELSE 'test' END AS split, x, y
        |  FROM li),
        |s AS (
        |  SELECT split, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(y AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(x * y AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(SUM(CAST(y * y AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM sp GROUP BY split),
        |st0 AS (
        |  SELECT t.n AS n, t.sx AS sx, t.sy AS sy, t.sxx AS sxx,
        |    t.sxy AS sxy, t.syy AS syy,
        |    e.n AS en, e.sx AS esx, e.sy AS esy, e.sxx AS esxx,
        |    e.sxy AS esxy, e.syy AS esyy,
        |    0e0 AS w, 0e0 AS b, 0e0 AS mw, 0e0 AS mb, 0e0 AS vw, 0e0 AS vb,
        |    1e0 AS b1p, 1e0 AS b2p
        |  FROM s t, s e WHERE t.split = 'train' AND e.split = 'test')""".stripMargin
    val iters = (1 to epochs).map(adamIter(_, evalCols))
    val rows = (1 to epochs).flatMap { k =>
      Seq(
        s"SELECT 'train_loss' AS metric, CAST($k AS INT) AS epoch, mse AS value FROM st$k",
        s"SELECT 'eval_loss' AS metric, CAST($k AS INT) AS epoch, ${mseExpr("e")} AS value FROM st$k")
    }.mkString("\nUNION ALL ")
    s"WITH ${(split +: iters).mkString(",\n")}\n$rows\nORDER BY epoch, metric"
  }
}
