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

  /** `ml_train_logreg_gd`: logistic regression of (l_returnflag='R') on
    * l_quantity, GD over the COMPRESSED feature distribution. The
    * sufficient statistic is the 50-row (x, n, Σy) table — for a GLM on a
    * discrete feature the empirical distribution is the whole dataset, so
    * training is ONE scan then driver arithmetic at any epoch count (the
    * GradientDescent shape extended to a non-quadratic loss). Per-x
    * sigmoids pass through ROUND 10dp (only 50 distinct exp() inputs per
    * iteration — the perplexity-filter boundary argument), per-x ln terms
    * through ROUND 9dp, and every weighted term is a double cast to
    * DECIMAL(30,10) summed exactly — shuffle-order-free and bit-equal to
    * the driver's BigDecimal fold. Trace rows: (iter, post-update w, b,
    * nll of the INCOMING parameters) — the gdSql convention.
    */
  def logregSql(iters: Int): String = {
    val lstats =
      """t AS (
        |  SELECT l_quantity AS x, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS sy
        |  FROM lineitem GROUP BY 1),
        |nn AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM t)""".stripMargin
    def iter(k: Int): String =
      s"""p$k AS (
         |  SELECT x, n, sy,
         |    ROUND(1e0 / (1e0 + exp(-(w * x + b))), 10) AS p
         |  FROM t, st${k - 1}),
         |g$k AS (SELECT
         |    ${d2d(s"SUM(CAST(x * (n * p - sy) AS DECIMAL(30,10)))")} AS gw,
         |    ${d2d(s"SUM(CAST(n * p - sy AS DECIMAL(30,10)))")} AS gb,
         |    ${d2d(s"SUM(CAST(sy * ROUND(ln(p), 9) + (n - sy) * ROUND(ln(1e0 - p), 9) AS DECIMAL(30,10)))")} AS ll
         |  FROM p$k),
         |st$k AS (
         |  SELECT st${k - 1}.w - (1e-2 * g$k.gw) / nn.nn AS w,
         |         st${k - 1}.b - (1e-2 * g$k.gb) / nn.nn AS b,
         |         g$k.ll
         |  FROM st${k - 1}, g$k, nn)""".stripMargin
    val ctes = (lstats +: "st0 AS (SELECT 0e0 AS w, 0e0 AS b)" +:
      (1 to iters).map(iter)).mkString(",\n")
    val rows = (1 to iters)
      .map(k =>
        s"SELECT CAST($k AS INT) AS iter, st$k.w, st$k.b, " +
          s"ROUND(-st$k.ll / nn.nn, 6) AS nll FROM st$k, nn")
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

  /** `ml_conv_train_gd`: the learned-conv-kernel loop (ConvTrain). All
    * sufficient statistics are INTEGER-valued (patch counts, binomial
    * weights) summed as DECIMAL(38,0) and well under 2^53, so the
    * decimal→double conversion is exact on both engines (no VARCHAR route
    * needed); b/16 and C/256 are exact binary divisions. Each GD step and
    * the MSE/dist probes mirror ConvTrain.step/mse/distToTrue loop order
    * exactly: ak accumulates j=0..8 left-assoc, quad k-major over 81
    * terms, lr = n / trace(A) with the k=0..8 trace fold.
    */
  def convTrainSql(iters: Int): String = {
    val T = 9
    def bw(o: Int): Int = if (o == 0) 2 else 1
    val binW = for { dy <- -1 to 1; dx <- -1 to 1 } yield bw(dy) * bw(dx)
    // a(k)(j) column name for any (k,j): stats emit the upper triangle.
    def aN(k: Int, j: Int): String =
      if (k <= j) s"a_${k}_$j" else s"a_${j}_$k"
    val offsRows = (for { dy <- -1 to 1; dx <- -1 to 1 }
      yield s"($dy,$dx,${(dy + 1) * 3 + (dx + 1)})").mkString(",")
    val taps = (0 until T)
      .map(k => s"SUM(CASE WHEN o.k = $k THEN n.c ELSE 0 END) AS x$k")
      .mkString(",\n    ")
    val ynum = (0 until T).map(k => s"${binW(k)}*x$k").mkString(" + ")
    val gram = (for { k <- 0 until T; j <- k until T }
      yield s"SUM(CAST(x$k*x$j AS DECIMAL(38,0))) AS a_${k}_$j").mkString(",\n    ")
    val cross = (0 until T)
      .map(k => s"SUM(CAST(yn*x$k AS DECIMAL(38,0))) AS by_$k").mkString(",\n    ")
    val statCols =
      (for { k <- 0 until T; j <- k until T }
        yield s"CAST(a_${k}_$j AS DOUBLE) AS a_${k}_$j") ++
        (0 until T).map(k => s"CAST(by_$k AS DOUBLE)/16e0 AS b$k") :+
        "CAST(cy AS DOUBLE)/256e0 AS cy" :+ "CAST(n AS DOUBLE) AS n"
    val allStatNames =
      (for { k <- 0 until T; j <- k until T } yield s"a_${k}_$j") ++
        (0 until T).map(k => s"b$k") ++ Seq("cy", "n", "lr")
    val trace = (0 until T).map(k => aN(k, k)).mkString(" + ")
    val carry = allStatNames.mkString(", ")
    def ws(i: Int) = (0 until T).map(k => s"w${i}_$k")
    def quad(i: Int): String = (for { k <- 0 until T; j <- 0 until T }
      yield s"w${i}_$k*${aN(k, j)}*w${i}_$j").mkString(" + ")
    def lin(i: Int): String =
      (0 until T).map(k => s"w${i}_$k*b$k").mkString(" + ")
    val trueK = Seq("625e-4", "125e-3", "625e-4", "125e-3", "25e-2",
      "125e-3", "625e-4", "125e-3", "625e-4")
    def dist(i: Int): String = "sqrt(" + (0 until T)
      .map(k => s"(w${i}_$k - ${trueK(k)})*(w${i}_$k - ${trueK(k)})")
      .mkString(" + ") + ")"
    val iterCtes = (1 to iters).map { i =>
      val gs = (0 until T).map { k =>
        val ak = (0 until T).map(j => s"${aN(k, j)}*w${i - 1}_$j").mkString(" + ")
        s"2e0*(($ak) - b$k)/n AS g$k"
      }.mkString(",\n  ")
      val upd = (0 until T)
        .map(k => s"w${i - 1}_$k - lr*g$k AS w${i}_$k").mkString(",\n  ")
      s"""gg$i AS (SELECT $carry, ${ws(i - 1).mkString(", ")},
         |  $gs,
         |  ((${quad(i - 1)}) - 2e0*(${lin(i - 1)}) + cy)/n AS mse
         |  FROM cst${i - 1}),
         |cst$i AS (SELECT $carry, mse,
         |  $upd
         |  FROM gg$i)""".stripMargin
    }
    val rows = (1 to iters)
      .map(i => s"SELECT CAST($i AS INT) AS iter, mse, ${dist(i)} AS dist_true FROM cst$i")
      .mkString("\nUNION ALL ")
    s"""WITH grid AS (
       |  SELECT user_id AS u,
       |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS d,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |offs AS (SELECT * FROM (VALUES $offsRows) t(dy, dx, k)),
       |patch AS (
       |  SELECT g.u, g.d,
       |    $taps
       |  FROM grid g JOIN offs o ON TRUE
       |  JOIN grid n ON n.u = g.u + o.dy AND n.d = g.d + o.dx
       |  GROUP BY 1, 2),
       |py AS (SELECT *, $ynum AS yn FROM patch),
       |statrow AS (
       |  SELECT COUNT(*) AS n,
       |    $gram,
       |    $cross,
       |    SUM(CAST(yn*yn AS DECIMAL(38,0))) AS cy
       |  FROM py),
       |sd AS (SELECT ${statCols.mkString(",\n  ")} FROM statrow),
       |sl AS (SELECT *, n/($trace) AS lr FROM sd),
       |cst0 AS (SELECT *, ${(0 until T).map(k => s"0e0 AS w0_$k").mkString(", ")} FROM sl),
       |${iterCtes.mkString(",\n")}
       |$rows
       |ORDER BY iter""".stripMargin
  }

  /** `ml_kmeans_iterations`: Lloyd's with driver-held centroids
    * (KMeansLloyd). Portable because every DISCRETE quantity is robust and
    * every continuous output is rounded: assignments are argmins over
    * distances whose cross-engine difference is O(ulp) (summation order of
    * the 64-term dots differs from graft_dot's sequential fold — a flip
    * would need two centroids within ~1e-12 of equidistant, measure-zero
    * on real embeddings); per-cluster sums are exact DECIMAL (VARCHAR
    * route, see d2d); new centroids round to FLOAT on both sides; WCSS is
    * ROUND(·,4), absorbing the ulp-level fold-order noise. First-minimal
    * argmin tie-break (array_position of array_min) maps to
    * `ORDER BY dist, cl`. Empty clusters keep the previous centroid on
    * both sides.
    */
  def kmeansSql(iters: Int, k: Int = 8): String = {
    val preCtes =
      s"""ex AS (
         |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
         |    CAST(unnest(embedding) AS DOUBLE) AS xv
         |  FROM embeddings),
         |rx AS (SELECT vec_id, SUM(xv*xv) AS xx FROM ex GROUP BY 1),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cl, dim, xv AS cv
         |       FROM ex WHERE vec_id < $k)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      val p = i - 1
      val next =
        if (i == iters) "" // last iteration's updated centroids are unused
        else
          s""",
             |c$i AS (
             |  SELECT cl, dim, CAST(CAST(sj/nC AS FLOAT) AS DOUBLE) AS cv FROM cs$i
             |  UNION ALL
             |  SELECT pc.cl, pc.dim, pc.cv FROM c$p pc
             |  WHERE pc.cl NOT IN (SELECT DISTINCT cl FROM asg$i))""".stripMargin
      s"""d$i AS (
         |  SELECT x.vec_id, c.cl,
         |    SUM(c.cv*c.cv) - 2e0*SUM(x.xv*c.cv) AS dist
         |  FROM ex x JOIN c$p c ON x.dim = c.dim GROUP BY 1, 2),
         |asg$i AS (
         |  SELECT vec_id, cl FROM (
         |    SELECT vec_id, cl,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
         |    FROM d$i) WHERE rn = 1),
         |cs$i AS (
         |  SELECT a.cl, x.dim,
         |    ${d2d("SUM(CAST(x.xv AS DECIMAL(30,10)))")} AS sj,
         |    COUNT(*) AS nC
         |  FROM asg$i a JOIN ex x ON x.vec_id = a.vec_id GROUP BY 1, 2),
         |wc$i AS (
         |  SELECT a.cl, ${d2d("SUM(CAST(r.xx AS DECIMAL(30,10)))")} AS sxx,
         |    COUNT(*) AS nC
         |  FROM asg$i a JOIN rx r ON r.vec_id = a.vec_id GROUP BY 1),
         |dc$i AS (
         |  SELECT c.cl, SUM(c.cv*s.sj) AS dotcs, SUM(c.cv*c.cv) AS cc2
         |  FROM c$p c JOIN cs$i s ON s.cl = c.cl AND s.dim = c.dim GROUP BY 1),
         |it$i AS (
         |  SELECT SUM(w.sxx - 2e0*d.dotcs + w.nC*d.cc2) AS wcss,
         |    CAST(COUNT(*) AS INT) AS nonempty
         |  FROM wc$i w JOIN dc$i d ON d.cl = w.cl)$next""".stripMargin
    }
    val rows = (1 to iters)
      .map(i => s"SELECT CAST($i AS INT) AS iter, ROUND(wcss, 4) AS wcss, " +
        s"nonempty AS nonempty_clusters FROM it$i")
      .mkString("\nUNION ALL ")
    s"WITH ${(preCtes +: iterCtes).mkString(",\n")}\n$rows\nORDER BY iter"
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
