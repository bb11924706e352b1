package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.Fns._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.K (text) — LLM-data-pipeline text analysis + dedup.
  *
  * Tokenize/explode, TF-IDF, exact hash dedup, and exact-Jaccard near-dup
  * pairs (the MinHash/LSH approximation lives in
  * `graft.functions.MinHash` + `dedup_minhash_lsh`). All token pipelines
  * shuffle on the token key (partial-aggregated), never on raw text.
  */
object TextOps extends QueryPack {

  def queries: Seq[Q] = Seq(
    Q(
      "text_tokenize_wordcount",
      Some("""SELECT token, CAST(COUNT(*) AS BIGINT) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS token
             |      FROM documents WHERE lang = 'en') t
             |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "documents")
          .filter(col("lang") === "en")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token")
          .agg(cnt.as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20)),

    Q(
      "text_tfidf_topterms",
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
             |n AS (SELECT COUNT(*) AS n FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.term,
             |    ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
             |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
             |  WHERE tf.doc_id < 50),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |                                   ORDER BY tfidf DESC, term) AS rn
             |      FROM scored)
             |SELECT doc_id, term, tfidf, CAST(rn AS INT) AS rn
             |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin),
      (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(cnt.as("tf"))
        val dfreq = toks.groupBy("term").agg(countDistinct("doc_id").as("df"))
        // Corpus N stays IN-PLAN: a 1-row aggregate broadcast-cross-joined
        // onto the scored rows (same pattern as scalar_minmax_normalize)
        // instead of a separate driver-side count() job.
        val n1 = Tables(s, dir, "documents")
          .agg(cnt.cast("double").as("corpus_n"))
        val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
        tf.filter(col("doc_id") < 50)
          .join(dfreq, "term")
          .crossJoin(broadcast(n1))
          .select(
            col("doc_id"), col("term"),
            round(col("tf") * log(col("corpus_n") / col("df")), 6).as("tfidf"))
          .withColumn("rn", row_number().over(w).cast("int"))
          .filter(col("rn") <= 3)
          .select("doc_id", "term", "tfidf", "rn")
          .oracleOrder("doc_id", "rn")
      }),

    // Exact dedup by normalized content hash; representative = min doc_id.
    Q(
      "dedup_exact_hash",
      Some("""SELECT md5(lower(trim(text))) AS content_hash,
             |  CAST(MIN(doc_id) AS BIGINT) AS rep_doc,
             |  CAST(COUNT(*) AS BIGINT) AS n_dups
             |FROM documents
             |GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY content_hash""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "documents")
          .groupBy(md5(lower(trim(col("text")))).as("content_hash"))
          .agg(min("doc_id").cast("long").as("rep_doc"), cnt.as("n_dups"))
          .filter(col("n_dups") > 1)
          .oracleOrder("content_hash")),

    // Exact near-dup pairs: token-key self-join computes |A n B| without a
    // doc x doc cross product — the same inverted-index shape LSH banding
    // produces, here with exact Jaccard. Hot-token bound: the self-join's
    // cost is sum(df^2) over posting lists, so one stopword appearing in
    // every document would alone re-create the all-pairs product. Tokens
    // with df > 50 (half this corpus window) are dropped from the index
    // FIRST and Jaccard is computed over the remaining discriminative
    // vocabulary — at 100 TB this caps any posting list, and stopwords
    // carry no near-dup signal anyway.
    Q(
      "dedup_jaccard_pairs",
      Some("""WITH d AS (SELECT doc_id, text FROM documents
             |           WHERE lang = 'en' AND doc_id < 100),
             |t0 AS (SELECT DISTINCT doc_id, tok FROM
             |        (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d) x),
             |t AS (SELECT doc_id, tok FROM
             |        (SELECT doc_id, tok, COUNT(*) OVER (PARTITION BY tok) AS df FROM t0) y
             |      WHERE df <= 50),
             |sz AS (SELECT doc_id, COUNT(*) AS sz FROM t GROUP BY 1),
             |inter AS (
             |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
             |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT da, db,
             |  ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
             |FROM inter
             |JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
             |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
             |ORDER BY da, db""".stripMargin),
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .filter(col("lang") === "en" && col("doc_id") < 100)
        val t0 = d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .distinct()
        val t = t0
          .withColumn("df", count(lit(1)).over(Window.partitionBy("tok")))
          .filter(col("df") <= 50)
          .select("doc_id", "tok")
        val sz = t.groupBy("doc_id").agg(cnt.as("sz"))
        val inter = t.as("a")
          .join(t.as("b"),
            col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(cnt.as("i"))
        val jac = col("i").cast("double") / (col("sa") + col("sb") - col("i"))
        inter
          .join(sz.select(col("doc_id").as("da"), col("sz").as("sa")), "da")
          .join(sz.select(col("doc_id").as("db"), col("sz").as("sb")), "db")
          .filter(jac >= 0.8)
          .select(col("da"), col("db"), round(jac, 6).as("jaccard"))
          .oracleOrder("da", "db")
      }),

    // BM25 ranked retrieval (Okapi, k1=1.2 b=0.75, the BM25+ idf form
    // ln(1+(N-df+.5)/(df+.5)) so common terms keep a positive weight) for a
    // fixed conjunctive term set — the lexical-search twin of the dense
    // `sim_cosine_topk` path. Shape at scale: the corpus is touched ONCE to
    // build (doc,term,tf) + doc lengths; the query-term filter cuts the
    // posting join to |q| lists BEFORE any shuffle, and the global stats
    // (N, avgdl) ride in as a broadcast 1-row aggregate — nothing here is
    // per-query-corpus-sized except the |q| posting lists themselves.
    // Determinism: per-(doc,term) score rounded to 6dp, then decimal-summed
    // (order-free); LN inputs are integer-exact doubles both sides.
    Q(
      "sim_bm25_topk",
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
             |dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY 1),
             |stats AS (SELECT CAST(SUM(CAST(dl AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avgdl,
             |                 CAST(COUNT(*) AS DOUBLE) AS n FROM dl),
             |qt AS (SELECT unnest(['join','filter','vector']) AS term),
             |tf AS (SELECT t.doc_id, t.term, CAST(COUNT(*) AS DOUBLE) AS tf
             |       FROM toks t JOIN qt USING (term) GROUP BY 1,2),
             |df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
             |       FROM toks JOIN qt USING (term) GROUP BY 1),
             |sc AS (SELECT tf.doc_id,
             |         ROUND(LN(1 + (s.n - df.df + 0.5)/(df.df + 0.5)) *
             |               tf.tf*2.2/(tf.tf + 1.2*(0.25 + 0.75*dl.dl/s.avgdl)), 6) AS term_score
             |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s),
             |tot AS (SELECT doc_id,
             |          CAST(CAST(SUM(CAST(term_score AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS bm25
             |        FROM sc GROUP BY 1),
             |r AS (SELECT doc_id, bm25, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn FROM tot)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, bm25, CAST(rn AS INT) AS rn
             |FROM r WHERE rn <= 20 ORDER BY rn""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val qTerms = Seq("join", "filter", "vector")
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        // Doc lengths and per-term tf/df are the inverted-index statistics
        // a search engine builds at INDEX time; staged once per
        // (session, dir) — scoring + top-k below run per query.
        val dl = Staged(s, dir, "bm25_dl")(
          toks.groupBy("doc_id").agg(cnt.cast("double").as("dl")))
        val stats = dl.agg(
          (dsum(col("dl")) / cnt).as("avgdl"), cnt.cast("double").as("n"))
        val qtoks = toks.filter(col("term").isin(qTerms: _*))
        val tf = Staged(s, dir, "bm25_tf")(
          qtoks.groupBy("doc_id", "term").agg(cnt.cast("double").as("tf")))
        val dfreq = Staged(s, dir, "bm25_df")(
          qtoks.groupBy("term")
            .agg(countDistinct("doc_id").cast("double").as("df")))
        val idf = log(lit(1) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
        // Float-parity note: the oracle's `0.75*dl/avgdl` parses as
        // (0.75*dl)/avgdl; multiplication commutes exactly in IEEE, so
        // (dl*0.75)/avgdl is bit-identical — but (dl/avgdl)*0.75 is NOT.
        val termScore = idf * col("tf") * 2.2 /
          (col("tf") + (lit(0.25) + col("dl") * 0.75 / col("avgdl")) * 1.2)
        // Top-k via a distributed TakeOrderedAndProject (orderBy+limit), NOT
        // a global row_number window — the rank is assigned on the 20
        // surviving rows only, so no single-partition shuffle of the full
        // matched-doc set ever happens.
        val w = Window.orderBy(col("bm25").desc, col("doc_id"))
        tf.join(broadcast(dfreq), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), round(termScore, 6).as("term_score"))
          .groupBy("doc_id")
          .agg(sum(col("term_score").cast(DecimalType(18, 6)))
            .cast("double").as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(20)
          .withColumn("rn", row_number().over(w).cast("int"))
          .select(col("doc_id").cast("long"), col("bm25"), col("rn"))
          .oracleOrder("rn")
      }),

    // Unigram-LM tokenizer TRAINER (Kudo 2018, the SentencePiece unigram
    // model; VERDICT r17 item 5) — the second tokenizer-training family
    // next to BPE: seed a substring vocabulary from the word-frequency
    // table, run hard-EM (Viterbi E-step, add-1 M-step), PRUNE to the
    // top-K pieces by expected count, and re-estimate on the pruned
    // vocabulary. 100 TB shape: the corpus folds ONCE to the
    // word-frequency table (the same localCheckpoint-pinned artifact the
    // BPE trainer trains on); everything after is model-table-sized —
    // the Viterbi DP is a LINEAR chain of 12 position steps over that
    // table, each step probing the <=66-entry vocab as a COLLECTED
    // LITERAL MAP (piece -> logp baked into the plan; VERDICT r18 item
    // 5 — the previous <=4 broadcast joins per step cost ~48 tiny-join
    // plan/broadcast rounds locally; the map literal folds each step
    // into one map-side projection, the Quantizers
    // inline-the-trained-model policy). The vocab collect is a bounded
    // driver fold: the vocab is CAPPED at the single chars +
    // UniSeedM/UniPruneK multi pieces by construction, independent of
    // corpus size. The DP carries (score, segmentation) for the last 4
    // positions as columns (no backtrack pass, no quadratic lattice).
    // Exactness: counts are integer sums; piece log-probs are ln of
    // int/int double ratios ROUND 9dp (the bounded-distinct-inputs
    // policy the logreg trace uses), COLLECTED from the Spark
    // computation itself so the literals are bit-identical to what the
    // broadcast join produced; try_element_at returns NULL on a vocab
    // miss exactly as the LEFT join did; DP scores are sums of those
    // identical doubles in identical order, so argmax ties are bit-ties
    // in BOTH engines and the fixed longer-piece-first CASE breaks them
    // identically. Oracle: the full seed→EM→prune→EM chain unrolled as
    // CTEs (TrainOracles discipline), vocab/count tables MATERIALIZED
    // so the linear DP stays linear.
    Q(
      "text_unigram_train",
      Some(uniTrainSql),
      (s, dir) => {
        val wf = Tables(s, dir, "documents")
          .filter(col("lang") === "en")
          .select(explode(split(lower(col("text")), " ")).as("wd"))
          .filter(length(col("wd")).between(2, UniMaxLen) &&
            col("wd").rlike("^[a-z]+$"))
          .groupBy("wd").agg(cnt.as("f"))
          .localCheckpoint()
        // Seed: every substring of length 1..4, weighted by word freq;
        // keep all single chars (reachability) + the top-40 multi-char
        // pieces by (count DESC, piece).
        val sub = wf
          .select(col("wd"), col("f"),
            explode(sequence(lit(1), length(col("wd")))).as("i"))
          .select(col("wd"), col("f"), col("i"),
            explode(sequence(lit(1), lit(UniMaxPiece))).as("l"))
          .filter(col("i") + col("l") <= length(col("wd")) + 1)
          .select(expr("substring(wd, i, l)").as("piece"), col("f"))
        val scnt = sub.groupBy("piece").agg(sum("f").cast("long").as("c"))
          .localCheckpoint()
        val v0keep = scnt.filter(length(col("piece")) === 1)
          .unionAll(scnt.filter(length(col("piece")) > 1)
            .orderBy(col("c").desc, col("piece")).limit(UniSeedM))
        val v0tot = v0keep.agg(sum("c").cast("long").as("tot"))
        val v0 = v0keep.crossJoin(broadcast(v0tot))
          .select(col("piece"),
            round(log(col("c").cast("double") / col("tot")), 9).as("logp"))
        // EM round 1 → prune (keep chars + top-24 multi by Viterbi count)
        // → add-1 re-estimate → EM round 2 on the pruned vocabulary.
        val cnt1 = uniEmRound(wf, collectVocab(v0)).localCheckpoint()
        val v1keep = scnt.filter(length(col("piece")) === 1)
          .select(col("piece"))
          .join(cnt1.withColumnRenamed("piece", "cp").withColumnRenamed("c", "c1"),
            col("piece") === col("cp"), "left")
          .select(col("piece"), coalesce(col("c1"), lit(0L)).as("c"))
          .unionAll(cnt1.filter(length(col("piece")) > 1)
            .orderBy(col("c").desc, col("piece")).limit(UniPruneK))
          .localCheckpoint()
        val v1agg = v1keep.agg(sum("c").cast("long").as("tot"), cnt.as("nv"))
        val v1 = v1keep.crossJoin(broadcast(v1agg))
          .select(col("piece"),
            round(log((col("c") + 1).cast("double") / (col("tot") + col("nv"))), 9)
              .as("logp"))
        val cnt2 = uniEmRound(wf, collectVocab(v1))
        val fagg = cnt2.agg(coalesce(sum("c"), lit(0L)).cast("long").as("tot"))
          .crossJoin(v1keep.agg(cnt.as("nv")))
        v1keep.select(col("piece"))
          .join(cnt2.withColumnRenamed("piece", "cp").withColumnRenamed("c", "c2"),
            col("piece") === col("cp"), "left")
          .select(col("piece"), coalesce(col("c2"), lit(0L)).as("n"))
          .crossJoin(broadcast(fagg))
          .select(col("piece"), col("n"),
            round(log((col("n") + 1).cast("double") / (col("tot") + col("nv"))), 6)
              .as("logp"))
          .oracleOrder(col("n").desc, col("piece"))
      }))

  /** Unigram-trainer geometry: word length cap, max piece length, seed
    * multi-piece pool, post-EM keep. The cap is a hard filter on BOTH
    * engines (the trained word class, like BPE's `^[a-z]{2,}$`).
    */
  private[queries] val UniMaxLen = 12
  private[queries] val UniMaxPiece = 4
  private[queries] val UniSeedM = 40
  private[queries] val UniPruneK = 24

  /** Collect a (piece, logp) vocabulary frame to a driver map for the
    * literal-map DP probe. Bounded by construction (single chars +
    * UniSeedM/UniPruneK capped multi pieces — never corpus-sized); the
    * doubles are taken from the Spark computation itself, so the baked
    * literals are bit-identical to what a broadcast join would carry.
    */
  private def collectVocab(
      v: org.apache.spark.sql.DataFrame): Map[String, Double] =
    v.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** One hard-EM (Viterbi) E-step: segment every word of `wf` under
    * `vocab` (piece -> logp, a collected bounded map baked into the plan
    * as ONE map literal) and return per-piece counts weighted by word
    * frequency. The DP is a linear chain over positions 1..[[UniMaxLen]]
    * run as ONE fixed-size `aggregate()` lambda (the position loop lives
    * INSIDE the higher-order function at runtime — 12 stacked per-step
    * projections would CollapseProject into one exponentially-nested
    * expression whose codegen compile dominated the query; the lambda's
    * expression tree is position-independent and built once). The state
    * struct carries, for the last [[UniMaxPiece]] prefix ends, the best
    * score (s0..s3) and its '|'-joined segmentation (g0..g3); position
    * `i` proposes one candidate per piece length (score[i-l] +
    * logp(substr(i-l+1, l)), `try_element_at` NULL on a vocab miss — the
    * LEFT-join semantics — so absent pieces and finished words propose
    * nothing; candidates with l > i are NULL automatically because state
    * s_{l-1} only becomes non-NULL after l-1 positions), takes the max
    * (ties: longer piece first — the same fixed CASE order in the SQL
    * oracle), and shifts the carried fields. Words shorter than `i`
    * freeze (all candidates NULL — the len(wd) >= i mask: past the word
    * end, substring() returns a TRUNCATED string that can still match a
    * real piece, caught by the Round18OpsSpec sequential twin). No
    * backtrack pass: the winning segmentation rides the state, and
    * counts fall out of one split+explode at the end — the whole E-step
    * is ONE map-side pass over the word-frequency table (no joins, no
    * shuffles before the final per-piece fold).
    */
  private def uniEmRound(
      wf: org.apache.spark.sql.DataFrame,
      vocab: Map[String, Double]): org.apache.spark.sql.DataFrame = {
    val vm = typedLit(vocab)
    val wd = col("wd")
    val init = struct(
      Seq(lit(0.0).as("s0"), lit("").as("g0")) ++
        (1 until UniMaxPiece).flatMap(k => Seq(
          lit(null).cast("double").as(s"s$k"),
          lit(null).cast("string").as(s"g$k"))): _*)
    def step(st: Column, i: Column): Column = {
      def piece(l: Int) = wd.substr(i - lit(l) + lit(1), lit(l))
      val cs = (1 to UniMaxPiece).map(l =>
        when(length(wd) >= i,
          st.getField(s"s${l - 1}") + try_element_at(vm, piece(l))))
      val m = greatest(cs: _*)
      val seg = (UniMaxPiece to 2 by -1)
        .foldLeft(when(m.isNull, st.getField("g0")))((acc, l) =>
          acc.when(cs(l - 1) === m,
            concat(st.getField(s"g${l - 1}"), lit("|"), piece(l))))
        .otherwise(concat(st.getField("g0"), lit("|"), piece(1)))
      struct(
        Seq(when(m.isNull, st.getField("s0")).otherwise(m).as("s0"),
          seg.as("g0")) ++
          (1 until UniMaxPiece).flatMap(k => Seq(
            when(m.isNull, st.getField(s"s$k"))
              .otherwise(st.getField(s"s${k - 1}")).as(s"s$k"),
            when(m.isNull, st.getField(s"g$k"))
              .otherwise(st.getField(s"g${k - 1}")).as(s"g$k"))): _*)
    }
    wf.select(
        aggregate(sequence(lit(1), lit(UniMaxLen)), init, step,
          _.getField("g0")).as("g0"),
        col("f"))
      .select(explode(split(col("g0"), "\\|")).as("piece"), col("f"))
      .filter(col("piece") =!= "")
      .groupBy("piece").agg(sum("f").cast("long").as("c"))
  }

  /** The DuckDB oracle: the identical seed→EM→prune→EM chain, DP steps
    * unrolled (one CTE per position), vocab/count tables MATERIALIZED so
    * every dp step's 4 vocab probes read a computed table instead of
    * re-inlining the upstream chain (the CTE-expansion blow-up that an
    * un-materialized 12-step x 4-way chain would hit).
    */
  private def uniTrainSql: String = {
    def step(r: Int, i: Int, vocab: String): String = {
      val ls = 1 to math.min(UniMaxPiece, i)
      val joins = ls.map(l =>
        s"LEFT JOIN $vocab v$l ON substr(d.wd, ${i - l + 1}, $l) = v$l.piece")
        .mkString("\n      ")
      val carry = (0 until UniMaxPiece).map(k => s"d.s$k, d.g$k").mkString(", ")
      // len(wd) >= i freeze guard — see the uniEmRound comment: an
      // unmasked candidate past the word end matches TRUNCATED substrings.
      val cexprs = ls.map(l =>
        s"CASE WHEN len(d.wd) >= $i THEN d.s${l - 1} + v$l.logp END AS c$l")
        .mkString(", ")
      val m = if (ls.size > 1) ls.map(l => s"c$l").mkString("greatest(", ", ", ")")
              else "c1"
      val seg = "CASE WHEN m IS NULL THEN g0 " +
        ls.reverse.init.map(l =>
          s"WHEN c$l = m THEN g${l - 1} || '|' || substr(wd, ${i - l + 1}, $l)")
          .mkString(" ") +
        s" ELSE g0 || '|' || substr(wd, $i, 1) END"
      val shifts = (1 until UniMaxPiece).map(k =>
        s"CASE WHEN m IS NULL THEN s$k ELSE s${k - 1} END AS s$k, " +
          s"CASE WHEN m IS NULL THEN g$k ELSE g${k - 1} END AS g$k")
        .mkString(",\n    ")
      s"""st${r}_$i AS (
         |  SELECT wd, f,
         |    CASE WHEN m IS NULL THEN s0 ELSE m END AS s0,
         |    $seg AS g0,
         |    $shifts
         |  FROM (
         |    SELECT q.*, $m AS m FROM (
         |      SELECT d.wd, d.f, $carry, $cexprs
         |      FROM st${r}_${i - 1} d
         |      $joins) q) t)""".stripMargin
    }
    def estep(r: Int, vocab: String): Seq[String] = {
      val init = (Seq("CAST(0 AS DOUBLE) AS s0", "CAST('' AS VARCHAR) AS g0") ++
        (1 until UniMaxPiece).flatMap(k => Seq(
          s"CAST(NULL AS DOUBLE) AS s$k", s"CAST(NULL AS VARCHAR) AS g$k")))
        .mkString(", ")
      val emits = s"st${r}_$UniMaxLen"
      Seq(s"st${r}_0 AS (SELECT wd, f, $init FROM wf)") ++
        (1 to UniMaxLen).map(i => step(r, i, vocab)) :+
        s"""cnt$r AS MATERIALIZED (SELECT piece, CAST(SUM(f) AS BIGINT) AS c FROM (
           |  SELECT unnest(string_split(g0, '|')) AS piece, f FROM $emits) e
           |  WHERE piece <> '' GROUP BY 1)""".stripMargin
    }
    val ctes = Seq(
      """w AS (SELECT unnest(string_split(lower(text), ' ')) AS wd
        |     FROM documents WHERE lang = 'en')""".stripMargin,
      s"""wf AS MATERIALIZED (SELECT wd, CAST(COUNT(*) AS BIGINT) AS f FROM w
         |  WHERE len(wd) BETWEEN 2 AND $UniMaxLen AND regexp_matches(wd, '^[a-z]+$$')
         |  GROUP BY 1)""".stripMargin,
      s"""sub AS (SELECT substr(wd, CAST(i AS INT), CAST(l AS INT)) AS piece, f
         |  FROM wf, unnest(range(1, len(wd)+1)) r(i), unnest(range(1, ${UniMaxPiece + 1})) q(l)
         |  WHERE CAST(i AS INT) + CAST(l AS INT) <= len(wd) + 1)""".stripMargin,
      "scnt AS MATERIALIZED (SELECT piece, CAST(SUM(f) AS BIGINT) AS c FROM sub GROUP BY 1)",
      s"""v0keep AS MATERIALIZED (
         |  SELECT piece, c FROM scnt WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece, c FROM (
         |    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn
         |    FROM scnt WHERE len(piece) > 1) t WHERE rn <= $UniSeedM)""".stripMargin,
      "v0tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM v0keep)",
      """v0 AS MATERIALIZED (SELECT piece, ROUND(ln(CAST(c AS DOUBLE) / tot), 9) AS logp
        |  FROM v0keep, v0tot)""".stripMargin) ++
      estep(1, "v0") ++ Seq(
      s"""v1keep AS MATERIALIZED (
         |  SELECT s.piece, COALESCE(c1.c, 0) AS c FROM v0keep s
         |    LEFT JOIN cnt1 c1 ON s.piece = c1.piece WHERE len(s.piece) = 1
         |  UNION ALL
         |  SELECT piece, c FROM (
         |    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn
         |    FROM cnt1 WHERE len(piece) > 1) t WHERE rn <= $UniPruneK)""".stripMargin,
      "v1agg AS (SELECT CAST(SUM(c) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS nv FROM v1keep)",
      """v1 AS MATERIALIZED (SELECT piece, ROUND(ln(CAST(c + 1 AS DOUBLE) / (tot + nv)), 9) AS logp
        |  FROM v1keep, v1agg)""".stripMargin) ++
      estep(2, "v1") :+
      """fagg AS (SELECT (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM cnt2) AS tot,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v1keep) AS nv)""".stripMargin
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT k.piece, CAST(COALESCE(c2.c, 0) AS BIGINT) AS n,
       |  ROUND(ln(CAST(COALESCE(c2.c, 0) + 1 AS DOUBLE) / (tot + nv)), 6) AS logp
       |FROM v1keep k LEFT JOIN cnt2 c2 ON k.piece = c2.piece, fagg
       |ORDER BY n DESC, k.piece""".stripMargin
  }
}
