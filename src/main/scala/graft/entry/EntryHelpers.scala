package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared builders for the driver-contract key files (the per-family
  * `*Keys` objects under graft/entry/): table loading, the
  * oracle-deterministic decimal sums, and the chained-CTE SQL
  * generators the oracle entries replay (BPE/WordPiece/Unigram,
  * k-means/k-center, graph iterations, session windows). Mechanically
  * split out of SparkEntry in round 15 — bodies verbatim, visibility
  * widened from SparkEntry-private to this private[graft] object.
  */
private[graft] object EntryHelpers {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") Tables.events(s, dir) else Tables.load(s, dir, name)

  // oracle-deterministic money sums — see graft.ops.ExactSums for the
  // cross-engine reproducibility contract
  def dsum(c: Column): Column = graft.ops.ExactSums.dsum(c)
  def dsumSql(expr: String): String = graft.ops.ExactSums.dsumSql(expr)

  /** Exact multiset equality of two same-schema frames in ONE
    * aggregation pass: tag each side ±1, group by every column, and the
    * multisets are equal iff every group's tag-sum is zero. Replaces
    * the `a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty` idiom —
    * Spark rewrites EACH exceptAll as exactly this union-count
    * aggregate internally, so two exceptAll jobs recompute both inputs
    * twice to answer what one pass answers; same equality semantics
    * (grouping normalizes NaN/-0.0 the way exceptAll's rewrite does). */
  def multisetEqual(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toSeq
    require(b.columns.length == cols.length,
      s"multisetEqual needs same-width frames: ${cols.mkString(",")} vs ${b.columns.mkString(",")}")
    val w = "_graft_mseq_w"
    // positional alignment (toDF renames b's columns to a's), exactly
    // how exceptAll resolves its two sides
    a.withColumn(w, lit(1L))
      .union(b.toDF(cols: _*).withColumn(w, lit(-1L)))
      .groupBy(cols.map(col): _*).agg(sum(col(w)).as(w))
      .filter(col(w) =!= 0L)
      .isEmpty
  }

  /** ret3's oracle: MMR replayed greedy round by greedy round (the km2
    * chained-CTE pattern) — round r picks the row_number-1 candidate of
    * `7·rel − 3·max(sim to s_{r-1})` with ties on doc_id, and s_r
    * accumulates. rel/sim are 4dp-cosine basis points (ann1 contract). */
  def mmrOracleSql: String = {
    val rounds = (2 to 5).map { r =>
      s"""|, p$r AS MATERIALIZED (
          |  SELECT query_id, doc_id, sel_rank, mmr_bp FROM (
          |    SELECT c.query_id, c.doc_id, $r AS sel_rank,
          |           7 * c.rel_bp - 3 * max(m.sim_bp) AS mmr_bp,
          |           row_number() OVER (PARTITION BY c.query_id
          |                              ORDER BY 7 * c.rel_bp - 3 * max(m.sim_bp) DESC, c.doc_id) AS pr
          |    FROM cands c
          |    JOIN sims m ON m.query_id = c.query_id AND m.doc_id = c.doc_id
          |    JOIN s${r - 1} s ON s.query_id = m.query_id AND s.doc_id = m.other_id
          |    WHERE NOT EXISTS (SELECT 1 FROM s${r - 1} x
          |                      WHERE x.query_id = c.query_id AND x.doc_id = c.doc_id)
          |    GROUP BY c.query_id, c.doc_id, c.rel_bp)
          |  WHERE pr = 1
          |), s$r AS MATERIALIZED (
          |  SELECT * FROM s${r - 1} UNION ALL SELECT * FROM p$r)""".stripMargin
    }.mkString("\n")
    s"""|WITH qv AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 3
        |), ev AS MATERIALIZED (
        |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        |), scored AS (
        |  SELECT q.query_id, c.vec_id AS doc_id,
        |         round(list_inner_product(q.qv, c.e) /
        |               (sqrt(list_inner_product(q.qv, q.qv)) *
        |                sqrt(list_inner_product(c.e, c.e))), 4) AS score
        |  FROM qv q CROSS JOIN ev c WHERE c.vec_id <> q.query_id
        |), cands AS MATERIALIZED (
        |  SELECT query_id, doc_id,
        |         CAST(round(score * 10000) AS BIGINT) AS rel_bp,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY score DESC, doc_id) AS rn
        |  FROM scored QUALIFY rn <= 20
        |), sims AS MATERIALIZED (
        |  SELECT a.query_id, a.doc_id, b.doc_id AS other_id,
        |         CAST(round(list_inner_product(ea.e, eb.e) /
        |               (sqrt(list_inner_product(ea.e, ea.e)) *
        |                sqrt(list_inner_product(eb.e, eb.e))) * 10000) AS BIGINT) AS sim_bp
        |  FROM cands a
        |  JOIN cands b ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
        |  JOIN ev ea ON ea.vec_id = a.doc_id
        |  JOIN ev eb ON eb.vec_id = b.doc_id
        |), s1 AS MATERIALIZED (
        |  SELECT query_id, doc_id, 1 AS sel_rank, 7 * rel_bp AS mmr_bp
        |  FROM cands WHERE rn = 1)
        |$rounds
        |SELECT query_id, doc_id, CAST(sel_rank AS INTEGER) AS sel_rank,
        |       CAST(mmr_bp AS BIGINT) AS mmr_bp
        |FROM s5""".stripMargin
  }

  /** The txt16/txt17 oracle CTE chain, generated: k chained BPE rounds,
    * each one pair-count aggregate + argmax + replace over the
    * separator-wrapped word sequences — the same replace semantics the
    * Spark op uses. */
  def bpeCtes(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT syms[j] AS lhs, syms[j+1] AS rhs, CAST(sum(w) AS BIGINT) AS freq
         |  FROM (
         |    SELECT syms, w, unnest(range(1, len(syms))) AS j
         |    FROM (SELECT string_split(trim(seq, chr(31)), chr(31)||chr(31)) AS syms, w
         |          FROM v${i - 1})
         |  )
         |  GROUP BY 1, 2
         |), b$i AS (
         |  SELECT lhs, rhs, freq FROM p$i ORDER BY freq DESC, lhs, rhs LIMIT 1
         |), v$i AS (
         |  SELECT word, replace(seq, chr(31)||lhs||chr(31)||chr(31)||rhs||chr(31),
         |                            chr(31)||lhs||rhs||chr(31)) AS seq, w
         |  FROM v${i - 1}, b$i
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH words AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS w
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE len(word) > 0 GROUP BY 1
       |), v0 AS (
       |  SELECT word, regexp_replace(word, '(.)', chr(31)||'\\1'||chr(31), 'g') AS seq, w
       |  FROM words
       |), $rounds""".stripMargin
  }

  def bpeSql(k: Int): String =
    bpeCtes(k) + "\n" + (1 to k).map(i =>
      s"SELECT CAST($i AS INT) AS merge_rank, lhs, rhs, freq FROM b$i").mkString("\nUNION ALL\n")

  def bpeSegmentSql(k: Int): String =
    bpeCtes(k) +
      s"""
         |SELECT word, w AS n_occurrences,
         |       replace(trim(seq, chr(31)), chr(31)||chr(31), '.') AS segmentation
         |FROM v$k""".stripMargin

  /** The txt18 oracle: WordPiece rounds — BPE's replace machinery with
    * likelihood scoring replayed per round (pair freqs + CURRENT symbol
    * counts + the exact fixed-point score, HUGEINT-widened so nothing
    * overflows, truncating // = Spark's div). */
  def wordpieceSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      // AS MATERIALIZED: each round's symbol table is consumed by BOTH
      // p$i and s$i, and each v$i by two successors — default CTE
      // inlining would expand the chain 3^k times (k=8 ran out of file
      // handles re-opening the parquet); materialization keeps the
      // replay linear, same as Spark's per-round checkpoints
      s"""t$i AS MATERIALIZED (
         |  SELECT word, string_split(trim(seq, chr(31)), chr(31)||chr(31)) AS syms, w
         |  FROM v${i - 1}
         |), p$i AS (
         |  SELECT syms[j] AS lhs, syms[j+1] AS rhs, CAST(sum(w) AS BIGINT) AS freq
         |  FROM (SELECT syms, w, unnest(range(1, len(syms))) AS j FROM t$i)
         |  GROUP BY 1, 2
         |), s$i AS (
         |  SELECT sym, CAST(sum(w) AS BIGINT) AS c
         |  FROM (SELECT unnest(syms) AS sym, w FROM t$i) GROUP BY 1
         |), b$i AS (
         |  SELECT lhs, rhs, freq,
         |         CAST(CAST(freq AS HUGEINT) * 1000000000000 // (CAST(sl.c AS HUGEINT) * sr.c) AS BIGINT) AS score
         |  FROM p$i JOIN s$i sl ON p$i.lhs = sl.sym JOIN s$i sr ON p$i.rhs = sr.sym
         |  ORDER BY score DESC, lhs, rhs LIMIT 1
         |), v$i AS MATERIALIZED (
         |  SELECT word, replace(seq, chr(31)||lhs||chr(31)||chr(31)||rhs||chr(31),
         |                            chr(31)||lhs||rhs||chr(31)) AS seq, w
         |  FROM v${i - 1}, b$i
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH words AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS w
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE len(word) > 0 GROUP BY 1
       |), v0 AS MATERIALIZED (
       |  SELECT word, regexp_replace(word, '(.)', chr(31)||'\\1'||chr(31), 'g') AS seq, w
       |  FROM words
       |), $rounds
       |""".stripMargin + (1 to k).map(i =>
      s"SELECT CAST($i AS INT) AS merge_rank, lhs, rhs, freq, score FROM b$i")
      .mkString("\nUNION ALL\n")
  }

  /** The txt20 oracle, generated: unigram-LM (hard-EM) tokenizer
    * training replayed round by round. The Viterbi DP that Spark runs
    * as a per-row HOF lambda unrolls here into bounded chained CTEs —
    * one `b` table per word position (the DP frontier), one `bt` table
    * per backtrack step — all over the SAME integer state: enc =
    * pathCost·32 + backpointer, so `min(enc)` is the exact (cost,
    * smaller-j) tie-break in both engines and no float is ever
    * compared. Piece costs are CAST(round(-ln(c/total)·1e6) AS BIGINT)
    * — identical BIGINTs from identical doubles (the txt15 ln
    * contract). maxWordLen=16, maxPieceLen=4, vocabTarget=200 mirror
    * TextOps.unigramLearn's defaults. */
  val UniP = 4; private val UniL = 16; private val UniK = 200

  /** One Viterbi DP round's CTEs (spans under v{r-1}, the per-position
    * frontier b-tables, and the backtrack bt-tables). */
  def unigramDpCtes(r: Int): String = {
    val P = UniP; val L = UniL
    val bTables = (1 to L).map { i =>
      val js = math.max(0, i - P) until i
      val prior = js.map(j => s"SELECT word, $j AS j, enc FROM b${r}_$j").mkString(" UNION ALL ")
      s"""b${r}_$i AS MATERIALIZED (
         |  SELECT s.word, min((p.enc // 32 + s.cost) * 32 + s.j) AS enc
         |  FROM sp$r s JOIN ($prior) p ON p.word = s.word AND p.j = s.j
         |  WHERE s.i = $i
         |  GROUP BY s.word
         |)""".stripMargin
    }.mkString(", ")
    val ball = (1 to L).map(i => s"SELECT word, $i AS i, enc FROM b${r}_$i").mkString(" UNION ALL ")
    val btTables = (2 to L).map { k =>
      s"""bt${r}_$k AS MATERIALIZED (
         |  SELECT b.word, b.w, b.j AS i, CAST(ba.enc % 32 AS INT) AS j
         |  FROM bt${r}_${k - 1} b JOIN ball$r ba ON ba.word = b.word AND ba.i = b.j
         |  WHERE b.j > 0
         |)""".stripMargin
    }.mkString(", ")
    s"""sp$r AS MATERIALIZED (
       |  SELECT s.word, s.j, s.i, v.cost FROM (
       |    SELECT word, j, j + l AS i, substr(word, j + 1, l) AS piece
       |    FROM (SELECT word, unnest(range(0, len(word))) AS j FROM words)
       |         CROSS JOIN (SELECT unnest(range(1, ${P + 1})) AS l)
       |    WHERE j + l <= len(word)) s
       |  JOIN v${r - 1} v USING (piece)
       |), b${r}_0 AS (
       |  SELECT word, CAST(0 AS BIGINT) AS enc FROM words
       |), $bTables, ball$r AS MATERIALIZED (
       |  $ball
       |), bt${r}_1 AS MATERIALIZED (
       |  SELECT w.word, w.w, len(w.word) AS i, CAST(ba.enc % 32 AS INT) AS j
       |  FROM words w JOIN ball$r ba ON ba.word = w.word AND ba.i = len(w.word)
       |), $btTables""".stripMargin
  }

  /** `emRounds` EM rounds of CTEs (DP + recount/prune/recost), plus the
    * seed-vocabulary init. */
  def unigramCtes(emRounds: Int): String = {
    val P = UniP; val L = UniL; val K = UniK
    val roundCtes = (1 to emRounds).map { r =>
      val pieceUnion = (1 to L).map(k =>
        s"SELECT substr(word, j + 1, i - j) AS piece, w FROM bt${r}_$k").mkString(" UNION ALL ")
      s"""${unigramDpCtes(r)}, used$r AS MATERIALIZED (
         |  SELECT piece, CAST(sum(w) AS BIGINT) AS c FROM ($pieceUnion) GROUP BY 1
         |), cnt$r AS MATERIALIZED (
         |  SELECT ch.piece, greatest(coalesce(u.c, 0), 1) AS c
         |  FROM chars ch LEFT JOIN used$r u ON ch.piece = u.piece
         |  UNION ALL
         |  SELECT piece, c FROM used$r WHERE len(piece) > 1
         |), keep$r AS MATERIALIZED (
         |  SELECT piece, c FROM cnt$r WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece, c FROM (SELECT piece, c FROM cnt$r WHERE len(piece) > 1
         |                        ORDER BY c DESC, piece LIMIT $K)
         |), v$r AS MATERIALIZED (
         |  SELECT piece, c,
         |         CAST(round(-ln(CAST(c AS DOUBLE) /
         |              CAST((SELECT sum(c) FROM keep$r) AS DOUBLE)) * 1000000) AS BIGINT) AS cost
         |  FROM keep$r
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH words AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS w
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE len(word) BETWEEN 1 AND $L GROUP BY 1
       |), sub0 AS MATERIALIZED (
       |  SELECT piece, CAST(sum(w) AS BIGINT) AS c FROM (
       |    SELECT substr(word, i, l) AS piece, w
       |    FROM (SELECT word, w, unnest(range(1, len(word) + 1)) AS i FROM words)
       |         CROSS JOIN (SELECT unnest(range(1, ${P + 1})) AS l)
       |    WHERE i + l <= len(word) + 1)
       |  GROUP BY 1
       |), chars AS MATERIALIZED (
       |  SELECT piece FROM sub0 WHERE len(piece) = 1
       |), v0 AS MATERIALIZED (
       |  SELECT piece, c,
       |         CAST(round(-ln(CAST(c AS DOUBLE) /
       |              CAST((SELECT sum(c) FROM sub0) AS DOUBLE)) * 1000000) AS BIGINT) AS cost
       |  FROM sub0
       |), $roundCtes""".stripMargin
  }

  def unigramSql(rounds: Int): String =
    s"""${unigramCtes(rounds)}
       |SELECT piece, c AS n_uses, cost FROM v$rounds
       |ORDER BY n_uses DESC, piece LIMIT 64""".stripMargin

  /** The txt21 oracle: one more Viterbi DP round under the FINAL vocab,
    * pieces re-joined left-to-right (ordering by span END equals the
    * engine's reversed backtrack emission). */
  def unigramSegmentSql(rounds: Int): String = {
    val r = rounds + 1
    val btUnion = (1 to UniL).map(k =>
      s"SELECT word, w, i, j FROM bt${r}_$k").mkString(" UNION ALL ")
    s"""${unigramCtes(rounds)}, ${unigramDpCtes(r)}
       |SELECT word, w AS n_occurrences,
       |       string_agg(substr(word, j + 1, i - j), '.' ORDER BY i) AS segmentation
       |FROM ($btUnion) GROUP BY word, w""".stripMargin
  }

  /** The e6/st8 oracle — gaps-and-islands mirror of the built-in
    * session_window (batch and streamed drains answer the same SQL):
    * the merge boundary is INCLUSIVE (an event at exactly last+gap
    * extends the session — spec-pinned), so a new session starts on
    * strict >; session end = last event + gap. */
  val sessionWindowSql: String =
    s"""WITH lagged AS (
       |  SELECT user_id, event_id, ts, value,
       |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM events
       |), marked AS (
       |  SELECT user_id, event_id, ts, value,
       |         CASE WHEN prev_ts IS NULL
       |                OR epoch_us(ts) - epoch_us(prev_ts) > 600000000
       |              THEN 1 ELSE 0 END AS new_s
       |  FROM lagged
       |), numbered AS (
       |  SELECT user_id, ts, value,
       |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                          ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM marked
       |)
       |SELECT user_id, min(ts) AS session_start,
       |       max(ts) + INTERVAL 10 MINUTE AS session_end,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       ${dsumSql("value")} AS total_value
       |FROM numbered GROUP BY user_id, sid""".stripMargin

  /** The gr1 oracle, generated: k chained PageRank rounds in exact
    * integer fixed-point over the part co-purchase graph — truncating
    * `//` on non-negative values matches Spark's `div` bit-for-bit
    * (GraphOps.pageRank's contract), so every round replays. */
  /** The gr6 oracle, generated: `rounds` truss-peeling rounds, each one
    * a full support recomputation — degree, orientation, wedges,
    * triangle closure, 3-way edge explode — over the previous round's
    * survivors, then the threshold filter. Multiply-referenced CTEs are
    * AS MATERIALIZED (the kcoreSql lesson); row-value comparisons
    * `(d, id) < (d, id)` mirror Spark's struct ordering exactly. */
  def ktrussSql(k: Int, rounds: Int): String = {
    def roundCtes(i: Int): String =
      s"""d$i AS MATERIALIZED (
         |  SELECT x, CAST(count(*) AS BIGINT) AS d
         |  FROM (SELECT u AS x FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1})
         |  GROUP BY x
         |), o$i AS MATERIALIZED (
         |  SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS a,
         |         CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS b,
         |         CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN dv.d ELSE du.d END AS db
         |  FROM e${i - 1} p JOIN d$i du ON p.u = du.x JOIN d$i dv ON p.v = dv.x
         |), t$i AS (
         |  SELECT w.x, w.y, w.z
         |  FROM (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |        FROM o$i e1 JOIN o$i e2
         |          ON e1.a = e2.a AND (e1.db, e1.b) < (e2.db, e2.b)) w
         |  JOIN o$i o ON w.y = o.a AND w.z = o.b
         |), s$i AS MATERIALIZED (
         |  SELECT u, v, CAST(count(*) AS BIGINT) AS support FROM (
         |    SELECT least(x, y) AS u, greatest(x, y) AS v FROM t$i
         |    UNION ALL SELECT least(x, z), greatest(x, z) FROM t$i
         |    UNION ALL SELECT least(y, z), greatest(y, z) FROM t$i
         |  ) GROUP BY u, v
         |), e$i AS MATERIALIZED (
         |  SELECT u, v FROM s$i WHERE support >= ${k - 2}
         |)""".stripMargin
    // the final support pass (round rounds+1's s-CTE) is the face
    val steps = (1 to (rounds + 1)).map(roundCtes).mkString(", ")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0
       |), $steps
       |SELECT TRUE AS converged, e.u AS part_a, e.v AS part_b,
       |       COALESCE(s.support, 0) AS support
       |FROM e$rounds e LEFT JOIN s${rounds + 1} s USING (u, v)
       |ORDER BY support DESC, e.u, e.v LIMIT 20""".stripMargin
  }

  /** The txt24 oracle, generated: [[pagerankSql]]'s round CTEs over the
    * word co-occurrence graph instead of the part co-purchase graph —
    * the adjacency built with list_zip over adjacent token slices
    * (verified equal to Spark's arrays_zip-of-slices pairing). */
  def textrankSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""r$i AS (
         |  SELECT e.v AS u,
         |         CAST((15 * 1000000000000 // nn.n + 85 * sum(r${i - 1}.pr // d.deg)) // 100 AS BIGINT) AS pr
         |  FROM edges e JOIN r${i - 1} ON e.u = r${i - 1}.u JOIN deg d ON e.u = d.u, nn
         |  GROUP BY e.v, nn.n
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT string_split(text, ' ') AS t FROM documents
       |), adj AS (
       |  SELECT u.p[1] AS x, u.p[2] AS y
       |  FROM toks, unnest(list_zip(t[1:-2], t[2:])) AS u(p)
       |), pairs AS (
       |  SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
       |  FROM adj WHERE x <> y
       |), edges AS MATERIALIZED (
       |  SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
       |), deg AS (
       |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1
       |), nn AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n FROM deg
       |), r0 AS (
       |  SELECT u, CAST(1000000000000 // n AS BIGINT) AS pr FROM deg, nn
       |), $rounds
       |SELECT u AS word, pr AS rank_scaled
       |FROM r$k ORDER BY pr DESC, u LIMIT 20""".stripMargin
  }

  def pagerankSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""r$i AS (
         |  SELECT e.v AS u,
         |         CAST((15 * 1000000000000 // nn.n + 85 * sum(r${i - 1}.pr // d.deg)) // 100 AS BIGINT) AS pr
         |  FROM edges e JOIN r${i - 1} ON e.u = r${i - 1}.u JOIN deg d ON e.u = d.u, nn
         |  GROUP BY e.v, nn.n
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |), edges AS (
       |  SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
       |), deg AS (
       |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1
       |), nn AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n FROM deg
       |), r0 AS (
       |  SELECT u, CAST(1000000000000 // n AS BIGINT) AS pr FROM deg, nn
       |), $rounds
       |SELECT u AS part_id, pr AS rank_scaled
       |FROM r$k ORDER BY pr DESC, u LIMIT 20""".stripMargin
  }

  /** The gr5 oracle, generated: `rounds` k-core peeling rounds plus the
    * final degree pass — every alive-set CTE is referenced twice (both
    * edge endpoints), so AS MATERIALIZED is load-bearing: inlining
    * would double the plan per round (the txt20 lesson). */
  def kcoreSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT e.u, CAST(count(*) AS BIGINT) AS deg
         |  FROM edges e JOIN a${i - 1} x ON e.u = x.u JOIN a${i - 1} y ON e.v = y.u
         |  GROUP BY e.u
         |), a$i AS MATERIALIZED (
         |  SELECT u FROM d$i WHERE deg >= $k
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |), edges AS MATERIALIZED (
       |  SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
       |), a0 AS MATERIALIZED (
       |  SELECT DISTINCT u FROM edges
       |), $steps, dF AS (
       |  SELECT e.u, CAST(count(*) AS BIGINT) AS deg
       |  FROM edges e JOIN a$rounds x ON e.u = x.u JOIN a$rounds y ON e.v = y.u
       |  GROUP BY e.u
       |)
       |SELECT TRUE AS converged, u AS part_id, deg AS core_degree
       |FROM dF ORDER BY deg DESC, u LIMIT 20""".stripMargin
  }

  /** The km2 oracle, generated: farthest-first traversal with the km1
    * quantization; per round one distance pass against the newest seed
    * (scalar-subquery id), a least() fold into the running min-dist,
    * and the (mind DESC, vid) argmax as the next pick. */
  def kcenterSql(k: Int): String = {
    def distTo(pickSql: String): String =
      s"""SELECT p.vid, CAST(list_sum(list_transform(range(1, len(p.qv) + 1),
         |         t -> (p.qv[t] - s.qv[t]) * (p.qv[t] - s.qv[t]))) AS BIGINT) AS dist
         |  FROM q p JOIN q s ON s.vid = ($pickSql)""".stripMargin
    val rounds = (2 to k).map { r =>
      val prev = if (r == 2) s"(SELECT sv FROM s1)" else s"(SELECT vid FROM p${r - 1})"
      val prevM = if (r == 2) "m1" else s"m${r - 1}"
      val mCte =
        if (r == 2) "" // m1 built in the prelude
        else
          s"""m${r - 1} AS MATERIALIZED (
             |  SELECT m.vid, least(m.mind, d.dist) AS mind
             |  FROM m${r - 2} m JOIN (${distTo(s"SELECT vid FROM p${r - 1}")}) d
             |    ON d.vid = m.vid
             |), """.stripMargin
      s"""${mCte}p$r AS MATERIALIZED (
         |  SELECT vid, mind FROM $prevM ORDER BY mind DESC, vid LIMIT 1
         |)""".stripMargin
    }.mkString(", ")
    val face = (2 to k)
      .map(r => s"UNION ALL SELECT CAST($r AS BIGINT), vid, CAST(mind AS BIGINT) FROM p$r")
      .mkString("\n")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id AS vid,
       |         list_transform(embedding::DOUBLE[],
       |           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT) + 1048576) AS qv
       |  FROM embeddings
       |), s1 AS (SELECT min(vid) AS sv FROM q),
       |m1 AS MATERIALIZED (
       |  SELECT vid, dist AS mind FROM (${distTo("SELECT sv FROM s1")})
       |), $rounds
       |SELECT CAST(1 AS BIGINT) AS seed_rank, (SELECT sv FROM s1) AS vec_id,
       |       CAST(NULL AS BIGINT) AS radius
       |$face""".stripMargin
  }

  /** The v4 oracle, generated: quantized Gram, then `rounds` power
    * iterations with the SIGN-SAFE normalization — DuckDB's `//` floors
    * negatives where Spark's `div` truncates toward zero, so the
    * division replays as CASE sign · (|s| // mxp). */
  def powerIterSql(rounds: Int): String = {
    val rs = (1 to rounds).map { k =>
      s"""r${k}s AS MATERIALIZED (
         |  SELECT g.i, sum(g.g * r${k - 1}.xv) AS s
         |  FROM gram g JOIN r${k - 1} ON g.j = r${k - 1}.j GROUP BY 1
         |), r${k}m AS (
         |  SELECT max(CASE WHEN s < 0 THEN -s ELSE s END) // 1000000000000 AS mxp
         |  FROM r${k}s
         |), r$k AS MATERIALIZED (
         |  SELECT i AS j,
         |         CASE WHEN s < 0 THEN -((-s) // mxp) ELSE s // mxp END AS xv
         |  FROM r${k}s, r${k}m
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH comps AS (
       |  SELECT vec_id AS v, unnest(range(1, len(embedding) + 1)) AS i, embedding
       |  FROM embeddings
       |), qv AS MATERIALIZED (
       |  SELECT v, CAST(i AS BIGINT) AS i,
       |         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS q
       |  FROM comps
       |), gram AS MATERIALIZED (
       |  SELECT a.i, b.i AS j, sum(a.q * b.q) AS g
       |  FROM qv a JOIN qv b ON a.v = b.v GROUP BY 1, 2
       |), r0 AS (
       |  SELECT DISTINCT j, CAST(1000000000000 AS HUGEINT) AS xv FROM gram
       |), $rs
       |SELECT j AS dim_id, CAST(xv AS BIGINT) AS component_scaled
       |FROM r$rounds ORDER BY j""".stripMargin
  }

  /** The cls3 oracle: both depth-2 tree levels replayed — candidate
    * (bucket, threshold) error counts, the (err, b, θ) lexicographic
    * argmin per node, side membership as a max-CASE aggregate against
    * the 1-row best split, leaf majority votes (ties −1), and the
    * holdout routed through the three literal splits. Pure integer
    * arithmetic end to end — not one float in the trainer. */
  def treeSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id AS did,
       |         CASE WHEN list_contains(string_split(text, ' '), 'spark')
       |               AND list_contains(string_split(text, ' '), 'merge')
       |               AND list_contains(string_split(text, ' '), 'filter')
       |              THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
       |         (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 % 100 < 80 AS tr,
       |         unnest(string_split(text, ' ')) AS w
       |  FROM documents
       |), feats AS MATERIALIZED (
       |  SELECT did, y, tr,
       |         (strpos('0123456789abcdef', substring(md5(w), 1, 1)) - 1) * 256
       |       + (strpos('0123456789abcdef', substring(md5(w), 2, 1)) - 1) * 16
       |       + (strpos('0123456789abcdef', substring(md5(w), 3, 1)) - 1) AS b,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM toks GROUP BY 1, 2, 3, 4
       |), train AS MATERIALIZED (
       |  SELECT DISTINCT did, y FROM feats WHERE tr
       |), thetas AS (SELECT unnest([1, 2]) AS th),
       |tot0 AS (
       |  SELECT sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS P,
       |         sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS N FROM train
       |), cand0 AS (
       |  SELECT f.b, t.th,
       |         sum(CASE WHEN f.y = 1 AND f.cnt >= t.th THEN 1 ELSE 0 END) AS pL,
       |         sum(CASE WHEN f.y = -1 AND f.cnt >= t.th THEN 1 ELSE 0 END) AS nL
       |  FROM feats f CROSS JOIN thetas t WHERE f.tr GROUP BY 1, 2
       |), best0 AS MATERIALIZED (
       |  SELECT b, th FROM (
       |    SELECT c.b, c.th,
       |           row_number() OVER (ORDER BY
       |             least(c.pL, c.nL) + least(tot0.P - c.pL, tot0.N - c.nL), c.b, c.th) AS rn
       |    FROM cand0 c, tot0) WHERE rn = 1
       |), side AS MATERIALIZED (
       |  SELECT f.did, f.y,
       |         max(CASE WHEN f.b = b0.b AND f.cnt >= b0.th THEN 1 ELSE 0 END) AS s
       |  FROM feats f, best0 b0 WHERE f.tr GROUP BY 1, 2
       |), tots AS (
       |  SELECT s, sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS P,
       |         sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS N FROM side GROUP BY s
       |), cand1 AS (
       |  SELECT sd.s, f.b, t.th,
       |         sum(CASE WHEN f.y = 1 AND f.cnt >= t.th THEN 1 ELSE 0 END) AS pL,
       |         sum(CASE WHEN f.y = -1 AND f.cnt >= t.th THEN 1 ELSE 0 END) AS nL
       |  FROM feats f JOIN side sd USING (did) CROSS JOIN thetas t
       |  WHERE f.tr GROUP BY 1, 2, 3
       |), best1 AS MATERIALIZED (
       |  SELECT s, b, th, pL, nL, P, N FROM (
       |    SELECT c.s, c.b, c.th, c.pL, c.nL, t.P, t.N,
       |           row_number() OVER (PARTITION BY c.s ORDER BY
       |             least(c.pL, c.nL) + least(t.P - c.pL, t.N - c.nL), c.b, c.th) AS rn
       |    FROM cand1 c JOIN tots t USING (s)) WHERE rn = 1
       |), leaves AS (
       |  SELECT s, 1 AS s2, CASE WHEN pL > nL THEN 1 ELSE -1 END AS vote FROM best1
       |  UNION ALL
       |  SELECT s, 0 AS s2, CASE WHEN (P - pL) > (N - nL) THEN 1 ELSE -1 END AS vote FROM best1
       |), hs AS (
       |  SELECT f.did, f.y,
       |         max(CASE WHEN f.b = b0.b AND f.cnt >= b0.th THEN 1 ELSE 0 END) AS s
       |  FROM feats f, best0 b0 WHERE NOT f.tr GROUP BY 1, 2
       |), hs2 AS (
       |  SELECT h.did, h.y, h.s,
       |         coalesce(max(CASE WHEN f.b = b1.b AND f.cnt >= b1.th THEN 1 ELSE 0 END), 0) AS s2
       |  FROM hs h
       |  LEFT JOIN best1 b1 ON b1.s = h.s
       |  LEFT JOIN feats f ON f.did = h.did AND NOT f.tr
       |  GROUP BY 1, 2, 3
       |), pred AS (
       |  SELECT h.y AS y_true, CAST(coalesce(l.vote, -1) AS BIGINT) AS y_pred
       |  FROM hs2 h LEFT JOIN leaves l ON l.s = h.s AND l.s2 = h.s2
       |)
       |SELECT y_true, y_pred, CAST(count(*) AS BIGINT) AS n_docs
       |FROM pred GROUP BY 1, 2""".stripMargin

  /** The km1 oracle, generated: `rounds` chained Lloyd iterations in
    * exact integer fixed point (ClusterOps' contract: half-up quantize
    * + 2^20 offset → non-negative lattice, so `//` replays Spark's
    * `div`; argmin ties to the smaller cid; sums widen to HUGEINT
    * natively). Every round materializes assignment and centroids as
    * CTEs; the face is the per-cluster audit under the final centroids. */
  def kmeansSql(k: Int, rounds: Int): String = {
    val r = (1 to rounds).map { i =>
      s"""a$i AS MATERIALIZED (
         |  SELECT vid, cid FROM (
         |    SELECT q.vid, c.cid,
         |           list_sum(list_transform(range(1, len(q.qv) + 1),
         |             t -> (q.qv[t] - c.cv[t]) * (q.qv[t] - c.cv[t]))) AS dist,
         |           row_number() OVER (PARTITION BY q.vid ORDER BY
         |             list_sum(list_transform(range(1, len(q.qv) + 1),
         |               t -> (q.qv[t] - c.cv[t]) * (q.qv[t] - c.cv[t]))), c.cid) AS rn
         |    FROM q, c${i - 1} c)
         |  WHERE rn = 1
         |), u$i AS (
         |  SELECT a.cid, js.j, CAST(sum(q.qv[js.j]) // count(*) AS BIGINT) AS cj
         |  FROM a$i a JOIN q USING (vid)
         |       CROSS JOIN (SELECT unnest(range(1, (SELECT max(len(qv)) FROM q) + 1)) AS j) js
         |  GROUP BY a.cid, js.j
         |), c$i AS MATERIALIZED (
         |  SELECT cid, list(cj ORDER BY j) AS cv FROM u$i GROUP BY cid
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id AS vid,
       |         list_transform(embedding::DOUBLE[],
       |           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT) + 1048576) AS qv
       |  FROM embeddings
       |), c0 AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY vid) AS BIGINT) AS cid, qv AS cv
       |  FROM (SELECT vid, qv FROM q ORDER BY vid LIMIT $k)
       |), $r, fin AS (
       |  SELECT vid, cid, dist FROM (
       |    SELECT q.vid, c.cid,
       |           CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
       |             t -> (q.qv[t] - c.cv[t]) * (q.qv[t] - c.cv[t]))) AS BIGINT) AS dist,
       |           row_number() OVER (PARTITION BY q.vid ORDER BY
       |             list_sum(list_transform(range(1, len(q.qv) + 1),
       |               t -> (q.qv[t] - c.cv[t]) * (q.qv[t] - c.cv[t]))), c.cid) AS rn
       |    FROM q, c$rounds c)
       |  WHERE rn = 1
       |)
       |SELECT f.cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |       CAST(sum(f.dist) AS DOUBLE) AS inertia,
       |       CAST(max(cs.s) AS BIGINT) AS centroid_sum
       |FROM fin f JOIN (SELECT cid, list_sum(cv) AS s FROM c$rounds) cs USING (cid)
       |GROUP BY f.cid""".stripMargin
  }

  /** The gr2 oracle, generated like [[pagerankSql]]: k chained label-
    * propagation rounds — per-destination neighbor-label counts, argmax
    * with the smallest-label tie-break. Pure integer counting. */
  def labelPropSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""c$i AS (
         |  SELECT e.v, l${i - 1}.lbl, CAST(count(*) AS BIGINT) AS cnt
         |  FROM edges e JOIN l${i - 1} ON e.u = l${i - 1}.u GROUP BY 1, 2
         |), l$i AS (
         |  SELECT v AS u, lbl FROM (
         |    SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY cnt DESC, lbl) AS rn
         |    FROM c$i) WHERE rn = 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |), edges AS (
       |  SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
       |), l0 AS (
       |  SELECT DISTINCT u, u AS lbl FROM edges
       |), $rounds
       |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members
       |FROM l$k GROUP BY 1 ORDER BY n_members DESC, community LIMIT 20""".stripMargin
  }

  /** The gr3 oracle, generated: k HITS rounds in exact integer
    * fixed-point over the customer→part purchase graph. DuckDB's
    * sum(BIGINT) is HUGEINT and `//` truncates like Spark's `div`, so
    * the max-normalized update replays bit-for-bit (GraphOps.hits'
    * contract). */
  def hitsSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""ra$i AS MATERIALIZED (
         |  SELECT e.v, sum(h.h) AS s FROM e JOIN h${i - 1} h USING (u) GROUP BY e.v
         |), a$i AS MATERIALIZED (
         |  SELECT v, CAST(CAST(s AS HUGEINT) * 1000000000000 // (SELECT max(s) FROM ra$i) AS BIGINT) AS a
         |  FROM ra$i
         |), rh$i AS MATERIALIZED (
         |  SELECT e.u, sum(a.a) AS s FROM e JOIN a$i a USING (v) GROUP BY e.u
         |), h$i AS MATERIALIZED (
         |  SELECT u, CAST(CAST(s AS HUGEINT) * 1000000000000 // (SELECT max(s) FROM rh$i) AS BIGINT) AS h
         |  FROM rh$i
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS v
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |), h0 AS (
       |  SELECT DISTINCT u, CAST(1000000000000 AS BIGINT) AS h FROM e
       |), $rounds
       |SELECT side, node_id, score FROM (
       |  (SELECT 'authority' AS side, v AS node_id, a AS score FROM a$k
       |   ORDER BY a DESC, v LIMIT 20)
       |  UNION ALL
       |  (SELECT 'hub' AS side, u AS node_id, h AS score FROM h$k
       |   ORDER BY h DESC, u LIMIT 20))""".stripMargin
  }

  /** customers-mart analog: per-customer order stats + lifetime revenue. */
  def customer360(s: SparkSession, dir: String): DataFrame = {
    val customer = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    val lineitem = t(s, dir, "lineitem")
    val orderStats = orders.groupBy("o_custkey").agg(
      min("o_orderdate").as("first_order"),
      max("o_orderdate").as("most_recent_order"),
      count("o_orderkey").as("number_of_orders"))
    // partial revenue below the join (same rewrite as j1): the join and
    // the custkey shuffle carry one row per ORDER, not per line item —
    // decimal partials re-sum exactly, so the flat-sum oracle still matches
    val revenue = lineitem
      .groupBy("l_orderkey")
      .agg(graft.ops.ExactSums.dsumPartial(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_part"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"), "left")
      .groupBy("o_custkey")
      .agg(graft.ops.ExactSums.dsumFinal(col("rev_part")).as("lifetime_value"))
    customer
      .join(orderStats, col("c_custkey") === orderStats("o_custkey"), "left")
      .drop(orderStats("o_custkey"))
      .join(revenue, col("c_custkey") === revenue("o_custkey"), "left")
      .drop(revenue("o_custkey"))
      .select(col("c_custkey").as("customer_id"), col("c_name").as("name"),
        col("first_order"), col("most_recent_order"), col("number_of_orders"),
        col("lifetime_value"))
  }
}
