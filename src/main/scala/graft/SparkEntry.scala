package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{ClassifyOps, ContaminationOps, DedupOps, EventOps, LakeOps, PackOps, QuantizeOps, SampleOps, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query keys map 1:1 onto SURVEY.md §2's operator inventory (prefix =
  * operator id) plus the §7.4 extension surface; the complete
  * key→implementation→spec map is SURVEY §8. Families:
  *
  *  - p/f/j/a/mart/q: the reference-parity surface (§2.2-2.6)
  *  - w1-w5/set/sj/d1/u1/x1/dt1/agg1-7: windows (row+range frames, heap
  *    top-k UDAF), set ops, distinct, explode, dates, agg breadth (rollup,
  *    cube, percentiles, exact moments, argmax UDAF)
  *  - e1-e4/st1-st2: event-time ops batch + Structured Streaming drains
  *  - aj1/aj2/rj1/sk1: temporal joins (composition AND the custom
  *    AsOfJoinExec physical operator), range join, salted skew join
  *  - txt1-9/dd1-4/pipe1/smp1-2/ctm1: text analysis (incl. PII redaction,
  *    tf-idf), dedup (exact, jaccard pairs, greedy survivors,
  *    connected-components survivors), the composed cleaning pipeline,
  *    deterministic hash split + per-group corpus caps, benchmark-
  *    contamination screening
  *  - mh1/sh1/ann1-3/cn1/v1: MinHash/SimHash near-dup, ANN (brute force,
  *    LSH, IVF), cosine near-dup, vector math
  *  - mm1/mm2, src1-3: multimodal binary plumbing; JSON/CSV/partitioned
  *    source round-trips
  *
  * Oracle notes (SURVEY §7.5 + NEXT.md §6): money/quantity sums accumulate
  * in DECIMAL (ExactSums); moments use exact integer sums with textually
  * identical double formulas; counts cast to BIGINT both sides; window
  * ranks carry total-order tie-breaks; DATEs cast to TIMESTAMP. Queries
  * whose semantics are hash/seed/sketch-dependent (mh1, sh1, ann2,
  * cn1, agg3, agg8) have no oracle SQL — the driver records rows-only
  * checks; their correctness is pinned by ScalaTest specs against exact
  * ground truth (or, for the sketches, error bounds vs the exact value).
  * ann3 IS oracle-checked despite the k-means fit: the fit is
  * deterministic and restart-stable, so the neighbor IDENTITIES are
  * per-SF goldens while DuckDB re-derives every score from the raw
  * embeddings (stronger than a recall constant — any ranking change
  * moves an identity and fails the hash).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") Tables.events(s, dir) else Tables.load(s, dir, name)

  // oracle-deterministic money sums — see graft.ops.ExactSums for the
  // cross-engine reproducibility contract
  private def dsum(c: Column): Column = graft.ops.ExactSums.dsum(c)
  private def dsumSql(expr: String): String = graft.ops.ExactSums.dsumSql(expr)

  /** ret3's oracle: MMR replayed greedy round by greedy round (the km2
    * chained-CTE pattern) — round r picks the row_number-1 candidate of
    * `7·rel − 3·max(sim to s_{r-1})` with ties on doc_id, and s_r
    * accumulates. rel/sim are 4dp-cosine basis points (ann1 contract). */
  private def mmrOracleSql: String = {
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
  private def bpeCtes(k: Int): String = {
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

  private def bpeSql(k: Int): String =
    bpeCtes(k) + "\n" + (1 to k).map(i =>
      s"SELECT CAST($i AS INT) AS merge_rank, lhs, rhs, freq FROM b$i").mkString("\nUNION ALL\n")

  private def bpeSegmentSql(k: Int): String =
    bpeCtes(k) +
      s"""
         |SELECT word, w AS n_occurrences,
         |       replace(trim(seq, chr(31)), chr(31)||chr(31), '.') AS segmentation
         |FROM v$k""".stripMargin

  /** The txt18 oracle: WordPiece rounds — BPE's replace machinery with
    * likelihood scoring replayed per round (pair freqs + CURRENT symbol
    * counts + the exact fixed-point score, HUGEINT-widened so nothing
    * overflows, truncating // = Spark's div). */
  private def wordpieceSql(k: Int): String = {
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
  private val UniP = 4; private val UniL = 16; private val UniK = 200

  /** One Viterbi DP round's CTEs (spans under v{r-1}, the per-position
    * frontier b-tables, and the backtrack bt-tables). */
  private def unigramDpCtes(r: Int): String = {
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
  private def unigramCtes(emRounds: Int): String = {
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

  private def unigramSql(rounds: Int): String =
    s"""${unigramCtes(rounds)}
       |SELECT piece, c AS n_uses, cost FROM v$rounds
       |ORDER BY n_uses DESC, piece LIMIT 64""".stripMargin

  /** The txt21 oracle: one more Viterbi DP round under the FINAL vocab,
    * pieces re-joined left-to-right (ordering by span END equals the
    * engine's reversed backtrack emission). */
  private def unigramSegmentSql(rounds: Int): String = {
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
  private val sessionWindowSql: String =
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
  private def ktrussSql(k: Int, rounds: Int): String = {
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
  private def textrankSql(k: Int): String = {
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

  private def pagerankSql(k: Int): String = {
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
  private def kcoreSql(k: Int, rounds: Int): String = {
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
  private def kcenterSql(k: Int): String = {
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
  private def powerIterSql(rounds: Int): String = {
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
  private def treeSql: String =
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
  private def kmeansSql(k: Int, rounds: Int): String = {
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
  private def labelPropSql(k: Int): String = {
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
  private def hitsSql(k: Int): String = {
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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The customer-360 mart shape (SURVEY §2: J1+J2+A1-A5) on the testdata
    * star schema.
    */
  def entry(spark: SparkSession): DataFrame =
    customer360(spark, "/root/testdata/sf0.001")

  /** customers-mart analog: per-customer order stats + lifetime revenue. */
  private def customer360(s: SparkSession, dir: String): DataFrame = {
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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- projections / scalar expressions (SURVEY §2.2) ----
    "p1_rename_project" -> ((s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("name"),
        col("c_mktsegment").as("segment"))),

    "p3_scalar_arithmetic" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .as("charge"))),

    "f1_filter_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_discount", "l_extendedprice")),

    // ---- joins + aggregation shapes (SURVEY §2.3/§2.4) ----
    "j1_left_join_agg" -> ((s, dir) => {
      // J1 shape: fact ⟕ dim then group by the right side's key — left join
      // so unmatched facts land in a NULL-key group, never dropped.
      // The partial aggregate is pushed BELOW the join (a rewrite Catalyst
      // doesn't perform): revenue/count collapse to one row per order key
      // first, so both the join and the custkey shuffle move |orders|
      // rows instead of |lineitem| (~4× narrower at every exchange; j1 was
      // the suite's worst 10× growth factor, ×12.6, before this). Exact
      // decimal addition is associative, so the flat-sum oracle still
      // hash-matches (ExactSums.dsumPartial/dsumFinal contract).
      val perOrder = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
          graft.ops.ExactSums.dsumPartial(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_part"),
          count(lit(1)).as("n_part"))
      perOrder
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"), "left")
        .groupBy("o_custkey")
        .agg(graft.ops.ExactSums.dsumFinal(col("rev_part")).as("revenue"),
          sum(col("n_part")).as("n_items"))
    }),

    "j2_customer360" -> ((s, dir) => customer360(s, dir)),

    "a4_group_minmaxcount" -> ((s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey").agg(
        min("o_orderdate").as("first_order"),
        max("o_orderdate").as("last_order"),
        count("o_orderkey").as("n_orders"))),

    "a6_pivot_sum" -> ((s, dir) => {
      // statically-declared pivot (orders.sql:1 pattern): fixed status set,
      // else-0 semantics, schema never data-driven
      val statuses = Seq("F", "O", "P")
      val pivots = statuses.map(st =>
        dsum(when(col("o_orderstatus") === st, col("o_totalprice")).otherwise(lit(0.0)))
          .as(s"status_${st.toLowerCase}_amount"))
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(pivots.head, (pivots.tail :+ dsum(col("o_totalprice")).as("total_amount")): _*)
    }),

    "mart_orders_full" -> ((s, dir) => {
      // orders-mart shape (J4+A6+A7): per-order revenue pivot by returnflag
      val flags = Seq("R", "A", "N")
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val pivots = flags.map(f =>
        dsum(when(col("l_returnflag") === f, rev).otherwise(lit(0.0)))
          .as(s"${f.toLowerCase}_amount"))
      val perOrder = t(s, dir, "lineitem").groupBy("l_orderkey")
        .agg(pivots.head, (pivots.tail :+ dsum(rev).as("amount")): _*)
      t(s, dir, "orders")
        .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("r_amount"), col("a_amount"), col("n_amount"), col("amount"))
    }),

    // ---- the four dbt test operators as queries (SURVEY §2.6), reusing
    // the graft.quality.Checks implementations the 20-test suite runs ----
    "q1_unique_violations" -> ((s, dir) =>
      graft.quality.Checks.unique(t(s, dir, "lineitem"), "l_partkey")),

    "q2_not_null_violations" -> ((s, dir) =>
      graft.quality.Checks.notNull(t(s, dir, "orders"), "o_custkey")
        .select("o_orderkey", "o_custkey")),

    "q3_accepted_values_violations" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type").isNotNull && !col("event_type").isin("purchase", "click", "view"))
        .groupBy("event_type").agg(count(lit(1)).as("n_rows"))),

    "q4_relationship_violations" -> ((s, dir) => {
      val parent = t(s, dir, "supplier").filter(col("s_suppkey") < 5)
        .select(col("s_suppkey"))
      t(s, dir, "lineitem").filter(col("l_suppkey").isNotNull)
        .join(parent, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .select("l_orderkey", "l_linenumber", "l_suppkey")
    }),

    // ---- window / set / distinct / semi-join extensions (SURVEY §2.7) ----
    "w1_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
    }),

    "w5_range_frame" -> ((s, dir) => {
      // value-based RANGE frame (vs w3's row-based): per customer, spend
      // in the trailing 30 days of each order — the frame is defined by
      // the ORDER BY value, so peers/gaps behave differently from ROWS
      val w = Window.partitionBy("o_custkey")
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-30L * 86400L, 0L)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(w).cast("double").as("trailing_30d_spend"),
        count(lit(1)).over(w).as("trailing_30d_orders"))
    }),

    "w4_topk_agg" -> ((s, dir) => {
      // SAME result as w1's window top-k, via the bounded-heap
      // TypedImperativeAggregate: partial aggregation ships ≤k rows per
      // (group, map task) into the shuffle instead of sorting every row
      graft.functions.NativeExpressions.register(s)
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(expr("graft_topk(o_totalprice, o_orderkey, 3)").as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(col("o_custkey"), col("col.payload").as("o_orderkey"),
          col("col.value").as("o_totalprice"), (col("pos") + 1).cast("int").as("rnk"))
    }),

    "w2_order_limit" -> ((s, dir) =>
      // global top-n: TakeOrderedAndProject, not a full sort — the limit
      // pushes into per-partition heaps; deterministic tie-break on key
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)),

    "j3_full_outer" -> ((s, dir) => {
      // full-outer join with unmatched rows on BOTH sides
      val c = t(s, dir, "customer").filter(col("c_custkey") < 800)
        .select("c_custkey", "c_name")
      val o = t(s, dir, "orders").filter(col("o_custkey") >= 400)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"), col("n_orders"))
    }),

    "w3_window_funcs" -> ((s, dir) => {
      // analytic-window breadth: rank, lag, running sum over an ordered
      // per-customer frame (running DECIMAL sum is order-defined, so it is
      // engine-reproducible without rounding)
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("order_rank"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
    }),

    "set1_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
    }),

    "set2_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "P").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
    }),

    "a9_unpivot" -> ((s, dir) => {
      // unpivot/melt — the inverse of a6's pivot: wide metric columns
      // back to (key, metric, value) long form, a narrow projection
      // (each input row emits one row per value column, no shuffle
      // beyond the feeding aggregate)
      val wide = t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"), dsum(col("l_extendedprice")).as("sum_price"))
      wide.unpivot(Array(col("l_returnflag")), Array(col("sum_qty"), col("sum_price")),
        "metric", "value")
    }),

    "j5_nullsafe_join" -> ((s, dir) => {
      // null-safe equality (<=>): NULL keys MATCH each other, where a
      // plain equi-join silently drops them — the semantics dimension
      // tables with "unknown" buckets need
      val e = t(s, dir, "events").withColumn("grp",
        when(col("event_type") === "click", lit(null).cast("string")).otherwise(col("event_type")))
      val a = e.groupBy("grp").agg(count(lit(1)).as("n_all"))
      val b = e.filter(col("value") > 50).groupBy("grp").agg(count(lit(1)).as("n_high"))
      a.join(b, a("grp") <=> b("grp"))
        .select(a("grp").as("grp"), col("n_all"), col("n_high"))
    }),

    "o1_null_ordering" -> ((s, dir) => {
      // explicit NULL placement in ORDER BY + LIMIT: engines disagree on
      // the default (Spark: NULLS FIRST asc; DuckDB: NULLS LAST), so any
      // cross-engine top-n over a nullable key MUST pin it; NULLS FIRST
      // surfaces the no-order customers, tie-broken to a total order
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("n_orders"))
        .orderBy(col("n_orders").desc_nulls_first, col("c_custkey").asc)
        .limit(25)
    }),

    "set3_except_all" -> ((s, dir) => {
      // multiset difference: keeps SURPLUS duplicates (an O-status row is
      // removed once per matching F-status row, not wholesale) — distinct
      // except() can't express this; planned as a count-based anti pattern
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .exceptAll(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
    }),

    "set4_intersect_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .intersectAll(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
    }),

    "d1_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    "x2_string_agg" -> ((s, dir) =>
      // listagg/string_agg: per-customer order-id roster. Deterministic by
      // construction — collect_list is order-nondeterministic under
      // parallelism, so the list is array_sort'ed BEFORE joining (the
      // oracle mirrors with string_agg(... ORDER BY)); group sizes are
      // bounded (orders per customer), so the buffer is too
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(array_join(
          transform(array_sort(collect_list(col("o_orderkey"))), _.cast("string")),
          ",").as("order_ids"),
          count(lit(1)).as("n_orders"))),

    "x3_array_set_agg" -> ((s, dir) =>
      // collect_set (DISTINCT array agg) beside x2's collect_list:
      // sorted before joining for the same determinism reason; set
      // cardinality rides along as a scalar
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          size(collect_set(col("o_orderpriority"))).cast("long").as("n_priorities"))),

    "hof1_array_funcs" -> ((s, dir) => {
      // collection-function breadth over tokenized text: slice /
      // contains / position plus an order-INSENSITIVE higher-order fold
      // (max token length — greatest() commutes, so any evaluation
      // order agrees; a sum-fold over doubles would not be
      // cross-engine-stable, which is why v1 rounds). All map-only,
      // codegen'd — no shuffle (the txt family's plan discipline)
      val toks = split(col("text"), " ")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_toks"),
        concat_ws(" ", slice(toks, 1, 3)).as("first3"),
        array_contains(toks, "the").as("has_the"),
        aggregate(toks, lit(0), (a, x) => greatest(a, length(x)))
          .cast("long").as("max_tok_len"),
        array_position(toks, "the").as("pos_the"))
    }),

    "dt2_timestamp_funcs" -> ((s, dir) =>
      // timestamp-function breadth on event times: epoch round-trip
      // (second truncation via integer division), day/hour truncation,
      // field extraction. ISO day-of-week (Monday=1) — Spark's weekday()
      // is 0-based Monday and DuckDB's isodow is 1-based, engines'
      // default dayofweek disagree on the week start
      t(s, dir, "events").select(
        col("event_id"),
        unix_micros(col("ts")).as("epoch_us"),
        date_trunc("day", col("ts")).as("day_start"),
        date_trunc("hour", col("ts")).as("hour_start"),
        timestamp_seconds(floor(unix_micros(col("ts")) / lit(1000000L)).cast("long")).as("ts_seconds"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("m"),
        (weekday(col("ts")) + 1).cast("long").as("iso_dow"))),

    "agg10_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS beside agg2's rollup and agg7's cube:
      // the caller picks exactly which subtotal combinations materialize
      // (one shuffle, Expand feeds each row to its sets). grouping_id()
      // disambiguates subtotal rows from genuine NULL group values —
      // first listed column is the most significant bit in both engines
      // (the Postgres convention)
      t(s, dir, "orders").createOrReplaceTempView("agg10_orders")
      s.sql(s"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n_orders,
               ${dsumSql("o_totalprice")} AS amount
        FROM agg10_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())""")
    }),

    "ts1_gap_fill" -> ((s, dir) => {
      // time-series resample + gap fill: hourly per-type counts with
      // missing (hour, type) cells zero-filled. The dense hour spine and
      // the type list both derive from the AGGREGATE (hours × types
      // rows), not the raw events — one scan, one shuffle, and the three
      // consumers of `agg` share the same exchange (Spark's
      // ReuseExchange), so the grid costs nothing extra at 100 TB
      val ev = t(s, dir, "events").select(
        date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"), col("value"))
      val agg = ev.groupBy("hour_start", "event_type").agg(
        count(lit(1)).cast("long").as("n_events"),
        dsum(col("value")).as("amount"))
      val bounds = agg.agg(min("hour_start").as("lo"), max("hour_start").as("hi"))
      val hours = bounds.select(
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hour_start"))
      val types = agg.select("event_type").distinct()
      hours.crossJoin(broadcast(types))
        .join(agg, Seq("hour_start", "event_type"), "left")
        .select(col("hour_start"), col("event_type"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("amount"), lit(0.0)).as("amount"))
    }),

    "pvt1_dynamic_pivot" -> ((s, dir) =>
      // DYNAMIC pivot: the column set is discovered from the data — Spark
      // runs a distinct job first to determine the output schema (the
      // inherent two-pass every dynamic-pivot engine shares; a6 is the
      // static single-pass form with the values pinned). Cells with no
      // input rows stay NULL, distinguishing "no orders" from "sum 0"
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .pivot("o_orderstatus")
        .agg(dsum(col("o_totalprice")))),

    "smp3_stratified_sample" -> ((s, dir) => {
      // stratified deterministic sampling: per-stratum keep rates over
      // the same Knuth hash as smp1 — rebalances the class mix (downsample
      // the dominant statuses, keep all of the rare one) as a pure
      // projection+filter: no shuffle, reproducible on any partitioning
      // or subset of a 100 TB corpus
      val rate = when(col("o_orderstatus") === "F", lit(10L))
        .when(col("o_orderstatus") === "O", lit(50L))
        .otherwise(lit(100L))
      t(s, dir, "orders")
        .filter(pmod(SampleOps.knuth32(col("o_orderkey")), lit(100L)) < rate)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    }),

    "dd5_passage_dup" -> ((s, dir) => {
      // cross-document boilerplate score: fraction of a document's
      // 8-token passages that appear verbatim in at least one OTHER
      // document (near-exact dups score 1.0). Shape: ONE corpus scan +
      // bounded explode (fan-out = tokens/8), then a (doc, passage)
      // aggregate whose rows flow through a passage-partitioned window
      // (distinct-doc count, no self-join — a join back onto the explode
      // would re-scan and re-tokenize the corpus) into the per-doc
      // aggregate; exchanges carry (passage, doc_id, k) rows only
      val passages = t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) > 0)
        .select(col("doc_id"), col("ts"),
          explode(sequence(lit(1L),
            ceil(size(col("ts")).cast("double") / 8.0).cast("long"))).as("i"))
        .select(col("doc_id"),
          concat_ws(" ", slice(col("ts"), ((col("i") - 1) * 8 + 1).cast("int"), lit(8)))
            .as("passage"))
      val perDoc = passages.groupBy("doc_id", "passage")
        .agg(count(lit(1)).as("k")) // a doc may repeat a passage internally
      val nd = count(lit(1)).over(Window.partitionBy("passage")) // rows = distinct docs
      perDoc.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(sum("k").cast("long").as("n_passages"),
          round(sum(when(col("nd") >= 2, col("k")).otherwise(lit(0L))).cast("double") /
            sum("k"), 4).as("dup_frac"))
    }),

    "smp4_target_mixture" -> ((s, dir) => {
      // data-derived mixture resampling: hit target language proportions
      // (en 40%, others 15%) with maximum retention — T = min(count/p)
      // is the largest feasible total, per-language quota = floor(p*T),
      // rows picked by Knuth-hash rank (deterministic on any
      // partitioning). The quota derivation runs on the 5-row language
      // aggregate (an unpartitioned window over 5 rows, not a join);
      // the corpus-side cost is one per-language rank window
      val docs = t(s, dir, "documents")
      val target = when(col("lang") === "en", lit(0.4)).otherwise(lit(0.15))
      val wAll = Window.partitionBy() // 5 rows: one per language
      val quotas = docs.groupBy("lang").agg(count(lit(1)).cast("double").as("c"))
        .withColumn("p", target)
        .withColumn("n_keep", floor(col("p") * min(col("c") / col("p")).over(wAll)))
        .select("lang", "n_keep")
      val byHash = Window.partitionBy("lang")
        .orderBy(SampleOps.knuth32(col("doc_id")), col("doc_id"))
      docs.withColumn("rk", row_number().over(byHash))
        .join(broadcast(quotas), "lang")
        .filter(col("rk") <= col("n_keep"))
        .select("doc_id", "lang")
    }),

    "smp6_temperature_mixture" -> ((s, dir) => {
      // temperature-scaled multilingual mixing (the mBERT/XLM-R
      // resampling rule at T = 0.5): per-language share ∝ sqrt(c_i)
      // instead of c_i — upsamples tail languages, downsamples the
      // head; budget = half the corpus, quotas capped at availability.
      // Cross-engine exactness: sqrt is IEEE-correctly-rounded, the
      // rounded weights become DECIMAL(18,6) so their SUM is exact
      // (float addition of the weights would be summation-order-
      // dependent — the one step smp4's min() never had to worry
      // about), and the final quota arithmetic is the same left-assoc
      // double expression in both engines. Rows picked by Knuth-hash
      // rank, the smp1/smp2/smp4 convention.
      val docs = t(s, dir, "documents")
      val wAll = Window.partitionBy()
      val quotas = docs.groupBy("lang").agg(count(lit(1)).cast("double").as("c"))
        .withColumn("w",
          round(sqrt(col("c")), 6).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .withColumn("n_keep", least(col("c"),
          floor(lit(0.5) * sum(col("c")).over(wAll) * col("w").cast("double")
            / sum(col("w")).over(wAll).cast("double"))).cast("long"))
        .select("lang", "n_keep")
      val byHash = Window.partitionBy("lang")
        .orderBy(SampleOps.knuth32(col("doc_id")), col("doc_id"))
      docs.withColumn("rk", row_number().over(byHash))
        .join(broadcast(quotas), "lang")
        .filter(col("rk") <= col("n_keep"))
        .select("doc_id", "lang")
    }),

    "gr3_hits" -> ((s, dir) => {
      // HITS hubs & authorities over the BIPARTITE customer→part
      // purchase graph (hubs = broad buyers, authorities = widely-
      // bought parts): 3 rounds of exact integer fixed-point with
      // max-normalization — L2 has no integer fixed point; max
      // preserves the ranking and replays exactly. Face = top-20 of
      // each side, total-ordered.
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("v"))
        .distinct()
      val (hubs, auths) = graft.ops.GraphOps.hits(edges, iterations = 3)
      auths.orderBy(col("a").desc, col("v")).limit(20)
        .select(lit("authority").as("side"), col("v").as("node_id"), col("a").as("score"))
        .unionByName(
          hubs.orderBy(col("h").desc, col("u")).limit(20)
            .select(lit("hub").as("side"), col("u").as("node_id"), col("h").as("score")))
    }),

    "gr4_triangles" -> ((s, dir) => {
      // exact per-node triangle counts over the part co-purchase graph
      // via degree-ordered orientation (each triangle materializes once
      // as a wedge at its smallest corner) — the local-clustering
      // signal under community/quality audits. All-integer, no
      // iteration; the oracle replays orientation, wedges, and closure.
      // Face = top-20 parts by count, total-ordered.
      val edges = graft.ops.GraphOps.coOccurrenceEdges(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey")
      graft.ops.GraphOps.triangleCounts(edges)
        .orderBy(col("tri").desc, col("u"))
        .limit(20)
        .select(col("u").as("part_id"), col("tri").as("n_triangles"))
    }),

    "gr6_ktruss" -> ((s, dir) => {
      // k-truss decomposition (7-truss, 5 peeling rounds — measured
      // past the fixed point at every SF on the %4-decimated
      // co-purchase graph): the EDGE analog of gr5's core and the
      // stronger cohesion signal — every surviving edge closes ≥5
      // triangles with other survivors, so a hub alone can't hold a
      // truss together. Support recomputes per round via the gr4
      // degree-ordered orientation (O(E^1.5) wedges, hub-proof); the
      // converged flag comes from one extra support pass and is PINNED.
      // Face = top-20 edges by (support desc, edge), total-ordered.
      val li = t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
      val edges = graft.ops.GraphOps.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      val (truss, conv) = graft.ops.GraphOps.kTruss(edges, k = 7, rounds = 5)
      truss.orderBy(col("support").desc, col("u"), col("v"))
        .limit(20)
        .select(lit(conv).as("converged"),
          col("u").as("part_a"), col("v").as("part_b"), col("support"))
    }),

    "gr5_kcore" -> ((s, dir) => {
      // k-core decomposition (6 peeling rounds at k=65 — measured to
      // pass the fixed point at every SF: the near-regular co-purchase
      // graph peels 1-3 rounds then stabilizes on a nonempty core):
      // the dense-subgraph curation signal. The converged flag is
      // computed by one extra degree pass and PINNED — an unconverged
      // budget can't pose as the core. Face = top-20 by within-core
      // degree, total-ordered.
      val edges = graft.ops.GraphOps.coOccurrenceEdges(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey")
      val (core, conv) = graft.ops.GraphOps.kCore(edges, k = 65, rounds = 6)
      core.orderBy(col("deg").desc, col("u"))
        .limit(20)
        .select(lit(conv).as("converged"),
          col("u").as("part_id"), col("deg").as("core_degree"))
    }),

    "gr2_label_propagation" -> ((s, dir) => {
      // community detection: 4 rounds of synchronous label propagation
      // over the part co-purchase graph — most-frequent neighbor label,
      // ties to the smallest (the deterministic argmax; async LPA's
      // random tie-break could never meet an oracle). Pure integer
      // counting, so the oracle replays every round as chained CTEs.
      // Face = community sizes (top 20 by size, id tie-break).
      val edges = graft.ops.GraphOps.coOccurrenceEdges(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey")
      graft.ops.GraphOps.labelPropagation(edges, iterations = 4)
        .groupBy("lbl")
        .agg(count(lit(1)).cast("long").as("n_members"))
        .orderBy(col("n_members").desc, col("lbl"))
        .limit(20)
        .select(col("lbl").as("community"), col("n_members"))
    }),

    "txt14_normalize" -> ((s, dir) =>
      // corpus text normalization: lowercase, strip non-alphanumerics,
      // collapse whitespace — the standard pre-tokenization cleanup as a
      // pure codegen'd projection (the dirty JSON props column is the
      // fixture). Patterns use only Java-regex/RE2-common constructs,
      // like txt8
      t(s, dir, "events").select(
        col("event_id"),
        trim(regexp_replace(regexp_replace(lower(col("props")),
          "[^a-z0-9 ]+", " "), " +", " ")).as("norm"))),

    "num1_try_arithmetic" -> ((s, dir) =>
      // ANSI-safe arithmetic breadth: try_divide yields NULL on a zero
      // divisor instead of throwing (this session runs ANSI mode), and
      // string→int parses to NULL for unparseable input — the
      // error-as-NULL contract a 100 TB batch job needs to not die on
      // row 47 billion. MEASURED caveat: bare try_cast is
      // exception-per-failing-row (caught exceptions still fill stack
      // traces — 5.3 s vs 0.3 s over 600 k all-failing rows), so the
      // cast sits behind a codegen'd regex guard and the exception path
      // is reserved for the pathological residue (overflow)
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"), col("l_quantity") - 25).as("safe_ratio"),
        when(col("l_returnflag").rlike("^-?[0-9]+$"), col("l_returnflag").try_cast("int"))
          .as("flag_num"))),

    "src6_datagen_pushdown" -> ((s, dir) =>
      // custom DataSourceV2 connector with REAL filter pushdown: the id
      // bounds reach DatagenScan.planInputPartitions and prune input
      // partitions at planning time (DatagenSpec asserts the count); the
      // bucket predicate stays a residual filter above the scan. Pure
      // function of id -> identical on any partitioning, and
      // generate_series replays it under the oracle
      s.read.format(classOf[graft.sources.DatagenTableProvider].getName)
        .option("numRows", 60000).option("numPartitions", 32).load()
        .filter(col("id") >= 1200L && col("id") < 45000L && col("bucket") === 7L)
        .select("id", "bucket", "price", "category")),

    "src7_datagen_agg_pushdown" -> ((s, dir) =>
      // complete aggregate pushdown into the V2 source: count/min/max
      // over the pushed id range answer in CLOSED FORM — the scan emits
      // one row and generates nothing (DatagenSpec asserts no
      // HashAggregate in the plan)
      s.read.format(classOf[graft.sources.DatagenTableProvider].getName)
        .option("numRows", 60000).option("numPartitions", 32).load()
        .filter(col("id") >= 1200L && col("id") < 45000L)
        .agg(count(lit(1)).as("n"), min("id").as("lo_id"), max("id").as("hi_id"))),

    "src9_datagen_groupby_pushdown" -> ((s, dir) =>
      // GROUP BY pushed into the V2 source: bucket = id % 100 makes
      // each group an arithmetic progression over the pushed range, so
      // count/min/max per group answer in closed form — the scan emits
      // ≤100 pre-aggregated rows, Spark plans NO aggregate and nothing
      // is generated (DatagenSpec asserts both); group-bys the source
      // can't answer (category) decline and plan normally
      s.read.format(classOf[graft.sources.DatagenTableProvider].getName)
        .option("numRows", 60000).option("numPartitions", 32).load()
        .filter(col("id") >= 1200L && col("id") < 45000L)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("id").as("lo_id"), max("id").as("hi_id"))),

    "src10_datagen_multi_groupby" -> ((s, dir) =>
      // the generalized pushdown tier: TWO residue-class group columns
      // plus SUM — every (category, bucket) group is a union of
      // arithmetic progressions whose count/sum merge as a monoid, so
      // the scan still answers closed-form with no aggregate planned
      s.read.format(classOf[graft.sources.DatagenTableProvider].getName)
        .option("numRows", 60000).option("numPartitions", 32).load()
        .filter(col("id") >= 1200L && col("id") < 45000L)
        .groupBy("category", "bucket")
        .agg(count(lit(1)).as("n"), sum("id").as("sum_id"))),

    "pack1_sequence_packing" -> ((s, dir) =>
      // GPT-style concat-and-chunk sequence packing: per-shard token
      // streams cut into 512-token blocks; emits the (block, doc, span)
      // manifest a training loader consumes. See PackOps for the
      // shard-parallel 100 TB design.
      PackOps.packSequences(t(s, dir, "documents"), "doc_id", "text", 8, 512)),

    "pack2_document_packing" -> ((s, dir) =>
      // boundary-respecting next-fit packing: documents never split
      // across bins (cf. pack1's concat-and-chunk). Sequential recurrence
      // per shard -> the one genuine mapPartitions case; the DuckDB
      // oracle replays it with a recursive CTE
      PackOps.packDocuments(t(s, dir, "documents"), "doc_id", "text", 8, 512)),

    "scd1_scd2_history" -> ((s, dir) =>
      // dbt-snapshot analog: SCD2 validity intervals from the order-status
      // observation log — one row per (customer, status) run with
      // [valid_from, valid_to) and is_current on the open interval
      LakeOps.scd2Snapshot(t(s, dir, "orders"),
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")),

    "mrg1_merge_upsert" -> ((s, dir) => {
      // dbt-incremental merge analog: apply one increment batch (orders
      // during 1996H1) to the state table built before 1996 — exercises
      // all three MERGE branches (update / insert / carry-through) at
      // every SF; LakeOpsSpec pins the branch semantics
      val orders = t(s, dir, "orders")
      val cutLo = lit("1996-01-01").cast("timestamp")
      val cutHi = lit("1996-07-01").cast("timestamp")
      val tgt = LakeOps.latestState(orders.filter(col("o_orderdate") < cutLo),
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
      val src = LakeOps.latestState(
        orders.filter(col("o_orderdate") >= cutLo && col("o_orderdate") < cutHi),
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
      LakeOps.mergeUpsert(tgt, src, "o_custkey",
        takeLatest = Seq("status", "last_order"), sumCols = Seq("n_orders"))
    }),

    "mv1_query_rewrite" -> ((s, dir) => {
      // transparent MATERIALIZED-VIEW routing (the optimizer half of
      // lake11's incremental maintenance): a count/sum aggregate over
      // the FACT manifest table is silently re-planned onto the
      // maintained mart — O(groups) instead of O(fact) — via a
      // registered Catalyst Rule (plans/MartRewrite). Pins: the
      // rewritten plan scans the MART and not the fact; a filtered
      // control query does NOT rewrite; the served numbers are the
      // full-fact truth (the mart was maintained to the tip).
      val fact = java.nio.file.Files.createTempDirectory("mv1_fact").toString
      val mart = java.nio.file.Files.createTempDirectory("mv1_mart").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      MT.create(s, fact, orders.filter(col("o_orderstatus") === "F"))
      graft.ops.LakeOps.maintainAggMart(s, fact, mart, "o_orderstatus", "o_totalprice")
      MT.append(s, fact, orders.filter(col("o_orderstatus") =!= "F"))
      graft.ops.LakeOps.maintainAggMart(s, fact, mart, "o_orderstatus", "o_totalprice")
      graft.plans.MartRewrite.register(s, fact, "o_orderstatus", "o_totalprice", mart)
      try {
        val q = MT.read(s, fact).groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"))
        def leafStrings(df: org.apache.spark.sql.DataFrame) =
          df.queryExecution.executedPlan.collectLeaves().map(_.toString)
        val martName = new java.io.File(mart).getName
        val factName = new java.io.File(fact).getName
        val servedFromMart = leafStrings(q).exists(_.contains(martName)) &&
          !leafStrings(q).exists(_.contains(factName))
        val control = MT.read(s, fact)
          .filter(col("o_orderkey") % 2 === 0).groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"))
        val controlUntouched = !leafStrings(control).exists(_.contains(martName))
        q.select(lit(servedFromMart).as("served_from_mart"),
          lit(controlUntouched).as("control_unrewritten"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
          .localCheckpoint() // pin the rows before deregistration
      } finally graft.plans.MartRewrite.deregister(fact)
    }),

    "mv2_rewrite_filtered" -> ((s, dir) => {
      // MartRewrite's two round-10 hardenings in one key: (a) a
      // deterministic filter over the GROUP KEY (the `WHERE key IN
      // (...)` shape real dashboards send) rides the rewrite onto the
      // mart — key predicates are group-preserving, so the filter
      // pushes verbatim; (b) fact-table identity is PROVEN by file-set
      // superset, so a TIME-TRAVEL read at v1 — a proper subset of the
      // registered files — must NOT be answered from the tip mart
      // (wrong results, not staleness) and is pinned both by plan
      // inspection and by its v1-true values.
      val fact = java.nio.file.Files.createTempDirectory("mv2_fact").toString
      val mart = java.nio.file.Files.createTempDirectory("mv2_mart").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      MT.create(s, fact, orders.filter(col("o_orderstatus") === "F"))
      MT.append(s, fact, orders.filter(col("o_orderstatus") =!= "F"))
      graft.ops.LakeOps.maintainAggMart(s, fact, mart, "o_orderstatus", "o_totalprice")
      graft.plans.MartRewrite.register(s, fact, "o_orderstatus", "o_totalprice", mart)
      try {
        def leafStrings(df: org.apache.spark.sql.DataFrame) =
          df.queryExecution.executedPlan.collectLeaves().map(_.toString)
        val martName = new java.io.File(mart).getName
        val factName = new java.io.File(fact).getName
        val q = MT.read(s, fact)
          .filter(col("o_orderstatus").isin("F", "O"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"))
        val filteredFromMart = leafStrings(q).exists(_.contains(martName)) &&
          !leafStrings(q).exists(_.contains(factName))
        val tt = MT.read(s, fact, Some(1L)).groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_tt"))
        val ttUnrewritten = !leafStrings(tt).exists(_.contains(martName))
        val ttRows = tt.collect() // v1 = F only
        val ttTrue = ttRows.length == 1 && ttRows(0).getString(0) == "F"
        q.select(lit(filteredFromMart).as("filtered_from_mart"),
          lit(ttUnrewritten && ttTrue).as("timetravel_unrewritten"),
          lit(ttRows(0).getLong(1)).as("n_f_at_v1"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
          .localCheckpoint() // pin the rows before deregistration
      } finally graft.plans.MartRewrite.deregister(fact)
    }),

    "mv3_rewrite_minmax" -> ((s, dir) => {
      // MV routing for the NON-self-maintainable mart shape: a
      // count/min/max aggregate (with a group-key filter) re-plans onto
      // the lake32-maintained (key, n_rows, vmin, vmax) mart, while a
      // sum-shaped control query — which that mart cannot serve — stays
      // on the fact scan. Pins: plan routing both ways, values equal
      // the from-scratch truth.
      val fact = java.nio.file.Files.createTempDirectory("mv3_fact").toString
      val mart = java.nio.file.Files.createTempDirectory("mv3_mart").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      MT.create(s, fact, orders)
      graft.ops.LakeOps.maintainMinMaxMart(s, fact, mart, "o_orderstatus", "o_totalprice")
      graft.plans.MartRewrite.registerMinMax(s, fact, "o_orderstatus", "o_totalprice", mart)
      try {
        def leafStrings(df: org.apache.spark.sql.DataFrame) =
          df.queryExecution.executedPlan.collectLeaves().map(_.toString)
        val martName = new java.io.File(mart).getName
        val factName = new java.io.File(fact).getName
        val q = MT.read(s, fact)
          .filter(col("o_orderstatus").isin("F", "O"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
        val servedFromMart = leafStrings(q).exists(_.contains(martName)) &&
          !leafStrings(q).exists(_.contains(factName))
        val control = MT.read(s, fact).groupBy("o_orderstatus")
          .agg(dsum(col("o_totalprice")).as("s"))
        val controlUntouched = !leafStrings(control).exists(_.contains(martName))
        q.select(lit(servedFromMart).as("served_from_mart"),
          lit(controlUntouched).as("sum_control_unrewritten"),
          col("o_orderstatus"), col("n_orders"), col("min_price"), col("max_price"))
          .localCheckpoint() // pin the rows before deregistration
      } finally graft.plans.MartRewrite.deregister(fact)
    }),

    "mv4_rewrite_composite" -> ((s, dir) => {
      // composite-key MV routing: a (status, priority) count/dsum mart
      // maintained incrementally through the total feed (an append + a
      // MOR delete window — maintainAggMartKeys, the lake30 algebra
      // over a surrogate-bound composite key), then a multi-key
      // aggregate in the REVERSED grouping order re-plans onto it.
      // Pins: routing, a single-key control staying on the fact, and
      // the served numbers equal the from-scratch truth.
      val fact = java.nio.file.Files.createTempDirectory("mv4_fact").toString
      val mart = java.nio.file.Files.createTempDirectory("mv4_mart").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val keys = Seq("o_orderstatus", "o_orderpriority")
      MT.create(s, fact, orders.filter(col("o_orderstatus") === "F"))
      graft.ops.LakeOps.maintainAggMartKeys(s, fact, mart, keys, "o_totalprice")
      MT.append(s, fact, orders.filter(col("o_orderstatus") =!= "F"))
      MT.deleteMor(s, fact, col("o_custkey") % 5 === 0)
      graft.ops.LakeOps.maintainAggMartKeys(s, fact, mart, keys, "o_totalprice")
      // a DV-bearing fact read carries the anti-join above the scan, a
      // shape the rewrite correctly cannot prove (spec-pinned safety);
      // purge materializes the deletes so the fact is pure files again
      MT.purgeDeletes(s, fact)
      graft.plans.MartRewrite.registerKeys(s, fact, keys, "o_totalprice", mart)
      try {
        def leafStrings(df: org.apache.spark.sql.DataFrame) =
          df.queryExecution.executedPlan.collectLeaves().map(_.toString)
        val martName = new java.io.File(mart).getName
        val factName = new java.io.File(fact).getName
        val q = MT.read(s, fact)
          .groupBy("o_orderpriority", "o_orderstatus") // reversed order
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"))
        val servedFromMart = leafStrings(q).exists(_.contains(martName)) &&
          !leafStrings(q).exists(_.contains(factName))
        val control = MT.read(s, fact).groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"))
        val controlUntouched = !leafStrings(control).exists(_.contains(martName))
        q.select(lit(servedFromMart).as("served_from_mart"),
          lit(controlUntouched).as("single_key_unrewritten"),
          col("o_orderpriority"), col("o_orderstatus"),
          col("n_orders"), col("total_price"))
          .localCheckpoint() // pin the rows before deregistration
      } finally graft.plans.MartRewrite.deregister(fact)
    }),

    "mv5_staleness_guard" -> ((s, dir) => {
      // the MV maintenance LOOP as one operation plus its ENFORCEABLE
      // freshness contract: LakeOps.maintainAndReregister advances the
      // mart AND the MartRewrite registration together (the operational
      // hole where maintaining-without-re-registering serves ever-staler
      // rewrites), and the registration's maxVersionLag disables the
      // rewrite once the fact tip runs more than N versions past the
      // registered snapshot — queries fall back to the FRESH fact scan
      // instead of unbounded staleness. Pins: four plan-shape probes
      // (fresh registration rewrites; within-bound staleness rewrites;
      // past-bound disables; one maintain call re-enables) + the final
      // mart-served aggregate equals the whole-fact truth.
      val fact = java.nio.file.Files.createTempDirectory("mv5_fact").toString
      val mart = java.nio.file.Files.createTempDirectory("mv5_mart").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      def leafStrings(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      val martName = new java.io.File(mart).getName
      def agg = MT.read(s, fact).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      def onMart = leafStrings(agg).exists(_.contains(martName))
      MT.create(s, fact, orders.filter(col("o_orderkey") % 4 === 0)) // v1
      graft.ops.LakeOps.maintainAndReregister(s, fact, mart,
        Seq("o_orderstatus"), "o_totalprice", maxVersionLag = 2L)
      try {
        val freshRewrites = onMart
        MT.append(s, fact, orders.filter(col("o_orderkey") % 4 === 1)) // v2: lag 1
        MT.append(s, fact, orders.filter(col("o_orderkey") % 4 === 2)) // v3: lag 2
        val withinBound = onMart
        MT.append(s, fact, orders.filter(col("o_orderkey") % 4 === 3)) // v4: lag 3
        val pastBoundDisabled = !onMart
        // ONE call: mart caught up to v4 AND registration advanced
        graft.ops.LakeOps.maintainAndReregister(s, fact, mart,
          Seq("o_orderstatus"), "o_totalprice", maxVersionLag = 2L)
        val q = agg
        val reregistered = leafStrings(q).exists(_.contains(martName))
        q.select(lit(freshRewrites).as("fresh_rewrites"),
          lit(withinBound).as("stale_within_bound_rewrites"),
          lit(pastBoundDisabled).as("past_bound_disabled"),
          lit(reregistered).as("reregistered_rewrites"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
          .localCheckpoint() // pin the rows before deregistration
      } finally graft.plans.MartRewrite.deregister(fact)
    }),

    "mv6_rewrite_avg" -> ((s, dir) => {
      // AVG from the sum mart with NO new mart shape: ExactSums.davg
      // (exact decimal sum ÷ count, divided as doubles — the
      // order-independent average both engines reproduce bit-exactly)
      // is total/n_rows, and both are stored mart columns, so the
      // rewrite derives it for free. Pins: the count+sum+avg aggregate
      // (with a group-key filter riding along) routes onto the mart;
      // an avg over an UNREGISTERED column stays on the fact; values
      // equal the from-scratch truth.
      val fact = java.nio.file.Files.createTempDirectory("mv6_fact").toString
      val mart = java.nio.file.Files.createTempDirectory("mv6_mart").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      MT.create(s, fact, orders)
      graft.ops.LakeOps.maintainAggMart(s, fact, mart, "o_orderstatus", "o_totalprice")
      graft.plans.MartRewrite.register(s, fact, "o_orderstatus", "o_totalprice", mart)
      try {
        def leafStrings(df: org.apache.spark.sql.DataFrame) =
          df.queryExecution.executedPlan.collectLeaves().map(_.toString)
        val martName = new java.io.File(mart).getName
        val factName = new java.io.File(fact).getName
        val q = MT.read(s, fact)
          .filter(col("o_orderstatus").isin("F", "O"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"),
            graft.ops.ExactSums.davg(col("o_totalprice")).as("avg_price"))
        val servedFromMart = leafStrings(q).exists(_.contains(martName)) &&
          !leafStrings(q).exists(_.contains(factName))
        val control = MT.read(s, fact).groupBy("o_orderstatus")
          .agg(graft.ops.ExactSums.davg(col("o_custkey")).as("a"))
        val controlUntouched = !leafStrings(control).exists(_.contains(martName))
        q.select(lit(servedFromMart).as("avg_from_mart"),
          lit(controlUntouched).as("other_column_unrewritten"),
          col("o_orderstatus"), col("n_orders"), col("total_price"), col("avg_price"))
          .localCheckpoint() // pin the rows before deregistration
      } finally graft.plans.MartRewrite.deregister(fact)
    }),

    "mv7_rewrite_join" -> ((s, dir) => {
      // JOIN-mart routing (the lake23 delta-join mart made transparent):
      // an INNER equi-join of the two registered facts — the exact
      // shape maintainJoinMart maintains — re-plans onto the mart that
      // stores the full joined row, so an aggregate ABOVE the join
      // reads O(mart) instead of re-joining O(A)+O(B). Maintained
      // incrementally across an append window via ONE
      // maintainJoinAndReregister call (delta-join algebra + both
      // cursors + re-registration). Pins: the join-agg scans the mart
      // and neither fact; a different key pair stays un-rewritten; the
      // served aggregate equals the from-scratch join-agg truth.
      val a = java.nio.file.Files.createTempDirectory("mv7_a").toString
      val b = java.nio.file.Files.createTempDirectory("mv7_b").toString
      val mart = java.nio.file.Files.createTempDirectory("mv7_mart").toString
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val MT = graft.sources.ManifestTable
      MT.create(s, a, orders.filter(col("o_orderstatus") === "F"))
      MT.create(s, b, customer)
      graft.ops.LakeOps.maintainJoinAndReregister(s, a, b, mart, "o_custkey", "c_custkey")
      MT.append(s, a, orders.filter(col("o_orderstatus") =!= "F"))
      graft.ops.LakeOps.maintainJoinAndReregister(s, a, b, mart, "o_custkey", "c_custkey")
      try {
        def leafStrings(df: org.apache.spark.sql.DataFrame) =
          df.queryExecution.executedPlan.collectLeaves().map(_.toString)
        val martName = new java.io.File(mart).getName
        val q = MT.read(s, a)
          .join(MT.read(s, b), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        val servedFromMart = leafStrings(q).exists(_.contains(martName)) &&
          !leafStrings(q).exists(l => l.contains(new java.io.File(a).getName) ||
            l.contains(new java.io.File(b).getName))
        val control = MT.read(s, a)
          .join(MT.read(s, b), col("o_custkey") === col("c_nationkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        val controlUntouched = !leafStrings(control).exists(_.contains(martName))
        q.select(lit(servedFromMart).as("join_from_mart"),
          lit(controlUntouched).as("other_key_unrewritten"),
          col("c_mktsegment"), col("n_orders"), col("total_price"))
          .localCheckpoint() // pin the rows before deregistration
      } finally {
        graft.plans.MartRewrite.deregister(a)
        graft.plans.MartRewrite.deregister(b)
      }
    }),

    "mv8_rewrite_join_agg" -> ((s, dir) => {
      // registerJoin ∘ register (the composed MV stack): the join mart
      // is itself a manifest table, so a count/sum mart maintained OVER
      // it rides the join mart's own change feed — and ONE
      // maintainJoinAggAndReregister call advances the A⋈B mart through
      // an append + MOR-delete window (total feed), the agg mart above
      // it, and BOTH rewrite registrations. A provable groupBy over the
      // join then serves from the AGG mart in O(groups): the plan scans
      // neither fact NOR the join mart. Pins: the join-agg's leaves are
      // the agg mart alone; the BARE join still routes to the join
      // mart; a different grouping key falls back to the join mart (not
      // the agg mart); values equal the from-scratch truth.
      val a = java.nio.file.Files.createTempDirectory("mv8_a").toString
      val b = java.nio.file.Files.createTempDirectory("mv8_b").toString
      val jmart = java.nio.file.Files.createTempDirectory("mv8_jmart").toString
      val amart = java.nio.file.Files.createTempDirectory("mv8_amart").toString
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val MT = graft.sources.ManifestTable
      MT.create(s, a, orders.filter(col("o_orderkey") % 3 === 0))
      MT.enableRowTracking(s, a) // the purge-dv window needs the id-preserving feed
      MT.create(s, b, customer)
      graft.ops.LakeOps.maintainJoinAggAndReregister(s, a, b, jmart, amart,
        "o_custkey", "c_custkey", "c_mktsegment", "o_totalprice")
      // a NON-append window on the fact: the total feed maintains the
      // join mart through it, and the agg mart follows the join mart's
      // own MOR change feed; the purge materializes the vector so the
      // tip scan is bare files again (rewrites refuse while a live DV's
      // anti-join sits above the scan — the documented MV contract)
      MT.append(s, a, orders.filter(col("o_orderkey") % 3 === 1))
      MT.deleteMor(s, a, col("o_orderkey") % 9 === 0)
      MT.purgeDeletes(s, a)
      graft.ops.LakeOps.maintainJoinAggAndReregister(s, a, b, jmart, amart,
        "o_custkey", "c_custkey", "c_mktsegment", "o_totalprice")
      try {
        def leafStrings(df: org.apache.spark.sql.DataFrame) =
          df.queryExecution.executedPlan.collectLeaves().map(_.toString)
        def name(p: String) = new java.io.File(p).getName
        def joinOf() = MT.read(s, a)
          .join(MT.read(s, b), col("o_custkey") === col("c_custkey"))
        val q = joinOf().groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        val qLeaves = leafStrings(q)
        val aggFromAggMart = qLeaves.exists(_.contains(name(amart))) &&
          !qLeaves.exists(l => l.contains(name(a)) || l.contains(name(b)) ||
            l.contains(name(jmart)))
        val bareJoinLeaves = leafStrings(joinOf())
        val joinFromJoinMart = bareJoinLeaves.exists(_.contains(name(jmart))) &&
          !bareJoinLeaves.exists(_.contains(name(amart)))
        val otherKey = joinOf().groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        val otherKeyLeaves = leafStrings(otherKey)
        val otherKeyOnJoinMart = otherKeyLeaves.exists(_.contains(name(jmart))) &&
          !otherKeyLeaves.exists(_.contains(name(amart)))
        q.select(lit(aggFromAggMart).as("agg_from_agg_mart"),
          lit(joinFromJoinMart).as("join_from_join_mart"),
          lit(otherKeyOnJoinMart).as("other_key_on_join_mart"),
          col("c_mktsegment"), col("n_orders"), col("total_price"))
          .localCheckpoint() // pin the rows before deregistration
      } finally {
        graft.plans.MartRewrite.deregister(a)
        graft.plans.MartRewrite.deregister(b)
        graft.plans.MartRewrite.deregister(jmart)
      }
    }),

    "lake11_incr_agg" -> ((s, dir) => {
      // incremental view maintenance over the CDF: the agg mart
      // bootstraps on the F slice, then two appends are folded in by
      // aggregating ONLY each delta and COW-merging the affected
      // groups; a fourth call is a caught-up no-op. The per-step delta
      // row counts are literal mirrors (the oracle re-derives them), so
      // a maintenance pass that silently rescanned or double-counted
      // breaks the hash; the final mart must equal the from-scratch
      // aggregate BIT-exactly (decimal partials are associative).
      val srcRoot = java.nio.file.Files.createTempDirectory("lake11_src")
      val martRoot = java.nio.file.Files.createTempDirectory("lake11_mart")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, srcRoot.toString,
        orders.filter(col("o_orderstatus") === "F"))
      LakeOps.maintainAggMart(s, srcRoot.toString, martRoot.toString,
        "o_orderstatus", "o_totalprice")
      graft.sources.ManifestTable.append(s, srcRoot.toString,
        orders.filter(col("o_orderstatus") === "O"))
      val (_, d1) = LakeOps.maintainAggMart(s, srcRoot.toString, martRoot.toString,
        "o_orderstatus", "o_totalprice")
      graft.sources.ManifestTable.append(s, srcRoot.toString,
        orders.filter(col("o_orderstatus") === "P"))
      val (_, d2) = LakeOps.maintainAggMart(s, srcRoot.toString, martRoot.toString,
        "o_orderstatus", "o_totalprice")
      val (_, d3) = LakeOps.maintainAggMart(s, srcRoot.toString, martRoot.toString,
        "o_orderstatus", "o_totalprice")
      graft.sources.ManifestTable.read(s, martRoot.toString)
        .select(lit(d1).as("step1_rows"), lit(d2).as("step2_rows"),
          lit(d3).as("step3_rows"), col("o_orderstatus"),
          col("n_rows").as("n_orders"), col("total").cast("double").as("total_price"))
    }),

    "lake10_delete_cow" -> ((s, dir) => {
      // copy-on-write DELETE: on a date-range-clustered table, deleting
      // the most recent orders rewrites only the tail file(s) — the
      // stats clear everything earlier. rewrote_minority pins the COW
      // claim; the surviving content must equal the oracle's
      // NOT(predicate IS TRUE) filter exactly.
      val root = java.nio.file.Files.createTempDirectory("lake10_delete")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.repartitionByRange(8, col("o_orderdate")),
        statsColumns = Seq("o_orderdate"))
      // the synthetic orders span 1995..2001; 2000+ is the tail ~2 of 8
      // range-partitioned files at every SF
      val (_, st) = graft.sources.ManifestTable.delete(s, root.toString,
        col("o_orderdate") >= lit("2000-01-01").cast("timestamp"),
        statsColumns = Seq("o_orderdate"))
      graft.sources.ManifestTable.read(s, root.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(st.filesRewritten < st.filesUntouched).as("rewrote_minority"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "lake9_merge_cow" -> ((s, dir) => {
      // copy-on-write MERGE through the manifest (the flagship lakehouse
      // mutation): orders range-clustered on o_orderkey with stats; the
      // batch updates keys <= 100 (status 'X', +1000 price) and inserts
      // 10 new keys far above the range. Skipping makes the rewrite
      // touch only the low-key boundary file(s); rewrote_minority pins
      // that, and the relational result must equal the oracle's replay
      // of WHEN MATCHED UPDATE / NOT MATCHED INSERT semantics.
      val root = java.nio.file.Files.createTempDirectory("lake9_merge")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.repartitionByRange(8, col("o_orderkey")),
        statsColumns = Seq("o_orderkey"))
      val updates = orders.filter(col("o_orderkey") <= 100)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      val inserts = orders.filter(col("o_orderkey") <= 10)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000000L)
      val (_, st) = graft.sources.ManifestTable.merge(
        s, root.toString, updates.unionByName(inserts), "o_orderkey",
        statsColumns = Seq("o_orderkey"))
      graft.sources.ManifestTable.read(s, root.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(st.filesRewritten < st.filesUntouched).as("rewrote_minority"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "lake8_keyjoin_pruned" -> ((s, dir) => {
      // join-time file skipping (the DPP idea over the manifest): the
      // fact table is hash-clustered on o_custkey with per-file blooms;
      // the dimension side's 10 join keys prune fact FILES before the
      // join runs. Sound because an inner join discards non-matching
      // fact rows anyway; the oracle replays the plain join, and
      // pruned_some mirrors that files actually dropped.
      val root = java.nio.file.Files.createTempDirectory("lake8_keyjoin")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.repartition(8, col("o_custkey")),
        bloomColumns = Seq("o_custkey"))
      val dim = t(s, dir, "customer").filter(col("c_custkey") < 10)
        .select(col("c_custkey"))
      val facts = graft.sources.ManifestTable.readPrunedByKeys(
        s, root.toString, "o_custkey", dim)
      // the drop is observed on the ACTUAL pruned frame, not re-derived
      val total = graft.sources.ManifestTable.manifestFiles(s, root.toString, 1L).size
      val kept = facts.select(input_file_name()).distinct().count()
      val dropped = (0 until (total - kept.toInt)).toSeq
      facts.join(broadcast(dim), facts("o_custkey") === dim("c_custkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(dropped.nonEmpty).as("pruned_some"), col("o_orderstatus"),
          col("n_orders"), col("total_price"))
    }),

    "lake7_manifest_count" -> ((s, dir) => {
      // metadata-resolved COUNT: on a range-clustered table an interior
      // date-range count sums committed per-file row counts for the
      // fully-covered files and scans ONLY the two boundary files —
      // aggregate pushdown into the table format. The count itself is
      // the oracle; the mirrors pin that metadata actually resolved
      // files (meta_resolved_some) and that the scan stayed a minority
      // of the layout (scanned_minority).
      val root = java.nio.file.Files.createTempDirectory("lake7_count")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.repartitionByRange(8, col("o_orderdate")),
        statsColumns = Seq("o_orderdate"))
      val f = col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp")
      val (n, full, resid) = graft.sources.ManifestTable.countWhere(s, root.toString, f)
      s.range(1).select(lit(n).as("n_orders"),
        lit(full > 0).as("meta_resolved_some"),
        lit(resid < 8).as("scanned_minority"))
    }),

    "lake6_zorder_pruned" -> ((s, dir) => {
      // OPTIMIZE ZORDER under the oracle: rewrite orders along the
      // Morton curve of (o_orderdate, o_totalprice), then push a 2-d box
      // predicate through the stats-pruned read. Range clustering could
      // serve ONE of the two dimensions; the z-layout serves both —
      // pruned_some mirrors the observed drop, the relational result
      // must equal the plain filtered aggregate exactly.
      val root = java.nio.file.Files.createTempDirectory("lake6_zorder")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString, orders.repartition(4))
      // target ~8 files at ANY scale factor so the prune has a real
      // multi-file layout to work against
      val target = math.max(1L,
        graft.sources.ManifestTable.tableBytes(s, root.toString) / 8)
      graft.sources.ManifestTable.optimizeZOrder(s, root.toString,
        Seq("o_orderdate", "o_totalprice"), target)
      val f = col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp") &&
        col("o_totalprice") < 100000.0
      val (_, dropped, _) = graft.sources.ManifestTable.pruneFiles(s, root.toString, f)
      graft.sources.ManifestTable.readPruned(s, root.toString, f)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(dropped.nonEmpty).as("pruned_some"), col("o_orderstatus"),
          col("n_orders"), col("total_price"))
    }),

    "lake5_bloom_pruned" -> ((s, dir) => {
      // point-lookup file skipping via per-file blooms: the table is
      // HASH-clustered on o_orderkey, so every file spans ~the full key
      // range and min/max stats cannot prune an equality probe — only
      // the manifest blooms can. The oracle re-derives the probed rows
      // relationally; `pruned_some` mirrors the observed file drop, so
      // a bloom that stops working breaks the hash loudly.
      val root = java.nio.file.Files.createTempDirectory("lake5_bloom")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.repartition(8, col("o_orderkey")),
        bloomColumns = Seq("o_orderkey"))
      val f = col("o_orderkey").isin(7L, 42L, 1337L)
      val (_, dropped, _) = graft.sources.ManifestTable.pruneFiles(s, root.toString, f)
      graft.sources.ManifestTable.readPruned(s, root.toString, f)
        .select(lit(dropped.nonEmpty).as("pruned_some"), col("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    }),

    "lake4_stats_pruned" -> ((s, dir) => {
      // data skipping off the manifest (sources/ManifestStats): the
      // table commits range-clustered on o_orderdate with per-file
      // min/max stats, and the predicate read plans its file set from
      // the manifest header alone. `pruned_some` is a literal mirror
      // (oracle: TRUE) — if pruning ever stops dropping files on this
      // layout, the hash breaks loudly; the relational result must
      // equal the unpruned filter exactly (the soundness contract).
      val root = java.nio.file.Files.createTempDirectory("lake4_stats")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.repartitionByRange(8, col("o_orderdate")),
        statsColumns = Seq("o_orderdate", "o_totalprice"))
      val f = col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp")
      val (_, dropped, _) = graft.sources.ManifestTable.pruneFiles(s, root.toString, f)
      graft.sources.ManifestTable.readPruned(s, root.toString, f)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(dropped.nonEmpty).as("pruned_some"), col("o_orderstatus"),
          col("n_orders"), col("total_price"))
    }),

    "lake3_changes_since" -> ((s, dir) => {
      // incremental consumption (change-data-feed): a consumer whose
      // cursor is version 2 must see EXACTLY the batch version 3
      // appended — not the snapshot, not a rescan. The oracle re-derives
      // that batch's aggregate from the source; any leakage of v1/v2
      // rows into the delta breaks the hash.
      val root = java.nio.file.Files.createTempDirectory("lake3_cdf")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.filter(col("o_orderstatus") === "F"))
      val cursor = graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderstatus") === "O"))
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderstatus") === "P"))
      val (delta, tip) = graft.sources.ManifestTable
        .readChangesSince(s, root.toString, cursor)
      delta.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(tip).as("tip_version"), col("o_orderstatus"),
          col("n_orders"), col("total_price"))
    }),

    "lake2_state_skip" -> ((s, dir) => {
      // the state-aware runner (dbt `state:modified` analog) under the
      // oracle: run a view→table DAG twice with identical input state;
      // run 2 MUST skip the rebuild (action hash-gated via literal
      // mirrors in the oracle) and serve the identical committed
      // content. A skip that recomputed, or a rebuild that produced
      // different rows, both break the hash.
      import graft.model.{Materialization, Model, Registry}
      val root = java.nio.file.Files.createTempDirectory("lake2_state")
      val reg = new Registry(Seq(
        Model("v_orders", Seq("orders"), Materialization.View,
          r => r("orders").filter(col("o_totalprice") > 0)),
        Model("t_status", Seq("v_orders"), Materialization.Table,
          r => r("v_orders").groupBy("o_orderstatus")
            .agg(count(lit(1)).cast("long").as("n_orders")))))
      def pass(run: Int) = {
        val (rel, act) = reg.runStateAware(s, Map("orders" -> t(s, dir, "orders")),
          root.toString, sourceTokens = Map("orders" -> dir))
        rel("t_status").select(
          lit(run).as("run"), lit(act("t_status")).as("action"),
          col("o_orderstatus"), col("n_orders"))
      }
      val p1 = pass(1) // eager commit happens inside runStateAware
      p1.unionAll(pass(2))
    }),

    "lake1_manifest_timetravel" -> ((s, dir) => {
      // the versioned-manifest transactional table end to end (create →
      // append → overwrite → time travel): the engine's ACID commit
      // protocol (sources/ManifestTable, Delta-paper design) under the
      // oracle. The query re-reads version 2 AFTER version 3 overwrote
      // the table — snapshot isolation is what's being hash-checked; the
      // oracle re-derives both versions' content from the source table
      // with the same filters.
      val root = java.nio.file.Files.createTempDirectory("lake1_manifest")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.filter(col("o_orderstatus") === "F"))
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderstatus") === "O"))
      graft.sources.ManifestTable.overwrite(s, root.toString,
        orders.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")))
      def agg(v: Long) = graft.sources.ManifestTable
        .read(s, root.toString, Some(v))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .select(lit(v).as("version"), col("o_orderstatus"),
          col("n_orders"), col("total_price"))
      // eager: both reads must resolve file lists before the temp dir is
      // reaped post-run; union then hands one frame to the driver
      agg(2L).unionAll(agg(3L))
    }),

    "pipe2_quality_filter" -> ((s, dir) => {
      // the composed Gopher/C4-style quality GATE with the native
      // kernels (txt2/txt10/txt11 thresholds in ONE map-only pass); the
      // same TextOps.qualityGate also runs inside the streaming ingest
      // (CorpusIngestSpec)
      graft.functions.NativeExpressions.register(s)
      TextOps.qualityGate(t(s, dir, "documents"), "doc_id", "text")
    }),

    "q5_correlated_subquery" -> ((s, dir) => {
      // the SQL entry surface: correlated scalar subqueries through
      // spark.sql over a temp view (decorrelated by Catalyst into
      // aggregate+join — no per-row re-execution; verified in the plan).
      // Orders strictly above their customer's average, compared in
      // EXACT integer cents (price·n > Σprices avoids any
      // division/rounding divergence). Note each subquery decorrelates
      // into its own scan+aggregate — at scale the single-pass
      // formulation is a plain grouped join computing (count, sum)
      // together; this query exists to pin the SQL-subquery surface
      val o = t(s, dir, "orders")
      o.createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o.o_orderkey, o.o_custkey
        FROM orders_v o
        WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) *
              (SELECT count(*) FROM orders_v i WHERE i.o_custkey = o.o_custkey)
              > (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
                 FROM orders_v i WHERE i.o_custkey = o.o_custkey)
      """)
    }),

    "q7_lateral_subquery" -> ((s, dir) => {
      // LATERAL subquery surface: a correlated scalar-aggregate derived
      // table per outer row, decorrelated by Catalyst into one grouped
      // left join (no per-row re-execution); orders with no lineitems
      // keep the lateral's (NULL max, 0 count) row
      t(s, dir, "orders").createOrReplaceTempView("orders_v7")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v7")
      s.sql("""
        SELECT o.o_orderkey, t.top_price, t.n_items
        FROM orders_v7 o,
        LATERAL (SELECT max(l.l_extendedprice) AS top_price,
                        CAST(count(*) AS BIGINT) AS n_items
                 FROM lineitem_v7 l WHERE l.l_orderkey = o.o_orderkey) t
      """)
    }),

    "rec1_recursive_cte" -> ((s, dir) => {
      // WITH RECURSIVE surface (new in Spark 4): a per-customer
      // linked-list walk over the order sequence — anchor at each
      // customer's first order, recurse along lead(order_id), BOUNDED
      // at 8 hops. The bound is the production discipline for iterative
      // plans: each recursion round is a whole Spark job (~0.3 s fixed
      // scheduling cost at any data size), so unbounded-depth traversal
      // belongs to the window formulation — which is exactly what the
      // ORACLE uses (row_number ≤ 8): two independent formulations must
      // agree, stronger than a mirrored recursion. The next-pointer
      // table is localCheckpoint'd once (the window would otherwise
      // recompute inside every round) and broadcast into each round's
      // join, so a round never shuffles the chain; at 100 TB you'd
      // pre-bucket nxt on order_id instead of broadcasting
      // Spark's recursion guardrail caps TOTAL rows at 1M by default —
      // ~8 x |customers| here crosses that at sf1+. The walk is already
      // depth-bounded (step < 8), so the row count is a known linear
      // bound, not a runaway risk; raise the valve — in a CHILD session
      // (round-5 verdict: no query closure may mutate shared conf). The
      // frame is lazy, so the raised limit must hold at execution time:
      // a child session's SessionState lives as long as the returned
      // DataFrame references it, while the caller's session conf — and
      // catalog: rec1_nxt below registers in the child, invisible to
      // other queries — is untouched.
      val cs = s.newSession()
      cs.conf.set("spark.sql.cteRecursionRowLimit", "100000000")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(cs, dir, "orders")
        .select(
          col("o_custkey").as("customer_id"), col("o_orderkey").as("order_id"),
          lead("o_orderkey", 1).over(w).as("next_id"),
          row_number().over(w).as("rn"))
        .localCheckpoint()
        .createOrReplaceTempView("rec1_nxt")
      cs.sql("""
        WITH RECURSIVE chain(customer_id, order_id, step) AS (
          SELECT customer_id, order_id, CAST(1 AS BIGINT) FROM rec1_nxt WHERE rn = 1
          UNION ALL
          SELECT /*+ BROADCAST(n) */ c.customer_id, n.next_id, c.step + 1L
          FROM chain c JOIN rec1_nxt n ON c.order_id = n.order_id
          WHERE n.next_id IS NOT NULL AND c.step < 8
        )
        SELECT customer_id, order_id, step FROM chain
      """)
    }),

    "vr1_variant_extract" -> ((s, dir) => {
      // semi-structured VARIANT surface (new in Spark 4): build a nested
      // JSON document per event, parse to VARIANT once, extract typed
      // fields by path — schema-on-read for heterogeneous event payloads.
      // At 100 TB the win is scan-time: VARIANT stores the parsed binary
      // form (shredded in parquet), so path extraction never re-parses
      // text per query the way get_json_object does (e3 is the
      // string-parsing baseline). The real `props` payload is parsed
      // alongside a document constructed from typed columns; the oracle
      // re-derives every output from the source columns directly —
      // extraction of what was inserted must be identity
      t(s, dir, "events").createOrReplaceTempView("events_vr")
      s.sql("""
        SELECT event_id,
               variant_get(v, '$.type', 'string')    AS vtype,
               variant_get(v, '$.value', 'double')   AS vvalue,
               variant_get(v, '$.tags[1]', 'string') AS tag2,
               variant_get(parse_json(props), '$.k', 'long') AS k_val
        FROM (SELECT *, parse_json(to_json(named_struct(
                'type', event_type, 'value', value,
                'tags', array(event_type, CAST(user_id AS STRING))))) AS v
              FROM events_vr)
      """)
    }),

    "w6_window_breadth" -> ((s, dir) => {
      // distribution-window family: ntile / percent_rank / cume_dist /
      // first_value, all over one total-ordered frame (ties broken by key
      // so every engine ranks identically); percent_rank and cume_dist
      // are exactly-rounded integer divisions — bit-identical cross-engine
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("int").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first(col("o_orderkey")).over(w).as("top_order"))
    }),

    "sj1_semi_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    "j6_star_join" -> ((s, dir) => {
      // the canonical deep star shape: 7-way join (nation enters TWICE —
      // once per FK chain) over the full schema. lineitem⋈orders is the
      // one genuine big-big shuffle; every dimension hop (supplier,
      // nation×2, region, and customer at test SF) broadcasts, so the
      // fact table is never re-shuffled for a dimension — the plan is one
      // exchange for the fact join plus a broadcast cascade, then the
      // grouped aggregate. Plan-asserted in PlanAuditSpec. Declared as a
      // flat join chain: Catalyst's join reordering owns the order.
      val li = t(s, dir, "lineitem")
      val custNation = t(s, dir, "nation").select(
        col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"),
        col("n_regionkey").as("cn_regionkey"))
      val suppNation = t(s, dir, "nation").select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(custNation, col("c_nationkey") === col("cn_key"))
        .join(t(s, dir, "region"), col("cn_regionkey") === col("r_regionkey"))
        .join(suppNation, col("s_nationkey") === col("sn_key"))
        .groupBy(col("r_name").as("cust_region"), col("cust_nation"), col("supp_nation"))
        .agg(count(lit(1)).cast("long").as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),

    "j7_star_filtered" -> ((s, dir) => {
      // TPC-H Q5 proper: the selective-dimension variant. The region
      // predicate lives on the 5-row region table; with the broadcast
      // cascade it prunes nation→customer/supplier BEFORE the fact join,
      // and the o_orderdate range is pushed into the orders parquet scan
      // (both plan-asserted). Q5's signature twist — local commerce,
      // c_nationkey = s_nationkey — rides the supplier join as an extra
      // equi-key rather than a post-join filter.
      val nat = t(s, dir, "nation")
      val asiaNations = nat
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).cast("long").as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    }),

    "agg1_stats" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        countDistinct("l_partkey").as("n_parts"))),

    "agg2_rollup" -> ((s, dir) =>
      // grouping-sets family (absent from the reference, §2.7): subtotal +
      // grand-total rows with NULL group keys, same as SQL ROLLUP
      t(s, dir, "lineitem").rollup("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"))),

    "agg7_cube" -> ((s, dir) =>
      // full grouping-sets lattice (rollup's sibling): all four
      // combinations of (returnflag, linestatus) subtotals
      t(s, dir, "lineitem").cube("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("sum_price"))),

    "agg4_percentiles" -> ((s, dir) =>
      // exact interpolated quartiles (Spark `percentile` ≡ quantile_cont),
      // computed on integer CENTS at dyadic fractions: every intermediate
      // (position, frac·(b−a), a+…) is exact in double, so the result is
      // bit-identical across engines regardless of their interpolation
      // formula arrangement — no rounding step needed or wanted. (p95 on
      // raw doubles straddled a cent boundary at sf0.001.)
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(expr("percentile(cast(round(l_extendedprice * 100) as bigint), array(0.25, 0.5, 0.75))")
          .as("q")) // one sort-based aggregate pass for all three quartiles
        .select(col("l_returnflag"),
          element_at(col("q"), 1).as("p25_cents"),
          element_at(col("q"), 2).as("p50_cents"),
          element_at(col("q"), 3).as("p75_cents"))),

    "agg8_approx_percentiles" -> ((s, dir) => // no oracle: the GK sketch is
      // engine-specific; spec pins relative error vs the exact quartiles.
      // agg4's exact `percentile` sorts EVERY group value — the right
      // correctness anchor, but a per-group sort of the corpus at 100 TB.
      // approx_percentile aggregates in bounded memory with map-side
      // partial merge (shuffle carries sketches, not values); carrying
      // both columns keeps the sketch's accuracy continuously visible
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        expr("approx_percentile(cast(round(l_extendedprice * 100) as bigint), array(0.25, 0.5, 0.75), 10000)")
          .as("qa"),
        expr("percentile(cast(round(l_extendedprice * 100) as bigint), array(0.25, 0.5, 0.75))")
          .as("qe"))
        .select(col("l_returnflag"),
          element_at(col("qa"), 1).cast("double").as("approx_p25_cents"),
          element_at(col("qa"), 2).cast("double").as("approx_p50_cents"),
          element_at(col("qa"), 3).cast("double").as("approx_p75_cents"),
          element_at(col("qe"), 1).as("exact_p25_cents"),
          element_at(col("qe"), 2).as("exact_p50_cents"),
          element_at(col("qe"), 3).as("exact_p75_cents"))),

    "src1_json_roundtrip" -> ((s, dir) => {
      // JSON-lines source under the oracle: export a projection to JSON,
      // read it back with an explicit schema (no runtime inference — the
      // same discipline as the CSV seeds), aggregate. The oracle computes
      // the identical aggregate from parquet, so the JSON reader path
      // itself is what's being hash-checked.
      val staged = java.nio.file.Files.createTempDirectory("src1_json")
      staged.toFile.deleteOnExit()
      val proj = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      proj.write.mode("overwrite").json(staged.toString)
      s.read.schema(proj.schema).json(staged.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }),

    "src8_orc_roundtrip" -> ((s, dir) => {
      // ORC source/sink under the oracle (Spark's second built-in
      // columnar format): export a projection to ORC, read it back,
      // filter + aggregate — the filter must push into the ORC scan
      // exactly as with parquet (plan-audited). The oracle computes the
      // identical aggregate from parquet, so the ORC reader/writer path
      // itself is what's being hash-checked.
      val staged = java.nio.file.Files.createTempDirectory("src8_orc")
      staged.toFile.deleteOnExit()
      val proj = t(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      proj.write.mode("overwrite").orc(staged.toString)
      s.read.orc(staged.toString)
        .filter(col("l_quantity") >= 25.0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
    }),

    "src2_csv_roundtrip" -> ((s, dir) => {
      // CSV source under the oracle (the jaffle seed path, on driver
      // data): export, read back with the pinned schema, aggregate
      val staged = java.nio.file.Files.createTempDirectory("src2_csv")
      staged.toFile.deleteOnExit()
      val proj = t(s, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
      proj.write.mode("overwrite").option("header", "true").csv(staged.toString)
      s.read.schema(proj.schema).option("header", "true").csv(staged.toString)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_balance"))
    }),

    "src4_bucketed_join" -> ((s, dir) => {
      // bucketed co-located join under the oracle: both sides written
      // bucketBy+sortBy on their join key with equal bucket counts, so
      // the sort-merge join reads pre-shuffled, pre-sorted buckets — NO
      // exchange and no sort on either join input (asserted in
      // PlanAuditSpec; the only exchange left is the final groupBy's).
      // hint("merge") keeps the planner from broadcasting the small side
      // at test SF, where the co-location demo would silently vanish.
      // The oracle runs the same join+aggregate on the flat parquet.
      val so = java.nio.file.Files.createTempDirectory("src4_bko")
      val sc = java.nio.file.Files.createTempDirectory("src4_bkc")
      so.toFile.deleteOnExit(); sc.toFile.deleteOnExit()
      graft.sources.Warehouse.writeBucketed(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "src4_orders_bk", "o_custkey", 8, Some(so.toString))
      graft.sources.Warehouse.writeBucketed(
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        "src4_customer_bk", "c_custkey", 8, Some(sc.toString))
      graft.sources.Warehouse.readTable(s, "src4_orders_bk")
        .join(graft.sources.Warehouse.readTable(s, "src4_customer_bk").hint("merge"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }),

    "src3_partitioned_roundtrip" -> ((s, dir) => {
      // partitioned-layout round-trip under the oracle: write orders
      // partitioned by status, read back with a partition predicate —
      // the scan prunes directories (spec-asserted in WarehouseSpec);
      // the oracle applies the same predicate to the flat parquet
      val staged = java.nio.file.Files.createTempDirectory("src3_part")
      staged.toFile.deleteOnExit()
      graft.sources.Warehouse.writePartitioned(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
        staged.toString, Seq("o_orderstatus"))
      graft.sources.Warehouse.readPartitioned(s, staged.toString)
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }),

    "src5_schema_evolution" -> ((s, dir) => {
      // schema-evolution read: generation 1 of the lake predates the
      // status column; generation 2 adds it. mergeSchema unions the file
      // schemas (gen-1 rows surface NULL status) — the drift pattern
      // every long-lived 100 TB table hits. The merged scan still prunes
      // columns and pushes filters (spec-asserted in WarehouseSpec); the
      // oracle replays the generational split from the flat table.
      val staged = java.nio.file.Files.createTempDirectory("src5_evo")
      staged.toFile.deleteOnExit()
      val orders = t(s, dir, "orders")
      orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$staged/gen1")
      orders.filter(col("o_orderkey") % 2 =!= 0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite").parquet(s"$staged/gen2")
      s.read.option("mergeSchema", "true").parquet(s"$staged/gen1", s"$staged/gen2")
        .groupBy(coalesce(col("o_orderstatus"), lit("legacy")).as("status_merged"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }),

    "nst1_nested_types" -> ((s, dir) =>
      // map/struct column functions under the oracle: build typed nested
      // columns, then extract scalars back out — struct field access,
      // element_at / try_element_at, map_keys / map_values. The OUTPUT is
      // flat (nested output columns compare differently per engine in the
      // driver's pandas canonicalization); the nested construction and
      // access in the middle is what's hash-checked. try_element_at (not
      // element_at) for the absent key: ANSI mode makes plain element_at
      // throw on missing map keys.
      t(s, dir, "orders").select(
        struct(col("o_orderkey").as("key"), col("o_totalprice").as("price")).as("os"),
        map(lit("full"), col("o_totalprice").cast("decimal(16,2)"),
            lit("double"), (col("o_totalprice") * 2).cast("decimal(16,2)")).as("om"))
      .select(
        // extracted money lands as double (the dsum convention: decimal
        // column dtypes canonicalize differently across the two engines'
        // parquet/pandas paths)
        col("os.key").as("o_orderkey"),
        col("os").getField("price").cast("double").as("struct_price"),
        element_at(col("om"), "full").cast("double").as("map_full"),
        expr("try_element_at(om, 'missing')").cast("double").as("map_missing"),
        array_join(map_keys(col("om")), ",").as("keys_csv"),
        size(map_values(col("om"))).cast("long").as("n_vals"))),

    "sk1_salted_join" -> ((s, dir) => {
      // two-sided salted join (hot-key mitigation) under the oracle: the
      // plain inner-join SQL must hash-match, proving salting is a pure
      // physical rewrite
      val fact = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_linenumber"), col("l_extendedprice"))
      val dim = t(s, dir, "orders").select(col("o_orderkey").as("okey"), col("o_custkey"))
      graft.ops.SkewOps.saltedJoin(fact, dim, "okey", col("l_linenumber"), factor = 8)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("total_price"))
    }),

    "u1_union" -> ((s, dir) => {
      // UNION (distinct) of two branch projections — union is the one set
      // op set1/set2 didn't cover
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .union(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
        .distinct()
    }),

    "x1_wordcount" -> ((s, dir) =>
      // the canonical explode shape: flatten documents to tokens, count
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n_occurrences"))),

    "hh1_heavy_hitters" -> ((s, dir) => { // no oracle: below-threshold sketch
      // contents are merge-order-dependent; the hh2 gate carries the
      // deterministic guarantee. Misra-Gries frequent-items summary over
      // the token stream: k counters per map task instead of one row per
      // DISTINCT token — the exchange is O(k · tasks) however large the
      // token domain grows (x1's exact wordcount is the small-vocabulary
      // baseline this replaces at 100 TB n-gram/URL scale). k = 32 so the
      // near-uniform 31-token test vocabulary has a non-empty guaranteed
      // set; the eviction path is exercised on a constructed skewed
      // stream in NativeExpressionsSpec
      graft.functions.NativeExpressions.register(s)
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .agg(expr("graft_freq_sketch(token, 32)").as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item").as("token"), col("e.count").as("est_count"))
    }),

    "hh3_cms_replay" -> ((s, dir) => {
      // the Count-Min sketch an oracle CAN check (agg9's contract
      // applied to frequencies — hh1's Misra-Gries stays rows-only by
      // design): md5-row-seeded counters are deterministic integers,
      // so the sketch AND every point estimate replay in DuckDB. The
      // exchange carries ≤ d·w = 1024 counter rows whatever the corpus;
      // the exact counts ride along — est ≥ exact by construction, over
      // by whatever the (4, 256) collision bound prices.
      val li = t(s, dir, "lineitem")
      val sk = graft.ops.SketchOps.cmsSketch(li, Nil, "l_partkey")
      val probes = li.select(col("l_partkey")).distinct()
        .orderBy("l_partkey").limit(10)
      val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("exact_cnt"))
      graft.ops.SketchOps.cmsEstimate(sk, probes, "l_partkey")
        .join(exact, Seq("l_partkey"))
        .select(col("l_partkey").as("part_id"), col("est").as("est_cnt"),
          col("exact_cnt"))
    }),

    "hh2_freq_gate" -> ((s, dir) => {
      // the deterministic MG guarantee under the oracle: every token with
      // exact count > n/(k+1) MUST be in the sketch (k = 32, see hh1) (Misra-Gries bound,
      // preserved under arbitrary merge trees per Agarwal et al. PODS'12)
      // — so n_found = n_guaranteed and recall = 1.0 are THEOREMS, not
      // measured goldens, and the oracle re-derives both exactly
      // Gate cost is token-DOMAIN-size independent (round-5 verdict): the
      // exact-truth arm runs only over a deterministic md5-nibble sample
      // of the token domain (first hex digit 0-7 = 50%, replayed
      // bit-identically by the oracle — md5 is the same function in both
      // engines), so its exchange carries sample_rate × |domain| rows,
      // never one row per distinct token. The MG theorem quantifies over
      // EVERY above-threshold token, hence over any deterministic subset:
      // recall = 1.0 on the sampled guaranteed set is still a theorem.
      // n_tokens stays the FULL stream length (a map-side scalar count,
      // no per-token shuffle) — the threshold n/(k+1) must be the true
      // one or "guaranteed" would be a different predicate. At production
      // scale choose the nibble set so sampled distinct tokens stay
      // ~bounded (same knob as cn2's vec_id sample).
      graft.functions.NativeExpressions.register(s)
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
      val sketch = toks
        .agg(expr("graft_freq_sketch(token, 32)").as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item").as("token"))
      val total = toks.agg(count(lit(1)).cast("long").as("n_tokens"))
      val exact = toks
        .filter(substring(md5(col("token")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"))
        .groupBy("token").agg(count(lit(1)).as("c"))
      val guaranteed = exact.crossJoin(total)
        .filter(col("c") > col("n_tokens").cast("double") / lit(33.0))
        .select("token")
      val nG = guaranteed.agg(count(lit(1)).cast("long").as("n_guaranteed"))
      val nF = guaranteed.join(sketch, Seq("token"), "left_semi")
        .agg(count(lit(1)).cast("long").as("n_found"))
      total.crossJoin(nG).crossJoin(nF).select(
        col("n_tokens"), col("n_guaranteed"), col("n_found"),
        // degenerate-sample guard: if the md5-nibble sample excludes every
        // guaranteed token (n_guaranteed = 0), 0/0 would yield NaN while
        // the oracle emits the constant 1.0 — a confusing gate mismatch
        // instead of a clear signal. Recall over an empty set is vacuously
        // 1.0 (the MG theorem quantifies over every sampled guaranteed
        // token; zero of them means zero misses). If this fires, widen the
        // nibble set above.
        when(col("n_guaranteed") === 0, lit(1.0))
          .otherwise(round(col("n_found").cast("double") / col("n_guaranteed"), 4))
          .as("recall"))
    }),

    "dt1_date_parts" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        // cast back to timestamp: parquet DATE and DuckDB DATE reach the
        // driver's pandas compare as different dtypes for equal values
        date_add(col("o_orderdate").cast("date"), 30).cast("timestamp").as("plus30"),
        last_day(col("o_orderdate").cast("date")).cast("timestamp").as("month_end"))),

    "agg5_moments" -> ((s, dir) => {
      // sample variance / stddev / correlation computed from EXACT integer
      // sums (cents), with the final arithmetic done in double by the
      // identical formula on both engines — reproducible where native
      // stddev/corr (order-dependent fp accumulation) is not
      val qc = round(col("l_quantity") * 100).cast("long")
      val pc = round(col("l_extendedprice") * 100).cast("long")
      val d = (c: Column) => c.cast("double")
      // accumulate in DECIMAL(38,0): sum(pc*pc) reaches 7.4e18 per group
      // at sf0.1 — 80% of Long range — and would wrap silently at barely
      // larger scale (DuckDB's bigint sums widen to HUGEINT natively);
      // per-row products still fit a long comfortably
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(qc.cast(dec)).as("sq"), sum((qc * qc).cast(dec)).as("sqq"),
          sum(pc.cast(dec)).as("sp"), sum((pc * pc).cast(dec)).as("spp"),
          sum((qc * pc).cast(dec)).as("sqp"))
        .select(
          col("l_returnflag"), col("n"),
          ((d(col("sqq")) - d(col("sq")) * d(col("sq")) / d(col("n"))) / (d(col("n")) - 1.0))
            .as("var_qty_cents2"),
          sqrt((d(col("sqq")) - d(col("sq")) * d(col("sq")) / d(col("n"))) / (d(col("n")) - 1.0))
            .as("stddev_qty_cents"),
          ((d(col("n")) * d(col("sqp")) - d(col("sq")) * d(col("sp"))) /
            (sqrt(d(col("n")) * d(col("sqq")) - d(col("sq")) * d(col("sq"))) *
              sqrt(d(col("n")) * d(col("spp")) - d(col("sp")) * d(col("sp")))))
            .as("corr_qty_price"))
    }),

    "agg6_argmax_udaf" -> ((s, dir) => {
      // typed Aggregator as an untyped UDAF: per detected language, the
      // longest document (argmax tokens, min doc_id tie-break)
      val longest = udaf(graft.functions.Aggregators.longestDoc)
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.languageId(col("text")).as("lang_guess"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .groupBy("lang_guess")
        .agg(longest(col("doc_id"), col("n_tokens")).as("top"))
        .select(col("lang_guess"), col("top._2").as("doc_id"), col("top._1").as("n_tokens"))
    }),

    "v1_vector_norm" -> ((s, dir) => {
      // vector math over array<float>: L2 norm + normalized head element
      val vd = transform(col("embedding"), x => x.cast("double"))
      val n = sqrt(aggregate(vd, lit(0.0), (acc, x) => acc + x * x))
      t(s, dir, "embeddings").select(
        col("vec_id"),
        round(n, 4).as("l2_norm"),
        round(element_at(vd, 1) / n, 4).as("first_unit"))
    }),

    "agg9_hll_replay" -> ((s, dir) => {
      // the HyperLogLog an oracle CAN check (agg3 pins Spark's built-in
      // by error bound only — its sketch is engine-specific): md5-nibble
      // hash, integer register maxes, rational-constant estimate — the
      // registers AND the estimate replay exactly in DuckDB. The
      // exchange carries ≤64 register rows per flag however large the
      // corpus; exact countDistinct rides along as the honest face.
      val li = t(s, dir, "lineitem")
      graft.ops.SketchOps.hllCountDistinct(li, Seq("l_returnflag"), "l_partkey")
        .join(li.groupBy("l_returnflag")
          .agg(countDistinct("l_partkey").as("exact_parts")), Seq("l_returnflag"))
    }),

    "agg3_approx_distinct" -> ((s, dir) => // no oracle: HLL sketch is
      // engine-specific; spec pins relative error vs exact count
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        approx_count_distinct("l_partkey").as("approx_parts"),
        countDistinct("l_partkey").as("exact_parts"))),

    "agg11_bottomk_quantiles" -> ((s, dir) =>
      // the DETERMINISTIC quantile sketch, completing the family gate
      // (agg8's approx_percentile is engine-specific, rows-only):
      // bottom-k Knuth-hash sampling — a true mergeable sketch,
      // bottomK(A∪B) = bottomK(bottomK(A)∪bottomK(B)), computed by the
      // bounded graft_topk heap so each task ships ≤k (hash, id) pairs
      // per group — then exact rank quantiles OF THE SAMPLE under the
      // total order (value, id). Every output replays bit-exactly in
      // DuckDB from the raw rows; error is the standard O(1/√k)
      graft.ops.SketchOps.bottomKQuantiles(
        t(s, dir, "orders"), Seq("o_orderstatus"), "o_orderkey",
        "o_totalprice", k = 128, qs = Seq(0.25, 0.5, 0.75, 0.95))),

    "e4_sliding_window" -> ((s, dir) =>
      // 1h windows sliding every 30min: window() explodes each event into
      // its two containing windows — flattened to window_start
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value"))),

    "txt5_string_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowels"),
        instr(col("p_name"), "widget").cast("long").as("widget_pos"),
        length(col("p_name")).cast("long").as("name_len"))),

    "txt6_bpe_tokens" -> ((s, dir) => {
      // BPE-ish pre-tokenization (GPT-2 style splitter shape): letter runs,
      // digit runs, punctuation runs — counted per document
      val pattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
      t(s, dir, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pattern), lit(0))).cast("long").as("n_bpe_tokens"))
    }),

    // ---- temporal joins (operators Spark lacks natively) ----
    "aj1_asof_join" -> ((s, dir) => {
      // most recent order per user at each event time; right side deduped
      // to unique (key, time) so the as-of match is deterministic
      val lastOrders = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate").as("last_order_date"))
        .agg(max("o_orderkey").as("last_order_key"))
      graft.ops.TemporalOps.asOfJoin(
        t(s, dir, "events").select("event_id", "user_id", "ts"),
        leftKey = "user_id", leftTime = "ts",
        lastOrders, rightKey = "o_custkey", rightTime = "last_order_date",
        rightCols = Seq("last_order_date", "last_order_key"))
    }),

    "aj2_asof_native" -> ((s, dir) => {
      // the SAME as-of semantics through the custom physical operator
      // (graft.plans.AsOfJoinExec — LogicalPlan + Strategy + SparkPlan),
      // answering to the same DuckDB ASOF oracle as the aj1 composition
      val lastOrders = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate").as("last_order_date"))
        .agg(max("o_orderkey").as("last_order_key"))
      graft.ops.TemporalOps.asOfJoinNative(
        t(s, dir, "events").select("event_id", "user_id", "ts"),
        leftKey = "user_id", leftTime = "ts",
        lastOrders, rightKey = "o_custkey", rightTime = "last_order_date",
        rightCols = Seq("last_order_date", "last_order_key"))
    }),

    "rj1_range_join" -> ((s, dir) =>
      graft.ops.TemporalOps.rangeSelfJoin(
        t(s, dir, "events"), "user_id", "ts", "event_id", windowSeconds = 300L)),

    // ---- event-time ops ----
    "e1_tumbling_window" -> ((s, dir) => EventOps.tumblingCounts(t(s, dir, "events"), "hour")),

    "e2_sessions" -> ((s, dir) => EventOps.sessionStats(t(s, dir, "events"), gapMinutes = 30)),

    "e3_json_extract" -> ((s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        EventOps.propsField(col("props"), "k").cast("long").as("k_value"))),

    "e10_path_analysis" -> ((s, dir) =>
      // top-20 session paths (first 5 event types per 30-min session,
      // '>'-joined in (ts, event_id) order): funnels test a hypothesized
      // sequence, paths DISCOVER what users actually do. Rank-filter
      // bounds per-session state to 5 rows before any collection.
      EventOps.topPaths(t(s, dir, "events"),
        gapMinutes = 30, maxSteps = 5, k = 20)),

    "st7_stream_static_enrich" -> ((s, dir) => {
      // the third join mode beside st2/st4's stream-stream: STREAM-STATIC
      // enrichment — each micro-batch joins the static dimension with no
      // streaming state at all (the dimension broadcasts per batch; no
      // watermark needed on the static side). The classic shape: events
      // enriched with a user-tier dimension, aggregated per tier. The
      // oracle is the batch equivalent of the same join+aggregate.
      val staged = java.nio.file.Files.createTempDirectory("st7_events")
      staged.toFile.deleteOnExit()
      val copied = staged.resolve("part-0.parquet")
      copied.toFile.deleteOnExit()
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // static dimension: deterministic user tiers derived from customer
      // keys (c_custkey % 3) — a genuine second table on the join's
      // static side, not a projection of the stream
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"),
          concat(lit("tier_"), (col("c_custkey") % 3).cast("string")).as("tier"))
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val enriched = stream.join(dim, Seq("user_id"))
          .groupBy("tier")
          .agg(count(lit(1)).cast("long").as("n_events"),
            dsum(col("value")).as("total_value"))
        val q = graft.streaming.EventStreams.runToMemory(enriched, "st7_enrich", "complete")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
      s.table("st7_enrich")
    }),

    "st5_manifest_stream" -> ((s, dir) => {
      // the streaming CDC source over the manifest log (sources/
      // ManifestStream): three committed versions drain through
      // readStream with manifest VERSIONS as offsets, aggregated in
      // Complete mode — the result must hash-match the batch aggregate
      // over everything the three versions shipped. Offsets-as-versions
      // is what makes the source prefix-deterministic (immutable files,
      // immutable manifests), the property exactly-once rides on.
      val root = java.nio.file.Files.createTempDirectory("st5_manifest")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.filter(col("o_orderstatus") === "F"))
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderstatus") === "O"))
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderstatus") === "P"))
      // same state-store sizing note as st1: 3 grouping keys
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val stream = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .load(root.toString)
        val agg = stream.groupBy("o_orderstatus")
          .agg(count(lit(1)).cast("long").as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"))
        val q = graft.streaming.EventStreams.runToMemory(agg, "st5_manifest", "complete")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
      s.table("st5_manifest")
    }),

    "st6_manifest_replicate" -> ((s, dir) => {
      // exactly-once table-to-table streaming replication: manifest
      // source (versions as offsets) piped into the manifest SINK
      // (appendIdempotent — the batchId watermark rides the same atomic
      // publish as the data). The replica is then read BATCH-wise and
      // must hash-match the oracle over everything the source shipped.
      val srcRoot = java.nio.file.Files.createTempDirectory("st6_src")
      val dstRoot = java.nio.file.Files.createTempDirectory("st6_dst")
      val ckpt = java.nio.file.Files.createTempDirectory("st6_ckpt")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, srcRoot.toString,
        orders.filter(col("o_orderstatus") === "F"))
      graft.sources.ManifestTable.append(s, srcRoot.toString,
        orders.filter(col("o_orderstatus") === "O"))
      graft.sources.ManifestTable.append(s, srcRoot.toString,
        orders.filter(col("o_orderstatus") === "P"))
      val q = s.readStream
        .format("graft.sources.ManifestStreamSourceProvider")
        .load(srcRoot.toString)
        .writeStream
        .format("graft.sources.ManifestStreamSinkProvider")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dstRoot.toString)
      q.awaitTermination()
      graft.sources.ManifestTable.read(s, dstRoot.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
    }),

    "st9_stream_cdc_upsert" -> ((s, dir) => {
      // streaming CDC upsert: a change stream (updates to existing F
      // orders + O-order inserts) drains through foreachBatch, each
      // micro-batch MERGED by key into the base manifest table with the
      // txn watermark riding the same atomic commit (mergeIdempotent).
      // maxFilesPerTrigger=1 forces multiple batches; upsert semantics
      // make the final state independent of the batch split (each key
      // appears once across the whole change set). A crash-replay of
      // the full change set is then re-delivered and must be a NO-OP —
      // pinned into the face.
      val root = java.nio.file.Files.createTempDirectory("st9_base").toString
      val updDir = java.nio.file.Files.createTempDirectory("st9_upd").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st9_ckpt").toString
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root,
        orders.filter(col("o_orderstatus") === "F").repartition(2),
        statsColumns = Seq("o_orderkey"))
      val updates = orders.filter(col("o_orderstatus") === "F")
        .filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(col("o_orderstatus") === "O"))
      updates.repartition(2).write.mode("overwrite").parquet(updDir)
      val q = s.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1).parquet(updDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.sources.ManifestTable.mergeIdempotent(
            s, root, batch, "o_orderkey", "cdc", id,
            statsColumns = Seq("o_orderkey"))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val vBefore = graft.sources.ManifestTable.versions(s, root).max
      graft.sources.ManifestTable.mergeIdempotent(
        s, root, s.read.parquet(updDir), "o_orderkey", "cdc", 0L)
      val replayNoop = graft.sources.ManifestTable.versions(s, root).max == vBefore
      graft.sources.ManifestTable.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(replayNoop).as("replay_noop"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st10_changefeed_mirror" -> ((s, dir) => {
      // the delete-aware streaming pipeline end-to-end: the changeFeed
      // source streams deletion-vector diffs as tagged retractions
      // (where the plain source REFUSES past a MOR delete), and
      // applyChangesMor lands each micro-batch in ONE atomic commit —
      // grown vector + appended files + exactly-once watermark. Three
      // stream passes over an evolving source (initial load; a MOR
      // delete + an append; a second stacked delete spanning both), a
      // checkpointed restart between each; the mirror must equal the
      // source at every quiesce and a re-delivered batchId must not
      // commit. Steady-state cost tracks the CHANGE rate: each batch
      // reads only appended files plus the files the vector diff names.
      val src = java.nio.file.Files.createTempDirectory("st10_src").toString
      val dst = java.nio.file.Files.createTempDirectory("st10_dst").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st10_ckpt").toString
      val orders = t(s, dir, "orders")
      val f = orders.filter(col("o_orderstatus") === "F")
      graft.sources.ManifestTable.create(s, src, f)
      graft.sources.ManifestTable.create(s, dst, f.limit(0))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .option("changeFeed", "true").load(src)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            graft.sources.ManifestTable.applyChangesMor(
              s, dst, b, "o_orderkey", "mirror", id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial load (whole table tagged insert)
      graft.sources.ManifestTable.deleteMor(s, src, col("o_orderkey") % 3 === 0)
      graft.sources.ManifestTable.append(s, src,
        orders.filter(col("o_orderstatus") === "O"))
      drain() // retractions + inserts in one window
      graft.sources.ManifestTable.deleteMor(s, src, col("o_custkey") % 7 === 0)
      drain() // stacked delete spanning base and appended rows
      val tip = graft.sources.ManifestTable.versions(s, dst).max
      val watermark = graft.sources.ManifestTable
        .manifestMeta(s, dst, tip)("txn-mirror").toLong
      // crash-replay: re-deliver the last batchId — must not commit
      val vNoop = graft.sources.ManifestTable.applyChangesMor(s, dst,
        f.limit(0).withColumn("_change_type", lit("insert")),
        "o_orderkey", "mirror", watermark)
      val srcDf = graft.sources.ManifestTable.read(s, src)
      val dstDf = graft.sources.ManifestTable.read(s, dst)
      val mirrors = dstDf.exceptAll(srcDf).isEmpty && srcDf.exceptAll(dstDf).isEmpty
      dstDf.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(mirrors).as("mirrors_source"),
          lit(vNoop == tip).as("replay_noop"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st13_mirror_refresh" -> ((s, dir) => {
      // stream recovery ACROSS a refusal — st10's one operational hole
      // closed: an OVERWRITE window is not delta-expressible, and the
      // plain change feed kills the query there by design. Under
      // `onRefusal=refresh` the restarted stream drains that window as
      // ONE atomic 'refresh' batch (applyChangesMor lands it as a
      // watermarked overwrite), and the NEXT window resumes
      // incrementally — pins: the mirror equals the source at every
      // quiesce, exactly one apply-refresh commit in the mirror's
      // history, and the post-refresh delete window applied as a delta.
      val src = java.nio.file.Files.createTempDirectory("st13_src").toString
      val dst = java.nio.file.Files.createTempDirectory("st13_dst").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st13_ckpt").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val f = orders.filter(col("o_orderstatus") === "F")
      MT.create(s, src, f)
      MT.create(s, dst, f.limit(0))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .option("changeFeed", "true").option("onRefusal", "refresh").load(src)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            MT.applyChangesMor(s, dst, b, "o_orderkey", "mirror", id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial load
      MT.append(s, src, orders.filter(col("o_orderstatus") === "O"))
      drain() // incremental append window
      val m1 = {
        val srcDf = MT.read(s, src); val dstDf = MT.read(s, dst)
        dstDf.exceptAll(srcDf).isEmpty && srcDf.exceptAll(dstDf).isEmpty
      }
      MT.overwrite(s, src, orders.filter(col("o_orderstatus") === "P"))
      drain() // refusal window → one atomic refresh
      val m2 = {
        val srcDf = MT.read(s, src); val dstDf = MT.read(s, dst)
        dstDf.exceptAll(srcDf).isEmpty && srcDf.exceptAll(dstDf).isEmpty
      }
      MT.deleteMor(s, src, col("o_orderkey") % 4 === 0)
      drain() // post-refresh window resumes incrementally
      val ops = MT.history(s, dst).map(_.operation)
      val oneRefresh = ops.count(_ == "apply-refresh") == 1
      val lastIncremental = ops.last == "apply-changes"
      val dstDf = MT.read(s, dst)
      dstDf.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(m1 && m2).as("mirrors_at_quiesce"),
          lit(oneRefresh).as("one_refresh_commit"),
          lit(lastIncremental).as("resumes_incremental"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st14_rowid_mirror" -> ((s, dir) => {
      // identity-keyed mirroring (the Delta row-tracking consumer
      // contract): with `includeRowIds=true` the change feed exposes
      // the immutable `_row_id`, and the mirror applies changes keyed
      // on IDENTITY instead of a business key — the only sound binding
      // when business keys are NON-UNIQUE. The source holds every F
      // order TWICE (copy B repriced +1e6); a window deletes ONLY copy
      // B of every third key (a business-key-bound delete would kill
      // copy A too) with an OPTIMIZE mid-window (empty delta under
      // ids); then an O append. Pins: the mirror equals the source
      // exactly, duplicates included, copy-A survivors intact.
      val src = java.nio.file.Files.createTempDirectory("st14_src").toString
      val dst = java.nio.file.Files.createTempDirectory("st14_dst").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st14_ckpt").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val f = orders.filter(col("o_orderstatus") === "F")
      val dup = f.unionByName(
        f.withColumn("o_totalprice", col("o_totalprice") + 1000000.0))
      MT.create(s, src, dup.repartition(3))
      MT.enableRowTracking(s, src)
      MT.create(s, dst, MT.readWithRowIds(s, src).limit(0))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .option("changeFeed", "true").option("includeRowIds", "true").load(src)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            MT.applyChangesMor(s, dst, b, "_row_id", "mirror", id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial load: both copies of every key
      MT.deleteMor(s, src,
        col("o_totalprice") > 1000000.0 && col("o_orderkey") % 3 === 0)
      MT.compact(s, src, 64L * 1024 * 1024) // empty delta under ids
      drain()
      MT.append(s, src, orders.filter(col("o_orderstatus") === "O"))
      drain()
      val srcDf = MT.read(s, src)
      val dstDf = MT.read(s, dst).drop("_row_id")
      val mirrors = dstDf.exceptAll(srcDf).isEmpty && srcDf.exceptAll(dstDf).isEmpty
      dstDf.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(mirrors).as("mirrors_with_duplicates"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st11_changefeed_optimize" -> ((s, dir) => {
      // the change feed SURVIVING OPTIMIZE: with row tracking on, a
      // compaction mid-window is a provably EMPTY delta (ids verify
      // every row survived), so the mirror pipeline that st10 runs keeps
      // draining where the positional feed refuses. The window holds a
      // MOR delete, then a COMPACT that rewrites every file (positions
      // all move — the netting is id-based), then an append; one
      // checkpointed restart between passes.
      val src = java.nio.file.Files.createTempDirectory("st11_src").toString
      val dst = java.nio.file.Files.createTempDirectory("st11_dst").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st11_ckpt").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val f = orders.filter(col("o_orderstatus") === "F")
      MT.create(s, src, f.repartition(4))
      MT.enableRowTracking(s, src)
      MT.create(s, dst, f.limit(0))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .option("changeFeed", "true").load(src)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            MT.applyChangesMor(s, dst, b, "o_orderkey", "mirror", id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial load
      MT.deleteMor(s, src, col("o_orderkey") % 3 === 0)
      MT.compact(s, src, 64L * 1024 * 1024) // all positions move
      MT.append(s, src, orders.filter(col("o_orderstatus") === "O"))
      drain()
      val srcDf = MT.read(s, src)
      val dstDf = MT.read(s, dst)
      val mirrors = dstDf.exceptAll(srcDf).isEmpty && srcDf.exceptAll(dstDf).isEmpty
      dstDf.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(mirrors).as("mirrors_source"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st12_changefeed_merge" -> ((s, dir) => {
      // the change feed is now TOTAL under row tracking short of
      // OVERWRITE: a window holding a MERGE upsert (repriced F rows +
      // O inserts, st9's change set) AND a full COMPACT streams as the
      // merge's id-diff (delete old version + insert new) while the
      // compact contributes a verified-empty delta — the mirror applies
      // it all through applyChangesMor and must equal the source.
      val src = java.nio.file.Files.createTempDirectory("st12_src").toString
      val dst = java.nio.file.Files.createTempDirectory("st12_dst").toString
      val ckpt = java.nio.file.Files.createTempDirectory("st12_ckpt").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val f = orders.filter(col("o_orderstatus") === "F")
      MT.create(s, src, f.repartition(2))
      MT.enableRowTracking(s, src)
      MT.create(s, dst, f.limit(0))
      def drain(): Unit = {
        val q = s.readStream
          .format("graft.sources.ManifestStreamSourceProvider")
          .option("changeFeed", "true").load(src)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            MT.applyChangesMor(s, dst, b, "o_orderkey", "mirror", id); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial load
      val updates = f.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(col("o_orderstatus") === "O"))
      MT.merge(s, src, updates, "o_orderkey")
      MT.compact(s, src, 64L * 1024 * 1024) // empty delta, positions move
      drain()
      val srcDf = MT.read(s, src)
      val dstDf = MT.read(s, dst)
      val mirrors = dstDf.exceptAll(srcDf).isEmpty && srcDf.exceptAll(dstDf).isEmpty
      dstDf.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(mirrors).as("mirrors_source"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "st1_stream_hourly" -> ((s, dir) => {
      // Structured Streaming under the SAME oracle as batch e1: drain the
      // events parquet through a file-source stream, aggregate in Complete
      // mode (all windows retained), return the result table — must
      // hash-match DuckDB exactly like the batch tumbling aggregate
      val staged = java.nio.file.Files.createTempDirectory("st1_events")
      staged.toFile.deleteOnExit()
      val copied = staged.resolve("part-0.parquet")
      copied.toFile.deleteOnExit()
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // stateful-stream shuffle width = state-store count; size it to the
      // key cardinality (24h × few event types), not the batch shuffle
      // width — 32 near-empty state stores would pay 4× the checkpoint IO.
      // NOTE: this set/restore mutates SESSION-global conf, which is safe
      // because the driver contract runs queries sequentially on one
      // session; concurrent execution would need spark.newSession() here
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val q = graft.streaming.EventStreams.runToMemory(
          EventOps.tumblingCounts(stream, "hour"), "st1_hourly", "complete")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
      s.table("st1_hourly")
    }),

    "st3_stream_update" -> ((s, dir) => {
      // the third output mode (st1 Complete, st2 Append): update-mode
      // aggregation emits only groups REVISED by each batch. An
      // AvailableNow drain of one file is a single batch, so every group
      // is revised exactly once and the result answers to the same batch
      // oracle — the multi-batch re-emission and late-drop semantics are
      // pinned by the update-mode spec in MultimodalStreamingSpec
      val staged = java.nio.file.Files.createTempDirectory("st3_events")
      staged.toFile.deleteOnExit()
      val copied = staged.resolve("part-0.parquet")
      copied.toFile.deleteOnExit()
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8") // state-store sizing, see st1
      try {
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val q = graft.streaming.EventStreams.runToMemory(
          EventOps.tumblingCounts(stream, "hour"), "st3_hourly", "update")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
      s.table("st3_hourly")
    }),

    "st2_stream_interval_join" -> ((s, dir) => {
      // stream-stream interval self-join drained through a file-source
      // stream — answers to the SAME oracle as the batch rj1 range join:
      // inner-join matches emit as both sides arrive, so draining the
      // whole file yields exactly the batch pair set
      val staged = java.nio.file.Files.createTempDirectory("st2_events")
      staged.toFile.deleteOnExit()
      val copied = staged.resolve("part-0.parquet")
      copied.toFile.deleteOnExit()
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // same sequential-driver assumption as st1's set/restore above
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val joined = graft.streaming.EventStreams.intervalJoinStream(
          stream, stream, "user_id", "ts", "event_id", withinSeconds = 300L)
        val q = graft.streaming.EventStreams.runToMemory(joined, "st2_pairs", "append")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
      s.table("st2_pairs")
        .select(col("user_id"), col("l_id").as("id_a"), col("r_id").as("id_b"),
          col("l_ts").as("t_a"), col("r_ts").as("t_b"))
    }),

    "st4_stream_left_interval_join" -> ((s, dir) => {
      // LEFT OUTER stream-stream interval join: NULL-padded rows for
      // left events with no follower are emitted only when the WATERMARK
      // proves the window closed — so the drain stages a sentinel event
      // past every real window (filtered back out below) to flush the
      // trailing state, and the result answers to the batch LEFT JOIN
      // oracle exactly
      // bench-harness artifact: the sentinel injection below stands in for
      // real watermark advancement — a production left-outer stream flushes
      // trailing state because new events keep arriving, not because anyone
      // appends a flush row (see EventStreams.leftOuterIntervalJoinStream)
      val staged = java.nio.file.Files.createTempDirectory("st4_events")
      val copied = staged.resolve("part-0.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // restored in the finally below: unlike rec1's lazy frame, every
      // read that needs this conf drains eagerly inside this closure.
      // Both conf reads happen BEFORE the try; both sets happen INSIDE it,
      // so a failure anywhere (including the eager sentinel-staging reads)
      // still hits the finally-restore and the shared session conf is
      // never left mutated on an exception path.
      val nanosPrev = s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
      // same sequential-driver assumption as st1/st2
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        // micros → LTZ, same normalization as Tables.load (sticky there,
        // so no restore needed for this one)
        s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        val raw = s.read.parquet(staged.toString)
        // sentinel ts > max + within + watermark delay: closes every window
        val marginSec = 300L + 3600L + 60L
        val sentinelTs =
          if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            lit(raw.agg(max("ts")).head().getLong(0) + marginSec * 1000000000L)
          else lit(new java.sql.Timestamp(
            raw.agg(max("ts")).head().getTimestamp(0).getTime + marginSec * 1000L))
        s.range(1).select(
            lit(-1L).as("event_id"), sentinelTs.as("ts"), lit(-1L).as("user_id"),
            lit("sentinel").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
          .coalesce(1).write.mode("append").parquet(staged.toString)
        s.conf.set("spark.sql.shuffle.partitions", "2")
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val joined = graft.streaming.EventStreams.leftOuterIntervalJoinStream(
          stream, stream, "user_id", "ts", "event_id", withinSeconds = 300L)
        val q = graft.streaming.EventStreams.runToMemory(joined, "st4_pairs", "append")
        // state-metered drain: peak/final state rows recorded in
        // EventStreams.lastStateMeter so scale rehearsals can attribute
        // 10× growth to output rows vs state-eviction failure
        graft.streaming.EventStreams.drainWithStateMeter(q)
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", nanosPrev)
        // the sentinel append added part files + _SUCCESS under `staged`,
        // so deleteOnExit (non-recursive) would leak a full events copy
        // per run — delete the staged dir recursively once drained (the
        // memory sink owns the results from here)
        org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
      }
      s.table("st4_pairs")
        .filter(col("user_id") >= 0) // drop the sentinel's own NULL row
        .select(col("user_id"), col("l_id").as("id_a"), col("r_id").as("id_b"),
          col("l_ts").as("t_a"), col("r_ts").as("t_b"))
    }),

    "st8_stream_session_window" -> ((s, dir) => {
      // streaming sessionization via the BUILT-IN session_window (the
      // merging-state aggregate; e2/sessionizeStream is the explicit-
      // state formulation): append-mode sessions emit only when the
      // watermark passes their close, so the drain stages one sentinel
      // event past max(ts) + gap + delay to flush every open session
      // (filtered back out below — sessions are per-user, so the
      // sentinel's own session can't touch a real one). Answers the
      // SAME oracle as batch e6.
      val staged = java.nio.file.Files.createTempDirectory("st8_events")
      val copied = staged.resolve("part-0.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), copied,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val nanosPrev = s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
      val batchPartitions = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        val raw = s.read.parquet(staged.toString)
        val marginSec = 600L + 60L + 60L // gap + watermark delay + slack
        val sentinelTs =
          if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            lit(raw.agg(max("ts")).head().getLong(0) + marginSec * 1000000000L)
          else lit(new java.sql.Timestamp(
            raw.agg(max("ts")).head().getTimestamp(0).getTime + marginSec * 1000L))
        s.range(1).select(
            lit(-1L).as("event_id"), sentinelTs.as("ts"), lit(-1L).as("user_id"),
            lit("sentinel").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
          .coalesce(1).write.mode("append").parquet(staged.toString)
        s.conf.set("spark.sql.shuffle.partitions", "8") // state-store sizing, see st1
        val stream = graft.streaming.EventStreams.eventParquetStream(s, staged.toString)
        val sessions = graft.streaming.EventStreams.sessionWindowStream(stream, gapMinutes = 10)
        val q = graft.streaming.EventStreams.runToMemory(sessions, "st8_sessions", "append")
        q.awaitTermination()
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", batchPartitions)
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", nanosPrev)
        org.apache.commons.io.FileUtils.deleteQuietly(staged.toFile)
      }
      s.table("st8_sessions").filter(col("user_id") >= 0)
    }),

    // ---- text analysis ----
    "txt1_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_computed"))),

    "txt2_quality" -> ((s, dir) =>
      TextOps.withQualityFeatures(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("mean_token_len"), col("stopword_ratio"))),

    "txt3_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), TextOps.languageId(col("text")).as("lang_guess"))),

    "txt4_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), TextOps.fingerprint(col("text")).as("content_md5"))),

    "txt7_rolling_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.rollingFingerprint(col("text")).as("rolling_hash"))),

    "txt10_repetition" -> ((s, dir) => {
      // C4/Gopher-style repetition filter: duplicate 3-gram fraction.
      // Native distinct-shingle kernel — the HOF+widen() formulation
      // moved the interpreted cost across cores; the kernel removes it
      // (structural fix per round-3 verdict), so no repartition exchange
      // is needed at all
      graft.functions.NativeExpressions.register(s)
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.repetitionRatioNative("text", 3).as("dup3_frac"))
    }),

    "txt11_char_entropy" -> ((s, dir) => {
      // perplexity proxy: per-doc character-distribution entropy through
      // the codegen'd graft_char_entropy kernel (bit-parity spec vs the
      // HOF histogram, which was the #2 bench cost at 3.05 s — the
      // interpreted lambdas were the scale-killer, not the partitioning)
      graft.functions.NativeExpressions.register(s)
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.charEntropyNative("text").as("char_entropy"))
    }),

    "txt8_redact_pii" -> ((s, dir) => {
      // PII scrubbing under the oracle: the corpus carries no PII, so the
      // query plants a deterministic email + numeric id per doc (same
      // concat both engines), then redacts — the regex path is
      // hash-checked end to end, not vacuously
      val dirty = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com ref "), (col("doc_id") * 10000 + 1234).cast("string")).as("dirty"))
      dirty.select(col("doc_id"), TextOps.redactPii(col("dirty")).as("clean"))
        .withColumn("clean_len", length(col("clean")).cast("long"))
    }),

    "txt9_tfidf" -> ((s, dir) => {
      // classic tf-idf feature table: tf per (doc, term), document
      // frequency per term, idf = ln((N+1)/(df+1)). Shapes: one explode +
      // two aggregations; the vocabulary table joins by term (AQE
      // broadcasts it when small); the 1-row corpus count broadcasts.
      // Both ln inputs are exactly-rounded double divisions of integers,
      // so the oracle reproduces the value bit-for-bit (round 4 guards
      // the sub-ulp libm edge)
      val docs = t(s, dir, "documents")
      val terms = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // document frequency derives from tf — its rows are already the
      // distinct (doc, term) pairs, so a second explode+distinct pass
      // over the corpus would be pure waste
      val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val total = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(dfq, "term")
        .crossJoin(broadcast(total))
        .select(col("doc_id"), col("term"), col("tf").cast("bigint").as("tf"),
          round(col("tf").cast("double") *
            log((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")), 4).as("tfidf"))
    }),

    "smp5_dsir_select" -> ((s, dir) => {
      // DSIR importance resampling: target = the English slice, raw =
      // the whole corpus; hashed-unigram bucket model, add-one
      // smoothing, per-doc log importance weight, deterministic top-100
      // (logw desc, doc_id tiebreak — the engine's rankable surface for
      // the paper's Gumbel-noise sampling). The oracle replays bucket
      // hashing (md5-nibble arithmetic), both corpus models, and the
      // exact DECIMAL term sum.
      val docs = t(s, dir, "documents")
      SampleOps.dsirWeights(docs, docs.filter(col("lang") === "en"), "doc_id", "text")
        .orderBy(col("logw").desc, col("doc_id"))
        .limit(100)
    }),

    "cls2_centroid_confusion" -> ((s, dir) =>
      // nearest-class-mean classification over the labeled embeddings:
      // prototypes = v2's decimal-exact centroids, assignment = argmin
      // of the round-8 decimal-summed squared L2; the oracle replays
      // centroid fitting, distance accumulation, and the argmin
      ClassifyOps.centroidConfusion(t(s, dir, "embeddings"), "vec_id", "label", "embedding")),

    "v2_label_centroids" -> ((s, dir) =>
      // per-label mean-pooled embedding centroids, flat (label, dim)
      // form; decimal-exact sums make the mean reproducible — the
      // oracle replays cast, sum, and the one rounded division
      SimilarityOps.labelCentroids(t(s, dir, "embeddings"), "label", "embedding")),

    "e5_count_anomalies" -> ((s, dir) => {
      // 3σ count-anomaly detection on the event stream, in PURE INTEGER
      // arithmetic: hour h of type t is anomalous iff
      // (n·c − S)² > 9·(n·Q − S²) — the population z-test cleared of
      // divisions (n hours, S = Σc, Q = Σc²), so the flag is exact with
      // no float rounding anywhere. Two hash aggregates + one broadcast
      // join; the per-type stats row is O(event types).
      val ev = t(s, dir, "events")
      val hourly = ev.groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"))
      val stats = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"), sum(col("n_events")).as("s"),
          sum(col("n_events") * col("n_events")).as("q"))
      val dev = col("n_hours") * col("n_events") - col("s")
      hourly.join(broadcast(stats), Seq("event_type"))
        .filter(dev * dev > lit(9L) * (col("n_hours") * col("q") - col("s") * col("s")))
        .select(col("event_type"), col("hour"), col("n_events"))
    }),

    "e6_session_window" -> ((s, dir) =>
      // built-in session_window aggregation: dynamic [first, last+gap)
      // windows computed by ONE merging-state hash aggregate — no
      // per-user window sort (e2's lag formulation is the two-window
      // alternative). The merge boundary is INCLUSIVE (spec-pinned), so
      // the oracle's gaps-and-islands mirror splits on strict > only.
      EventOps.sessionWindowStats(t(s, dir, "events"), gapMinutes = 10)),

    "e7_funnel" -> ((s, dir) =>
      // ordered conversion funnel view → click → purchase: earliest
      // step-1, earliest step-2 strictly after it, earliest step-3
      // strictly after that; conversion time in exact integer micros.
      // Three filtered min-aggregates chained on user_id — the frontier
      // shrinks each stage and broadcasts into the next join.
      EventOps.funnel(t(s, dir, "events"), Seq("view", "click", "purchase"))),

    "q7_freshness" -> ((s, dir) =>
      // dbt source-freshness analog: per event stream, the newest
      // record, its staleness in exact integer minutes against the
      // table-wide newest timestamp (the deterministic anchor), and the
      // pass/warn/error verdict at 15/60 minutes.
      graft.quality.Checks.sourceFreshness(t(s, dir, "events"),
        "event_type", "ts", warnAfterMinutes = 15, errorAfterMinutes = 60)),

    "gr1_pagerank" -> ((s, dir) => {
      // link analysis as a curation signal: 5 rounds of damped PageRank
      // over the part co-purchase graph (parts sharing an order), in
      // exact integer fixed-point — truncating `div` matches DuckDB's
      // `//` bit-for-bit, so the oracle replays every round as chained
      // CTEs (the BPE replay trick applied to graph iteration). Face =
      // top-20 parts, total-ordered (rank desc, part asc).
      val edges = graft.ops.GraphOps.coOccurrenceEdges(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey")
      graft.ops.GraphOps.pageRank(edges, iterations = 5)
        .orderBy(col("pr").desc, col("u"))
        .limit(20)
        .select(col("u").as("part_id"), col("pr").as("rank_scaled"))
    }),

    "cls3_tree" -> ((s, dir) => {
      // a TRAINED quality classifier (cls1/cls2 are closed-form): a
      // depth-2 decision tree greedily fit on hashed bag-of-words
      // count features over the Knuth-hash train split, holdout
      // confusion as the face. The weak-supervision label is a 3-word
      // coverage heuristic (~50% prevalence); the all-integer split
      // search replays level by level in the oracle.
      val tk = split(col("text"), " ")
      ClassifyOps.depth2TreeConfusion(t(s, dir, "documents"), "doc_id", "text",
        array_contains(tk, "spark") && array_contains(tk, "merge")
          && array_contains(tk, "filter"))
    }),

    "km2_kcenter" -> ((s, dir) =>
      // diverse exemplar selection: 8 farthest-first k-center seeds
      // over the embedding corpus (Gonzalez 2-approximation) — the
      // deterministic coreset/anchor pick where k-means++'s random D²
      // sampling could never meet an oracle. Face = the seed sequence
      // with its non-increasing coverage-radius bound.
      graft.ops.ClusterOps.kCenterSeeds(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8)),

    "km1_kmeans" -> ((s, dir) =>
      // full-corpus Lloyd's k-means in exact integer fixed point —
      // the curation clustering primitive (topic mixing, per-cluster
      // audits) as a per-round broadcast+aggregate job. 2 rounds from
      // the 8 smallest-id seeds; the oracle replays quantization, every
      // assignment/update round, and the final per-cluster audit
      // (membership, exact inertia, centroid checksum).
      graft.ops.ClusterOps.kmeansSummary(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, rounds = 2)),

    "dd9_semdedup" -> ((s, dir) =>
      // SemDeDup (Abbas et al. 2023): semantic clusters bound the
      // quadratic near-dup comparison — nearest-SEED assignment against
      // ~sqrt(N) hash-thresholded seeds (O(N^1.5) total across both
      // stages, sqrt(N)-row broadcast) + within-cluster cosine ≥ 0.4
      // pairs, greedy min-id retention. Per-cluster audit summary is
      // the face; the whole pipeline, clustering included, replays in
      // the oracle (no k-means goldens needed).
      SimilarityOps.semanticDedupSummary(
        t(s, dir, "embeddings"), "vec_id", "embedding", minCosine = 0.4)),

    "q8_lateral_join" -> ((s, dir) => {
      // LATERAL correlated subquery in FROM (SQL:1999; Spark 4 + DuckDB
      // both speak it): each customer's top-2 orders by price. Catalyst
      // DECORRELATES the per-row subquery into a window/join plan — the
      // per-customer loop a naive engine would run never exists.
      t(s, dir, "customer").createOrReplaceTempView("q8_customer")
      t(s, dir, "orders").createOrReplaceTempView("q8_orders")
      s.sql("""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM q8_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM q8_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o""")
    }),

    "w7_latest_per_key" -> ((s, dir) =>
      // CDC-compact / dedupe-to-current-state: the latest event per
      // user via ONE max(struct) hash aggregate — (ts, event_id) is a
      // total order, so no window sort and a deterministic winner; the
      // oracle answers with the row_number() formulation
      EventOps.latestPerKey(t(s, dir, "events"),
        keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
        payloadCols = Seq("event_type", "value"))),

    "e8_retention_cohorts" -> ((s, dir) =>
      // weekly retention matrix: cohort = ISO week of first event,
      // counted per integer week offset — all date-trunc/datediff
      // integer arithmetic, no floats
      EventOps.retentionCohorts(t(s, dir, "events"))),

    "e9_attribution" -> ((s, dir) =>
      // multi-touch attribution: purchase value credited to the user's
      // view/click/signup touches in the prior 7 days under four models
      // at once (first/last/linear/U-shaped 40-40-20), all credit in
      // exact integer micros with truncating div — per-channel sums
      // replay exactly; (ts, event_id) breaks timestamp ties.
      EventOps.attribution(t(s, dir, "events"),
        Seq("view", "click", "signup"), "purchase", lookbackDays = 7)),

    "v3_random_projection" -> ((s, dir) =>
      // JL sign random projection 64 -> 8 dims: ±1 matrix from md5
      // parity (a pure expression, no RNG), decimal-exact sums, one
      // exactly-rounded double per cell — the oracle re-derives the
      // matrix AND the projection
      SimilarityOps.signRandomProjection(
        t(s, dir, "embeddings"), "vec_id", "embedding", outDims = 8)),

    "lake13_restore" -> ((s, dir) => {
      // RESTORE TO VERSION: v1 = even orders, v2 = append odds (full
      // table), v3 = a fat-finger overwrite with an empty frame, v4 =
      // restore(v2) — one metadata commit, no data copied. The restored
      // read must equal the plain full-table aggregate; the mirror pins
      // that restore landed as version 4.
      val root = java.nio.file.Files.createTempDirectory("lake13_restore")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.filter(col("o_orderkey") % 2 === 0).repartition(2))
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderkey") % 2 === 1).repartition(2))
      graft.sources.ManifestTable.overwrite(s, root.toString,
        orders.filter(col("o_orderkey") < 0))
      val v = graft.sources.ManifestTable.restore(s, root.toString, 2L)
      graft.sources.ManifestTable.read(s, root.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(v == 4L).as("restored_as_v4"), col("o_orderstatus"),
          col("n_orders"), col("total_price"))
    }),

    "lake14_history" -> ((s, dir) => {
      // DESCRIBE HISTORY: the per-version audit trail (op + exact row
      // count from committed per-file stats — driver-side text reads,
      // no scan). The oracle re-derives every version's row count from
      // the source: create = even keys, append = all, delete = the
      // survivors of the price predicate (NULL-pred rows would
      // survive; o_totalprice is non-null here).
      val root = java.nio.file.Files.createTempDirectory("lake14_history")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.filter(col("o_orderkey") % 2 === 0).repartition(2),
        statsColumns = Seq("o_orderkey"))
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderkey") % 2 === 1).repartition(2),
        statsColumns = Seq("o_orderkey"))
      graft.sources.ManifestTable.delete(s, root.toString,
        col("o_totalprice") < 50000.0, statsColumns = Seq("o_orderkey"))
      import s.implicits._
      graft.sources.ManifestTable.history(s, root.toString)
        .map(v => (v.version, v.operation, v.rowCount.getOrElse(-1L)))
        .toDF("version", "operation", "n_rows")
    }),

    "lake15_column_mapping" -> ((s, dir) => {
      // metadata-only column RENAME (Delta's column mapping): v1 = even
      // orders with key stats, v2/v3 = rename o_orderkey→order_id and
      // o_totalprice→total_price (zero files staged — pinned into the
      // face), v4 = append the odd orders under the NEW logical names
      // (staged back to physical, so files stay homogeneous). The read
      // serves the full table under logical names, and a point probe on
      // the renamed key still prunes through the stats committed under
      // the physical name before the rename existed.
      val root = java.nio.file.Files.createTempDirectory("lake15_colmap")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.filter(col("o_orderkey") % 2 === 0)
          .repartitionByRange(4, col("o_orderkey")),
        statsColumns = Seq("o_orderkey"))
      val filesV1 = graft.sources.ManifestTable.manifestFiles(s, root.toString, 1L)
      graft.sources.ManifestTable.renameColumn(s, root.toString, "o_orderkey", "order_id")
      graft.sources.ManifestTable.renameColumn(s, root.toString, "o_totalprice", "total_price")
      val metadataOnly =
        graft.sources.ManifestTable.manifestFiles(s, root.toString, 3L) == filesV1
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderkey") % 2 === 1)
          .withColumnRenamed("o_orderkey", "order_id")
          .withColumnRenamed("o_totalprice", "total_price")
          .repartitionByRange(4, col("order_id")),
        statsColumns = Seq("order_id"))
      val (_, dropped, _) = graft.sources.ManifestTable.pruneFiles(
        s, root.toString, col("order_id") === 16L)
      graft.sources.ManifestTable.read(s, root.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("total_price")).as("total_price"),
          min(col("order_id")).as("min_order"),
          max(col("order_id")).as("max_order"))
        .select(lit(metadataOnly).as("rename_metadata_only"),
          lit(dropped.nonEmpty).as("pruned_after_rename"),
          col("o_orderstatus"), col("n_orders"), col("total_price"),
          col("min_order"), col("max_order"))
    }),

    "lake16_shallow_clone" -> ((s, dir) => {
      // shallow CLONE: the clone's first manifest names the source's
      // files by absolute path — zero bytes copied (pinned: no data dir
      // under the clone root) — then the tables diverge copy-on-write:
      // the clone deletes keys < 100 (only affected borrowed files
      // rewrite, locally), the source appends 5 rows, and neither side
      // sees the other's write. Face = both sides' aggregates, flags
      // pinning zero-copy and carried-stats pruning on the clone.
      val src = java.nio.file.Files.createTempDirectory("lake16_src").toString
      val dst = java.nio.file.Files.createTempDirectory("lake16_dst").toString
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, src,
        orders.repartitionByRange(4, col("o_orderkey")),
        statsColumns = Seq("o_orderkey"))
      graft.sources.ManifestTable.shallowClone(s, src, dst)
      val zeroCopy = !new java.io.File(s"$dst/data").exists()
      graft.sources.ManifestTable.delete(s, dst, col("o_orderkey") < 100L,
        statsColumns = Seq("o_orderkey"))
      graft.sources.ManifestTable.append(s, src,
        orders.orderBy(col("o_orderkey")).limit(5))
      val (_, dropped, _) = graft.sources.ManifestTable.pruneFiles(
        s, dst, col("o_orderkey") === 500L)
      def side(name: String, root: String) =
        graft.sources.ManifestTable.read(s, root)
          .groupBy(lit(name).as("side"))
          .agg(count(lit(1)).cast("long").as("n_rows"),
            dsum(col("o_totalprice")).as("total_price"),
            min(col("o_orderkey")).as("min_key"))
      side("clone", dst).unionByName(side("source", src))
        .select(lit(zeroCopy).as("clone_zero_copy"),
          lit(dropped.nonEmpty).as("pruned_on_clone"),
          col("side"), col("n_rows"), col("total_price"), col("min_key"))
    }),

    "lake17_stats_rollup" -> ((s, dir) => {
      // table-level stats rollup (Iceberg's manifest-list/partition-
      // summary idea): every commit folds the per-file stats into one
      // table-wide entry, so "is this table even relevant?" answers in
      // O(columns) — the routing decision a catalog of per-day/
      // per-tenant tables makes before planning anything. Face pins:
      // past-max and IS NULL probes skip the whole table, an in-range
      // point probe keeps it, a widening append widens the rollup, and
      // time travel answers with the OLD rollup.
      val root = java.nio.file.Files.createTempDirectory("lake17_rollup").toString
      val orders = t(s, dir, "orders")
      val mt = graft.sources.ManifestTable
      mt.create(s, root,
        orders.filter(col("o_orderkey") % 2 === 0)
          .repartitionByRange(4, col("o_orderkey")),
        statsColumns = Seq("o_orderkey"))
      val maxKey = orders.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
      mt.append(s, root,
        orders.filter(col("o_orderkey") % 2 === 1)
          .repartitionByRange(4, col("o_orderkey")),
        statsColumns = Seq("o_orderkey"))
      val skipPastMax = !mt.tableMayMatch(s, root, col("o_orderkey") > maxKey)
      val skipNull = !mt.tableMayMatch(s, root, col("o_orderkey").isNull)
      val keepPoint = mt.tableMayMatch(s, root, col("o_orderkey") === maxKey)
      // v1 held only even keys up to maxKey-1; the tip's rollup covers
      // maxKey (odd or even, one of the two commits holds it) — and the
      // count fast path answers 0 past the max without touching files
      val (nPast, fullPast, resPast) = mt.countWhere(s, root, col("o_orderkey") > maxKey)
      mt.read(s, root).groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(skipPastMax).as("skip_past_max"),
          lit(skipNull).as("skip_null"),
          lit(keepPoint).as("keep_point"),
          lit(nPast == 0 && fullPast == 0 && resPast == 0).as("count_fast_path"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "lake12_bucket_transform" -> ((s, dir) => {
      // hidden partitioning (Iceberg bucket transform): orders rewritten
      // CLUSTER BY bucket(16, o_orderkey) — xxhash64 mod 16, committed
      // as min/max on a manifest-only VIRTUAL column — and a 3-key point
      // probe on the SOURCE column translates through the transform and
      // prunes EXACTLY. This is the hash layout where source-column
      // ranges prune nothing and lake5 spends 16 KiB of bloom bits per
      // file; the transform does it in a few manifest bytes with zero
      // false positives. pruned_some mirrors the observed drop.
      val root = java.nio.file.Files.createTempDirectory("lake12_bucket")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString, orders.repartition(4))
      val target = math.max(1L,
        graft.sources.ManifestTable.tableBytes(s, root.toString) / 8)
      graft.sources.ManifestTable.optimizeClusterBy(s, root.toString,
        graft.sources.BucketTransform(16, "o_orderkey"), target)
      val f = col("o_orderkey").isin(7L, 42L, 1337L)
      val (_, dropped, _) = graft.sources.ManifestTable.pruneFiles(s, root.toString, f)
      graft.sources.ManifestTable.readPruned(s, root.toString, f)
        .select(lit(dropped.nonEmpty).as("pruned_some"), col("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    }),

    "lake18_drop_column" -> ((s, dir) => {
      // metadata-only DROP COLUMN: v1 = even orders, v2 = drop
      // o_orderpriority (zero files staged — pinned into the face),
      // append the odd orders without it, then the documented re-add
      // workflow: a resurrection attempt (append carrying a column on
      // the tombstoned physical slot) REFUSES — pinned — and the
      // column comes back as prio2 + rename, so only the 5 re-added
      // rows carry values and every pre-drop row reads NULL forever.
      val root = java.nio.file.Files.createTempDirectory("lake18_drop")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.filter(col("o_orderkey") % 2 === 0).repartition(2),
        statsColumns = Seq("o_orderkey"))
      val filesV1 = graft.sources.ManifestTable.manifestFiles(s, root.toString, 1L)
      graft.sources.ManifestTable.dropColumn(s, root.toString, "o_orderpriority")
      val metadataOnly =
        graft.sources.ManifestTable.manifestFiles(s, root.toString, 2L) == filesV1
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderkey") % 2 === 1).drop("o_orderpriority")
          .repartition(2),
        statsColumns = Seq("o_orderkey"))
      val resurrectRefused =
        try { graft.sources.ManifestTable.append(s, root.toString, orders.limit(1)); false }
        catch { case _: IllegalArgumentException => true }
      graft.sources.ManifestTable.append(s, root.toString,
        orders.orderBy(col("o_orderkey")).limit(5)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate"),
            col("o_orderpriority").as("prio2")))
      graft.sources.ManifestTable.renameColumn(s, root.toString, "prio2", "o_orderpriority")
      graft.sources.ManifestTable.read(s, root.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"),
          sum(when(col("o_orderpriority").isNotNull, 1L).otherwise(0L)).as("n_prio_set"))
        .select(lit(metadataOnly).as("drop_metadata_only"),
          lit(resurrectRefused).as("resurrect_refused"),
          col("o_orderstatus"), col("n_orders"), col("total_price"), col("n_prio_set"))
    }),

    "lake19_check_constraints" -> ((s, dir) => {
      // CHECK constraints (Delta's ALTER TABLE ADD CONSTRAINT): adding
      // one the existing rows violate REFUSES with the count (pinned),
      // a violating append REFUSES at the write boundary (pinned), a
      // clean append lands, and the constraint itself is one metadata
      // commit that rides every subsequent rewrite.
      val root = java.nio.file.Files.createTempDirectory("lake19_check")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString, orders.repartition(2),
        statsColumns = Seq("o_orderkey"))
      graft.sources.ManifestTable.addCheckConstraint(s, root.toString,
        "positive_price", "o_totalprice > 0")
      val addRefused =
        try {
          graft.sources.ManifestTable.addCheckConstraint(s, root.toString,
            "impossible", "o_totalprice > 1000000000")
          false
        } catch { case _: IllegalArgumentException => true }
      val writeRefused =
        try {
          graft.sources.ManifestTable.append(s, root.toString,
            orders.limit(1).withColumn("o_totalprice", lit(-1.0)))
          false
        } catch { case _: IllegalArgumentException => true }
      graft.sources.ManifestTable.append(s, root.toString,
        orders.orderBy(col("o_orderkey")).limit(5))
      graft.sources.ManifestTable.read(s, root.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(addRefused).as("add_refused"),
          lit(writeRefused).as("write_refused"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "v4_power_iteration" -> ((s, dir) =>
      // PCA-lite: the dominant Gram direction by 4 rounds of integer
      // fixed-point power iteration — Gram is ONE d²-cell aggregate
      // (corpus never shuffles), iteration is on the tiny matrix, and
      // the signed normalization replays via sign·(|s|//mxp) which IS
      // Spark's toward-zero div (DuckDB's bare // floors negatives).
      graft.ops.SimilarityOps.gramTopComponent(
          t(s, dir, "embeddings"), "vec_id", "embedding", rounds = 4)
        .orderBy("dim_id")),

    "txt23_pmi" -> ((s, dir) =>
      // collocation mining: document-level PMI pairs (min support 5),
      // one ln of exact integer counts per pair — fully replayed.
      // Face = top-20 by (pmi desc, pair), total-ordered.
      TextOps.pmiPairs(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
        .limit(20)),

    "txt24_textrank" -> ((s, dir) =>
      // TextRank keywords: integer fixed-point PageRank (gr1's kernel)
      // over the corpus word co-occurrence graph — adjacent-token
      // edges, undirected, deduplicated. Tokenize→pair→3 rank rounds
      // all replay in the oracle as chained CTEs. Face = top-20 words,
      // total-ordered (rank desc, word asc).
      TextOps.textRankKeywords(t(s, dir, "documents"), "text",
        iterations = 3, k = 20)),

    "ret3_mmr" -> ((s, dir) => {
      // MMR diversified re-ranking: greedy argmax of 7·rel − 3·maxsim
      // (λ=0.7, ×10 integer) over an exact top-20 cosine pool, 5 picks
      // per query, ties by smallest id — every pick replayed round by
      // round in the oracle (the km2 chained-CTE pattern). rel and sim
      // are 4dp-cosine basis points, the ann1 contract.
      val emb = t(s, dir, "embeddings")
      SimilarityOps.mmrSelect(
        emb.filter(col("vec_id") < 3), "vec_id", "embedding",
        emb, "vec_id", "embedding", candidates = 20, k = 5)
        .withColumnRenamed("q_id", "query_id")
        .withColumnRenamed("vec_id", "doc_id")
    }),

    "ret2_rrf" -> ((s, dir) => {
      // hybrid retrieval: reciprocal rank fusion of a LEXICAL ranking
      // (BM25, ret1's exact-integer formulation) and a SEMANTIC ranking
      // (exact cosine, ann1's machinery) for 3 "more like this" query
      // docs — each leg's top-20 fuses as sum of 1000000 div (60+rank),
      // missing legs contribute 0, final top-10 by (rrf desc, doc_id).
      // Both legs AND the fusion replay exactly in the oracle.
      graft.functions.NativeExpressions.register(s)
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      // the fixed 3-doc eval set; bounded 3-row collect for query text
      val qtext = docs.filter(col("doc_id") < 3).select("doc_id", "text")
        .collect().map(r => (r.getLong(0).toString, r.getString(1)))
        .toSeq.sortBy(_._1)
      val lexRanks = TextOps.bm25Scores(docs, "doc_id", "text", qtext)
        .withColumn("query_id", col("query_id").cast("long"))
        .filter(col("query_id") =!= col("doc_id")) // self excluded, like ann1
        .groupBy("query_id")
        .agg(expr("graft_topk(CAST(score_micro AS DOUBLE), doc_id, 20)").as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"), col("col.payload").as("doc_id"),
          (col("pos") + 1).cast("int").as("rank"))
      val semRanks = SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 3), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 20)
        .select(col("q_id").as("query_id"), col("vec_id").as("doc_id"),
          col("rank"))
      TextOps.rrfFuse(Seq(lexRanks, semRanks), k = 10)
        .withColumnRenamed("rank", "rnk")
    }),

    "ret1_bm25" -> ((s, dir) => {
      // ranked retrieval over the corpus: BM25 top-5 per query for a
      // fixed 3-query eval set — integer saturation term (k1, b
      // rational), 6dp-ln idf, exact micro-unit sums, so the full
      // ranking replays. Per-query orderBy+limit (3 literal queries)
      // keeps the selection total-ordered without a window.
      val qs = Seq(("q1", "spark merge filter"), ("q2", "window scan"),
        ("q3", "stream customer data"))
      val scores = TextOps.bm25Scores(t(s, dir, "documents"), "doc_id", "text", qs)
        .localCheckpoint()
      qs.map { case (qid, _) =>
        scores.filter(col("query_id") === qid)
          .orderBy(col("score_micro").desc, col("doc_id")).limit(5)
      }.reduce(_.unionByName(_))
        .select(col("query_id"), col("doc_id"), col("score_micro"))
    }),

    "lake27_cdf_mor" -> ((s, dir) => {
      // change-data feed with row-level DELETES: the deletion-vector
      // diff between a cursor and the tip IS the delete feed (Delta
      // CDF's shape for MOR tables, where the insert-only CDF refuses).
      // Window: cursor at half the orders, then an append + a MOR
      // delete hitting BOTH halves. Inserts = appended half minus its
      // in-window deletions (add-then-delete is net zero); deletes =
      // cursor-visible rows now gone. The key also pins that
      // read(since) − deletes + inserts == read(tip) exactly.
      val root = java.nio.file.Files.createTempDirectory("lake27_cdf").toString
      val orders = t(s, dir, "orders")
      val p1 = orders.filter(col("o_orderkey") % 2 === 0)
      val p2 = orders.filter(col("o_orderkey") % 2 === 1)
      graft.sources.ManifestTable.create(s, root, p1)
      val cursor = graft.sources.ManifestTable.versions(s, root).max
      graft.sources.ManifestTable.append(s, root, p2)
      graft.sources.ManifestTable.deleteMor(s, root, col("o_orderkey") % 7 === 0)
      val (feed, tip) = graft.sources.ManifestTable.readChangesWithDeletes(s, root, cursor)
      val del = feed.filter(col("_change_type") === "delete").drop("_change_type")
      val ins = feed.filter(col("_change_type") === "insert").drop("_change_type")
      val reconciled = graft.sources.ManifestTable.read(s, root, Some(cursor))
        .exceptAll(del).unionAll(ins)
      val now = graft.sources.ManifestTable.read(s, root, Some(tip))
      val reconciles = reconciled.exceptAll(now).isEmpty && now.exceptAll(reconciled).isEmpty
      feed.groupBy("_change_type", "o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(reconciles).as("reconciles"), col("_change_type").as("change_type"),
          col("o_orderstatus"), col("n_rows"), col("total_price"))
    }),

    "lake29_compact_small" -> ((s, dir) => {
      // bin-packing OPTIMIZE (what Delta's OPTIMIZE actually runs, vs
      // the full rewrite): pack ONLY the small-file tail, carry every
      // right-sized file byte-identical. Pins: first pass rewrote
      // exactly the 4 tail files and carried the big one; a second pass
      // after a MOR delete pulls the vector-referenced files in
      // regardless of size and drops the vector. Face = final content.
      val root = java.nio.file.Files.createTempDirectory("lake29_cs").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val f = orders.filter(col("o_orderstatus") === "F")
      MT.create(s, root, f.repartition(1)) // one big file
      (0 until 4).foreach(i => MT.append(s, root,
        orders.filter(col("o_orderstatus") === "O")
          .filter(col("o_orderkey") % 4 === lit(i)).repartition(1)))
      val files0 = MT.manifestFiles(s, root, MT.versions(s, root).max)
      def sizeOf(p: String): Long = new java.io.File(s"$root/$p").length()
      val big = files0.maxBy(sizeOf)
      val threshold = files0.filterNot(_ == big).map(sizeOf).max + 1
      val (v1, st1) = MT.compactSmall(s, root, threshold, 64L * 1024 * 1024)
      val packedTail = st1.filesRewritten == 4 && st1.filesUntouched == 1 &&
        MT.manifestFiles(s, root, v1).contains(big)
      MT.deleteMor(s, root, col("o_orderkey") % 7 === 0)
      val (v2, _) = MT.compactSmall(s, root, threshold, 64L * 1024 * 1024)
      val purged = MT.deletionVector(s, root, v2).isEmpty
      MT.read(s, root).groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(packedTail).as("packed_tail_only"),
          lit(purged).as("vector_materialized"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "lake30_ivm_total" -> ((s, dir) => {
      // IVM that SURVIVES deletes and updates: the count/sum mart
      // maintained through the TOTAL change feed with SIGNED deltas
      // (+1/+v inserts, −1/−v retractions) across a window holding a
      // MOR delete, a MERGE upsert, and a full COMPACT — exactly where
      // lake11's append-only maintainer must full-refresh. The whole
      // application (group retractions + upserts + the consumed-version
      // watermark) is ONE atomic applyChangesMor commit; pins: the
      // maintained mart equals the from-scratch rebuild bit-exactly AND
      // a crash-replay maintenance call is a no-op.
      val src = java.nio.file.Files.createTempDirectory("lake30_src").toString
      val mart = java.nio.file.Files.createTempDirectory("lake30_mart").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val f = orders.filter(col("o_orderstatus") === "F")
      MT.create(s, src, f)
      MT.enableRowTracking(s, src)
      graft.ops.LakeOps.maintainAggMartTotal(s, src, mart, "o_orderstatus", "o_totalprice")
      MT.deleteMor(s, src, col("o_custkey") % 5 === 0)
      val updates = f.filter(col("o_custkey") % 5 =!= 0)
        .filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(col("o_orderstatus") === "O"))
      MT.merge(s, src, updates, "o_orderkey")
      MT.compact(s, src, 64L * 1024 * 1024)
      val (tip, _) = graft.ops.LakeOps.maintainAggMartTotal(
        s, src, mart, "o_orderstatus", "o_totalprice")
      val vBefore = MT.versions(s, mart).max
      val replayNoop = graft.ops.LakeOps.maintainAggMartTotal(
        s, src, mart, "o_orderstatus", "o_totalprice") == ((tip, 0L)) &&
        MT.versions(s, mart).max == vBefore
      val maintained = MT.read(s, mart)
        .select(col("o_orderstatus"), col("n_rows"), col("total").cast("double"))
      val rebuild = MT.read(s, src).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("total"))
        .select(col("o_orderstatus"), col("n_rows"), col("total"))
      val matches = maintained.exceptAll(rebuild).isEmpty &&
        rebuild.exceptAll(maintained).isEmpty
      MT.read(s, mart)
        .select(lit(matches).as("matches_rebuild"),
          lit(replayNoop).as("replay_noop"),
          col("o_orderstatus"),
          col("n_rows").cast("long").as("n_orders"),
          col("total").cast("double").as("total_price"))
    }),

    "lake32_minmax_ivm" -> ((s, dir) => {
      // IVM past the self-maintainable aggregates: a (key, n, MIN, MAX)
      // mart maintained through the total change feed with the
      // PER-GROUP RECOMPUTE fallback — inserts and strictly-interior
      // deletes fold in O(delta) (bounds provably valid), and only a
      // delete TOUCHING a stored bound re-aggregates exactly its group
      // from the source (lake30's maintainer must full-rebuild here).
      // Pins: the insert window recomputes NOTHING, the bound-killing
      // delete window fires the recompute, a replay is a no-op, and
      // the mart equals the from-scratch min/max/count bit-exactly.
      val src = java.nio.file.Files.createTempDirectory("lake32_src").toString
      val mart = java.nio.file.Files.createTempDirectory("lake32_mart").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      MT.create(s, src, orders)
      graft.ops.LakeOps.maintainMinMaxMart(s, src, mart, "o_orderstatus", "o_totalprice")
      // window 1: inserts only — new maxes arrive via the fold
      MT.append(s, src, orders.filter(pmod(col("o_orderkey"), lit(9)) === 4)
        .withColumn("o_totalprice", col("o_totalprice") + 500000.0))
      val (_, _, r1) = graft.ops.LakeOps.maintainMinMaxMart(
        s, src, mart, "o_orderstatus", "o_totalprice")
      // window 2: delete every row above 400000 — each group's MAX dies
      MT.deleteMor(s, src, col("o_totalprice") > 400000.0)
      val (tip, _, r2) = graft.ops.LakeOps.maintainMinMaxMart(
        s, src, mart, "o_orderstatus", "o_totalprice")
      val vBefore = MT.versions(s, mart).max
      val replayNoop = graft.ops.LakeOps.maintainMinMaxMart(
        s, src, mart, "o_orderstatus", "o_totalprice") == ((tip, 0L, 0L)) &&
        MT.versions(s, mart).max == vBefore
      val maintained = MT.read(s, mart)
        .select(col("o_orderstatus"), col("n_rows"), col("vmin"), col("vmax"))
      val rebuild = MT.read(s, src).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_totalprice")).as("vmin"), max(col("o_totalprice")).as("vmax"))
      val matches = maintained.exceptAll(rebuild).isEmpty &&
        rebuild.exceptAll(maintained).isEmpty
      MT.read(s, mart)
        .select(lit(r1 == 0L).as("insert_fold"), lit(r2 > 0L).as("recompute_fired"),
          lit(replayNoop && matches).as("replay_noop_and_matches"),
          col("o_orderstatus"), col("n_rows").cast("long").as("n_orders"),
          col("vmin").as("min_price"), col("vmax").as("max_price"))
    }),

    "lake33_join_ivm_total" -> ((s, dir) => {
      // JOIN-mart IVM that SURVIVES non-append sources: the A ⋈ B mart
      // maintained through the TOTAL change feed across a window holding
      // an append, a MOR delete, and a MERGE upsert on fact A plus a MOR
      // delete on fact B — exactly where lake23's append-only delta-join
      // maintainer must full-refresh. The rule is the semi-join-
      // restricted recompute: affected join keys (either side, either
      // sign) retract and re-derive from the tips in ONE atomic
      // applyChangesMor commit carrying both cursors as txn keys (so an
      // OPTIMIZE on the mart can never lose the maintainer's position).
      // Pins: maintained mart == from-scratch join bit-exactly AND a
      // crash-replay maintenance call is a no-op.
      val a = java.nio.file.Files.createTempDirectory("lake33_a").toString
      val b = java.nio.file.Files.createTempDirectory("lake33_b").toString
      val mart = java.nio.file.Files.createTempDirectory("lake33_mart").toString
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val MT = graft.sources.ManifestTable
      MT.create(s, a, orders.filter(col("o_orderstatus") === "F"))
      MT.enableRowTracking(s, a) // the MERGE window needs row identity
      MT.create(s, b, customer)
      def maintain() = graft.ops.LakeOps.maintainJoinMartTotal(
        s, a, b, mart, "o_custkey", "c_custkey")
      maintain() // bootstrap at (v1, v1)
      MT.append(s, a, orders.filter(col("o_orderstatus") === "O"))
      MT.deleteMor(s, a, pmod(col("o_custkey"), lit(7)) === 0)
      val updates = orders.filter(col("o_orderstatus") === "F")
        .filter(pmod(col("o_custkey"), lit(7)) =!= 0 &&
          pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      MT.merge(s, a, updates, "o_orderkey")
      MT.deleteMor(s, b, col("c_mktsegment") === "BUILDING")
      val (ca, cb, _) = maintain()
      val vBefore = MT.versions(s, mart).max
      val replayNoop = maintain() == ((ca, cb, 0L)) &&
        MT.versions(s, mart).max == vBefore
      val scratch = MT.read(s, a)
        .join(MT.read(s, b), col("o_custkey") === col("c_custkey"))
      val m = MT.read(s, mart)
      val matches = m.exceptAll(scratch).isEmpty && scratch.exceptAll(m).isEmpty
      m.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("total_price"))
        .select(lit(matches).as("matches_rebuild"),
          lit(replayNoop).as("replay_noop"),
          col("c_mktsegment"), col("n_rows").cast("long").as("n_rows"),
          col("total_price"))
    }),

    "lake31_log_tiering" -> ((s, dir) => {
      // the TIERED manifest log (Delta checkpoints + delta actions;
      // Iceberg manifest-list → manifests): a snapshot per commit is
      // O(files·versions) storage — the first wall a streaming sink
      // committing every micro-batch hits. 14 commits land as a
      // create checkpoint + per-commit DELTAS with a forced full
      // snapshot at v10; pins: the stored forms (delta vs checkpoint),
      // the delta being a small fraction of the snapshot beside it,
      // TIME TRAVEL through the chain serving the exact v7 prefix, and
      // vacuum materializing the oldest retained delta before dropping
      // its chain. Face: the tip read grouped by status, replayed by
      // the oracle from raw orders.
      val root = java.nio.file.Files.createTempDirectory("lake31_log").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      def slice(i: Int) = orders.filter(pmod(col("o_orderkey"), lit(14)) === i)
      MT.create(s, root, slice(0).coalesce(1), statsColumns = Seq("o_orderkey"))
      (1 until 14).foreach(i =>
        MT.append(s, root, slice(i).coalesce(1), statsColumns = Seq("o_orderkey")))
      def head(v: Long) = {
        val p = java.nio.file.Paths.get(root, "_graft_log", f"v$v%08d.manifest")
        val src = scala.io.Source.fromFile(p.toFile)
        try src.getLines().next() finally src.close()
      }
      def bytes(v: Long) =
        java.nio.file.Paths.get(root, "_graft_log", f"v$v%08d.manifest").toFile.length()
      def isDelta(v: Long) = head(v).startsWith("# graft-manifest-delta ")
      val forms = !isDelta(1L) && !isDelta(10L) &&
        ((2L to 9L) ++ (11L to 14L)).forall(isDelta)
      val small = bytes(11L) < bytes(10L) / 3
      val ttV7 = MT.read(s, root, Some(7L)).count()
      MT.vacuum(s, root, keepVersions = 3)
      val ckptMaterialized = java.nio.file.Paths
        .get(root, "_graft_log", "v00000012.checkpoint").toFile.exists() &&
        MT.versions(s, root) == Seq(12L, 13L, 14L)
      MT.read(s, root).groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(forms).as("delta_forms"), lit(small).as("delta_small"),
          lit(ckptMaterialized).as("vacuum_checkpointed"),
          lit(ttV7).as("n_at_v7"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "lake34_segmented_log" -> ((s, dir) => {
      // the TWO-TIER full form (Iceberg's manifest-list shape): above a
      // file-count threshold, create/checkpoint snapshots store as
      // segment POINTERS — file entries (stats + per-file rowbase meta)
      // live in immutable segment files that an unchanged group carries
      // by pointer — and streaming appends never render a full body or
      // re-serialize a carried stats line (metered in-engine). Pins:
      // the create AND the v10 checkpoint store segmented; the
      // checkpoint carries the create's segments verbatim; ten appends
      // cost zero full renders and exactly ten stats-line
      // serializations; the vacuumed tip resolves COLD (all caches
      // dropped) through a segmented sidecar. Face: the tip read
      // grouped by status, replayed from raw orders.
      val root = java.nio.file.Files.createTempDirectory("lake34_seg").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val saved = MT.SegmentTargetSize
      MT.SegmentTargetSize = 8 // exercise segmentation without staging thousands of files
      try {
        def slice(i: Int) = orders.filter(pmod(col("o_orderkey"), lit(11)) === i)
        MT.create(s, root, slice(0).repartition(10), statsColumns = Seq("o_orderkey"))
        def raw(v: Long) = new String(
          java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(root, "_graft_log", f"v$v%08d.manifest")),
          java.nio.charset.StandardCharsets.UTF_8)
        def segNames(v: Long): Set[String] = raw(v).linesIterator.collect {
          case l if l.startsWith("# seg:") => l.stripPrefix("# seg:").split('|')(0)
        }.toSet
        val createSegmented = raw(1L).linesIterator.next().contains(" segs=1")
        val (f0, s0) = MT.ComposeMeters.snapshot
        (1 until 11).foreach(i =>
          MT.append(s, root, slice(i).coalesce(1), statsColumns = Seq("o_orderkey")))
        val (f1, s1) = MT.ComposeMeters.snapshot
        val zeroFullRenders = (f1 - f0) == 0L
        val serializeAddsOnly = (s1 - s0) == 10L
        val checkpointCarries = raw(10L).linesIterator.next().contains(" segs=1") &&
          segNames(1L).subsetOf(segNames(10L))
        MT.vacuum(s, root, keepVersions = 1)
        MT.dropResolvedCacheForTest() // cold process: sidecar + segments only
        MT.read(s, root).groupBy("o_orderstatus")
          .agg(count(lit(1)).cast("long").as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"))
          .select(lit(createSegmented).as("create_segmented"),
            lit(zeroFullRenders).as("appends_zero_full_renders"),
            lit(serializeAddsOnly).as("appends_serialize_adds_only"),
            lit(checkpointCarries).as("checkpoint_carries_segments"),
            col("o_orderstatus"), col("n_orders"), col("total_price"))
          .localCheckpoint() // pin before the threshold restores below
      } finally MT.SegmentTargetSize = saved
    }),

    "lake35_two_tier_pruning" -> ((s, dir) => {
      // manifest-LEVEL pruning (the Iceberg manifest-list idea): every
      // sealed segment's pointer line carries a rollup of its members'
      // stats, and pruneFiles excludes whole segments in O(columns)
      // before any per-file work. Build: 12 single-file commits with
      // disjoint contiguous o_orderkey ranges; the v10 checkpoint seals
      // files 0..9 into segments of 8 and 2; files 10..11 ride as the
      // delta tail. A probe at file 8's lower bound must (a) exclude
      // the 8-member segment at the SEGMENT tier (zero per-file
      // evaluations inside it), (b) evaluate exactly the 2-member
      // segment + 2 tail files, (c) keep exactly the covering file.
      // The meter deltas ride the face as literals the oracle pins.
      val root = java.nio.file.Files.createTempDirectory("lake35_prune").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val saved = MT.SegmentTargetSize
      MT.SegmentTargetSize = 8
      try {
        val keys = orders.select("o_orderkey").distinct().orderBy("o_orderkey")
          .collect().map(_.getLong(0))
        def slice(i: Int) = {
          val lo = keys(i * keys.length / 12)
          val hiIdx = (i + 1) * keys.length / 12
          val hi = if (hiIdx >= keys.length) Long.MaxValue else keys(hiIdx)
          orders.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi).coalesce(1)
        }
        MT.create(s, root, slice(0), statsColumns = Seq("o_orderkey"))
        (1 until 12).foreach(i =>
          MT.append(s, root, slice(i), statsColumns = Seq("o_orderkey")))
        val probe = keys(8 * keys.length / 12)
        val before = graft.sources.ManifestStats.PruneMeters.snapshot
        val (kept, _, _) = MT.pruneFiles(s, root, col("o_orderkey") === probe)
        val after = graft.sources.ManifestStats.PruneMeters.snapshot
        MT.readPruned(s, root, col("o_orderkey") === probe)
          .select(lit(after._1 - before._1).as("files_evaluated"),
            lit(after._2 - before._2).as("segments_excluded"),
            lit(kept.size.toLong).as("files_kept"),
            col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("double").as("o_totalprice"))
          .localCheckpoint() // pin before the threshold restores below
      } finally MT.SegmentTargetSize = saved
    }),

    "lake37_cold_pruned_read" -> ((s, dir) => {
      // the LAZY half of the two-tier layout: a COLD process (every
      // cache dropped) planning a point probe resolves from the pointer
      // body + delta chain and loads ONLY the segments whose rollup
      // admits the predicate. Same 12-range build as lake35: the
      // mid-range probe must load exactly ONE segment file (the
      // 8-member segment is excluded by its pointer rollup, the tail
      // files carry their stats in the deltas); a tail-range probe
      // loads ZERO. Both load counts ride the face as literals; the
      // rows are the probed orders, re-derived by rank arithmetic.
      val root = java.nio.file.Files.createTempDirectory("lake37_cold").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val saved = MT.SegmentTargetSize
      MT.SegmentTargetSize = 8
      try {
        val keys = orders.select("o_orderkey").distinct().orderBy("o_orderkey")
          .collect().map(_.getLong(0))
        def slice(i: Int) = {
          val lo = keys(i * keys.length / 12)
          val hiIdx = (i + 1) * keys.length / 12
          val hi = if (hiIdx >= keys.length) Long.MaxValue else keys(hiIdx)
          orders.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi).coalesce(1)
        }
        MT.create(s, root, slice(0), statsColumns = Seq("o_orderkey"))
        (1 until 12).foreach(i =>
          MT.append(s, root, slice(i), statsColumns = Seq("o_orderkey")))
        val probe = keys(8 * keys.length / 12)
        val tailKey = keys(11 * keys.length / 12)
        MT.dropResolvedCacheForTest() // fresh process
        val b1 = MT.ComposeMeters.segmentLoads.get
        val mid = MT.readPruned(s, root, col("o_orderkey") === probe).localCheckpoint()
        val loadsMid = MT.ComposeMeters.segmentLoads.get - b1
        MT.dropResolvedCacheForTest()
        val b2 = MT.ComposeMeters.segmentLoads.get
        val tl = MT.readPruned(s, root, col("o_orderkey") === tailKey).localCheckpoint()
        val loadsTail = MT.ComposeMeters.segmentLoads.get - b2
        mid.unionByName(tl)
          .select(lit(loadsMid).as("segment_loads_mid"),
            lit(loadsTail).as("segment_loads_tail"),
            col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("double").as("o_totalprice"))
          .localCheckpoint() // pin before the threshold restores below
      } finally MT.SegmentTargetSize = saved
    }),

    "lake38_prune_sidecar" -> ((s, dir) => {
      // the PERSISTED prune index: the first cold pruned probe decodes
      // the pointer body + delta chain ONCE and writes the `.pruneidx`
      // sidecar beside the checkpoint; a second cold process (every
      // cache dropped) plans the same probe from that one pre-digested
      // read — ZERO pointer decodes. Both decode counts ride the face
      // as literals; the rows are the mid-range probe, re-derived by
      // the lake37 rank arithmetic.
      val root = java.nio.file.Files.createTempDirectory("lake38_sidecar").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val saved = MT.SegmentTargetSize
      MT.SegmentTargetSize = 8
      try {
        val keys = orders.select("o_orderkey").distinct().orderBy("o_orderkey")
          .collect().map(_.getLong(0))
        def slice(i: Int) = {
          val lo = keys(i * keys.length / 12)
          val hiIdx = (i + 1) * keys.length / 12
          val hi = if (hiIdx >= keys.length) Long.MaxValue else keys(hiIdx)
          orders.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi).coalesce(1)
        }
        MT.create(s, root, slice(0), statsColumns = Seq("o_orderkey"))
        (1 until 12).foreach(i =>
          MT.append(s, root, slice(i), statsColumns = Seq("o_orderkey")))
        val probe = keys(8 * keys.length / 12)
        MT.dropResolvedCacheForTest() // fresh process #1
        val b1 = MT.ComposeMeters.coldPointerDecodes.get
        val first = MT.readPruned(s, root, col("o_orderkey") === probe).localCheckpoint()
        val decodesFirst = MT.ComposeMeters.coldPointerDecodes.get - b1
        MT.dropResolvedCacheForTest() // fresh process #2: sidecar hit
        val b2 = MT.ComposeMeters.coldPointerDecodes.get
        val second = MT.readPruned(s, root, col("o_orderkey") === probe).localCheckpoint()
        val decodesSecond = MT.ComposeMeters.coldPointerDecodes.get - b2
        val same = second.exceptAll(first).isEmpty && first.exceptAll(second).isEmpty
        first
          .select(lit(decodesFirst).as("pointer_decodes_first"),
            lit(decodesSecond).as("pointer_decodes_second"),
            lit(same).as("sidecar_plan_identical"),
            col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("double").as("o_totalprice"))
          .localCheckpoint() // pin before the threshold restores below
      } finally MT.SegmentTargetSize = saved
    }),

    "lake39_tip_watermark" -> ((s, dir) => {
      // O(1) maintainer cursor discovery: txn-* watermarks carry to the
      // TIP with max semantics through every commit, so one maintenance
      // window reads ONE meta regardless of how deep the mart's history
      // is. Drive the incrementally-maintained contamination sketch
      // through 7 windows; the manifestMeta-call delta of a window at
      // depth ~2 must EQUAL the delta at depth ~7 (an O(versions) scan
      // would grow it by ~5 reads per mart). Flatness and the absolute
      // bound ride the face as in-engine booleans; the content is the
      // probe corpus grouped per window slice, re-derived relationally.
      val pRoot = java.nio.file.Files.createTempDirectory("lake39_probes").toString
      val sRoot = java.nio.file.Files.createTempDirectory("lake39_sketch").toString
      val MT = graft.sources.ManifestTable
      val probes = t(s, dir, "documents")
        .filter(col("doc_id") < 200 && length(col("text")) >= 20)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 20).as("probe"))
        .localCheckpoint()
      def slice(i: Int) = probes.filter(pmod(col("probe_id"), lit(8)) === i)
      MT.create(s, pRoot, slice(0))
      graft.ops.LakeOps.maintainContaminationSketch(s, pRoot, sRoot, "probe")
      def windowCost(i: Int): Long = {
        MT.append(s, pRoot, slice(i))
        val before = MT.ComposeMeters.metaReads.get
        graft.ops.LakeOps.maintainContaminationSketch(s, pRoot, sRoot, "probe")
        MT.ComposeMeters.metaReads.get - before
      }
      val shallow = windowCost(1)
      (2 to 6).foreach(windowCost)
      val deep = windowCost(7)
      probes.groupBy(pmod(col("probe_id"), lit(8)).as("window_slice"))
        .agg(count(lit(1)).cast("long").as("n_probes"),
          min(col("probe_id")).as("first_probe"))
        .select(lit(deep <= shallow).as("tip_watermark_flat"),
          lit(shallow <= 16L).as("window_reads_bounded"),
          col("window_slice"), col("n_probes"), col("first_probe"))
    }),

    "lake36_checkpoint_ledger" -> ((s, dir) => {
      // the segment DIRTINESS ledger: between checkpoints the writer
      // tracks which segments deltas touched, so an appends-only
      // checkpoint carries every clean segment by name and walks ONLY
      // the appended tail — O(touched + segments) member visits, never
      // O(files). Build: 20 single-file pmod slices; the v20 checkpoint
      // (files 1..10 sealed at v10, 10 tail files since) must visit
      // exactly 10 member entries. The visit count rides the face as a
      // literal; the content is re-derived relationally after a COLD
      // resolve (all caches dropped).
      val root = java.nio.file.Files.createTempDirectory("lake36_ledger").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      val saved = MT.SegmentTargetSize
      MT.SegmentTargetSize = 8
      try {
        def slice(i: Int) = orders.filter(pmod(col("o_orderkey"), lit(20)) === i).coalesce(1)
        MT.create(s, root, slice(0), statsColumns = Seq("o_orderkey"))
        (1 until 19).foreach(i =>
          MT.append(s, root, slice(i), statsColumns = Seq("o_orderkey")))
        val before = MT.ComposeMeters.memberVisits.get
        MT.append(s, root, slice(19), statsColumns = Seq("o_orderkey")) // v20 checkpoint
        val visits = MT.ComposeMeters.memberVisits.get - before
        MT.dropResolvedCacheForTest() // cold: pointer body + segments only
        MT.read(s, root).groupBy("o_orderstatus")
          .agg(count(lit(1)).cast("long").as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"))
          .select(lit(visits).as("checkpoint_member_visits"),
            col("o_orderstatus"), col("n_orders"), col("total_price"))
          .localCheckpoint() // pin before the threshold restores below
      } finally MT.SegmentTargetSize = saved
    }),

    "lake28_row_tracking" -> ((s, dir) => {
      // row tracking (Delta row tracking / Iceberg v3 row lineage):
      // every row carries an immutable table-unique id — fresh files as
      // base + row_index (zero storage), rewrites via a materialized
      // invisible column. The key drives the full lifecycle — enable,
      // append, compact, MOR delete, purge, zorder — and pins that ids
      // stay unique AND that every id-preserving rewrite kept the exact
      // (row, id) pairs; the face is the surviving content, which the
      // oracle computes relationally.
      val root = java.nio.file.Files.createTempDirectory("lake28_rt").toString
      val orders = t(s, dir, "orders")
      val MT = graft.sources.ManifestTable
      MT.create(s, root, orders.filter(col("o_orderstatus") =!= "O").repartition(3))
      MT.enableRowTracking(s, root)
      MT.append(s, root, orders.filter(col("o_orderstatus") === "O"))
      def pairs() = MT.readWithRowIds(s, root)
        .select(col("o_orderkey"), col("_row_id"))
      val before = pairs().localCheckpoint()
      MT.compact(s, root, 64L * 1024 * 1024)
      val afterCompact = pairs().localCheckpoint()
      MT.deleteMor(s, root, col("o_orderkey") % 3 === 0)
      MT.purgeDeletes(s, root)
      MT.optimizeZOrder(s, root, Seq("o_custkey"), 64L * 1024 * 1024)
      val after = pairs().localCheckpoint()
      val preserved =
        afterCompact.exceptAll(before).isEmpty && before.exceptAll(afterCompact).isEmpty &&
          after.exceptAll(before.filter(col("o_orderkey") % 3 =!= 0)).isEmpty &&
          before.filter(col("o_orderkey") % 3 =!= 0).exceptAll(after).isEmpty
      val withIds = MT.readWithRowIds(s, root)
      val unique = withIds.select(countDistinct(col("_row_id"))).first().getLong(0) ==
        withIds.count()
      MT.read(s, root).groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(preserved).as("ids_preserved"), lit(unique).as("ids_unique"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "lake26_multi_txn" -> ((s, dir) => {
      // multi-table TRANSACTIONS (catalog-commit): a fact table and its
      // summary mart advance ATOMICALLY — each transact appends a batch
      // to fact AND overwrites mart with the matching aggregate, so at
      // EVERY catalog version mart == agg(fact) exactly. The key reads
      // both tables at every catalog cut and pins mutual consistency
      // (all_cuts_consistent) plus that a staged-only orphan txn stayed
      // invisible; the final mart must equal the oracle's aggregate of
      // all three batches.
      val cat = java.nio.file.Files.createTempDirectory("lake26_cat").toString
      val factRoot = s"$cat/fact"; val martRoot = s"$cat/mart"
      val orders = t(s, dir, "orders")
      def martOf(f: DataFrame) = f.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
      graft.sources.ManifestTable.create(s, factRoot,
        orders.filter(col("o_orderkey") % 3 === 0))
      graft.sources.ManifestTable.create(s, martRoot,
        martOf(orders.filter(col("o_orderkey") % 3 === 0)))
      graft.sources.ManifestCatalog.create(s, cat,
        Seq("fact" -> factRoot, "mart" -> martRoot))
      val after1 = orders.filter(col("o_orderkey") % 3 <= 1)
      graft.sources.ManifestCatalog.transact(s, cat, Seq(
        graft.sources.ManifestCatalog.AppendOp("fact",
          orders.filter(col("o_orderkey") % 3 === 1)),
        graft.sources.ManifestCatalog.OverwriteOp("mart", martOf(after1))))
      graft.sources.ManifestCatalog.transact(s, cat, Seq(
        graft.sources.ManifestCatalog.AppendOp("fact",
          orders.filter(col("o_orderkey") % 3 === 2)),
        graft.sources.ManifestCatalog.OverwriteOp("mart", martOf(orders))))
      // mart == agg(fact) at EVERY catalog cut — the atomicity witness
      val allCuts = graft.sources.ManifestCatalog.versions(s, cat).forall { v =>
        val f = graft.sources.ManifestCatalog.read(s, cat, "fact", Some(v))
        val m = graft.sources.ManifestCatalog.read(s, cat, "mart", Some(v))
        val r = martOf(f)
        m.exceptAll(r).isEmpty && r.exceptAll(m).isEmpty
      }
      graft.sources.ManifestCatalog.read(s, cat, "mart")
        .select(lit(allCuts).as("all_cuts_consistent"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "lake25_generated" -> ((s, dir) => {
      // generated columns (GENERATED ALWAYS AS): o_year is declared
      // generated from year(o_orderdate) after create; a batch that
      // OMITS the column gets it computed by the engine (b1), a batch
      // that PROVIDES it is validated (b2), and a batch with wrong
      // values is REFUSED atomically — nothing lands (violation_refused
      // pins both the refusal and that the count stayed put). The final
      // per-year aggregate must equal the oracle computing the same
      // expression itself, proving engine-computed == declared.
      val root = java.nio.file.Files.createTempDirectory("lake25_gen").toString
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root,
        orders.withColumn("o_year", year(col("o_orderdate"))))
      graft.sources.ManifestTable.addGeneratedColumn(s, root,
        "o_year", "year(o_orderdate)")
      graft.sources.ManifestTable.append(s, root,
        orders.filter(col("o_orderkey") % 10 === 3)
          .withColumn("o_orderkey", col("o_orderkey") + 1000000000L)) // o_year omitted
      graft.sources.ManifestTable.append(s, root,
        orders.filter(col("o_orderkey") % 10 === 4)
          .withColumn("o_orderkey", col("o_orderkey") + 2000000000L)
          .withColumn("o_year", year(col("o_orderdate")))) // provided, validated
      val before = graft.sources.ManifestTable.read(s, root).count()
      val refused =
        try {
          graft.sources.ManifestTable.append(s, root,
            orders.limit(5).withColumn("o_year", lit(1900)))
          false
        } catch { case _: IllegalArgumentException => true }
      val intact = graft.sources.ManifestTable.read(s, root).count() == before
      graft.sources.ManifestTable.read(s, root)
        .groupBy("o_year")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(refused && intact).as("violation_refused"),
          col("o_year"), col("n_orders"), col("total_price"))
    }),

    "lake24_delete_mor" -> ((s, dir) => {
      // merge-on-read DELETE (deletion vectors — Delta DV / Iceberg v2
      // positional deletes): two stacked MOR deletes commit ZERO data
      // files (zero_new_files pins it — at 100 TB that's a sidecar
      // write instead of a multi-file COW rewrite), an append lands
      // after them, then purgeDeletes materializes the vector. The
      // SAME aggregate is taken before the purge (broadcast-anti-join
      // scan path) and after (pure-files path) — both phases must
      // match the oracle's NOT(pred IS TRUE) replay, proving the two
      // read paths agree exactly.
      val root = java.nio.file.Files.createTempDirectory("lake24_mor").toString
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root,
        orders.repartitionByRange(8, col("o_orderkey")),
        statsColumns = Seq("o_orderkey"))
      val (_, st1) = graft.sources.ManifestTable.deleteMor(s, root,
        col("o_orderkey") % 7 === 0)
      val (_, st2) = graft.sources.ManifestTable.deleteMor(s, root,
        col("o_orderstatus") === "P" && col("o_orderkey") % 2 === 1)
      graft.sources.ManifestTable.append(s, root,
        orders.filter(col("o_orderkey") % 100 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 1000000000L),
        statsColumns = Seq("o_orderkey"))
      def agg(phase: String) = graft.sources.ManifestTable.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .withColumn("phase", lit(phase))
      val mor = agg("mor")
      val (pv, _) = graft.sources.ManifestTable.purgeDeletes(s, root,
        statsColumns = Seq("o_orderkey"))
      val purgedClean =
        graft.sources.ManifestTable.deletionVector(s, root, pv).isEmpty
      mor.unionByName(agg("purged"))
        .select(lit(st1.newFiles == 0 && st2.newFiles == 0).as("zero_new_files"),
          lit(purgedClean).as("purged_clean"), col("phase"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "lake23_incr_join" -> ((s, dir) => {
      // incremental JOIN view maintenance — the delta-join identity
      // Δ(A⋈B) = dA⋈B_new ∪ A_prev⋈dB over two append-only sources,
      // cursors for BOTH riding each mart commit. Boot on (F orders ×
      // even customers), then three maintenance passes: an A-side
      // append, a B-side append, another A-side append, and a caught-up
      // no-op — every pass's delta row count is a literal mirror the
      // oracle re-derives, so a rescan or double-apply breaks the hash;
      // the final mart must equal the from-scratch join exactly.
      val aRoot = java.nio.file.Files.createTempDirectory("lake23_a").toString
      val bRoot = java.nio.file.Files.createTempDirectory("lake23_b").toString
      val mRoot = java.nio.file.Files.createTempDirectory("lake23_m").toString
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      graft.sources.ManifestTable.create(s, aRoot,
        orders.filter(col("o_orderstatus") === "F"))
      graft.sources.ManifestTable.create(s, bRoot,
        cust.filter(col("c_custkey") % 2 === 0))
      val (_, _, boot) = LakeOps.maintainJoinMart(s, aRoot, bRoot, mRoot,
        "o_custkey", "c_custkey")
      graft.sources.ManifestTable.append(s, aRoot,
        orders.filter(col("o_orderstatus") === "O"))
      val (_, _, d1) = LakeOps.maintainJoinMart(s, aRoot, bRoot, mRoot,
        "o_custkey", "c_custkey")
      graft.sources.ManifestTable.append(s, bRoot,
        cust.filter(col("c_custkey") % 2 === 1))
      val (_, _, d2) = LakeOps.maintainJoinMart(s, aRoot, bRoot, mRoot,
        "o_custkey", "c_custkey")
      graft.sources.ManifestTable.append(s, aRoot,
        orders.filter(col("o_orderstatus") === "P"))
      val (_, _, d3) = LakeOps.maintainJoinMart(s, aRoot, bRoot, mRoot,
        "o_custkey", "c_custkey")
      val (_, _, d4) = LakeOps.maintainJoinMart(s, aRoot, bRoot, mRoot,
        "o_custkey", "c_custkey")
      graft.sources.ManifestTable.read(s, mRoot)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(boot).as("boot_rows"), lit(d1).as("step1_rows"),
          lit(d2).as("step2_rows"), lit(d3).as("step3_rows"),
          lit(d4).as("noop_rows"), col("c_mktsegment"),
          col("n_rows"), col("total_price"))
    }),

    "lake22_forget" -> ((s, dir) => {
      // the compliance delete (right-to-be-forgotten): COW-delete one
      // customer's orders, vacuum to retention 1, then PROVE erasure by
      // scanning every byte still on disk OUTSIDE the table protocol —
      // raw parquet over the surviving files must hold zero rows for
      // the subject (pinned), time travel to the pre-delete version
      // must be GONE (pinned; a kept old manifest would be a
      // compliance hole), and the surviving table is exact.
      val root = java.nio.file.Files.createTempDirectory("lake22_forget").toString
      val orders = t(s, dir, "orders")
      val subject = orders.agg(min(col("o_custkey"))).head().getLong(0)
      graft.sources.ManifestTable.create(s, root,
        orders.repartitionByRange(4, col("o_custkey")),
        statsColumns = Seq("o_custkey"))
      graft.sources.ManifestTable.delete(s, root,
        col("o_custkey") === subject, statsColumns = Seq("o_custkey"))
      graft.sources.ManifestTable.vacuum(s, root, keepVersions = 1)
      val historyGone =
        graft.sources.ManifestTable.versions(s, root) == Seq(2L)
      // the erasure proof reads the data directory RAW — no manifest,
      // no pruning, every surviving byte
      val survivors = graft.sources.ManifestTable.manifestFiles(s, root, 2L)
        .map(p => s"$root/$p")
      val physicallyGone = s.read.parquet(survivors: _*)
        .filter(col("o_custkey") === subject).isEmpty
      graft.sources.ManifestTable.read(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(historyGone).as("history_gone"),
          lit(physicallyGone).as("physically_gone"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "lake21_time_travel_ts" -> ((s, dir) => {
      // TIMESTAMP AS OF: even orders at v1, odd appended at v2 with its
      // commit time pinned 10 s later (deterministic boundary whatever
      // the wall clock did), then the v1-time read must resolve to v1
      // (pinned) and serve EXACTLY the pre-append content — the face is
      // the as-of aggregate, which the oracle re-derives from the even
      // half alone.
      val root = java.nio.file.Files.createTempDirectory("lake21_asof").toString
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root,
        orders.filter(col("o_orderkey") % 2 === 0))
      graft.sources.ManifestTable.append(s, root,
        orders.filter(col("o_orderkey") % 2 === 1))
      val hfs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def mpath(v: Long) = new org.apache.hadoop.fs.Path(
        s"$root/_graft_log/" + f"v$v%08d" + ".manifest")
      val t1 = hfs.getFileStatus(mpath(1L)).getModificationTime
      hfs.setTimes(mpath(2L), t1 + 10000, -1)
      val resolvedFirst =
        graft.sources.ManifestTable.versionAsOf(s, root, t1 + 9999) == 1L &&
          graft.sources.ManifestTable.versionAsOf(s, root, t1 + 10000) == 2L
      graft.sources.ManifestTable.readAsOf(s, root, t1)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(resolvedFirst).as("resolved_boundary"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "lake20_spec_evolution" -> ((s, dir) => {
      // partition-spec evolution: even orders clustered by
      // bucket(16, o_orderkey), then ADD PARTITION FIELD
      // bucket(8, o_custkey) as one metadata commit (pinned), then the
      // odd orders append clustered on the new dimension. A custkey
      // point probe prunes NEW files while every pre-evolution file is
      // keep-biased (pinned); an orderkey probe still prunes OLD files
      // through the original transform (pinned). Content unchanged.
      val root = java.nio.file.Files.createTempDirectory("lake20_evolve")
      val orders = t(s, dir, "orders")
      graft.sources.ManifestTable.create(s, root.toString,
        orders.filter(col("o_orderkey") % 2 === 0),
        statsColumns = Seq("o_orderkey"))
      graft.sources.ManifestTable.optimizeClusterBy(s, root.toString,
        graft.sources.BucketTransform(16, "o_orderkey"),
        targetFileBytes =
          math.max(1L, graft.sources.ManifestTable.tableBytes(s, root.toString) / 8),
        statsColumns = Seq("o_orderkey"))
      val filesBefore = graft.sources.ManifestTable.manifestFiles(s, root.toString,
        graft.sources.ManifestTable.versions(s, root.toString).max)
      val v = graft.sources.ManifestTable.evolvePartitionSpec(s, root.toString,
        graft.sources.BucketTransform(8, "o_custkey"))
      val metadataOnly =
        graft.sources.ManifestTable.manifestFiles(s, root.toString, v) == filesBefore
      graft.sources.ManifestTable.append(s, root.toString,
        orders.filter(col("o_orderkey") % 2 === 1)
          .repartitionByRange(8, pmod(xxhash64(col("o_custkey")), lit(8L))),
        statsColumns = Seq("o_orderkey"))
      val probeCust = orders.agg(min(col("o_custkey"))).head().getLong(0)
      val (_, drCust, _) = graft.sources.ManifestTable.pruneFiles(
        s, root.toString, col("o_custkey") === probeCust)
      val newPrunes = drCust.nonEmpty
      val oldKept = filesBefore.forall(f => !drCust.contains(f))
      val (_, drKey, _) = graft.sources.ManifestTable.pruneFiles(
        s, root.toString, col("o_orderkey") === 16L)
      val oldStillPrunes = drKey.exists(filesBefore.contains)
      graft.sources.ManifestTable.read(s, root.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .select(lit(metadataOnly).as("evolve_metadata_only"),
          lit(newPrunes).as("new_files_prune"),
          lit(oldKept).as("old_files_keep_biased"),
          lit(oldStillPrunes).as("old_transform_prunes"),
          col("o_orderstatus"), col("n_orders"), col("total_price"))
    }),

    "rpt2_source_quality" -> ((s, dir) => {
      // the curation view: per-source Gopher/C4 gate pass rates — the
      // SAME composed gate pipe2 filters with, rolled up by source so
      // "which domains are rotten" is answerable before dropping docs
      graft.functions.NativeExpressions.register(s)
      TextOps.qualityReport(t(s, dir, "documents"), "source", "text")
    }),

    "rpt1_corpus_card" -> ((s, dir) => {
      // the corpus datasheet in ONE pass + three 1-row side aggregates
      // (token stats from the exploded stream; distinct-text and
      // per-column cardinalities; exact median via the dyadic 0.5
      // percentile on integer token counts): the summary every corpus
      // release publishes, integer-exact or exactly-rounded throughout
      val docs = t(s, dir, "documents")
      val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      val tokStats = toks.agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("vocab_size"))
      val lens = docs.select(size(split(col("text"), " ")).cast("long").as("n"))
      val lenStats = lens.agg(
        round(avg(col("n")), 4).as("mean_tokens"),
        expr("percentile(n, 0.5)").as("p50_tokens"),
        max(col("n")).as("max_tokens"))
      val docStats = docs.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
      docStats.crossJoin(broadcast(tokStats)).crossJoin(broadcast(lenStats))
        .select(col("n_docs"), col("n_distinct_texts"), col("n_langs"),
          col("n_sources"),
          round(col("n_en").cast("double") / col("n_docs"), 4).as("en_share"),
          col("n_tokens"), col("vocab_size"),
          col("mean_tokens"), col("p50_tokens"), col("max_tokens"))
    }),

    "cls1_nb_confusion" -> ((s, dir) =>
      // in-engine multinomial Naive Bayes: trained on the labeled lang
      // column and applied back to the corpus in one relational
      // pipeline; the confusion matrix is the hash-checked face. The
      // oracle replays training (all integer counts), the smoothed
      // per-token log terms (round-6 decimal sums), and the argmax.
      ClassifyOps.naiveBayesConfusion(t(s, dir, "documents"), "doc_id", "lang", "text")),

    "txt16_bpe_learn" -> ((s, dir) =>
      // tokenizer TRAINING (Sennrich et al. BPE): 8 merge rounds learned
      // from the corpus word counts. The separator-wrapped-string
      // representation makes each round's merge a plain replace() —
      // left-to-right non-overlapping in both engines, which IS BPE's
      // greedy semantics — so the oracle replays all 8 rounds exactly
      TextOps.bpeLearnMerges(t(s, dir, "documents"), "text", numMerges = 8)),

    "txt17_bpe_segment" -> ((s, dir) =>
      // the trained tokenizer's OUTPUT: every vocabulary word with its
      // subword segmentation after the 8 learned merges (the apply half
      // of txt16's train half). Same replayed-round oracle, read at the
      // final vocab state
      TextOps.bpeSegment(t(s, dir, "documents"), "text", numMerges = 8)),

    "txt18_wordpiece_learn" -> ((s, dir) =>
      // WordPiece training (the BERT tokenizer's trainer): BPE's greedy
      // loop with LIKELIHOOD scoring — freq·10^12 div (count(l)·count(r))
      // in exact fixed-point, so a rare-but-exclusive pair beats a
      // frequent pair of common symbols. The oracle replays all 8
      // rounds including both count tables and the integer score.
      TextOps.wordpieceLearnMerges(t(s, dir, "documents"), "text", numMerges = 8)),

    "txt20_unigram_learn" -> ((s, dir) =>
      // unigram-LM (SentencePiece-style) tokenizer training, hard-EM:
      // substring-seeded vocabulary, per-word Viterbi segmentation
      // under integer fixed-point costs (enc = cost·32 + backpointer,
      // min = exact tie-break), recount + char-floor + top-K prune per
      // round. The oracle replays both EM rounds including every DP
      // frontier as chained CTEs.
      TextOps.unigramLearn(t(s, dir, "documents"), "text")),

    "txt21_unigram_segment" -> ((s, dir) =>
      // the trained unigram tokenizer APPLIED: one more Viterbi E-step
      // under the final vocab segments every corpus word (bpeSegment's
      // face: word, occurrences, dot-joined pieces) — what a pipeline
      // actually ships to tokenize with.
      TextOps.unigramSegment(t(s, dir, "documents"), "text")),

    "txt22_kneser_ney" -> ((s, dir) =>
      // interpolated Kneser-Ney trigram scoring (Chen & Goodman 1999)
      // — the KenLM-class quality signal: absolute discount 0.75
      // (exact in binary), continuation counts at the lower orders,
      // add-one floor on the continuation unigram so OOV stays finite.
      // Model from the train split, holdout scored; the probability
      // expressions are the SAME SQL text in both engines.
      TextOps.kneserNeyScores(t(s, dir, "documents"), "doc_id", "text")),

    "txt15_lm_nll" -> ((s, dir) =>
      // CCNet-style LM quality signal, self-trained: corpus bigram model
      // with add-one smoothing, per-doc total negative log-likelihood.
      // Terms are rounded to 6dp and summed in DECIMAL (ExactSums
      // pattern) so the reduce is order-independent; the oracle replays
      // model training AND scoring from the same corpus
      TextOps.bigramLmScores(t(s, dir, "documents"), "doc_id", "text")),

    "txt19_trigram_backoff" -> ((s, dir) =>
      // trigram LM with stupid backoff (Brants et al. 2007): model
      // counted from the Knuth-hash TRAIN split, holdout docs scored —
      // unseen trigrams genuinely back off through bigram to add-one
      // unigram, α=0.4 with a pinned expression tree. 6dp-rounded terms
      // summed as exact DECIMAL; the oracle replays split, counts, and
      // the full backoff CASE.
      TextOps.trigramBackoffScores(t(s, dir, "documents"), "doc_id", "text")),

    "smp1_hash_split" -> ((s, dir) =>
      // deterministic train/holdout assignment; aggregated so the split
      // FRACTIONS are what the oracle checks (the per-row assignment is a
      // pure projection replayed identically by the SQL)
      SampleOps.hashSplit(t(s, dir, "documents"), "doc_id", 80)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("bigint").as("total_chars"))),

    "smp2_per_group_cap" -> ((s, dir) =>
      // corpus balancing: at most 15 docs per source, deterministic
      // (smallest id-hash wins) — the heap-aggregate path answers to the
      // oracle's row_number() formulation
      SampleOps.perGroupCap(t(s, dir, "documents"), Seq("source"), "doc_id", 15)
        .select("source", "doc_id")),

    "ctm1_contamination" -> ((s, dir) => {
      // benchmark-contamination screen: which corpus docs contain any
      // probe string (here: 20-char prefixes of a 50-doc probe set).
      // The probe set broadcasts (bounded by construction — eval suites
      // are small); the scan side stays narrow; contains() is codegen'd.
      // This broadcast nested-loop shape is the exact-match BASELINE;
      // ctm2_bloom_screen is the production path — probe n-grams in a
      // Bloom filter, per-row cost independent of |probes|
      val docs = t(s, dir, "documents")
      val probes = docs.filter(col("doc_id") < 50)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 20).as("probe"))
      docs.join(broadcast(probes),
          col("text").contains(col("probe")) && col("doc_id") =!= col("probe_id"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_probe_hits"), min("probe_id").as("first_probe"))
    }),

    "ctm2_bloom_screen" -> ((s, dir) => {
      // the Bloom upgrade ctm1's comment promises: probe 20-grams go into
      // a Bloom filter built by a distributed aggregate; the corpus is
      // prefiltered by an O(len) sliding-window membership test that does
      // not scale with |probes|; exact contains() verification on the few
      // candidates kills false positives — same deterministic answer as
      // the exact formulation, same oracle shape. Probes are fixed-length
      // (length(text) >= 20 guard), the real decontamination contract.
      val docs = t(s, dir, "documents")
      val probes = docs.filter(col("doc_id") < 50 && length(col("text")) >= 20)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 20).as("probe"))
      ContaminationOps.bloomScreen(docs, "doc_id", "text",
        probes, "probe_id", "probe", probeLen = 20)
    }),

    "ctm3_incremental_screen" -> ((s, dir) => {
      // the INCREMENTALLY-MAINTAINED decontamination screen: the eval
      // suite is an append-only manifest table; each window ORs the
      // batch's Bloom words into a single-row sketch mart in
      // O(batch + registers) — never re-sketching the whole benchmark
      // set — with the consumed-version cursor riding the same atomic
      // commit. Pins: after three windows the stored words are
      // BITWISE-identical to the from-scratch filter (the OR-fold is
      // associative/commutative/idempotent); a replay call is a no-op;
      // the screen itself (prefilter + exact verify join at the
      // cursor's probe snapshot) equals ctm2's exact answer, which is
      // how the oracle replays it.
      val docs = t(s, dir, "documents")
      val probes = docs.filter(col("doc_id") < 50 && length(col("text")) >= 20)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 20).as("probe"))
      val pRoot = java.nio.file.Files.createTempDirectory("ctm3_probes").toString
      val sRoot = java.nio.file.Files.createTempDirectory("ctm3_sketch").toString
      val MT = graft.sources.ManifestTable
      def slice(i: Int) = probes.filter(pmod(col("probe_id"), lit(3)) === i)
      def maintain() = graft.ops.LakeOps.maintainContaminationSketch(
        s, pRoot, sRoot, "probe")
      MT.create(s, pRoot, slice(0))
      maintain() // bootstrap
      MT.append(s, pRoot, slice(1))
      maintain()
      MT.append(s, pRoot, slice(2))
      val (c2, _) = maintain()
      val replayNoop = maintain() == ((c2, 0L))
      graft.functions.NativeExpressions.register(s)
      // sketch-sized driver compares (1024 longs), the agg9/hh3 class
      val scratch = probes.agg(expr("graft_bloom_build(probe, 65536, 5)")
        .as("words")).collect()(0).getSeq[Long](0)
      val stored = MT.read(s, sRoot).collect()(0).getSeq[Long](0)
      val bitExact = stored == scratch
      graft.ops.LakeOps.screenWithContaminationSketch(
          s, sRoot, pRoot, docs, "doc_id", "text", "probe_id", "probe", probeLen = 20)
        .select(lit(bitExact).as("sketch_bit_exact"),
          lit(replayNoop).as("replay_noop"),
          col("doc_id"), col("n_probe_hits"), col("first_probe"))
    }),

    // ---- dedup ----
    "pipe3_full_pipeline" -> ((s, dir) => {
      // the COMPLETE training-data run as one query — what a real corpus
      // build executes end to end: quality gate → CC near-dup survivors →
      // contamination screen → target-mixture resample → boundary-
      // respecting pack. Every stage is an operator that passes its own
      // oracle; this key proves the COMPOSITION under the same hash gate.
      //
      // Plan shape (audited in PlanAuditSpec): the mixture stage is a
      // diamond — it needs the clean set twice (per-language quotas AND
      // per-language ranking), and Catalyst duplicates diamond subtrees,
      // which would re-execute the whole gate→dedup→screen upstream per
      // branch. The fix is the same one a production run uses: an explicit
      // MATERIALIZATION BOUNDARY at the cleaned corpus (lazy
      // localCheckpoint — dd4's CC iteration already relies on the same
      // mechanism). Token counts are computed BEFORE the boundary, so the
      // checkpoint holds three longs + a language per doc, never the
      // text. Upstream of the boundary the corpus is scanned exactly 3
      // times (pair generation, survivor anti-join, 50-row probe side) —
      // each a different projection, none redundant.
      graft.functions.NativeExpressions.register(s)
      val docs = t(s, dir, "documents")
      val gated = TextOps.qualityFilter(docs, "text")
      val survivors = DedupOps.ccSurvivors(gated, "doc_id",
        DedupOps.ngramJaccardPairs(gated, "doc_id", "text",
          n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L)))
      val probes = docs.filter(col("doc_id") < 50)
        .select(col("doc_id").as("probe_id"), substring(col("text"), 1, 20).as("probe"))
      val clean = survivors
        .join(broadcast(probes),
          col("text").contains(col("probe")) && col("doc_id") =!= col("probe_id"),
          "left_anti")
        .select(col("doc_id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .localCheckpoint(false) // stage 1-3 output: computed once, shared
      val target = when(col("lang") === "en", lit(0.4)).otherwise(lit(0.15))
      val wAll = Window.partitionBy() // 5 rows: one per language
      val quotas = clean.groupBy("lang").agg(count(lit(1)).cast("double").as("c"))
        .withColumn("p", target)
        .withColumn("n_keep", floor(col("p") * min(col("c") / col("p")).over(wAll)))
        .select("lang", "n_keep")
      val byHash = Window.partitionBy("lang")
        .orderBy(SampleOps.knuth32(col("doc_id")), col("doc_id"))
      val sampled = clean.withColumn("rk", row_number().over(byHash))
        .join(broadcast(quotas), "lang")
        .filter(col("rk") <= col("n_keep"))
        .select("doc_id", "n_tokens")
      PackOps.packCounted(sampled, "doc_id", "n_tokens", 8, 512)
    }),

    "pipe1_clean_corpus" -> ((s, dir) => {
      // the composed training-data cleaning pipeline: quality features →
      // language filter → threshold filter → exact dedup (keep min id) —
      // the end-to-end shape the individual txt*/dd* operators exist for
      val featured = TextOps.withQualityFeatures(t(s, dir, "documents"), "text")
        .withColumn("lang_guess", TextOps.languageId(col("text")))
      val kept = featured.filter(
        col("lang_guess") === "en" && col("n_tokens") >= 20 && col("stopword_ratio") >= 0.05)
      DedupOps.exactDedup(kept, "doc_id", Seq("text"))
        .select(col("doc_id").as("keep_doc_id"), col("n_copies"))
    }),

    "dd1_exact_dedup" -> ((s, dir) =>
      DedupOps.exactDedup(t(s, dir, "documents"), "doc_id", Seq("text"))
        .select(col("doc_id").as("keep_doc_id"), col("n_copies"))),

    "dd2_ngram_jaccard" -> ((s, dir) =>
      // maxShingleFreq bounds the per-shingle doc-list buffer (and the
      // C(k,2) pair fan-out): without it one degenerate stop-shingle
      // OOMs an executor at scale. 20 is active at sf0.1 (max df 25)
      // and a semantic no-op at smaller SFs (max df 9)
      DedupOps.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L))),

    "dd10_incremental_neardup" -> ((s, dir) => {
      // INCREMENTAL cross-batch near-dup discovery ("dedup the daily
      // crawl against the corpus without re-scanning the corpus"): a
      // shingle index mart (range-clustered + stats on shingle, so the
      // probe reads only overlapping buckets) and a pairs mart are
      // maintained over an append-only docs table; each window adds
      // new⋈old pairs (index probe) and new⋈new pairs (batch only) —
      // pair statistics are pair-local under the uncapped contract, so
      // the pairs mart is append-only IVM. Pins: after three windows
      // the mart equals the from-scratch uncapped ngramJaccardPairs
      // bit-exactly; a replay call is a no-op; window-2's doc count is
      // a literal mirror the oracle re-derives. Face: the pairs mart,
      // replayed relationally by DuckDB over the whole corpus.
      val docsR = java.nio.file.Files.createTempDirectory("dd10_docs").toString
      val idxR = java.nio.file.Files.createTempDirectory("dd10_idx").toString
      val pairsR = java.nio.file.Files.createTempDirectory("dd10_pairs").toString
      val docs = t(s, dir, "documents")
      val MT = graft.sources.ManifestTable
      def slice(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === i)
      def maintain() = graft.ops.LakeOps.maintainNearDupPairs(
        s, docsR, idxR, pairsR, "doc_id", "text")
      MT.create(s, docsR, slice(0))
      maintain() // bootstrap
      MT.append(s, docsR, slice(1))
      maintain()
      MT.append(s, docsR, slice(2))
      val (c2, d2, _) = maintain()
      val replayNoop = maintain() == ((c2, 0L, 0L))
      val scratch = DedupOps.ngramJaccardPairs(MT.read(s, docsR), "doc_id", "text",
        n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = None)
      val m = MT.read(s, pairsR)
      val matches = m.exceptAll(scratch).isEmpty && scratch.exceptAll(m).isEmpty
      m.select(lit(matches).as("matches_scratch"), lit(replayNoop).as("replay_noop"),
        lit(d2).as("window2_docs"),
        col("doc_a"), col("doc_b"), col("shared_shingles"), col("jaccard"))
    }),

    "dd11_incremental_neardup_capped" -> ((s, dir) => {
      // the CAPPED contract maintained incrementally — the variant a
      // production corpus runs (dd10's uncapped output is quadratic in
      // hot-shingle df; the cap bounds it, but a shingle CROSSING the
      // cap as the corpus grows retracts pairs and shrinks sizes, which
      // append-only IVM cannot express). maintainNearDupPairsCapped
      // does the semi-join-restricted recompute over crosser
      // neighborhoods with a pairs/sizes/index watermark ladder. Pins:
      // after three windows the mart equals the from-scratch CAPPED
      // ngramJaccardPairs; a replay call is a no-op; the number of
      // shingles that crossed the cap after window 1 is a literal the
      // oracle re-derives (at sf0.1 the cap is active and crossings are
      // plentiful; the equality holds at every SF either way). Face:
      // the pairs mart, replayed relationally by DuckDB with the same
      // cap over the whole corpus.
      val docsR = java.nio.file.Files.createTempDirectory("dd11_docs").toString
      val idxR = java.nio.file.Files.createTempDirectory("dd11_idx").toString
      val szR = java.nio.file.Files.createTempDirectory("dd11_sz").toString
      val pairsR = java.nio.file.Files.createTempDirectory("dd11_pairs").toString
      val docs = t(s, dir, "documents")
      val MT = graft.sources.ManifestTable
      val cap = 5L
      def slice(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === i)
      def maintain() = graft.ops.LakeOps.maintainNearDupPairsCapped(
        s, docsR, idxR, szR, pairsR, "doc_id", "text", maxShingleFreq = cap)
      MT.create(s, docsR, slice(0))
      maintain() // bootstrap
      MT.append(s, docsR, slice(1))
      maintain()
      MT.append(s, docsR, slice(2))
      val (c2, _, _) = maintain()
      val replayNoop = maintain() == ((c2, 0L, 0L))
      val scratch = DedupOps.ngramJaccardPairs(MT.read(s, docsR), "doc_id", "text",
        n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(cap))
      val m = MT.read(s, pairsR).drop("pair_key")
      val matches = m.exceptAll(scratch).isEmpty && scratch.exceptAll(m).isEmpty
      // crossing witness: shingles under the cap over windows 0+1 that
      // the full corpus pushed over it — the retraction-triggering set
      val ex = docs.select(col("doc_id"),
        explode(DedupOps.shingles(col("text"), 3)).as("shingle"))
      val crossed = ex.groupBy("shingle")
        .agg(count(lit(1)).as("df_all"),
          count(when(pmod(col("doc_id"), lit(3)) < 2, lit(1))).as("df_w1"))
        .filter(col("df_all") > cap && col("df_w1") <= cap)
        .count()
      m.select(lit(matches).as("matches_scratch"), lit(replayNoop).as("replay_noop"),
        lit(crossed).as("crossed_after_w1"),
        col("doc_a"), col("doc_b"), col("shared_shingles"), col("jaccard"))
    }),

    "dd6_cross_corpus" -> ((s, dir) => {
      // benchmark decontamination at the NEAR-DUP tier (ctm1/ctm2 are the
      // exact-containment tier): corpus docs near-dupping any probe doc.
      // Probe set = doc_id % 37 == 0 (a deterministic stand-in benchmark
      // suite), corpus = the rest — disjoint, so every pair is a genuine
      // cross-corpus hit. Jaccard uses FULL shingle-set sizes on both
      // sides (the cap only bounds which shingles may generate pairs) —
      // mirrored in the oracle.
      val docs = t(s, dir, "documents")
      DedupOps.crossCorpusNearDupPairs(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 3, minShared = 2L, minJaccard = 0.1,
        maxCorpusShingleFreq = 20L)
    }),

    "dd8_prefix_jaccard" -> ((s, dir) =>
      // the PPJoin-family prefix-filtered similarity join at t=0.9 (the
      // family's design regime — near-duplicate detection; prefixes are
      // ~a tenth of each set): result-identical to the exact all-pairs
      // join, which is how the oracle computes it (threshold unrounded)
      DedupOps.prefixJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.9)),

    "dd7_span_excision" -> ((s, dir) =>
      // sub-document dedup (Lee et al. 2021 ExactSubstr, word-8-gram
      // granularity): every position whose 8-gram recurs ANYWHERE in the
      // corpus is duplicated; overlapping marks merge to maximal spans.
      // The profile is integer-exact (span count, tokens inside spans,
      // survivors) and the oracle replays the whole pipeline — gram
      // hashing, duplicate detection, interval merge — in SQL. The
      // excised TEXT itself is spec-checked (DedupOpsSpec) on fixtures
      // where the span structure is hand-computable.
      DedupOps.duplicateSpanProfile(t(s, dir, "documents"), "doc_id", "text", n = 8)),

    "dd3_neardup_survivors" -> ((s, dir) => {
      // the terminal dedup deliverable: the KEPT document set after
      // dropping greater-id members of each near-dup pair
      val docs = t(s, dir, "documents")
      DedupOps.nearDupSurvivors(docs, "doc_id",
          DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
            n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L)))
        .select(col("doc_id"))
    }),

    "dd4_cc_survivors" -> ((s, dir) => {
      // cluster-aware retention: connected components over the dd2 pair
      // graph (large-star/small-star), keep the min id per component —
      // fixes dd3's greedy over-drop on transitive chains
      val docs = t(s, dir, "documents")
      DedupOps.ccSurvivors(docs, "doc_id",
          DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
            n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L)))
        .select(col("doc_id"))
    }),

    "mh1_minhash_neardup" -> ((s, dir) => {
      // under the oracle via the ann3 recipe: the banded-LSH pair SET is
      // deterministic given the pinned seed (per-SF golden identities,
      // with est_jaccard a golden alongside — the affine-hash RNG is not
      // SQL-expressible), and the exact-verification stage appends a
      // jaccard the oracle RE-DERIVES from raw text (dd2's formula), so
      // a golden pair that stopped being similar in the data fails loudly
      val docs = t(s, dir, "documents")
      DedupOps.exactJaccardFor(
        DedupOps.minHashNearDupPairs(docs, "doc_id", "text",
          numHashes = 64, bands = 16, minEstJaccard = 0.4),
        docs, "doc_id", "text", n = 3)
    }),

    "sh1_simhash_neardup" -> ((s, dir) => {
      // same oracle recipe as mh1: golden pair identities + hamming (the
      // simhash kernel is not SQL-expressible), exact jaccard re-derived
      // by the oracle from raw text
      val docs = t(s, dir, "documents")
      DedupOps.exactJaccardFor(
        DedupOps.simHashNearDupPairs(docs, "doc_id", "text", maxHamming = 3),
        docs, "doc_id", "text", n = 3)
    }),

    "txt12_edit_distance" -> ((s, dir) => {
      // exact edit-distance VERIFICATION of near-dup candidates — the
      // standard second stage after shingle-based candidate generation:
      // O(len²) Levenshtein is unaffordable corpus-wide but fine on the
      // bounded candidate pair set; both the codegen'd levenshtein and
      // the join-texts-back shape are what a production verifier runs
      val docs = t(s, dir, "documents")
      val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minShared = 2L, minJaccard = 0.1, maxShingleFreq = Some(20L))
      pairs
        .join(docs.select(col("doc_id").as("doc_a"), col("text").as("text_a")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("text").as("text_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_distance"),
          round(lit(1.0) - levenshtein(col("text_a"), col("text_b")).cast("double") /
            greatest(length(col("text_a")), length(col("text_b"))), 4).as("edit_similarity"))
    }),

    "txt13_chunking" -> ((s, dir) => {
      // context-window chunking for training pipelines: overlapping
      // token windows (size 32, stride 24), one output row per chunk —
      // a narrow explode whose fan-out is bounded by n_tokens/stride,
      // no shuffle
      val toks = TextOps.tokens(col("text"))
      val starts = sequence(lit(1), size(toks), lit(24))
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(transform(starts, i => slice(toks, i, lit(32)))))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          array_join(col("col"), " ").as("chunk_text"),
          size(col("col")).cast("long").as("chunk_tokens"))
    }),

    "agg9_conditional_bool" -> ((s, dir) =>
      // conditional + boolean aggregate breadth: count_if / every / any
      // (DuckDB: FILTER clause, bool_and, bool_or)
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count_if(col("l_quantity") > 25).cast("long").as("n_high_qty"),
        every(col("l_extendedprice") > 0).as("all_price_positive"),
        org.apache.spark.sql.functions.any(col("l_discount") === 0).as("any_zero_discount"),
        count_if(col("l_tax") > 0.05).cast("long").as("n_high_tax"))),

    "q6_exists_subquery" -> ((s, dir) => {
      // EXISTS / NOT EXISTS correlated subqueries through the SQL
      // surface (q5 covers scalar subqueries): customers with at least
      // one finished order and no pending one — Catalyst plans these as
      // semi/anti joins, not per-row re-execution
      t(s, dir, "customer").createOrReplaceTempView("q6_customer")
      t(s, dir, "orders").createOrReplaceTempView("q6_orders")
      s.sql("""
        SELECT c_custkey, c_mktsegment FROM q6_customer c
        WHERE EXISTS (SELECT 1 FROM q6_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM q6_orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
      """)
    }),

    "mh2_minhash_gate" -> ((s, dir) => {
      // ann4's gate pattern for the MinHash family: precision/recall of
      // mh1's banded candidates against the EXACT 3-gram jaccard pair
      // set at the same 0.4 threshold, computed in-query. n_exact
      // re-derives in the oracle's SQL; the candidate/true-positive
      // counts and P/R are per-SF measured goldens (the affine-hash RNG
      // is not SQL-expressible) — a determinism/regression gate over the
      // whole signature→band→candidate pipeline
      val docs = t(s, dir, "documents")
      val mh = DedupOps.minHashNearDupPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, minEstJaccard = 0.4)
      // ground truth uses the SHIPPED dd2 definition (stop-shingle cap
      // 20): the uncapped exact side re-creates the quadratic stop-
      // shingle fan-out the cap exists to prevent
      val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minShared = 1L, minJaccard = 0.4, maxShingleFreq = Some(20L))
      val nEx = exact.agg(count(lit(1)).cast("long").as("n_exact"))
      val nMh = mh.agg(count(lit(1)).cast("long").as("n_candidates"))
      val nTp = mh.join(exact.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).cast("long").as("n_true_pos"))
      nEx.crossJoin(nMh).crossJoin(nTp).select(
        col("n_exact"), col("n_candidates"), col("n_true_pos"),
        round(col("n_true_pos").cast("double") / col("n_candidates"), 4).as("precision"),
        round(col("n_true_pos").cast("double") / col("n_exact"), 4).as("recall"))
    }),

    "sh2_simhash_gate" -> ((s, dir) => {
      // the SimHash gate: sh1's hamming<=3 candidates vs the exact
      // 2-gram jaccard pair set at 0.5 — same golden scheme as mh2
      val docs = t(s, dir, "documents")
      val sh = DedupOps.simHashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      // SAME canonical near-dup truth as mh2 (capped 3-gram jaccard at
      // 0.4): both sketches chase the same duplicates, so one truth set
      // makes their P/R comparable. (A 2-gram truth was tried and
      // rejected: uncapped it re-creates the quadratic stop-shingle
      // fan-out — measured 46 s at sf0.1 — and capped it stops being a
      // near-dup set at all, since dropping common shingles inflates
      // the jaccard of rare-shingle pairs.)
      val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minShared = 1L, minJaccard = 0.4, maxShingleFreq = Some(20L))
      val nEx = exact.agg(count(lit(1)).cast("long").as("n_exact"))
      val nSh = sh.agg(count(lit(1)).cast("long").as("n_candidates"))
      val nTp = sh.join(exact.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).cast("long").as("n_true_pos"))
      nEx.crossJoin(nSh).crossJoin(nTp).select(
        col("n_exact"), col("n_candidates"), col("n_true_pos"),
        round(col("n_true_pos").cast("double") / col("n_candidates"), 4).as("precision"),
        round(col("n_true_pos").cast("double") / col("n_exact"), 4).as("recall"))
    }),

    "cn2_cosine_gate" -> ((s, dir) => {
      // the embedding near-dup gate: cn1's sign-LSH bucketed pairs vs
      // the exact all-pairs cosine set at the same 0.4 threshold. The
      // exact side IS SQL-expressible (list_inner_product), so n_exact
      // anchors the oracle; the LSH-side counts are goldens.
      //
      // Gate cost is corpus-size-INDEPENDENT by construction: both arms
      // run over a deterministic Knuth-hash sample of vec_ids (a pure
      // projection the oracle SQL replays bit-identically) that is
      // BOUNDED ABSOLUTELY, not proportionally — the 50% rate (which
      // keeps the sf0.01 positive pair set double-digit) is conjoined
      // with a dd9-style hash threshold `knuth32(id) < 2048·2^32 div N`,
      // so the sampled set is ~min(N/2, 1024) vectors and the exact arm
      // ~min(N/2,1024)² cosines AT ANY CORPUS SIZE — a gate you can't
      // afford to run is a gate that stops running. At the test SFs
      // (N ≤ 2048) the threshold is saturated and the rule reduces to
      // the plain 50% sample (goldens unchanged); the sample P/R stays
      // an unbiased estimate of the corpus P/R either way.
      graft.functions.NativeExpressions.register(s)
      val embAll = t(s, dir, "embeddings")
      val thr = embAll.agg(count(lit(1)).as("n")).select(
        least(lit(4294967296L),
          expr("CAST((CAST(2048 AS DECIMAL(38,0)) * 4294967296) div n AS BIGINT)")).as("thr"))
      val emb = embAll.crossJoin(broadcast(thr))
        .filter(pmod(SampleOps.knuth32(col("vec_id")), lit(100L)) < 50 &&
          SampleOps.knuth32(col("vec_id")) < col("thr"))
        .drop("thr")
      val lsh = SimilarityOps.cosineNearDupPairs(
        emb, "vec_id", "embedding", minCosine = 0.4, dim = 64, numPlanes = 4, tables = 8)
      // stream side repartitioned: a small parquet arrives as ONE split,
      // and a broadcast NLJ inherits the stream side's parallelism — the
      // all-pairs exact scoring would otherwise run as a single task
      // (measured 8.8 s; ~1 s spread over the cores)
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
        .repartition(s.sparkContext.defaultParallelism)
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
      val exact = a.crossJoin(broadcast(b)).filter(col("id_a") < col("id_b"))
        .filter(round(expr("graft_cosine(vec_a, vec_b)"), 4) >= 0.4)
        .select("id_a", "id_b")
      val nEx = exact.agg(count(lit(1)).cast("long").as("n_exact"))
      val nLsh = lsh.agg(count(lit(1)).cast("long").as("n_candidates"))
      val nTp = lsh.join(exact, Seq("id_a", "id_b"), "left_semi")
        .agg(count(lit(1)).cast("long").as("n_true_pos"))
      nEx.crossJoin(nLsh).crossJoin(nTp).select(
        col("n_exact"), col("n_candidates"), col("n_true_pos"),
        round(col("n_true_pos").cast("double") / col("n_candidates"), 4).as("precision"),
        round(col("n_true_pos").cast("double") / col("n_exact"), 4).as("recall"))
    }),

    // ---- similarity search ----
    "ann1_bruteforce_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
        .withColumnRenamed("rank", "rnk")
    }),

    "ann2_lsh_topk" -> ((s, dir) => { // oracle: per-SF neighbor goldens,
      // scores re-derived from raw embeddings (the ann3 recipe)
      val emb = t(s, dir, "embeddings")
      SimilarityOps.lshTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, dim = 64)
        .withColumnRenamed("rank", "rnk")
    }),

    "ann4_lsh_recall" -> ((s, dir) => {
      // the LSH path under the oracle: recall@5 of ann2's sign-LSH result
      // against ann1's exact answer, computed INSIDE the query. Every
      // input is deterministic (fixed seed, bit-parity kernels), so the
      // recall is a stable number the driver can hash-check — n_exact is
      // independently derived by the oracle's brute-force SQL; the recall
      // constant is a measured golden pinned per SF (a cross-engine SQL
      // oracle cannot re-derive the hyperplane RNG), making this a
      // determinism/regression gate on the whole LSH pipeline, with the
      // recall-floor property spec'd in SimilarityOpsSpec
      val emb = t(s, dir, "embeddings")
      val exact = SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
      val lsh = SimilarityOps.lshTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, dim = 64)
      exact.join(
          lsh.select(col("q_id"), col("vec_id"), lit(1).as("hit")),
          Seq("q_id", "vec_id"), "left")
        .agg(
          round(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)), 4)
            .as("recall_at_5"),
          count(lit(1)).cast("long").as("n_exact"))
    }),

    "ann5_ivf_recall" -> ((s, dir) => {
      // ann4's recall gate for the IVF path: the k-means fit is
      // deterministic on this setup (fixed seed, positional-prefix
      // sample over fixed file splits — VERIFIED stable across JVM
      // restarts at all 3 SFs before pinning these goldens), so the
      // whole quantize→probe→score→heap pipeline is hash-checked
      val emb = t(s, dir, "embeddings")
      val exact = SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
      val ivf = SimilarityOps.ivfTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, nLists = 16, nProbe = 4)
      exact.join(
          ivf.select(col("q_id"), col("vec_id"), lit(1).as("hit")),
          Seq("q_id", "vec_id"), "left")
        .agg(
          round(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)), 4)
            .as("recall_at_5"),
          count(lit(1)).cast("long").as("n_exact"))
    }),

    "ann6_ivf_balance" -> ((s, dir) =>
      // quantizer-degeneracy gate beside ann5's recall gate: cell-size
      // histogram stats from the SAME deterministic quantize path the
      // search uses. n_vectors is oracle-anchored (plain corpus count);
      // the cell stats are per-SF measured goldens — a skew regression,
      // seed change, or sampling drift moves max_share/n_empty and fails
      // the hash before it silently guts ann3's recall in production
      SimilarityOps.ivfCellBalance(
        t(s, dir, "embeddings"), "vec_id", "embedding", nLists = 16)),

    "ann3_ivf_topk" -> ((s, dir) => {
      // the IVF top-k output itself under the oracle (ann5/ann6 gate
      // recall and cell balance; this hash-checks the ACTUAL result):
      // the k-means fit is deterministic on this setup (fixed seed,
      // positional-prefix sample — restart-stability re-verified across
      // fresh JVMs at all 3 SFs before pinning), and graft_topk breaks
      // score ties on vec_id asc, so the output is a function of the
      // data alone. The oracle pins only the (q_id, vec_id, rnk)
      // identities per SF and re-derives every score from the raw
      // embeddings — scores are exact cosine on raw vectors, which
      // DuckDB computes independently (ann1's proven formula)
      val emb = t(s, dir, "embeddings")
      SimilarityOps.ivfTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, nLists = 16, nProbe = 4)
        .withColumnRenamed("rank", "rnk")
    }),

    "sq1_int8_quantize" -> ((s, dir) =>
      // int8 storage quantization of the embedding corpus (QuantizeOps):
      // per-vector scale + codes + worst reconstruction error, all
      // engine-independent elementwise double math — the oracle
      // re-derives codes bit-identically, so scale and the code checksum
      // compare EXACTLY (no rounding slack; max_abs_err alone is rounded
      // as pure defense). n_sat counts saturated codes (|c| = 127): the
      // clamp must fire only on the per-vector max element, never wholesale
      QuantizeOps.quantizeCorpus(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(
          col("vec_id"),
          size(col("codes")).cast("long").as("n_dims"),
          col("scale"),
          aggregate(col("codes"), lit(0L), (a, c) => a + c.cast("long")).as("sum_codes"),
          size(filter(col("codes"), c => abs(c) === 127)).cast("long").as("n_sat"),
          round(col("max_abs_err"), 6).as("max_abs_err"))),

    "sq2_quantized_recall" -> ((s, dir) => {
      // does 4x storage compression cost retrieval quality? The gate
      // answers IN-QUERY: exact top-5 on raw vectors vs top-5 scored
      // against the int8-reconstructed corpus (queries stay full
      // precision — the standard asymmetric setup), recall joined out.
      // Unlike ann4/ann5 there is NO RNG anywhere, so the oracle
      // re-derives the whole pipeline — quantization, both rankings,
      // the recall — from scratch in SQL: a fully-checked number, not
      // a golden constant
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val recon = QuantizeOps.quantizeCorpus(emb, "vec_id", "embedding")
        .select(col("vec_id"), col("recon"))
      val exact = SimilarityOps.bruteForceTopK(
        queries, "vec_id", "embedding", emb, "vec_id", "embedding", k = 5)
      val quant = SimilarityOps.bruteForceTopK(
        queries, "vec_id", "embedding", recon, "vec_id", "recon", k = 5)
      exact.join(
          quant.select(col("q_id"), col("vec_id"), lit(1).as("hit")),
          Seq("q_id", "vec_id"), "left")
        .agg(
          round(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)), 4)
            .as("recall_at_5"),
          count(lit(1)).cast("long").as("n_exact"))
    }),

    "ann7_ivfpq_recall" -> ((s, dir) => {
      // the composed IVF-PQ stack under one gate: coarse routing (ann5
      // gates its recall) + PQ-compressed scoring (sq3 gates its
      // distortion) — this key gates the END-TO-END composition, which
      // is what a production index actually serves. Golden per SF like
      // ann4/ann5 (two trained quantizers, neither SQL-expressible);
      // n_exact oracle-anchored
      val emb = t(s, dir, "embeddings")
      val exact = SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
      val ivfpq = SimilarityOps.ivfPqTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
      exact.join(
          ivfpq.select(col("q_id"), col("vec_id"), lit(1).as("hit")),
          Seq("q_id", "vec_id"), "left")
        .agg(
          round(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)), 4)
            .as("recall_at_5"),
          count(lit(1)).cast("long").as("n_exact"))
    }),

    "sq3_pq_recall" -> ((s, dir) => {
      // the next rung after sq2: product quantization (m=8 subspaces ×
      // k=16 centroids — 8 nibbles/vector vs int8's 64 bytes), recall@5
      // gated the same way. The codebook is TRAINED (per-subspace
      // k-means via the IVF fit discipline: bounded positional sample,
      // single-task fit, fixed seed), so unlike sq2 the oracle cannot
      // re-derive it — recall is a per-SF measured GOLDEN like
      // ann4/ann5, with n_exact independently oracle-anchored and the
      // recall floor spec'd in QuantizeOpsSpec
      graft.functions.NativeExpressions.register(s)
      val emb = t(s, dir, "embeddings")
      val cb = QuantizeOps.pqFit(emb, "embedding", dim = 64, m = 8, k = 256)
      val recon = emb.select(col("vec_id"),
        QuantizeOps.pqEncodeReconstruct("embedding", cb).as("recon"))
      val queries = emb.filter(col("vec_id") < 8)
      val exact = SimilarityOps.bruteForceTopK(
        queries, "vec_id", "embedding", emb, "vec_id", "embedding", k = 5)
      val quant = SimilarityOps.bruteForceTopK(
        queries, "vec_id", "embedding", recon, "vec_id", "recon", k = 5)
      exact.join(
          quant.select(col("q_id"), col("vec_id"), lit(1).as("hit")),
          Seq("q_id", "vec_id"), "left")
        .agg(
          round(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)), 4)
            .as("recall_at_5"),
          count(lit(1)).cast("long").as("n_exact"))
    }),

    "cn1_cosine_neardup" -> ((s, dir) => // oracle: per-SF pair goldens,
      // scores re-derived from raw embeddings (the ann3 recipe).
      // testdata embeddings are near-orthogonal (max pairwise cos ≈ 0.5),
      // so the threshold sits at 0.4 where real pairs exist; 4 planes ×
      // 8 tables gives ~75% recall at that similarity band
      SimilarityOps.cosineNearDupPairs(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        minCosine = 0.4, dim = 64, numPlanes = 4, tables = 8)),

    // ---- multimodal plumbing ----
    "mm1_binary_meta" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("content_md5"))),

    "mm2_decode_stub" -> ((s, dir) => {
      // mapPartitions decode plumbing under the oracle: text bytes can
      // never sniff as png/jpeg, so they deterministically hit the stub
      // arm whose dims are SQL-expressible arithmetic — format/bytes/dims
      // are hash-checked (real PNG/JPEG header decode is spec-pinned in
      // MultimodalStreamingSpec with actual image bytes); the
      // byte-histogram embedding (array column) stays out of the driver
      // projection — the driver compare can't sort rows on an array column
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      graft.ops.MultimodalOps.decodeImage(media, "doc_id", "content").toDF()
        .select("item_id", "format", "n_bytes", "width", "height")
    }),

    "mm4_perceptual_hash" -> ((s, dir) => {
      // image-content dedup tier 1 — the perceptual-hash signature pass
      // under the oracle: text bytes can never sniff as png/jpeg, so
      // every row deterministically takes the SQL-expressible stub arm
      // (15 md5 nibbles as a 60-bit integer) and the whole plumbing —
      // mapPartitions decode boundary, stub coalesce, format sniff — is
      // hash-checked; REAL dHash on actual pixels is spec-pinned with
      // constructed PNGs (MultimodalStreamingSpec) and gated end-to-end
      // by mm5.
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      graft.ops.MultimodalOps.perceptualHash(media, "doc_id", "content")
        .select(col("item_id"), col("format"), col("phash"), col("is_decoded"))
    }),

    "mm5_image_neardup" -> ((s, dir) => {
      // image-content dedup tier 2, END TO END on REAL pixels: 20
      // deterministic synthetic PNGs + 20 one-cell-perturbed variants
      // (ImageFixtures — integer pixel math, lossless PNG roundtrip, so
      // every dHash bit reproduces on any JVM), near-dup pairs via
      // 4×16-bit Hamming banding. The pair set is SF-independent and
      // DERIVED, not golden: exactly the planted (i, i+20) variants at
      // Hamming ≤ 3, which the oracle states as a range join. A decode
      // regression, a hash drift, or a banding gap all break the row set.
      import s.implicits._
      val rows = (0 until 20).map(i =>
        (i.toLong, graft.ops.ImageFixtures.syntheticPng(i, perturbed = false))) ++
        (0 until 20).map(i =>
          (i.toLong + 20, graft.ops.ImageFixtures.syntheticPng(i, perturbed = true)))
      val df = rows.toDF("img_id", "content").repartition(4)
      graft.ops.MultimodalOps.imageNearDupPairs(df, "img_id", "content", maxHamming = 3)
        .select(col("id_a"), col("id_b"))
    }),

    "mm6_audio_neardup" -> ((s, dir) => {
      // audio-content dedup END TO END on REAL PCM: 20 deterministic
      // synthetic WAVs + 20 one-frame-perturbed variants (AudioFixtures
      // — hand-built RIFF header, integer square waves, no codec, so
      // every envelope bit reproduces on any JVM), near-dup pairs via
      // the same 4×16-bit Hamming banding as mm5. The fingerprint is
      // the dHash idea on the ENERGY ENVELOPE (65 frames, Σ|sample|,
      // adjacent comparisons — volume-invariant by construction). The
      // pair set is SF-independent and DERIVED: exactly the planted
      // (i, i+20) variants at Hamming ≤ 3.
      import s.implicits._
      val rows = (0 until 20).map(i =>
        (i.toLong, graft.ops.AudioFixtures.syntheticWav(i, perturbed = false))) ++
        (0 until 20).map(i =>
          (i.toLong + 20, graft.ops.AudioFixtures.syntheticWav(i, perturbed = true)))
      val df = rows.toDF("clip_id", "content").repartition(4)
      graft.ops.MultimodalOps.audioNearDupPairs(df, "clip_id", "content", maxHamming = 3)
        .select(col("id_a"), col("id_b"))
    }),

    "mm7_video_neardup" -> ((s, dir) => {
      // video-content dedup END TO END on REAL multi-frame decode: 10
      // deterministic animated GIFs + 10 variants perturbed inside one
      // dHash cell IN EVERY FRAME (VideoFixtures — GIF's palette is
      // lossless for grayscale, so per-frame hashes reproduce on any
      // JVM). Near-dup = ALIGNED-FRAME VOTING: ≥5 of 8 same-index
      // frames within Hamming 3, candidates from per-(frame, band)
      // buckets (pigeonhole-complete per frame ⇒ the matched count is
      // exact, never all-pairs). Pair set DERIVED (i, i+10) with every
      // aligned frame matching — SF-independent.
      import s.implicits._
      val rows = (0 until 10).map(i =>
        (i.toLong, graft.ops.VideoFixtures.syntheticGif(i, perturbed = false))) ++
        (0 until 10).map(i =>
          (i.toLong + 10, graft.ops.VideoFixtures.syntheticGif(i, perturbed = true)))
      val df = rows.toDF("clip_id", "content").repartition(4)
      graft.ops.MultimodalOps.videoNearDupPairs(df, "clip_id", "content",
        maxHamming = 3, minMatchingFrames = 5)
        .select(col("id_a"), col("id_b"), col("matched_frames"))
    }),

    "mm8_video_shifted" -> ((s, dir) => {
      // TEMPORAL-SHIFT-tolerant video dedup: copies trimmed by one
      // leading frame (VideoFixtures startFrame=1 — same content
      // stream, every index shifted) DEFEAT aligned-index voting
      // (pinned: the strict voter finds zero pairs) but the
      // sliding-offset vote re-aligns them at offset −1 with all 7
      // shared frames matching. One offset must explain the match, so
      // unrelated clips still refuse. Candidates stay banded per
      // (aligned frame, band) — the offset fan-out is a constant
      // (2·maxOffset+1) factor, never all-pairs. Pair set DERIVED
      // (i, i+10, 7 frames, offset −1) — SF-independent.
      import s.implicits._
      val rows = (0 until 8).map(i =>
        (i.toLong, graft.ops.VideoFixtures.syntheticGif(i, perturbed = false))) ++
        (0 until 8).map(i => (i.toLong + 10,
          graft.ops.VideoFixtures.syntheticGif(i, perturbed = false, startFrame = 1))) ++
        (0 until 4).map(i => (i.toLong + 20,
          graft.ops.VideoFixtures.syntheticGif(100 + i, perturbed = false)))
      val df = rows.toDF("clip_id", "content").repartition(4).localCheckpoint()
      val strictEmpty = graft.ops.MultimodalOps.videoNearDupPairs(
        df, "clip_id", "content", maxHamming = 3, minMatchingFrames = 5).count() == 0L
      graft.ops.MultimodalOps.videoNearDupPairsShifted(df, "clip_id", "content",
        maxHamming = 3, minMatchingFrames = 5, maxOffset = 2)
        .select(lit(strictEmpty).as("strict_finds_none"),
          col("id_a"), col("id_b"), col("matched_frames"),
          col("offset").cast("long").as("shift"))
    }),

    "mm3_frame_sample" -> ((s, dir) => {
      // frame/chunk sampling under the oracle (sampleChunks was spec-only
      // before): bounded-fan-out posexplode — at most maxFrames rows per
      // item regardless of payload size, the shape a video frame-sampler
      // emits. Chunk identity rides as md5 (the raw binary stays out of
      // the driver projection — the compare can't sort on binary)
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      graft.ops.MultimodalOps.sampleChunks(media, "content", chunkBytes = 64, maxFrames = 4)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          md5(col("chunk")).as("chunk_md5"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash/seed-dependent ops (driver
    * records rows-only checks; ScalaTest pins their semantics instead).
    */
  def oracleSql: Map[String, String] = Map(
    "p1_rename_project" ->
      "SELECT c_custkey AS customer_id, c_name AS name, c_mktsegment AS segment FROM customer",

    "p3_scalar_arithmetic" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge FROM lineitem",

    "f1_filter_project" ->
      ("SELECT l_orderkey, l_linenumber, l_shipdate, l_discount, l_extendedprice FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05"),

    "j1_left_join_agg" ->
      (s"SELECT o.o_custkey, ${dsumSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue, " +
        "CAST(count(*) AS BIGINT) AS n_items " +
        "FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY o.o_custkey"),

    "j2_customer360" ->
      (s"""WITH order_stats AS (
         |  SELECT o_custkey, min(o_orderdate) AS first_order, max(o_orderdate) AS most_recent_order,
         |         CAST(count(o_orderkey) AS BIGINT) AS number_of_orders
         |  FROM orders GROUP BY o_custkey
         |), revenue AS (
         |  SELECT o.o_custkey, ${dsumSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS lifetime_value
         |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY o.o_custkey
         |)
         |SELECT c.c_custkey AS customer_id, c.c_name AS name, s.first_order, s.most_recent_order,
         |       s.number_of_orders, r.lifetime_value
         |FROM customer c
         |LEFT JOIN order_stats s ON c.c_custkey = s.o_custkey
         |LEFT JOIN revenue r ON c.c_custkey = r.o_custkey""").stripMargin,

    "a4_group_minmaxcount" ->
      ("SELECT o_custkey, min(o_orderdate) AS first_order, max(o_orderdate) AS last_order, " +
        "CAST(count(o_orderkey) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey"),

    "a6_pivot_sum" ->
      (s"SELECT o_custkey, " +
        s"${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS status_f_amount, " +
        s"${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END")} AS status_o_amount, " +
        s"${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END")} AS status_p_amount, " +
        s"${dsumSql("o_totalprice")} AS total_amount " +
        "FROM orders GROUP BY o_custkey"),

    "mart_orders_full" ->
      (s"""WITH per_order AS (
         |  SELECT l_orderkey,
         |    ${dsumSql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS r_amount,
         |    ${dsumSql("CASE WHEN l_returnflag = 'A' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS a_amount,
         |    ${dsumSql("CASE WHEN l_returnflag = 'N' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS n_amount,
         |    ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS amount
         |  FROM lineitem GROUP BY l_orderkey
         |)
         |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, p.r_amount, p.a_amount, p.n_amount, p.amount
         |FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey""").stripMargin,

    "q1_unique_violations" ->
      ("SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_rows FROM lineitem " +
        "WHERE l_partkey IS NOT NULL GROUP BY l_partkey HAVING count(*) > 1"),

    "q2_not_null_violations" ->
      "SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey IS NULL",

    "q3_accepted_values_violations" ->
      ("SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows FROM events " +
        "WHERE event_type IS NOT NULL AND event_type NOT IN ('purchase', 'click', 'view') " +
        "GROUP BY event_type"),

    "q4_relationship_violations" ->
      ("SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem " +
        "WHERE l_suppkey IS NOT NULL AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey < 5)"),

    "w1_window_topk" ->
      ("""SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
         |  FROM orders
         |) WHERE rnk <= 3""").stripMargin,

    "w5_range_frame" -> // decimal-accumulated: the frame SUM is value-defined,
      // but summation order inside a frame still differs across engines
      ("""SELECT o_custkey, o_orderkey,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS trailing_30d_spend,
         |  CAST(count(*) OVER w AS BIGINT) AS trailing_30d_orders
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""").stripMargin,

    "w4_topk_agg" -> // the heap aggregate answers to w1's window SQL
      ("""SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
         |  FROM orders
         |) WHERE rnk <= 3""").stripMargin,

    "w2_order_limit" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"),

    "j3_full_outer" ->
      ("""WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 800),
         |     o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
         |           FROM orders WHERE o_custkey >= 400 GROUP BY o_custkey)
         |SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.c_name, o.n_orders
         |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey""").stripMargin,

    "w3_window_funcs" ->
      ("""SELECT o_custkey, o_orderkey, o_totalprice,
         |  CAST(rank() OVER w AS INTEGER) AS order_rank,
         |  lag(o_totalprice, 1) OVER w AS prev_price,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""").stripMargin,

    "set1_except" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),

    "set2_intersect" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'P' " +
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),

    "d1_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "a9_unpivot" -> // UNION ALL is the engine-portable unpivot
      (s"""WITH w AS (
         |  SELECT l_returnflag, ${dsumSql("l_quantity")} AS sum_qty,
         |         ${dsumSql("l_extendedprice")} AS sum_price
         |  FROM lineitem GROUP BY l_returnflag
         |)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
         |UNION ALL
         |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM w""").stripMargin,

    "j5_nullsafe_join" ->
      ("""WITH e AS (
         |  SELECT CASE WHEN event_type = 'click' THEN NULL ELSE event_type END AS grp, value
         |  FROM events
         |), a AS (
         |  SELECT grp, CAST(count(*) AS BIGINT) AS n_all FROM e GROUP BY grp
         |), b AS (
         |  SELECT grp, CAST(count(*) AS BIGINT) AS n_high FROM e WHERE value > 50 GROUP BY grp
         |)
         |SELECT a.grp, a.n_all, b.n_high
         |FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp""").stripMargin,

    "o1_null_ordering" ->
      ("""SELECT c_custkey, CAST(n_orders AS BIGINT) AS n_orders FROM (
         |  SELECT c.c_custkey, o.n_orders
         |  FROM customer c LEFT JOIN (
         |    SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
         |  ) o ON c.c_custkey = o.o_custkey
         |)
         |ORDER BY n_orders DESC NULLS FIRST, c_custkey ASC LIMIT 25""").stripMargin,

    "set3_except_all" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),

    "set4_intersect_all" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),

    "x2_string_agg" ->
      ("SELECT o_custkey, string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_ids, " +
        "CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey"),

    "q7_lateral_subquery" -> // identical LATERAL syntax both engines
      ("""SELECT o.o_orderkey, t.top_price, t.n_items
         |FROM orders o,
         |LATERAL (SELECT max(l.l_extendedprice) AS top_price,
         |                CAST(count(*) AS BIGINT) AS n_items
         |         FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) t""").stripMargin,

    "q5_correlated_subquery" ->
      ("""SELECT o.o_orderkey, o.o_custkey
         |FROM orders o
         |WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) *
         |      (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
         |      > (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
         |         FROM orders i WHERE i.o_custkey = o.o_custkey)""").stripMargin,

    "rec1_recursive_cte" -> // deliberately NON-recursive truth: the
      // window formulation must agree with Spark's recursive walk —
      // two independent formulations, not a mirrored recursion; the
      // rn <= 8 filter mirrors the walk's 8-hop bound
      ("""SELECT customer_id, order_id, step FROM (
         |  SELECT o_custkey AS customer_id, o_orderkey AS order_id,
         |    CAST(row_number() OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS step
         |  FROM orders) WHERE step <= 8""").stripMargin,

    "vr1_variant_extract" -> // extraction of what was inserted is
      // identity on the source columns; props mirrors e3's ->> path
      ("""SELECT event_id, event_type AS vtype, value AS vvalue,
         |  CAST(user_id AS VARCHAR) AS tag2,
         |  CAST(props->>'k' AS BIGINT) AS k_val FROM events""").stripMargin,

    "w6_window_breadth" ->
      ("""SELECT o_custkey, o_orderkey,
         |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
         |  percent_rank() OVER w AS pct_rank,
         |  cume_dist() OVER w AS cume,
         |  first_value(o_orderkey) OVER w AS top_order
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)""").stripMargin,

    "sj1_semi_join" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')"),

    "j6_star_join" -> // 7-way star: nation joins twice (customer's and
      // supplier's FK chains); revenue in the dsum exact-decimal contract
      (s"""SELECT r.r_name AS cust_region, cn.n_name AS cust_nation, sn.n_name AS supp_nation,
         |       CAST(count(*) AS BIGINT) AS n_items,
         |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |JOIN region r ON cn.n_regionkey = r.r_regionkey
         |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         |GROUP BY 1, 2, 3""").stripMargin,

    "j7_star_filtered" -> // TPC-H Q5 shape: selective region + date range,
      // local commerce via c_nationkey = s_nationkey on the supplier join
      (s"""SELECT cn.n_name AS nation, CAST(count(*) AS BIGINT) AS n_items,
         |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
         |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |JOIN region r ON cn.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'ASIA'
         |  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o.o_orderdate < TIMESTAMP '1996-01-01'
         |GROUP BY 1""").stripMargin,

    "agg1_stats" ->
      (s"SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty, " +
        s"${dsumSql("l_extendedprice")} / count(*) AS avg_price, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts " +
        "FROM lineitem GROUP BY l_returnflag"),

    "agg4_percentiles" ->
      ("SELECT l_returnflag, " +
        "quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) AS p25_cents, " +
        "quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS p50_cents, " +
        "quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) AS p75_cents " +
        "FROM lineitem GROUP BY l_returnflag"),

    "src1_json_roundtrip" -> // the oracle reads parquet; Spark reads its own JSON export
      (s"SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders, " +
        s"${dsumSql("o_totalprice")} AS total_price FROM orders GROUP BY o_orderstatus"),

    "src2_csv_roundtrip" ->
      (s"SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers, " +
        s"${dsumSql("c_acctbal")} AS total_balance FROM customer GROUP BY c_mktsegment"),

    "src8_orc_roundtrip" -> // same aggregate from parquet: the ORC
      // writer+reader path is what the hash checks
      (s"SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows, " +
        s"${dsumSql("l_extendedprice")} AS sum_price " +
        "FROM lineitem WHERE l_quantity >= 25.0 GROUP BY l_returnflag"),

    "src3_partitioned_roundtrip" ->
      (s"SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders, " +
        s"${dsumSql("o_totalprice")} AS total_price FROM orders " +
        "WHERE o_orderstatus = 'F' GROUP BY o_custkey"),

    "src4_bucketed_join" -> // the oracle joins the flat parquet; Spark
      // reads its own bucketed tables — the layout round-trip is the test
      (s"SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, " +
        s"${dsumSql("o_totalprice")} AS total_price " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"),

    "src5_schema_evolution" -> // the oracle replays the generational split
      // (even keys were written before the status column existed)
      (s"SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'legacy' ELSE o_orderstatus END AS status_merged, " +
        s"CAST(count(*) AS BIGINT) AS n_orders, ${dsumSql("o_totalprice")} AS total_price " +
        "FROM orders GROUP BY 1"),

    "nst1_nested_types" -> // same nested build + scalar extraction; DuckDB
      // map extraction yields a one-element list, hence the [1]
      ("""WITH nested AS (
         |  SELECT {'key': o_orderkey, 'price': o_totalprice} AS os,
         |         map(['full', 'double'],
         |             [CAST(o_totalprice AS DECIMAL(16,2)), CAST(o_totalprice * 2 AS DECIMAL(16,2))]) AS om
         |  FROM orders
         |)
         |SELECT os.key AS o_orderkey, CAST(os.price AS DOUBLE) AS struct_price,
         |       CAST(om['full'][1] AS DOUBLE) AS map_full,
         |       CAST(om['missing'][1] AS DOUBLE) AS map_missing,
         |       array_to_string(map_keys(om), ',') AS keys_csv,
         |       CAST(len(map_values(om)) AS BIGINT) AS n_vals
         |FROM nested""").stripMargin,

    "sk1_salted_join" -> // salting is invisible in the result
      (s"SELECT o.o_custkey, CAST(count(*) AS BIGINT) AS n_items, " +
        s"${dsumSql("l.l_extendedprice")} AS total_price " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY o.o_custkey"),

    "u1_union" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'"),

    "x3_array_set_agg" ->
      ("SELECT o_custkey, array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses, " +
        "CAST(len(list_distinct(list(o_orderpriority))) AS BIGINT) AS n_priorities " +
        "FROM orders GROUP BY o_custkey"),

    "hof1_array_funcs" -> // list_position is NULL-on-absent in DuckDB
      // vs 0 in Spark — coalesce states the shared convention
      ("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
         |  array_to_string(toks[1:3], ' ') AS first3,
         |  list_contains(toks, 'the') AS has_the,
         |  CAST(list_max(list_transform(toks, x -> length(x))) AS BIGINT) AS max_tok_len,
         |  CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS pos_the
         |FROM t""").stripMargin,

    "dt2_timestamp_funcs" -> // isodow mirrors weekday()+1 (Monday=1);
      // epoch // 1e6 mirrors the floor'd integer division
      ("""SELECT event_id, epoch_us(ts) AS epoch_us,
         |  date_trunc('day', ts) AS day_start, date_trunc('hour', ts) AS hour_start,
         |  CAST(to_timestamp(epoch_us(ts) // 1000000) AS TIMESTAMP) AS ts_seconds,
         |  CAST(hour(ts) AS BIGINT) AS h, CAST(minute(ts) AS BIGINT) AS m,
         |  CAST(isodow(ts) AS BIGINT) AS iso_dow
         |FROM events""").stripMargin,

    "pipe2_quality_filter" -> // txt2 + txt10 + txt11 formulations composed
      // under one gate, same thresholds
      ("""WITH t AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS toks, string_split(text, '') AS chars FROM documents
         |), f AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
         |    CASE WHEN len(toks) - 2 >= 1 THEN
         |      round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
         |          i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
         |        / CAST(len(toks) - 2 AS DOUBLE), 4)
         |    ELSE NULL END AS dup3_frac,
         |    CASE WHEN length(text) >= 1 THEN
         |      round(-list_sum(list_transform(list_distinct(chars),
         |        ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
         |              * ln(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars)))), 4)
         |    ELSE NULL END AS char_entropy
         |  FROM t
         |)
         |SELECT * FROM f
         |WHERE n_tokens >= 25 AND stopword_ratio >= 0.05
         |  AND dup3_frac <= 0.05 AND char_entropy >= 2.8""").stripMargin,

    "x1_wordcount" ->
      ("SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) GROUP BY token"),

    "hh3_cms_replay" -> { // row-seeded md5 buckets, counter sums, min
      // over rows — the whole sketch replayed cell for cell
      def bucket(input: String): String =
        s"""((strpos('0123456789abcdef', substring(md5($input), 1, 1)) - 1) * 16
           | + (strpos('0123456789abcdef', substring(md5($input), 2, 1)) - 1))""".stripMargin
      val rowVal = bucket("CAST(r.r AS VARCHAR) || ':' || CAST(l.l_partkey AS VARCHAR)")
      val rowProbe = bucket("CAST(r.r AS VARCHAR) || ':' || CAST(p.l_partkey AS VARCHAR)")
      s"""WITH rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
         |cells AS (
         |  SELECT r.r, $rowVal AS bucket
         |  FROM lineitem l CROSS JOIN rows_ r WHERE l.l_partkey IS NOT NULL
         |), sk AS MATERIALIZED (
         |  SELECT r, bucket, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY 1, 2
         |), probes AS (
         |  SELECT DISTINCT l_partkey FROM lineitem ORDER BY 1 LIMIT 10
         |), pcells AS (
         |  SELECT p.l_partkey, r.r, $rowProbe AS bucket
         |  FROM probes p CROSS JOIN rows_ r
         |), est AS (
         |  SELECT pc.l_partkey, min(coalesce(sk.c, CAST(0 AS BIGINT))) AS est
         |  FROM pcells pc LEFT JOIN sk ON sk.r = pc.r AND sk.bucket = pc.bucket
         |  GROUP BY 1
         |), ex AS (
         |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_cnt
         |  FROM lineitem GROUP BY 1
         |)
         |SELECT e.l_partkey AS part_id, e.est AS est_cnt, ex.exact_cnt
         |FROM est e JOIN ex ON e.l_partkey = ex.l_partkey""".stripMargin
    },

    "hh2_freq_gate" -> // the MG guarantee is a theorem: n_found equals
      // n_guaranteed and recall is exactly 1.0, both re-derived from the
      // exact token counts (k = 32, threshold n/(k+1) = n/33). The exact
      // arm replays the Spark side's deterministic md5-nibble 50% domain
      // sample; n_tokens is the full stream count (the true threshold)
      ("""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
         |), tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM toks
         |), ex AS (
         |  SELECT token, count(*) AS c FROM toks
         |  WHERE substring(md5(token), 1, 1) IN ('0','1','2','3','4','5','6','7')
         |  GROUP BY 1
         |), g AS (
         |  SELECT count(*) AS ng FROM ex, tot WHERE c > CAST(n_tokens AS DOUBLE) / 33.0
         |)
         |SELECT tot.n_tokens, CAST(g.ng AS BIGINT) AS n_guaranteed,
         |       CAST(g.ng AS BIGINT) AS n_found,
         |       CAST(1.0 AS DOUBLE) AS recall
         |FROM tot, g""").stripMargin,

    "dt1_date_parts" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year, " +
        "CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter, " +
        "CAST(month(o_orderdate) AS INTEGER) AS o_month, " +
        "CAST(day(o_orderdate) AS INTEGER) AS o_day, " +
        "CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30, " +
        "CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end FROM orders"),

    "agg5_moments" -> // identical double formula over exact integer sums
      ("""WITH s AS (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |    sum(qc) AS sq, sum(qc * qc) AS sqq,
         |    sum(pc) AS sp, sum(pc * pc) AS spp,
         |    sum(qc * pc) AS sqp
         |  FROM (SELECT l_returnflag,
         |          CAST(round(l_quantity * 100) AS BIGINT) AS qc,
         |          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
         |        FROM lineitem)
         |  GROUP BY l_returnflag
         |)
         |SELECT l_returnflag, n,
         |  (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var_qty_cents2,
         |  sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS stddev_qty_cents,
         |  (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)) /
         |    (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
         |     sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))) AS corr_qty_price
         |FROM s""").stripMargin,

    "agg6_argmax_udaf" -> // same langid/token features as txt3/txt1, argmax per language
      ("""WITH feats AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'and', 'of', 'to', 'a', 'in', 'is'))) AS en_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('der', 'die', 'und', 'das', 'ist', 'ein'))) AS de_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('el', 'la', 'de', 'que', 'y', 'es'))) AS es_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('le', 'la', 'et', 'les', 'des', 'est'))) AS fr_h
         |  FROM documents
         |), langed AS (
         |  SELECT doc_id, n_tokens,
         |    CASE WHEN greatest(en_h, de_h, es_h, fr_h) = 0 THEN 'und'
         |         WHEN en_h = greatest(en_h, de_h, es_h, fr_h) THEN 'en'
         |         WHEN de_h = greatest(en_h, de_h, es_h, fr_h) THEN 'de'
         |         WHEN es_h = greatest(en_h, de_h, es_h, fr_h) THEN 'es'
         |         ELSE 'fr' END AS lang_guess
         |  FROM feats
         |), ranked AS (
         |  SELECT lang_guess, doc_id, n_tokens,
         |    row_number() OVER (PARTITION BY lang_guess ORDER BY n_tokens DESC, doc_id ASC) AS rn
         |  FROM langed
         |)
         |SELECT lang_guess, doc_id, n_tokens FROM ranked WHERE rn = 1""").stripMargin,

    "st2_stream_interval_join" -> // the streaming self-join answers to rj1's oracle
      ("SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b, a.ts AS t_a, b.ts AS t_b " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND epoch_us(b.ts) > epoch_us(a.ts) AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000"),

    "st4_stream_left_interval_join" -> // the outer drain answers to the
      // batch LEFT JOIN: every event appears, followers matched or NULL
      ("SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b, a.ts AS t_a, b.ts AS t_b " +
        "FROM events a LEFT JOIN events b ON a.user_id = b.user_id " +
        "AND epoch_us(b.ts) > epoch_us(a.ts) AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000"),

    "v1_vector_norm" ->
      ("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |n AS (SELECT vec_id, e, sqrt(list_inner_product(e, e)) AS l2 FROM v)
         |SELECT vec_id, round(l2, 4) AS l2_norm, round(e[1] / l2, 4) AS first_unit FROM n""").stripMargin,

    "agg2_rollup" ->
      (s"SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows, " +
        s"${dsumSql("l_quantity")} AS sum_qty " +
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"),

    "agg7_cube" ->
      (s"SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows, " +
        s"${dsumSql("l_extendedprice")} AS sum_price " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"),

    "e4_sliding_window" ->
      (s"""WITH expanded AS (
         |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - i * INTERVAL 30 MINUTE AS window_start,
         |         event_type, value
         |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) probes
         |)
         |SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n_events,
         |       ${dsumSql("value")} AS total_value
         |FROM expanded GROUP BY 1, 2""").stripMargin,

    "txt5_string_funcs" ->
      ("SELECT p_partkey, upper(p_name) AS name_upper, substring(p_name, 1, 5) AS name_prefix, " +
        "concat_ws('/', p_brand, p_type) AS brand_type, " +
        "regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels, " +
        "CAST(strpos(p_name, 'widget') AS BIGINT) AS widget_pos, " +
        "CAST(length(p_name) AS BIGINT) AS name_len FROM part"),

    "txt6_bpe_tokens" ->
      ("SELECT doc_id, CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) " +
        "AS n_bpe_tokens FROM documents"),

    "aj1_asof_join" ->
      ("""WITH last_orders AS (
         |  SELECT o_custkey, o_orderdate AS last_order_date, CAST(max(o_orderkey) AS BIGINT) AS last_order_key
         |  FROM orders GROUP BY o_custkey, o_orderdate
         |)
         |SELECT e.event_id, e.user_id, e.ts, r.last_order_date, r.last_order_key
         |FROM events e ASOF LEFT JOIN last_orders r
         |  ON e.user_id = r.o_custkey AND e.ts >= r.last_order_date""").stripMargin,

    "aj2_asof_native" -> // the custom SparkPlan answers to the same ASOF oracle
      ("""WITH last_orders AS (
         |  SELECT o_custkey, o_orderdate AS last_order_date, CAST(max(o_orderkey) AS BIGINT) AS last_order_key
         |  FROM orders GROUP BY o_custkey, o_orderdate
         |)
         |SELECT e.event_id, e.user_id, e.ts, r.last_order_date, r.last_order_key
         |FROM events e ASOF LEFT JOIN last_orders r
         |  ON e.user_id = r.o_custkey AND e.ts >= r.last_order_date""").stripMargin,

    "rj1_range_join" ->
      ("SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b, a.ts AS t_a, b.ts AS t_b " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND epoch_us(b.ts) > epoch_us(a.ts) AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000"),

    "e1_tumbling_window" ->
      (s"SELECT date_trunc('hour', ts) AS window_start, event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        s"${dsumSql("value")} AS total_value FROM events GROUP BY 1, 2"),

    "e2_sessions" ->
      (s"""WITH lagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events
         |), flagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
         |  FROM lagged
         |), numbered AS (
         |  SELECT user_id, ts, value,
         |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM flagged
         |)
         |SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
         |       CAST(count(*) AS BIGINT) AS n_events, ${dsumSql("value")} AS total_value
         |FROM numbered GROUP BY user_id, session_seq""").stripMargin,

    "e3_json_extract" ->
      "SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_value FROM events",

    "e10_path_analysis" -> // e2's sessionization mirror + a rank filter
      // to the first 5 steps + ordered string_agg — identical to Spark's
      // sort_array-of-structs then '>' join (event_id breaks ts ties)
      ("""WITH lagged AS (
         |  SELECT user_id, event_id, ts, event_type,
         |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events
         |), flagged AS (
         |  SELECT user_id, event_id, ts, event_type,
         |         CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
         |  FROM lagged
         |), numbered AS (
         |  SELECT user_id, event_id, ts, event_type,
         |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM flagged
         |), stepped AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS step
         |  FROM numbered
         |), paths AS (
         |  SELECT user_id, session_seq,
         |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
         |  FROM stepped WHERE step <= 5 GROUP BY user_id, session_seq
         |)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |FROM paths GROUP BY path
         |ORDER BY n_sessions DESC, path LIMIT 20""").stripMargin,

    "st7_stream_static_enrich" -> // the streamed enrichment answers to
      // the plain batch join+aggregate (inner join drops events whose
      // user_id has no customer row)
      (s"""SELECT 'tier_' || CAST(c_custkey % 3 AS VARCHAR) AS tier,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       ${dsumSql("e.value")} AS total_value
         |FROM events e JOIN customer c ON e.user_id = c.c_custkey
         |GROUP BY 1""").stripMargin,

    "st9_stream_cdc_upsert" -> // final table = F base with the %10 keys
      // repriced (+1000) plus the O inserts; the crash-replay no-op is
      // pinned TRUE. The upsert outcome is batch-split-independent
      // because every key appears once across the change set.
      (s"""WITH upd AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         o_totalprice + 1000.0 AS o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderstatus = 'O'
         |), final AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'F'
         |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM upd
         |)
         |SELECT TRUE AS replay_noop, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM final GROUP BY o_orderstatus""").stripMargin,

    "st12_changefeed_merge" -> // the mirror after the merge window:
      // F rows with %10 keys repriced (+1000) plus the O inserts — the
      // same final state as st9, reached through the CHANGE FEED
      // instead of a direct merge; mirrors_source pinned in-engine
      (s"""WITH upd AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         o_totalprice + 1000.0 AS o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderstatus = 'O'
         |), final AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'F'
         |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM upd
         |)
         |SELECT TRUE AS mirrors_source, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM final GROUP BY o_orderstatus""").stripMargin,

    "st10_changefeed_mirror" -> // the mirror tracked three windows:
      // initial F load; delete(key%3=0) + O append; delete(cust%7=0)
      // over base AND appended rows. mirrors_source + replay_noop are
      // pinned in-engine (mirror == source read; re-delivered batchId
      // did not commit).
      (s"""WITH survivors AS (
         |  SELECT o_orderstatus, o_custkey, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'F' AND o_orderkey % 3 <> 0
         |  UNION ALL
         |  SELECT o_orderstatus, o_custkey, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'O'
         |)
         |SELECT TRUE AS mirrors_source, TRUE AS replay_noop, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM survivors WHERE o_custkey % 7 <> 0
         |GROUP BY o_orderstatus""").stripMargin,

    "st13_mirror_refresh" -> // the mirror's final state: the P overwrite
      // minus the post-refresh key%4 delete; quiesce equality, the
      // single refresh commit, and incremental resumption pinned
      // in-engine
      (s"""SELECT TRUE AS mirrors_at_quiesce, TRUE AS one_refresh_commit,
         |       TRUE AS resumes_incremental,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |WHERE o_orderstatus = 'P' AND o_orderkey % 4 <> 0
         |GROUP BY o_orderstatus""").stripMargin,

    "st14_rowid_mirror" -> // the mirror's final state: copy A of every F
      // order, copy B (price +1e6) minus the key%3 deletes, plus the O
      // append; identity-keyed equality pinned in-engine
      (s"""WITH fin AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice + 1000000.0 FROM orders
         |  WHERE o_orderstatus = 'F' AND o_orderkey % 3 <> 0
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
         |)
         |SELECT TRUE AS mirrors_with_duplicates, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM fin GROUP BY o_orderstatus""").stripMargin,

    "st6_manifest_replicate" -> // the replica must hold exactly what the
      // source's three versions shipped — the whole orders table
      (s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "st5_manifest_stream" -> // the streamed manifest versions carry the
      // F create + O append + P append — i.e. the whole orders table;
      // the streaming aggregate answers to the plain batch oracle
      (s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "st1_stream_hourly" -> // the streaming path answers to the same oracle as batch e1
      (s"SELECT date_trunc('hour', ts) AS window_start, event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        s"${dsumSql("value")} AS total_value FROM events GROUP BY 1, 2"),

    "st3_stream_update" -> // single-batch update drain revises every group
      // exactly once — same batch aggregate, same oracle as e1/st1
      (s"SELECT date_trunc('hour', ts) AS window_start, event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        s"${dsumSql("value")} AS total_value FROM events GROUP BY 1, 2"),

    "txt1_token_count" ->
      ("SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(length(text) AS BIGINT) AS n_chars_computed FROM documents"),

    "txt2_quality" ->
      ("""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 4) AS mean_token_len,
         |  round(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio
         |FROM documents""").stripMargin,

    "txt3_langid" ->
      ("""WITH hits AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'and', 'of', 'to', 'a', 'in', 'is'))) AS en_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('der', 'die', 'und', 'das', 'ist', 'ein'))) AS de_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('el', 'la', 'de', 'que', 'y', 'es'))) AS es_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('le', 'la', 'et', 'les', 'des', 'est'))) AS fr_h
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CASE WHEN greatest(en_h, de_h, es_h, fr_h) = 0 THEN 'und'
         |       WHEN en_h = greatest(en_h, de_h, es_h, fr_h) THEN 'en'
         |       WHEN de_h = greatest(en_h, de_h, es_h, fr_h) THEN 'de'
         |       WHEN es_h = greatest(en_h, de_h, es_h, fr_h) THEN 'es'
         |       ELSE 'fr' END AS lang_guess
         |FROM hits""").stripMargin,

    "txt4_fingerprint" ->
      "SELECT doc_id, md5(text) AS content_md5 FROM documents",

    "txt7_rolling_fingerprint" -> // Horner's rule over code points, mod 1e9+7
      ("SELECT doc_id, list_reduce(" +
        "list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))), " +
        "(acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_hash FROM documents"),

    "txt10_repetition" -> // same 3-gram construction as dd2's shingle CTE
      ("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         |SELECT doc_id,
         |  CASE WHEN len(toks) - 2 >= 1 THEN
         |    round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
         |        i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
         |      / CAST(len(toks) - 2 AS DOUBLE), 4)
         |  ELSE NULL END AS dup3_frac
         |FROM t""").stripMargin,

    "txt11_char_entropy" -> // same first-occurrence-ordered histogram fold;
      // round(4) absorbs any reassociation-level fp difference in the sum
      ("""WITH c AS (SELECT doc_id, text, string_split(text, '') AS chars FROM documents)
         |SELECT doc_id,
         |  CASE WHEN length(text) >= 1 THEN
         |    round(-list_sum(list_transform(list_distinct(chars),
         |      ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
         |            * ln(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars)))), 4)
         |  ELSE NULL END AS char_entropy
         |FROM c""").stripMargin,

    "txt8_redact_pii" -> // same planted PII, same stacked regex (RE2 needs
      // the explicit 'g' flag to match Spark's replace-all semantics)
      ("""WITH dirty AS (
         |  SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |    '@example.com ref ' || CAST(doc_id * 10000 + 1234 AS VARCHAR) AS dirty
         |  FROM documents
         |)
         |SELECT doc_id,
         |  regexp_replace(
         |    regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\d{4,}', '<NUM>', 'g') AS clean,
         |  CAST(length(regexp_replace(
         |    regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\d{4,}', '<NUM>', 'g')) AS BIGINT) AS clean_len
         |FROM dirty""").stripMargin,

    "txt9_tfidf" ->
      ("""WITH terms AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
         |), tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
         |), dfq AS (
         |  SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1
         |), tot AS (
         |  SELECT count(*) AS n_docs FROM documents
         |)
         |SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
         |  round(tf.tf * ln(CAST(tot.n_docs + 1 AS DOUBLE) / CAST(dfq.df + 1 AS DOUBLE)), 4) AS tfidf
         |FROM tf JOIN dfq USING (term) CROSS JOIN tot""").stripMargin,

    "smp5_dsir_select" -> // hashed-unigram DSIR replayed: bucket = first
      // 3 md5 nibbles (strpos arithmetic — DuckDB has no conv()), target
      // and raw bucket models with add-one smoothing over 4096 buckets,
      // per-token term join, exact DECIMAL sum, deterministic top-100
      ("""WITH toks AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
         |), feats AS (
         |  SELECT doc_id, lang,
         |         (strpos('0123456789abcdef', substring(md5(w), 1, 1)) - 1) * 256
         |       + (strpos('0123456789abcdef', substring(md5(w), 2, 1)) - 1) * 16
         |       + (strpos('0123456789abcdef', substring(md5(w), 3, 1)) - 1) AS b
         |  FROM toks
         |), cr AS (
         |  SELECT b, count(*) AS cr FROM feats GROUP BY 1
         |), ct AS (
         |  SELECT b, count(*) AS ct FROM feats WHERE lang = 'en' GROUP BY 1
         |), nr AS (
         |  SELECT count(*) AS nr FROM feats
         |), nt AS (
         |  SELECT count(*) AS nt FROM feats WHERE lang = 'en'
         |), term AS (
         |  SELECT cr.b,
         |         round(ln(CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) / (nt.nt + 4096))
         |             - ln(CAST(cr.cr + 1 AS DOUBLE) / (nr.nr + 4096)), 6) AS term
         |  FROM cr LEFT JOIN ct USING (b) CROSS JOIN nr CROSS JOIN nt
         |)
         |SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |       CAST(sum(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS logw
         |FROM feats f JOIN term USING (b)
         |GROUP BY f.doc_id
         |ORDER BY logw DESC, f.doc_id
         |LIMIT 100""").stripMargin,

    "txt17_bpe_segment" -> // the final vocab state of the same replayed
      // rounds, rendered as dot-joined subwords
      bpeSegmentSql(8),

    "cls2_centroid_confusion" -> // fit + assign replayed: decimal-exact
      // centroids, per-(vector, class) squared-L2 decimal sums, argmin
      // with class tie-break, confusion counts
      ("""WITH comps AS (
         |  SELECT vec_id, label, i AS pos, CAST(x AS DOUBLE) AS x
         |  FROM (
         |    SELECT vec_id, label, unnest(range(1, len(embedding) + 1)) AS i, embedding
         |    FROM embeddings
         |  ), LATERAL (SELECT embedding[i] AS x)
         |), cents AS (
         |  SELECT label AS cls, pos,
         |         round(CAST(sum(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) AS centroid
         |  FROM comps GROUP BY 1, 2
         |), dist AS (
         |  SELECT c.vec_id, c.label, ct.cls,
         |         CAST(sum(CAST(round((c.x - ct.centroid) * (c.x - ct.centroid), 8)
         |                       AS DECIMAL(28,8))) AS DECIMAL(28,8)) AS d2
         |  FROM comps c JOIN cents ct USING (pos)
         |  GROUP BY 1, 2, 3
         |), pred AS (
         |  SELECT vec_id, label, cls AS predicted,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cls) AS rn
         |  FROM dist
         |)
         |SELECT label, predicted, CAST(count(*) AS BIGINT) AS n_vectors
         |FROM pred WHERE rn = 1 GROUP BY 1, 2""").stripMargin,

    "v2_label_centroids" -> // same decimal-exact mean per (label, dim)
      ("""SELECT label, i AS pos, CAST(count(*) AS BIGINT) AS n_vectors,
         |       round(CAST(sum(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) AS centroid
         |FROM (
         |  SELECT label, unnest(range(1, len(embedding) + 1)) AS i, embedding
         |  FROM embeddings
         |), LATERAL (SELECT embedding[i] AS x)
         |GROUP BY label, i""").stripMargin,

    "e5_count_anomalies" -> // the division-free z-test replayed on exact
      // integers (DuckDB widens the sums to HUGEINT — same values)
      ("""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |         CAST(count(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 1, 2
         |), st AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
         |         sum(n_events) AS s, sum(n_events * n_events) AS q
         |  FROM hourly GROUP BY 1
         |)
         |SELECT h.event_type, h.hour, h.n_events
         |FROM hourly h JOIN st USING (event_type)
         |WHERE (n_hours * n_events - s) * (n_hours * n_events - s)
         |      > 9 * (n_hours * q - s * s)""").stripMargin,

    "e6_session_window" -> sessionWindowSql,

    "st8_stream_session_window" -> // the streamed session_window drain
      // answers to the SAME gaps-and-islands mirror as batch e6 (the
      // sentinel's user is filtered out and sessions are per-user)
      sessionWindowSql,

    "e7_funnel" -> // each stage re-derived: earliest step-k strictly
      // after the user's step-(k-1) timestamp; conversion time in exact
      // integer micros
      ("""WITH s1 AS (
         |  SELECT user_id, min(ts) AS t_view
         |  FROM events WHERE event_type = 'view' GROUP BY 1
         |), s2 AS (
         |  SELECT e.user_id, s1.t_view, min(e.ts) AS t_click
         |  FROM events e JOIN s1 ON e.user_id = s1.user_id
         |  WHERE e.event_type = 'click' AND e.ts > s1.t_view
         |  GROUP BY 1, 2
         |), s3 AS (
         |  SELECT e.user_id, s2.t_view, s2.t_click, min(e.ts) AS t_purchase
         |  FROM events e JOIN s2 ON e.user_id = s2.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
         |  GROUP BY 1, 2, 3
         |)
         |SELECT user_id, t_view, t_click, t_purchase,
         |       epoch_us(t_purchase) - epoch_us(t_view) AS funnel_micros
         |FROM s3""").stripMargin,

    "q7_freshness" -> // display staleness floored to integer minutes;
      // the VERDICT compares un-floored micros strictly-greater against
      // the thresholds (dbt's rule: exactly warn_after old still passes)
      ("""WITH latest AS (
         |  SELECT event_type, max(ts) AS latest_ts FROM events GROUP BY 1
         |), a AS (
         |  SELECT max(ts) AS anchor FROM events
         |)
         |SELECT event_type, latest_ts,
         |       (epoch_us(anchor) - epoch_us(latest_ts)) // 60000000 AS staleness_minutes,
         |       CASE WHEN epoch_us(anchor) - epoch_us(latest_ts) <= CAST(15 AS BIGINT) * 60000000 THEN 'pass'
         |            WHEN epoch_us(anchor) - epoch_us(latest_ts) <= CAST(60 AS BIGINT) * 60000000 THEN 'warn'
         |            ELSE 'error' END AS freshness_status
         |FROM latest, a""").stripMargin,

    "gr1_pagerank" -> pagerankSql(5),
    "gr5_kcore" -> kcoreSql(65, 6),
    "gr6_ktruss" -> ktrussSql(7, 5),
    "km1_kmeans" -> kmeansSql(8, 2),
    "km2_kcenter" -> kcenterSql(8),
    "cls3_tree" -> treeSql,
    "v4_power_iteration" -> powerIterSql(4),

    // agg9: the replayable HLL — bucket/rho from md5 hex text, register
    // maxes, then linear counting (any empty register) or the α₆₄
    // rational-constant estimate as one HUGEINT division
    "agg11_bottomk_quantiles" -> // the bottom-k sample and its rank
      // quantiles re-derived from the raw rows: same Knuth hash, same
      // (hash, id) selection order, same (value, id) rank order, same
      // ceil(q·n) rank — bit-exact replay of the whole sketch
      ("""WITH h AS (
         |  SELECT o_orderstatus, o_orderkey AS id, CAST(o_totalprice AS DOUBLE) AS v,
         |         ((o_orderkey % 2147483648) * 2654435761) % 4294967296 AS hh
         |  FROM orders
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderstatus ORDER BY hh, id) AS rk FROM h
         |), s AS (
         |  SELECT o_orderstatus, v, id FROM r WHERE rk <= 128
         |), o AS (
         |  SELECT o_orderstatus, v,
         |         row_number() OVER (PARTITION BY o_orderstatus ORDER BY v, id) AS vr,
         |         count(*) OVER (PARTITION BY o_orderstatus) AS n
         |  FROM s
         |)
         |SELECT o_orderstatus,
         |       CAST(max(n) AS BIGINT) AS sample_n,
         |       max(CASE WHEN vr = CAST(ceil(CAST(0.25 AS DOUBLE) * n) AS BIGINT) THEN v END) AS p25,
         |       max(CASE WHEN vr = CAST(ceil(CAST(0.50 AS DOUBLE) * n) AS BIGINT) THEN v END) AS p50,
         |       max(CASE WHEN vr = CAST(ceil(CAST(0.75 AS DOUBLE) * n) AS BIGINT) THEN v END) AS p75,
         |       max(CASE WHEN vr = CAST(ceil(CAST(0.95 AS DOUBLE) * n) AS BIGINT) THEN v END) AS p95
         |FROM o GROUP BY o_orderstatus""").stripMargin,

    "agg9_hll_replay" ->
      s"""WITH b AS (
         |  SELECT l_returnflag AS flag,
         |         ((strpos('0123456789abcdef', substring(md5(CAST(l_partkey AS VARCHAR)),1,1)) - 1) * 16
         |          + (strpos('0123456789abcdef', substring(md5(CAST(l_partkey AS VARCHAR)),2,1)) - 1)) % 64 AS bucket,
         |         substring(md5(CAST(l_partkey AS VARCHAR)), 3, 13) AS t
         |  FROM lineitem WHERE l_partkey IS NOT NULL
         |), z0 AS (
         |  SELECT flag, bucket, t, length(regexp_extract(t, '^0*', 0)) AS z FROM b
         |), rho AS (
         |  SELECT flag, bucket,
         |         CASE WHEN z = 13 THEN CAST(53 AS BIGINT)
         |              ELSE CAST(z * 4 + 1 + CASE substring(t, z + 1, 1)
         |                WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
         |                WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
         |                WHEN '7' THEN 1 ELSE 0 END AS BIGINT) END AS rho
         |  FROM z0
         |), regs AS (
         |  SELECT flag, bucket, max(rho) AS r FROM rho GROUP BY 1, 2
         |), agg AS (
         |  SELECT flag, count(*) AS nb,
         |         sum(CAST(1 AS BIGINT) << CAST(53 - r AS INT)) AS sp
         |  FROM regs GROUP BY 1
         |), ex AS (
         |  SELECT l_returnflag AS flag,
         |         CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
         |  FROM lineitem GROUP BY 1
         |)
         |SELECT a.flag AS l_returnflag,
         |       CAST(64 - a.nb AS BIGINT) AS n_zero_registers,
         |       CAST(CASE WHEN a.nb < 64
         |         THEN CAST(64 * CAST(round(ln(64.0 / (64 - a.nb)) * 1000000) AS BIGINT) AS HUGEINT)
         |         ELSE CAST('${graft.ops.SketchOps.RawNumerator}' AS HUGEINT) // CAST(a.sp AS HUGEINT)
         |       END AS BIGINT) AS est_micro,
         |       ex.exact_parts
         |FROM agg a JOIN ex ON a.flag = ex.flag""".stripMargin,

    // gr4: the same co-occurrence CTEs as gr1, then degree-ordered
    // orientation ((deg, id)-smaller endpoint → larger), wedges joined
    // at the shared source with the (db, b) row order, closure on the
    // oriented (y, z) arc — each triangle appears exactly once, corners
    // unnested and counted.
    "gr4_triangles" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |), edges AS (
        |  SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
        |), deg AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1
        |), ore AS (
        |  SELECT CASE WHEN (d1.deg, p.u) < (d2.deg, p.v) THEN p.u ELSE p.v END AS a,
        |         CASE WHEN (d1.deg, p.u) < (d2.deg, p.v) THEN p.v ELSE p.u END AS b,
        |         CASE WHEN (d1.deg, p.u) < (d2.deg, p.v) THEN d2.deg ELSE d1.deg END AS db
        |  FROM pairs p JOIN deg d1 ON d1.u = p.u JOIN deg d2 ON d2.u = p.v
        |), tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM ore e1
        |  JOIN ore e2 ON e1.a = e2.a AND (e1.db, e1.b) < (e2.db, e2.b)
        |  JOIN ore e3 ON e3.a = e1.b AND e3.b = e2.b
        |), corners AS (
        |  SELECT unnest([x, y, z]) AS part_id FROM tri
        |)
        |SELECT part_id, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM corners GROUP BY 1
        |ORDER BY n_triangles DESC, part_id LIMIT 20""".stripMargin,

    "txt18_wordpiece_learn" -> wordpieceSql(8),

    "txt20_unigram_learn" -> unigramSql(2),

    "txt21_unigram_segment" -> unigramSegmentSql(2),

    "gr2_label_propagation" -> labelPropSql(4),

    "gr3_hits" -> hitsSql(3),

    "smp6_temperature_mixture" -> // the T=0.5 quota derivation replayed:
      // IEEE sqrt, round-6 weights summed as exact DECIMAL (float
      // addition of the weights would be order-dependent), the same
      // left-assoc double expression, Knuth-hash ranks
      ("""WITH counts AS (
         |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY 1
         |), w AS (
         |  SELECT lang, c, CAST(round(sqrt(c), 6) AS DECIMAL(18,6)) AS w FROM counts
         |), q AS (
         |  SELECT lang,
         |         CAST(least(c, floor(0.5 * (SELECT sum(c) FROM w) * CAST(w AS DOUBLE)
         |              / CAST((SELECT sum(w) FROM w) AS DOUBLE))) AS BIGINT) AS n_keep
         |  FROM w
         |), ranked AS (
         |  SELECT doc_id, lang,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296, doc_id) AS rk
         |  FROM documents
         |)
         |SELECT r.doc_id, r.lang
         |FROM ranked r JOIN q USING (lang) WHERE r.rk <= q.n_keep""").stripMargin,

    "dd9_semdedup" -> // the WHOLE SemDeDup pipeline replayed: ~sqrt(N)
      // Knuth-hash-thresholded seeds (min-id always in), nearest-seed
      // assignment at round-6 cosine with smaller-seed tie-break,
      // within-cluster round-4 cosine pairs, greedy min-id removal
      ("""WITH nn AS (
         |  SELECT count(*) AS n,
         |         greatest(8, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k,
         |         CAST(min(vec_id) AS BIGINT) AS min_id
         |  FROM embeddings
         |), thr AS (
         |  SELECT min_id, CAST(CAST(k AS HUGEINT) * 4294967296 // n AS BIGINT) AS thr FROM nn
         |), e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |), seeds AS (
         |  SELECT vec_id AS seed_id, v AS sv FROM e, thr
         |  WHERE (((vec_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 < thr
         |     OR vec_id = min_id
         |), scored AS (
         |  SELECT e.vec_id, s.seed_id,
         |         round(list_inner_product(e.v, s.sv) /
         |               (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(s.sv, s.sv))), 6) AS sim
         |  FROM e CROSS JOIN seeds s
         |), assign AS (
         |  SELECT vec_id, seed_id AS cluster FROM (
         |    SELECT vec_id, seed_id,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, seed_id) AS rn
         |    FROM scored) WHERE rn = 1
         |), cl AS (
         |  SELECT a.cluster, e.vec_id AS id, e.v FROM assign a JOIN e ON a.vec_id = e.vec_id
         |), pairs AS (
         |  SELECT a.cluster, a.id AS id_a, b.id AS id_b
         |  FROM cl a JOIN cl b ON a.cluster = b.cluster AND a.id < b.id
         |  WHERE round(list_inner_product(a.v, b.v) /
         |        (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 4) >= 0.4
         |), sizes AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS n_vectors FROM cl GROUP BY 1
         |), rem AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS n_dup_pairs,
         |         CAST(count(DISTINCT id_b) AS BIGINT) AS n_removed,
         |         CAST(min(id_b) AS BIGINT) AS min_removed
         |  FROM pairs GROUP BY 1
         |)
         |SELECT s.cluster, s.n_vectors,
         |       coalesce(r.n_dup_pairs, 0) AS n_dup_pairs,
         |       coalesce(r.n_removed, 0) AS n_removed,
         |       r.min_removed
         |FROM sizes s LEFT JOIN rem r ON s.cluster = r.cluster""").stripMargin,

    "q8_lateral_join" -> // the same LATERAL shape verbatim — DuckDB
      // executes the correlated subquery natively
      ("""SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
         |FROM customer c,
         |LATERAL (
         |  SELECT o_orderkey, o_totalprice FROM orders
         |  WHERE o_custkey = c.c_custkey
         |  ORDER BY o_totalprice DESC, o_orderkey
         |  LIMIT 2
         |) o""").stripMargin,

    "w7_latest_per_key" -> // the window formulation of the max(struct)
      // aggregate: (ts desc, event_id desc) is a total order
      ("""SELECT user_id, ts, event_id, event_type, value FROM (
         |  SELECT user_id, ts, event_id, event_type, value,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events) WHERE rn = 1""").stripMargin,

    "e8_retention_cohorts" -> // cohort week from min ts, offsets as
      // integer day-difference div 7; count(*) over the distinct
      // (user, week) frame IS the distinct-user count per cell
      ("""WITH cohort AS (
         |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
         |  FROM events GROUP BY 1
         |), active AS (
         |  SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
         |  FROM events
         |)
         |SELECT cohort_week,
         |       date_diff('day', cohort_week, activity_week) // 7 AS week_offset,
         |       CAST(count(*) AS BIGINT) AS n_users
         |FROM active JOIN cohort USING (user_id)
         |GROUP BY 1, 2""").stripMargin,

    "e9_attribution" -> // the same exact-integer credit arithmetic:
      // micros, truncating //, first/last by row_number over (ts, id) —
      // the window form of Spark's min/max-of-struct (no ties survive
      // because event_id is unique)
      ("""WITH conv AS (
         |  SELECT user_id, event_id AS conv_id, ts AS t_conv,
         |         CAST(round(value * 1000000) AS BIGINT) AS v_micro
         |  FROM events WHERE event_type = 'purchase'
         |), touch AS (
         |  SELECT user_id, event_id AS touch_id, ts AS t_touch,
         |         event_type AS channel
         |  FROM events WHERE event_type IN ('view', 'click', 'signup')
         |), joined AS (
         |  SELECT conv_id, v_micro, touch_id, t_touch, channel
         |  FROM conv JOIN touch USING (user_id)
         |  WHERE t_touch < t_conv
         |    AND t_touch >= t_conv - INTERVAL 7 DAY
         |), ranked AS (
         |  SELECT *,
         |    count(*) OVER (PARTITION BY conv_id) AS n,
         |    row_number() OVER (PARTITION BY conv_id
         |                       ORDER BY t_touch, touch_id) AS rn_first,
         |    row_number() OVER (PARTITION BY conv_id
         |                       ORDER BY t_touch DESC, touch_id DESC) AS rn_last
         |  FROM joined
         |), credited AS (
         |  SELECT channel,
         |    CASE WHEN rn_first = 1 THEN v_micro ELSE 0 END AS first_micro,
         |    CASE WHEN rn_last = 1 THEN v_micro ELSE 0 END AS last_micro,
         |    v_micro // n AS linear_micro,
         |    CASE WHEN n = 1 THEN v_micro
         |         WHEN n = 2 THEN v_micro // 2
         |         WHEN rn_first = 1 OR rn_last = 1 THEN (v_micro * 2) // 5
         |         ELSE (v_micro // 5) // (n - 2) END AS position_micro
         |  FROM ranked
         |)
         |SELECT channel, CAST(count(*) AS BIGINT) AS n_credited,
         |       CAST(sum(first_micro) AS DOUBLE) AS first_touch_micro,
         |       CAST(sum(last_micro) AS DOUBLE) AS last_touch_micro,
         |       CAST(sum(linear_micro) AS DOUBLE) AS linear_micro,
         |       CAST(sum(position_micro) AS DOUBLE) AS position_micro
         |FROM credited GROUP BY channel""").stripMargin,

    "v3_random_projection" -> // the ±1 matrix re-derived from md5
      // parity, the decimal sums replayed; the exact decimal casts to
      // double UNROUNDED (the dsum convention)
      ("""WITH comps AS (
         |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS j, embedding
         |  FROM embeddings
         |), c2 AS (
         |  -- cast THROUGH double: Spark's float->decimal goes via the
         |  -- double expansion, DuckDB's direct float cast does not —
         |  -- they disagree at dp8 for ~17% of floats
         |  SELECT vec_id, j, CAST(CAST(embedding[j] AS DOUBLE) AS DECIMAL(18,8)) AS xd FROM comps
         |), dims AS (
         |  SELECT unnest(range(1, 9)) AS i
         |), terms AS (
         |  SELECT vec_id, i,
         |         CASE WHEN substring(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1)
         |                   IN ('0','2','4','6','8','a','c','e')
         |              THEN xd ELSE -xd END AS term
         |  FROM c2 CROSS JOIN dims
         |)
         |SELECT vec_id, i AS proj_dim,
         |       CAST(sum(term) AS DOUBLE) AS value
         |FROM terms GROUP BY 1, 2""").stripMargin,

    "lake13_restore" -> // the restored tip must serve the FULL table
      // (v2's content) even though v3 overwrote it away; restore is one
      // metadata commit landing as version 4
      (s"""SELECT TRUE AS restored_as_v4, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "lake14_history" -> // every version's exact row count re-derived
      // from the source filters that built it
      ("""SELECT CAST(1 AS BIGINT) AS version, 'create' AS operation,
         |       (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 2 = 0) AS n_rows
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), 'append',
         |       (SELECT CAST(count(*) AS BIGINT) FROM orders)
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), 'delete',
         |       (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE NOT (o_totalprice < 50000.0))""").stripMargin,

    "lake15_column_mapping" -> // the mapped table must serve the FULL
      // content under the new logical names; rename is pinned
      // metadata-only and stats-pruning is pinned alive by the flags
      (s"""SELECT TRUE AS rename_metadata_only, TRUE AS pruned_after_rename,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price,
         |       min(o_orderkey) AS min_order,
         |       max(o_orderkey) AS max_order
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "lake18_drop_column" -> // table = all orders (priority NULL — the
      // drop) plus the 5 smallest keys re-appended with priority under
      // the re-added column; drop is pinned metadata-only and the
      // resurrection refusal is pinned by the flags
      (s"""WITH t AS (
         |  SELECT o_orderstatus, o_totalprice, CAST(NULL AS VARCHAR) AS prio
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice, o_orderpriority AS prio
         |  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 5)
         |)
         |SELECT TRUE AS drop_metadata_only, TRUE AS resurrect_refused,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price,
         |       CAST(sum(CASE WHEN prio IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_prio_set
         |FROM t GROUP BY o_orderstatus""").stripMargin,

    "txt24_textrank" -> textrankSql(3),

    "txt23_pmi" -> // doc-level pair counts, word doc-frequencies, one
      // 6dp-ln per pair — the same double expression text both engines
      // evaluate: CAST(cxy AS DOUBLE) * n / (c1 * c2)
      """WITH dw AS MATERIALIZED (
        |  SELECT DISTINCT did, w FROM (
        |    SELECT doc_id AS did, unnest(string_split(text, ' ')) AS w
        |    FROM documents)
        |), cw AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cw FROM dw GROUP BY 1
        |), nn AS (
        |  SELECT CAST(count(DISTINCT did) AS BIGINT) AS n FROM dw
        |), pairs AS (
        |  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS cxy
        |  FROM dw a JOIN dw b ON a.did = b.did AND a.w < b.w
        |  GROUP BY 1, 2 HAVING count(*) >= 5
        |)
        |SELECT p.w1, p.w2, p.cxy,
        |       CAST(round(ln(CAST(p.cxy AS DOUBLE) * nn.n / (c1.cw * c2.cw)) * 1000000) AS BIGINT) AS pmi_micro
        |FROM pairs p
        |JOIN cw c1 ON c1.w = p.w1
        |JOIN cw c2 ON c2.w = p.w2, nn
        |ORDER BY pmi_micro DESC, w1, w2 LIMIT 20""".stripMargin,

    "ret3_mmr" -> mmrOracleSql,

    "ret2_rrf" -> // both legs re-derived in full (BM25 = ret1's exact
      // CTEs with the 3 query docs' own terms, self excluded; cosine =
      // ann1's formula), then the fusion: contribution 1000000 // (60 +
      // rank), absent legs 0, top-10 by (rrf desc, doc_id)
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), lens AS MATERIALIZED (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks GROUP BY 1
        |), tf AS MATERIALIZED (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
        |), dft AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS bigl,
        |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n
        |  FROM toks
        |), q AS (
        |  SELECT DISTINCT doc_id AS query_id, term
        |  FROM toks WHERE doc_id < 3
        |), idf AS (
        |  SELECT d.term,
        |         CAST(round(ln((2.0 * tot.n + 2.0) / (2.0 * d.df + 1.0)) * 1000000) AS BIGINT) AS idf_micro,
        |         tot.bigl, tot.n
        |  FROM dft d, tot
        |), terms AS (
        |  SELECT q.query_id, tf.doc_id,
        |         CAST((CAST(i.idf_micro AS HUGEINT) * 22 * tf.tf * i.bigl)
        |              // (CAST(10 AS HUGEINT) * tf.tf * i.bigl + CAST(3 AS HUGEINT) * i.bigl
        |                  + CAST(9 AS HUGEINT) * l.len * i.n) AS BIGINT) AS term_micro
        |  FROM q JOIN idf i ON q.term = i.term
        |  JOIN tf ON tf.term = q.term
        |  JOIN lens l ON l.doc_id = tf.doc_id
        |  WHERE tf.doc_id <> q.query_id
        |), lexscore AS (
        |  SELECT query_id, doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro
        |  FROM terms GROUP BY 1, 2
        |), lex AS (
        |  SELECT query_id, doc_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY score_micro DESC, doc_id) AS rnk
        |  FROM lexscore QUALIFY rnk <= 20
        |), qv AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 3
        |), semscore AS (
        |  SELECT q.query_id, c.vec_id AS doc_id,
        |         round(list_inner_product(q.qv, c.embedding::DOUBLE[]) /
        |               (sqrt(list_inner_product(q.qv, q.qv)) *
        |                sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4) AS score
        |  FROM qv q CROSS JOIN embeddings c WHERE c.vec_id <> q.query_id
        |), sem AS (
        |  SELECT query_id, doc_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY score DESC, doc_id) AS rnk
        |  FROM semscore QUALIFY rnk <= 20
        |), fused AS (
        |  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
        |         COALESCE(l.doc_id, s.doc_id) AS doc_id,
        |         COALESCE(1000000 // (60 + l.rnk), 0)
        |           + COALESCE(1000000 // (60 + s.rnk), 0) AS rrf_micro
        |  FROM lex l FULL OUTER JOIN sem s
        |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
        |)
        |SELECT query_id, doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |                               ORDER BY rrf_micro DESC, doc_id) AS INTEGER) AS rnk
        |FROM fused QUALIFY rnk <= 10""".stripMargin,

    "ret1_bm25" -> // tf/df/totals re-derived, idf under the 6dp-ln
      // contract, the rational saturation term as one HUGEINT division,
      // top-5 per query by (score desc, doc_id)
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), lens AS MATERIALIZED (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks GROUP BY 1
        |), tf AS MATERIALIZED (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
        |), dft AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS bigl,
        |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n
        |  FROM toks
        |), q(query_id, term) AS (
        |  SELECT * FROM (VALUES
        |    ('q1', 'spark'), ('q1', 'merge'), ('q1', 'filter'),
        |    ('q2', 'window'), ('q2', 'scan'),
        |    ('q3', 'stream'), ('q3', 'customer'), ('q3', 'data')) v
        |), idf AS (
        |  SELECT d.term,
        |         CAST(round(ln((2.0 * tot.n + 2.0) / (2.0 * d.df + 1.0)) * 1000000) AS BIGINT) AS idf_micro,
        |         tot.bigl, tot.n
        |  FROM dft d, tot
        |), terms AS (
        |  SELECT q.query_id, tf.doc_id,
        |         CAST((CAST(i.idf_micro AS HUGEINT) * 22 * tf.tf * i.bigl)
        |              // (CAST(10 AS HUGEINT) * tf.tf * i.bigl + CAST(3 AS HUGEINT) * i.bigl
        |                  + CAST(9 AS HUGEINT) * l.len * i.n) AS BIGINT) AS term_micro
        |  FROM q JOIN idf i ON q.term = i.term
        |  JOIN tf ON tf.term = q.term
        |  JOIN lens l ON l.doc_id = tf.doc_id
        |), scores AS (
        |  SELECT query_id, doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro
        |  FROM terms GROUP BY 1, 2
        |), ranked AS (
        |  SELECT query_id, doc_id, score_micro,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY score_micro DESC, doc_id) AS rn
        |  FROM scores
        |)
        |SELECT query_id, doc_id, score_micro FROM ranked WHERE rn <= 5""".stripMargin,

    "lake27_cdf_mor" -> // inserts = odd keys not divisible by 7
      // (add-then-delete nets to zero); deletes = cursor-visible even
      // keys divisible by 7; reconciliation pinned in-key
      (s"""WITH feed AS (
         |  SELECT 'insert' AS change_type, o_orderstatus, o_totalprice
         |  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 7 <> 0
         |  UNION ALL
         |  SELECT 'delete' AS change_type, o_orderstatus, o_totalprice
         |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 7 = 0
         |)
         |SELECT TRUE AS reconciles, change_type, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM feed GROUP BY change_type, o_orderstatus""").stripMargin,

    "lake29_compact_small" -> // content is maintenance-invariant: F ∪ O
      // minus the %7 MOR delete; the packing/selectivity/purge behavior
      // is pinned in-engine
      (s"""SELECT TRUE AS packed_tail_only, TRUE AS vector_materialized,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |WHERE o_orderstatus IN ('F', 'O') AND o_orderkey % 7 <> 0
         |GROUP BY o_orderstatus""").stripMargin,

    "lake30_ivm_total" -> // the maintained mart = aggregate of the final
      // source state: F minus cust%5 MOR-deletes, surviving %10 keys
      // repriced (+1000), plus the O inserts; rebuild-equality and
      // replay-no-op pinned in-engine
      (s"""WITH fkeep AS (
         |  SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'F' AND o_custkey % 5 <> 0
         |), final AS (
         |  SELECT o_orderstatus,
         |         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0
         |              ELSE o_totalprice END AS v
         |  FROM fkeep
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice AS v FROM orders
         |  WHERE o_orderstatus = 'O'
         |)
         |SELECT TRUE AS matches_rebuild, TRUE AS replay_noop,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("v")} AS total_price
         |FROM final GROUP BY o_orderstatus""").stripMargin,

    "lake32_minmax_ivm" -> // the maintained min/max mart must equal the
      // from-scratch aggregate over the final state: orders plus the
      // repriced pmod-9 slice, minus everything above 400000; fold /
      // recompute / replay behavior pinned in-engine
      ("""WITH plus AS (
         |  SELECT o_orderstatus, o_totalprice + 500000.0 AS p FROM orders
         |  WHERE ((o_orderkey % 9) + 9) % 9 = 4
         |), base AS (
         |  SELECT o_orderstatus, o_totalprice AS p FROM orders
         |  UNION ALL SELECT o_orderstatus, p FROM plus
         |), fin AS (
         |  SELECT * FROM base WHERE NOT (p > 400000.0)
         |)
         |SELECT TRUE AS insert_fold, TRUE AS recompute_fired,
         |       TRUE AS replay_noop_and_matches,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       min(p) AS min_price, max(p) AS max_price
         |FROM fin GROUP BY o_orderstatus""").stripMargin,

    "lake33_join_ivm_total" -> // the maintained join mart = join of the
      // FINAL fact states: A = (F ∪ O orders) minus the custkey%7 MOR
      // deletes, F rows repriced (+1000) at orderkey%10; B = customers
      // outside BUILDING. Rebuild-equality and replay-no-op pinned
      // in-engine; the oracle replays the final join aggregate.
      (s"""WITH a AS (
         |  SELECT o_custkey,
         |         CASE WHEN o_orderstatus = 'F' AND o_orderkey % 10 = 0
         |              THEN o_totalprice + 1000.0 ELSE o_totalprice END AS v
         |  FROM orders
         |  WHERE o_orderstatus IN ('F', 'O') AND o_custkey % 7 <> 0
         |), b AS (
         |  SELECT c_custkey, c_mktsegment FROM customer
         |  WHERE c_mktsegment <> 'BUILDING'
         |)
         |SELECT TRUE AS matches_rebuild, TRUE AS replay_noop,
         |       c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
         |       ${dsumSql("v")} AS total_price
         |FROM a JOIN b ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""").stripMargin,

    "lake31_log_tiering" -> // storage form and vacuum materialization
      // pinned in-engine; the oracle re-derives the time-travel prefix
      // (slices 0..6 of the pmod-14 cut) and the tip aggregate
      (s"""SELECT TRUE AS delta_forms, TRUE AS delta_small,
         |       TRUE AS vacuum_checkpointed,
         |       (SELECT CAST(count(*) AS BIGINT) FROM orders
         |        WHERE ((o_orderkey % 14) + 14) % 14 <= 6) AS n_at_v7,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "lake34_segmented_log" -> // the two-tier storage form, the metered
      // O(delta) append contract, pointer carry, and the cold segmented
      // sidecar read are pinned in-engine; the face is the tip content,
      // which is the whole orders table (all 11 pmod slices appended)
      (s"""SELECT TRUE AS create_segmented, TRUE AS appends_zero_full_renders,
         |       TRUE AS appends_serialize_adds_only,
         |       TRUE AS checkpoint_carries_segments,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "lake35_two_tier_pruning" -> // the meter literals pin the two-tier
      // contract (the 8-member segment excluded by its pointer rollup
      // with zero per-file work; only the 2-member segment + 2 tail
      // files evaluated; exactly the covering file kept); the row
      // content is the probed order, re-derived by rank arithmetic over
      // the distinct keys — integer division matches the Spark side
      ("""WITH k AS (
         |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
         |         count(*) OVER () AS c
         |  FROM (SELECT DISTINCT o_orderkey FROM orders)
         |), probe AS (
         |  SELECT o_orderkey FROM k WHERE rn = (8 * c) // 12
         |)
         |SELECT CAST(4 AS BIGINT) AS files_evaluated,
         |       CAST(1 AS BIGINT) AS segments_excluded,
         |       CAST(1 AS BIGINT) AS files_kept,
         |       o.o_orderkey, o.o_orderstatus,
         |       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
         |FROM orders o JOIN probe USING (o_orderkey)""").stripMargin,

    "lake37_cold_pruned_read" -> // the cold plan's load counts are the
      // face literals (one surviving segment for the mid probe, zero
      // for the tail probe); the rows are the two probed orders
      ("""WITH k AS (
         |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
         |         count(*) OVER () AS c
         |  FROM (SELECT DISTINCT o_orderkey FROM orders)
         |), probes AS (
         |  SELECT o_orderkey FROM k WHERE rn = (8 * c) // 12 OR rn = (11 * c) // 12
         |)
         |SELECT CAST(1 AS BIGINT) AS segment_loads_mid,
         |       CAST(0 AS BIGINT) AS segment_loads_tail,
         |       o.o_orderkey, o.o_orderstatus,
         |       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
         |FROM orders o JOIN probes USING (o_orderkey)""").stripMargin,

    "lake38_prune_sidecar" -> // the first cold probe decodes the pointer
      // chain exactly once (and persists the .pruneidx sidecar); the
      // second cold process decodes ZERO pointer bytes and plans the
      // identical file set; the rows are the mid-range probe
      ("""WITH k AS (
         |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
         |         count(*) OVER () AS c
         |  FROM (SELECT DISTINCT o_orderkey FROM orders)
         |), probe AS (
         |  SELECT o_orderkey FROM k WHERE rn = (8 * c) // 12
         |)
         |SELECT CAST(1 AS BIGINT) AS pointer_decodes_first,
         |       CAST(0 AS BIGINT) AS pointer_decodes_second,
         |       TRUE AS sidecar_plan_identical,
         |       o.o_orderkey, o.o_orderstatus,
         |       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
         |FROM orders o JOIN probe USING (o_orderkey)""").stripMargin,

    "lake39_tip_watermark" -> // a maintenance window's manifestMeta-call
      // count at history depth ~7 equals the depth-~2 count (the tip
      // carries every txn-* watermark, max-wins) and stays under the
      // small-constant bound; content = probes per window slice
      ("""WITH probes AS (
         |  SELECT doc_id AS probe_id
         |  FROM documents WHERE doc_id < 200 AND length(text) >= 20
         |)
         |SELECT TRUE AS tip_watermark_flat, TRUE AS window_reads_bounded,
         |       probe_id % 8 AS window_slice,
         |       CAST(count(*) AS BIGINT) AS n_probes,
         |       min(probe_id) AS first_probe
         |FROM probes GROUP BY probe_id % 8""").stripMargin,

    "lake36_checkpoint_ledger" -> // an appends-only checkpoint visits
      // exactly the 10 tail members (clean segments carry by name); the
      // cold-resolved content is the whole orders table (all 20 slices)
      (s"""SELECT CAST(10 AS BIGINT) AS checkpoint_member_visits,
         |       o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "lake28_row_tracking" -> // the face is the post-lifecycle content
      // (everything but the %3 deletes); id uniqueness and rewrite
      // preservation are pinned in-engine as booleans
      (s"""SELECT TRUE AS ids_preserved, TRUE AS ids_unique, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders WHERE o_orderkey % 3 <> 0
         |GROUP BY o_orderstatus""").stripMargin,

    "st11_changefeed_optimize" -> // the mirror tracked: initial F load;
      // then delete(key%3=0) + COMPACT (empty delta, positions moved) +
      // O append in one window; mirrors_source pinned in-engine
      (s"""WITH final AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'F' AND o_orderkey % 3 <> 0
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderstatus = 'O'
         |)
         |SELECT TRUE AS mirrors_source, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM final GROUP BY o_orderstatus""").stripMargin,

    "lake26_multi_txn" -> // after two atomic (append fact, overwrite
      // mart) transactions the fact holds all three thirds, so the
      // final mart is just the full aggregate; per-cut consistency is
      // pinned in-key
      (s"""SELECT TRUE AS all_cuts_consistent, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "lake25_generated" -> // the engine-computed o_year must equal the
      // declared expression on every row, so the oracle just computes
      // year(o_orderdate) itself over the same three batches
      (s"""WITH rows AS (
         |  SELECT o_orderdate, o_totalprice FROM orders
         |  UNION ALL
         |  SELECT o_orderdate, o_totalprice FROM orders WHERE o_orderkey % 10 = 3
         |  UNION ALL
         |  SELECT o_orderdate, o_totalprice FROM orders WHERE o_orderkey % 10 = 4
         |)
         |SELECT TRUE AS violation_refused,
         |       CAST(year(o_orderdate) AS INT) AS o_year,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM rows GROUP BY 2""").stripMargin,

    "lake24_delete_mor" -> // survivors = NOT(pred1 IS TRUE) AND
      // NOT(pred2 IS TRUE) plus the post-delete append; the SAME
      // aggregate must hold in both phases (anti-join read and
      // materialized read) — the phase cross join replays that
      (s"""WITH survivors AS (
         |  SELECT * FROM orders
         |  WHERE NOT (o_orderkey % 7 = 0)
         |    AND NOT (o_orderstatus = 'P' AND o_orderkey % 2 = 1)
         |  UNION ALL
         |  SELECT * REPLACE (o_orderkey + 1000000000 AS o_orderkey)
         |  FROM orders WHERE o_orderkey % 100 = 0
         |), agg AS (
         |  SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |         ${dsumSql("o_totalprice")} AS total_price
         |  FROM survivors GROUP BY o_orderstatus
         |)
         |SELECT TRUE AS zero_new_files, TRUE AS purged_clean,
         |       p.phase, a.o_orderstatus, a.n_orders, a.total_price
         |FROM agg a CROSS JOIN (VALUES ('mor'), ('purged')) AS p(phase)""").stripMargin,

    "lake23_incr_join" -> // every maintenance pass's delta re-derived:
      // boot = F×even, step1 = O×even (B hadn't advanced), step2 =
      // (F∪O)×odd, step3 = P×all, no-op = 0; final mart = the full join
      (s"""WITH j AS (
         |  SELECT o.o_orderstatus AS st, o.o_totalprice AS tp,
         |         c.c_custkey AS ck, c.c_mktsegment AS seg
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |)
         |SELECT
         |  (SELECT count(*) FROM j WHERE st = 'F' AND ck % 2 = 0) AS boot_rows,
         |  (SELECT count(*) FROM j WHERE st = 'O' AND ck % 2 = 0) AS step1_rows,
         |  (SELECT count(*) FROM j WHERE st IN ('F', 'O') AND ck % 2 = 1) AS step2_rows,
         |  (SELECT count(*) FROM j WHERE st = 'P') AS step3_rows,
         |  CAST(0 AS BIGINT) AS noop_rows,
         |  seg AS c_mktsegment,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  ${dsumSql("tp")} AS total_price
         |FROM j GROUP BY seg""").stripMargin,

    "lake22_forget" -> // the surviving table = orders minus the
      // min-custkey subject; both erasure proofs pinned
      (s"""SELECT TRUE AS history_gone, TRUE AS physically_gone,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |WHERE o_custkey <> (SELECT min(o_custkey) FROM orders)
         |GROUP BY o_orderstatus""").stripMargin,

    "lake21_time_travel_ts" -> // the as-of read serves the even half
      // only; boundary resolution pinned
      (s"""SELECT TRUE AS resolved_boundary, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders WHERE o_orderkey % 2 = 0
         |GROUP BY o_orderstatus""").stripMargin,

    "lake20_spec_evolution" -> // content = all orders; the four
      // evolution invariants are pinned by the flags
      (s"""SELECT TRUE AS evolve_metadata_only, TRUE AS new_files_prune,
         |       TRUE AS old_files_keep_biased, TRUE AS old_transform_prunes,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "lake19_check_constraints" -> // table = all orders plus the 5
      // smallest keys re-appended (the clean append); both refusals
      // pinned by the flags
      (s"""WITH t AS (
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice
         |  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 5)
         |)
         |SELECT TRUE AS add_refused, TRUE AS write_refused,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM t GROUP BY o_orderstatus""").stripMargin,

    "lake17_stats_rollup" -> // the rollup's routing verdicts are pinned
      // TRUE; the content aggregate re-derives from the source
      (s"""SELECT TRUE AS skip_past_max, TRUE AS skip_null,
         |       TRUE AS keep_point, TRUE AS count_fast_path,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "lake16_shallow_clone" -> // clone = orders minus keys < 100 (the
      // CoW delete); source = orders plus its 5 smallest keys appended
      // again — each side re-derived independently
      (s"""SELECT TRUE AS clone_zero_copy, TRUE AS pruned_on_clone,
         |       'clone' AS side, CAST(count(*) AS BIGINT) AS n_rows,
         |       ${dsumSql("o_totalprice")} AS total_price,
         |       min(o_orderkey) AS min_key
         |FROM orders WHERE NOT (o_orderkey < 100)
         |UNION ALL
         |SELECT TRUE, TRUE, 'source', CAST(count(*) AS BIGINT),
         |       ${dsumSql("o_totalprice")}, min(o_orderkey)
         |FROM (SELECT o_orderkey, o_totalprice FROM orders
         |      UNION ALL
         |      SELECT o_orderkey, o_totalprice FROM
         |        (SELECT * FROM orders ORDER BY o_orderkey LIMIT 5))""").stripMargin,

    "lake12_bucket_transform" -> // the transform-pruned point probe must
      // equal the plain IN-probe (hidden partitioning is an
      // optimization, never a semantics change); pruned_some mirrors
      // the observed file drop
      ("""SELECT TRUE AS pruned_some, o_orderkey, o_custkey,
         |       o_orderstatus, o_totalprice
         |FROM orders WHERE o_orderkey IN (7, 42, 1337)""").stripMargin,

    "rpt2_source_quality" -> // pipe2's gate formulations grouped instead
      // of filtered; NULL gate terms (too-short docs) count as fails,
      // matching when(...).otherwise(0)
      ("""WITH t AS (
         |  SELECT source, text, string_split(text, ' ') AS toks, string_split(text, '') AS chars FROM documents
         |), f AS (
         |  SELECT source,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
         |    CASE WHEN len(toks) - 2 >= 1 THEN
         |      round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
         |          i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
         |        / CAST(len(toks) - 2 AS DOUBLE), 4)
         |    ELSE NULL END AS dup3_frac,
         |    CASE WHEN length(text) >= 1 THEN
         |      round(-list_sum(list_transform(list_distinct(chars),
         |        ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
         |              * ln(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars)))), 4)
         |    ELSE NULL END AS char_entropy
         |  FROM t
         |)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN n_tokens >= 25 AND stopword_ratio >= 0.05
         |                      AND dup3_frac <= 0.05 AND char_entropy >= 2.8
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |       round(CAST(sum(CASE WHEN n_tokens >= 25 AND stopword_ratio >= 0.05
         |                           AND dup3_frac <= 0.05 AND char_entropy >= 2.8
         |                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS pass_share
         |FROM f GROUP BY source""").stripMargin,

    "rpt1_corpus_card" -> // every summary re-derived: integer counts,
      // exactly-rounded mean, dyadic-exact interpolated median
      ("""WITH tokstats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_tokens,
         |         CAST(count(DISTINCT tok) AS BIGINT) AS vocab_size
         |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |), lens AS (
         |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents
         |), lenstats AS (
         |  SELECT round(avg(n), 4) AS mean_tokens,
         |         quantile_cont(n, 0.5) AS p50_tokens,
         |         CAST(max(n) AS BIGINT) AS max_tokens
         |  FROM lens
         |), docstats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
         |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
         |  FROM documents
         |)
         |SELECT n_docs, n_distinct_texts, n_langs, n_sources,
         |       round(CAST(n_en AS DOUBLE) / n_docs, 4) AS en_share,
         |       n_tokens, vocab_size, mean_tokens, p50_tokens, max_tokens
         |FROM docstats CROSS JOIN tokstats CROSS JOIN lenstats""").stripMargin,

    "cls1_nb_confusion" -> // the whole train+predict pipeline replayed:
      // class priors, add-one-smoothed per-(token, class) terms with
      // round-6 exact DECIMAL sums, argmax with class-name tie-break
      ("""WITH toks AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
         |), classes AS (
         |  SELECT lang AS cls, count(*) AS n_docs FROM documents GROUP BY 1
         |), ntot AS (
         |  SELECT count(*) AS n_total FROM documents
         |), tokcls AS (
         |  SELECT tok, lang AS cls, count(*) AS c FROM toks GROUP BY 1, 2
         |), clstot AS (
         |  SELECT lang AS cls, count(*) AS n_c FROM toks GROUP BY 1
         |), voc AS (
         |  SELECT count(DISTINCT tok) AS v FROM toks
         |), pairs AS (
         |  SELECT t.doc_id, t.lang, cl.cls,
         |         CAST(round(ln(CAST(coalesce(tc.c, 0) + 1 AS DOUBLE) / (ct.n_c + voc.v)), 6)
         |              AS DECIMAL(28,6)) AS term
         |  FROM toks t
         |  CROSS JOIN (SELECT cls FROM classes) cl
         |  LEFT JOIN tokcls tc ON t.tok = tc.tok AND cl.cls = tc.cls
         |  JOIN clstot ct ON cl.cls = ct.cls
         |  CROSS JOIN voc
         |), priors AS (
         |  SELECT cls, CAST(round(ln(CAST(n_docs AS DOUBLE) / n_total), 6) AS DECIMAL(28,6)) AS prior
         |  FROM classes CROSS JOIN ntot
         |), scored0 AS (
         |  SELECT doc_id, lang, cls, CAST(sum(term) AS DECIMAL(28,6)) AS token_score
         |  FROM pairs GROUP BY 1, 2, 3
         |), scored AS (
         |  SELECT s.doc_id, s.lang, s.cls,
         |         CAST(s.token_score + pr.prior AS DECIMAL(28,6)) AS score
         |  FROM scored0 s JOIN priors pr USING (cls)
         |), pred AS (
         |  SELECT doc_id, lang, cls AS predicted,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
         |  FROM scored
         |)
         |SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n_docs
         |FROM pred WHERE rn = 1 GROUP BY 1, 2""").stripMargin,

    "txt16_bpe_learn" -> // all 8 learned merges replayed round by round
      // (pair counts weighted by word frequency, lexicographic
      // tie-break, greedy left-to-right merge via replace)
      bpeSql(8),

    "txt15_lm_nll" -> // the whole self-trained LM replayed: bigram counts
      // c2, context counts c1 (all corpus occurrences of the context
      // token), vocabulary V, add-one smoothing, per-term round(…,6) into
      // an exact DECIMAL sum. Docs with < 2 tokens have no bigrams and
      // are absent on both sides
      ("""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, unnest(range(1, len(toks))) AS i, toks FROM w
         |), big AS (
         |  SELECT doc_id, toks[i] AS w1, array_to_string(toks[i:i+1], ' ') AS bg FROM g
         |), c2 AS (
         |  SELECT bg, count(*) AS c2 FROM big GROUP BY 1
         |), c1 AS (
         |  SELECT tok AS w, count(*) AS c1
         |  FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY 1
         |), voc AS (
         |  SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(toks) AS tok FROM w)
         |)
         |SELECT big.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       CAST(sum(CAST(round(-ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + voc.v)), 6)
         |                     AS DECIMAL(18,6))) AS DOUBLE) AS nll
         |FROM big JOIN c2 USING (bg) JOIN c1 ON big.w1 = c1.w CROSS JOIN voc
         |GROUP BY big.doc_id""").stripMargin,

    "txt22_kneser_ney" -> // the full interpolated-KN replay: counts,
      // continuation counts, the guarded CASE cascade, and the pinned
      // probability expression text shared with the engine
      ("""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |         (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 % 100 < 80 AS is_train
         |  FROM documents
         |), tr AS (
         |  SELECT toks FROM w WHERE is_train
         |), uni AS (
         |  SELECT unnest(toks) AS tok FROM tr
         |), big AS (
         |  SELECT toks[i] AS b1, toks[i+1] AS b2
         |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tr)
         |), trg AS (
         |  SELECT toks[i] AS t1, toks[i+1] AS t2, toks[i+2] AS t3
         |  FROM (SELECT toks, unnest(range(1, len(toks) - 1)) AS i FROM tr)
         |), c3 AS (SELECT t1, t2, t3, count(*) AS c3 FROM trg GROUP BY 1, 2, 3
         |), c2 AS (SELECT b1, b2, count(*) AS c2 FROM big GROUP BY 1, 2
         |), n1mid AS (SELECT t2 AS m2, t3 AS m3, count(*) AS n1mid FROM c3 GROUP BY 1, 2
         |), n1ctx AS (SELECT t2 AS x2, count(*) AS n1ctx FROM c3 GROUP BY 1
         |), n1right AS (SELECT t1 AS r1, t2 AS r2, count(*) AS n1right FROM c3 GROUP BY 1, 2
         |), ntypes AS (SELECT b1 AS y2, count(*) AS ntypes FROM c2 GROUP BY 1
         |), n1luni AS (SELECT b2 AS u3, count(*) AS n1luni FROM c2 GROUP BY 1
         |), tot AS (
         |  SELECT (SELECT count(*) FROM c2) AS n1all,
         |         (SELECT count(DISTINCT tok) FROM uni) AS v
         |), occ AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
         |        FROM w WHERE NOT is_train)
         |), joined AS (
         |  SELECT occ.doc_id, c3.c3, c2.c2, n1mid.n1mid, n1ctx.n1ctx,
         |         n1right.n1right, ntypes.ntypes, n1luni.n1luni, tot.n1all, tot.v
         |  FROM occ
         |  LEFT JOIN c3 ON occ.w1 = c3.t1 AND occ.w2 = c3.t2 AND occ.w3 = c3.t3
         |  LEFT JOIN c2 ON occ.w1 = c2.b1 AND occ.w2 = c2.b2
         |  LEFT JOIN n1mid ON occ.w2 = n1mid.m2 AND occ.w3 = n1mid.m3
         |  LEFT JOIN n1ctx ON occ.w2 = n1ctx.x2
         |  LEFT JOIN n1right ON occ.w1 = n1right.r1 AND occ.w2 = n1right.r2
         |  LEFT JOIN ntypes ON occ.w2 = ntypes.y2
         |  LEFT JOIN n1luni ON occ.w3 = n1luni.u3
         |  CROSS JOIN tot
         |), probs AS (
         |  SELECT doc_id,
         |         CASE WHEN c2 IS NOT NULL AND n1right IS NOT NULL
         |              THEN (greatest(CAST(coalesce(c3, 0) AS DOUBLE) - 0.75E0, 0E0) / CAST(c2 AS DOUBLE))
         |                   + ((0.75E0 * (CAST(n1right AS DOUBLE) / CAST(c2 AS DOUBLE))) * p2)
         |              ELSE p2 END AS p3
         |  FROM (
         |    SELECT *,
         |           CASE WHEN n1ctx IS NOT NULL
         |                THEN (greatest(CAST(coalesce(n1mid, 0) AS DOUBLE) - 0.75E0, 0E0) / CAST(n1ctx AS DOUBLE))
         |                     + ((0.75E0 * (CAST(coalesce(ntypes, 0) AS DOUBLE) / CAST(n1ctx AS DOUBLE))) * p1)
         |                ELSE p1 END AS p2
         |    FROM (SELECT *,
         |                 CAST(coalesce(n1luni, 0) + 1 AS DOUBLE) / CAST(n1all + v + 1 AS DOUBLE) AS p1
         |          FROM joined))
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |       CAST(sum(CAST(round(-ln(p3), 6) AS DECIMAL(18,6))) AS DOUBLE) AS nll
         |FROM probs GROUP BY doc_id""").stripMargin,

    "txt19_trigram_backoff" -> // split, counts, and the three-way
      // backoff CASE replayed; the α·(α·(ratio)) nesting matches the
      // engine's pinned double expression tree
      ("""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |         (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 % 100 < 80 AS is_train
         |  FROM documents
         |), tr AS (
         |  SELECT toks FROM w WHERE is_train
         |), uni AS (
         |  SELECT unnest(toks) AS tok FROM tr
         |), c1 AS (
         |  SELECT tok AS wd, count(*) AS c1 FROM uni GROUP BY 1
         |), nv AS (
         |  SELECT count(*) AS n_tokens, count(DISTINCT tok) AS v FROM uni
         |), c2 AS (
         |  SELECT array_to_string(toks[i:i+1], ' ') AS bg, count(*) AS c2
         |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tr) GROUP BY 1
         |), c3 AS (
         |  SELECT array_to_string(toks[i:i+2], ' ') AS tg, count(*) AS c3
         |  FROM (SELECT toks, unnest(range(1, len(toks) - 1)) AS i FROM tr) GROUP BY 1
         |), occ AS (
         |  SELECT doc_id,
         |         array_to_string(toks[i:i+2], ' ') AS tg,
         |         array_to_string(toks[i:i+1], ' ') AS ctx2,
         |         array_to_string(toks[i+1:i+2], ' ') AS bg23,
         |         toks[i+1] AS w2, toks[i+2] AS w3
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
         |        FROM w WHERE NOT is_train)
         |), scored AS (
         |  SELECT occ.doc_id,
         |         CASE WHEN c3.c3 IS NOT NULL
         |                THEN CAST(c3.c3 AS DOUBLE) / CAST(cx.c2 AS DOUBLE)
         |              WHEN b23.c2 IS NOT NULL
         |                THEN CAST(0.4 AS DOUBLE) * (CAST(b23.c2 AS DOUBLE) / CAST(k2.c1 AS DOUBLE))
         |              ELSE CAST(0.4 AS DOUBLE) * (CAST(0.4 AS DOUBLE) *
         |                (CAST(coalesce(k3.c1, 0) + 1 AS DOUBLE) / CAST(nv.n_tokens + nv.v AS DOUBLE)))
         |         END AS s
         |  FROM occ
         |  LEFT JOIN c3 ON occ.tg = c3.tg
         |  LEFT JOIN c2 cx ON occ.ctx2 = cx.bg
         |  LEFT JOIN c2 b23 ON occ.bg23 = b23.bg
         |  LEFT JOIN c1 k2 ON occ.w2 = k2.wd
         |  LEFT JOIN c1 k3 ON occ.w3 = k3.wd
         |  CROSS JOIN nv
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |       CAST(sum(CAST(round(-ln(s), 6) AS DECIMAL(18,6))) AS DOUBLE) AS nll
         |FROM scored GROUP BY doc_id""").stripMargin,

    "smp1_hash_split" -> // same Knuth multiplicative hash, plain BIGINT ops
      ("""SELECT
         |  CASE WHEN (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 % 100 < 80
         |       THEN 'train' ELSE 'holdout' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1""").stripMargin,

    "smp2_per_group_cap" -> // the heap aggregate answers to the window SQL
      ("""WITH h AS (
         |  SELECT source, doc_id,
         |         (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 AS hv
         |  FROM documents
         |), r AS (
         |  SELECT source, doc_id,
         |         row_number() OVER (PARTITION BY source ORDER BY hv ASC, doc_id ASC) AS rn
         |  FROM h
         |)
         |SELECT source, doc_id FROM r WHERE rn <= 15""").stripMargin,

    "ctm1_contamination" ->
      ("""WITH probes AS (
         |  SELECT doc_id AS probe_id, substring(text, 1, 20) AS probe
         |  FROM documents WHERE doc_id < 50
         |)
         |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_probe_hits,
         |       min(p.probe_id) AS first_probe
         |FROM documents d JOIN probes p
         |  ON contains(d.text, p.probe) AND d.doc_id <> p.probe_id
         |GROUP BY 1""").stripMargin,

    "ctm2_bloom_screen" -> // the Bloom pass is false-negative-free and the
      // verify join kills false positives, so the oracle is the same exact
      // join as ctm1 restricted to the fixed-length (>= 20 chars) probes
      ("""WITH probes AS (
         |  SELECT doc_id AS probe_id, substring(text, 1, 20) AS probe
         |  FROM documents WHERE doc_id < 50 AND length(text) >= 20
         |)
         |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_probe_hits,
         |       min(p.probe_id) AS first_probe
         |FROM documents d JOIN probes p
         |  ON contains(d.text, p.probe) AND d.doc_id <> p.probe_id
         |GROUP BY 1""").stripMargin,

    "ctm3_incremental_screen" -> // the maintained sketch's screen equals
      // the exact contamination join over the full probe set (the Bloom
      // tier is false-negative-free; the verify join kills false
      // positives); bit-exactness and replay no-op are pinned in-engine
      ("""WITH probes AS (
         |  SELECT doc_id AS probe_id, substring(text, 1, 20) AS probe
         |  FROM documents WHERE doc_id < 50 AND length(text) >= 20
         |)
         |SELECT TRUE AS sketch_bit_exact, TRUE AS replay_noop,
         |       d.doc_id, CAST(count(*) AS BIGINT) AS n_probe_hits,
         |       min(p.probe_id) AS first_probe
         |FROM documents d JOIN probes p
         |  ON contains(d.text, p.probe) AND d.doc_id <> p.probe_id
         |GROUP BY d.doc_id""").stripMargin,

    "dd1_exact_dedup" ->
      "SELECT CAST(min(doc_id) AS BIGINT) AS keep_doc_id, CAST(count(*) AS BIGINT) AS n_copies FROM documents GROUP BY text",

    "pipe3_full_pipeline" -> // the verified per-stage oracle formulations
      // (pipe2 gate, dd4 recursive closure, ctm1 anti via NOT EXISTS,
      // smp4 quotas, pack2 next-fit walk) chained over each other's output
      ("""WITH RECURSIVE t0 AS (
         |  SELECT doc_id, lang, text, string_split(text, ' ') AS toks, string_split(text, '') AS chars FROM documents
         |), gated AS (
         |  SELECT doc_id, lang, text, toks FROM t0
         |  WHERE CAST(len(toks) AS BIGINT) >= 25
         |    AND round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 4) >= 0.05
         |    AND (CASE WHEN len(toks) - 2 >= 1 THEN
         |      round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
         |          i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
         |        / CAST(len(toks) - 2 AS DOUBLE), 4)
         |    ELSE NULL END) <= 0.05
         |    AND (CASE WHEN length(text) >= 1 THEN
         |      round(-list_sum(list_transform(list_distinct(chars),
         |        ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
         |              * ln(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars)))), 4)
         |    ELSE NULL END) >= 2.8
         |), idx AS (
         |  SELECT doc_id, toks AS t, unnest(range(1, len(toks) - 1)) AS i FROM gated
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT doc_a, doc_b FROM pr
         |  JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |  WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1
         |), edges AS MATERIALIZED (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), reach(src, dst) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
         |), survivors AS (
         |  SELECT g.doc_id, g.lang, g.text, g.toks FROM gated g
         |  WHERE g.doc_id NOT IN (SELECT src FROM reach GROUP BY src HAVING min(dst) < src)
         |), probes AS (
         |  SELECT doc_id AS probe_id, substring(text, 1, 20) AS probe FROM documents WHERE doc_id < 50
         |), clean AS (
         |  SELECT s.doc_id, s.lang, s.toks FROM survivors s
         |  WHERE NOT EXISTS (SELECT 1 FROM probes p WHERE contains(s.text, p.probe) AND s.doc_id <> p.probe_id)
         |), counts AS (
         |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM clean GROUP BY 1
         |), p AS (
         |  SELECT lang, c, CASE lang WHEN 'en' THEN 0.4 ELSE 0.15 END AS p FROM counts
         |), quotas AS (
         |  SELECT lang, floor(p * (SELECT min(c / p) FROM p)) AS n_keep FROM p
         |), ranked AS (
         |  SELECT doc_id, lang, toks,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296, doc_id) AS rk
         |  FROM clean
         |), sampled AS (
         |  SELECT r.doc_id, r.toks FROM ranked r JOIN quotas q USING (lang) WHERE r.rk <= q.n_keep
         |-- MATERIALIZED: the recursive walk below joins tt once per row
         |-- rank; DuckDB inlines plain CTEs into EVERY recursive step, so
         |-- without it each iteration re-evaluates the whole upstream
         |-- pipeline (measured ~85 min at sf0.1; 3.8 s materialized)
         |), tt AS MATERIALIZED (
         |  SELECT doc_id, doc_id % 8 AS shard, CAST(len(toks) AS BIGINT) AS n,
         |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
         |  FROM sampled WHERE len(toks) > 0
         |), walk AS (
         |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT) AS bin_id, n AS fill
         |  FROM tt WHERE rn = 1
         |  UNION ALL
         |  SELECT tt.shard, tt.rn, tt.doc_id, tt.n,
         |         CASE WHEN w.fill + tt.n > 512 THEN w.bin_id + 1 ELSE w.bin_id END,
         |         CASE WHEN w.fill + tt.n > 512 THEN tt.n ELSE w.fill + tt.n END
         |  FROM walk w JOIN tt ON tt.shard = w.shard AND tt.rn = w.rn + 1
         |)
         |SELECT CAST(shard AS BIGINT) AS shard, bin_id, doc_id, n AS n_tokens
         |FROM walk""").stripMargin,

    "pipe1_clean_corpus" -> // txt2's features + txt3's langid + dd1's dedup, composed
      ("""WITH hits AS (
         |  SELECT doc_id, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'and', 'of', 'to', 'a', 'in', 'is'))) AS en_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('der', 'die', 'und', 'das', 'ist', 'ein'))) AS de_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('el', 'la', 'de', 'que', 'y', 'es'))) AS es_h,
         |    len(list_filter(string_split(text, ' '), x -> x IN ('le', 'la', 'et', 'les', 'des', 'est'))) AS fr_h
         |  FROM documents
         |), kept AS (
         |  SELECT doc_id, text FROM hits
         |  WHERE greatest(en_h, de_h, es_h, fr_h) > 0 AND en_h = greatest(en_h, de_h, es_h, fr_h)
         |    AND n_tokens >= 20 AND stopword_ratio >= 0.05
         |)
         |SELECT CAST(min(doc_id) AS BIGINT) AS keep_doc_id, CAST(count(*) AS BIGINT) AS n_copies
         |FROM kept GROUP BY text""").stripMargin,

    "dd6_cross_corpus" -> // the cap is computed on CORPUS document
      // frequency (equal on survivors to the full-corpus df, since a
      // probe semi-join drops whole shingles, never a shingle's docs);
      // jaccard uses full shingle-set sizes on both sides
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), csh AS (
         |  SELECT doc_id AS corpus_id, shingle FROM sh0 WHERE doc_id % 37 <> 0
         |), psh AS (
         |  SELECT doc_id AS probe_id, shingle FROM sh0 WHERE doc_id % 37 = 0
         |), kept AS (
         |  SELECT shingle FROM csh GROUP BY shingle HAVING count(*) <= 20
         |), pr AS (
         |  SELECT corpus_id, probe_id, count(*) AS shared
         |  FROM csh JOIN kept USING (shingle) JOIN psh USING (shingle)
         |  GROUP BY 1, 2
         |), csz AS (
         |  SELECT doc_id AS corpus_id, count(*) AS n_c FROM sh0
         |  WHERE doc_id % 37 <> 0 GROUP BY 1
         |), psz AS (
         |  SELECT doc_id AS probe_id, count(*) AS n_p FROM sh0
         |  WHERE doc_id % 37 = 0 GROUP BY 1
         |)
         |SELECT corpus_id, probe_id, CAST(shared AS BIGINT) AS shared_shingles,
         |       round(CAST(shared AS DOUBLE) / (n_c + n_p - shared), 4) AS jaccard
         |FROM pr JOIN csz USING (corpus_id) JOIN psz USING (probe_id)
         |WHERE shared >= 2
         |  AND CAST(shared AS DOUBLE) / (n_c + n_p - shared) >= 0.1""").stripMargin,

    "dd8_prefix_jaccard" -> // the prefix filter is an OPTIMIZATION with a
      // no-miss theorem, so the oracle is the plain exact all-pairs
      // join: every pair sharing >= 1 shingle with unrounded jaccard
      // >= 0.9 (rounding applied only to the output column)
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b USING (shingle)
         |  WHERE a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared_shingles,
         |       round(CAST(shared AS DOUBLE) / (x.n + y.n - shared), 4) AS jaccard
         |FROM pr JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
         |WHERE CAST(shared AS DOUBLE) / (x.n + y.n - shared) >= 0.9""").stripMargin,

    "dd7_span_excision" -> // full relational replay of the span dedup:
      // positions 1..len-7 carry the md5 of their word 8-gram; a hash
      // seen more than once corpus-wide marks [pos, pos+8); marks merge
      // via the running-max interval walk; docs without marks carry zeros
      ("""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, unnest(range(1, greatest(len(toks) - 6, 1))) AS pos, toks FROM w
         |), hashed AS (
         |  SELECT doc_id, pos, md5(array_to_string(toks[pos:pos+7], ' ')) AS h FROM g
         |), dup AS (
         |  SELECT h FROM hashed GROUP BY h HAVING count(*) > 1
         |), marks AS (
         |  SELECT doc_id, pos, pos + 8 AS fin FROM hashed JOIN dup USING (h)
         |), grp AS (
         |  SELECT doc_id, pos, fin,
         |         CASE WHEN pos > max(fin) OVER (PARTITION BY doc_id ORDER BY pos
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |              THEN 1 ELSE 0 END AS brk
         |  FROM marks
         |), spans AS (
         |  SELECT doc_id, min(pos) AS span_start, max(fin) AS span_end
         |  FROM (SELECT doc_id, pos, fin,
         |               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
         |        FROM grp)
         |  GROUP BY doc_id, span_id
         |), per_doc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         |         CAST(sum(span_end - span_start) AS BIGINT) AS dup_tokens
         |  FROM spans GROUP BY doc_id
         |)
         |SELECT w.doc_id, CAST(len(w.toks) AS BIGINT) AS n_tokens,
         |       coalesce(p.n_dup_spans, 0) AS n_dup_spans,
         |       coalesce(p.dup_tokens, 0) AS dup_tokens,
         |       CAST(len(w.toks) AS BIGINT) - coalesce(p.dup_tokens, 0) AS kept_tokens
         |FROM w LEFT JOIN per_doc p USING (doc_id)""").stripMargin,

    "dd2_ngram_jaccard" ->
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b, CAST(pr.shared AS BIGINT) AS shared_shingles,
         |       round(pr.shared / (sa.n + sb.n - pr.shared), 4) AS jaccard
         |FROM pr JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1""").stripMargin,

    "dd10_incremental_neardup" -> // the incrementally-maintained pairs
      // mart must equal the UNCAPPED n-gram Jaccard pairs over the whole
      // corpus (dd2's SQL without the stop-shingle cap); the maintenance
      // probes (equivalence, replay no-op) are pinned in-engine and
      // window-2's doc count is re-derived from the pmod slicing
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT TRUE AS matches_scratch, TRUE AS replay_noop,
         |       (SELECT CAST(count(*) AS BIGINT) FROM documents
         |        WHERE doc_id % 3 = 2) AS window2_docs,
         |       doc_a, doc_b, CAST(pr.shared AS BIGINT) AS shared_shingles,
         |       round(pr.shared / (sa.n + sb.n - pr.shared), 4) AS jaccard
         |FROM pr JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1""").stripMargin,

    "dd11_incremental_neardup_capped" -> // the incrementally-maintained
      // CAPPED pairs mart must equal dd2's capped SQL at cap 5 over the
      // whole corpus; crossed_after_w1 re-derives the retraction
      // witness (shingles ≤ cap over windows 0+1, > cap over all three)
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 5
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), crossed AS (
         |  SELECT CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT shingle FROM sh0 GROUP BY shingle
         |    HAVING count(*) > 5 AND count(*) FILTER (doc_id % 3 < 2) <= 5
         |  )
         |)
         |SELECT TRUE AS matches_scratch, TRUE AS replay_noop,
         |       (SELECT c FROM crossed) AS crossed_after_w1,
         |       doc_a, doc_b, CAST(pr.shared AS BIGINT) AS shared_shingles,
         |       round(pr.shared / (sa.n + sb.n - pr.shared), 4) AS jaccard
         |FROM pr JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1""").stripMargin,

    "dd3_neardup_survivors" -> // dd2's pair SQL as a CTE, then the anti join
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT doc_a, doc_b FROM pr
         |  JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |  WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1
         |)
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_b FROM pairs)""").stripMargin,

    "dd4_cc_survivors" -> // dd2's pairs, then a recursive transitive
      // closure: a doc is dropped iff it can REACH a smaller doc id in
      // the (bidirected) pair graph — exactly "not the component min"
      ("""WITH RECURSIVE toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT doc_a, doc_b FROM pr
         |  JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |  WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1
         |), edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs
         |), reach(src, dst) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
         |)
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (
         |  SELECT src FROM reach GROUP BY src HAVING min(dst) < src)""").stripMargin,

    "txt12_edit_distance" -> // dd2's capped pair CTE + texts joined back +
      // Levenshtein (identical edit-distance definition both engines)
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT doc_a, doc_b FROM pr
         |  JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |  WHERE pr.shared >= 2 AND round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.1
         |)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
         |  round(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE) /
         |        greatest(length(da.text), length(db.text)), 4) AS edit_similarity
         |FROM pairs p
         |JOIN documents da ON p.doc_a = da.doc_id
         |JOIN documents db ON p.doc_b = db.doc_id""").stripMargin,

    "txt13_chunking" -> // same 32-token windows at stride 24; DuckDB list
      // slicing is inclusive and truncates at the list end, like slice()
      ("""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), c AS (
         |  SELECT doc_id, unnest(range(1, len(toks) + 1, 24)) AS start, toks FROM t
         |)
         |SELECT doc_id,
         |  CAST((start - 1) // 24 AS BIGINT) AS chunk_idx,
         |  array_to_string(toks[start:start+31], ' ') AS chunk_text,
         |  CAST(len(toks[start:start+31]) AS BIGINT) AS chunk_tokens
         |FROM c""").stripMargin,

    "agg9_conditional_bool" ->
      ("""SELECT l_returnflag,
         |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_high_qty,
         |  bool_and(l_extendedprice > 0) AS all_price_positive,
         |  bool_or(l_discount = 0) AS any_zero_discount,
         |  CAST(count(*) FILTER (WHERE l_tax > 0.05) AS BIGINT) AS n_high_tax
         |FROM lineitem GROUP BY l_returnflag""").stripMargin,

    "q6_exists_subquery" ->
      ("""SELECT c_custkey, c_mktsegment FROM customer c
         |WHERE EXISTS (SELECT 1 FROM orders o
         |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
         |  AND NOT EXISTS (SELECT 1 FROM orders o2
         |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')""").stripMargin,

    "mh2_minhash_gate" -> // n_exact re-derives the SHIPPED (capped)
      // 3-gram jaccard pair count; candidate/TP/P/R are per-SF measured
      // goldens (the affine-hash RNG is not SQL-expressible),
      // cpus-invariance verified
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), ex AS (
         |  SELECT count(*) AS n FROM pr
         |  JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |  WHERE round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.4
         |)
         |SELECT CAST(ex.n AS BIGINT) AS n_exact,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 28 WHEN 60000 THEN 25 WHEN 600000 THEN 256 END AS BIGINT) AS n_candidates,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 28 WHEN 60000 THEN 25 WHEN 600000 THEN 256 END AS BIGINT) AS n_true_pos,
         |  CAST(CASE WHEN (SELECT count(*) FROM lineitem) IN (6000, 60000, 600000) THEN 1.0 END AS DOUBLE) AS precision,
         |  CAST(CASE WHEN (SELECT count(*) FROM lineitem) IN (6000, 60000, 600000) THEN 1.0 END AS DOUBLE) AS recall
         |FROM ex""").stripMargin,

    "sh2_simhash_gate" -> // the SAME capped 3-gram truth as mh2 anchors
      // the oracle — one truth set makes the two sketches' P/R comparable
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh0 AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), kept AS (
         |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 20
         |), sh AS (
         |  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), ex AS (
         |  SELECT count(*) AS n FROM pr
         |  JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
         |  WHERE round(pr.shared / (sa.n + sb.n - pr.shared), 4) >= 0.4
         |)
         |SELECT CAST(ex.n AS BIGINT) AS n_exact,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 19 WHEN 60000 THEN 13 WHEN 600000 THEN 112 END AS BIGINT) AS n_candidates,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 19 WHEN 60000 THEN 13 WHEN 600000 THEN 112 END AS BIGINT) AS n_true_pos,
         |  CAST(CASE WHEN (SELECT count(*) FROM lineitem) IN (6000, 60000, 600000) THEN 1.0 END AS DOUBLE) AS precision,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 0.6786 WHEN 60000 THEN 0.52 WHEN 600000 THEN 0.4375 END AS DOUBLE) AS recall
         |FROM ex""").stripMargin,

    "cn2_cosine_gate" -> // the exact all-pairs cosine set IS SQL-expressible;
      // both arms run over the same deterministic Knuth-hash id sample
      // (mirrors SampleOps.knuth32 % 100 < 50 conjoined with the
      // absolute ~2048-vector hash-threshold cap) so the gate stays
      // corpus-size-independent; at these SFs (N ≤ 2048) the cap is
      // saturated and the rule is the plain 50% sample
      ("""WITH nn AS (
         |  SELECT count(*) AS n FROM embeddings
         |), thr AS (
         |  SELECT least(4294967296, CAST(CAST(2048 AS HUGEINT) * 4294967296 // n AS BIGINT)) AS thr FROM nn
         |), e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings, thr
         |  WHERE (((vec_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 % 100 < 50
         |    AND (((vec_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 < thr
         |), ex AS (
         |  SELECT count(*) AS n
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id
         |  WHERE round(list_inner_product(a.v, b.v) /
         |        (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 4) >= 0.4
         |)
         |SELECT CAST(ex.n AS BIGINT) AS n_exact,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 10 WHEN 60000 THEN 11 WHEN 600000 THEN 158 END AS BIGINT) AS n_candidates,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 10 WHEN 60000 THEN 11 WHEN 600000 THEN 158 END AS BIGINT) AS n_true_pos,
         |  CAST(CASE WHEN (SELECT count(*) FROM lineitem) IN (6000, 60000, 600000) THEN 1.0 END AS DOUBLE) AS precision,
         |  CAST(CASE (SELECT count(*) FROM lineitem) WHEN 6000 THEN 0.8333 WHEN 60000 THEN 0.7333 WHEN 600000 THEN 0.7596 END AS DOUBLE) AS recall
         |FROM ex""").stripMargin,

    "mh1_minhash_neardup" -> // the ann3 recipe for the MinHash-LSH
      // pair set: identities and est_jaccard are per-SF goldens (the
      // affine-hash RNG is not SQL-expressible; the banded pair SET is a
      // deterministic function of data + pinned seed, restart-stable by
      // construction — pure hashing, no sampling), while the exact
      // jaccard of every golden pair is RE-DERIVED from raw text with
      // dd2's proven formula — a pinned pair that stopped being similar
      // fails loudly. An unknown SF yields zero golden rows and fails
      // the rows check. Regenerate with graft.tools.DumpGoldens.
      ("""WITH golden AS (
         |  SELECT * FROM (VALUES
         |    (0,50,0.9375),(0,82,1),(5,450,1),(8,12,0.9844),(8,120,0.9844),(8,360,0.9844),(12,120,0.9844),(12,360,1),
         |    (16,369,1),(26,176,0.9531),(33,436,0.9063),(45,487,0.9688),(50,82,0.9375),(56,157,0.9844),(77,459,0.9688),
         |    (89,114,0.9063),(99,174,0.9844),(110,467,1),(119,425,0.9531),(120,360,0.9844),(144,161,1),(211,404,1),
         |    (229,263,0.9688),(260,391,0.9844),(270,329,0.9688),(328,428,0.9688),(349,411,1),(474,498,1)
         |  ) g(doc_a, doc_b, est) WHERE (SELECT count(*) FROM lineitem) = 6000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (8,245,0.9688),(26,455,0.9688),(31,383,0.9531),(44,446,0.9844),(45,267,0.9844),(45,413,1),(58,293,1),
         |    (61,185,0.9688),(70,447,0.9688),(72,377,0.9688),(87,134,0.9844),(92,450,0.9531),(98,290,1),(107,387,0.9844),
         |    (120,332,0.9531),(152,178,0.9844),(166,323,1),(267,413,0.9844),(285,301,0.9844),(295,374,0.9688),
         |    (310,389,0.9531),(326,457,0.9688),(393,420,0.9844),(435,486,0.9844),(458,462,0.9844)
         |  ) g(doc_a, doc_b, est) WHERE (SELECT count(*) FROM lineitem) = 60000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (11,4686,0.9844),(17,3383,1),(28,3006,0.9844),(37,3162,0.9688),(48,3900,1),(63,2932,0.9844),(68,1356,0.9531),
         |    (72,4099,0.9844),(87,4037,0.9844),(98,954,1),(126,1282,0.9688),(128,2773,0.9688),(143,4596,0.9688),
         |    (160,1389,0.9688),(162,3123,1),(170,3680,0.8906),(179,2063,0.9219),(179,2523,1),(216,3049,0.9688),(221,4344,1),
         |    (246,491,0.9688),(247,3576,1),(248,1273,1),(254,3460,1),(257,2307,0.9844),(268,2542,1),(292,2301,0.9688),
         |    (297,2624,0.9844),(307,4756,0.9844),(379,771,0.9844),(381,2978,1),(425,1071,0.9688),(430,1267,1),(430,4740,1),
         |    (455,933,1),(455,1985,1),(455,4017,0.9688),(466,4829,0.875),(472,2689,0.9844),(540,630,1),(553,2451,0.9844),
         |    (555,1819,0.9688),(561,895,1),(570,4941,1),(610,4092,0.9844),(617,2333,0.9844),(619,2000,0.9375),
         |    (621,1051,0.9844),(627,2690,0.9688),(644,1204,0.9688),(646,1783,0.9844),(653,2320,0.9688),(669,1641,1),
         |    (669,1673,0.9688),(670,3378,0.9531),(684,1590,0.9688),(703,2170,0.9531),(706,1033,1),(716,1887,0.9844),
         |    (724,4259,0.9844),(729,1039,0.9219),(731,2641,0.9531),(732,2684,0.9844),(752,1405,0.9844),(755,787,0.8906),
         |    (763,4993,0.9375),(775,2179,0.9375),(800,3828,0.9844),(803,1670,1),(820,3264,1),(830,4719,0.9688),
         |    (862,4670,0.9844),(874,4273,0.9844),(879,4278,0.9688),(894,2629,0.9063),(900,4743,1),(901,2008,1),(908,4155,1),
         |    (917,2418,0.9531),(932,2302,0.9844),(932,4556,1),(933,1985,1),(933,4017,0.9688),(941,1730,1),(996,2305,1),
         |    (1018,1083,0.9063),(1038,1131,1),(1041,4446,1),(1053,1882,0.9531),(1053,4677,0.9531),(1073,4937,1),
         |    (1081,1373,0.9688),(1090,3022,0.9688),(1097,1413,0.9375),(1101,4438,1),(1102,3115,0.9531),(1103,1568,0.9219),
         |    (1103,2466,0.8906),(1132,1630,0.9844),(1150,3701,0.9688),(1154,3759,1),(1165,4437,0.9844),(1166,4828,0.9688),
         |    (1171,1427,0.9063),(1177,3387,1),(1181,2649,0.9688),(1237,4246,1),(1240,4368,0.8594),(1267,4740,1),
         |    (1275,1992,0.9063),(1285,2766,0.9531),(1287,1513,1),(1290,3624,0.9375),(1294,2192,0.9844),(1316,1817,0.9844),
         |    (1342,2661,0.875),(1360,2428,0.9688),(1363,3879,0.9844),(1390,4391,0.9844),(1395,2328,0.9844),
         |    (1406,1424,0.9688),(1415,2798,0.9844),(1436,1456,1),(1440,4016,1),(1445,4724,1),(1450,4542,1),(1452,2505,1),
         |    (1460,2551,0.9219),(1477,2521,0.9844),(1494,3958,1),(1540,1828,1),(1568,2466,0.8281),(1600,4650,0.9844),
         |    (1619,2875,1),(1619,3394,0.9688),(1634,2562,0.9844),(1641,1673,0.9688),(1716,4758,0.8906),(1760,4613,0.9531),
         |    (1769,2203,0.9688),(1793,3517,1),(1796,3886,0.9844),(1806,4612,1),(1824,1942,0.9688),(1824,2221,1),
         |    (1827,2377,0.9844),(1843,4795,1),(1882,4677,1),(1886,2052,0.9688),(1900,4153,0.9844),(1902,2728,1),
         |    (1905,3870,0.9688),(1910,1917,1),(1910,3562,1),(1917,3562,1),(1920,4942,1),(1942,2221,0.9688),
         |    (1962,2789,0.9844),(1970,2990,0.9844),(1981,3973,0.9688),(1985,4017,0.9688),(1987,4918,0.9844),
         |    (2004,2918,0.9375),(2019,3038,0.9844),(2025,3954,0.9688),(2028,4455,0.9844),(2063,2523,0.9219),(2064,4003,1),
         |    (2081,4948,0.9531),(2108,2612,0.9844),(2126,3112,1),(2130,2940,0.9219),(2147,3401,0.9219),(2159,3269,0.9688),
         |    (2164,4199,1),(2173,4129,0.9844),(2182,3447,0.9844),(2183,4031,0.9844),(2194,3101,0.9531),(2196,3481,0.9688),
         |    (2226,4225,0.9688),(2256,4337,0.9688),(2302,4556,0.9844),(2326,3377,0.9063),(2366,3166,0.9531),
         |    (2423,3373,0.9844),(2430,3212,0.9844),(2441,4864,1),(2460,3224,0.9531),(2465,4576,0.8906),(2644,4165,0.9844),
         |    (2676,4317,0.9844),(2687,4065,0.9531),(2700,3017,1),(2705,3015,1),(2713,3319,0.9375),(2719,4189,0.9688),
         |    (2770,3674,0.8906),(2801,3703,0.9688),(2815,3647,1),(2859,3106,0.9688),(2862,3329,1),(2863,4095,1),
         |    (2865,3992,1),(2875,3394,0.9688),(2900,3091,0.9844),(2913,4034,1),(2933,4494,0.9531),(2968,4954,0.9531),
         |    (2971,3223,0.9375),(2988,4764,0.9844),(3018,4343,0.9688),(3026,3848,0.9844),(3027,3668,0.9531),
         |    (3062,3354,0.9219),(3087,3947,0.9219),(3151,3896,0.9688),(3152,4771,0.9844),(3157,4044,0.9844),(3175,3304,1),
         |    (3178,4702,1),(3266,3345,1),(3267,3735,1),(3279,4476,0.9531),(3280,3989,0.9531),(3293,3591,0.9844),
         |    (3346,3402,0.9844),(3362,3555,0.9844),(3427,4969,0.9375),(3436,4599,0.8594),(3524,3776,1),(3532,3646,0.9844),
         |    (3566,4666,0.9844),(3605,4138,0.9688),(3711,4923,0.9375),(3743,4492,0.9844),(3747,4976,0.9844),(3751,4545,1),
         |    (3765,4331,0.9844),(3849,4901,0.9219),(3885,4132,1),(3898,4750,0.9844),(3911,4415,0.9531),(4048,4385,1),
         |    (4057,4179,0.9844),(4146,4430,1),(4164,4241,0.9063),(4175,4730,0.9531),(4414,4838,0.9844),(4460,4487,1),
         |    (4485,4832,0.9844),(4488,4922,1),(4546,4847,0.9531),(4667,4991,0.9688),(4705,4769,0.9063),(4833,4912,1)
         |  ) g(doc_a, doc_b, est) WHERE (SELECT count(*) FROM lineitem) = 600000
         |), toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), inter AS (
         |  SELECT g.doc_a, g.doc_b, count(*) AS shared
         |  FROM golden g JOIN sh a ON a.doc_id = g.doc_a
         |                JOIN sh b ON b.doc_id = g.doc_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2
         |)
         |SELECT CAST(g.doc_a AS BIGINT) AS doc_a, CAST(g.doc_b AS BIGINT) AS doc_b,
         |       CAST(g.est AS DOUBLE) AS est_jaccard,
         |       round(coalesce(inter.shared, 0) / (sa.n + sb.n - coalesce(inter.shared, 0)), 4) AS jaccard
         |FROM golden g
         |LEFT JOIN inter ON inter.doc_a = g.doc_a AND inter.doc_b = g.doc_b
         |JOIN sz sa ON sa.doc_id = g.doc_a
         |JOIN sz sb ON sb.doc_id = g.doc_b""").stripMargin,

    "sh1_simhash_neardup" -> // mh1's recipe for the SimHash chunk-banded
      // pair set: identities + hamming are per-SF goldens (the simhash
      // kernel is not SQL-expressible), exact jaccard re-derived from
      // raw text per pair. Regenerate with graft.tools.DumpGoldens.
      ("""WITH golden AS (
         |  SELECT * FROM (VALUES
         |    (8,12,1),(8,120,2),(8,360,1),(12,120,3),(12,360,0),(16,369,0),(26,176,3),(45,487,3),(77,459,2),(89,114,2),
         |    (99,174,3),(110,467,3),(120,360,3),(144,161,2),(211,404,0),(229,263,1),(260,391,2),(328,428,2),(349,411,3)
         |  ) g(doc_a, doc_b, ham) WHERE (SELECT count(*) FROM lineitem) = 6000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (8,245,1),(31,383,2),(58,293,2),(70,447,2),(72,377,1),(87,134,2),(98,290,2),(120,332,3),(166,323,2),
         |    (285,301,1),(326,457,3),(393,420,1),(458,462,1)
         |  ) g(doc_a, doc_b, ham) WHERE (SELECT count(*) FROM lineitem) = 60000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (11,4686,2),(28,3006,3),(48,3900,1),(68,1356,1),(98,954,2),(128,2773,2),(143,4596,2),(162,3123,2),(179,2523,0),
         |    (221,4344,1),(246,491,3),(247,3576,2),(248,1273,2),(254,3460,2),(257,2307,1),(381,2978,1),(455,933,2),
         |    (455,1985,2),(455,4017,3),(540,630,1),(553,2451,3),(561,895,1),(570,4941,3),(627,2690,2),(669,1641,0),
         |    (669,1673,3),(684,1590,0),(706,1033,1),(731,2641,3),(763,4993,3),(803,1670,3),(830,4719,1),(900,4743,3),
         |    (932,4556,0),(933,1985,0),(933,4017,3),(996,2305,2),(1041,4446,2),(1073,4937,0),(1081,1373,0),(1097,1413,2),
         |    (1101,4438,3),(1132,1630,3),(1165,4437,2),(1237,4246,0),(1267,4740,3),(1275,1992,2),(1285,2766,1),
         |    (1287,1513,3),(1316,1817,3),(1360,2428,2),(1363,3879,3),(1415,2798,3),(1440,4016,2),(1445,4724,2),
         |    (1452,2505,2),(1540,1828,3),(1619,2875,0),(1641,1673,3),(1760,4613,2),(1769,2203,3),(1796,3886,2),
         |    (1806,4612,3),(1824,1942,0),(1824,2221,0),(1843,4795,2),(1882,4677,0),(1900,4153,3),(1902,2728,2),
         |    (1905,3870,2),(1910,1917,2),(1910,3562,2),(1917,3562,0),(1942,2221,0),(1962,2789,2),(1981,3973,1),
         |    (1985,4017,3),(2019,3038,3),(2028,4455,0),(2064,4003,3),(2108,2612,1),(2126,3112,0),(2164,4199,2),
         |    (2182,3447,3),(2183,4031,1),(2196,3481,2),(2423,3373,3),(2430,3212,1),(2687,4065,2),(2705,3015,1),
         |    (2713,3319,3),(2815,3647,3),(2863,4095,2),(2865,3992,3),(2971,3223,2),(3018,4343,1),(3027,3668,2),
         |    (3151,3896,1),(3175,3304,3),(3267,3735,3),(3280,3989,3),(3427,4969,1),(3436,4599,3),(3524,3776,2),
         |    (3532,3646,3),(3743,4492,2),(3849,4901,2),(4048,4385,1),(4146,4430,0),(4460,4487,2),(4546,4847,3),
         |    (4667,4991,3)
         |  ) g(doc_a, doc_b, ham) WHERE (SELECT count(*) FROM lineitem) = 600000
         |), toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), idx AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
         |), sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM idx
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
         |), inter AS (
         |  SELECT g.doc_a, g.doc_b, count(*) AS shared
         |  FROM golden g JOIN sh a ON a.doc_id = g.doc_a
         |                JOIN sh b ON b.doc_id = g.doc_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2
         |)
         |SELECT CAST(g.doc_a AS BIGINT) AS doc_a, CAST(g.doc_b AS BIGINT) AS doc_b,
         |       CAST(g.ham AS INTEGER) AS hamming,
         |       round(coalesce(inter.shared, 0) / (sa.n + sb.n - coalesce(inter.shared, 0)), 4) AS jaccard
         |FROM golden g
         |LEFT JOIN inter ON inter.doc_a = g.doc_a AND inter.doc_b = g.doc_b
         |JOIN sz sa ON sa.doc_id = g.doc_a
         |JOIN sz sb ON sb.doc_id = g.doc_b""").stripMargin,

    "cn1_cosine_neardup" -> // the ann3 recipe for the sign-LSH cosine
      // pair set: pair identities are per-SF goldens (the hyperplane RNG
      // is not SQL-expressible; the multi-table bucket pair SET is a
      // deterministic function of data + pinned seed), and every SCORE is
      // re-derived from the raw embeddings (exact cosine, ann1's proven
      // formula) — the golden carries no number the oracle cannot check.
      // Regenerate with graft.tools.DumpGoldens.
      ("""WITH golden AS (
         |  SELECT * FROM (VALUES
         |    (14,116),(16,337),(23,172),(23,319),(23,392),(37,305),(38,404),(43,276),(44,472),(45,237),(45,359),(50,73),
         |    (52,322),(53,134),(54,165),(60,496),(64,455),(65,292),(67,458),(80,455),(85,227),(92,126),(93,243),(119,403),
         |    (124,454),(131,230),(134,250),(136,304),(136,485),(154,342),(165,215),(167,256),(171,358),(172,173),(193,243),
         |    (203,470),(229,472),(244,477),(248,275),(256,355),(294,474),(295,454),(319,362),(320,487),(321,488),(322,397),
         |    (329,361),(330,457),(352,411),(365,429),(390,483),(395,406),(396,493),(410,494)
         |  ) g(id_a, id_b) WHERE (SELECT count(*) FROM lineitem) = 6000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (7,340),(16,402),(19,87),(24,298),(32,200),(35,351),(44,301),(45,298),(53,234),(53,300),(53,430),(70,210),
         |    (75,256),(84,190),(85,404),(108,232),(120,421),(150,152),(158,452),(159,202),(162,282),(166,324),(169,466),
         |    (181,194),(191,431),(197,318),(198,468),(200,204),(205,485),(207,326),(234,384),(238,287),(253,385),(262,291),
         |    (290,325),(290,331),(325,331),(334,382),(334,438),(335,439),(338,406),(350,395),(350,479),(387,388)
         |  ) g(id_a, id_b) WHERE (SELECT count(*) FROM lineitem) = 60000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (0,1204),(4,524),(6,270),(6,1805),(7,1622),(9,1443),(10,1424),(11,1902),(12,662),(14,1113),(15,52),(15,229),
         |    (16,442),(18,222),(19,138),(19,402),(21,402),(22,1184),(24,1661),(25,542),(25,742),(25,868),(27,282),(27,389),
         |    (31,676),(32,1468),(33,1895),(34,486),(35,355),(37,1362),(38,274),(38,444),(39,564),(42,340),(42,1957),
         |    (47,1647),(47,1965),(48,1879),(49,394),(51,774),(53,58),(59,378),(60,845),(61,974),(61,977),(64,346),(65,623),
         |    (65,1840),(66,900),(66,1473),(67,1694),(68,1052),(74,1534),(75,100),(77,929),(80,533),(80,1428),(83,661),
         |    (86,991),(87,389),(87,655),(87,1120),(89,1855),(91,901),(92,185),(97,204),(98,1488),(101,1219),(102,1536),
         |    (105,633),(105,1656),(109,380),(113,742),(114,1875),(115,837),(119,919),(121,1514),(127,1172),(127,1745),
         |    (129,1674),(129,1803),(130,1503),(133,723),(134,318),(134,734),(135,264),(137,1625),(141,829),(142,713),
         |    (148,292),(148,544),(148,1481),(148,1596),(151,282),(151,520),(152,1151),(154,1069),(162,825),(164,1662),
         |    (164,1963),(165,1044),(168,558),(174,1120),(175,649),(176,1934),(181,676),(183,1985),(184,488),(184,1428),
         |    (184,1661),(185,342),(185,1875),(186,1324),(189,203),(189,531),(193,455),(193,537),(193,1725),(194,1122),
         |    (194,1350),(195,957),(197,219),(200,279),(200,1433),(202,399),(202,823),(203,391),(210,366),(213,1869),
         |    (220,249),(220,446),(220,955),(223,1232),(226,910),(227,1534),(227,1856),(230,661),(232,561),(232,1157),
         |    (232,1686),(232,1731),(235,1290),(238,879),(238,1274),(238,1421),(239,1420),(242,640),(242,939),(242,1579),
         |    (243,1157),(244,689),(249,1631),(251,594),(252,636),(252,818),(254,630),(254,1079),(254,1457),(256,780),
         |    (258,1383),(259,1601),(266,679),(268,914),(273,639),(273,1674),(274,562),(274,873),(276,1700),(278,720),
         |    (283,631),(285,1944),(288,1880),(290,722),(291,401),(291,1852),(292,1481),(293,957),(293,1030),(295,308),
         |    (295,1242),(296,1716),(297,659),(297,951),(297,969),(297,1048),(297,1070),(297,1310),(299,980),(299,1495),
         |    (301,1114),(304,1465),(304,1670),(305,1244),(306,1517),(307,550),(307,1944),(309,1582),(310,1473),(311,529),
         |    (312,370),(312,472),(312,1676),(313,952),(318,622),(318,1313),(319,834),(320,750),(328,363),(332,521),
         |    (332,1734),(333,884),(336,1821),(339,1178),(343,754),(344,1077),(345,1208),(346,1475),(351,1946),(353,397),
         |    (355,518),(357,1220),(357,1945),(359,1862),(362,1661),(365,580),(368,394),(368,1776),(369,1653),(370,1858),
         |    (371,555),(372,1141),(372,1320),(374,1805),(375,801),(378,732),(379,1631),(380,989),(382,840),(384,1874),
         |    (386,596),(389,1288),(390,464),(390,712),(391,1856),(392,951),(393,1552),(393,1713),(398,831),(401,1852),
         |    (402,1280),(402,1713),(406,1349),(407,1573),(416,505),(416,1650),(419,437),(419,452),(422,1500),(422,1571),
         |    (424,756),(424,778),(425,1198),(426,569),(426,733),(427,919),(428,582),(431,1710),(432,1014),(433,1571),
         |    (434,921),(435,472),(436,551),(436,740),(440,863),(441,707),(441,1164),(441,1623),(442,531),(445,575),
         |    (445,1100),(446,1293),(449,1527),(451,652),(451,1264),(453,1854),(455,616),(457,1301),(460,756),(460,1503),
         |    (460,1679),(461,1876),(463,1468),(466,1165),(467,1656),(472,1213),(482,1241),(486,1966),(488,1807),(489,746),
         |    (490,1920),(491,1161),(492,508),(492,1630),(495,1690),(498,741),(498,1574),(498,1685),(499,1700),(502,862),
         |    (503,893),(507,1160),(510,532),(513,855),(515,863),(518,1133),(519,1245),(519,1251),(519,1575),(522,1428),
         |    (523,1330),(525,904),(526,1370),(526,1515),(528,1093),(529,745),(532,832),(533,685),(535,742),(542,975),
         |    (545,1935),(547,1903),(550,1004),(550,1136),(550,1273),(553,1505),(554,663),(557,1891),(560,1768),(561,646),
         |    (561,1731),(569,1143),(573,1588),(576,654),(576,1130),(576,1437),(582,1782),(583,1721),(585,1060),(595,1157),
         |    (595,1248),(595,1478),(597,863),(600,1390),(601,838),(602,1331),(603,961),(606,1648),(608,1946),(610,1380),
         |    (611,1805),(616,714),(618,752),(618,1336),(620,769),(620,1710),(621,1266),(625,1430),(630,1936),(633,1966),
         |    (634,1129),(635,1683),(636,1291),(639,1038),(639,1991),(640,769),(650,783),(652,1175),(654,898),(659,1843),
         |    (660,1299),(660,1546),(660,1874),(668,1061),(668,1932),(670,1641),(672,1997),(674,1619),(676,708),(679,1394),
         |    (682,1902),(689,961),(693,1049),(698,1958),(700,814),(701,1753),(704,1566),(706,1535),(707,1618),(708,895),
         |    (709,1833),(710,1569),(712,795),(712,1350),(713,814),(715,1575),(717,1430),(719,1790),(724,1149),(724,1856),
         |    (726,1827),(728,1748),(728,1997),(729,1818),(729,1853),(730,1446),(731,1226),(732,915),(736,740),(738,1687),
         |    (740,1237),(741,791),(741,1685),(747,780),(749,1167),(749,1461),(751,1370),(752,997),(753,1221),(753,1549),
         |    (755,1667),(762,1815),(772,1296),(776,1917),(785,1543),(786,1119),(789,1442),(790,1780),(796,1216),(796,1733),
         |    (797,1368),(797,1613),(803,1898),(806,1354),(807,821),(808,968),(809,844),(811,1545),(814,1362),(814,1425),
         |    (816,1426),(817,1809),(819,1166),(820,983),(825,913),(838,1061),(851,1038),(851,1968),(859,1379),(861,1483),
         |    (866,867),(866,1625),(867,1756),(867,1961),(867,1998),(869,1306),(878,1375),(880,1613),(881,1839),(884,944),
         |    (884,1855),(885,1551),(885,1672),(887,1145),(887,1425),(887,1572),(887,1747),(890,1251),(895,1579),(900,992),
         |    (902,1070),(907,1797),(909,1488),(912,1212),(912,1507),(914,1352),(916,1510),(918,1215),(922,1600),(923,1842),
         |    (933,1318),(938,1090),(938,1296),(939,1684),(940,1352),(950,1422),(952,1721),(958,1654),(959,1200),(963,1551),
         |    (964,1778),(968,1992),(970,1545),(970,1939),(973,1578),(981,1848),(989,1002),(990,1577),(991,1813),(994,1377),
         |    (995,1789),(996,1138),(996,1185),(1000,1253),(1002,1782),(1009,1247),(1012,1229),(1018,1835),(1022,1233),
         |    (1023,1754),(1023,1799),(1025,1872),(1029,1064),(1037,1719),(1041,1918),(1051,1628),(1056,1492),(1056,1614),
         |    (1059,1282),(1059,1831),(1061,1192),(1071,1135),(1072,1158),(1072,1739),(1073,1896),(1086,1627),(1086,1773),
         |    (1088,1117),(1088,1779),(1089,1090),(1099,1166),(1099,1236),(1103,1116),(1103,1353),(1106,1755),(1114,1856),
         |    (1114,1888),(1119,1526),(1119,1528),(1128,1645),(1129,1359),(1135,1252),(1136,1560),(1142,1330),(1145,1780),
         |    (1147,1251),(1157,1889),(1164,1753),(1166,1249),(1171,1808),(1173,1175),(1174,1364),(1175,1273),(1176,1525),
         |    (1177,1932),(1179,1333),(1180,1380),(1180,1967),(1184,1185),(1184,1921),(1190,1558),(1191,1263),(1192,1300),
         |    (1194,1641),(1194,1754),(1200,1257),(1200,1914),(1205,1331),(1219,1904),(1220,1694),(1225,1969),(1229,1441),
         |    (1230,1707),(1236,1651),(1242,1451),(1252,1394),(1255,1392),(1257,1432),(1257,1830),(1264,1352),(1264,1365),
         |    (1268,1535),(1269,1342),(1269,1522),(1279,1578),(1293,1841),(1299,1428),(1300,1359),(1300,1634),(1302,1319),
         |    (1303,1400),(1306,1714),(1308,1348),(1309,1612),(1314,1676),(1319,1810),(1324,1991),(1325,1471),(1327,1660),
         |    (1334,1766),(1343,1934),(1344,1383),(1349,1369),(1349,1519),(1353,1489),(1362,1551),(1362,1661),(1367,1800),
         |    (1369,1824),(1390,1746),(1403,1460),(1404,1560),(1408,1525),(1412,1587),(1413,1552),(1429,1683),(1431,1810),
         |    (1432,1649),(1433,1870),(1434,1681),(1451,1709),(1460,1820),(1462,1988),(1464,1575),(1471,1892),(1474,1535),
         |    (1481,1522),(1482,1899),(1485,1724),(1492,1548),(1507,1970),(1519,1770),(1536,1999),(1537,1673),(1542,1754),
         |    (1543,1695),(1549,1799),(1551,1595),(1565,1674),(1568,1897),(1572,1979),(1574,1817),(1577,1872),(1578,1702),
         |    (1592,1887),(1598,1727),(1602,1729),(1607,1958),(1612,1686),(1616,1824),(1623,1785),(1628,1843),(1641,1877),
         |    (1652,1992),(1665,1745),(1665,1896),(1688,1739),(1691,1988),(1707,1744),(1732,1860),(1745,1813),(1749,1868),
         |    (1769,1866),(1776,1979),(1777,1818),(1786,1928),(1807,1877),(1811,1906),(1814,1895),(1818,1979),(1838,1934),
         |    (1845,1935),(1845,1994),(1848,1949),(1858,1935),(1858,1958),(1874,1911),(1880,1935),(1897,1932),(1905,1916),
         |    (1908,1982),(1908,1991),(1962,1988)
         |  ) g(id_a, id_b) WHERE (SELECT count(*) FROM lineitem) = 600000
         |)
         |SELECT CAST(g.id_a AS BIGINT) AS id_a, CAST(g.id_b AS BIGINT) AS id_b,
         |       round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         |             (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
         |              sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS score
         |FROM golden g
         |JOIN embeddings a ON a.vec_id = g.id_a
         |JOIN embeddings b ON b.vec_id = g.id_b""").stripMargin,

    "ann2_lsh_topk" -> // ann3's oracle shape for the sign-LSH top-k:
      // neighbor identities (q_id, vec_id, rnk) are per-SF goldens (the
      // hyperplane RNG is not SQL-expressible; the bucketed result is
      // deterministic — fixed seed, bit-parity kernels, graft_topk's
      // payload tiebreak), every score re-derived from raw embeddings.
      // Regenerate with graft.tools.DumpGoldens.
      ("""WITH golden AS (
         |  SELECT * FROM (VALUES
         |    (0,1,17),(0,2,225),(0,3,483),(0,4,260),(0,5,73),(1,1,257),(1,2,129),(1,3,376),(1,4,440),(1,5,75),(2,1,443),
         |    (2,2,62),(2,3,185),(2,4,91),(2,5,234),(3,1,223),(3,2,205),(3,3,212),(3,4,426),(3,5,156),(4,1,98),(4,2,143),
         |    (4,3,343),(4,4,57),(4,5,472),(5,1,113),(5,2,298),(5,3,448),(5,4,118),(5,5,296),(6,1,141),(6,2,434),(6,3,78),
         |    (6,4,467),(6,5,495),(7,1,382),(7,2,209),(7,3,220),(7,4,18),(7,5,167)
         |  ) g(q_id, rnk, vec_id) WHERE (SELECT count(*) FROM lineitem) = 6000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (0,1,365),(0,2,423),(0,3,190),(0,4,464),(0,5,388),(1,1,386),(1,2,407),(1,3,195),(1,4,64),(1,5,402),(2,1,117),
         |    (2,2,450),(2,3,145),(2,4,418),(2,5,112),(3,1,130),(3,2,149),(3,3,174),(3,4,315),(3,5,437),(4,1,114),(4,2,496),
         |    (4,3,249),(4,4,257),(4,5,384),(5,1,157),(5,2,359),(5,3,316),(5,4,395),(5,5,225),(6,1,350),(6,2,430),(6,3,145),
         |    (6,4,437),(6,5,252),(7,1,340),(7,2,445),(7,3,221),(7,4,302),(7,5,49)
         |  ) g(q_id, rnk, vec_id) WHERE (SELECT count(*) FROM lineitem) = 60000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (0,1,1204),(0,2,510),(0,3,1511),(0,4,1978),(0,5,794),(1,1,260),(1,2,1832),(1,3,173),(1,4,665),(1,5,134),
         |    (2,1,1303),(2,2,953),(2,3,337),(2,4,1053),(2,5,1912),(3,1,263),(3,2,1701),(3,3,1542),(3,4,650),(3,5,1567),
         |    (4,1,524),(4,2,1166),(4,3,995),(4,4,1653),(4,5,660),(5,1,426),(5,2,1019),(5,3,533),(5,4,478),(5,5,660),
         |    (6,1,1805),(6,2,270),(6,3,1184),(6,4,1823),(6,5,648),(7,1,1622),(7,2,160),(7,3,493),(7,4,420),(7,5,498)
         |  ) g(q_id, rnk, vec_id) WHERE (SELECT count(*) FROM lineitem) = 600000
         |)
         |SELECT CAST(g.q_id AS BIGINT) AS q_id, CAST(g.vec_id AS BIGINT) AS vec_id,
         |       round(list_inner_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         |             (sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
         |              sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4) AS score,
         |       CAST(g.rnk AS INTEGER) AS rnk
         |FROM golden g
         |JOIN embeddings q ON q.vec_id = g.q_id
         |JOIN embeddings c ON c.vec_id = g.vec_id""").stripMargin,

    "ann1_bruteforce_topk" ->
      ("""WITH q AS (
         |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8
         |), scored AS (
         |  SELECT q.q_id, c.vec_id,
         |         round(list_inner_product(q.qv, c.embedding::DOUBLE[]) /
         |               (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4) AS score
         |  FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.q_id
         |), ranked AS (
         |  SELECT q_id, vec_id, score,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS INTEGER) AS rnk
         |  FROM scored
         |)
         |SELECT q_id, vec_id, score, rnk FROM ranked WHERE rnk <= 5""").stripMargin,

    "ann3_ivf_topk" -> // the IVF result under the oracle: neighbor
      // identities (q_id, vec_id, rnk) are per-SF goldens — the k-means
      // fit is deterministic and restart-stable, so they are a function
      // of the data — while every SCORE is re-derived from the raw
      // embeddings (exact cosine, ann1's proven formula). An unknown SF
      // yields zero golden rows and fails the rows check loudly.
      ("""WITH golden AS (
         |  SELECT * FROM (VALUES
         |    (0,17,1),(0,225,2),(0,12,3),(0,260,4),(0,212,5),(1,209,1),(1,129,2),(1,440,3),(1,75,4),(1,455,5),
         |    (2,443,1),(2,185,2),(2,234,3),(2,309,4),(2,132,5),(3,223,1),(3,205,2),(3,84,3),(3,426,4),(3,72,5),
         |    (4,345,1),(4,98,2),(4,143,3),(4,343,4),(4,195,5),(5,113,1),(5,31,2),(5,360,3),(5,218,4),(5,395,5),
         |    (6,141,1),(6,434,2),(6,280,3),(6,444,4),(6,244,5),(7,466,1),(7,220,2),(7,18,3),(7,249,4),(7,340,5)
         |  ) g(q_id, vec_id, rnk) WHERE (SELECT count(*) FROM lineitem) = 6000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (0,365,1),(0,334,2),(0,387,3),(0,423,4),(0,73,5),(1,386,1),(1,27,2),(1,407,3),(1,195,4),(1,64,5),
         |    (2,188,1),(2,418,2),(2,471,3),(2,112,4),(2,350,5),(3,130,1),(3,149,2),(3,174,3),(3,207,4),(3,437,5),
         |    (4,114,1),(4,408,2),(4,280,3),(4,89,4),(4,470,5),(5,419,1),(5,157,2),(5,359,3),(5,316,4),(5,487,5),
         |    (6,430,1),(6,145,2),(6,437,3),(6,214,4),(6,371,5),(7,340,1),(7,425,2),(7,209,3),(7,334,4),(7,381,5)
         |  ) g(q_id, vec_id, rnk) WHERE (SELECT count(*) FROM lineitem) = 60000
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (0,1204,1),(0,291,2),(0,510,3),(0,1511,4),(0,144,5),(1,1950,1),(1,1580,2),(1,1832,3),(1,173,4),(1,665,5),
         |    (2,1303,1),(2,1912,2),(2,990,3),(2,123,4),(2,315,5),(3,720,1),(3,930,2),(3,1567,3),(3,1617,4),(3,965,5),
         |    (4,524,1),(4,1166,2),(4,76,3),(4,825,4),(4,660,5),(5,426,1),(5,1684,2),(5,1019,3),(5,1121,4),(5,478,5),
         |    (6,1805,1),(6,270,2),(6,1184,3),(6,1921,4),(6,702,5),(7,1622,1),(7,605,2),(7,160,3),(7,663,4),(7,471,5)
         |  ) g(q_id, vec_id, rnk) WHERE (SELECT count(*) FROM lineitem) = 600000
         |)
         |SELECT CAST(g.q_id AS BIGINT) AS q_id, CAST(g.vec_id AS BIGINT) AS vec_id,
         |       round(list_inner_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         |             (sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
         |              sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4) AS score,
         |       CAST(g.rnk AS INTEGER) AS rnk
         |FROM golden g
         |JOIN embeddings q ON q.vec_id = g.q_id
         |JOIN embeddings c ON c.vec_id = g.vec_id""").stripMargin,

    "ann4_lsh_recall" -> // n_exact re-derives ann1's brute-force SQL; the
      // recall constant is a measured GOLDEN per SF (the hyperplane RNG is
      // not SQL-expressible) keyed on corpus size — an unknown SF yields
      // NULL and fails loudly instead of silently passing
      ("""WITH q AS (
         |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8
         |), scored AS (
         |  SELECT q.q_id, c.vec_id,
         |         round(list_inner_product(q.qv, c.embedding::DOUBLE[]) /
         |               (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4) AS score
         |  FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.q_id
         |), ranked AS (
         |  SELECT q_id, vec_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rnk
         |  FROM scored
         |)
         |SELECT CAST(CASE (SELECT count(*) FROM lineitem)
         |         WHEN 6000 THEN 0.75 WHEN 60000 THEN 0.525 WHEN 600000 THEN 0.6 END AS DOUBLE) AS recall_at_5,
         |       CAST(count(*) AS BIGINT) AS n_exact
         |FROM ranked WHERE rnk <= 5""").stripMargin,

    "ann5_ivf_recall" -> // ann4's shape for the IVF path: n_exact from the
      // brute-force SQL; recall is a per-SF measured golden (k-means fit
      // verified JVM-restart-stable before pinning)
      ("""WITH q AS (
         |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8
         |), scored AS (
         |  SELECT q.q_id, c.vec_id,
         |         round(list_inner_product(q.qv, c.embedding::DOUBLE[]) /
         |               (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4) AS score
         |  FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.q_id
         |), ranked AS (
         |  SELECT q_id, vec_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rnk
         |  FROM scored
         |)
         |SELECT CAST(CASE (SELECT count(*) FROM lineitem)
         |         WHEN 6000 THEN 0.575 WHEN 60000 THEN 0.7 WHEN 600000 THEN 0.625 END AS DOUBLE) AS recall_at_5,
         |       CAST(count(*) AS BIGINT) AS n_exact
         |FROM ranked WHERE rnk <= 5""").stripMargin,

    "ann7_ivfpq_recall" -> // same shape as ann4/ann5/sq3: n_exact
      // re-derived by brute-force SQL, recall a per-SF golden (both
      // trained quantizers are outside SQL); composition recall sits
      // below its components' (ann5 routing, sq3 distortion), as it must
      ("""WITH q AS (
         |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8
         |), scored AS (
         |  SELECT q.q_id, c.vec_id,
         |         round(list_inner_product(q.qv, c.embedding::DOUBLE[]) /
         |               (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4) AS score
         |  FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.q_id
         |), ranked AS (
         |  SELECT q_id, vec_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rnk
         |  FROM scored
         |)
         |SELECT CAST(CASE (SELECT count(*) FROM lineitem)
         |         WHEN 6000 THEN 0.525 WHEN 60000 THEN 0.6 WHEN 600000 THEN 0.35 END AS DOUBLE) AS recall_at_5,
         |       CAST(count(*) AS BIGINT) AS n_exact
         |FROM ranked WHERE rnk <= 5""").stripMargin,

    "sq3_pq_recall" -> // n_exact re-derives the brute-force SQL; the
      // recall is a per-SF measured GOLDEN (the k-means codebook is not
      // SQL-expressible), keyed on corpus size like ann4/ann5 — unknown
      // SF → NULL → loud failure. PQ-8bit lands in the same recall band
      // as sign-LSH (ann4) and IVF (ann5) on this near-random corpus
      ("""WITH q AS (
         |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8
         |), scored AS (
         |  SELECT q.q_id, c.vec_id,
         |         round(list_inner_product(q.qv, c.embedding::DOUBLE[]) /
         |               (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4) AS score
         |  FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.q_id
         |), ranked AS (
         |  SELECT q_id, vec_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rnk
         |  FROM scored
         |)
         |SELECT CAST(CASE (SELECT count(*) FROM lineitem)
         |         WHEN 6000 THEN 0.625 WHEN 60000 THEN 0.675 WHEN 600000 THEN 0.4 END AS DOUBLE) AS recall_at_5,
         |       CAST(count(*) AS BIGINT) AS n_exact
         |FROM ranked WHERE rnk <= 5""").stripMargin,

    "sq1_int8_quantize" -> // codes re-derived bit-identically from the
      // same elementwise double formula — scale and sum_codes compare
      // EXACTLY; the explicit floor(x/s + 0.5) states the tie rule both
      // engines share (round() half-even vs half-up would diverge)
      ("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |s AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
         |qc AS (SELECT vec_id, e, scale,
         |  list_transform(e, x -> CAST(greatest(-127.0, least(127.0, floor(x / scale + 0.5))) AS INTEGER)) AS codes
         |  FROM s)
         |SELECT vec_id, CAST(len(e) AS BIGINT) AS n_dims, scale,
         |  CAST(list_sum(codes) AS BIGINT) AS sum_codes,
         |  CAST(len(list_filter(codes, c -> abs(c) = 127)) AS BIGINT) AS n_sat,
         |  round(list_max(list_transform(range(1, len(e) + 1), i -> abs(e[i] - codes[i] * scale))), 6) AS max_abs_err
         |FROM qc""").stripMargin,

    "sq2_quantized_recall" -> // no RNG anywhere in this pipeline, so the
      // oracle re-derives EVERYTHING — quantization, both rankings, the
      // recall — rather than pinning a golden like ann4/ann5; both
      // engines rank on the round(4) score with vec_id tie-break
      ("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |s AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
         |r AS (SELECT vec_id,
         |  list_transform(range(1, len(e) + 1), i -> CAST(greatest(-127.0, least(127.0, floor(e[i] / scale + 0.5))) AS DOUBLE) * scale) AS recon
         |  FROM s),
         |q AS (SELECT vec_id AS q_id, e AS qv FROM v WHERE vec_id < 8),
         |exact_scored AS (
         |  SELECT q.q_id, c.vec_id,
         |    round(list_inner_product(q.qv, c.e) / (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.e, c.e))), 4) AS score
         |  FROM q CROSS JOIN v c WHERE c.vec_id <> q.q_id),
         |exact_top AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) rnk FROM exact_scored) WHERE rnk <= 5),
         |quant_scored AS (
         |  SELECT q.q_id, c.vec_id,
         |    round(list_inner_product(q.qv, c.recon) / (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.recon, c.recon))), 4) AS score
         |  FROM q CROSS JOIN r c WHERE c.vec_id <> q.q_id),
         |quant_top AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) rnk FROM quant_scored) WHERE rnk <= 5),
         |j AS (SELECT et.q_id, et.vec_id, CASE WHEN qt.vec_id IS NULL THEN 0 ELSE 1 END AS hit
         |      FROM exact_top et LEFT JOIN quant_top qt ON et.q_id = qt.q_id AND et.vec_id = qt.vec_id)
         |SELECT round(CAST(sum(hit) AS DOUBLE) / count(*), 4) AS recall_at_5, CAST(count(*) AS BIGINT) AS n_exact FROM j""").stripMargin,

    "ann6_ivf_balance" -> // n_vectors anchored on the real corpus count;
      // cell stats are per-SF measured goldens (deterministic quantizer)
      ("""SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         |  CAST(16 AS BIGINT) AS n_cells,
         |  CAST(0 AS BIGINT) AS n_empty,
         |  CAST(CASE (SELECT count(*) FROM lineitem)
         |    WHEN 6000 THEN 57 WHEN 60000 THEN 53 WHEN 600000 THEN 226 END AS BIGINT) AS max_cell,
         |  CAST(CASE (SELECT count(*) FROM lineitem)
         |    WHEN 6000 THEN 0.114 WHEN 60000 THEN 0.106 WHEN 600000 THEN 0.113 END AS DOUBLE) AS max_share
         |FROM embeddings""").stripMargin,

    "mm1_binary_meta" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS content_md5 FROM documents",

    "mm2_decode_stub" ->
      // sniffFormat's jpeg/png arms check bytes (FFD8, 89504E47) that can't
      // begin valid UTF-8 text, so only the ASCII-prefix arms are
      // reachable here; dims replicate the stub's formula BYTE-exactly
      // (first/last raw byte via hex, not ascii() code points — those
      // diverge on multi-byte characters)
      ("""WITH b AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n, hex(encode(text)) AS h FROM documents
         |)
         |SELECT doc_id AS item_id,
         |  CASE WHEN starts_with(text, 'GIF8') THEN 'gif'
         |       WHEN starts_with(text, 'RIFF') THEN 'riff'
         |       WHEN starts_with(text, '%PDF') THEN 'pdf'
         |       WHEN substring(text, 5, 4) = 'ftyp' THEN 'mp4'
         |       ELSE 'unknown' END AS format,
         |  CAST(n AS BIGINT) AS n_bytes,
         |  CAST(16 + (n * 31 + CASE WHEN n = 0 THEN 0 ELSE ('0x' || substring(h, 1, 2))::INTEGER END) % 1024 AS INTEGER) AS width,
         |  CAST(16 + (n * 17 + CASE WHEN n = 0 THEN 0 ELSE ('0x' || substring(h, n * 2 - 1, 2))::INTEGER END) % 1024 AS INTEGER) AS height
         |FROM b""").stripMargin,

    "agg10_grouping_sets" -> // GROUPING() in DuckDB = grouping_id() in
      // Spark: first argument is the most significant bit in both
      (s"""SELECT o_orderstatus, o_orderpriority,
         |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS amount
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())""").stripMargin,

    "ts1_gap_fill" ->
      (s"""WITH agg AS (
         |  SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |         CAST(count(*) AS BIGINT) AS n_events, ${dsumSql("value")} AS amount
         |  FROM events GROUP BY 1, 2
         |), bounds AS (
         |  SELECT min(hour_start) AS lo, max(hour_start) AS hi FROM agg
         |), hours AS (
         |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM bounds
         |), types AS (
         |  SELECT DISTINCT event_type FROM agg
         |)
         |SELECT h.hour_start, t.event_type,
         |       coalesce(a.n_events, 0) AS n_events, coalesce(a.amount, 0.0) AS amount
         |FROM hours h CROSS JOIN types t
         |LEFT JOIN agg a ON a.hour_start = h.hour_start AND a.event_type = t.event_type""").stripMargin,

    "pvt1_dynamic_pivot" -> // CASE with no ELSE: empty cells stay NULL,
      // mirroring pivot's no-input-rows semantics (a6 is the else-0 form)
      (s"""SELECT o_custkey,
         |  ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS "F",
         |  ${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS "O",
         |  ${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS "P"
         |FROM orders GROUP BY o_custkey""").stripMargin,

    "smp3_stratified_sample" -> // smp1's Knuth hash, per-stratum rates
      ("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |WHERE (((o_orderkey % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296 % 100 <
         |      CASE o_orderstatus WHEN 'F' THEN 10 WHEN 'O' THEN 50 ELSE 100 END""").stripMargin,

    "mm4_perceptual_hash" -> // text bytes always take the stub arm, whose
      // 60-bit md5-prefix fingerprint is the same formula in both engines
      ("""SELECT doc_id AS item_id,
         |  CASE WHEN starts_with(text, 'GIF8') THEN 'gif'
         |       WHEN starts_with(text, 'RIFF') THEN 'riff'
         |       WHEN starts_with(text, '%PDF') THEN 'pdf'
         |       WHEN substring(text, 5, 4) = 'ftyp' THEN 'mp4'
         |       ELSE 'unknown' END AS format,
         |  ('0x' || substring(md5(text), 1, 15))::BIGINT AS phash,
         |  FALSE AS is_decoded
         |FROM documents""").stripMargin,

    "mm5_image_neardup" -> // the planted (base, variant) pairs — derived
      // from the construction (one perturbed dHash cell ⇒ Hamming ≤ 3;
      // distinct seeds ⇒ far apart), SF-independent
      ("""SELECT CAST(range AS BIGINT) AS id_a, CAST(range + 20 AS BIGINT) AS id_b
         |FROM range(0, 20)""").stripMargin,

    "mm6_audio_neardup" -> // same derivation for the audio envelope:
      // one perturbed frame ⇒ Hamming ≤ 2; distinct seeds ⇒ far apart
      ("""SELECT CAST(range AS BIGINT) AS id_a, CAST(range + 20 AS BIGINT) AS id_b
         |FROM range(0, 20)""").stripMargin,

    "mm7_video_neardup" -> // the video derivation: per-frame Hamming ≤ 2
      // by construction ⇒ ALL 8 aligned frames of a variant pair match
      ("""SELECT CAST(range AS BIGINT) AS id_a, CAST(range + 10 AS BIGINT) AS id_b,
         |       CAST(8 AS BIGINT) AS matched_frames
         |FROM range(0, 10)""").stripMargin,

    "mm8_video_shifted" -> // a one-frame-trimmed copy re-aligns at
      // offset −1 with all 7 shared frames matching; the strict
      // aligned-index voter sees none of it (pinned by the probe)
      ("""SELECT TRUE AS strict_finds_none,
         |       CAST(range AS BIGINT) AS id_a, CAST(range + 10 AS BIGINT) AS id_b,
         |       CAST(7 AS BIGINT) AS matched_frames, CAST(-1 AS BIGINT) AS shift
         |FROM range(0, 8)""").stripMargin,

    "mm3_frame_sample" -> // ASCII text: char offsets = byte offsets, so
      // substr over VARCHAR replays the binary slicing byte-exactly
      ("""WITH c AS (
         |  SELECT doc_id, text, least(CAST(ceil(len(text) / 64.0) AS INT), 4) AS n_chunks
         |  FROM documents
         |), u AS (
         |  SELECT doc_id, text, unnest(generate_series(1, n_chunks)) AS i FROM c
         |)
         |SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_idx,
         |       md5(substr(text, (i - 1) * 64 + 1, 64)) AS chunk_md5
         |FROM u""").stripMargin,

    "dd5_passage_dup" -> // list_slice mirrors slice(start,8) (both
      // truncate at the end); 1-indexed inclusive bounds
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts,
         |         CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT) AS n_p
         |  FROM documents WHERE len(string_split(text, ' ')) > 0
         |), passages AS (
         |  SELECT doc_id,
         |         array_to_string(list_slice(ts, (i - 1) * 8 + 1, i * 8), ' ') AS passage
         |  FROM toks, UNNEST(generate_series(1, n_p)) AS u(i)
         |), df AS (
         |  SELECT passage, count(DISTINCT doc_id) AS nd FROM passages GROUP BY 1
         |)
         |SELECT p.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_passages,
         |       round(CAST(sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_frac
         |FROM passages p JOIN df USING (passage)
         |GROUP BY 1""").stripMargin,

    "smp4_target_mixture" -> // same double arithmetic order both sides:
      // T = min(c/p), quota = floor(p*T); smp1's Knuth hash ranks rows
      ("""WITH counts AS (
         |  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY 1
         |), p AS (
         |  SELECT lang, c, CASE lang WHEN 'en' THEN 0.4 ELSE 0.15 END AS p FROM counts
         |), quotas AS (
         |  SELECT lang, floor(p * (SELECT min(c / p) FROM p)) AS n_keep FROM p
         |), ranked AS (
         |  SELECT doc_id, lang,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY (((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761) % 4294967296, doc_id) AS rk
         |  FROM documents
         |)
         |SELECT r.doc_id, r.lang
         |FROM ranked r JOIN quotas q USING (lang) WHERE r.rk <= q.n_keep""").stripMargin,

    "txt14_normalize" -> // DuckDB regexp_replace needs the 'g' flag for
      // replace-all (Spark's default)
      ("""SELECT event_id,
         |  trim(regexp_replace(regexp_replace(lower(props), '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g')) AS norm
         |FROM events""").stripMargin,

    "num1_try_arithmetic" -> // error-as-NULL mirrored with guards: CASE
      // for the zero divisor, TRY_CAST for the unparseable string
      ("""SELECT l_orderkey, l_linenumber,
         |  CASE WHEN l_quantity = 25 THEN NULL
         |       ELSE l_extendedprice / (l_quantity - 25) END AS safe_ratio,
         |  TRY_CAST(l_returnflag AS INTEGER) AS flag_num
         |FROM lineitem""").stripMargin,

    "src6_datagen_pushdown" -> // generate_series replays the pure-integer
      // row generator; both engines divide the same integer by 100.0, so
      // the doubles are bit-identical
      ("""SELECT CAST(i AS BIGINT) AS id,
         |       CAST(i % 100 AS BIGINT) AS bucket,
         |       CAST(i * 7919 % 100000 AS DOUBLE) / 100.0 AS price,
         |       'cat_' || CAST(i % 4 AS VARCHAR) AS category
         |FROM generate_series(0, 59999) t(i)
         |WHERE i >= 1200 AND i < 45000 AND i % 100 = 7""").stripMargin,

    "src7_datagen_agg_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(i) AS BIGINT) AS lo_id, CAST(max(i) AS BIGINT) AS hi_id
        |FROM generate_series(0, 59999) t(i)
        |WHERE i >= 1200 AND i < 45000""".stripMargin,

    "src9_datagen_groupby_pushdown" ->
      ("""SELECT CAST(i % 100 AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
         |       CAST(min(i) AS BIGINT) AS lo_id, CAST(max(i) AS BIGINT) AS hi_id
         |FROM generate_series(0, 59999) t(i)
         |WHERE i >= 1200 AND i < 45000 GROUP BY 1""").stripMargin,

    "src10_datagen_multi_groupby" ->
      ("""SELECT 'cat_' || CAST(i % 4 AS VARCHAR) AS category,
         |       CAST(i % 100 AS BIGINT) AS bucket,
         |       CAST(count(*) AS BIGINT) AS n, CAST(sum(i) AS BIGINT) AS sum_id
         |FROM generate_series(0, 59999) t(i)
         |WHERE i >= 1200 AND i < 45000 GROUP BY 1, 2""").stripMargin,

    "pack1_sequence_packing" -> // same shard/order/offset arithmetic; DuckDB
      // `//` is floor division on BIGINT, matching Spark's `DIV` for the
      // non-negative offsets here
      ("""WITH t AS (
         |  SELECT doc_id, doc_id % 8 AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) > 0
         |), c AS (
         |  SELECT doc_id, shard, n,
         |         CAST(sum(n) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS e
         |  FROM t
         |), s AS (
         |  SELECT doc_id, shard, n, e - n AS b, e FROM c
         |)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |       CAST(blk AS BIGINT) AS block_id,
         |       doc_id,
         |       CAST(least(e, (blk + 1) * 512) - greatest(b, blk * 512) AS BIGINT) AS tokens_in_block
         |FROM s, UNNEST(generate_series(b // 512, (e - 1) // 512)) AS u(blk)""").stripMargin,

    "pack2_document_packing" -> // the next-fit recurrence as a recursive
      // CTE: all shards walk in parallel rows, rn joins each step to the
      // next document in the shard
      // t is MATERIALIZED: DuckDB inlines plain CTEs into EVERY
      // iteration of a recursive CTE, re-tokenizing the corpus per row
      // rank (the pipe3 lesson — same fix)
      ("""WITH RECURSIVE t AS MATERIALIZED (
         |  SELECT doc_id, doc_id % 8 AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
         |  FROM documents WHERE len(string_split(text, ' ')) > 0
         |), walk AS (
         |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT) AS bin_id, n AS fill
         |  FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.shard, t.rn, t.doc_id, t.n,
         |         CASE WHEN w.fill + t.n > 512 THEN w.bin_id + 1 ELSE w.bin_id END,
         |         CASE WHEN w.fill + t.n > 512 THEN t.n ELSE w.fill + t.n END
         |  FROM walk w JOIN t ON t.shard = w.shard AND t.rn = w.rn + 1
         |)
         |SELECT CAST(shard AS BIGINT) AS shard, bin_id, doc_id, n AS n_tokens
         |FROM walk""").stripMargin,

    "scd1_scd2_history" -> // change rows (lag IS DISTINCT FROM state, first row
      // via lagged tie key — null-safe, mirrors scd2Snapshot) -> lead()
      // closes the interval; o_orderkey breaks observation-time ties
      ("""WITH ordered AS (
         |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         |         lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_status,
         |         lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_key
         |  FROM orders
         |), changes AS (
         |  SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from, o_orderkey
         |  FROM ordered
         |  WHERE prev_key IS NULL OR prev_status IS DISTINCT FROM o_orderstatus
         |)
         |SELECT o_custkey, o_orderstatus AS status, valid_from,
         |       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey) AS valid_to,
         |       (lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey) IS NULL) AS is_current
         |FROM changes""").stripMargin,

    "mv1_query_rewrite" -> // the mart-served aggregate must equal the
      // from-scratch aggregate over the whole fact (= all orders);
      // plan routing + control pinned in-engine
      (s"""SELECT TRUE AS served_from_mart, TRUE AS control_unrewritten,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "mv2_rewrite_filtered" -> // the key-filtered mart-served aggregate
      // must equal the filtered from-scratch aggregate; the time-travel
      // count is v1's truth (the F slice); plan routing pinned in-engine
      (s"""SELECT TRUE AS filtered_from_mart, TRUE AS timetravel_unrewritten,
         |       (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderstatus = 'F') AS n_f_at_v1,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders WHERE o_orderstatus IN ('F', 'O')
         |GROUP BY o_orderstatus""").stripMargin,

    "mv3_rewrite_minmax" -> // the mart-served count/min/max must equal
      // the filtered from-scratch aggregate; routing pinned in-engine
      ("""SELECT TRUE AS served_from_mart, TRUE AS sum_control_unrewritten,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
         |FROM orders WHERE o_orderstatus IN ('F', 'O')
         |GROUP BY o_orderstatus""").stripMargin,

    "mv4_rewrite_composite" -> // the composite-key mart (maintained
      // through an append + MOR-delete window) must serve the exact
      // (status, priority) aggregate over the final state
      (s"""SELECT TRUE AS served_from_mart, TRUE AS single_key_unrewritten,
         |       o_orderpriority, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders WHERE o_custkey % 5 <> 0
         |GROUP BY o_orderpriority, o_orderstatus""").stripMargin,

    "mv5_staleness_guard" -> // after one maintainAndReregister call the
      // mart serves the WHOLE fact (all four o_orderkey%4 slices = all
      // orders); the four plan-probe booleans pin the staleness
      // life-cycle in-engine
      (s"""SELECT TRUE AS fresh_rewrites, TRUE AS stale_within_bound_rewrites,
         |       TRUE AS past_bound_disabled, TRUE AS reregistered_rewrites,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "mv6_rewrite_avg" -> // the mart-served avg (exact decimal sum ÷
      // count, divided as doubles) must equal the from-scratch davg;
      // routing and the unregistered-column control pinned in-engine
      (s"""SELECT TRUE AS avg_from_mart, TRUE AS other_column_unrewritten,
         |       o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price,
         |       ${graft.ops.ExactSums.davgSql("o_totalprice")} AS avg_price
         |FROM orders WHERE o_orderstatus IN ('F', 'O')
         |GROUP BY o_orderstatus""").stripMargin,

    "mv7_rewrite_join" -> // the mart-served join-agg must equal the
      // from-scratch orders⋈customer aggregate over the WHOLE fact
      // (both slices maintained in); routing probes pinned in-engine
      (s"""SELECT TRUE AS join_from_mart, TRUE AS other_key_unrewritten,
         |       c_mktsegment,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""").stripMargin,

    "mv8_rewrite_join_agg" -> // the agg-mart-served join aggregate must
      // equal the from-scratch orders⋈customer groupBy over exactly the
      // surviving window (create %3=0, append %3=1, MOR-delete %9=0);
      // the three routing probes are pinned in-engine
      (s"""SELECT TRUE AS agg_from_agg_mart, TRUE AS join_from_join_mart,
         |       TRUE AS other_key_on_join_mart,
         |       c_mktsegment,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 9 <> 0
         |GROUP BY c_mktsegment""").stripMargin,

    "lake11_incr_agg" -> // the maintained mart must equal the
      // from-scratch aggregate; per-step delta sizes pin that each pass
      // consumed exactly its append (and pass 3 nothing)
      (s"""SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderstatus = 'O') AS step1_rows,
         |  (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderstatus = 'P') AS step2_rows,
         |  CAST(0 AS BIGINT) AS step3_rows,
         |  o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus""").stripMargin,

    "lake10_delete_cow" -> // DELETE WHERE pred keeps exactly the rows for
      // which pred is not true; the COW shape (tail files only) is
      // pinned by rewrote_minority
      (s"""SELECT TRUE AS rewrote_minority, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |WHERE NOT (o_orderdate >= TIMESTAMP '2000-01-01')
         |GROUP BY o_orderstatus""").stripMargin,

    "lake9_merge_cow" -> // MERGE semantics replayed relationally: batch
      // rows win on key, the rest of the table carries; the COW part
      // (only boundary files rewrote) is pinned by rewrote_minority
      (s"""WITH batch AS (
         |  SELECT * REPLACE ('X' AS o_orderstatus,
         |                    o_totalprice + 1000.0 AS o_totalprice)
         |  FROM orders WHERE o_orderkey <= 100
         |  UNION ALL
         |  SELECT * REPLACE (o_orderkey + 1000000000 AS o_orderkey)
         |  FROM orders WHERE o_orderkey <= 10
         |), merged AS (
         |  SELECT * FROM orders
         |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
         |  UNION ALL
         |  SELECT * FROM batch
         |)
         |SELECT TRUE AS rewrote_minority, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM merged GROUP BY o_orderstatus""").stripMargin,

    "lake8_keyjoin_pruned" -> // the key-pruned fact join must equal the
      // plain inner join; pruned_some mirrors the observed file drop
      (s"""SELECT TRUE AS pruned_some, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_custkey < 10
         |GROUP BY o_orderstatus""").stripMargin,

    "lake7_manifest_count" -> // the metadata-resolved count must equal the
      // scanned count exactly; the mirrors pin the resolution shape
      ("""SELECT CAST(count(*) AS BIGINT) AS n_orders,
         |       TRUE AS meta_resolved_some, TRUE AS scanned_minority
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'""").stripMargin,

    "lake6_zorder_pruned" -> // the z-order-pruned 2-d box scan must equal
      // the plain filtered aggregate; pruned_some mirrors the file drop
      (s"""SELECT TRUE AS pruned_some, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND o_totalprice < 100000.0
         |GROUP BY o_orderstatus""").stripMargin,

    "lake5_bloom_pruned" -> // the bloom-pruned point lookup must equal the
      // plain IN-probe (skipping is an optimization, never a semantics
      // change); pruned_some mirrors the observed file drop
      ("""SELECT TRUE AS pruned_some, o_orderkey, o_custkey,
         |       o_orderstatus, o_totalprice
         |FROM orders WHERE o_orderkey IN (7, 42, 1337)""").stripMargin,

    "lake4_stats_pruned" -> // the stats-pruned scan must equal the plain
      // filtered aggregate (pruning is an optimization, never a
      // semantics change); pruned_some mirrors the observed file drop
      (s"""SELECT TRUE AS pruned_some, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-07-01'
         |GROUP BY o_orderstatus""").stripMargin,

    "lake3_changes_since" -> // the delta from cursor v2 to tip v3 is the
      // 'P' append alone; the tip version is a literal mirror
      (s"""SELECT CAST(3 AS BIGINT) AS tip_version, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders WHERE o_orderstatus = 'P' GROUP BY o_orderstatus""").stripMargin,

    "lake2_state_skip" -> // run 1 builds, run 2 skips — the actions are
      // literal mirrors, so a skip that didn't happen breaks the hash;
      // both runs must serve the same committed aggregate
      ("""SELECT CAST(1 AS INT) AS run, 'built' AS action, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders
         |FROM orders WHERE o_totalprice > 0 GROUP BY o_orderstatus
         |UNION ALL
         |SELECT CAST(2 AS INT) AS run, 'skipped' AS action, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders
         |FROM orders WHERE o_totalprice > 0 GROUP BY o_orderstatus""").stripMargin,

    "lake1_manifest_timetravel" -> // both manifest versions' content
      // re-derived from the source table: version 2 = the F-then-O
      // append state, version 3 = the overwrite; snapshot isolation on
      // the Spark side is what makes version 2 still readable
      (s"""SELECT CAST(2 AS BIGINT) AS version, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY o_orderstatus
         |UNION ALL
         |SELECT CAST(3 AS BIGINT) AS version, o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dsumSql("o_totalprice")} AS total_price
         |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |GROUP BY o_orderstatus""").stripMargin,

    "mrg1_merge_upsert" -> // MERGE = full outer on the key: source wins the
      // state columns WHEN ITS KEY IS PRESENT (even if the value is NULL —
      // mirrors mergeUpsert's source-present marker), counts accumulate,
      // absent sides coalesce to 0
      ("""WITH tgt_r AS (
         |  SELECT o_custkey, o_orderstatus, o_orderdate,
         |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
         |), tgt AS (
         |  SELECT o_custkey, max(CASE WHEN rn = 1 THEN o_orderstatus END) AS status,
         |         max(o_orderdate) AS last_order, CAST(count(*) AS BIGINT) AS n_orders
         |  FROM tgt_r GROUP BY 1
         |), src_r AS (
         |  SELECT o_custkey, o_orderstatus, o_orderdate,
         |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         |  FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
         |), src AS (
         |  SELECT o_custkey, max(CASE WHEN rn = 1 THEN o_orderstatus END) AS status,
         |         max(o_orderdate) AS last_order, CAST(count(*) AS BIGINT) AS n_orders
         |  FROM src_r GROUP BY 1
         |)
         |SELECT coalesce(t.o_custkey, s.o_custkey) AS o_custkey,
         |       CASE WHEN s.o_custkey IS NOT NULL THEN s.status ELSE t.status END AS status,
         |       CASE WHEN s.o_custkey IS NOT NULL THEN s.last_order ELSE t.last_order END AS last_order,
         |       CAST(coalesce(t.n_orders, 0) + coalesce(s.n_orders, 0) AS BIGINT) AS n_orders
         |FROM tgt t FULL JOIN src s ON t.o_custkey = s.o_custkey""").stripMargin
  )
}
