#!/usr/bin/env python3
"""Decomposed DuckDB oracles for the two x10-intractable queries (r14
verdict #3): q115 triangle count and q97 tf-idf cosine join.

The committed per-query oracles are monolithic SQL whose ONE explosive
join exceeds the box at x10 — q115's wedge enumeration and q97's
term-pair aggregate each spilled past the free disk. Same SEMANTICS,
different EVALUATION SHAPE: materialize the shared spines as temp
tables, run the explosive join in HASH BUCKETS over its pivot key
(q115: the oriented wedge pivot s; q97: the term), accumulate partial
results in a table, merge. Correctness of the decomposition: the
bucket key partitions the pivot space DISJOINTLY and exhaustively —
q115 counts each triangle exactly once via its unique oriented pivot,
whose bucket is fixed; q97's per-bucket (doc_a, doc_b) partial sums
add to the flat GROUP BY because every term lives in exactly one
bucket. Every bucket pass is bounded at ~1/B of the flat intermediate.

Usage: python3 scripts/x10_decomposed.py <sfDir> <verifyOutDir>
           [--buckets N] [--only q115,q97] [--patch-json path ...]

Compares against the Spark parquet with oracle_check.py's own
compare/norm (imported — one definition of "equal"). --patch-json
rewrites the named committed artifact's entry for each query that ran,
recording status/rows plus the decomposition note.
"""
import json
import pathlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import oracle_check  # noqa: E402  (shared compare / norm)

# q97/q298/q302 constants — RetrievalQueries.scala (TfidfDupMod/Shift,
# DfCapPm, IdfScale, TauBp, PostingCap) and Relevance.DefaultMinTermLen
DUP_MOD, DUP_SHIFT = 20, 700000
DF_CAP_PM, IDF_SCALE, TAU_BP, MIN_TERM = 100, 100, 60, 3
POSTING_CAP = 8


def run_q115(con, buckets: int) -> pd.DataFrame:
    con.execute("""
      CREATE OR REPLACE TABLE x115_pairs AS
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey""")
    con.execute("""
      CREATE OR REPLACE TABLE x115_deg AS
      SELECT n, count(*) AS d FROM (
        SELECT u AS n FROM x115_pairs UNION ALL SELECT v FROM x115_pairs)
      GROUP BY n""")
    con.execute("""
      CREATE OR REPLACE TABLE x115_o AS
      SELECT CASE WHEN (da.d, u) < (db.d, v) THEN u ELSE v END AS s,
             CASE WHEN (da.d, u) < (db.d, v) THEN v ELSE u END AS t
      FROM x115_pairs JOIN x115_deg da ON da.n = u
        JOIN x115_deg db ON db.n = v""")
    con.execute("CREATE OR REPLACE TABLE x115_acc(node BIGINT, c BIGINT)")
    # Per bucket, the join ORDER is forced by materialization: first the
    # bucket's pivot slice, then its wedge set (≈1/B of all wedges — the
    # quantity whose FULL enumeration is what spilled the flat oracle;
    # left to the optimizer, DuckDB reorders to the UNRESTRICTED
    # o2⋈o3 pair first and the bucket filter never prunes anything),
    # then the close against the full edge table (a bounded hash build).
    for i in range(buckets):
        con.execute(f"""
          CREATE OR REPLACE TABLE x115_o1b AS
          SELECT s, t FROM x115_o WHERE hash(s) % {buckets} = {i}""")
        con.execute("""
          CREATE OR REPLACE TABLE x115_wb AS
          SELECT o1.s AS a, o1.t AS b, o2.t AS c
          FROM x115_o1b o1 JOIN x115_o o2
            ON o1.s = o2.s AND o1.t < o2.t""")
        con.execute("""
          CREATE OR REPLACE TABLE x115_tri AS
          SELECT w.a, w.b, w.c
          FROM x115_wb w JOIN x115_o o3
            ON least(o3.s, o3.t) = w.b AND greatest(o3.s, o3.t) = w.c""")
        con.execute("""
          INSERT INTO x115_acc
          SELECT n2, count(*) FROM (
            SELECT a AS n2 FROM x115_tri UNION ALL
            SELECT b FROM x115_tri UNION ALL
            SELECT c FROM x115_tri) GROUP BY n2""")
        print(f"  q115 bucket {i + 1}/{buckets} done", flush=True)
    for t in ("x115_o1b", "x115_wb", "x115_tri"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    return con.execute("""
      SELECT deg.n AS node,
        CAST(coalesce(t.c, 0) AS BIGINT) AS tri_cnt
      FROM x115_deg deg LEFT JOIN (
        SELECT node, CAST(sum(c) AS BIGINT) AS c
        FROM x115_acc GROUP BY node) t ON t.node = deg.n
      ORDER BY node""").fetchdf()


_q97_spine_done = False


def ensure_q97_spine(con, buckets: int) -> None:
    """Materialize the shared q97 spine (x97_base/x97_w/x97_norms) and
    the bucketed above-threshold exact pair set x97_res — shared by the
    q97 compare and the q302 recall audit, built once per process."""
    global _q97_spine_done
    if _q97_spine_done:
        return
    _build_q97_spine(con, buckets)
    _q97_spine_done = True


def _build_q97_spine(con, buckets: int) -> None:
    con.execute(f"""
      CREATE OR REPLACE TABLE x97_base AS
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DUP_SHIFT}, text || ' zqx' FROM documents
      WHERE doc_id % {DUP_MOD} = 0""")
    n_docs = con.execute("SELECT count(*) FROM x97_base").fetchone()[0]
    con.execute(f"""
      CREATE OR REPLACE TABLE x97_w AS
      SELECT term, doc_id,
        CAST(tf AS HUGEINT) *
          ((CAST({n_docs} AS HUGEINT) * {IDF_SCALE}) // df) AS w
      FROM (SELECT term, doc_id, tf,
          count(*) OVER (PARTITION BY term) AS df
        FROM (SELECT term, doc_id, count(*) AS tf
          FROM (SELECT doc_id, lower(t) AS term
            FROM (SELECT doc_id, unnest(
                regexp_split_to_array(text, '[^A-Za-z]+')) AS t
              FROM x97_base)
            WHERE length(t) >= {MIN_TERM})
          GROUP BY term, doc_id))
      WHERE df * 1000 <= {n_docs} * {DF_CAP_PM}""")
    con.execute("""
      CREATE OR REPLACE TABLE x97_norms AS
      SELECT doc_id, sum(w * w) AS n2 FROM x97_w GROUP BY doc_id""")
    # Bucket by DOC_A, not term: a pair's doc_a lives in exactly one
    # bucket, so every bucket pass produces COMPLETE (doc_a, doc_b)
    # groups — the tau filter applies inside the pass and only its few
    # survivors accumulate (the term-bucketed first attempt deferred one
    # giant pair merge to the end and spilled past the disk there).
    con.execute("""
      CREATE OR REPLACE TABLE x97_res(
        doc_a BIGINT, doc_b BIGINT, dot DOUBLE, n_shared BIGINT,
        n2a DOUBLE, n2b DOUBLE)""")
    for i in range(buckets):
        con.execute(f"""
          INSERT INTO x97_res
          SELECT doc_a, doc_b, CAST(dot AS DOUBLE) AS dotd, n_shared,
            CAST(na.n2 AS DOUBLE) AS n2a, CAST(nb.n2 AS DOUBLE) AS n2b
          FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              sum(a.w * b.w) AS dot,
              CAST(count(*) AS BIGINT) AS n_shared
            FROM x97_w a JOIN x97_w b
              ON a.term = b.term AND a.doc_id < b.doc_id
            WHERE hash(a.doc_id) % {buckets} = {i}
            GROUP BY 1, 2) p
          JOIN x97_norms na ON p.doc_a = na.doc_id
          JOIN x97_norms nb ON p.doc_b = nb.doc_id
          WHERE CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) * 10000.0 >=
            {TAU_BP * TAU_BP}.0 * CAST(na.n2 AS DOUBLE)
              * CAST(nb.n2 AS DOUBLE)""")
        print(f"  q97 bucket {i + 1}/{buckets} done", flush=True)


def run_q97(con, buckets: int) -> pd.DataFrame:
    ensure_q97_spine(con, buckets)
    return con.execute("""
      SELECT doc_a, doc_b, dot, n_shared, n2a, n2b FROM x97_res
      ORDER BY doc_a, doc_b""").fetchdf()


def run_q302(con, buckets: int) -> pd.DataFrame:
    """q302 recall audit at x10: the exact side is the decomposed q97
    pair set (x97_res — already above-threshold, with exact-cast
    dot/norms); the capped side replays the q298 flat oracle off the
    same x97_w spine (candidates <= vocab*K^2 — never explosive); the
    full-outer aggregate mirrors the committed oracle verbatim."""
    ensure_q97_spine(con, buckets)
    con.execute(f"""
      CREATE OR REPLACE TABLE x302_cand AS
      SELECT term, doc_id FROM (
        SELECT term, doc_id, row_number() OVER (PARTITION BY term
          ORDER BY w DESC, doc_id) AS rn FROM x97_w)
      WHERE rn <= {POSTING_CAP}""")
    con.execute("""
      CREATE OR REPLACE TABLE x302_cp AS
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM x302_cand a JOIN x302_cand b
        ON a.term = b.term AND a.doc_id < b.doc_id""")
    con.execute(f"""
      CREATE OR REPLACE TABLE x302_c AS
      SELECT doc_a, doc_b FROM (
        SELECT p.doc_a, p.doc_b, CAST(p.dot AS DOUBLE) AS dot,
          CAST(na.n2 AS DOUBLE) AS n2a, CAST(nb.n2 AS DOUBLE) AS n2b
        FROM (SELECT cp.doc_a, cp.doc_b, sum(wa.w * wb.w) AS dot
          FROM x302_cp cp JOIN x97_w wa ON wa.doc_id = cp.doc_a
            JOIN x97_w wb ON wb.doc_id = cp.doc_b AND wb.term = wa.term
          GROUP BY 1, 2) p
        JOIN x97_norms na ON p.doc_a = na.doc_id
        JOIN x97_norms nb ON p.doc_b = nb.doc_id)
      WHERE dot * dot * 10000.0 >= {TAU_BP * TAU_BP}.0 * n2a * n2b""")
    return con.execute("""
      WITH e AS (SELECT doc_a, doc_b, dot, n2a, n2b, 1 AS in_e
          FROM x97_res),
        c AS (SELECT doc_a, doc_b, 1 AS in_c FROM x302_c),
        fo AS (SELECT dot, n2a, n2b, in_e, in_c
          FROM e FULL JOIN c USING (doc_a, doc_b))
      SELECT CAST(sum(coalesce(in_e, 0)) AS BIGINT) AS n_exact_pairs,
        CAST(sum(coalesce(in_c, 0)) AS BIGINT) AS n_capped_pairs,
        CAST(sum(CASE WHEN in_e = 1 AND in_c = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_retained,
        CAST(sum(CASE WHEN in_e = 1 AND in_c IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_missed,
        CAST(sum(CASE WHEN in_e IS NULL AND in_c = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_phantom,
        (1000000 * CAST(sum(CASE WHEN in_e = 1 AND in_c = 1
            THEN 1 ELSE 0 END) AS BIGINT))
          // CAST(sum(coalesce(in_e, 0)) AS BIGINT) AS recall_ppm,
        CAST(max(CASE WHEN in_e = 1 AND in_c IS NULL THEN
          floor(dot * dot * 1000000.0 / (n2a * n2b)) END) AS BIGINT)
          AS max_missed_cos2_ppm
      FROM fo""").fetchdf()


SPARK_OUT = {"q115": "q115_triangle_count", "q97": "q97_tfidf_cosine_join",
             "q302": "q302_tfidf_cap_recall_audit"}
RUNNERS = {"q115": run_q115, "q97": run_q97, "q302": run_q302}


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    buckets, only, patch = 32, ["q115", "q97"], []
    i = 0
    while i < len(rest):
        if rest[i] == "--buckets":
            buckets = int(rest[i + 1]); i += 2
        elif rest[i] == "--only":
            only = rest[i + 1].split(","); i += 2
        elif rest[i] == "--patch-json":
            patch.append(rest[i + 1]); i += 2
        else:
            raise SystemExit(f"unknown arg {rest[i]}")
    con = duckdb.connect()
    con.execute("PRAGMA memory_limit='40GB'")
    con.execute("PRAGMA temp_directory='/tmp/duck_decomp_spill'")
    for t in oracle_check.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results = {}
    rc = 0
    for q in only:
        name = SPARK_OUT[q]
        print(f"{q}: decomposed oracle over {buckets} buckets", flush=True)
        want = RUNNERS[q](con, buckets)
        got = pd.read_parquet(f"{out_dir}/{name}")
        errs = oracle_check.compare(name, got, want)
        note = (f"decomposed oracle (scripts/x10_decomposed.py, "
                f"{buckets} hash buckets over the explosive join's "
                f"pivot key) - flat oracle documented intractable")
        if errs:
            rc = 1
            print(f"FAIL {name}:")
            for e in errs[:4]:
                print(f"  - {e}")
            results[name] = {"status": "fail", "errors": errs[:8],
                             "oracle": note}
        else:
            print(f"PASS {name} ({len(got)} rows)")
            results[name] = {"status": "pass", "rows": int(len(got)),
                             "oracle": note}
    for path in patch:
        with open(path) as f:
            doc = json.load(f)
        touched = False
        for name, entry in results.items():
            # add-or-replace: a NEW decomposed query (q302, r17) must
            # merge into the artifact, not silently skip it
            doc.setdefault("queries", {})[name] = entry
            touched = True
        if touched:
            # recompute the summary counters from the patched queries
            # map wholesale — incremental adjustment only covered the
            # err->pass transition and left any other rewrite (fail->
            # pass, pass->fail) inconsistent with the per-query entries
            for s in ("pass", "fail", "err"):
                doc[f"n_{s}"] = sum(
                    1 for e in doc["queries"].values()
                    if e.get("status") == s)
            with open(path, "w") as f:
                json.dump(doc, f, indent=1, sort_keys=True)
            print(f"patched {path}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
