#!/usr/bin/env python3
"""Build structure-preserving scaled inputs for the graph/string scaling
audit (r9 verdict #5).

Scaling by F = union of F DISJOINT key-shifted copies of the sf0.1
tables: every copy preserves the original's per-order basket sizes,
degree distribution and name/text structure exactly, so the measured
time-vs-m curve isolates the DATA VOLUME axis (degeneracy, diameter and
per-key densities stay constant — the regime the operators' complexity
claims are about). String columns that feed similarity operators rotate
their alphabet per copy (Caesar on letters+digits), keeping lengths and
within-copy structure identical while making cross-copy tokens/grams/
names disjoint — without this, F identical text copies would manufacture
a massive cross-copy duplicate workload the original data doesn't have.

Usage: python3 scripts/make_scale.py <factor> [outDir] [--shared-vocab]
Writes /tmp/scale_x<factor>/ by default. Key shifts are clean powers of
10 above each key's max, so copies can't collide at any factor <= 10^k.

--shared-vocab (r17, the q97 binding-regime fixture the r16 verdict
called for): documents copies keep their text VERBATIM — no per-copy
alphabet rotation — so the vocabulary stays CONSTANT and every term's
df grows proportionally to N. This is the real-corpus regime for
corpus-relative df caps (df/N stays fixed, the cap's binding set is
scale-invariant), the exact opposite of the default disjoint-vocab
mode (df constant, the cap un-binds once N/10 passes max df). Expect
pair-join candidate volume Sigma df^2 to grow ~N^2 here — that is the
law under test, not an artifact. Non-document tables are built
exactly as in the default mode.
"""
import pathlib
import shutil
import sys

import duckdb

SF = "/root/testdata/sf0.1"
LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGIT = "0123456789"


def rot(s: str, n: int) -> str:
    return s[n % len(s):] + s[:n % len(s)]


def caesar_expr(col: str, c: int) -> str:
    """Per-copy character bijection: rotate letters by c, digits by c."""
    src = LOWER + UPPER + DIGIT
    dst = rot(LOWER, c) + rot(UPPER, c) + rot(DIGIT, c)
    return f"translate({col}, '{src}', '{dst}')"


def main() -> int:
    shared_vocab = "--shared-vocab" in sys.argv
    argv = [a for a in sys.argv if a != "--shared-vocab"]
    factor = int(argv[1])
    out = pathlib.Path(argv[2] if len(argv) > 2
                       else f"/tmp/scale_x{factor}")
    assert 1 <= factor <= 10
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)

    con = duckdb.connect()

    def shift_for(table: str, key: str) -> int:
        mx = con.execute(
            f"SELECT max({key}) FROM read_parquet('{SF}/{table}.parquet')"
        ).fetchone()[0]
        s = 10
        while s <= mx:
            s *= 10
        return s

    so = shift_for("lineitem", "l_orderkey")
    sp = shift_for("part", "p_partkey")
    ss = shift_for("supplier", "s_suppkey")
    sc = shift_for("customer", "c_custkey")
    sd = shift_for("documents", "doc_id")

    def copies(select_for_copy) -> str:
        return " UNION ALL ".join(select_for_copy(c) for c in range(factor))

    # lineitem: the co-purchase graph's edge source (q115/q118/q153) and
    # the bipartite pagerank's (q67) — shift all three keys coherently
    con.execute(f"""COPY ({copies(lambda c: f'''
        SELECT * REPLACE (l_orderkey + {c}*{so} AS l_orderkey,
          l_partkey + {c}*{sp} AS l_partkey,
          l_suppkey + {c}*{ss} AS l_suppkey)
        FROM read_parquet('{SF}/lineitem.parquet')''')})
        TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")

    # part: q118's seed set (p_partkey % 97) — each copy seeds at its own
    # residues, keeping seed density ~1/97 at every factor
    con.execute(f"""COPY ({copies(lambda c: f'''
        SELECT * REPLACE (p_partkey + {c}*{sp} AS p_partkey)
        FROM read_parquet('{SF}/part.parquet')''')})
        TO '{out}/part.parquet' (FORMAT PARQUET)""")

    # customer: q84's FastSS input — rotate name digits/letters per copy
    # so cross-copy names are many edits apart (no manufactured pairs)
    con.execute(f"""COPY ({copies(lambda c: f'''
        SELECT * REPLACE (c_custkey + {c}*{sc} AS c_custkey,
          {caesar_expr('c_name', c)} AS c_name)
        FROM read_parquet('{SF}/customer.parquet')''')})
        TO '{out}/customer.parquet' (FORMAT PARQUET)""")

    # documents: q107's gram universe — full text rotation per copy in
    # the default (disjoint-vocab) mode; verbatim text in shared-vocab
    # mode so per-term df grows with N (see module doc)
    def doc_text(c: int) -> str:
        return "text" if shared_vocab else caesar_expr("text", c)
    con.execute(f"""COPY ({copies(lambda c: f'''
        SELECT * REPLACE (doc_id + {c}*{sd} AS doc_id,
          {doc_text(c)} AS text)
        FROM read_parquet('{SF}/documents.parquet')''')})
        TO '{out}/documents.parquet' (FORMAT PARQUET)""")

    for t in ("region", "nation", "supplier", "orders", "events",
              "embeddings"):
        shutil.copy(f"{SF}/{t}.parquet", out / f"{t}.parquet")

    for t in ("lineitem", "part", "customer", "documents"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"[scale x{factor}] {t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
