#!/usr/bin/env python3
"""Seeded differential fuzz against the REAL DuckDB oracle (r9 verdict #3).

The per-round driver gate runs every query against DuckDB on ONE
driver-generated fixture; this script re-runs the SAME operator-vs-oracle
compare on seeded random SUBSAMPLES of that fixture, so fixture-shaped
constants (the k-core k=80->68 class) and distribution-dependent branches
get exercised on inputs the fixtures never produce (sparser graphs, empty
groups, missing keys, broken join coverage). Complements
DifferentialFuzzSpec (operator vs independent naive Scala reference in
`sbt test`): here the reference is DuckDB itself, end to end.

Usage:
    python3 scripts/diff_fuzz.py <seed> [--sf /root/testdata/sf0.001] \
        [--only q150,q157] [--keep]

Per seed: each parquet table is reservoir-sampled at a seeded rate in
[0.4, 0.9] (REPEATABLE, so reruns are identical) into /tmp/difffuzz_<seed>/,
graft.Verify runs over it, and scripts/oracle_check.py compares every
query against DuckDB on the same subsampled tables. Exit 0 iff the gate
passes. Empty-vs-empty agreements are fine (the check is agreement, not
coverage); a query that ERRORS on a subsample is a robustness finding.
"""
import argparse
import pathlib
import random
import shutil
import subprocess
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
# tiny dimension tables anchor referential joins — never subsample them
KEEP_WHOLE = {"region", "nation"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("seed", type=int)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None,
                    help="comma-separated query-name prefixes")
    ap.add_argument("--keep", action="store_true",
                    help="keep the subsampled tables on disk")
    ap.add_argument("--ts-mode", choices=["none", "dst", "dst-gap"],
                    default="none",
                    help="dst: globally shift events.ts (seeded jitter) so "
                         "the series straddles a Europe/Helsinki DST "
                         "transition instant - even seeds the spring-forward "
                         "(2024-03-31 01:00 UTC), odd seeds the fall-back "
                         "(2024-10-27 01:00 UTC). Gaps/sessions/windows keep "
                         "their relative structure; the run verifies no "
                         "query sneaks in local-time semantics the two "
                         "engines could disagree on around the boundary "
                         "(r14 verdict item 8: the one input dimension the "
                         "fuzz corpus had not stressed). "
                         "dst-gap: shift so the series' LARGEST inter-event "
                         "gap (middle 80%% of the series) brackets the "
                         "transition instant - session/island gap arithmetic "
                         "(the q20/q116/q151 class) then evaluates its "
                         "gap-threshold comparisons exactly astride the "
                         "1-hour wall-clock discontinuity (r15 verdict "
                         "item 7: stress the gap math, not just the parse)")
    args = ap.parse_args()

    rnd = random.Random(args.seed)
    fuzz_dir = pathlib.Path(f"/tmp/difffuzz_{args.seed}")
    out_dir = pathlib.Path(f"/tmp/difffuzz_out_{args.seed}")
    for d in (fuzz_dir, out_dir):
        shutil.rmtree(d, ignore_errors=True)
        d.mkdir(parents=True)

    con = duckdb.connect()
    for t in TABLES:
        src = f"{args.sf}/{t}.parquet"
        dst = fuzz_dir / f"{t}.parquet"
        if t in KEEP_WHOLE:
            shutil.copy(src, dst)
            continue
        pct = 40 + rnd.randrange(51)  # 40..90%
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') USING SAMPLE "
            f"reservoir({pct}%) REPEATABLE ({args.seed})) TO '{dst}' "
            f"(FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"[fuzz] {t}: {pct}% -> {n} rows")

    if args.ts_mode == "dst-gap":
        ev = fuzz_dir / "events.parquet"
        boundary = ("2024-03-31 01:00:00" if args.seed % 2 == 0
                    else "2024-10-27 01:00:00")
        tgt = con.execute(
            f"SELECT epoch_us(TIMESTAMP '{boundary}')").fetchone()[0]
        # the largest inter-event gap in the middle 80% of the series:
        # the pair most likely to be a session-splitting gap in every
        # gap-threshold query
        gap_row = con.execute(f"""
            WITH o AS (SELECT epoch_us(ts) AS t,
                lead(epoch_us(ts)) OVER (ORDER BY ts, event_id) AS nxt,
                percent_rank() OVER (ORDER BY ts, event_id) AS pr
              FROM read_parquet('{ev}'))
            SELECT t, nxt FROM o
            WHERE nxt IS NOT NULL AND nxt > t AND pr BETWEEN 0.1 AND 0.9
            ORDER BY nxt - t DESC, t LIMIT 1""").fetchone()
        # a heavily subsampled events table can lack any qualifying
        # mid-series gap (fetchone -> None), and a 1-microsecond gap
        # would land the boundary exactly ON an event and trip the
        # bracket assert below — fall back to the plain dst shift,
        # which only needs a non-empty series (r16 advice #1)
        if gap_row is None or gap_row[1] is None or \
                int(gap_row[1]) - int(gap_row[0]) < 2:
            print("[fuzz] dst-gap: no usable mid-series gap (need an "
                  "inter-event gap >= 2us in the middle 80%); falling "
                  "back to plain dst mode")
            args.ts_mode = "dst"
    if args.ts_mode == "dst-gap":
        ga, gb = gap_row
        gap = int(gb) - int(ga)
        # seeded jitter bounded to the gap's middle half keeps the
        # boundary STRICTLY inside the chosen gap
        jitter_us = rnd.randrange(-(gap // 4), gap // 4 + 1)
        delta_us = int(tgt) + jitter_us - (int(ga) + gap // 2)
        shifted = fuzz_dir / "events_dstgap.parquet"
        con.execute(
            f"COPY (SELECT * REPLACE (ts + INTERVAL ({delta_us}) "
            f"MICROSECONDS AS ts) FROM read_parquet('{ev}')) TO "
            f"'{shifted}' (FORMAT PARQUET)")
        shifted.replace(ev)
        # assert the transition lands inside an EMPTY inter-event
        # stretch: the nearest events bracket it at the shifted gap
        # endpoints, so every session/window comparison around the
        # boundary exercises the discontinuity
        below, above = con.execute(f"""
            SELECT max(CASE WHEN epoch_us(ts) < {tgt} THEN epoch_us(ts) END),
                   min(CASE WHEN epoch_us(ts) > {tgt} THEN epoch_us(ts) END)
            FROM read_parquet('{ev}')""").fetchone()
        assert below is not None and above is not None, "no straddle"
        assert int(below) == int(ga) + delta_us, (below, ga, delta_us)
        assert int(above) == int(gb) + delta_us, (above, gb, delta_us)
        print(f"[fuzz] events.ts shifted {delta_us}us -> the largest "
              f"mid-series gap ({gap}us) brackets the {boundary}Z DST "
              f"transition; bracket asserted "
              f"({int(tgt) - int(below)}us below, "
              f"{int(above) - int(tgt)}us above)")

    if args.ts_mode == "dst":
        ev = fuzz_dir / "events.parquet"
        med, lo, hi = con.execute(
            f"SELECT epoch_us(median(ts)), epoch_us(min(ts)), "
            f"epoch_us(max(ts)) FROM read_parquet('{ev}')"
        ).fetchone()
        boundary = ("2024-03-31 01:00:00" if args.seed % 2 == 0
                    else "2024-10-27 01:00:00")
        tgt = con.execute(
            f"SELECT epoch_us(TIMESTAMP '{boundary}')").fetchone()[0]
        # clamp the jitter so the shifted series is GUARANTEED to
        # straddle the boundary: the median lands at tgt+jitter, so
        # keep |jitter| well inside each side's span around the median
        # (90% margin), capped at the advertised +-12h. Without the
        # clamp a heavily subsampled slice could land entirely on one
        # side and the run would silently test nothing.
        jit_lo = -min(12 * 3600 * 1_000_000, int((int(med) - int(lo)) * 0.9))
        jit_hi = min(12 * 3600 * 1_000_000, int((int(hi) - int(med)) * 0.9))
        jitter_us = rnd.randrange(jit_lo, jit_hi + 1)
        delta_us = int(tgt) + jitter_us - int(med)
        shifted = fuzz_dir / "events_dst.parquet"
        con.execute(
            f"COPY (SELECT * REPLACE (ts + INTERVAL ({delta_us}) "
            f"MICROSECONDS AS ts) FROM read_parquet('{ev}')) TO "
            f"'{shifted}' (FORMAT PARQUET)")
        shifted.replace(ev)
        new_lo, new_hi = con.execute(
            f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) "
            f"FROM read_parquet('{ev}')").fetchone()
        assert int(new_lo) < int(tgt) < int(new_hi), (
            f"shifted series does not straddle the {boundary}Z DST "
            f"transition (min={new_lo}, boundary={tgt}, max={new_hi})")
        print(f"[fuzz] events.ts shifted {delta_us}us -> median lands "
              f"{jitter_us // 1_000_000}s from the {boundary}Z DST "
              f"transition; straddle asserted "
              f"(min<boundary<max over {int(new_hi) - int(new_lo)}us)")

    verify_args = f"/runMain graft.Verify {fuzz_dir} {out_dir}".replace("/runMain", "runMain")
    if args.only:
        verify_args += f" {args.only}"
    rc = subprocess.run(
        ["sbt", "-batch", verify_args], cwd=pathlib.Path(__file__).parent.parent,
    ).returncode
    if rc != 0:
        print(f"[fuzz] Verify failed rc={rc}")
        return rc

    rc = subprocess.run(
        [sys.executable, str(pathlib.Path(__file__).parent / "oracle_check.py"),
         str(fuzz_dir), str(out_dir)]).returncode
    if not args.keep:
        shutil.rmtree(fuzz_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
    print(f"[fuzz] seed={args.seed} {'PASS' if rc == 0 else 'FAIL'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
