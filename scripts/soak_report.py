"""Summarize a cross-scale soak run (r3 VERDICT #3).

Usage: python scripts/soak_report.py <small_gate_log> <big_gate_log>

Parses two scripts/check_queries.py logs (e.g. sf0.01 and sf0.1),
reports per-query wall-time ratios vs the scale factor, flags queries
whose big-scale time exceeds 2x the linear-scaled small time, and
verifies that every FAIL at the big scale is a fixture-oracled query
(fixtures are pinned to sf0.01 absolute paths — cross-scale mismatch
is BY DESIGN for them; SQL-oracled queries must stay green).
"""

from __future__ import annotations

import re
import sys

LINE = re.compile(r"^\[(ok|FAIL|rows-only)\] (\w+): (\d+) rows \(([\d.]+)s\)")

# queries whose oracle is a sf0.01-pinned fixture parquet
FIXTURE_QUERIES = set()
try:
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.make_fixtures import FIXTURE_QUERIES as _FQ
    FIXTURE_QUERIES = set(_FQ)
except Exception:
    pass

# O(n^2)-by-design oracle twins (documented in SURVEY/NOTES): their
# production twins (LSH/IVF) are the linear-scaling paths
QUADRATIC_BY_DESIGN = {"jaccard_pairs", "embedding_neardup",
                       "token_fuzzy_pairs", "token_fuzzy_pairs_d2"}


def parse(path):
    out = {}
    for line in open(path):
        m = LINE.match(line)
        if m:
            out[m.group(2)] = (m.group(1), int(m.group(3)),
                               float(m.group(4)))
    return out


def main():
    small, big = sys.argv[1], sys.argv[2]
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    s, b = parse(small), parse(big)

    bad_fail = [q for q, (st, _, _) in b.items()
                if st == "FAIL" and q not in FIXTURE_QUERIES]
    print(f"big-scale queries: {len(b)}; FAIL: "
          f"{sum(1 for v in b.values() if v[0] == 'FAIL')} "
          f"(fixture-pinned: "
          f"{sum(1 for q, v in b.items() if v[0] == 'FAIL' and q in FIXTURE_QUERIES)})")
    if bad_fail:
        print(f"!! NON-FIXTURE FAILURES: {bad_fail}")
    else:
        print("all SQL-oracled queries green at the big scale")

    rows = []
    for q, (st, _, t_big) in b.items():
        if q not in s:
            continue
        t_small = s[q][2]
        # fixed costs dominate sub-second queries; skip ratio noise
        lin = max(t_small, 0.5) * scale
        rows.append((t_big / lin, t_big, t_small, q))
    rows.sort(reverse=True)
    print(f"\n{'ratio_vs_linear':>16} {'t_big':>8} {'t_small':>8}  query")
    flagged = []
    for r, tb, ts, q in rows[:20]:
        mark = ""
        if r > 2.0 and q not in QUADRATIC_BY_DESIGN:
            mark = "  <-- >2x linear"
            flagged.append(q)
        elif r > 2.0:
            mark = "  (quadratic-by-design oracle twin)"
        print(f"{r:16.2f} {tb:8.1f} {ts:8.1f}  {q}{mark}")
    print(f"\nflagged (>2x linear, not by-design): {flagged or 'none'}")
    sys.exit(1 if (bad_fail or flagged) else 0)


if __name__ == "__main__":
    main()
