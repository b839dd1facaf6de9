"""Session-16 batch: integer EWMA (serial recurrence replay +
smoothing law), ABC classification (serial oracle + partition law),
key-gap audit (serial oracle + reconciliation), MMR retrieval
(serial greedy replay + diversity law)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ewma_serial_and_smoothing(ray_session):
    from kgray.pipelines.relational import events_hourly_ewma

    got = events_hourly_ewma(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["hour"] = ev["ts"].astype("int64") // 3_600_000_000
    for t, g in ev.groupby("event_type"):
        hc = g.groupby("hour").size().sort_index()
        s = None
        exp = []
        for h, c in hc.items():
            cfp = int(c) * 1_000_000
            s = cfp if s is None else (3 * s + cfp) // 4
            exp.append((h, int(c), s))
        sub = got[got["event_type"] == t].sort_values("hour")
        assert list(zip(sub["hour"], sub["n_events"],
                        sub["ewma_fp"])) == exp
        # smoothing law: ewma variance <= raw variance (in fp units)
        raw = hc.to_numpy() * 1_000_000
        sm = sub["ewma_fp"].to_numpy()
        assert np.var(sm.astype(float)) <= np.var(raw.astype(float))


def test_abc_serial_and_partition(ray_session):
    from kgray.pipelines.relational import part_revenue_abc

    got = part_revenue_abc(SF).to_pandas() \
        .sort_values("l_partkey").reset_index(drop=True)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey",
                                "l_extendedprice"]).to_pandas()
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    rev = pd.DataFrame({"p": li["l_partkey"], "c": cents}) \
        .groupby("p")["c"].sum().reset_index()
    rev = rev.sort_values(["c", "p"],
                          ascending=[False, True]).reset_index(drop=True)
    rev["cum"] = rev["c"].cumsum()
    total = int(rev["c"].sum())
    rev["cls"] = np.where(rev["cum"] * 100 <= 80 * total, "A",
                          np.where(rev["cum"] * 100 <= 95 * total,
                                   "B", "C"))
    exp = rev.sort_values("p").reset_index(drop=True)
    assert got["l_partkey"].tolist() == exp["p"].tolist()
    assert got["revenue_cents"].tolist() == exp["c"].tolist()
    assert got["cum_cents"].tolist() == exp["cum"].tolist()
    assert got["abc_class"].tolist() == exp["cls"].tolist()
    # Pareto shape: A is a minority of parts holding ~80% of revenue
    na = (got["abc_class"] == "A").sum()
    assert 0 < na < len(got)
    a_rev = got.loc[got["abc_class"] == "A", "revenue_cents"].sum()
    assert a_rev * 100 <= 80 * total + 100 * total // 100  # ≈80% cap


def test_orderkey_gaps_serial(ray_session):
    from kgray.pipelines.relational import orderkey_gaps

    got = orderkey_gaps(SF).to_pandas() \
        .sort_values("gap_start").reset_index(drop=True)
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey",
                               "o_orderpriority"]).to_pandas()
    k = np.sort(o.loc[o["o_orderpriority"] == "1-URGENT",
                      "o_orderkey"].to_numpy())
    exp = []
    for a, b in zip(k, k[1:]):
        if b - a > 1:
            exp.append((a + 1, b - 1, b - a - 1))
    assert list(zip(got["gap_start"], got["gap_end"],
                    got["width"])) == exp
    assert len(exp) > 0
    # reconciliation: keys + gap widths tile the [min,max] range
    assert len(k) + int(got["width"].sum()) == k[-1] - k[0] + 1


def test_mmr_serial_and_diversity(ray_session):
    from kgray.pipelines.ann import (_normalize, _query_matrix,
                                     embedding_mmr_topk)
    from kgray.functions.veccol import list_col_matrix, col_vector

    got = embedding_mmr_topk(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = col_vector(t["vec_id"], np.int64)
    E = _normalize(list_col_matrix(t["embedding"]))
    q_ids, Q = _query_matrix(SF, 5)
    for qi, qid in enumerate(q_ids):
        cos = Q[qi] @ E.T
        order = np.lexsort((ids, -cos))
        order = [j for j in order if ids[j] != qid][:50]
        rel = cos[order]
        vids = ids[order]
        V = E[order]
        S = V @ V.T
        chosen = []
        avail = list(range(len(order)))
        while avail and len(chosen) < 5:
            best, bk = None, None
            for i in avail:
                red = max((S[i, j] for j in chosen), default=0.0)
                key = (-(0.5 * rel[i] - 0.5 * red), vids[i])
                if bk is None or key < bk:
                    best, bk = i, key
            chosen.append(best)
            avail.remove(best)
        exp = [int(vids[i]) for i in chosen]
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert sub["neighbor_id"].tolist() == exp, qid
        # rank 1 is the plain nearest neighbor (no redundancy yet)
        assert exp[0] == int(vids[0])
