"""Session-9 batch: DBSCAN over embeddings (serial NumPy oracle,
class semantics on planted geometry), k-anonymity histogram (serial
oracle + invariants), discrete-Laplace DP counts (distribution law +
replay determinism)."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_embeddings(tmp_path, ids, E):
    t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in E],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(ids), dtype=np.int32))})
    pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def _serial_dbscan(ids, E, eps, min_pts):
    Q = np.floor(E.astype(np.float64) * 1048576.0 + 0.5).astype(np.int64)
    eps2 = int(np.floor(eps * 1048576.0)) ** 2
    D = ((Q[:, None, :] - Q[None, :, :]) ** 2).sum(-1)
    adj = D <= eps2
    deg = adj.sum(1)                       # includes self
    core = deg >= min_pts
    # CC over core-core edges, id = min core vec_id
    parent = {int(i): int(i) for i in ids[core]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ci = np.where(core)[0]
    for a in ci:
        for b in ci:
            if a < b and adj[a, b]:
                ra, rb = find(int(ids[a])), find(int(ids[b]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    roots = {}
    for n in parent:
        roots.setdefault(find(n), set()).add(n)
    lab = {}
    for r, ns in roots.items():
        m = min(ns)
        for n in ns:
            lab[n] = m
    out = {}
    for i, vid in enumerate(ids):
        vid = int(vid)
        if core[i]:
            out[vid] = (lab[vid], 1)
        else:
            nbr_cores = [lab[int(ids[j])] for j in np.where(adj[i])[0]
                         if j != i and core[j]]
            out[vid] = (min(nbr_cores), 0) if nbr_cores else (-1, 0)
    return out


def test_dbscan_planted_geometry(ray_session, tmp_path):
    from kgray.pipelines.cluster import embedding_dbscan

    # two tight blobs + one bridge-free straggler, 8-dim padded to the
    # engine's arbitrary-dim contract
    rng = np.random.default_rng(7)
    blob1 = rng.normal(0.0, 0.05, (10, 8)) + np.r_[1, 0, 0, 0, 0, 0, 0, 0]
    blob2 = rng.normal(0.0, 0.05, (8, 8)) + np.r_[0, 3, 0, 0, 0, 0, 0, 0]
    lone = np.array([[9.0] * 8])
    E = np.vstack([blob1, blob2, lone]).astype(np.float32)
    ids = np.arange(101, 101 + len(E), dtype=np.int64)
    sf = _write_embeddings(tmp_path, ids, E)

    got = {r["vec_id"]: (r["cluster_id"], r["is_core"])
           for r in embedding_dbscan(sf, eps=1.2, min_pts=5).take_all()}
    exp = _serial_dbscan(ids, E, 1.2, 5)
    assert got == exp
    # semantic shape: two clusters + one noise point
    clusters = {c for c, _ in got.values() if c != -1}
    assert len(clusters) == 2
    assert got[ids[-1]] == (-1, 0)
    b1 = {got[i][0] for i in ids[:10]}
    b2 = {got[i][0] for i in ids[10:18]}
    assert len(b1) == 1 and len(b2) == 1 and b1 != b2


def test_dbscan_border_vs_core(ray_session, tmp_path):
    from kgray.pipelines.cluster import embedding_dbscan

    # 6 points on a line, spacing 1.0, eps 1.1: interior points see 3
    # neighbors (self+2) < min_pts=4 except the middle ones; construct
    # a hub: 5 points at distance 1 from a hub -> hub is core (6 in
    # ball), spokes see only hub+self (2) -> border
    hub = np.zeros((1, 8))
    spokes = np.eye(8)[:5] * 1.0            # distance 1 from hub,
    E = np.vstack([hub, spokes]).astype(np.float32)   # sqrt2 apart
    ids = np.arange(1, 7, dtype=np.int64)
    sf = _write_embeddings(tmp_path, ids, E)
    got = {r["vec_id"]: (r["cluster_id"], r["is_core"])
           for r in embedding_dbscan(sf, eps=1.1, min_pts=4).take_all()}
    exp = _serial_dbscan(ids, E, 1.1, 4)
    assert got == exp
    assert got[1] == (1, 1)                       # hub core, own id
    for s in range(2, 7):
        assert got[s] == (1, 0)                   # spokes border


# ------------------------------------------------------------ kanonymity
def test_kanonymity_serial(ray_session):
    from kgray.pipelines.relational import events_kanonymity

    got = {r["class_size"]: r
           for r in events_kanonymity(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    qi = {}
    for u, g in ev.groupby("user_id"):
        vc = g["event_type"].value_counts()
        top = max(vc.items(), key=lambda kv: (kv[1], ), default=None)
        best = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        qi[u] = (len(g), best)
    from collections import Counter
    cls = Counter(qi.values())
    hist = Counter(cls.values())
    assert {s: c["n_classes"] for s, c in got.items()} == dict(hist)
    for s, c in got.items():
        assert c["n_users"] == s * hist[s]
        assert c["at_risk"] == (1 if s < 5 else 0)
    # total users reconcile
    assert sum(c["n_users"] for c in got.values()) == len(qi)


# --------------------------------------------------------------- DP
def test_dp_counts_replay_and_law(ray_session):
    from kgray.pipelines.relational import _DLAP_TH, _M40, events_dp_counts

    a = {r["event_type"]: r for r in events_dp_counts(SF).take_all()}
    b = {r["event_type"]: r for r in events_dp_counts(SF).take_all()}
    assert a == b                                   # replayable release
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type"]).to_pandas()
    true = ev["event_type"].value_counts()
    th = np.asarray(_DLAP_TH)
    for t, r in a.items():
        assert r["n_events"] == int(true[t])
        u = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _M40
        k = int(np.searchsorted(th, u, side="right")) - 12
        assert r["dp_noise"] == k
        assert r["dp_count"] == r["n_events"] + k
        assert -12 <= r["dp_noise"] <= 12


def test_dlap_thresholds_are_a_cdf():
    from kgray.pipelines.relational import _DLAP_TH, _M40
    import math

    assert list(_DLAP_TH) == sorted(_DLAP_TH)
    assert _DLAP_TH[-1] < _M40
    # symmetric law: P(k) ~ P(-k); check the quantized CDF midpoint
    # sits where the true CDF of dlap(e^-1) puts it (k=0 spans the
    # median)
    alpha = math.exp(-1.0)
    Z = sum(alpha ** abs(k) for k in range(-12, 13))
    cum = sum(alpha ** abs(k) for k in range(-12, 0)) / Z
    assert abs(_DLAP_TH[11] / _M40 - cum) < 1e-9
