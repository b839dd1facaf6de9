"""events_ab_ztest vs an independent pandas/Python Welch computation
(same md5 split, same integer-cents moments, same IEEE step order)."""

import hashlib
import math

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ab_ztest_independent_oracle(ray_session):
    from kgray.pipelines.relational import events_ab_ztest

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type", "value"]
                       ).to_pandas()
    ev["variant"] = [
        int(hashlib.md5(str(int(u)).encode()).hexdigest()[:8], 16) % 2
        for u in ev["user_id"]]
    ev["cents"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)

    exp = {}
    for et, g in ev.groupby("event_type"):
        arms = {}
        for vr, a in g.groupby("variant"):
            c = [int(x) for x in a["cents"]]
            arms[vr] = (len(c), sum(c), sum(x * x for x in c))
        if 0 not in arms or 1 not in arms:
            continue
        na, sa, qa = arms[0]
        nb, sb, qb = arms[1]
        ma, mb = float(sa) / float(na), float(sb) / float(nb)
        va = (float(na * qa - sa * sa) / float(na * (na - 1))
              if na > 1 else None)
        vb = (float(nb * qb - sb * sb) / float(nb * (nb - 1))
              if nb > 1 else None)
        if va is None or vb is None or va / na + vb / nb <= 0:
            z = None
        else:
            z = (mb - ma) / math.sqrt(va / float(na) + vb / float(nb))
        exp[et] = (na, nb, ma, mb, z)

    got = events_ab_ztest(SF).to_pandas()
    assert set(got["event_type"]) == set(exp)
    # both arms populated and the statistic is informative somewhere
    assert got["z_score"].notna().any()
    for _, r in got.iterrows():
        na, nb, ma, mb, z = exp[r["event_type"]]
        assert (int(r["n_a"]), int(r["n_b"])) == (na, nb)
        assert r["mean_a"] == ma and r["mean_b"] == mb   # bitwise
        if z is None:
            assert math.isnan(r["z_score"])
        else:
            assert r["z_score"] == z                     # bitwise
