"""Session-22 batch: CDC time-travel reconstruction (md5-band replay
of the three-version changelog), join-key / FK inference (containment
laws incl. the inclusion-coefficient false positive), functional-
dependency audit (PK holds, behavioral pairs don't), canonical-URL
dedup (normalizer unit laws + variant-group counts), and KG
functionality-violation mining (membership in the top-functional
predicate set, ordering, fan-out floor)."""

import hashlib

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _hb(k) -> int:
    return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 1000


def test_time_travel_version_semantics(ray_session):
    from kgray.pipelines.relational import orders_time_travel

    got = {r["o_orderkey"]: r for r in orders_time_travel(SF).take_all()}
    keys = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey"]
                         ).column("o_orderkey").to_pylist()
    for k in keys:
        hb = _hb(k)
        if hb < 50:
            assert k not in got            # deleted at v1, never again
        elif hb < 100:
            assert got[k]["version"] == 2  # deleted v1, REINSERTED v2
        elif hb < 200:
            assert got[k]["version"] == 2  # updated v1 then v2
        elif hb < 250:
            assert k not in got            # updated v1, deleted v2
        elif hb < 300:
            assert got[k]["version"] == 1  # updated v1 only
        else:
            assert got[k]["version"] == 0  # untouched snapshot row
    # v3 never surfaces at as_of=2
    assert all(r["version"] <= 2 for r in got.values())


def test_time_travel_as_of_zero_is_snapshot(ray_session):
    from kgray.pipelines.relational import orders_time_travel

    got = orders_time_travel(SF, as_of_version=0).take_all()
    n = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey"]).num_rows
    assert len(got) == n
    assert all(r["version"] == 0 for r in got)


def test_join_key_inference_laws(ray_session):
    from kgray.pipelines.relational import join_key_inference

    t = join_key_inference(SF)
    rows = {r["pair_id"]: r for r in t.to_pylist()}
    assert len(rows) == 6
    # true FKs: full containment
    for pid in (0, 1, 2, 3):
        assert rows[pid]["containment_ppm"] == 1_000_000
        assert rows[pid]["n_contained"] == rows[pid]["n_child_distinct"]
    # reverse pair (customer→events): testdata has fewer event users
    # than customers, so containment is partial
    assert rows[4]["containment_ppm"] < 1_000_000
    # intersection symmetry with pair 0 (same two value sets)
    assert rows[4]["n_contained"] == rows[0]["n_contained"]
    assert rows[4]["n_child_distinct"] == rows[0]["n_parent_distinct"]
    # containment never exceeds either distinct count
    for r in rows.values():
        assert r["n_contained"] <= r["n_child_distinct"]
        assert r["n_contained"] <= r["n_parent_distinct"]


def test_fd_audit_pk_holds_behavior_does_not(ray_session):
    from kgray.pipelines.relational import events_fd_audit

    rows = {r["pair_id"]: r for r in events_fd_audit(SF).to_pylist()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id"])
    # event_id → user_id is a PK dependency: holds, fan-out exactly 1
    assert rows[0]["holds"] == 1
    assert rows[0]["n_violating"] == 0
    assert rows[0]["max_distinct_dep"] == 1
    assert rows[0]["n_groups"] == len(ev.column("event_id").unique())
    # behavioral pairs are not FDs
    assert rows[1]["holds"] == 0 and rows[1]["n_violating"] > 0
    assert rows[2]["holds"] == 0 and rows[2]["n_violating"] > 0
    assert rows[1]["n_groups"] == len(ev.column("user_id").unique())


def test_canonical_url_unit():
    from kgray.pipelines.relational import _canonical_url

    assert (_canonical_url("HTTPS://SHOP.Example.COM:443/item/7/")
            == "https://shop.example.com/item/7")
    assert (_canonical_url(
        "https://shop.example.com/item/7?utm_source=feed&utm_id=9#sec")
        == "https://shop.example.com/item/7")
    assert (_canonical_url("https://shop.example.com/item/7?b=2&a=1")
            == "https://shop.example.com/item/7?a=1&b=2")
    assert (_canonical_url("https://shop.example.com/item/7?a=1&b=2#x")
            == "https://shop.example.com/item/7?a=1&b=2")
    # path case is preserved; only scheme://host lowercases
    assert (_canonical_url("HTTP://Host.COM/Path/X")
            == "http://host.com/Path/X")


def test_url_dedup_group_counts(ray_session):
    from kgray.pipelines.relational import url_canonical_dedup

    got = url_canonical_dedup(SF).take_all()
    keys = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey"]
                         ).column("o_orderkey").to_pylist()
    n200 = sum(1 for k in keys if _hb(k) < 200)
    n100 = sum(1 for k in keys if _hb(k) < 100)
    by_n = {}
    for r in got:
        by_n.setdefault(r["n_variants"], []).append(r)
    # clean+upper+utm collapse → groups of 3; param-order pairs → 2
    assert len(by_n.get(3, [])) == n200
    assert len(by_n.get(2, [])) == n100
    assert len(by_n.get(1, [])) == len(keys) - n200
    for r in got:
        c = r["canonical_url"]
        assert "#" not in c and "utm_" not in c and ":443" not in c
        assert not c.endswith("/")
    # uppercase variant sorts first in ASCII → it is the min url
    assert all(r["first_url"].startswith("HTTPS://")
               for r in by_n.get(3, []))


def test_kg_functionality_violations(ray_session):
    from kgray.pipelines.graph import (kg_functionality_violations,
                                       kg_predicate_stats)

    viol = kg_functionality_violations(SF).to_pylist()
    assert viol, "audit must be non-vacuous"
    stats = kg_predicate_stats(SF).to_pylist()
    ranked = sorted(stats, key=lambda r: (-r["func_micro"], r["pred"]))
    top3 = {r["pred"] for r in ranked[:3]}
    assert {r["pred"] for r in viol} <= top3
    assert all(r["n_objects"] >= 2 for r in viol)
    # ordering: n_objects desc, then (pred, subj) asc
    key = [(-r["n_objects"], r["pred"], r["subj"]) for r in viol]
    assert key == sorted(key)
