"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the ``pages`` input table fixed by ``BASELINE.json``
``input_hint`` — ``(url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string)`` — plus the side tables the pipeline and its
tests need (FIXTURES.md F1-F5):

* ``pages/part-*.parquet``  — sharded pages (shards = resume partition groups)
* ``conll_train.parquet`` / ``conll_valid.parquet`` (+ ``.txt`` CoNLL
  mirrors in the reference's two-column format)
* ``gold_triples.parquet`` — analytically known KG output
* ``aliases.parquet`` — entity-linking dictionary (broadcast small side)
* ``entity_embeddings.parquet`` — deterministic unit vectors
* ``meta.json`` — generation parameters

Everything is seeded; timestamps derive from the row index (no
wall-clock).  ``text`` holds one sentence (or the title) per line; the
HTML wraps those lines with boilerplate (nav/script/style/footer +
inline markup + entity escaping) that ``html_to_text`` must strip to
reproduce ``text`` byte-identically.

Skew is planted deliberately: ``United States`` is the object of a large
fraction of ``located_in``/``born_in`` facts (the north rule's
head-entity canonicalization case).
"""

from __future__ import annotations

import html as _html
import json
import os
import random
from collections import Counter
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash_embedding
from ..kernels.linking import EMB_DIM, build_alias_index, link_surface
from ..kernels import conll

__all__ = ["generate_corpus", "load_side_tables", "GENERATOR_VERSION"]

# bump when generated content changes so cached derived corpora rebuild
GENERATOR_VERSION = 3

# --------------------------------------------------------------------------- entity inventory

_FIRST = ["Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace", "Henry",
          "Irene", "Jack", "Karen", "Liam", "Mona", "Nathan", "Olga", "Peter",
          "Quinn", "Rosa", "Sam", "Tina"]
_LAST = ["Johnson", "Smith", "Chen", "Garcia", "Mueller", "Okafor", "Patel",
         "Kim", "Novak", "Rossi", "Dubois", "Tanaka", "Larsen", "Silva",
         "Kowalski", "Haddad", "Brown", "Wilson", "Ivanov", "Costa"]

_ORG_NAMES = [
    ("Acme Corp", ["Acme Corporation", "ACME"]),
    ("Globex Inc", ["Globex"]),
    ("Initech", []),
    ("Umbrella Group", ["Umbrella"]),
    ("Stark Industries", []),
    ("Wayne Enterprises", []),
    ("Tyrell Labs", []),
    ("Cyberdyne Systems", ["Cyberdyne"]),
    ("Aperture Science", []),
    ("Wonka Industries", []),
    ("Oscorp", []),
    ("Hooli", []),
    ("Vandelay Industries", ["Vandelay"]),
    ("Soylent Corp", []),
    ("Virtucon", []),
    ("Octan Energy", []),
    ("Zorg Holdings", []),
    ("Gringotts Bank", []),
    ("Duff Brewing", []),
    ("Nakatomi Trading", []),
]

_LOC_NAMES = [
    ("United States", ["U.S.", "USA", "America"]),     # head entity (skew)
    ("Paris", []),
    ("Berlin", []),
    ("Tokyo", []),
    ("London", []),
    ("New York", ["NYC"]),
    ("California", []),
    ("Texas", []),
    ("France", []),
    ("Germany", []),
    ("Japan", []),
    ("Brazil", []),
    ("Ontario", []),
    ("Bavaria", []),
    ("Kyoto", []),
    ("Geneva", []),
    ("Oslo", []),
    ("Lisbon", []),
]

# A deliberately ambiguous alias: two distinct cities share the surface
# "Springfield" → linking must disambiguate by prior + embedding score.
_AMBIGUOUS_LOCS = [("Springfield Illinois", "Springfield", 0.6),
                   ("Springfield Massachusetts", "Springfield", 0.4)]

_NOISE_SENTS = [
    "the quick brown fox jumps over the lazy dog .",
    "markets rose sharply after the latest earnings report .",
    "local residents gathered for the annual harvest festival .",
    "researchers published new findings on deep sea currents .",
    "the committee postponed its vote until next week .",
    "heavy rain disrupted traffic across the region .",
    "volunteers planted hundreds of trees along the river .",
    "the museum unveiled a restored medieval tapestry .",
    "engineers completed the bridge inspection on schedule .",
    "analysts expect steady growth in renewable energy .",
    "the library extended its opening hours for exam season .",
    "farmers reported a strong wheat harvest this year .",
]

_TITLE_WORDS = ["daily", "news", "report", "bulletin", "herald", "journal",
                "chronicle", "gazette", "observer", "tribune", "dispatch",
                "review", "digest", "weekly", "monitor", "courier"]

_ZH_SENTS = ["今天天气晴朗适合出行", "市场行情整体平稳", "研究人员发表了新的成果",
             "委员会推迟了本周的投票", "志愿者在河边种植了树木"]

# Chinese entity inventory (char-level surfaces; BMES tagging)
_ZH_PER = ["王伟", "李娜", "张强", "刘洋", "陈静", "杨磊", "赵敏", "黄涛", "周杰", "吴芳"]
_ZH_ORG = [("华信集团", []), ("天宇科技", []), ("蓝海银行", []), ("金桥贸易", []),
           ("东方航空", ["东航"]), ("绿洲能源", []), ("星辰传媒", []), ("远大建设", [])]
_ZH_LOC = [("中国", []),            # zh head entity (skew)
           ("北京", ["北京市"]), ("上海", []), ("广州", []), ("深圳", []),
           ("杭州", []), ("成都", []), ("日本", []), ("东京", [])]

# (phrase chars, predicate, subj type, obj type)
_ZH_FACT_TEMPLATES = [
    ("就职于", "works_for", "PER", "ORG"),
    ("位于", "located_in", "ORG", "LOC"),
    ("出生于", "born_in", "PER", "LOC"),
    ("访问了", "visited", "PER", "LOC"),
    ("收购了", "acquired", "ORG", "ORG"),
    ("创办了", "founded", "PER", "ORG"),
]

# (phrase tokens, predicate, subj type, obj type)
_FACT_TEMPLATES = [
    (("works", "for"), "works_for", "PER", "ORG"),
    (("is", "employed", "by"), "works_for", "PER", "ORG"),
    (("is", "located", "in"), "located_in", "ORG", "LOC"),
    (("is", "based", "in"), "located_in", "ORG", "LOC"),
    (("is", "headquartered", "in"), "located_in", "ORG", "LOC"),
    (("was", "born", "in"), "born_in", "PER", "LOC"),
    (("is", "the", "capital", "of"), "capital_of", "LOC", "LOC"),
    (("founded",), "founded", "PER", "ORG"),
    (("acquired",), "acquired", "ORG", "ORG"),
    (("visited",), "visited", "PER", "LOC"),
    (("partnered", "with"), "partnered_with", "ORG", "ORG"),
    (("is", "part", "of"), "part_of", "LOC", "LOC"),
]


class _Inventory:
    """Entities, surfaces and aliases, all deterministic."""

    def __init__(self, rng: random.Random):
        self.entities = []            # (cid, etype, primary surface)
        self.aliases = []             # (surface, cid, prior)
        for f in _FIRST:
            for l in _LAST[:8]:       # 160 persons
                surface = f"{f} {l}"
                cid = "Q:" + surface.lower().replace(" ", "_")
                self.entities.append((cid, "PER", surface))
                self.aliases.append((surface, cid, 1.0))
        for name, alts in _ORG_NAMES:
            cid = "Q:" + name.lower().replace(" ", "_")
            self.entities.append((cid, "ORG", name))
            self.aliases.append((name, cid, 1.0))
            for a in alts:
                self.aliases.append((a, cid, 0.9))
        for name, alts in _LOC_NAMES:
            cid = "Q:" + name.lower().replace(" ", "_")
            self.entities.append((cid, "LOC", name))
            self.aliases.append((name, cid, 1.0))
            for a in alts:
                self.aliases.append((a, cid, 0.9))
        for primary, shared, prior in _AMBIGUOUS_LOCS:
            cid = "Q:" + primary.lower().replace(" ", "_")
            self.entities.append((cid, "LOC", primary))
            self.aliases.append((primary, cid, 1.0))
            self.aliases.append((shared, cid, prior))

        # Chinese entities (char-level surfaces)
        self.zh_by_type = {"PER": [], "ORG": [], "LOC": []}
        for i, name in enumerate(_ZH_PER):
            cid = f"Q:zh_per_{i}"
            self.entities.append((cid, "PER", name))
            self.aliases.append((name, cid, 1.0))
            self.zh_by_type["PER"].append((cid, name))
        for i, (name, alts) in enumerate(_ZH_ORG):
            cid = f"Q:zh_org_{i}"
            self.entities.append((cid, "ORG", name))
            self.aliases.append((name, cid, 1.0))
            for a in alts:
                self.aliases.append((a, cid, 0.9))
            self.zh_by_type["ORG"].append((cid, name))
        for i, (name, alts) in enumerate(_ZH_LOC):
            cid = f"Q:zh_loc_{i}"
            self.entities.append((cid, "LOC", name))
            self.aliases.append((name, cid, 1.0))
            for a in alts:
                self.aliases.append((a, cid, 0.9))
            self.zh_by_type["LOC"].append((cid, name))

        self.by_type = {"PER": [], "ORG": [], "LOC": []}
        for cid, etype, surface in self.entities:
            if not cid.startswith("Q:zh_"):
                self.by_type[etype].append((cid, surface))
        # surfaces usable to MENTION an entity (primary + aliases)
        self.mention_surfaces = {}    # cid -> [surface, ...]
        for surface, cid, _ in self.aliases:
            self.mention_surfaces.setdefault(cid, []).append(surface)

        self.alias_idx = build_alias_index(
            [a[0] for a in self.aliases], [a[1] for a in self.aliases],
            [a[2] for a in self.aliases])
        self.emb_map = {cid: hash_embedding("ent:" + cid, EMB_DIM)
                        for cid, _, _ in self.entities}

    def pick(self, rng, etype, head_bias=False):
        """Pick an entity of a type; LOC picks are head-skewed."""
        pool = self.by_type[etype]
        if etype == "LOC" and head_bias and rng.random() < 0.35:
            return pool[0]            # "United States"
        return pool[rng.randrange(len(pool))]

    def surface_for(self, rng, cid, primary):
        surfaces = self.mention_surfaces.get(cid, [primary])
        if len(surfaces) > 1 and rng.random() < 0.3:
            return surfaces[rng.randrange(1, len(surfaces))]
        return surfaces[0]


def _tag_tokens(surface_tokens, etype):
    return [f"B-{etype}"] + [f"I-{etype}"] * (len(surface_tokens) - 1)


def _make_fact_sentence(rng: random.Random, inv: _Inventory):
    """Render one factual sentence.  Returns (tokens, tags, triple)."""
    phrase, pred, s_type, o_type = _FACT_TEMPLATES[rng.randrange(len(_FACT_TEMPLATES))]
    s_cid, s_primary = inv.pick(rng, s_type)
    o_cid, o_primary = inv.pick(rng, o_type, head_bias=pred in ("located_in", "born_in", "visited"))
    if s_cid == o_cid:
        o_cid, o_primary = inv.by_type[o_type][1]
    s_surface = inv.surface_for(rng, s_cid, s_primary)
    o_surface = inv.surface_for(rng, o_cid, o_primary)
    s_toks = s_surface.split(" ")
    o_toks = o_surface.split(" ")
    tokens = s_toks + list(phrase) + o_toks + ["."]
    tags = (_tag_tokens(s_toks, s_type) + ["O"] * len(phrase)
            + _tag_tokens(o_toks, o_type) + ["O"])
    # gold canonical ids via the SAME linker the pipeline uses (exact gold
    # even through ambiguous aliases)
    ctx = [t.lower() for t in tokens]
    gs, _ = link_surface(s_surface, ctx, inv.alias_idx, inv.emb_map)
    go, _ = link_surface(o_surface, ctx, inv.alias_idx, inv.emb_map)
    return tokens, tags, (gs, pred, go)


def _make_noise_sentence(rng: random.Random):
    toks = _NOISE_SENTS[rng.randrange(len(_NOISE_SENTS))].split(" ")
    return toks, ["O"] * len(toks), None


def _zh_tags(surface: str, etype: str) -> list:
    """BMES char tags: S- for single chars, B/M/E otherwise."""
    n = len(surface)
    if n == 1:
        return [f"S-{etype}"]
    return [f"B-{etype}"] + [f"M-{etype}"] * (n - 2) + [f"E-{etype}"]


def _zh_pick(rng, inv, etype, head_bias=False):
    pool = inv.zh_by_type[etype]
    if etype == "LOC" and head_bias and rng.random() < 0.35:
        return pool[0]                        # 中国
    return pool[rng.randrange(len(pool))]


def _make_zh_fact_sentence(rng: random.Random, inv: _Inventory):
    """One factual zh sentence as (chars, tags, triple)."""
    phrase, pred, s_type, o_type = _ZH_FACT_TEMPLATES[rng.randrange(len(_ZH_FACT_TEMPLATES))]
    s_cid, s_surface = _zh_pick(rng, inv, s_type)
    o_cid, o_surface = _zh_pick(rng, inv, o_type, head_bias=pred in ("located_in", "born_in", "visited"))
    if s_cid == o_cid:
        o_cid, o_surface = inv.zh_by_type[o_type][1]
    # occasional alias surface for mention
    s_mention = inv.surface_for(rng, s_cid, s_surface)
    o_mention = inv.surface_for(rng, o_cid, o_surface)
    chars = list(s_mention) + list(phrase) + list(o_mention) + ["。"]
    tags = (_zh_tags(s_mention, s_type) + ["O"] * len(phrase)
            + _zh_tags(o_mention, o_type) + ["O"])
    ctx = [c.lower() for c in chars]
    gs, _ = link_surface(s_mention, ctx, inv.alias_idx, inv.emb_map)
    go, _ = link_surface(o_mention, ctx, inv.alias_idx, inv.emb_map)
    return chars, tags, (gs, pred, go)


def _render_html(rng: random.Random, title: str, body_lines: list) -> bytes:
    """Wrap text lines in boilerplate HTML that html_to_text must strip."""
    nav = "<nav><ul><li>home</li><li>archive</li><li>about</li></ul></nav>"
    script = "<script>var a = 1 < 2; track('pv');</script>"
    style = "<style>p { margin: 0; }</style>"
    footer = "<footer>&copy; syndication network</footer>"
    comment = "<!-- rendered by staticgen -->"
    paras = []
    for line in body_lines:
        esc = _html.escape(line)
        if rng.random() < 0.4:        # inline markup around a random word
            words = esc.split(" ")
            i = rng.randrange(len(words))
            tag = rng.choice(["b", "i", "em", "strong", "span"])
            words[i] = f"<{tag}>{words[i]}</{tag}>"
            esc = " ".join(words)
        if rng.random() < 0.2:
            esc = esc.replace(" ", "  ", 1)   # whitespace run → collapsed
        paras.append(f"<p>{esc}</p>")
    doc = (f"<html>{comment}<head>{style}<title>{_html.escape(title)}</title>"
           f"{script}</head><body><header>site banner</header>{nav}"
           f"<div class=\"content\">{''.join(paras)}</div>{footer}</body></html>")
    return doc.encode("utf-8")


def _make_page(rng: random.Random, inv: _Inventory, i: int, zh_fraction: float):
    url = f"https://example.org/site{i % 97}/page{i}"
    ts = datetime(2024, 1, 1) + timedelta(seconds=i * 37)
    if rng.random() < zh_fraction:
        lines, triples = [], []
        for _ in range(rng.randint(2, 5)):
            if rng.random() < 0.6:
                chars, _, triple = _make_zh_fact_sentence(rng, inv)
                triples.append(triple)
                lines.append("".join(chars))
            else:
                lines.append(_ZH_SENTS[rng.randrange(len(_ZH_SENTS))])
        title = "每日新闻 " + str(i % 50)
        html_b = _render_html(rng, title, lines)
        text = "\n".join([title] + lines)
        return dict(url=url, warc_ts=ts, html=html_b, text=text, lang="zh"), triples
    title = " ".join(rng.sample(_TITLE_WORDS, 3))
    n_sent = rng.randint(3, 9)
    lines, triples = [], []
    for _ in range(n_sent):
        if rng.random() < 0.6:
            toks, _, triple = _make_fact_sentence(rng, inv)
            triples.append(triple)
        else:
            toks, _, _ = _make_noise_sentence(rng)
        lines.append(" ".join(toks))
    html_b = _render_html(rng, title, lines)
    text = "\n".join([title] + lines)
    return dict(url=url, warc_ts=ts, html=html_b, text=text, lang="en"), triples


_PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _make_conll_split(rng: random.Random, inv: _Inventory, n_random: int,
                      cover_all_surfaces: bool):
    """Labeled sentences; the train split covers every entity surface so
    the HMM's emission table knows all mention words."""
    sw, st = [], []
    if cover_all_surfaces:
        en_cids = {c for c, _, _ in inv.entities if not c.startswith("Q:zh_")}
        for surface, cid, _ in inv.aliases:
            if cid not in en_cids:
                continue
            etype = next(t for c, t, _ in inv.entities if c == cid)
            toks = surface.split(" ")
            phrase, pred, s_type, o_type = _FACT_TEMPLATES[rng.randrange(len(_FACT_TEMPLATES))]
            # place the surface in subject position with a type-compatible tail
            o_cid, o_primary = inv.pick(rng, o_type)
            o_toks = o_primary.split(" ")
            sw.append(toks + list(phrase) + o_toks + ["."])
            st.append(_tag_tokens(toks, etype) + ["O"] * len(phrase)
                      + _tag_tokens(o_toks, o_type) + ["O"])
    for _ in range(n_random):
        if rng.random() < 0.7:
            toks, tags, _ = _make_fact_sentence(rng, inv)
        else:
            toks, tags, _ = _make_noise_sentence(rng)
        sw.append(toks)
        st.append(tags)
    return sw, st


def _make_zh_conll_split(rng: random.Random, inv: _Inventory, n_random: int,
                         cover_all: bool):
    sw, st = [], []
    if cover_all:
        zh_cids = {c for c, _, _ in inv.entities if c.startswith("Q:zh_")}
        for surface, cid, _ in inv.aliases:
            if cid not in zh_cids:
                continue
            etype = next(t for c, t, _ in inv.entities if c == cid)
            for _rep in range(2):             # two draws per position
                phrase, pred, s_type, o_type = _ZH_FACT_TEMPLATES[rng.randrange(len(_ZH_FACT_TEMPLATES))]
                o_cid, o_surface = _zh_pick(rng, inv, o_type)
                chars = list(surface) + list(phrase) + list(o_surface) + ["。"]
                sw.append(chars)
                st.append(_zh_tags(surface, etype) + ["O"] * len(phrase)
                          + _zh_tags(o_surface, o_type) + ["O"])
                phrase2, _, s_type2, _ = _ZH_FACT_TEMPLATES[rng.randrange(len(_ZH_FACT_TEMPLATES))]
                s_cid2, s_surface2 = _zh_pick(rng, inv, s_type2)
                chars2 = list(s_surface2) + list(phrase2) + list(surface) + ["。"]
                sw.append(chars2)
                st.append(_zh_tags(s_surface2, s_type2) + ["O"] * len(phrase2)
                          + _zh_tags(surface, etype) + ["O"])
    for _ in range(n_random):
        if rng.random() < 0.7:
            chars, tags, _ = _make_zh_fact_sentence(rng, inv)
        else:
            chars = list(_ZH_SENTS[rng.randrange(len(_ZH_SENTS))])
            tags = ["O"] * len(chars)
        sw.append(chars)
        st.append(tags)
    return sw, st


def generate_corpus(out_dir: str, n_pages: int = 1000, seed: int = 42,
                    pages_per_shard: int = 0, zh_fraction: float = 0.04,
                    n_train: int = 800, n_valid: int = 200) -> dict:
    """Write the full corpus; returns summary stats."""
    rng = random.Random(seed)
    inv = _Inventory(rng)
    os.makedirs(out_dir, exist_ok=True)
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)

    if pages_per_shard <= 0:
        pages_per_shard = max(200, n_pages // 16)

    gold = Counter()
    gold_urls: dict = {}
    shard_rows: list = []
    shard_id = 0
    n_written = 0

    def flush():
        nonlocal shard_rows, shard_id
        if not shard_rows:
            return
        table = pa.Table.from_pylist(shard_rows, schema=_PAGES_SCHEMA)
        pq.write_table(table, os.path.join(pages_dir, f"part-{shard_id:05d}.parquet"),
                       row_group_size=max(64, len(shard_rows) // 4))
        shard_rows = []
        shard_id += 1

    for i in range(n_pages):
        row, triples = _make_page(rng, inv, i, zh_fraction)
        shard_rows.append(row)
        for t in triples:
            gold[t] += 1
            gold_urls.setdefault(t, set()).add(row["url"])
        n_written += 1
        if len(shard_rows) >= pages_per_shard:
            flush()
    flush()

    # gold triples
    gt = pa.Table.from_pylist(
        [{"subj": s, "pred": p, "obj": o, "support": c,
          "n_urls": len(gold_urls[(s, p, o)])}
         for (s, p, o), c in sorted(gold.items())],
        schema=pa.schema([("subj", pa.string()), ("pred", pa.string()),
                          ("obj", pa.string()), ("support", pa.int64()),
                          ("n_urls", pa.int64())]))
    pq.write_table(gt, os.path.join(out_dir, "gold_triples.parquet"))

    # aliases + embeddings
    al = pa.Table.from_pylist(
        [{"surface": s, "canonical_id": c, "prior": p} for s, c, p in inv.aliases],
        schema=pa.schema([("surface", pa.string()), ("canonical_id", pa.string()),
                          ("prior", pa.float32())]))
    pq.write_table(al, os.path.join(out_dir, "aliases.parquet"))
    emb = pa.Table.from_pylist(
        [{"canonical_id": cid, "embedding": inv.emb_map[cid].tolist()}
         for cid, _, _ in inv.entities],
        schema=pa.schema([("canonical_id", pa.string()),
                          ("embedding", pa.list_(pa.float32()))]))
    pq.write_table(emb, os.path.join(out_dir, "entity_embeddings.parquet"))

    # CoNLL splits (parquet + reference-format text mirrors)
    train_w, train_t = _make_conll_split(rng, inv, n_train, cover_all_surfaces=True)
    valid_w, valid_t = _make_conll_split(rng, inv, n_valid, cover_all_surfaces=False)
    zh_train = _make_zh_conll_split(rng, inv, max(200, n_train // 2), cover_all=True)
    zh_valid = _make_zh_conll_split(rng, inv, max(30, n_valid // 4), cover_all=False)
    for name, (sw, st) in (("conll_train", (train_w, train_t)),
                           ("conll_valid", (valid_w, valid_t)),
                           ("conll_train_zh", zh_train),
                           ("conll_valid_zh", zh_valid)):
        tbl = pa.Table.from_pylist(
            [{"sent_id": i, "tokens": w, "tags": t}
             for i, (w, t) in enumerate(zip(sw, st))],
            schema=pa.schema([("sent_id", pa.int32()),
                              ("tokens", pa.list_(pa.string())),
                              ("tags", pa.list_(pa.string()))]))
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
        conll.write_tagged(os.path.join(out_dir, f"{name}.txt"), sw, st)

    meta = {"version": GENERATOR_VERSION,
            "n_pages": n_pages, "seed": seed, "pages_per_shard": pages_per_shard,
            "zh_fraction": zh_fraction, "n_gold_triples": len(gold),
            "n_train": len(train_w), "n_valid": len(valid_w),
            "n_shards": shard_id}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_side_tables(corpus_dir: str):
    """Load aliases + embeddings into the broadcastable dict forms."""
    al = pq.read_table(os.path.join(corpus_dir, "aliases.parquet"))
    alias_idx = build_alias_index(al["surface"].to_pylist(),
                                  al["canonical_id"].to_pylist(),
                                  al["prior"].to_pylist())
    emb = pq.read_table(os.path.join(corpus_dir, "entity_embeddings.parquet"))
    emb_map = {cid: np.asarray(v, dtype=np.float32)
               for cid, v in zip(emb["canonical_id"].to_pylist(),
                                 emb["embedding"].to_pylist())}
    return alias_idx, emb_map
