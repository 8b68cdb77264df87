"""Expected-output tables for the driver's DuckDB oracle.

Round-1's flagship `kg_*` queries had NO driver-side oracle (every row
`no_oracle` in CORRECTNESS_r01.json). The corpus generator owns the ground
truth, so this module materializes it: a single-process oracle run
(oracle.run_oracle_full — the reference semantics executed item-at-a-time)
writes `expected_*.parquet` next to the corpus, and `__ray_entry__
.oracle_sql()` points DuckDB at those files (directly, or via derivational
SQL — e.g. edges/nodes are re-derived from expected_triples with GROUP BY /
window functions, so the shuffle semantics get an independent SQL check).

For the training-data ops over the driver's own testdata tables, the
ground-truth owner is a single-process reimplementation in this module
(independent loops sharing only the unit-tested kernels): minhash pairs,
union-find connected components (a genuinely different algorithm than the
engine's distributed label propagation), simhash, language-ID, quality,
fingerprints, LSH ANN, and the media codecs.

All floats are written as the exact float64 the shared kernels produce, so
the driver's value-hash compares bit-identical values; timestamps are
surfaced as integer epoch seconds on both sides.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

EXPECTED_VERSION = "e4"  # e4: media query surfaces hex-encode binary cols

KG_EXPECTED = ["expected_triples", "expected_triples_embedding",
               "expected_mentions", "expected_docs", "expected_analysis",
               "expected_nodes_enriched", "expected_graph_nodes_enriched"]


def ts_epoch(dt) -> int:
    """Naive datetime -> integer epoch seconds (no local-timezone surprise,
    matching Arrow's naive-as-UTC int cast)."""
    if isinstance(dt, pd.Timestamp):
        dt = dt.to_pydatetime()
    return int((dt - datetime(1970, 1, 1)).total_seconds())


# ---------------------------------------------------------------------------
# KG expected tables (written into the corpus dir, cached by marker)
# ---------------------------------------------------------------------------

def _triples_rows(res: dict) -> List[dict]:
    """Oracle triples + the _FAILED dead-letter rows, epoch timestamps —
    the exact multiset the fused Ray stream emits (stages/triples.py
    triples_batch)."""
    rows = []
    for t in res["triples"]:
        rows.append({**{k: t[k] for k in ("subj", "pred", "obj", "subj_label",
                                          "obj_label", "url", "score",
                                          "provenance")},
                     "ts_epoch": ts_epoch(t["warc_ts"])})
    for d in res["docs"]:
        if d["error"] is not None:
            rows.append({"subj": d["url"], "pred": "_FAILED", "obj": d["error"],
                         "subj_label": "Page", "obj_label": "Error",
                         "url": d["url"], "ts_epoch": ts_epoch(d["warc_ts"]),
                         "score": 0.0, "provenance": "failed_row"})
    return rows


def _nodes_rows(triple_rows: List[dict]) -> List[dict]:
    """Independent single-process MERGE: endpoint explode, last-write-wins
    per key in (ts, props) order (mirrors helpers.py:13-27 semantics that
    stages/canonicalize.py implements distributed)."""
    best: Dict[str, dict] = {}
    for t in triple_rows:
        if t["pred"] == "_FAILED":
            continue
        props = json.dumps({"last_url": t["url"]})
        for nid, label in ((t["subj"], t["subj_label"]),
                           (t["obj"], t["obj_label"])):
            cur = best.get(nid)
            if cur is None or (t["ts_epoch"], props) >= (cur["ts_epoch"], cur["props"]):
                best[nid] = {"node_id": nid, "label": label, "props": props,
                             "ts_epoch": t["ts_epoch"]}
    return sorted(best.values(), key=lambda r: r["node_id"])


def _enriched_rows(node_rows: List[dict], registry_tables: dict) -> List[dict]:
    from .stages.enrich import build_prop_maps
    pm = build_prop_maps(registry_tables)
    out = []
    for r in node_rows:
        base = dict(pm.get(r["node_id"], {}))
        base.update(json.loads(r["props"]))
        out.append({**r, "props": json.dumps(base, sort_keys=True)})
    return out


def _registry_edge_rows_sp(registry_tables: dict) -> List[dict]:
    """Single-process enumeration of the full registry edge surface (flat
    REGISTRY_REL_MAP projections + nested child families) as triple rows at
    epoch 0 / url='registry' — plain dict loops over the same declarative
    specs the distributed projection reads, no Ray."""
    from .ops.nested import NESTED_EDGE_FAMILIES
    from .stages.registry_edges import REGISTRY_REL_MAP

    rows = []

    def add(subj, slabel, pred, obj, olabel):
        if subj and obj:
            rows.append({"subj": subj, "subj_label": slabel, "pred": pred,
                         "obj": obj, "obj_label": olabel, "url": "registry",
                         "ts_epoch": 0, "score": 1.0,
                         "provenance": "registry"})

    for table, src_col, src_label, rel, dst_col, dst_label, *rest in \
            REGISTRY_REL_MAP:
        flt = rest[0] if rest else None
        for r in registry_tables.get(table, []):
            if flt is not None and r.get(flt[0]) != flt[1]:
                continue
            add(r.get(src_col), src_label, rel, r.get(dst_col), dst_label)

    for table, pcol, plabel, ncol, rel, clabel, slug in NESTED_EDGE_FAMILIES:
        for r in registry_tables.get(table, []):
            for i, _ in enumerate(r.get(ncol) or []):
                add(r[pcol], plabel, rel, f"{r[pcol]}/{slug}/{i}", clabel)
    for p in registry_tables.get("persons", []):
        for i, f in enumerate(p.get("nevenfuncties") or []):
            parent = f"{p['person_id']}/nevenfunctie/{i}"
            for j, _ in enumerate(f.get("inkomsten") or []):
                add(parent, "PersoonNevenfunctie", "HAS_INCOME",
                    f"{parent}/inkomst/{j}", "PersoonNevenfunctieInkomsten")
    for dv in registry_tables.get("document_versies", []):
        for pub in dv.get("publicaties") or []:
            if pub["soort"] == "Publicatie":
                add(dv["versie_id"], "DocumentVersie", "HAS_PUBLICATIE",
                    pub["publicatie_id"], "DocumentPublicatie")
            else:
                add(dv["versie_id"], "DocumentVersie",
                    "HAS_PUBLICATIE_METADATA", pub["publicatie_id"],
                    "DocumentPublicatieMetadata")
    return rows


def write_prop_map_fragments(corpus_dir: str) -> str:
    """Registry prop maps as JSON FRAGMENTS split at the sorted position of
    the stream-derived ``last_url`` key, so the enriched-node oracle can be
    DERIVATIONAL SQL: DuckDB re-derives the node set / LWW merge from
    expected_triples and splices ``lo || ', "last_url": "' || url || '"' ||
    hi`` to reproduce ``json.dumps({**prop_map, "last_url": url},
    sort_keys=True)`` byte-exactly. The fragments are a per-entity
    projection of the registry tables (M1, shared build_prop_maps kernel) —
    input data, not pipeline output; the distributed shuffles stay
    independently checked."""
    from .sources.pages import read_registry_tables
    from .stages.enrich import build_prop_maps

    path = os.path.join(corpus_dir, "registry_prop_maps.parquet")
    if os.path.exists(path):
        return path
    rows = []
    for node_id, pm in build_prop_maps(read_registry_tables(corpus_dir)).items():
        items = [f"{json.dumps(k)}: {json.dumps(v)}"
                 for k, v in sorted(pm.items())]
        lo = [s for (k, _), s in zip(sorted(pm.items()), items) if k < "last_url"]
        hi = [s for (k, _), s in zip(sorted(pm.items()), items) if k > "last_url"]
        rows.append({"node_id": node_id,
                     "lo": "{" + ", ".join(lo),
                     "hi": (", " + ", ".join(hi) + "}") if hi else "}"})
    tbl = pa.Table.from_pylist(rows, schema=pa.schema(
        [("node_id", pa.string()), ("lo", pa.string()), ("hi", pa.string())]))
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def ensure_kg_expected(corpus_dir: str) -> Dict[str, str]:
    """Write all expected_* tables for a generated corpus (idempotent,
    cached under a version marker). Returns {name: path}."""
    from .corpus import CORPUS_VERSION
    paths = {n: os.path.join(corpus_dir, f"{n}.parquet") for n in KG_EXPECTED}
    # marker ties to BOTH versions: regenerating the corpus in place must
    # invalidate previously cached expected tables
    marker = os.path.join(corpus_dir,
                          f".expected-{EXPECTED_VERSION}-{CORPUS_VERSION}")
    write_prop_map_fragments(corpus_dir)
    if os.path.exists(marker):
        return paths

    from .config import EngineConfig
    from .oracle import run_oracle_full
    from .sources.pages import read_registry_tables

    pages = os.path.join(corpus_dir, "pages")
    res = run_oracle_full(pages, corpus_dir)
    cfg_emb = EngineConfig.default()
    cfg_emb.matching.enable_embedding_fallback = True
    res_emb = run_oracle_full(pages, corpus_dir, cfg_emb)

    triple_rows = _triples_rows(res)

    def write(name: str, rows: List[dict], schema: pa.Schema = None):
        tbl = (pa.Table.from_pylist(rows, schema=schema) if rows or schema
               else pa.table({}))
        pq.write_table(tbl, paths[name])

    tri_schema = pa.schema([
        ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
        ("subj_label", pa.string()), ("obj_label", pa.string()),
        ("url", pa.string()), ("score", pa.float64()),
        ("provenance", pa.string()), ("ts_epoch", pa.int64())])
    write("expected_triples", triple_rows, tri_schema)
    write("expected_triples_embedding", _triples_rows(res_emb), tri_schema)

    mention_schema = pa.schema([
        ("url", pa.string()), ("mention_id", pa.string()), ("kind", pa.string()),
        ("surface", pa.string()), ("activity_local_id", pa.string()),
        ("entity_id", pa.string()), ("entity_kind", pa.string()),
        ("match_type", pa.string()), ("score", pa.float64())])
    write("expected_mentions",
          [{k: m[k] for k in mention_schema.names} for m in res["mentions"]],
          mention_schema)

    write("expected_docs",
          [{"url": d["url"], "ts_epoch": ts_epoch(d["warc_ts"]),
            "text": d["text"], "error": d["error"]} for d in res["docs"]],
          pa.schema([("url", pa.string()), ("ts_epoch", pa.int64()),
                     ("text", pa.string()), ("error", pa.string())]))

    from . import schemas as _schemas
    ana_schema = pa.schema([(f.name, f.type) for f in _schemas.ANALYSIS])
    write("expected_analysis",
          [{k: r[k] for k in ana_schema.names} for r in res["analysis"]],
          ana_schema)

    node_rows = _nodes_rows(triple_rows)
    reg = read_registry_tables(corpus_dir)
    nodes_schema = pa.schema([("node_id", pa.string()),
                              ("label", pa.string()),
                              ("props", pa.string()),
                              ("ts_epoch", pa.int64())])
    write("expected_nodes_enriched", _enriched_rows(node_rows, reg),
          nodes_schema)
    # full-graph node set: VLOS triples + registry/nested edge endpoints
    # through the same single-process MERGE, enriched with every family's
    # props (incl. nested child entities)
    graph_rows = _nodes_rows(triple_rows + _registry_edge_rows_sp(reg))
    write("expected_graph_nodes_enriched", _enriched_rows(graph_rows, reg),
          nodes_schema)

    with open(marker, "w") as f:
        f.write("ok")
    return paths


# ---------------------------------------------------------------------------
# Training-data ops expected tables (single-process reimplementations over
# the driver-provided testdata; written under /tmp, cached per (sf, name))
# ---------------------------------------------------------------------------

def op_expected_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return f"/tmp/ntr_opexpected_{tag}_{EXPECTED_VERSION}"


def _minhash_pairs_sp(sf_dir: str, n_perm=64, bands=16,
                      jaccard_threshold=0.7) -> pd.DataFrame:
    """Single-process MinHash-LSH: same kernels (_token_shingles, _minhash,
    band crc buckets), plain dict banding instead of the engine's
    exchange + collision prune."""
    from .ops.dedup import _minhash, _perm_params, _token_shingles
    import zlib

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    a_par, b_par = _perm_params(n_perm)
    rows_per_band = n_perm // bands
    shingles = {d["doc_id"]: _token_shingles(d["text"]) for d in docs}
    buckets: Dict[tuple, List[int]] = {}
    for d in docs:
        mh = _minhash(shingles[d["doc_id"]], a_par, b_par)
        for band in range(bands):
            seg = mh[band * rows_per_band:(band + 1) * rows_per_band]
            buckets.setdefault((band, int(zlib.crc32(seg.tobytes()))),
                               []).append(d["doc_id"])
    cand = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(cand):
        sa, sb = shingles[a], shingles[b]
        union = len(sa | sb)
        jac = (len(sa & sb) / union) if union else 0.0
        if jac >= jaccard_threshold:
            out.append({"a": a, "b": b, "jaccard": round(jac, 4)})
    return pd.DataFrame(out, columns=["a", "b", "jaccard"]).astype(
        {"a": "int64", "b": "int64", "jaccard": "float64"})


def _ngram_jaccard_sp(sf_dir: str, n=5, jaccard_threshold=0.8) -> pd.DataFrame:
    """Single-process exact n-gram Jaccard with the SAME rarest-first
    prefix-filter rule (shared _char_shingle_arr kernel; plain dict df
    table + inverted index instead of the engine's exchange + broadcast)."""
    import math

    from .ops.dedup import _char_shingle_arr, _char_shingles

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    arrs = {d["doc_id"]: _char_shingle_arr(d["text"], n).astype(np.int64)
            for d in docs}
    shingles = {k: set(v.tolist()) for k, v in arrs.items()}
    df_counts: Dict[int, int] = {}
    for a in arrs.values():
        for s in a.tolist():
            df_counts[s] = df_counts.get(s, 0) + 1
    index: Dict[int, List[int]] = {}
    for d in docs:
        sh = arrs[d["doc_id"]]
        if not len(sh):
            continue
        # canonical order: ascending (document frequency, shingle)
        ordered = sorted(sh.tolist(), key=lambda s: (df_counts[s], s))
        p = len(ordered) - math.ceil(jaccard_threshold * len(ordered)) + 1
        for s in ordered[:p]:
            index.setdefault(s, []).append(d["doc_id"])
    cand = set()
    for ids in index.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(cand):
        sa, sb = shingles[a], shingles[b]
        union = len(sa | sb)
        jac = (len(sa & sb) / union) if union else 0.0
        if jac >= jaccard_threshold:
            out.append({"a": a, "b": b, "jaccard": round(jac, 4)})
    return pd.DataFrame(out, columns=["a", "b", "jaccard"]).astype(
        {"a": "int64", "b": "int64", "jaccard": "float64"})


def _neardup_groups_sp(sf_dir: str, jaccard_threshold=0.7) -> pd.DataFrame:
    """Union-find over the single-process pair graph — an independent
    algorithm vs the engine's distributed min-label propagation."""
    pairs = _minhash_pairs_sp(sf_dir, jaccard_threshold=jaccard_threshold)
    parent: Dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        for v in (int(a), int(b)):
            parent.setdefault(v, v)
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [{"doc_id": v, "group_id": find(v)} for v in sorted(parent)]
    return pd.DataFrame(rows, columns=["doc_id", "group_id"]).astype("int64")


def _simhash_sp(sf_dir: str) -> pd.DataFrame:
    from .ops.dedup import _simhash64
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    return pd.DataFrame({
        "doc_id": pd.Series([d["doc_id"] for d in docs], dtype="int64"),
        "simhash": pd.Series([_simhash64(d["text"]) for d in docs],
                             dtype="uint64")})


def _language_id_sp(sf_dir: str) -> pd.DataFrame:
    """Independent loop over the same public profile table."""
    import re as _re
    from .ops.textstats import LangIdActor
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"]).to_pylist()
    rows = []
    for d in docs:
        hay = f" {d['text'].lower()} "
        best_lang, best_score = "und", 0
        for lang, grams in LangIdActor.PROFILES.items():
            score = sum(len(_re.findall(_re.escape(g), hay)) for g in grams)
            if score > best_score:
                best_score, best_lang = score, lang
        rows.append({"doc_id": d["doc_id"], "lang": d["lang"],
                     "lang_pred": best_lang, "lang_hits": best_score})
    return pd.DataFrame(rows).astype({"doc_id": "int64", "lang_hits": "int64"})


def _quality_sp(sf_dir: str) -> pd.DataFrame:
    """Independent reimplementation of the quality heuristics (C4/Gopher-
    style public rules) — divergence from ops/textstats fails the check."""
    stop = {"the", "a", "of", "to", "and", "de", "het", "een", "van", "en",
            "data", "query", "table", "row"}
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    rows = []
    for d in docs:
        text = d["text"]
        toks = text.split()
        n = len(toks)
        mt = (sum(len(t) for t in toks) / n) if n else 0.0
        sr = (sum(1 for t in toks if t.lower() in stop) / n) if n else 0.0
        pr = sum(1 for ch in text if ch in ".,;:!?") / max(1, len(text))
        score = (0.4 * (1.0 if 3.0 <= mt <= 8.0 else 0.0)
                 + 0.4 * (1.0 if 0.1 <= sr <= 0.6 else 0.0)
                 + 0.2 * (1.0 if n >= 20 else 0.0))
        rows.append({"doc_id": d["doc_id"], "mean_token_len": round(mt, 4),
                     "stopword_ratio": round(sr, 4),
                     "punct_ratio": round(pr, 4), "quality": round(score, 4)})
    return pd.DataFrame(rows).astype({"doc_id": "int64"})


def _fingerprints_sp(sf_dir: str, window=8) -> pd.DataFrame:
    """Independent scalar rolling-hash (no numpy vector trick): same
    polynomial, computed per window."""
    import zlib
    B = 1_000_003
    MASK = (1 << 64) - 1
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    rows = []
    for d in docs:
        hs = [zlib.crc32(t.encode()) for t in d["text"].split()]
        if len(hs) < window:
            fp = min(hs) if hs else 0
        else:
            best = None
            for i in range(len(hs) - window + 1):
                acc = 0
                for k in range(window):
                    acc = (acc * B + hs[i + k]) & MASK
                best = acc if best is None else min(best, acc)
            fp = best
        rows.append({"doc_id": d["doc_id"], "fingerprint": fp})
    return pd.DataFrame({
        "doc_id": pd.Series([r["doc_id"] for r in rows], dtype="int64"),
        "fingerprint": pd.Series([r["fingerprint"] for r in rows],
                                 dtype="uint64")})


def _ann_lsh_sp(sf_dir: str, n_queries=5, k=5, n_planes=6, seed=13,
                n_probes=4) -> pd.DataFrame:
    """Single-process multi-probe LSH ANN with the same planes/buckets."""
    from .ops.ann import _normalize
    rng = np.random.RandomState(seed)
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).sort_values("vec_id")
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    planes = rng.randn(n_planes, mat.shape[1])
    signs = (mat @ planes.T) > 0
    buckets = signs.dot(1 << np.arange(n_planes)).astype(np.int64)
    ids = df["vec_id"].to_numpy()
    by_bucket: Dict[int, List[int]] = {}
    for i, b in enumerate(buckets):
        by_bucket.setdefault(int(b), []).append(i)
    nmat = _normalize(mat)

    rows = []
    qidx = np.arange(min(n_queries, len(ids)))
    for qi in qidx:
        qid = int(ids[qi])
        qb = int(buckets[qi])
        probes = [qb] + [qb ^ (1 << b) for b in range(n_planes)][:max(0, n_probes - 1)]
        cand = sorted({i for b in probes for i in by_bucket.get(b, [])})
        cand = [i for i in cand if ids[i] != qid]
        if not cand:
            continue
        sims = nmat[cand] @ nmat[qi]
        order = np.lexsort((ids[cand], -sims))[:k]
        for rank, j in enumerate(order, 1):
            rows.append({"query_id": qid, "rank": rank,
                         "vec_id": int(ids[cand[j]]),
                         "cos": round(float(sims[j]), 5)})
    return pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cos"]
                        ).astype({"query_id": "int64", "rank": "int64",
                                  "vec_id": "int64", "cos": "float64"})


def _ann_ivf_sp(sf_dir: str, n_queries=5, k=5, n_lists=16,
                n_probe=4) -> pd.DataFrame:
    """Single-process IVF with the SAME centroids (shared _kmeans_fit /
    _read_sample kernels) — full assignment + probe + exact per-list scan."""
    from .ops.ann import _kmeans_fit, _normalize, _read_sample

    cent = _kmeans_fit(_read_sample(sf_dir), n_lists)
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).sort_values("vec_id")
    ids = df["vec_id"].to_numpy()
    mat = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    assign = np.argmax(mat @ cent.T, axis=1)

    rows = []
    for qi in range(min(n_queries, len(ids))):
        qid = int(ids[qi])
        qv = mat[qi]
        probes = set(np.argsort(-(qv @ cent.T), kind="stable")[:n_probe].tolist())
        cand = np.nonzero(np.isin(assign, list(probes)) & (ids != qid))[0]
        if not len(cand):
            continue
        sims = mat[cand] @ qv
        order = np.lexsort((ids[cand], -sims))[:k]
        for rank, j in enumerate(order, 1):
            rows.append({"query_id": qid, "rank": rank,
                         "vec_id": int(ids[cand[j]]),
                         "cos": round(float(sims[j]), 5)})
    return pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cos"]
                        ).astype({"query_id": "int64", "rank": "int64",
                                  "vec_id": "int64", "cos": "float64"})


def _media_decode_sp(n=48) -> pd.DataFrame:
    from .ops.multimodal import decode_one, synth_media_rows
    rows = []
    for r in synth_media_rows(n=n):
        d = decode_one(r["kind"], r["payload"])
        rows.append({"media_id": r["media_id"], "kind": r["kind"],
                     "features": np.array(d["features"], dtype=np.float32),
                     "width": d["width"], "height": d["height"],
                     "duration_s": d["duration_s"], "decoded": d["decoded"]})
    return pd.DataFrame(rows).astype({"width": "int32", "height": "int32"})


def _media_audio_sp(n=48, window=1024) -> pd.DataFrame:
    from .ops.multimodal import audio_window_rows, synth_media_rows
    rows = []
    for r in synth_media_rows(n=n):
        rows.extend(audio_window_rows(r["media_id"], r["kind"],
                                      r["payload"], window))
    return pd.DataFrame(rows, columns=["media_id", "window_idx",
                                       "n_samples", "energy", "peak"])


def _media_resize_sp(n=48, target=16) -> pd.DataFrame:
    # query surface carries lowercase hex, not raw bytes (driver canon
    # cannot sort bytearray cells) — mirrors __ray_entry__._media_resize
    from .ops.multimodal import resize_rows, synth_media_rows
    rows = []
    for r in synth_media_rows(n=n):
        rows.extend(resize_rows(r["media_id"], r["kind"], r["payload"], target))
    for r in rows:
        r["payload_hex"] = r.pop("payload").hex()
    df = pd.DataFrame(rows, columns=["media_id", "width", "height",
                                     "payload_hex", "mean_b", "mean_g",
                                     "mean_r", "resized"])
    return df.astype({"width": "int32", "height": "int32"})


def _media_frames_sp(n=48) -> pd.DataFrame:
    from .ops.multimodal import frame_sample_rows, synth_media_rows
    rows = []
    for r in synth_media_rows(n=n):
        rows.extend(frame_sample_rows(r["media_id"], r["kind"], r["payload"]))
    for r in rows:
        r["frame_hex"] = r.pop("frame_bytes").hex()
    df = pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_hex"])
    return df.astype({"frame_idx": "int32"})


def _kg_wcc_sp(sf_dir: str) -> pd.DataFrame:
    """Union-find connected components over the SAME full-graph edge set
    the engine's label propagation runs on — a genuinely different
    algorithm (the neardup_groups pattern). The edge set comes from the
    canonical derivational SQL (__ray_entry__._graph_edges_select) so both
    sides agree on the graph by construction."""
    import duckdb

    import __ray_entry__ as entry
    cd = entry._corpus_dir(sf_dir)
    sql = entry._graph_edges_select(cd)
    pairs = duckdb.sql(
        f"SELECT DISTINCT subj, obj FROM ({sql})").fetchall()
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by smaller id so the root IS the component min
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = [{"node_id": n, "component_id": find(n)} for n in parent]
    return pd.DataFrame(rows, columns=["node_id", "component_id"])


def _bpe_merges_sp(sf_dir: str, n_merges: int = 5) -> pd.DataFrame:
    """Independent single-process BPE merge learner (textbook dict-based
    implementation — shares no code with ops/textstats.bpe_merges): same
    contract (overlapping zip pair counts, greedy left-to-right apply,
    (count desc, left, right) tie-break), different code shape."""
    import re

    con = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    counts: dict = {}
    for text in con["text"]:
        t = text.strip().lower()
        if not t:
            continue
        for w in re.split(r"\s+", t):
            counts[w] = counts.get(w, 0) + 1
    vocab = {w: list(w) for w in counts}
    rows = []
    for rank in range(1, n_merges + 1):
        pairs: dict = {}
        for w, syms in vocab.items():
            c = counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (left, right), c = min(pairs.items(),
                               key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rows.append({"rank": rank, "left": left, "right": right,
                     "pair_count": int(c)})
        merged = left + right
        for w, syms in vocab.items():
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return pd.DataFrame(rows, columns=["rank", "left", "right",
                                       "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"})


_OP_EXPECTED = {
    "minhash_neardup": lambda sf: _minhash_pairs_sp(sf),
    "ngram_jaccard": lambda sf: _ngram_jaccard_sp(sf),
    "neardup_groups": lambda sf: _neardup_groups_sp(sf),
    "simhash_signatures": lambda sf: _simhash_sp(sf),
    "language_id": lambda sf: _language_id_sp(sf),
    "quality_scores": lambda sf: _quality_sp(sf),
    "fingerprints": lambda sf: _fingerprints_sp(sf),
    "ann_lsh_topk": lambda sf: _ann_lsh_sp(sf),
    "ann_ivf_topk": lambda sf: _ann_ivf_sp(sf),
    "media_decode": lambda sf: _media_decode_sp(),
    "media_frames": lambda sf: _media_frames_sp(),
    "media_resize": lambda sf: _media_resize_sp(),
    "media_audio_windows": lambda sf: _media_audio_sp(),
    "kg_wcc": lambda sf: _kg_wcc_sp(sf),
    "bpe_merges": lambda sf: _bpe_merges_sp(sf),
}


def ensure_op_expected(sf_dir: str, name: str) -> str:
    """Compute + cache one op's expected table; returns the parquet path."""
    out_dir = op_expected_dir(sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.parquet")
    if not os.path.exists(path):
        df = _OP_EXPECTED[name](sf_dir)
        tmp = path + ".tmp"
        df.to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return path
