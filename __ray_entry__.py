"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init`` / ``ray.shutdown``.

``queries()`` exposes one entry per implemented operator family
(SURVEY.md §2 + the training-data ops); ``oracle_sql()`` provides the
DuckDB-equivalent SQL for every SQL-expressible one (identical column
names, aggregates rounded to 4-5 decimals on both sides). The KG-pipeline
entries run over a deterministic synthetic pages corpus (BASELINE.json
input_hint shape) generated per scale factor — they are non-SQL-expressible
and get the driver's rows-only check; their real correctness gate is the
pytest oracle-parity suite (tests/test_pipeline.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

# KG corpus sizing per testdata scale factor (deterministic, cached in /tmp)
_SF_SESSIONS = {"sf0.001": 24, "sf0.01": 120, "sf0.1": 800}
_CORPUS_SEED = 42


def _kg_corpus(sf_dir: str) -> dict:
    from neo4j_tkapi_ray.corpus import generate_corpus
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    n_sessions = _SF_SESSIONS.get(tag, 120)
    out = f"/tmp/ntr_corpus_{tag}_{_CORPUS_SEED}"
    paths = generate_corpus(out, n_sessions=n_sessions, seed=_CORPUS_SEED)
    return {"dir": out, **paths}


def entry() -> Any:
    """Flagship pipeline: KG construction (extract -> link -> triples) over
    the sf0.001-scale synthetic pages corpus."""
    from neo4j_tkapi_ray.pipelines.kg import kg_triples_stream
    c = _kg_corpus("/root/testdata/sf0.001")
    return kg_triples_stream(c["pages"], c["dir"])


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _kg_triples(sf_dir: str):
    from neo4j_tkapi_ray.pipelines.kg import kg_triples_stream
    c = _kg_corpus(sf_dir)
    return kg_triples_stream(c["pages"], c["dir"])


def _kg_triples_embedding(sf_dir: str):
    """Flagship pipeline with the embedding-index retrieval tier enabled
    (engine extension; acceptance gate unchanged — see MatchingConfig)."""
    from neo4j_tkapi_ray.config import EngineConfig
    from neo4j_tkapi_ray.pipelines.kg import kg_triples_stream
    cfg = EngineConfig.default()
    cfg.matching.enable_embedding_fallback = True
    c = _kg_corpus(sf_dir)
    return kg_triples_stream(c["pages"], c["dir"], cfg)


def _kg_edges(sf_dir: str):
    from neo4j_tkapi_ray.config import EngineConfig
    from neo4j_tkapi_ray.stages.canonicalize import canonicalize_edges
    return canonicalize_edges(_kg_triples(sf_dir), EngineConfig.default())


def _kg_nodes(sf_dir: str):
    from neo4j_tkapi_ray.config import EngineConfig
    from neo4j_tkapi_ray.stages.canonicalize import canonicalize_nodes
    return canonicalize_nodes(_kg_triples(sf_dir), EngineConfig.default())


def _kg_nodes_enriched(sf_dir: str):
    from neo4j_tkapi_ray.sources.pages import read_registry_tables
    from neo4j_tkapi_ray.stages.enrich import enrich_nodes
    c = _kg_corpus(sf_dir)
    return enrich_nodes(_kg_nodes(sf_dir), read_registry_tables(c["dir"]))


def _kg_mentions(sf_dir: str):
    from neo4j_tkapi_ray.config import EngineConfig
    from neo4j_tkapi_ray.pipelines.kg import _registry_ref
    from neo4j_tkapi_ray.sources.pages import read_pages
    from neo4j_tkapi_ray.stages.extract import extract_docs
    from neo4j_tkapi_ray.stages.link import link_docs
    from neo4j_tkapi_ray.stages.triples import to_mentions
    cfg = EngineConfig.default()
    c = _kg_corpus(sf_dir)
    linked = link_docs(extract_docs(read_pages(c["pages"]), cfg),
                       _registry_ref(c["dir"]), cfg)
    return to_mentions(linked)


def _kg_docs_text(sf_dir: str):
    from neo4j_tkapi_ray.config import EngineConfig
    from neo4j_tkapi_ray.sources.pages import read_pages
    from neo4j_tkapi_ray.stages.extract import extract_docs
    c = _kg_corpus(sf_dir)
    return (extract_docs(read_pages(c["pages"]), EngineConfig.default())
            .select_columns(["url", "warc_ts", "text", "error"]))


def _kg_vote_rollup(sf_dir: str):
    from neo4j_tkapi_ray.stages.aggregates import fractie_vote_rollup
    return fractie_vote_rollup(_kg_triples(sf_dir))


def _kg_topic_consensus(sf_dir: str):
    from neo4j_tkapi_ray.stages.aggregates import topic_consensus
    return topic_consensus(_kg_triples(sf_dir))


def _kg_interruption_pairs(sf_dir: str):
    from neo4j_tkapi_ray.stages.aggregates import interruption_pairs
    return interruption_pairs(_kg_triples(sf_dir))


def _dedup_exact(sf_dir: str):
    from neo4j_tkapi_ray.ops.dedup import exact_dedup
    return exact_dedup(sf_dir).select_columns(["doc_id", "n_copies"])


def _media_decode(_sf_dir: str):
    from neo4j_tkapi_ray.ops.multimodal import decode_media, synth_media_dataset
    return decode_media(synth_media_dataset(n=48), decode="fake")


def _media_frames(_sf_dir: str):
    from neo4j_tkapi_ray.ops.multimodal import frame_sample, synth_media_dataset
    return frame_sample(synth_media_dataset(n=48))


def queries() -> dict[str, Callable[[str], Any]]:
    from neo4j_tkapi_ray.ops import ann, dedup, events, relational, textstats
    return {
        # --- KG construction (flagship; non-SQL -> rows-only driver check,
        #     full oracle parity asserted in tests/test_pipeline.py)
        "kg_triples": _kg_triples,
        "kg_triples_embedding": _kg_triples_embedding,
        "kg_edges": _kg_edges,
        "kg_nodes": _kg_nodes,
        "kg_nodes_enriched": _kg_nodes_enriched,
        "kg_mentions": _kg_mentions,
        "kg_docs_text": _kg_docs_text,
        "kg_vote_rollup": _kg_vote_rollup,
        "kg_topic_consensus": _kg_topic_consensus,
        "kg_interruption_pairs": _kg_interruption_pairs,
        # --- relational operators (SQL-checkable)
        "pricing_summary": relational.lineitem_pricing_summary,
        "revenue_by_nation": relational.revenue_by_nation,
        "top_customers": relational.top_customers,
        "events_hourly": relational.events_hourly,
        "user_activity": relational.user_activity,
        "supplier_balance_by_region": relational.supplier_balance_by_region,
        # --- training-data ops
        "dedup_exact": _dedup_exact,                         # SQL-checkable
        "token_counts": textstats.token_counts,              # SQL-checkable
        "bpe_token_counts": textstats.bpe_token_counts,      # SQL-checkable
        "ann_topk": lambda sf: ann.brute_force_topk(sf, n_queries=5, k=5),  # SQL-checkable
        # threshold 0.3: the synthetic embeddings are near-orthogonal (max
        # in-block cosine ~0.47), so a classic 0.9 near-dup threshold would
        # select nothing — 0.3 keeps the operator's selection path exercised
        "embedding_neardup": lambda sf: dedup.embedding_neardup_pairs(sf, 0.3),  # SQL-checkable
        "minhash_neardup": lambda sf: dedup.minhash_lsh_pairs(sf),
        "neardup_groups": lambda sf: dedup.neardup_groups(sf),
        "user_sessions": lambda sf: events.user_sessions(sf),  # SQL-checkable
        "session_stats": lambda sf: events.session_stats(sf),  # SQL-checkable
        "simhash_signatures": dedup.simhash_signatures,
        "language_id": textstats.language_id,
        "quality_scores": textstats.quality_scores,
        "fingerprints": textstats.fingerprints,
        "ann_lsh_topk": lambda sf: ann.lsh_bucketed_topk(sf, n_queries=5, k=5),
        # --- multimodal plumbing (stubbed decode, real Ray plumbing)
        "media_decode": _media_decode,
        "media_frames": _media_frames,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views pre-registered by the driver)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 4)                       AS sum_qty,
                   ROUND(SUM(l_extendedprice), 4)                  AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   COUNT(*)                                        AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name, ROUND(SUM(o_totalprice), 4) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_customers": """
            SELECT o_custkey, ROUND(SUM(o_totalprice), 4) AS total_spent,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
            ORDER BY total_spent DESC, o_custkey LIMIT 10
        """,
        "events_hourly": """
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type, ROUND(SUM(value), 4) AS sum_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "user_activity": """
            SELECT user_id, COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value,
                   ROUND(SUM(value) / COUNT(*), 4) AS avg_value
            FROM events GROUP BY user_id
        """,
        "supplier_balance_by_region": """
            SELECT r_name, ROUND(SUM(s_acctbal), 4) AS sum_acctbal,
                   COUNT(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
                          JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "user_sessions": """
            WITH x AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
                                 > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
                FROM events),
                 y AS (
                SELECT user_id, event_id, ts,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_idx
                FROM x)
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   COUNT(*) AS n_events,
                   CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch
            FROM y GROUP BY user_id, session_idx
        """,
        "session_stats": """
            WITH x AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
                                 > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
                FROM events),
                 y AS (
                SELECT user_id,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_idx
                FROM x),
                 s AS (
                SELECT user_id, session_idx, COUNT(*) AS n_events
                FROM y GROUP BY user_id, session_idx)
            SELECT user_id, COUNT(*) AS n_sessions,
                   ROUND(AVG(n_events), 4) AS mean_events_per_session
            FROM s GROUP BY user_id
        """,
        "token_counts": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                   length(text) AS n_chars
            FROM documents
        """,
        "bpe_token_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                       AS n_bpe_tokens
            FROM documents
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings ORDER BY vec_id LIMIT 5),
                 sims AS (SELECT q.query_id, e.vec_id,
                                 list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS c
                          FROM q CROSS JOIN embeddings e
                          WHERE e.vec_id != q.query_id),
                 ranked AS (SELECT query_id, vec_id, c,
                                   ROW_NUMBER() OVER (PARTITION BY query_id
                                                      ORDER BY c DESC, vec_id) AS rank
                            FROM sims)
            SELECT query_id, rank, vec_id, ROUND(c, 5) AS cos
            FROM ranked WHERE rank <= 5
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 5) AS cos
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.3
        """,
    }
