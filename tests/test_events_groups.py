"""Sessionization + connected-component near-dup groups."""

import numpy as np
import pandas as pd
import pytest


def test_user_sessions_semantics(ray_session, tmp_path):
    rows = []
    base = pd.Timestamp("2024-01-01 10:00:00")
    # user 1: three events close together, then a 2h gap, then one more
    for i, off in enumerate([0, 5, 10, 130]):
        rows.append({"event_id": i, "ts": base + pd.Timedelta(minutes=off),
                     "user_id": 1, "event_type": "x", "value": 1.0, "props": "{}"})
    # user 2: single event
    rows.append({"event_id": 9, "ts": base, "user_id": 2, "event_type": "x",
                 "value": 1.0, "props": "{}"})
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet")

    from neo4j_tkapi_ray.ops.events import session_stats, user_sessions
    s = user_sessions(str(tmp_path)).to_pandas().sort_values(
        ["user_id", "session_idx"]).reset_index(drop=True)
    u1 = s[s.user_id == 1]
    assert list(u1.session_idx) == [0, 1]
    assert list(u1.n_events) == [3, 1]
    u2 = s[s.user_id == 2]
    assert list(u2.n_events) == [1]

    st = session_stats(str(tmp_path)).to_pandas()
    by = dict(zip(st.user_id, st.n_sessions))
    assert by[1] == 2 and by[2] == 1


def test_neardup_groups_connected_components(ray_session, tmp_path):
    """Chained near-dups A~B~C must land in ONE group even if A and C were
    never a candidate pair themselves."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    v1 = base.replace("delta", "DELTA")
    v2 = v1.replace("sigma", "SIGMA")
    v3 = v2.replace("kappa", "KAPPA")
    other = "totally different words about ray data pipelines and shuffles again"
    rows = [
        {"doc_id": 0, "text": base, "lang": "en", "source": "t", "n_chars": 1},
        {"doc_id": 1, "text": v1, "lang": "en", "source": "t", "n_chars": 1},
        {"doc_id": 2, "text": v2, "lang": "en", "source": "t", "n_chars": 1},
        {"doc_id": 3, "text": v3, "lang": "en", "source": "t", "n_chars": 1},
        {"doc_id": 4, "text": other, "lang": "en", "source": "t", "n_chars": 1},
        {"doc_id": 5, "text": other, "lang": "en", "source": "t", "n_chars": 1},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "events_unused.parquet")  # noqa
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")

    from neo4j_tkapi_ray.ops.dedup import neardup_groups
    g = neardup_groups(str(tmp_path), jaccard_threshold=0.6).to_pandas()
    groups = dict(zip(g.doc_id, g.group_id))
    # chain 0-1-2-3 collapses to group 0
    assert groups[0] == groups[1] == groups[2] == groups[3] == 0
    # exact dup pair 4,5 forms its own group
    assert groups[4] == groups[5] == 4


def test_drop_neardup_docs_keeps_one_representative(ray_session, tmp_path):
    """Near-dup removal: each component keeps exactly its min-doc_id
    representative; singletons pass through with group_id -1."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    v1 = base.replace("delta", "DELTA")
    other = "totally different words about ray data pipelines and shuffles again"
    rows = [
        {"doc_id": 0, "text": base, "lang": "en", "source": "t", "n_chars": 1},
        {"doc_id": 1, "text": v1, "lang": "en", "source": "t", "n_chars": 1},
        {"doc_id": 2, "text": other, "lang": "en", "source": "t", "n_chars": 1},
        {"doc_id": 3, "text": other, "lang": "en", "source": "t", "n_chars": 1},
        {"doc_id": 4, "text": "a lone unique document about nothing shared",
         "lang": "en", "source": "t", "n_chars": 1},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    from neo4j_tkapi_ray.ops.dedup import drop_neardup_docs, neardup_groups
    out = drop_neardup_docs(
        str(tmp_path),
        groups=neardup_groups(str(tmp_path), jaccard_threshold=0.6)
    ).to_pandas().set_index("doc_id").sort_index()
    assert len(out) == 5
    assert list(out["kept"]) == [1, 0, 1, 0, 1]
    assert list(out["group_id"]) == [0, 0, 2, 2, -1]


def test_neardup_groups_empty(ray_session, tmp_path):
    rows = [{"doc_id": i, "text": f"totally unique text number {i} " * 3,
             "lang": "en", "source": "t", "n_chars": 1} for i in range(5)]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    from neo4j_tkapi_ray.ops.dedup import neardup_groups
    g = neardup_groups(str(tmp_path), jaccard_threshold=0.9).to_pandas()
    assert len(g) == 0


SF = "/root/testdata/sf0.001"


def test_event_props_rollup_matches_scalar(ray_session):
    import json as _json

    import pyarrow.parquet as _pq

    from neo4j_tkapi_ray.ops.events import event_props_rollup

    out = event_props_rollup(SF).to_pandas().set_index("event_type")
    t = _pq.read_table(f"{SF}/events.parquet", columns=["event_type", "props"])
    expected: dict = {}
    for et, props in zip(t.column("event_type").to_pylist(),
                         t.column("props").to_pylist()):
        k = _json.loads(props).get("k")
        n, s = expected.get(et, (0, 0))
        expected[et] = (n + 1, s + (int(k) if k is not None else 0))
    assert set(out.index) == set(expected)
    for et, (n, s) in expected.items():
        row = out.loc[et]
        assert int(row["n_events"]) == n
        assert int(row["sum_k"]) == s
        assert abs(float(row["avg_k"]) - s / n) < 1e-9


def test_funnel_stages_strict_order(ray_session, tmp_path):
    """Funnel chain is strictly ordered: a click BEFORE the first view and
    a purchase BEFORE the qualifying click don't count; users without a
    view are absent; sentinel -1 marks unreached stages."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neo4j_tkapi_ray.ops.events import funnel_stages

    US = 1_000_000
    rows = [  # (user, type, us)
        (1, "click", 5), (1, "view", 10), (1, "click", 20), (1, "purchase", 15),
        (1, "purchase", 30),          # full chain: view@10 -> click@20 -> 30
        (2, "view", 10), (2, "purchase", 20),   # no click -> stage 1
        (3, "click", 10), (3, "purchase", 20),  # no view -> absent
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] * US for r in rows], pa.timestamp("us")),
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = (funnel_stages(str(tmp_path)).to_pandas()
           .set_index("user_id").sort_index())
    assert set(out.index) == {1, 2}
    assert out.loc[1].tolist() == [10 * US, 20 * US, 30 * US, 3]
    assert out.loc[2].tolist() == [10 * US, -1, -1, 1]


def test_event_type_transitions_planted(ray_session, tmp_path):
    """Transitions are within-user and consecutive-only: user1
    view->click->view yields (view,click) and (click,view); user2's single
    event contributes nothing; interleaved timestamps across users never
    produce cross-user pairs; same-pair occurrences sum."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neo4j_tkapi_ray.ops.events import event_type_transitions

    US = 1_000_000
    rows = [  # (user, type, us) — user 3 interleaves with user 1
        (1, "view", 10), (3, "view", 15), (1, "click", 20),
        (3, "click", 25), (1, "view", 30), (2, "purchase", 12),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] * US for r in rows], pa.timestamp("us")),
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = (event_type_transitions(str(tmp_path)).to_pandas()
           .set_index(["prev_type", "next_type"]).sort_index())
    # user1: (view,click) + (click,view); user3: (view,click) -> summed
    assert out.loc[("view", "click"), "n"] == 2
    assert out.loc[("click", "view"), "n"] == 1
    assert len(out) == 2


def test_retention_cohorts_planted(ray_session, tmp_path):
    """u1 first active day 0, returns day 2 (two events that day count
    once); u2 first day 0 only; u3 first day 2. Cells: (0,0)=2, (0,2)=1,
    (2,0)=1."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.events import retention_cohorts

    D = 86_400_000_000  # us per day
    rows = [
        {"event_id": 0, "user_id": 1, "ts": 10 * 60_000_000},
        {"event_id": 1, "user_id": 1, "ts": 2 * D + 5},
        {"event_id": 2, "user_id": 1, "ts": 2 * D + 9},
        {"event_id": 3, "user_id": 2, "ts": 42},
        {"event_id": 4, "user_id": 3, "ts": 2 * D},
    ]
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    df["event_type"] = "view"
    df["value"] = 0.0
    df.to_parquet(tmp_path / "events.parquet")
    out = retention_cohorts(str(tmp_path)).to_pandas()
    got = {(r.cohort_day, r.day_offset): r.n_users for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 2): 1, (2, 0): 1}
