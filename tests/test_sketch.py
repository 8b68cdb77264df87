"""HLL sketch: rho kernel vs independent bit arithmetic, register table vs
an independent dict build, and estimate accuracy vs the exact count."""

import hashlib
import math

import pandas as pd
import pytest

from neo4j_tkapi_ray.ops.sketch import (M, RHO_CAP, _bucket_rho,
                                        hll_distinct_users, hll_registers)


def _bucket_rho_bits(value: str):
    """Independent reference: the same (bucket, rho) via INTEGER bit
    arithmetic on the md5 digest instead of hex-string scanning."""
    h = int.from_bytes(hashlib.md5(value.encode()).digest()[:8], "big")
    bucket = h >> 56
    tail = h & ((1 << 56) - 1)          # low 56 bits of the first 8 bytes
    rho = 56 - tail.bit_length() + 1    # leading zeros in 56 bits + 1
    return bucket, min(rho, RHO_CAP)


def test_bucket_rho_matches_bit_arithmetic():
    for v in [str(i) for i in range(2000)] + ["", "x", "user-42"]:
        assert _bucket_rho(v) == _bucket_rho_bits(v), v


def test_registers_and_estimate_planted(ray_session, tmp_path):
    n_users = 700
    rows = [{"event_id": i, "user_id": i % n_users, "event_type": "view"}
            for i in range(2 * n_users)]
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet")

    regs = (hll_registers(str(tmp_path)).to_pandas()
            .set_index("bucket")["max_rho"].to_dict())
    expected: dict[int, int] = {}
    for u in range(n_users):
        b, r = _bucket_rho_bits(str(u))
        expected[b] = max(expected.get(b, 0), r)
    assert regs == expected

    est = hll_distinct_users(str(tmp_path)).to_pandas()
    assert est["event_type"].tolist() == ["view"]
    assert est["n_registers"].iloc[0] == len(expected)
    e = est["hll_estimate"].iloc[0]
    # HLL standard error for m=256 is 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(e - n_users) / n_users < 0.195
    # and the value is the exact formula, not just "close": recompute
    s = sum(1 << (RHO_CAP - r) for r in expected.values())
    s += (M - len(expected)) * (1 << RHO_CAP)
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = alpha * 256.0 * 256.0 * float(1 << RHO_CAP) / float(s)
    v = M - len(expected)
    want = 256.0 * math.log(256.0 / v) if (v > 0 and raw <= 640.0) else raw
    assert e == pytest.approx(math.floor(want * 1e3 + 0.5) / 1e3, abs=0)


def test_cms_token_counts_planted(ray_session, tmp_path):
    """CMS estimates are exact for heavy hitters when the vocabulary is
    far below the register width, and NEVER undercount (the CMS
    guarantee). Top-k order is (count desc, token asc)."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.sketch import cms_token_counts

    rows = [{"doc_id": 0, "text": "aa " * 50 + "bb " * 30 + "cc " * 30},
            {"doc_id": 1, "text": "bb " * 10 + "dd"}]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = cms_token_counts(str(tmp_path), probe_k=3).to_pandas()
    assert out["token"].tolist() == ["aa", "bb", "cc"]   # 50, 40, 30
    assert out["true_count"].tolist() == [50, 40, 30]
    assert (out["cms_estimate"] >= out["true_count"]).all()
    # 4 distinct tokens in 512 buckets: collisions are absent -> exact
    assert out["cms_estimate"].tolist() == [50, 40, 30]
