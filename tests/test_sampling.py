"""Unit semantics for ops/sampling.py (the oracle-parity check runs in
test_queries_contract.py like every other query; these tests pin the
operator-specific invariants)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from neo4j_tkapi_ray.ops import sampling

SF = "/root/testdata/sf0.001"


def test_stratified_sample_is_deterministic_quota(ray_session):
    a = sampling.stratified_sample(SF, n_per_group=7).to_pandas()
    b = sampling.stratified_sample(SF, n_per_group=7).to_pandas()
    key = ["lang", "rank", "doc_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))
    # exact quota per group (every lang has >= 7 docs at this scale)
    assert (a.groupby("lang").size() == 7).all()
    # ranks are 1..n within each group
    assert (a.groupby("lang")["rank"].max() == 7).all()
    assert (a.groupby("lang")["rank"].min() == 1).all()


def test_token_doc_freq_counts_documents_not_occurrences(ray_session):
    out = sampling.token_doc_freq(SF, min_df=1).to_pandas()
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    # df counts distinct documents, so it can never exceed the doc count
    assert (out["df"] <= n_docs).all()
    assert (out["df"] >= 1).all()
    # scalar cross-check on a handful of tokens
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    texts = [s.lower() for s in t.column("text").to_pylist()]
    for token in out.nlargest(3, "df")["token"]:
        expected = sum(1 for s in texts if token in s.split())
        got = int(out.loc[out["token"] == token, "df"].iloc[0])
        assert got == expected, token


def test_decontaminate_flags_snippet_sources(ray_session):
    out = sampling.decontaminate(SF).to_pandas().set_index("doc_id")
    snips = sampling.benchmark_snippets(SF)
    assert snips, "fixture must yield at least one snippet"
    # every snippet-source document contains its own snippet
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    for i in np.flatnonzero(ids % 97 == 0):
        if len(texts[int(i)]) >= 70:
            assert out.loc[int(ids[i]), "contaminated"] == 1
    # and at least one clean document exists
    assert (out["contaminated"] == 0).any()


def test_benchmark_snippets_cap_is_exact_limit(ray_session, tmp_path):
    """VERDICT r3 item 3: the snippet derivation is bounded. The cap must
    behave exactly like SQL DISTINCT + ORDER BY s + LIMIT k regardless of
    block layout (per-batch smallest-k partials merged to a global k)."""
    import duckdb
    import pandas as pd
    rows = [{"doc_id": i * 97, "text": f"{'x' * 40}snippet-{i:04d}" + "y" * 30,
             "lang": "en", "source": "t", "n_chars": 100} for i in range(12)]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet",
                                  row_group_size=3)  # force several blocks
    got = sampling.benchmark_snippets(str(tmp_path), max_snippets=5)
    want = [r[0] for r in duckdb.sql(
        f"""SELECT DISTINCT substr(text, 41, 30) AS s
            FROM read_parquet('{tmp_path}/documents.parquet')
            WHERE doc_id % 97 = 0 AND length(text) >= 70
            ORDER BY s LIMIT 5""").fetchall()]
    assert got == want and len(got) == 5
    # uncapped default still returns everything at fixture scale
    assert len(sampling.benchmark_snippets(str(tmp_path))) == 12


def test_global_length_rank_is_a_permutation(ray_session):
    out = sampling.global_length_rank(SF).to_pandas()
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert len(out) == n
    assert sorted(out["rank"]) == list(range(1, n + 1))
    # rank order == (n_chars, doc_id) lexicographic order
    s = out.sort_values("rank")
    key = list(zip(s["n_chars"], s["doc_id"]))
    assert key == sorted(key)


def test_tokenized_oracles_agree_on_whitespace_and_huge_ids(ray_session,
                                                            tmp_path):
    """Regression for two latent engine/oracle divergences: (1) DuckDB
    trim() strips only spaces, so tab/newline-adjacent text used to produce
    an extra '' token on the SQL side (fixed: both sides RE2-strip \\s);
    (2) doc_id * 2654435761 overflows INT64 in DuckDB for doc_id >= ~3.5e9
    (fixed: HUGEINT cast; numpy's uint64 wrap is mod-2^32-equivalent)."""
    import os
    import duckdb
    import importlib.util

    t = pq.read_table(f"{SF}/documents.parquet")
    adversarial = pa.table({
        "doc_id": pa.array([4_000_000_000, 4_000_000_001, 5_000_000_000],
                           pa.int64()),
        "text": pa.array(["\tfoo bar baz\n", "\n", "  x\ty  "]),
        "lang": pa.array(["en", "en", "de"]),
        "source": pa.array(["t", "t", "t"]),
        "n_chars": pa.array([13, 1, 8], pa.int64()),
    })
    merged = pa.concat_tables([t, adversarial.cast(t.schema)])
    d = str(tmp_path)
    pq.write_table(merged, os.path.join(d, "documents.parquet"))

    spec = importlib.util.spec_from_file_location(
        "rayentry2", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    qs, sqls = m.queries(), m.oracle_sql(d)
    for name in ["token_counts", "token_doc_freq", "top_tfidf_terms",
                 "stratified_sample"]:
        ours = qs[name](d).to_pandas()
        theirs = con.execute(sqls[name]).df()
        c = sorted(ours.columns)
        a = ours[c].sort_values(c).reset_index(drop=True)
        b = theirs[c].sort_values(c).reset_index(drop=True)
        assert len(a) == len(b), name
        for col in c:
            if a[col].dtype.kind == "f":
                assert ((a[col] - b[col]).abs() < 1e-6).all(), (name, col)
            else:
                assert (a[col].astype(str).values ==
                        b[col].astype(str).values).all(), (name, col)
    con.close()


def test_top_tfidf_terms_semantics(ray_session):
    out = sampling.top_tfidf_terms(SF, k=3, min_df=2).to_pandas()
    # at most k terms per doc, ranks 1..n, tfidf non-increasing within a doc
    per_doc = out.groupby("doc_id")
    assert (per_doc.size() <= 3).all()
    for _, g in per_doc:
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["tfidf"].diff().dropna() <= 1e-9).all()
    # spot-check one doc against a scalar recompute
    import numpy as np
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = {d: s for d, s in zip(t.column("doc_id").to_pylist(),
                                  t.column("text").to_pylist())}
    n_docs = len(texts)
    df = {}
    for s in texts.values():
        for tok in set(s.lower().split()):
            df[tok] = df.get(tok, 0) + 1
    doc_id = int(out["doc_id"].iloc[0])
    toks = texts[doc_id].lower().split()
    tf = {}
    for tok in toks:
        tf[tok] = tf.get(tok, 0) + 1
    scored = sorted(((tfv * np.log(n_docs / df[tok]), tok)
                     for tok, tfv in tf.items() if df[tok] >= 2),
                    key=lambda x: (-x[0], x[1]))[:3]
    got = out[out["doc_id"] == doc_id].sort_values("rank")
    assert list(got["token"]) == [tok for _, tok in scored]


def test_length_quantiles_match_numpy(ray_session):
    out = sampling.length_quantiles(SF).to_pandas().set_index("lang")
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"])
    langs = np.array(t.column("lang").to_pylist())
    lens = np.array([len(s) for s in t.column("text").to_pylist()])
    for lang in np.unique(langs):
        v = np.sort(lens[langs == lang])
        for q, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                       (0.9, "p90")]:
            pos = max(int(np.ceil(q * len(v))), 1)
            assert out.loc[lang, col] == v[pos - 1], (lang, col)


def test_curate_docs_rules_and_order(ray_session, tmp_path):
    """Planted docs hitting every rule, incl. the two the testdata corpus
    never triggers (exact_duplicate, mean_token_len), plus rule ORDER (a doc
    failing several rules reports the FIRST in RULES order)."""
    import pandas as pd
    from neo4j_tkapi_ray.ops.curation import curate_docs

    good = ("the quick spark pipeline reads a parquet file and emits arrow "
            "batches of rows while the driver tracks to shuffle en metadata "
            "van blocks")
    # doc_ids start at 1 so no row is a snippet source (doc_id % stride == 0)
    rows = [
        {"doc_id": 1, "text": good},                       # kept
        {"doc_id": 2, "text": "tiny"},                     # too_short
        {"doc_id": 3, "text": ("supercalifragilistic " * 25).strip()},  # mtl 20 > 8 -> mean_token_len (n=25>=20)
        {"doc_id": 4, "text": " ".join(f"word{i}" for i in range(30))},  # mtl ok, no stopwords -> stopword_ratio
        {"doc_id": 5, "text": ("the " * 30).strip()},      # sr 1.0 AND repetitive -> stopword_ratio FIRST (order)
        {"doc_id": 6, "text": ("the of " * 15).strip()},   # mtl 2.5 <3 AND sr 1.0 -> mean_token_len FIRST (order)
        {"doc_id": 7, "text": good},                       # exact dup of 1 -> exact_duplicate
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = curate_docs(str(tmp_path), snippet_stride=1000).to_pandas()
    got = dict(zip(out.doc_id, out.reject_reason))
    assert got[1] == "" and out[out.doc_id == 1].keep.iloc[0] == 1
    assert got[2] == "too_short"
    assert got[3] == "mean_token_len"
    assert got[4] == "stopword_ratio"
    assert got[5] == "stopword_ratio"       # order: stopword before repetitive
    assert got[6] == "mean_token_len"       # order: mtl before stopword
    assert got[7] == "exact_duplicate"      # loses to doc 1 on min doc_id


def test_source_keep_rates_keeps_null_source_group(ray_session, tmp_path):
    """ADVICE r3: a NULL source must roll up into a NULL group exactly like
    DuckDB's GROUP BY d.source — the pandas groupby default silently
    dropped those documents."""
    import duckdb
    import pandas as pd
    from neo4j_tkapi_ray.ops.curation import source_keep_rates

    good = ("the quick spark pipeline reads a parquet file and emits arrow "
            "batches of rows while the driver tracks to shuffle en metadata "
            "van blocks")
    rows = [
        {"doc_id": 1, "text": good, "source": "a"},
        {"doc_id": 2, "text": "tiny", "source": "a"},
        {"doc_id": 3, "text": good + " extra tail of words", "source": None},
        {"doc_id": 4, "text": "tiny", "source": None},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = (source_keep_rates(str(tmp_path), snippet_stride=1000).to_pandas()
           .sort_values("source", na_position="last").reset_index(drop=True))
    assert len(out) == 2 and out.loc[1, "source"] is None
    assert out.loc[1, "n_docs"] == 2 and out.loc[1, "n_keep"] == 1
    # DuckDB parity on the NULL group's aggregates
    want = duckdb.sql(
        f"""SELECT source, COUNT(*) AS n_docs
            FROM read_parquet('{tmp_path}/documents.parquet')
            GROUP BY source ORDER BY source NULLS LAST""").df()
    assert list(out.n_docs) == list(want.n_docs)


def test_top_ngrams_counts_and_ranks(ray_session):
    out = sampling.top_ngrams(SF, top_k=50).to_pandas()
    assert len(out) == 50
    assert list(out["rank"]) == list(range(1, 51))
    # count order is non-increasing; ties are ngram-ascending
    n = out["n_occ"].to_numpy()
    assert (n[:-1] >= n[1:]).all()
    for i in range(len(out) - 1):
        if n[i] == n[i + 1]:
            assert out["ngram"].iloc[i] < out["ngram"].iloc[i + 1]
    # scalar cross-check on the top bigram: count within docs, no
    # cross-document adjacency
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    top = out["ngram"].iloc[0]
    a, b = top.split(" ")
    expected = 0
    for s in t.column("text").to_pylist():
        toks = s.lower().split()
        expected += sum(1 for i in range(len(toks) - 1)
                        if toks[i] == a and toks[i + 1] == b)
    assert int(out["n_occ"].iloc[0]) == expected


def test_mixture_sample_greedy_prefix(ray_session, tmp_path):
    """Token-budget mixture selection: Knuth-key order within source is
    doc0 (key 0) -> doc2 -> doc4 -> doc1 -> doc3; with budget=4 the doc
    that CROSSES the budget (cum_before < budget) is still selected, and
    the second source fills independently."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.sampling import mixture_sample

    rows = [
        {"doc_id": 0, "source": "a", "text": "t t t"},    # key order 1, 3 tok
        {"doc_id": 1, "source": "a", "text": "t t t t"},  # key order 4
        {"doc_id": 2, "source": "a", "text": "t t"},      # key order 2, 2 tok
        {"doc_id": 3, "source": "a", "text": "t"},        # key order 5
        {"doc_id": 4, "source": "a", "text": "t"},        # key order 3
        {"doc_id": 5, "source": "b", "text": "x x x x x x x x x x"},  # 10 tok
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = (mixture_sample(str(tmp_path), budget_tokens=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # source a: doc0 (cum_before 0 < 4, cum 3), doc2 (cum_before 3 < 4,
    # cum 5 — crosses budget, still in), doc4 (cum_before 5 — out)
    # source b: doc5 (cum_before 0 < 4, cum 10)
    assert out["doc_id"].tolist() == [0, 2, 5]
    assert out["cum_tokens"].tolist() == [3, 5, 10]
    assert out["n_tokens"].tolist() == [3, 2, 10]


def test_source_bigram_overlap_exact(ray_session, tmp_path):
    """Exact pairwise source Jaccard on hand-built bigram sets: A={ab,bc},
    B={ab,bx}, C disjoint; within-doc adjacency only (no cross-doc grams),
    duplicate grams in a source count once."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.sampling import source_bigram_overlap

    rows = [
        {"doc_id": 0, "source": "A", "text": "a b c"},   # {a b, b c}
        {"doc_id": 1, "source": "A", "text": "a b"},     # dup gram, no-op
        {"doc_id": 2, "source": "B", "text": "a b x"},   # {a b, b x}
        {"doc_id": 3, "source": "C", "text": "q r"},     # {q r}
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = (source_bigram_overlap(str(tmp_path)).to_pandas()
           .set_index(["source_a", "source_b"]).sort_index())
    ab = out.loc[("A", "B")]
    assert (ab["n_common"], ab["n_a"], ab["n_b"]) == (1, 2, 2)
    assert ab["jaccard"] == 0.33333               # 1/(2+2-1), half-away 5dp
    assert ("A", "C") not in out.index            # disjoint pairs absent


def test_doc_novelty_planted(ray_session, tmp_path):
    """Hand-built corpus: doc0 "a b c" grams {a b, b c}; doc1 "a b" gram
    {a b}; doc2 "x y" gram {x y}. df(a b)=2 so it is shared; b c / x y are
    corpus-unique. doc0: 1/2 novel; doc1: 0/1; doc2: 1/1. A single-token
    doc emits no row (no bigram), and a within-doc repeated gram counts
    once (doc4: "z w z w" emits "z w" twice but its distinct gram set is
    {z w, w z} — both corpus-unique, n_bigrams == 2)."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.sampling import doc_novelty

    rows = [
        {"doc_id": 0, "source": "s", "text": "a b c"},
        {"doc_id": 1, "source": "s", "text": "a b"},
        {"doc_id": 2, "source": "s", "text": "x y"},
        {"doc_id": 3, "source": "s", "text": "only"},
        {"doc_id": 4, "source": "s", "text": "z w z w"},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = (doc_novelty(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.index.tolist() == [0, 1, 2, 4]
    assert out["n_bigrams"].tolist() == [2, 1, 1, 2]
    assert out["n_novel"].tolist() == [1, 0, 1, 2]
    assert out["novelty"].tolist() == [0.5, 0.0, 1.0, 1.0]


def test_quality_weighted_sample_threshold(ray_session, tmp_path):
    """Soft filter keeps doc iff knuth(doc_id)/2^32 < quality: quality 1.0
    always kept, 0.0 never; a mid-quality doc follows its hash coin."""
    import pandas as pd
    import numpy as np

    from neo4j_tkapi_ray.ops.sampling import _KNUTH, _MOD32, quality_weighted_sample

    # build texts whose quality_scores are deterministic: the op composes
    # quality_scores, so plant texts and check against the rule directly
    rows = [
        {"doc_id": i, "text": " ".join(["data of the table row"] * 6),
         "lang": "en", "source": "t", "n_chars": 0}
        for i in range(50)
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    from neo4j_tkapi_ray.ops.textstats import quality_scores
    q = quality_scores(str(tmp_path)).to_pandas().set_index("doc_id")
    kept = (quality_weighted_sample(str(tmp_path)).to_pandas()
            .sort_values("doc_id"))
    key = (np.arange(50, dtype=np.uint64) * _KNUTH) % _MOD32
    expect = [i for i in range(50)
              if float(key[i]) < q.loc[i, "quality"] * 4294967296.0]
    assert kept["doc_id"].tolist() == expect
    assert 0 < len(kept) < 50 or q["quality"].nunique() == 1


def test_bigram_pmi_planted(ray_session, tmp_path):
    """Hand-computed PMI over a 3-doc corpus (min_count lowered to 1):
    grams (a,b):3 (b,a):1 (b,c):1 (c,c):1, N=6; cl a:3 b:2 c:1;
    cr b:3 a:1 c:2. PMI(a,b)=ln2, PMI(b,a)=PMI(c,c)=ln3 (tie broken by
    x asc), PMI(b,c)=ln1.5 — ranks follow rounded-PMI desc then (x,y)."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.sampling import bigram_pmi

    rows = [
        {"doc_id": 0, "source": "s", "text": "a b a b"},
        {"doc_id": 1, "source": "s", "text": "a b c"},
        {"doc_id": 2, "source": "s", "text": "c c"},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = (bigram_pmi(str(tmp_path), top_k=10, min_count=1)
           .to_pandas().sort_values("rank").reset_index(drop=True))
    assert out["rank"].tolist() == [1, 2, 3, 4]
    assert list(zip(out["x"], out["y"])) == [
        ("b", "a"), ("c", "c"), ("a", "b"), ("b", "c")]
    assert out["c"].tolist() == [1, 1, 3, 1]
    assert out["pmi"].tolist() == [1.09861, 1.09861, 0.69315, 0.40547]


def test_source_vocab_stats_planted(ray_session, tmp_path):
    """Source A: "a b a", "b c" -> types {a,b,c}=3, counts a:2 b:2 c:1 ->
    hapax {c}=1, tokens=5, ttr=3/5. Source B: "z" -> 1/1/1, ttr=1.0.
    Multi-block input pins the cross-batch (source, token) count merge."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.sampling import source_vocab_stats

    rows = [
        {"doc_id": 0, "source": "A", "text": "a b a"},
        {"doc_id": 1, "source": "A", "text": "b c"},
        {"doc_id": 2, "source": "B", "text": "z"},
        {"doc_id": 3, "source": "A", "text": ""},   # empty doc: no tokens
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = (source_vocab_stats(str(tmp_path)).to_pandas()
           .set_index("source").sort_index())
    assert out.index.tolist() == ["A", "B"]
    assert out.loc["A"].tolist() == [3, 1, 5, 0.6]
    assert out.loc["B"].tolist() == [1, 1, 1, 1.0]


def test_bpe_merges_planted(ray_session, tmp_path):
    """Hand-checkable corpus: "aa ab aa b" x3 docs. Chars: a,b. Word
    counts: aa:6, ab:3, b:3. Pair counts round 1: (a,a)=9 from aa(x6)?
    no — aa has ONE adjacent pair per word: (a,a)x6; ab gives (a,b)x3.
    Best = (a,a,6)... wait aa:6 occurrences -> (a,a) count 6 > (a,b) 3.
    After merging 'aa', round 2: only (a,b)x3 remains."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.textstats import bpe_merges

    rows = [{"doc_id": i, "text": "aa ab aa b"} for i in range(3)]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = bpe_merges(str(tmp_path), n_merges=3).to_pandas()
    assert out[["rank", "left", "right", "pair_count"]].values.tolist() == [
        [1, "a", "a", 6], [2, "a", "b", 3]]   # round 3: no pairs left

def test_bpe_merges_overlap_and_tiebreak(ray_session, tmp_path):
    """"aaa" counts (a,a) twice per word (overlapping zip semantics) but
    greedy left-to-right apply merges only the first: "aaa" -> [aa, a].
    Tie-break on equal counts is (left asc, right asc)."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.textstats import bpe_merges

    rows = [{"doc_id": 0, "text": "aaa"},
            {"doc_id": 1, "text": "xy xy"}]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = bpe_merges(str(tmp_path), n_merges=2).to_pandas()
    # round 1: (a,a)=2 (overlap) vs (x,y)=2 -> tie -> (a,a) wins on left
    assert out.iloc[0].tolist() == [1, "a", "a", 2]
    # round 2: "aaa" is now [aa, a] -> (aa,a)=1; (x,y)=2 wins
    assert out.iloc[1].tolist() == [2, "x", "y", 2]


def test_curriculum_buckets_ntile(ray_session, tmp_path):
    """NTILE(k) semantics with n not divisible by k: n=7, k=3 -> buckets of
    3/2/2 over the (length, doc_id) order; and n < k gives one row per
    bucket."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.sampling import curriculum_buckets

    rows = [{"doc_id": i, "text": "x" * (10 + i)} for i in range(7)]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = (curriculum_buckets(str(tmp_path), k=3).to_pandas()
           .sort_values("rank"))
    assert out["bucket"].tolist() == [1, 1, 1, 2, 2, 3, 3]
    out2 = (curriculum_buckets(str(tmp_path), k=10).to_pandas()
            .sort_values("rank"))
    assert out2["bucket"].tolist() == list(range(1, 8))


def test_source_length_moments_planted(ray_session, tmp_path):
    """Hand-computable moments incl. a single-doc source (var 0) and the
    rounding rule."""
    import numpy as np
    import pandas as pd

    from neo4j_tkapi_ray.ops.sampling import source_length_moments

    rows = [
        {"doc_id": 0, "source": "A", "n_chars": 10},
        {"doc_id": 1, "source": "A", "n_chars": 20},
        {"doc_id": 2, "source": "A", "n_chars": 40},
        {"doc_id": 3, "source": "B", "n_chars": 7},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = (source_length_moments(str(tmp_path)).to_pandas()
           .set_index("source").sort_index())
    # A: mean 70/3, var = (2100 - 70*70/3)/3, std = sqrt(var)
    mean = 70.0 / 3.0
    var = (2100.0 - 70.0 * 70.0 / 3.0) / 3.0
    r5 = lambda v: np.floor(v * 1e5 + 0.5) / 1e5
    assert out.loc["A"].tolist() == [3, r5(mean), r5(var), r5(var ** 0.5)]
    assert out.loc["B"].tolist() == [1, 7.0, 0.0, 0.0]


def test_contamination_overlap_planted(ray_session, tmp_path):
    """Planted eval leak: doc 0 is snippet-source (doc_id % 97 == 0, text
    >= 70 chars); doc 97 also qualifies; a non-stride doc sharing the
    snippet's bigrams scores > 0, an unrelated doc scores 0."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.sampling import contamination_overlap

    base = "x" * 40 + "leak alpha beta gamma delta ss" + "y" * 10
    rows = [
        {"doc_id": 0, "text": base},                       # snippet source
        {"doc_id": 1, "text": "alpha beta gamma unrelated tail words"},
        {"doc_id": 2, "text": "totally clean text with no overlap"},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = (contamination_overlap(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    # snippet = base[40:70] = 'leak alpha beta gamma delta ss'
    # doc 1 grams: {alpha beta, beta gamma, gamma unrelated, ...} — the
    # first two are snippet grams
    assert out.loc[1, "n_hits"] == 2
    assert out.loc[1, "overlap_frac"] > 0
    assert out.loc[2, "n_hits"] == 0 and out.loc[2, "overlap_frac"] == 0.0
    # source doc: the snippet's edge tokens glue to the x/y padding, so
    # exactly the 3 interior grams (alpha beta, beta gamma, gamma delta) hit
    assert out.loc[0, "n_hits"] == 3


def test_split_assign_planted(ray_session, tmp_path):
    """Split is a pure function of doc_id (stability under corpus growth)
    and percentages hold on a large id range."""
    import numpy as np
    import pandas as pd

    from neo4j_tkapi_ray.ops.sampling import split_assign

    n = 5000
    df = pd.DataFrame({"doc_id": np.arange(n),
                       "n_chars": np.full(n, 10)})
    df.to_parquet(tmp_path / "documents.parquet")
    out = split_assign(str(tmp_path)).to_pandas().set_index("split")
    assert int(out["n_docs"].sum()) == n
    assert int(out["n_chars_total"].sum()) == 10 * n
    assert out.loc["train", "n_docs"] > 0.95 * n
    assert 0 < out.loc["val", "n_docs"] < 0.03 * n
    assert 0 < out.loc["test", "n_docs"] < 0.03 * n

    # stability: the first half's per-doc assignment is unchanged when
    # the second half of the corpus is removed
    df.head(n // 2).to_parquet(tmp_path / "documents.parquet")
    half = split_assign(str(tmp_path)).to_pandas().set_index("split")
    key = (np.arange(n // 2).astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(4294967296) % np.uint64(100)
    assert half.loc["train", "n_docs"] == int((key < 98).sum())


def test_aho_scanner_matches_kernel_path(ray_session, tmp_path):
    """The Aho-Corasick actor path and the RE2-kernel path are
    bit-identical; the automaton handles overlapping patterns, shared
    prefixes and failure-link suffix hits."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.scan import AhoAutomaton
    from neo4j_tkapi_ray.ops.sampling import decontaminate

    # automaton semantics on adversarial patterns
    auto = AhoAutomaton(["he", "she", "his", "hers", "x"])
    assert auto.find_any("ushers")          # 'she' via failure links
    assert auto.find_any("this")            # 'his'
    assert not auto.find_any("hero"[3:])    # 'o'
    assert not auto.find_any("hi t er")

    rows = [{"doc_id": i * 97,
             "text": "x" * 40 + f"snippet-{i:03d} body tail" + "y" * 12}
            for i in range(6)]
    # doc 8 carries a full 30-char snippet (snippet = text[40:70] of a
    # stride doc: 'snippet-002 body tail' + 9 y's)
    rows += [{"doc_id": 5, "text": "clean document"},
             {"doc_id": 8,
              "text": "zz snippet-002 body tail" + "y" * 9 + " zz"}]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")

    kern = (decontaminate(str(tmp_path)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    aho = (decontaminate(str(tmp_path), aho_threshold=0).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert kern.equals(aho)
    assert aho.set_index("doc_id").loc[8, "contaminated"] == 1
    assert aho.set_index("doc_id").loc[5, "contaminated"] == 0


def test_sparse_topk_pairs_planted(ray_session, tmp_path):
    """Two docs sharing a rare bigram outrank docs sharing nothing; a
    bigram in every doc is pruned by the df band; tf weighting counts
    repeats."""
    import pandas as pd

    from neo4j_tkapi_ray.ops.sampling import sparse_topk_pairs

    common = "filler words"
    rows = [
        {"doc_id": 0, "text": f"{common} rare pair rare pair"},
        {"doc_id": 1, "text": f"{common} rare pair"},
        {"doc_id": 2, "text": f"{common} other stuff"},
        {"doc_id": 3, "text": f"{common} more things"},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = sparse_topk_pairs(str(tmp_path), k=5, min_df=2,
                            max_df=3).to_pandas()
    # 'filler words' has df=4 > max_df -> pruned; 'rare pair' df=2 links
    # docs 0 and 1 only (tf 2 in doc 0 via the repeat, 1 in doc 1)
    assert list(out[["doc_a", "doc_b"]].itertuples(index=False,
                                                   name=None)) == [(0, 1)]
    import math
    w = math.floor(math.log(4 / 2) * 1e6)
    # shared in-band grams: 'rare pair' (tf 2x1, the doc-0 repeat) and the
    # boundary gram 'words rare' (tf 1x1, df=2); 'pair rare' is df=1
    assert int(out["dot_micro2"].iloc[0]) == (2 * 1 + 1 * 1) * w * w


def test_trie_regex_scanner_parity_and_speed():
    """TrieRegexScanner (the shipping scan path) must agree with the
    reference AhoAutomaton on a deterministic fuzz corpus — overlapping
    patterns, shared prefixes, prefix-of-pattern pruning, regex
    metacharacters — and be faster at a 5k-pattern set."""
    import random
    import time

    from neo4j_tkapi_ray.ops.scan import AhoAutomaton, TrieRegexScanner

    rng = random.Random(7)
    alpha = "ab.(*c"
    pats = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
            for _ in range(300)] + ["he", "she", "his", "hers", "a(b"]
    texts = ["".join(rng.choice(alpha + " xyz") for _ in range(rng.randint(0, 80)))
             for _ in range(500)] + ["ushers", "this", "", "a(bc", "zzz"]
    ref = AhoAutomaton(pats)
    fast = TrieRegexScanner(pats)
    for t in texts:
        assert fast.find_any(t) == ref.find_any(t), t

    # 5k-pattern throughput probe (informational ratio; asserts only a
    # loose floor so host drift cannot flake the suite)
    pats5k = [f"needle-{i:05d}-tok" for i in range(5000)]
    body = ("lorem ipsum " * 200) + "needle-04999-tok tail"
    ref5, fast5 = AhoAutomaton(pats5k), TrieRegexScanner(pats5k)
    t0 = time.time()
    for _ in range(3):
        assert ref5.find_any(body)
    t_ref = time.time() - t0
    t0 = time.time()
    for _ in range(300):
        assert fast5.find_any(body)
    t_fast = (time.time() - t0) / 100
    assert t_fast * 3 < t_ref, (t_fast, t_ref)
