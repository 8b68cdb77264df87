import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (per project convention)."""
    import ray
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    """Deterministic small corpus shared across tests."""
    from neo4j_tkapi_ray.corpus import generate_corpus
    out = str(tmp_path_factory.mktemp("corpus"))
    paths = generate_corpus(out, n_sessions=60, seed=42)
    return {"dir": out, **paths}


@pytest.fixture(scope="session")
def oracle_result(corpus):
    from neo4j_tkapi_ray.oracle import run_oracle
    triples, mentions, texts, failed = run_oracle(corpus["pages"], corpus["dir"])
    return {"triples": triples, "mentions": mentions, "texts": texts, "failed": failed}
