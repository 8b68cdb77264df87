from .kg import kg_triples_stream, run_kg, finalize_graph  # noqa: F401
