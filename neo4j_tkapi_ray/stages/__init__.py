from .extract import extract_docs  # noqa: F401
from .link import link_docs  # noqa: F401
from .triples import to_mentions, to_triples  # noqa: F401
from .canonicalize import canonicalize_edges, canonicalize_nodes  # noqa: F401
