"""Multi-pattern substring scanning as a STATEFUL actor-pool stage.

``sampling.decontaminate``'s per-snippet ``match_substring`` kernel pass is
O(snippets) scans per batch — the right shape for eval suites of hundreds
of snippets. For pattern sets in the tens of thousands (full benchmark
suites, URL blocklists, licence-string banks), the classic answer is one
Aho-Corasick automaton pass: O(text + matches) per batch independent of
the pattern count. The automaton is exactly the kind of expensive
per-worker state the engine's actor-pool rule exists for — built ONCE per
actor in ``__init__`` from a ``ray.put`` broadcast, reused across every
batch the actor sees (building it per batch would dominate the scan).

Pure-python automaton (no external deps in this sandbox); at equal
pattern counts the RE2 kernel path is faster per pattern, so
``decontaminate`` keeps the kernel path below ``aho_threshold`` and
switches here above it. Both paths are bit-identical (exact substring
containment), so the same DuckDB ``contains()`` oracle covers either.
"""

from __future__ import annotations

from collections import deque
from typing import List

import numpy as np
import pyarrow as pa
import ray


class AhoAutomaton:
    """Aho-Corasick over unicode code points; ``find_any`` answers "does
    the text contain ANY pattern" with early exit on first hit."""

    def __init__(self, patterns: List[str]):
        # trie as list-of-dicts; goto[node][ch] -> node
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[bool] = [False]
        for p in patterns:
            if not p:
                continue
            node = 0
            for ch in p:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append(False)
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node] = True
        # failure links via BFS
        self.fail = [0] * len(self.goto)
        q: deque[int] = deque()
        for node in self.goto[0].values():
            q.append(node)
        while q:
            u = q.popleft()
            for ch, v in self.goto[u].items():
                q.append(v)
                f = self.fail[u]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[v] = self.goto[f].get(ch, 0)
                self.out[v] = self.out[v] or self.out[self.fail[v]]

    def find_any(self, text: str) -> bool:
        node = 0
        goto, fail, out = self.goto, self.fail, self.out
        for ch in text:
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                return True
        return False


class SnippetScanner:
    """Actor-pool batch scanner: automaton built once per actor from the
    broadcast snippet list (``__init__``), one pass per text per batch."""

    def __init__(self, snips_ref):
        self.auto = AhoAutomaton(ray.get(snips_ref))

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        hit = np.fromiter((self.auto.find_any(t) for t in texts),
                          dtype=bool, count=len(texts))
        return pa.table({"doc_id": b.column("doc_id"),
                         "contaminated": pa.array(hit.astype(np.int64),
                                                  pa.int64())})
