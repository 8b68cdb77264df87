"""Multi-pattern substring scanning as a STATEFUL actor-pool stage.

``sampling.decontaminate``'s per-snippet ``match_substring`` kernel pass is
O(snippets) scans per batch — the right shape for eval suites of hundreds
of snippets. For pattern sets in the tens of thousands (full benchmark
suites, URL blocklists, licence-string banks), the classic answer is one
automaton pass: O(text + matches) per batch independent of the pattern
count. The automaton is exactly the kind of expensive per-worker state the
engine's actor-pool rule exists for — built ONCE per actor in ``__init__``
from a ``ray.put`` broadcast, reused across every batch the actor sees
(building it per batch would dominate the scan).

Two implementations, bit-identical (exact substring containment, so the
same DuckDB ``contains()`` oracle covers either):

* ``AhoAutomaton`` — the textbook Aho-Corasick trie + failure links over
  unicode code points. Pure-python scan loop (~1-2 MB/s): kept as the
  REFERENCE implementation the fast path is parity-tested against.
* ``TrieRegexScanner`` — the shipping path (VERDICT r4 item 6): the
  pattern trie is compiled into ONE prefix-sharing regex (patterns that
  contain another pattern as a prefix are pruned — containment cannot
  need them), and ``find_any`` is a single C-speed ``re.search``. Same
  automaton idea, but the per-character state machine runs inside CPython's
  sre engine instead of the interpreter — measured 30x+ on the planted
  scanner corpus (bench entry ``aho_scan_5k``).
"""

from __future__ import annotations

import re
from collections import deque
from typing import List, Optional

import numpy as np
import pyarrow as pa
import ray


class AhoAutomaton:
    """Aho-Corasick over unicode code points; ``find_any`` answers "does
    the text contain ANY pattern" with early exit on first hit. Reference
    implementation — see module docstring."""

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


class TrieRegexScanner:
    """Prefix-sharing trie compiled to one regex; ``find_any`` is a single
    C-speed ``re.search``. Exact containment semantics: every pattern is
    escaped character-by-character, and a pattern that ends at a trie node
    prunes everything below it (if "he" is a pattern, no text can contain
    "hers" without containing "he")."""

    def __init__(self, patterns: List[str]):
        trie: dict = {}
        n = 0
        for p in patterns:
            if not p:
                continue
            n += 1
            d = trie
            terminal = False
            for ch in p:
                if "" in d:       # an existing pattern is a prefix of p
                    terminal = True
                    break
                d = d.setdefault(ch, {})
            if not terminal:
                d.clear()         # p prunes any longer patterns below it
                d[""] = True
        self.n_patterns = n
        self._rx: Optional[re.Pattern] = (
            re.compile(self._emit(trie)) if trie else None)

    @staticmethod
    def _emit(d: dict) -> str:
        if "" in d:
            return ""
        alts = [re.escape(ch) + TrieRegexScanner._emit(sub)
                for ch, sub in sorted(d.items())]
        return alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"

    def find_any(self, text: str) -> bool:
        return self._rx is not None and self._rx.search(text) is not None


class SnippetScanner:
    """Actor-pool batch scanner: trie-regex built once per actor from the
    broadcast snippet list (``__init__``), one C-speed pass per text per
    batch."""

    def __init__(self, snips_ref):
        self.auto = TrieRegexScanner(ray.get(snips_ref))

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        hit = np.fromiter((self.auto.find_any(t) for t in texts),
                          dtype=bool, count=len(texts))
        return pa.table({"doc_id": b.column("doc_id"),
                         "contaminated": pa.array(hit.astype(np.int64),
                                                  pa.int64())})
