"""BPE tokenizer training on a Spark corpus.

The trainer splits exactly the way production tokenizer trainers
(HF tokenizers, SentencePiece) do:

1. **Corpus pass (distributed)** — one explode + groupBy computes the
   word-frequency table. This is the only stage that touches the corpus;
   at 100 TB it is one shuffle with heavy map-side combine (words repeat).
2. **Merge loop (vocabulary-sized)** — BPE's pair-count/merge iteration
   runs over the aggregated word table, which is bounded by vocabulary
   size (~1e5-1e7 rows), not corpus size. Sequential merge application is
   inherently order-dependent, so it belongs on the driver (or a single
   task), not in a distributed fold.

One round of step 2's pair counting IS the distributed
``text_bpe_merge_candidates`` query in ``plans/llm.py`` — the trainer's
first merge equals that query's top row (tested in
``tests/test_functions.py``).

Determinism: ties in pair count break by lexicographically smallest pair,
so the merge list is reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text

#: word-end sentinel NOT in the token alphabet ([a-z0-9]); marks that a
#: symbol only merges within a word, mirroring the </w> marker of the
#: original BPE paper. We train on plain in-word adjacency (no sentinel)
#: to stay aligned with the one-round SQL kernel.


#: default driver-side vocabulary bound. The distinct-word table of a noisy
#: web corpus is heavy-tailed (typos, ids, hashes), so the collect is capped
#: executor-side at the top-V words by frequency — the same move production
#: trainers make (HF/SentencePiece operate on a bounded word table). The
#: tail it drops carries frequency ~1 and cannot win a merge vote against
#: the head at any realistic n_merges.
DEFAULT_MAX_VOCAB = 1_000_000


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_vocab: int = DEFAULT_MAX_VOCAB
) -> dict[str, int]:
    """The distributed stage: corpus word-frequency table, collected.

    Bounded by construction: aggregated executor-side, then capped to the
    ``max_vocab`` most frequent words (count desc, word asc for determinism)
    BEFORE the collect, so driver memory is O(max_vocab) regardless of
    corpus size. ``max_vocab=None`` disables the cap (tests only).
    """
    wc = (
        docs.select(F.explode(text.tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    if max_vocab is not None:
        # TakeOrderedAndProject: executors keep top-max_vocab heaps, the
        # driver merges V-sized slices — never the unbounded distinct table
        wc = wc.orderBy(F.col("wc").desc(), F.col("w")).limit(max_vocab)
    rows = wc.collect()
    return {r["w"]: r["wc"] for r in rows}


def pair_counts(
    seqs: dict[str, list[str]], freqs: dict[str, int]
) -> dict[tuple[str, str], int]:
    """Frequency-weighted adjacent-symbol-pair counts over current segmentations."""
    counts: dict[tuple[str, str], int] = {}
    for w, cnt in freqs.items():
        s = seqs[w]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            counts[p] = counts.get(p, 0) + cnt
    return counts


def _merge_seq(s: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_vocab: int = DEFAULT_MAX_VOCAB,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges; returns them in merge order."""
    freqs = word_frequencies(docs, text_col, max_vocab=max_vocab)
    seqs = {w: list(w) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = pair_counts(seqs, freqs)
        if not counts:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest concatenated pair (matches the SQL kernel's
        # ORDER BY cnt DESC, pair)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0] + kv[0][1]))[0]
        merges.append(best)
        a, b = best
        for w in seqs:
            if a in w and b in w:  # cheap prefilter; exact check in _merge_seq
                seqs[w] = _merge_seq(seqs[w], a, b)
    return merges


def segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a trained merge list to one word (greedy, in merge order)."""
    s = list(word)
    for a, b in merges:
        s = _merge_seq(s, a, b)
    return s
