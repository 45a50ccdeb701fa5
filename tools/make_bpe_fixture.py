"""Regenerate the frozen BPE fixtures (VERDICT r04 item 5).

Writes ``resources/bpe_fixture_merges.parquet`` (rank, a, b) and
``resources/bpe_fixture_encoded.parquet`` (doc_id, tokens) for the
deterministic doc_id-arithmetic corpus used by the
``bpe_merges_corpus`` / ``bpe_encode_documents`` driver gates.

The trainer here is an INDEPENDENT pure-Python Sennrich-style
implementation (dict counting, same tie-break: count desc, pair asc) —
NOT `operators/bpe.py::bpe_train` — so the gate genuinely
cross-checks the distributed trainer against a second implementation,
the `uuid5_document_ids` fixture pattern applied to an iterative
algorithm.  Run from the repo root:

    python tools/make_bpe_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swisscourtrulingcorpus_spark.operators.bpe import (  # noqa: E402
    END,
    bpe_encode_py,
)
from swisscourtrulingcorpus_spark.plans.bpe_fixture import (  # noqa: E402
    BPE_FIXTURE_DOCS,
    BPE_FIXTURE_MERGES,
    bpe_fixture_text,
)

NUM_MERGES = 20


def train_reference(word_freqs: dict[str, int], num_merges: int):
    """Sennrich-style reference trainer (count desc, pair asc
    tie-break, stop when the best pair count drops below 2)."""
    syms = {w: list(w) + [END] for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[pair] < 2:
            break
        merges.append(pair)
        a, b = pair
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def main() -> None:
    res = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "swisscourtrulingcorpus_spark",
        "resources",
    )
    texts = {d: bpe_fixture_text(d) for d in range(BPE_FIXTURE_DOCS)}
    freqs: dict[str, int] = {}
    for t in texts.values():
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    merges = train_reference(freqs, NUM_MERGES)
    assert len(merges) == BPE_FIXTURE_MERGES, (
        f"fixture expects {BPE_FIXTURE_MERGES} merges, trainer produced "
        f"{len(merges)} — update BPE_FIXTURE_MERGES"
    )
    pq.write_table(
        pa.table(
            {
                "rank": pa.array(range(len(merges)), pa.int32()),
                "a": [a for a, _ in merges],
                "b": [b for _, b in merges],
            }
        ),
        os.path.join(res, "bpe_fixture_merges.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "tokens": [
                    " ".join(bpe_encode_py(texts[d], merges))
                    for d in sorted(texts)
                ],
            }
        ),
        os.path.join(res, "bpe_fixture_encoded.parquet"),
    )
    print(f"wrote {len(merges)} merges, {len(texts)} encoded docs -> {res}")


if __name__ == "__main__":
    main()
