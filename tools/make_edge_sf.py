"""Build an EDGE-CASE scale-factor directory for the oracle gate.

Copies every table from a source SF dir and appends pathological rows to
``documents.parquet`` that the driver-generated testdata never contains:

- empty text (``''``)           — zero length, zero tokens;
- NULL text                     — the undecodable/missing-doc case;
- whitespace-only (``'   '``)   — nonzero length, zero tokens;
- punctuation-only              — nonzero length/symbols, zero tokens;
- multi-byte UTF-8 text         — byte-walk vs char-walk divergence;

plus embeddings edges (all-zero vector, NULL vector — quarantined by the
sources.read_embeddings ingestion contract; round 9 added prefix-zero,
1e4-magnitude, all-negative, and 1e-30-tiny vectors — the full registry
passed 199/199 on first run against all four, evidence the fixed-point /
guard idioms hold beyond the unit-scale regime) and events edges (NULL
value, NULL user_id).

Running the FULL registry against this dir (``python tools/oracle_check.py
/tmp/edge_sf``) is the mechanical form of the empty-edge spot check the
verification norms call for. Across its round-8 iterations the sweep found 36 divergent queries:
ones that crashed (ANSI DIVIDE_BY_ZERO, NULL-payload TypeError in Arrow kernels) or
silently diverged from their DuckDB twins (NULL-vs-0 hash buckets flipping
train/val/test membership, NULL-vs-'' array joins, list_sum([]) = NULL) on
exactly these rows, plus byte-vs-char histogram drift on multi-byte
UTF-8 and the whole embedding family on zero/NULL vectors — every one
a real defect class at 100 TB, where a crawl slice always contains
empty, null, and non-ASCII documents and failed embed jobs.

Usage:
    python tools/make_edge_sf.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 -> /tmp/edge_sf
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def build(src: str, out: str) -> None:
    src_p, out_p = Path(src), Path(out)
    out_p.mkdir(parents=True, exist_ok=True)
    for f in src_p.glob("*.parquet"):
        shutil.copy(f, out_p / f.name)

    t = pq.read_table(src_p / "documents.parquet")
    df = t.to_pandas()
    mx = int(df.doc_id.max())
    texts = [
        "",  # zero length, zero tokens
        None,  # missing doc
        "   ",  # nonzero length, zero tokens
        "!!!??? ...",  # symbols only, zero tokens
        # multi-byte UTF-8: byte-walking kernels vs char-walking oracles
        # diverge on these unless the oracle walks encoded bytes too
        "héllo wörld naïve café résumé",
        "日本語のテキスト and some ascii 123",
        # round-12: PII-bearing docs so text_pii_detect's email/digit-run
        # predicates execute non-trivially on the edge sweep (the
        # synthetic corpus is clean word soup) — an email-like token, a
        # phone whose punctuation splits it into sub-7 runs EXCEPT the
        # 7-digit tail (boundary of the phone rule), and a 13-digit
        # id-like run that must count as BOTH a 7+ and a 12+ run
        "write to alice@example.org for details",
        "call 555-123-4567 or +1 (800) 5551212 now",
        "account 1234567890123 was flagged",
    ]
    extra = pd.DataFrame(
        {
            "doc_id": [mx + 1 + i for i in range(len(texts))],
            "text": texts,
            "lang": ["en", "en", "en", "en", "fr", "ja", "en", "en", "en"],
            "source": [df.source.iloc[0]] * len(texts),
            "n_chars": [0 if t is None else len(t) for t in texts],
        }
    )
    merged = pd.concat([df, extra], ignore_index=True)
    merged["doc_id"] = merged["doc_id"].astype("int64")
    merged["n_chars"] = merged["n_chars"].astype("int64")
    pq.write_table(
        pa.Table.from_pandas(merged, schema=t.schema, preserve_index=False),
        out_p / "documents.parquet",
    )

    # embeddings: a ZERO vector (padding/failed-embed artifact — the
    # zero-norm case every cosine guard exists for) and a NULL embedding
    # (failed embed job). vec_id appended past the max so ANN query
    # anchors (vec_id 0) stay untouched. Round-9 additions: a PREFIX-ZERO
    # vector (all signal past dim 32 — passes the read_embeddings nonzero
    # gate but has zero-norm m<=32 prefixes, the matryoshka guard class),
    # a LARGE-MAGNITUDE vector (1e4 components — stresses the scaled-1e6
    # fixed-point idioms while staying inside BIGINT range), an
    # ALL-NEGATIVE vector (floor() quantization is asymmetric around
    # zero — sign-safety of the int8 family), and a TINY vector (1e-30
    # components — x*1e6 rounds to 0, near-underflow norms).
    te = pq.read_table(src_p / "embeddings.parquet")
    de = te.to_pandas()
    dim = len(de.embedding.iloc[0])
    vmx = int(de.vec_id.max())
    prefix_zero = [0.0] * 32 + [0.5 + 0.01 * i for i in range(dim - 32)]
    big = [1.0e4 * (1 if i % 2 else -1) * (1 + i / dim) for i in range(dim)]
    allneg = [-0.25 - 0.01 * i for i in range(dim)]
    tiny = [1.0e-30 * (i + 1) for i in range(dim)]
    edge_vecs = [[0.0] * dim, None, prefix_zero, big, allneg, tiny]
    ee = pd.DataFrame(
        {
            "vec_id": pd.Series(
                [vmx + 1 + i for i in range(len(edge_vecs))], dtype="int64"
            ),
            "embedding": pd.Series(edge_vecs, dtype="object"),
            "label": pd.Series(
                [int(de.label.iloc[0])] * len(edge_vecs), dtype=de.label.dtype
            ),
        }
    )
    me = pd.concat([de, ee], ignore_index=True)
    me["vec_id"] = me["vec_id"].astype("int64")
    pq.write_table(
        pa.Table.from_pandas(me, schema=te.schema, preserve_index=False),
        out_p / "embeddings.parquet",
    )

    # events: a NULL-value event (non-revenue action) and a NULL-user
    # event (anonymous session) at fresh event_ids, timestamps inside the
    # existing range so window/watermark logic sees nothing special.
    tv = pq.read_table(src_p / "events.parquet")
    dv = tv.to_pandas()
    emx = int(dv.event_id.max())
    ev = pd.DataFrame(
        {
            "event_id": pd.Series([emx + 1, emx + 2], dtype="int64"),
            "ts": [dv.ts.iloc[0], dv.ts.iloc[len(dv) // 2]],
            "user_id": pd.Series([int(dv.user_id.iloc[0]), None], dtype="object"),
            "event_type": ["click", "click"],
            "value": pd.Series([None, 1.25], dtype="object"),
            "props": ["{}", "{}"],
        }
    )
    mv = pd.concat([dv, ev], ignore_index=True)
    mv["event_id"] = mv["event_id"].astype("int64")
    pq.write_table(
        pa.Table.from_pandas(mv, schema=tv.schema, preserve_index=False),
        out_p / "events.parquet",
    )
    print(
        f"wrote {out_p}: {len(merged)} documents ({len(texts)} edge), "
        f"{len(me)} embeddings (6 edge), {len(mv)} events (2 edge)"
    )


if __name__ == "__main__":
    argv = sys.argv[1:]
    build(
        argv[0] if argv else "/root/testdata/sf0.001",
        argv[1] if len(argv) > 1 else "/tmp/edge_sf",
    )
