"""Deterministic corpus generator in the BASELINE.json input_hint shape.

documents(doc_id: string,
          spans: array<struct<kind:string, text:string, media_ref:string,
                              offset:int>>)

Pure function of (seed, n_docs) — reproducible on any machine, no external
data (FIXTURES.md §1). Includes the skew tail (1% of docs get 30-60 media
spans) that exercises the engine's media-weight salting, and whitespace
edge cases that pin the trim semantics.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from tesseract_recognize_spark.fixtures.raster import HashStream

__all__ = ["gen_documents", "write_documents_parquet", "SPAN_ARROW_TYPE"]

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo"
).split()

_DECORATIONS = (
    "{}",          # clean
    "  {}",        # leading spaces
    "{}   ",       # trailing spaces
    "\t{}\n",      # tabs/newlines at both ends
    " \t {} \n ",  # mixed runs
    "{}",
)


def _text_payload(h: HashStream) -> str:
    r = h.u(20)
    if r == 0:
        return ""            # empty span
    if r == 1:
        return "   \t  "     # whitespace-only span (trims to empty)
    n = 1 + h.u(10)
    body_words = []
    for _ in range(n):
        w = _WORDS[h.u(len(_WORDS))]
        # occasional internal whitespace runs (must be preserved by trim)
        if h.u(10) == 0:
            w += "  " + _WORDS[h.u(len(_WORDS))]
        body_words.append(w)
    body = " ".join(body_words)
    return _DECORATIONS[h.u(len(_DECORATIONS))].format(body)


def gen_documents(n_docs: int, seed: int = 42) -> list[dict]:
    """Generate documents: list of {"doc_id", "spans": [span dicts]}."""
    docs = []
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        h = HashStream(f"corpus:{seed}:{doc_id}")
        if i % 100 == 7:  # skew tail: media-heavy documents
            n_media = 30 + h.u(31)
            kinds = ["media"] * n_media + ["text"] * h.u(4)
        else:
            n_spans = 1 + h.u(12)
            kinds = [
                "media" if h.u(100) < 20 else "text" for _ in range(n_spans)
            ]
        spans = []
        media_k = 0
        for off, kind in enumerate(kinds):
            if kind == "text":
                spans.append(
                    dict(kind="text", text=_text_payload(h), media_ref="",
                         offset=off)
                )
            else:
                style = f"{h.u(1 << 16):04x}{h.u(1 << 16):04x}"
                spans.append(
                    dict(
                        kind="media",
                        text="",
                        media_ref=f"media://{doc_id}/{media_k}#{style}",
                        offset=off,
                    )
                )
                media_k += 1
        docs.append({"doc_id": doc_id, "spans": spans})
    return docs


SPAN_ARROW_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)


def write_documents_parquet(
    docs: list[dict], path: str, n_files: int = 1
) -> None:
    """Write the corpus as parquet: a single file, or (``n_files > 1``) a
    directory of part files.

    A production Iceberg corpus is many data files, so its scan
    parallelizes naturally; a single small file is ONE Spark input split no
    matter how many cores — which makes any single-file benchmark corpus
    measure a serial scan+explode term that would not exist at scale. The
    scaling bench therefore writes multi-file corpora."""

    def _table(chunk: list[dict]) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in chunk], pa.string()),
                "spans": pa.array(
                    [
                        [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in d["spans"]
                        ]
                        for d in chunk
                    ],
                    SPAN_ARROW_TYPE,
                ),
            }
        )

    if n_files <= 1:
        pq.write_table(_table(docs), path)
        return
    import os

    os.makedirs(path, exist_ok=True)
    per = (len(docs) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = docs[i * per : (i + 1) * per]
        if not chunk:
            break
        pq.write_table(
            _table(chunk), os.path.join(path, f"part-{i:05d}.parquet")
        )
