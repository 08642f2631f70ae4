"""Property-based invariants (hypothesis; no Spark session needed)."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from tesseract_recognize_spark.constants import GLYPH_W
from tesseract_recognize_spark.fixtures.fonts import word_width
from tesseract_recognize_spark.fixtures.raster import (
    HashStream,
    layout_from_ref,
    layout_geometry,
)
from tesseract_recognize_spark.operators.explode import parse_pages_set
from tesseract_recognize_spark.oracle.oracle import trim


@given(st.sets(st.integers(min_value=0, max_value=200), min_size=1,
               max_size=40))
def test_parse_pages_set_roundtrip(pages):
    # canonical spec: collapse consecutive runs into dash ranges
    xs = sorted(pages)
    parts, i = [], 0
    while i < len(xs):
        j = i
        while j + 1 < len(xs) and xs[j + 1] == xs[j] + 1:
            j += 1
        parts.append(str(xs[i]) if i == j else f"{xs[i]}-{xs[j]}")
        i = j + 1
    assert parse_pages_set(",".join(parts)) == pages


_ASCII_WS = " \t\n\r\f\v"


@given(st.text(alphabet=st.sampled_from(list(_ASCII_WS) + list("abcXYZ.,")),
               max_size=60))
def test_trim_matches_reference_semantics(s):
    # the reference's normalization == strip of leading/trailing whitespace
    # (tesseract-recognize.cc:209); must be idempotent and preserve interior
    out = trim(s)
    assert out == trim(out)
    assert out == re.sub(r"^\s+|\s+$", "", s)
    if out:
        assert not out[0].isspace() and not out[-1].isspace()


@given(st.integers(min_value=1, max_value=20))
def test_word_width_monotone(n):
    assert word_width(n + 1) - word_width(n) == GLYPH_W + 1
    assert word_width(1) == GLYPH_W


@given(st.text(alphabet="abcdef0123456789:/#.-", min_size=1, max_size=40))
@settings(max_examples=40)
def test_layout_deterministic_and_geometry_consistent(ref):
    a, b = layout_from_ref(ref), layout_from_ref(ref)
    assert a == b
    geo = layout_geometry(a)
    assert geo == layout_geometry(b)
    # geometry invariants: word boxes of a line are disjoint in x and lie
    # inside the line bbox; RTL lines mirror inside the same span
    for bg in geo["blocks"]:
        if not bg["block"].is_text:
            continue
        for para in bg["paras"]:
            for line in para:
                lx0, ly0, lx1, ly1 = line["bbox"]
                spans = sorted(
                    (w["bbox"][0], w["bbox"][2]) for w in line["words"]
                )
                prev_end = None
                for x0, x1 in spans:
                    assert lx0 <= x0 <= x1 <= lx1
                    if prev_end is not None:
                        assert x0 > prev_end
                    prev_end = x1


@given(st.text(min_size=0, max_size=30), st.integers(1, 1 << 15))
@settings(max_examples=60)
def test_hashstream_deterministic(seed, n):
    a, b = HashStream(seed), HashStream(seed)
    assert [a.u(n) for _ in range(8)] == [b.u(n) for _ in range(8)]
    assert all(0 <= a.u(n) < n for _ in range(8))
