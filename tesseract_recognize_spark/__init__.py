"""tesseract_recognize_spark — a PySpark-native document-extraction engine.

A from-scratch re-expression (NOT a port) of the extraction semantics of
``mauvilsa/tesseract-recognize`` (reference snapshot at /root/reference):
interleaved text+media documents flow through a declarative DataFrame plan —
text spans through a native normalize stage, media spans through an
Arrow-batched mock-OCR stage (binarize → projection-profile XY-cut block
segmentation → line/word segmentation → glyph decode → reading order) — and
are flattened back into one canonical ordered span sequence per ``doc_id``.

The per-row invariant vs the reference: exact span-sequence equality on
``(kind, text, media_ref, order)`` per document, at any partition count and
parallelism level.
"""

__version__ = "0.1.0"

from tesseract_recognize_spark.config import ExtractConfig  # noqa: F401
