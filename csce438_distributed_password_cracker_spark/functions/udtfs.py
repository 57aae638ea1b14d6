"""Python UDTF reference implementations (SURVEY.md §2.11 UDTF
surface).

Like the pandas UDFs next door, these exist to exercise and validate
the table-function path — the native equivalents (split + posexplode)
are the production plan (JVM-side, whole-stage codegen); a Python UDTF
pays a per-row Python boundary and is the right tool only when the
row-expansion logic genuinely cannot be expressed with built-ins.

NOTE: no ``from __future__ import annotations`` — the UDTF decorator
resolves real type hints.
"""

from pyspark.sql.functions import udtf


@udtf(returnType="idx: int, segment: string, n_chars: int")
class SegmentSplitter:
    """Split a text into non-empty segments on a literal separator:
    one output row per segment with its ordinal and length — the
    sentence-splitting shape as a table function."""

    def eval(self, text: str, sep: str):
        if text is None:
            return
        idx = 0
        for seg in text.split(sep):
            if seg:
                yield idx, seg, len(seg)
                idx += 1
