"""Text normalization — the map-only pass every dedup/fingerprint
pipeline runs FIRST (two byte-different spellings of the same document
must collide in exact dedup, MinHash shingles and BM25 terms alike;
C4/CCNet/Gopher all normalize before deduplicating).

Reference analog: none (north-star §2.12 text surface).

Scale shape: pure column expressions — regexp_replace / lower / trim
inside one whole-stage-codegen span, ZERO shuffles, no Python.  The one
exception is Unicode canonical normalization (``form=``): Spark SQL has
no NFC/NFKC builtin, so that single step runs as an Arrow-batched
pandas_udf (``unicodedata.normalize``) and is OFF by default.

Engine-portable by construction: the regex char-classes are spelled
explicitly (no ``\\s`` — Java includes ``\\x0b`` where RE2 does not)
and :func:`normalize_sql` emits the identical DuckDB expression (RE2
with the ``'g'`` flag), which is what lets the gate hash-check the
operator.  ASCII lowering is identical across engines; non-ASCII case
folding follows each engine's Unicode tables — callers needing strict
cross-engine parity on non-ASCII text should normalize with ``form=``
and accept the documented JVM-vs-utf8proc divergence on exotic case
mappings (ß, dotted/dotless i).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# zero-width + BOM + word-joiner format characters: invisible, survive
# copy-paste, and split tokens without changing rendered text — the
# classic dedup-evasion bytes
ZERO_WIDTH_CLASS = "[\u200b\u200c\u200d\u2060\ufeff]"
# explicit whitespace class — NOT \s (Java's \s includes \x0b, RE2's
# does not; an explicit class means Spark and DuckDB replace the same
# bytes).  Includes the Unicode spaces a copy-paste round trip actually
# produces (NEL, NBSP, ogham mark, en/em/thin/narrow-NBSP, LINE and
# PARAGRAPH SEPARATOR, math/ideographic spaces) — the whitespace
# disguises HTML/PDF extraction round trips actually emit.
WS_CLASS = ("[ \\t\\n\\r\\f\\x0b\u0085\u00a0\u1680\u2000-\u200a"
            "\u2028\u2029\u202f\u205f\u3000]+")
# non-whitespace C0 controls + DEL; \t \n \x0b \f \r (09-0d) belong
# to WS_CLASS and must COLLAPSE to a space, not vanish — deleting them
# here would glue adjacent words together
CONTROL_CLASS = "[\\x00-\\x08\\x0e-\\x1f\\x7f]"


def normalize_expr(col: Column, lowercase: bool = True) -> Column:
    """The JVM-side normalization chain over a string column: strip
    zero-width and control characters, collapse whitespace runs to
    single spaces, optionally lowercase, trim."""
    # order matters: invisible/control bytes strip FIRST, then
    # whitespace collapses — the reverse left 'a \\x01 b' with a double
    # space ('a  b') that no longer collided with 'a b'
    out = F.regexp_replace(col, ZERO_WIDTH_CLASS, "")
    out = F.regexp_replace(out, CONTROL_CLASS, "")
    out = F.regexp_replace(out, WS_CLASS, " ")
    if lowercase:
        out = F.lower(out)
    return F.trim(out)


def normalize_sql(expr: str, lowercase: bool = True) -> str:
    """The IDENTICAL chain in DuckDB SQL (RE2 needs the explicit 'g'
    flag — without it only the first match is replaced)."""
    out = f"regexp_replace({expr}, '{ZERO_WIDTH_CLASS}', '', 'g')"
    out = f"regexp_replace({out}, '{CONTROL_CLASS}', '', 'g')"
    out = f"regexp_replace({out}, '{WS_CLASS}', ' ', 'g')"
    if lowercase:
        out = f"lower({out})"
    return f"trim({out})"


def normalize_text(
    df: DataFrame,
    text_col: str,
    out_col: str = "text_norm",
    lowercase: bool = True,
    form: str | None = None,
) -> DataFrame:
    """Append ``out_col`` = normalized ``text_col``.  ``form`` in
    {'NFC','NFKC','NFD','NFKD'} additionally applies Unicode canonical
    normalization FIRST (Arrow-batched pandas_udf — the only non-JVM
    step, skipped when None).  NULL stays NULL throughout."""
    col: Column = F.col(text_col)
    if form is not None:
        if form not in ("NFC", "NFKC", "NFD", "NFKD"):
            raise ValueError(f"form must be NFC/NFKC/NFD/NFKD, got {form!r}")
        from pyspark.sql.types import StringType

        @F.pandas_udf(StringType())
        def _unorm(s: pd.Series) -> pd.Series:
            import unicodedata

            return s.map(
                lambda v: None
                if v is None
                else unicodedata.normalize(form, v)
            )

        col = _unorm(col)
    return df.withColumn(out_col, normalize_expr(col, lowercase=lowercase))
