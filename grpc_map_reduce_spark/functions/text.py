"""Text expression helpers — all JVM-side Column expressions.

Tokenization contract (FIXTURES.md): the reference splits text on
every non-letter rune (``unicode.IsLetter``, mapper.go:181) and
PRESERVES case (wcMap never lowercases, mapper.go:179-189).  Two
modes:

  * default (``lowercase=True, unicode_letters=False``) — the pinned
    ASCII-lower interpretation used by every DuckDB-oracle-checked
    query (fixtures are ASCII word soup, and DuckDB's regex dialect
    matches ``[^a-z]+`` exactly);
  * reference parity (``lowercase=False, unicode_letters=True``) —
    Java ``[^\\p{L}]+`` splits on exactly the complement of Unicode
    letter categories, matching Go's ``unicode.IsLetter``, with case
    preserved.  ``run_reference_job`` / the CLI use this mode so a
    non-ASCII or case-sensitive corpus produces the reference's
    output byte-for-byte.

Everything here returns a ``Column`` so expressions stay inside
whole-stage codegen — no Python UDFs on the tokenize path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Split pattern — one-or-more non-ASCII-letter characters.
TOKEN_SPLIT_RE = "[^a-zA-Z]+"
#: Reference-parity split pattern — one-or-more non-Unicode-letter
#: characters (Java regex; Go ``unicode.IsLetter`` equivalent).
REFERENCE_SPLIT_RE = r"[^\p{L}]+"


def tokens(text: Column | str, *, lowercase: bool = True,
           unicode_letters: bool = False) -> Column:
    """``array<string>`` of word tokens of ``text`` (may contain '')."""
    col = F.col(text) if isinstance(text, str) else text
    if lowercase:
        col = F.lower(col)
    return F.split(col, REFERENCE_SPLIT_RE if unicode_letters else TOKEN_SPLIT_RE)


def words(text: Column | str, *, lowercase: bool = True,
          unicode_letters: bool = False) -> Column:
    """Like :func:`tokens` but with empty strings removed.

    ``split`` emits '' at the string boundaries when the text starts /
    ends with a separator; the reference's tokenizer simply never
    emits those (mapper.go:179-189), so filter them out.
    """
    return F.filter(
        tokens(text, lowercase=lowercase, unicode_letters=unicode_letters),
        lambda w: w != F.lit(""),
    )


def shingles(text: Column | str, n: int = 3, *, lowercase: bool = True) -> Column:
    """``array<string>`` of word ``n``-gram shingles (distinct not applied).

    Built with ``transform`` over token indices — stays JVM-side.
    Documents shorter than ``n`` words yield a single shingle of all
    their words (never an empty array for non-empty text).

    NOTE: higher-order-function lambdas are interpreted (outside
    whole-stage codegen) and Catalyst freely duplicates this whole
    expression into inferred filters and generator projections,
    re-running the tokenizer per slice.  For the shingle→explode→join
    hot path use :func:`distinct_shingles_udf` instead; this Column
    version remains for small/one-shot expression contexts.
    """
    ws = words(text, lowercase=lowercase)
    n_sh = F.greatest(F.size(ws) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n_sh - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(ws, i + F.lit(1), F.lit(n))),
    )


def distinct_shingles_udf(n: int = 3):
    """Vectorized (Arrow) producer of the DISTINCT word ``n``-gram
    shingle set — the scale path for near-dup similarity joins.

    Semantics match ``array_distinct(shingles(text, n))`` exactly
    (first-occurrence order), verified by the shared DuckDB oracle.
    A pandas UDF here beats the Column expression ~10×: it is
    evaluated exactly once per row as a dedicated ArrowEvalPython
    node (marked nondeterministic so Catalyst cannot clone it into
    inferred `size(...) > 0` filters), while the interpreted
    higher-order-function tree gets duplicated and re-runs the regex
    tokenizer inside every slice lambda.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    token_re = re.compile(TOKEN_SPLIT_RE)

    @pandas_udf("array<string>")
    def _shingle(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            ws = [w for w in token_re.split(t.lower()) if w]
            if len(ws) <= n:
                grams = [" ".join(ws)] if ws else []
            else:
                grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
            out.append(list(dict.fromkeys(grams)))
        return pd.Series(out)

    return _shingle.asNondeterministic()


def distinct_shingle_hashes_udf(n: int = 3):
    """Like :func:`distinct_shingles_udf` but emits each distinct
    shingle's 60-bit hash — ``('0x' || md5(s)[:15])::int64``, the same
    value the DuckDB oracles compute — instead of the string.

    This is the scale representation for every shingle join: shuffle
    keys become fixed-width 8 B longs instead of ~20 B strings, set
    intersections compare longs instead of hashing strings, and the
    shingle text never leaves the Python worker.  Downstream counts
    (document frequency, pair intersections, Jaccard) are identical to
    the string formulation unless two distinct shingles collide in 60
    bits — ~n²/2⁶¹, i.e. ~10⁻¹⁰ at fixture scale and a handful of
    pairs globally even at 10¹⁰ distinct shingles.
    """
    import hashlib
    import re

    from pyspark.sql.functions import pandas_udf

    token_re = re.compile(TOKEN_SPLIT_RE)

    @pandas_udf("array<long>")
    def _shingle_hashes(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            ws = [w for w in token_re.split(t.lower()) if w]
            if len(ws) <= n:
                grams = [" ".join(ws)] if ws else []
            else:
                grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
            out.append([
                int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                for g in dict.fromkeys(grams)
            ])
        return pd.Series(out)

    return _shingle_hashes.asNondeterministic()
