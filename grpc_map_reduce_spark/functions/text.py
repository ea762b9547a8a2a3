"""Text expression helpers — all JVM-side Column expressions.

Tokenization contract (FIXTURES.md): the reference splits text on
every non-letter rune (``unicode.IsLetter``, mapper.go:181).  We pin
the ASCII interpretation ``[^a-zA-Z]+`` (fixtures are ASCII word
soup); divergence on non-ASCII letters is documented, not silently
different — Go's IsLetter accepts all Unicode letter categories while
this regex splits on them.

Everything here returns a ``Column`` so expressions stay inside
whole-stage codegen — no Python UDFs on the tokenize path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Split pattern — one-or-more non-ASCII-letter characters.
TOKEN_SPLIT_RE = "[^a-zA-Z]+"


def tokens(text: Column | str, *, lowercase: bool = True) -> Column:
    """``array<string>`` of word tokens of ``text`` (may contain '')."""
    col = F.col(text) if isinstance(text, str) else text
    if lowercase:
        col = F.lower(col)
    return F.split(col, TOKEN_SPLIT_RE)


def words(text: Column | str, *, lowercase: bool = True) -> Column:
    """Like :func:`tokens` but with empty strings removed.

    ``split`` emits '' at the string boundaries when the text starts /
    ends with a separator; the reference's tokenizer simply never
    emits those (mapper.go:179-189), so filter them out.
    """
    return F.filter(tokens(text, lowercase=lowercase), lambda w: w != F.lit(""))


def shingles(text: Column | str, n: int = 3, *, lowercase: bool = True) -> Column:
    """``array<string>`` of word ``n``-gram shingles (distinct not applied).

    Built with ``transform`` over token indices — stays JVM-side.
    Documents shorter than ``n`` words yield a single shingle of all
    their words (never an empty array for non-empty text).
    """
    ws = words(text, lowercase=lowercase)
    n_sh = F.greatest(F.size(ws) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n_sh - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(ws, i + F.lit(1), F.lit(n))),
    )
