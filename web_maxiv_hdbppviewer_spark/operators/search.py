"""Catalog search operator (SURVEY F2/O1/O5, reference /attributes + /search).

The reference fetches the whole ~100k-attribute catalog and matches
client-side with a glob compiled to a case-insensitive regex
(``fnmatch.translate``, reference server.py:78-86); the Grafana variant
wraps the term as ``.*term.*`` (server.py:196-207). Two deliberate
hardenings over the reference, same spirit: the declared ``max`` cap is
parsed but never applied there (server.py:77) - we enforce it; and the
Grafana term is spliced into that regex UNESCAPED there (``a.c`` matches
``abc``; a malformed term raises) - our ``contains`` treats the term as
a literal substring.

Spark-first: glob patterns without classes compile to ``ILIKE`` (sargable,
pushes to the source); everything else becomes ``rlike`` over an upper-cased
column. The catalog is a small cached dimension - at 100k rows this filter
is a single-stage scan of a broadcast-sized table.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GLOB_SIMPLE = re.compile(r"^[\w/ .:*?-]*$")


def glob_to_like(pattern: str) -> str | None:
    """Translate a simple glob to a LIKE pattern, or None if not expressible."""
    if not _GLOB_SIMPLE.match(pattern):
        return None
    return (
        pattern.replace("\\", "\\\\")
        .replace("%", r"\%")
        .replace("_", r"\_")
        .replace("*", "%")
        .replace("?", "_")
    )


def search_names(
    df: DataFrame,
    pattern: str,
    name_col: str = "name",
    contains: bool = False,
    limit: int | None = 100,
) -> DataFrame:
    """Case-insensitive glob/substring search, sorted, capped.

    ``contains=True`` reproduces the Grafana ``.*term.*`` behavior.
    """
    name = F.col(name_col)
    if contains:
        cond = F.upper(name).contains(pattern.upper())
    else:
        like = glob_to_like(pattern)
        if like is not None:
            cond = F.upper(name).like(like.upper())
        else:
            import fnmatch

            # the reference FULLY matches: re.match anchors the start and
            # fnmatch.translate's \Z the end (server.py:78-86). Java's
            # rlike is find()-style, so without the explicit ^ a
            # class-glob like 'fam[12]' would also hit 'xfam1' via its
            # suffix - a silent superset of the reference's result
            cond = F.upper(name).rlike("^" + fnmatch.translate(pattern.upper()))
    out = df.where(cond).orderBy(name_col)
    # `is not None`, not truthiness (r19 review): limit=0 is a real cap
    # (zero rows) - the falsy check turned it into an UNCAPPED scan of
    # the whole catalog, the exact unbounded-response class the cap
    # exists to prevent; only None means "no cap"
    return out.limit(limit) if limit is not None else out
