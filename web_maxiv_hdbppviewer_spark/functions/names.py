"""Attribute-name expression helpers.

The reference builds a 5-part attribute name ``cs/domain/family/member/name``
with string formatting (reference server.py:83-84) and splits it back with
``rsplit("/", 4)`` (reference hdbpp.py:90-92); lookups lower-case the name
first (reference data.py:92). All of it is plain column expressions here -
never a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def attr_full_name(*parts: Column | str) -> Column:
    """Join name parts with '/' (reference server.py:83-84)."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws("/", *cols)


def attr_control_system(full_name: Column | str) -> Column:
    """First '/'-separated component (reference hdbpp.py:90-92 inverse)."""
    c = F.col(full_name) if isinstance(full_name, str) else full_name
    return F.split_part(c, F.lit("/"), F.lit(1))


def attr_normalized(name: Column | str) -> Column:
    """Lower-cased lookup key (reference data.py:92)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.lower(c)
