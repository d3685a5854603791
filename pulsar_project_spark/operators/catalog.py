"""Catalog operators — the reference's tool/op catalog joins.

The reference keeps tool and memory-op catalogs as dicts and resolves
every call with a dict lookup or a linear scan across servers
(``manager.py:216-250``, ``memory.py:210-217``). All of them are
single-key equi-joins against catalog-sized relations → broadcast hash
joins in Spark: the fact side streams, the catalog ships to every
executor, no shuffle of the big side. That is exactly the join shape that
survives 100 TB (the catalog stays KBs regardless of data scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference extension map (task.py:140-155) with its default 'txt'
# (task.py:156). Behavioral data, kept verbatim for parity.
EXTENSION_MAP: dict[str, str] = {
    "plan": "md", "guide": "md", "tutorial": "md", "recipe": "md",
    "article": "md", "report": "md", "manual": "md",
    "novel": "txt", "note": "txt", "journal": "txt", "poem": "txt",
    "story": "txt", "dialogue": "txt",
}
EXTENSION_DEFAULT = "txt"


def extension_lookup(spark: SparkSession, df: DataFrame, type_col: str,
                     mapping: dict[str, str] | None = None,
                     default: str = EXTENSION_DEFAULT) -> DataFrame:
    """content_type → extension with default (task.py:138-156),
    reproducing ``dict.get(key, 'txt')`` as a literal ``create_map``
    expression: map access returns NULL on miss, coalesced to the
    default. A constant 15-entry dict should be an EXPRESSION, not a
    join — this folds into whole-stage codegen with zero shuffle, zero
    broadcast, and no per-call driver→JVM DataFrame conversion (the
    earlier broadcast-join form paid ~2.5 s of createDataFrame +
    broadcast-exchange + join codegen on first call for the same
    answer). Use a real broadcast join only when the mapping is itself
    a table that doesn't fit in a literal plan."""
    mapping = EXTENSION_MAP if mapping is None else mapping
    pairs: list = []
    for k, v in sorted(mapping.items()):
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    return df.withColumn(
        "ext", F.coalesce(m[F.lower(F.col(type_col))], F.lit(default))
    )


def kv_lookup(kv: DataFrame, keys: DataFrame, key_col: str = "key",
              value_col: str = "value") -> DataFrame:
    """Point lookup with miss message (memory.py:257-261), planned so
    the STORE side streams even when it is the 100 TB relation:

    1. broadcast **semi-join** the tiny probe keys against the store
       (LeftSemi + BuildRight is a supported broadcast shape, so the
       hint actually takes — an outer join with the keys on the
       preserved side cannot broadcast-build the key side, the hint
       would be silently ignored and the store fully shuffled);
    2. outer-join the ≤|keys|-row hit set back to the keys (both sides
       tiny — AQE broadcasts it) to materialize the reference's
       "Cannot find any value associated to key '<k>' in memory data."
       text on misses."""
    hits = kv.join(F.broadcast(keys.select(key_col)), key_col, "left_semi")
    joined = keys.join(hits, key_col, "left")
    miss = F.concat(
        F.lit("Cannot find any value associated to key '"),
        F.col(key_col),
        F.lit("' in memory data."),
    )
    return joined.withColumn("result", F.coalesce(F.col(value_col), miss)).drop(value_col)
