"""Defaults/overrides merge — the Ansible group_vars/host_vars precedence
analogue (SURVEY.md §2.1 S6: /root/reference/schema_enforcer/
ansible_inventory.py:13-58 merges group defaults under host overrides).

At table grain: per-conversation defaults LEFT JOIN onto rows, row value
wins via coalesce — one broadcast join when the defaults table is
dim-sized, column-pruned to only the defaulted columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_defaults(
    df: DataFrame,
    defaults: DataFrame,
    keys: list[str],
    broadcast: bool = True,
) -> DataFrame:
    """For every non-key column the defaults table shares with *df*, fill
    NULL row values from the matching defaults row (row value has
    precedence — host_vars over group_vars). Default columns absent from
    *df* are appended as new columns."""
    shared = [c for c in defaults.columns if c not in keys]
    aliased = defaults.select(
        *keys, *[F.col(c).alias(f"__dflt_{c}") for c in shared]
    )
    right = F.broadcast(aliased) if broadcast else aliased
    out = df.join(right, on=keys, how="left")
    for c in shared:
        if c in df.columns:
            out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__dflt_{c}")))
        else:
            out = out.withColumn(c, F.col(f"__dflt_{c}"))
    return out.drop(*[f"__dflt_{c}" for c in shared])
