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


def merge_vars(*layers: dict) -> dict:
    """Driver-side precedence merge of vars mappings — later layers win
    (host_vars over group_vars over defaults), nested dicts merge
    recursively: the Ansible inventory precedence analogue
    (/root/reference/schema_enforcer/ansible_inventory.py:13-42)."""
    out: dict = {}
    for layer in layers:
        for k, v in (layer or {}).items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = merge_vars(out[k], v)
            else:
                out[k] = v
    return out


def render_templates(vars: dict, max_passes: int = 5) -> dict:
    """Resolve Jinja2 templates in string values against the merged vars —
    the templated-defaults step the reference's inventory source performs
    (ansible_inventory.py:43-58). Values may reference other vars
    ('{{ site }}-dns'); rendering iterates to a fixpoint (chained
    references), capped at *max_passes*. Unknown variables raise, matching
    Ansible's StrictUndefined behavior."""
    import jinja2

    env = jinja2.Environment(undefined=jinja2.StrictUndefined)

    def render_value(v, ctx):
        if isinstance(v, str) and ("{{" in v or "{%" in v):
            return env.from_string(v).render(**ctx)
        if isinstance(v, dict):
            return {k: render_value(x, ctx) for k, x in v.items()}
        if isinstance(v, list):
            return [render_value(x, ctx) for x in v]
        return v

    cur = dict(vars)
    for _ in range(max_passes):
        nxt = {k: render_value(v, cur) for k, v in cur.items()}
        if nxt == cur:
            return nxt
        cur = nxt
    return cur


def inventory_defaults(spark, host_vars: dict[str, dict], group_vars: dict | None = None, key: str = "conv_id"):
    """Build a defaults dim table from per-host vars layered over group
    vars, templates rendered — feed the result to merge_defaults(). One
    driver-side dict pass; the table is dim-sized by construction."""
    rows = []
    for host, hv in sorted(host_vars.items()):
        merged = render_templates(merge_vars(group_vars or {}, hv))
        rows.append({key: host, **merged})
    return spark.createDataFrame(rows)
