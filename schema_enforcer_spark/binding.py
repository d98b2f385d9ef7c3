"""Data↔manifest binding (SURVEY.md §2.3 J1/J2/J5).

The reference binds data files to schemas three ways
(/root/reference/docs/mapping_data_files_to_schemas.md): automap on shared
top-level keys (instances/file.py:164-176), a static filename→schema-id map
(instances/file.py:38-44), and declared ids
(ansible_inventory.py:128-132 with SchemaNotDefined on unknown ids,
schemas/manager.py:289-299). At table grain the analogues are: column-set
intersection automap, a static table→manifest-ids map, and explicit
declared ids — all driver-side (binding a table to rule sets is a
planning-time concern, not a Spark job).
"""

from __future__ import annotations

from schema_enforcer_spark.manifest import Manifest


class ManifestNotDefined(Exception):
    """Declared manifest id is not registered (mirror of SchemaNotDefined,
    /root/reference/schema_enforcer/exceptions.py + manager.py:289-299)."""


def declared_columns(m: Manifest) -> set[str]:
    """A manifest's top-level property set: explicit `columns`, else every
    column any rule references (the top_level_properties analogue,
    reference schemas/jsonschema.py:44-55)."""
    declared = set(m.columns)
    if declared:
        return declared
    for r in m.rules:
        if r.get("column"):
            declared.add(r.get("column"))
        for key in ("columns", "group_by", "partition_by", "order_by"):
            declared.update(r.get(key) or [])
        # conditional rules reference columns inside when/then; aggregate
        # sides inside left/right specs
        for key in ("when", "then", "left", "right"):
            spec = r.get(key)
            if isinstance(spec, dict) and spec.get("column"):
                declared.add(spec["column"])
        if r.kind == "aggregate" and not r.get("group_by"):
            declared.add("conv_id")  # the engine's default group key
    return declared


class ManifestRegistry:
    """The SchemaManager analogue: id → Manifest
    (/root/reference/schema_enforcer/schemas/manager.py:23-53)."""

    def __init__(self, manifests: list[Manifest] | None = None):
        self._by_id: dict[str, Manifest] = {}
        for m in manifests or []:
            self.add(m)

    def add(self, manifest: Manifest) -> None:
        if manifest.id in self._by_id:
            raise ValueError(f"duplicate manifest id {manifest.id!r}")
        self._by_id[manifest.id] = manifest

    def get(self, manifest_id: str) -> Manifest:
        try:
            return self._by_id[manifest_id]
        except KeyError:
            raise ManifestNotDefined(
                f"manifest {manifest_id!r} is declared but not defined; known: {sorted(self._by_id)}"
            ) from None

    def ids(self) -> list[str]:
        return sorted(self._by_id)

    # -- binding mechanisms -------------------------------------------------

    def automap(self, columns: list[str]) -> list[Manifest]:
        """J1: a manifest binds iff its declared/ruled columns intersect the
        table's columns (the top-level-properties intersection automap,
        instances/file.py:173)."""
        cols = set(columns)
        out = [m for m in self._by_id.values() if declared_columns(m) & cols]
        return sorted(out, key=lambda m: m.id)

    def automap_hosts(self, df, key: str = "host"):
        """Per-HOST automap — the reference's ansible path intersects each
        host's var keys with every schema's top_level_properties
        (/root/reference/schema_enforcer/ansible_inventory.py:107-141), so
        two hosts can bind to different schemas. The wide inventory frame
        unions all hosts' vars (absent var = NULL), so "host has the key"
        becomes "column is non-null for that host's row": one filter per
        manifest, riding the scan — no shuffle, no per-host driver loop.

        Returns [(manifest, host_subset_df)] sorted by manifest id; a
        manifest sharing no column with the frame is omitted, and hosts
        with none of a manifest's properties are excluded from its subset
        (they get neither PASS nor FAIL for it, like the reference)."""
        from functools import reduce
        from operator import or_

        from pyspark.sql import functions as F

        out = []
        for mid in sorted(self._by_id):
            m = self._by_id[mid]
            cols = (declared_columns(m) & set(df.columns)) - {key}
            if not cols:
                continue
            pred = reduce(or_, [F.col(c).isNotNull() for c in sorted(cols)])
            out.append((m, df.filter(pred)))
        return out

    def bind(
        self,
        columns: list[str],
        table: str | None = None,
        static_map: dict[str, list[str]] | None = None,
        declared: list[str] | None = None,
        use_automap: bool = True,
    ) -> list[Manifest]:
        """Union of the four mechanisms, deduplicated — mirrors
        matches.update(...) accumulation (instances/file.py:145,176).
        J3 decorator mapping: a manifest whose ``applies_to`` names *table*
        binds regardless of column overlap (the reference's decorator marks
        a validator with the data it applies to, instances/file.py:122-145)."""
        chosen: dict[str, Manifest] = {}
        for mid in declared or []:
            m = self.get(mid)  # unknown declared id raises, like the reference
            chosen[m.id] = m
        if static_map and table and table in static_map:
            for mid in static_map[table]:
                m = self.get(mid)
                chosen[m.id] = m
        if table:
            for m in self._by_id.values():
                if table in m.applies_to:
                    chosen[m.id] = m
        if use_automap:
            for m in self.automap(columns):
                chosen[m.id] = m
        return [chosen[k] for k in sorted(chosen)]

    def validate_all(
        self,
        df,
        ref_tables=None,
        table: str | None = None,
        static_map: dict[str, list[str]] | None = None,
        declared: list[str] | None = None,
        **engine_kw,
    ):
        """Bind → validate with every applicable manifest → ONE unioned
        report (the reference's per-instance loop over matched schemas,
        /root/reference/schema_enforcer/instances/file.py:190-201, as a
        single unioned plan). Verdicts are per (manifest × partition)."""
        from schema_enforcer_spark.engine import ValidationEngine, validate_many

        manifests = self.bind(df.columns, table=table, static_map=static_map, declared=declared)
        if not manifests:
            raise ManifestNotDefined(f"no manifest binds to columns {df.columns}")
        # validate_many: every bound manifest's row rules share ONE scan
        # (single projection + one explode), one persisted violation set for
        # all consumers (the per-engine loop here was M scans and M leaked
        # caches); table-grain rules keep their own exchanges
        return validate_many([ValidationEngine(m, **engine_kw) for m in manifests], df, ref_tables)
