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
    return _rows_to_df(spark, rows)


def _rows_to_df(spark, rows: list[dict]):
    """createDataFrame with ragged-dict normalization AND a type for
    all-null vars: a var that is None for every host (YAML ``some_var:``
    placeholder) defeats schema inference — type it string explicitly
    instead of crashing ingestion."""
    from pyspark.sql import functions as F

    norm = _normalize_rows(rows)
    if not norm:
        raise ValueError("no hosts to build a DataFrame from (empty host_vars)")
    all_none = [k for k in norm[0] if all(r[k] is None for r in norm)]
    if not all_none:
        return spark.createDataFrame(norm)
    df = spark.createDataFrame([{k: v for k, v in r.items() if k not in all_none} for r in norm])
    for k in all_none:
        df = df.withColumn(k, F.lit(None).cast("string"))
    return df.select(*norm[0].keys())


def _normalize_rows(rows: list[dict]) -> list[dict]:
    """Give every row the union of keys (missing → None) so schema inference
    never sees ragged dicts — hosts rarely define identical var sets."""
    all_keys: list[str] = []
    for r in rows:
        for k in r:
            if k not in all_keys:
                all_keys.append(k)
    return [{k: r.get(k) for k in all_keys} for r in rows]


def _load_yaml(path: str) -> dict:
    import yaml

    with open(path, encoding="utf-8") as fh:
        data = yaml.safe_load(fh)
    return data or {}


def _dir_vars(base: str, name: str) -> dict:
    """Vars for one group/host name under a group_vars/ or host_vars/ dir:
    ``<base>/<name>.{yml,yaml,json}`` first-hit, else every file inside a
    ``<base>/<name>/`` directory merged in filename order (the Ansible
    layout both reference and docs describe)."""
    import os

    for ext in ("yml", "yaml", "json"):
        p = os.path.join(base, f"{name}.{ext}")
        if os.path.isfile(p):
            return _load_yaml(p)
    d = os.path.join(base, name)
    if os.path.isdir(d):
        layers = [
            _load_yaml(os.path.join(d, f))
            for f in sorted(os.listdir(d))
            if f.rsplit(".", 1)[-1] in ("yml", "yaml", "json")
        ]
        return merge_vars(*layers)
    return {}


def _parse_ini_inventory(text: str) -> dict:
    """Minimal Ansible INI inventory → the hosts.yml tree shape: sections
    ``[group]`` (host lines with inline ``k=v`` vars), ``[group:vars]``,
    ``[group:children]``. Ungrouped leading hosts land in ``ungrouped``.
    Values parse as YAML scalars (so ``x=3`` is an int, like Ansible)."""
    import shlex

    import yaml

    def scalar(v: str):
        return yaml.safe_load(v)

    groups: dict[str, dict] = {}

    def g(name: str) -> dict:
        return groups.setdefault(name, {"hosts": {}, "children": {}, "vars": {}})

    section, mode = "ungrouped", "hosts"
    for raw in text.splitlines():
        # whole-line comments only — Ansible's INI parser does not strip
        # '#'/';' mid-line, and doing so corrupts values like pass="p#ss"
        line = raw.strip()
        if not line or line.startswith(("#", ";")):
            continue
        if line.startswith("[") and line.endswith("]"):
            name = line[1:-1]
            if name.endswith(":vars"):
                section, mode = name[: -len(":vars")], "vars"
            elif name.endswith(":children"):
                section, mode = name[: -len(":children")], "children"
            else:
                section, mode = name, "hosts"
            g(section)
            continue
        if mode == "vars":
            k, _, v = line.partition("=")
            g(section)["vars"][k.strip()] = scalar(v.strip())
        elif mode == "children":
            g(section)["children"][line] = None  # resolved below
        else:
            parts = shlex.split(line)
            hv = {}
            for p in parts[1:]:
                k, _, v = p.partition("=")
                hv[k] = scalar(v)
            g(section)["hosts"][parts[0]] = hv or None

    # nest children under their parents; everything else under all.children
    nested = set()
    for name, node in groups.items():
        node["children"] = {
            c: groups.get(c) or {"hosts": {}} for c in node["children"]
        }
        nested.update(node["children"])
    top = {name: node for name, node in groups.items() if name not in nested and name != "all"}
    all_node = groups.get("all", {"hosts": {}, "children": {}, "vars": {}})
    all_node.setdefault("children", {}).update(top)
    tree = {"all": all_node}

    # a cyclic children graph leaves every group of the cycle "nested" and
    # therefore unreachable from the top — its hosts would silently vanish.
    # Ansible rejects cyclic inventories; so do we.
    reachable: set[str] = set()

    def reach(name: str, node: dict | None) -> None:
        if name in reachable:
            return
        reachable.add(name)
        for c, cn in ((node or {}).get("children") or {}).items():
            reach(c, cn)

    reach("all", all_node)
    lost = sorted(set(groups) - reachable)
    if lost:
        raise ValueError(
            f"cyclic group membership in inventory: group(s) {lost} are only "
            "reachable through their own descendants"
        )
    return tree


def load_inventory(spark, inventory_dir: str, key: str = "conv_id", extra_vars: dict | None = None):
    """Parse an Ansible-style inventory layout into the defaults dim table
    feeding merge_defaults() — the ingestion path for the reference's
    AnsibleInventory source (/root/reference/schema_enforcer/
    ansible_inventory.py:13-58: InventoryManager + VariableManager +
    Templar).

    Layout::

        <inventory_dir>/
          hosts.yml          # group tree: {all: {children: {g: {hosts: ...}}}}
          group_vars/        # <group>.yml or <group>/<files>.yml
          host_vars/         # <host>.yml  or <host>/<files>.yml

    Precedence (low → high), the documented Ansible merge order restricted
    to what the reference consumes: for each of the host's groups ordered
    ancestors-first (siblings alphabetical, 'all' always first) the
    inventory-file ``vars:`` block then the group_vars/ files; then the
    inline host vars from the hosts file; then host_vars/ files; then
    ``extra_vars`` (the reference's run-time extra_vars, highest). Jinja
    templates render to a fixpoint afterwards (Templar analogue).

    Driver-side only — an inventory is dim-sized by construction; the
    returned DataFrame broadcasts through merge_defaults at any corpus
    scale."""
    import os

    from schema_enforcer_spark.manifest import find_manifest_file

    if os.path.isfile(inventory_dir):
        # the reference's `-i inventory.ini` form: a file path; group_vars/
        # host_vars live next to it
        hosts_file, inventory_dir = inventory_dir, os.path.dirname(inventory_dir)
    else:
        try:
            hosts_file = find_manifest_file(os.path.join(inventory_dir, "hosts"))
        except FileNotFoundError:
            ini = [
                p
                for p in (os.path.join(inventory_dir, n) for n in ("hosts.ini", "inventory.ini", "hosts"))
                if os.path.isfile(p)
            ]
            if not ini:
                raise
            hosts_file = ini[0]
    if hosts_file.endswith((".yml", ".yaml", ".json")):
        tree = _load_yaml(hosts_file)
    else:
        with open(hosts_file, encoding="utf-8") as fh:
            tree = _parse_ini_inventory(fh.read())

    # walk the group tree: host → [(depth, group)], groups may repeat via
    # multiple memberships; inline vars collected per group and per host
    group_vars_inline: dict[str, dict] = {}
    host_inline: dict[str, dict] = {}
    host_groups: dict[str, list[tuple[int, str]]] = {}

    def walk(name: str, node: dict | None, depth: int, stack: tuple[str, ...] = ()) -> None:
        if name in stack:
            # Ansible itself rejects cyclic group graphs; without this guard
            # a [a:children] b / [b:children] a inventory recurses forever
            raise ValueError(
                f"cyclic group membership in inventory: {' -> '.join((*stack, name))}"
            )
        node = node or {}
        group_vars_inline.setdefault(name, {}).update(node.get("vars") or {})
        for host, hv in sorted((node.get("hosts") or {}).items()):
            host_inline.setdefault(host, {}).update(hv or {})
            host_groups.setdefault(host, [])
            if (depth, name) not in host_groups[host]:
                host_groups[host].append((depth, name))
        for child, cnode in sorted((node.get("children") or {}).items()):
            walk(child, cnode, depth + 1, (*stack, name))
            # membership in a child implies membership in this group
            for host in list(host_groups):
                if any(g == child for _, g in host_groups[host]) and not any(
                    g == name for _, g in host_groups[host]
                ):
                    host_groups[host].append((depth, name))

    for top, node in sorted(tree.items()):
        walk(top, node, 0 if top == "all" else 1)

    gv_dir = os.path.join(inventory_dir, "group_vars")
    hv_dir = os.path.join(inventory_dir, "host_vars")
    rows = []
    for host in sorted(host_groups):
        ordered = sorted(
            set(host_groups[host]), key=lambda dg: (dg[0], dg[1] != "all", dg[1])
        )
        layers: list[dict] = []
        for _, g in ordered:
            layers.append(group_vars_inline.get(g, {}))
            layers.append(_dir_vars(gv_dir, g))
        layers.append(host_inline.get(host, {}))
        layers.append(_dir_vars(hv_dir, host))
        layers.append(extra_vars or {})
        merged = render_templates(merge_vars(*layers))
        rows.append({key: host, **merged})
    if not rows:
        raise ValueError(f"no hosts found in inventory {inventory_dir}")
    return _rows_to_df(spark, rows)
