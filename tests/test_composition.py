"""Manifest include/compose ($ref-inlining analogue), exact regex format,
pydantic batch validation (X3), decorator-style applies_to binding (J3),
inventory vars merge + Jinja templating (S6)."""

from __future__ import annotations

import os
import re
import tempfile
import textwrap

import pytest

from schema_enforcer_spark.binding import ManifestRegistry
from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.manifest import InvalidManifest, load_manifest, manifest_from_dict


def _write(dirname: str, name: str, content: str) -> str:
    p = os.path.join(dirname, name)
    with open(p, "w", encoding="utf-8") as fh:
        fh.write(textwrap.dedent(content))
    return p


def test_manifest_include_inlines_fragments(spark, transcripts):
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, "common_rules.yml", """
            columns: [conv_id, turn_idx]
            rules:
              - kind: required
                column: conv_id
              - kind: unique
                columns: [conv_id, turn_idx]
        """)
        main = _write(tmp, "main.yml", """
            id: schemas/with_includes
            table: transcripts
            include: [common_rules.yml]
            rules:
              - kind: enum
                column: role
                values: [system, user, assistant, tool]
        """)
        m = load_manifest(main)
        assert [r.kind for r in m.rules] == ["required", "unique", "enum"]
        assert set(m.columns) == {"conv_id", "turn_idx"}
        # two manifests sharing the fragment stay independently valid
        other = _write(tmp, "other.yml", """
            id: schemas/other
            include: [common_rules.yml]
            rules:
              - kind: required
                column: role
        """)
        m2 = load_manifest(other)
        assert [r.kind for r in m2.rules] == ["required", "unique", "required"]
        # meta-validation still fail-fasts after inlining
        bad = _write(tmp, "bad.yml", """
            id: schemas/bad
            include: [common_rules.yml]
            rules:
              - kind: nonsense
        """)
        with pytest.raises(InvalidManifest):
            load_manifest(bad)


def test_manifest_include_diamond_inlines_once(spark):
    """A includes B and C, both include common.yml — the shared fragment's
    rules must appear ONCE (per-path inlining would duplicate them and
    double every violation count)."""
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, "common.yml", """
            rules:
              - kind: required
                column: conv_id
        """)
        _write(tmp, "b.yml", """
            include: [common.yml]
            rules:
              - kind: required
                column: role
        """)
        _write(tmp, "c.yml", """
            include: [common.yml]
            rules:
              - kind: required
                column: text
        """)
        main = _write(tmp, "a.yml", """
            id: schemas/diamond
            include: [b.yml, c.yml]
            rules: []
        """)
        m = load_manifest(main)
        kinds_cols = [(r.kind, r.params.get("column")) for r in m.rules]
        assert kinds_cols == [
            ("required", "conv_id"),
            ("required", "role"),
            ("required", "text"),
        ], f"shared fragment duplicated: {kinds_cols}"


def test_manifest_include_cycle_fails_fast(spark):
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, "a.yml", "include: [b.yml]\nrules: []\n")
        _write(tmp, "b.yml", "include: [a.yml]\nrules: []\n")
        main = _write(tmp, "main.yml", "id: schemas/c\ninclude: [a.yml]\nrules:\n  - kind: required\n    column: x\n")
        with pytest.raises(InvalidManifest, match="cycle"):
            load_manifest(main)


def test_regex_format_is_exact(spark):
    """The regex format must agree with re.compile on pathological patterns —
    the structural approximation accepted 'a{2,1}' (balanced brackets,
    invalid quantifier)."""
    cases = ["a{2,1}", "[", "(?P<n>x)", "^ok(a|b)*$", "*", "a**", "(?<invalid", None, "\\"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "id bigint, pat string")
    m = manifest_from_dict(
        {"id": "s/re", "table": "t", "rules": [{"kind": "format", "column": "pat", "format": "regex"}]}
    )
    eng = ValidationEngine(m, key_columns=["id"], instance_expr="'t'")
    failed = {int(v["absolute_path"][0]) for v in eng.violations(df).collect()}
    expected = set()
    for i, c in enumerate(cases):
        if c is None:
            continue
        try:
            re.compile(c)
        except re.error:
            expected.add(i)
    assert failed == expected


def test_pydantic_batch_validator(spark, transcripts):
    pydantic = pytest.importorskip("pydantic")
    from schema_enforcer_spark.plugins import PydanticBatchValidator, run_validator
    from schema_enforcer_spark.synth import inject

    class Turn(pydantic.BaseModel):
        role: str = pydantic.Field(pattern="^(system|user|assistant|tool)$")
        turn_idx: int = pydantic.Field(ge=0)

    v = PydanticBatchValidator(Turn, key_columns=["conv_id", "turn_idx"])
    bad = inject(transcripts, "invalid_enum")
    viols = run_validator(bad, v).collect()
    assert len(viols) == 1
    assert viols[0]["schema_id"] == "pydantic/Turn"
    assert "role" in viols[0]["absolute_path"]
    assert "match" in viols[0]["message"].lower()  # pydantic's own pattern message
    assert run_validator(transcripts, v).count() == 0
    with pytest.raises(TypeError):
        PydanticBatchValidator(dict)


def test_pydantic_validator_array_column(spark):
    """An array-typed column must not crash the NaN filter (`v == v` on an
    ndarray raises 'truth value of an array is ambiguous')."""
    pydantic = pytest.importorskip("pydantic")
    from schema_enforcer_spark.plugins import PydanticBatchValidator, run_validator

    class Doc(pydantic.BaseModel):
        doc_id: int = pydantic.Field(ge=0)
        tags: list[str] = pydantic.Field(max_length=2)

    df = spark.createDataFrame(
        [(1, ["a"]), (2, ["a", "b", "c"]), (-3, ["x"])],
        "doc_id long, tags array<string>",
    )
    v = PydanticBatchValidator(Doc, key_columns=["doc_id"])
    viols = run_validator(df, v).collect()
    cols = {r["absolute_path"][-1] for r in viols}
    assert "tags" in cols and "doc_id" in cols
    assert len(viols) == 2


def test_applies_to_decorator_binding(spark):
    m1 = manifest_from_dict(
        {
            "id": "schemas/decorated",
            "table": "anything",
            "applies_to": ["transcripts", "events"],
            "rules": [{"kind": "required", "column": "some_col_not_in_df"}],
        }
    )
    m2 = manifest_from_dict(
        {"id": "schemas/plain", "rules": [{"kind": "required", "column": "other_col"}]}
    )
    reg = ManifestRegistry([m1, m2])
    # no column overlap, but applies_to names the table → binds
    bound = reg.bind(columns=["conv_id"], table="transcripts", use_automap=False)
    assert [m.id for m in bound] == ["schemas/decorated"]
    assert reg.bind(columns=["conv_id"], table="orders", use_automap=False) == []


def test_inventory_vars_merge_and_templating(spark):
    from schema_enforcer_spark.sources.defaults import inventory_defaults, merge_defaults, merge_vars, render_templates

    group = {"site": "nyc", "dns": "{{ site }}-dns-01", "nested": {"a": 1, "b": 2}}
    host = {"dns": "{{ site }}-dns-99", "nested": {"b": 3}}
    merged = merge_vars(group, host)
    assert merged["nested"] == {"a": 1, "b": 3}  # host wins, deep merge
    rendered = render_templates(merged)
    assert rendered["dns"] == "nyc-dns-99"  # host override, template resolved
    import jinja2
    with pytest.raises(jinja2.UndefinedError):
        render_templates({"x": "{{ missing }}"})

    dim = inventory_defaults(
        spark,
        {"conv-1": {"tool": "{{ site }}-tool"}, "conv-2": {}},
        group_vars={"site": "sfo", "tool": "default-tool"},
    )
    df = spark.createDataFrame([("conv-1", None), ("conv-2", "explicit")], "conv_id string, tool string")
    out = {r["conv_id"]: r["tool"] for r in merge_defaults(df, dim, keys=["conv_id"]).collect()}
    assert out == {"conv-1": "sfo-tool", "conv-2": "explicit"}


def test_load_inventory_layout_precedence(spark, tmp_path):
    """Ansible-layout ingestion (reference ansible_inventory.py:13-58):
    group_vars/host_vars directory precedence + inline inventory vars +
    Jinja rendering, ending in the merge_defaults dim-table shape (q30)."""
    import os

    from schema_enforcer_spark.sources.defaults import load_inventory, merge_defaults

    inv = tmp_path / "inventory"
    (inv / "group_vars").mkdir(parents=True)
    (inv / "host_vars" / "conv-c").mkdir(parents=True)
    (inv / "hosts.yml").write_text(
        "all:\n"
        "  vars:\n"
        "    region: global\n"
        "    dns: '{{ site }}-dns'\n"
        "  children:\n"
        "    dc1:\n"
        "      hosts:\n"
        "        conv-a:\n"
        "          rack: r1\n"
        "        conv-b:\n"
        "    dc2:\n"
        "      hosts:\n"
        "        conv-c:\n"
    )
    (inv / "group_vars" / "all.yml").write_text("tool: default_tool\nsite: hq\n")
    (inv / "group_vars" / "dc1.yml").write_text("site: east\n")
    (inv / "host_vars" / "conv-a.yml").write_text("tool: special\n")
    # dir-form host_vars: files merge in filename order (later wins)
    (inv / "host_vars" / "conv-c" / "01_base.yml").write_text("tool: c1\nextra: x\n")
    (inv / "host_vars" / "conv-c" / "02_override.yml").write_text("tool: c2\n")

    dim = load_inventory(spark, str(inv), key="conv_id")
    rows = {r["conv_id"]: r.asDict() for r in dim.collect()}

    assert set(rows) == {"conv-a", "conv-b", "conv-c"}
    a, b, c = rows["conv-a"], rows["conv-b"], rows["conv-c"]
    # host_vars file > group_vars; child group_vars > group_vars/all
    assert a["tool"] == "special" and a["site"] == "east"
    # inline hosts-file vars survive; Jinja renders against the MERGED vars
    assert a["rack"] == "r1" and a["dns"] == "east-dns"
    # sibling host without overrides: group chain only
    assert b["tool"] == "default_tool" and b["site"] == "east" and b["dns"] == "east-dns"
    # dc2 host: no dc1 leakage; dir-form host_vars merge in filename order
    assert c["site"] == "hq" and c["dns"] == "hq-dns"
    assert c["tool"] == "c2" and c["extra"] == "x"
    # 'all' inventory vars reach every host
    assert all(r["region"] == "global" for r in rows.values())

    # extra_vars (run-time) win over everything, like the reference's
    # AnsibleInventory(extra_vars=...)
    dim2 = load_inventory(spark, str(inv), key="conv_id", extra_vars={"tool": "forced"})
    assert {r["tool"] for r in dim2.collect()} == {"forced"}

    # the q30 shape: dim table feeds merge_defaults, row value wins
    df = spark.createDataFrame(
        [("conv-a", None), ("conv-b", "explicit")], "conv_id string, tool string"
    )
    out = {r["conv_id"]: r["tool"] for r in merge_defaults(df, dim, keys=["conv_id"]).collect()}
    assert out == {"conv-a": "special", "conv-b": "explicit"}

    # a hostless inventory fails loud
    empty = tmp_path / "empty_inv"
    empty.mkdir()
    (empty / "hosts.yml").write_text("all:\n  children: {}\n")
    with pytest.raises(ValueError, match="no hosts"):
        load_inventory(spark, str(empty))


def test_load_inventory_ini_form(spark, tmp_path):
    """INI inventory (the reference example's `-i inventory.ini` form,
    cli.py:252-254): [group] host lines with inline vars, [group:vars],
    [group:children]; loader also accepts the FILE path directly."""
    from schema_enforcer_spark.sources.defaults import load_inventory

    inv = tmp_path / "ini_inv"
    (inv / "group_vars").mkdir(parents=True)
    (inv / "inventory.ini").write_text(
        "[spines]\n"
        "spine1 rack=r1 mtu=9000\n"
        "spine2\n"
        "\n"
        "[leafs]\n"
        "leaf1\n"
        "\n"
        "[dc1:children]\n"
        "spines\n"
        "leafs\n"
        "\n"
        "[dc1:vars]\n"
        "site = east\n"
        "[all:vars]\n"
        "dns = '{{ site }}-dns'\n"
    )
    (inv / "group_vars" / "spines.yml").write_text("role: spine\n")

    dim = load_inventory(spark, str(inv), key="host")
    rows = {r["host"]: r.asDict() for r in dim.collect()}
    assert set(rows) == {"spine1", "spine2", "leaf1"}
    assert rows["spine1"]["rack"] == "r1" and rows["spine1"]["mtu"] == 9000  # YAML scalar
    assert rows["spine1"]["role"] == "spine" and rows["leaf1"].get("role") is None
    # [dc1:vars] reach hosts through the children nesting; Jinja renders
    assert all(r["site"] == "east" and r["dns"] == "east-dns" for r in rows.values())

    # file-path form (the reference's -i flag shape)
    dim2 = load_inventory(spark, str(inv / "inventory.ini"), key="host")
    assert dim2.count() == 3


def test_load_inventory_cyclic_children_raises(spark, tmp_path):
    """A cyclic group graph must fail loudly (Ansible rejects these too),
    not recurse forever."""
    from schema_enforcer_spark.sources.defaults import load_inventory

    inv = tmp_path / "cyc"
    inv.mkdir()
    (inv / "inventory.ini").write_text(
        "[a]\nh1\n\n[a:children]\nb\n\n[b:children]\na\n"
    )
    with pytest.raises(ValueError, match="cyclic group membership"):
        load_inventory(spark, str(inv / "inventory.ini"), key="host")


def test_load_inventory_hash_in_values_and_all_null_var(spark, tmp_path):
    """'#'/';' are comment starts only at line start (Ansible semantics) —
    values containing them survive; a var that is null for EVERY host gets
    an explicit string type instead of crashing schema inference."""
    from schema_enforcer_spark.sources.defaults import load_inventory

    inv = tmp_path / "inv"
    (inv / "group_vars").mkdir(parents=True)
    (inv / "inventory.ini").write_text(
        "# full-line comment\n"
        "[web]\n"
        'web1 ansible_password="p#ss" token=ab;cd\n'
    )
    (inv / "group_vars" / "all.yml").write_text("placeholder:\n")  # YAML null
    dim = load_inventory(spark, str(inv / "inventory.ini"), key="host")
    [row] = dim.collect()
    assert row["ansible_password"] == "p#ss"
    assert row["token"] == "ab;cd"
    assert row["placeholder"] is None
    assert dict(dim.dtypes)["placeholder"] == "string"


def test_inventory_defaults_empty_hosts_raises(spark):
    """Empty host_vars used to die with a bare IndexError inside
    _rows_to_df (round-4 advisory) — now a clear ValueError."""
    import pytest

    from schema_enforcer_spark.sources.defaults import inventory_defaults

    with pytest.raises(ValueError, match="no hosts"):
        inventory_defaults(spark, group_vars={"all": {"x": 1}}, host_vars={})
