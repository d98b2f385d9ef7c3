"""spark-submit entry point.

Packaging (north_rule: ``spark-submit --py-files`` on a multi-executor
cluster)::

    cd /root/repo && zip -qr /tmp/sev.zip schema_enforcer_spark
    spark-submit --py-files /tmp/sev.zip schema_enforcer_spark/cli.py \
        --manifest manifests/transcripts_base.yml \
        --input /data/transcripts \
        --output /data/validation_results \
        --checkpoint /data/validation_lineage \
        --ref-table conversations=/data/conversations

Behavior mirrors the reference CLI (/root/reference/schema_enforcer/cli.py:49-107):
validate everything the manifest binds, print FAIL lines + a green summary,
exit 1 iff any violation exists. Adds: resumable checkpoint skip and
violations/verdicts written to parquet sinks.
"""

from __future__ import annotations

import argparse
import sys


# Spark/Hive partition-path escaping (ExternalCatalogUtils.escapePathName):
# these characters are %-hex-escaped in partition DIRECTORY names, and a null
# partition value becomes the Hive default sentinel. Deleting a partition dir
# by its raw value would miss any escaped name.
_HIVE_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^\x7f') | {chr(c) for c in range(0x20)}
_HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def escape_partition_value(value: str | None) -> str:
    if value is None or value == "":
        return _HIVE_DEFAULT_PARTITION
    return "".join(f"%{ord(c):02X}" if c in _HIVE_ESCAPE_CHARS else c for c in value)


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="schema-enforcer-spark")
    p.add_argument(
        "--manifest",
        default=None,
        help="YAML/JSON constraint manifest, or a DIRECTORY of manifests — "
        "a directory automaps every manifest against the input's columns "
        "and validates each one that binds (the reference `validate` "
        "command's all-schemas semantics, cli.py:75-96). Required for "
        "every mode except --infer-manifest",
    )
    p.add_argument(
        "--diff-manifests",
        nargs=2,
        default=None,
        metavar=("OLD", "NEW"),
        help="diff two manifest versions and classify every change as "
        "RELAXED / TIGHTENED / CHANGED; exit 0 when the new version is "
        "backward-compatible (only relaxations — all data valid under OLD "
        "stays valid), 1 otherwise. Driver-side only, no Spark session",
    )
    p.add_argument(
        "--infer-manifest",
        default=None,
        metavar="OUT.yml",
        help="profile --input (two jobs: one full scan + one candidate "
        "pass) and write a DRAFT constraint manifest — type/required/"
        "enum/range/length rules plus unique key candidates — then exit. "
        "The draft encodes the strictest constraints the data already "
        "satisfies; edit before enforcing",
    )
    p.add_argument("--infer-id", default="schemas/inferred", help="manifest id for --infer-manifest")
    p.add_argument(
        "--infer-enum-max",
        type=int,
        default=16,
        help="--infer-manifest: max distinct values for an enum rule",
    )
    p.add_argument(
        "--infer-fds",
        action="store_true",
        help="--infer-manifest: also discover single-column functional "
        "dependencies (two extra jobs, quadratic HLL sketch count in the "
        "column count — intended for manifest-width tables)",
    )
    p.add_argument(
        "--profile",
        action="store_true",
        help="print the two-job column profile of --input (rows, nulls, "
        "~distinct, type, min/max or length bounds, detected format, enum "
        "candidates) and exit — the inspection half of --infer-manifest, "
        "no manifest needed",
    )
    p.add_argument("--input", default=None, help="input parquet path (not needed with --selftest/--generate-invalid)")
    p.add_argument(
        "--inventory",
        default=None,
        metavar="DIR",
        help="Ansible inventory directory as the input: hosts' merged+"
        "rendered vars become the rows, validated as [HOST] instances "
        "(the reference `ansible` command, cli.py:227-265)",
    )
    p.add_argument(
        "--limit",
        default=None,
        metavar="HOST",
        help="with --inventory: restrict validation to one host "
        "(reference ansible --limit)",
    )
    p.add_argument(
        "--automap",
        action="store_true",
        help="with --inventory: bind manifests to hosts PER HOST by "
        "intersecting each host's (non-null) vars with every manifest's "
        "columns — --manifest may be a directory; hosts with none of a "
        "manifest's properties are skipped for it (the reference ansible "
        "automap, ansible_inventory.py:107-141)",
    )
    p.add_argument("--output", default=None, help="results root; writes <output>/violations and <output>/verdicts")
    p.add_argument(
        "--quarantine",
        default=None,
        metavar="DIR",
        help="one-pass row-grain split of the input: rows failing any ROW "
        "rule land under DIR/row_valid=false, clean rows under "
        "DIR/row_valid=true (single scan, zero shuffle — partitionBy on "
        "the validity flag). Table-grain rules (unique/referential/window/"
        "aggregate) don't mark individual rows here; their violations go "
        "to --output as usual",
    )
    p.add_argument(
        "--max-violations-per-rule",
        type=int,
        default=None,
        metavar="N",
        help="cap the violations SINK at N rows per (rule, instance) — a "
        "systematically-broken rule over 10^12 rows would otherwise write "
        "a violations table LARGER than the input. Verdicts, rule "
        "summaries, and the exit code keep exact counts; only the "
        "persisted violation rows are sampled (deterministically: first N "
        "by path+message within each rule x instance)",
    )
    p.add_argument("--checkpoint", default=None, help="lineage dir for resumable runs")
    p.add_argument("--ref-table", action="append", default=[], metavar="NAME=PATH", help="referential-rule reference tables")
    p.add_argument("--key-columns", default="conv_id,turn_idx")
    p.add_argument("--instance-expr", default=None)
    p.add_argument("--show-failures", type=int, default=20, help="max FAIL lines printed")
    p.add_argument(
        "--show-pass",
        action="store_true",
        help="also print PASS lines for passing instances "
        "(mirror of the reference's --show-pass, cli.py:28, printed at :101)",
    )
    p.add_argument(
        "--summary",
        action="store_true",
        help="print a per-rule summary (schema_id, violations, instances) after the FAIL lines",
    )
    p.add_argument(
        "--strict",
        action="store_true",
        help="force strict column checking even when the manifest doesn't "
        "set strict: true — undeclared input columns become violations "
        "(mirror of the reference's validate --strict, cli.py:34-41, which "
        "injects additionalProperties: false)",
    )
    p.add_argument("--master", default=None, help="override spark master (default: from spark-submit)")
    p.add_argument(
        "--show-checks",
        action="store_true",
        help="print which manifests bind to the input's columns and exit "
        "(mirror of the reference's --show-checks, cli.py:86-88)",
    )
    p.add_argument(
        "--write-baseline",
        action="store_true",
        help="compute and persist the drift-rule baseline histograms from "
        "--input to <checkpoint>/_drift_baselines.json, then exit "
        "(requires --checkpoint)",
    )
    p.add_argument(
        "--baseline",
        action="store_true",
        help="load stored drift baselines from <checkpoint>/"
        "_drift_baselines.json for drift rules without inline baselines",
    )
    p.add_argument(
        "--sample-fraction",
        type=float,
        default=None,
        metavar="F",
        help="audit mode: validate a deterministic sample of GROUPS — keep "
        "a row iff the md5 bucket of its first key column (e.g. whole "
        "conversations for conv_id,turn_idx) falls below F. Group grain "
        "keeps ordering/contiguity/uniqueness rules meaningful inside "
        "every sampled unit; same rows every run/engine for a given seed. "
        "Incompatible with --checkpoint: a sampled run must never mark a "
        "partition as validated",
    )
    p.add_argument(
        "--sample-seed",
        type=int,
        default=42,
        help="seed folded into the --sample-fraction md5 bucket",
    )
    p.add_argument(
        "--stats-columns",
        default=None,
        metavar="COL[,COL...]",
        help="with --checkpoint: persist per-partition column stats (HLL "
        "distinct sketches + null/row counts + min/max) for the partitions "
        "this run validates under <checkpoint>/_column_stats, then print "
        "TABLE-level stats merged across ALL runs — resumed runs never "
        "rescan validated partitions (sketches merge via hll_union_agg)",
    )
    p.add_argument(
        "--list-manifests",
        action="store_true",
        help="list the manifest(s) at --manifest (file or directory) and exit "
        "— the `schema --list` analogue (reference cli.py:111, "
        "manager.py print_schemas_list)",
    )
    p.add_argument(
        "--dump-manifest",
        action="store_true",
        help="print the include-resolved manifest(s) as JSON and exit; with "
        "--input, also print each compiled rule id + Catalyst expression "
        "— the `schema --dump` analogue (reference cli.py:120, "
        "manager.py dump_schema)",
    )
    p.add_argument(
        "--selftest",
        metavar="CORPUS_DIR",
        default=None,
        help="run the manifest's golden corpus (valid/ + invalid/) and exit — "
        "the `schema --check` analogue (manager.py:128-256)",
    )
    p.add_argument(
        "--generate-invalid",
        metavar="CORPUS_DIR",
        default=None,
        help="write results.json goldens for every invalid corpus case — "
        "the `schema --generate-invalid` analogue (manager.py:258-287)",
    )
    return p.parse_args(argv)


def _manifest_paths(path: str) -> list[str]:
    """All manifest files under a directory (sorted), or the single resolved
    file — the SchemaManager search-path analogue (reference
    schemas/manager.py:36-60 loads every schema under a directory tree)."""
    import glob
    import os

    from schema_enforcer_spark.manifest import find_manifest_file

    if os.path.isdir(path):
        return sorted(
            p
            for ext in ("yml", "yaml", "json")
            for p in glob.glob(os.path.join(path, "**", f"*.{ext}"), recursive=True)
        )
    return [find_manifest_file(path)]


def _schema_tools(args) -> int:
    """--list-manifests / --dump-manifest: pure driver-side manifest
    inspection (no Spark session unless --dump-manifest needs an --input
    schema to compile expressions against)."""
    import json
    import os

    from schema_enforcer_spark.manifest import InvalidManifest, load_manifest

    paths = _manifest_paths(args.manifest)
    loaded = []
    for p in paths:
        try:
            loaded.append((p, load_manifest(p)))
        except InvalidManifest as e:
            for err in e.errors:
                print(f"ERROR | invalid manifest | {p}: {err}", file=sys.stderr)
            return 1
    if not loaded:
        print("ERROR | no manifests found", file=sys.stderr)
        return 1

    if args.list_manifests:
        # reference print_schemas_list shape: ID / Type / Location / Filename,
        # with the cwd shortened to "." (manager.py:88-107)
        cwd = os.getcwd()
        print(f"{'Schema ID':<40} {'Type':<10} {'Location':<30} Filename")
        print("-" * 100)
        for p, m in loaded:
            loc = os.path.dirname(os.path.abspath(p)).replace(cwd, ".")
            print(f"{m.id:<40} {'manifest':<10} {loc:<30} {os.path.basename(p)}")
        return 0

    # --dump-manifest: include-resolved normalized JSON (the reference dumps
    # schema data with $refs resolved, manager.py:109-124)
    for _, m in loaded:
        print(
            json.dumps(
                {
                    "id": m.id,
                    "table": m.table,
                    "columns": list(m.columns),
                    "strict": m.strict,
                    "applies_to": list(m.applies_to),
                    "rules": [{"kind": r.kind, **r.params} for r in m.rules],
                },
                indent=2,
                default=str,
            )
        )
    if args.input:
        # debugging aid: the Catalyst expression each row rule compiled to
        # against the actual input schema (table rules print their kind/grain)
        from pyspark.sql import SparkSession

        from schema_enforcer_spark.compiler import compile_row_rules

        builder = SparkSession.builder.appName("schema-enforcer-spark:dump")
        if args.master:
            builder = builder.master(args.master)
        spark = builder.getOrCreate()
        df = spark.read.parquet(args.input)
        print("\nCompiled rules:")
        for _, m in loaded:
            for cr in compile_row_rules(df, m):
                print(f"  {cr.rule_id}: {str(cr.predicate)}")
            for r in m.table_rules:
                print(f"  {m.id}/{r.kind}: table-grain rule {json.dumps(r.params, default=str)}")
    return 0


def _automap_main(args) -> int:
    """--inventory --automap: per-host manifest binding, the reference
    `ansible` command's automap mode (ansible_inventory.py:107-141 +
    cli.py:227-265). Each manifest validates only the hosts that carry at
    least one of its properties; FAIL/[HOST] PASS lines per manifest;
    exit 1 on any failure."""
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import col as F_col

    from schema_enforcer_spark.binding import ManifestRegistry
    from schema_enforcer_spark.engine import ValidationEngine
    from schema_enforcer_spark.manifest import InvalidManifest, load_manifest
    from schema_enforcer_spark.sources.defaults import load_inventory

    if not args.inventory:
        print("ERROR | --automap requires --inventory", file=sys.stderr)
        return 2
    reg = ManifestRegistry()
    try:
        for p in _manifest_paths(args.manifest):
            reg.add(load_manifest(p))
    except InvalidManifest as e:
        for err in e.errors:
            print(f"ERROR | invalid manifest | {err}", file=sys.stderr)
        return 1
    builder = SparkSession.builder.appName("schema-enforcer-spark:automap")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    df = load_inventory(spark, args.inventory, key="host")
    if args.limit:
        df = df.filter(df["host"] == args.limit)
    bound = reg.automap_hosts(df, key="host")
    if not bound:
        print("ERROR | no manifest binds to any host's vars", file=sys.stderr)
        return 1
    any_fail = False
    for m, sub in bound:
        eng = ValidationEngine(m, key_columns=["host"], instance_expr="host", instance_type="HOST")
        report = eng.validate(sub)
        for v in report.violations.orderBy("message").limit(args.show_failures).collect():
            prop = ":".join(v["absolute_path"] or [])
            print(f"FAIL | [ERROR] {v['message']} [HOST] {v['instance_name']} [PROPERTY] {prop}")
        if args.show_pass:
            for p in (
                report.verdicts.filter(F_col("result") == "PASS")
                .orderBy("instance_name")
                .limit(args.show_failures)
                .collect()
            ):
                print(f"PASS | [{p['grain']}] {p['instance_name']} [SCHEMA ID] {p['schema_id']}")
        if not report.passes():
            any_fail = True
    if any_fail:
        return 1
    print("ALL SCHEMA VALIDATION CHECKS PASSED")
    return 0


def _infer_main(args) -> int:
    from pyspark.sql import SparkSession

    from schema_enforcer_spark.infer import write_inferred_manifest

    if not args.input:
        print("ERROR | --infer-manifest requires --input", file=sys.stderr)
        return 2
    builder = SparkSession.builder.appName("schema-enforcer-spark:infer")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    df = spark.read.parquet(args.input)
    draft = write_inferred_manifest(
        df, args.infer_id, args.infer_manifest,
        enum_max=args.infer_enum_max, fds=args.infer_fds,
    )
    kinds: dict[str, int] = {}
    for r in draft["rules"]:
        kinds[r["kind"]] = kinds.get(r["kind"], 0) + 1
    summary = ", ".join(f"{k}×{n}" for k, n in sorted(kinds.items()))
    print(f"inferred {len(draft['rules'])} rules over {len(df.columns)} columns ({summary})")
    print(f"draft manifest written to {args.infer_manifest} — review before enforcing")
    return 0


def _diff_main(args) -> int:
    from schema_enforcer_spark.evolution import compatible, diff_manifests
    from schema_enforcer_spark.manifest import load_manifest

    old_path, new_path = args.diff_manifests
    old, new = load_manifest(old_path), load_manifest(new_path)
    changes = diff_manifests(old, new)
    for c in changes:
        print(c.line())
    ok = compatible(old, new)
    n_breaking = sum(1 for c in changes if c.effect != "relaxed")
    print(
        f"{len(changes)} change(s), {n_breaking} breaking — "
        + ("backward-compatible" if ok else "NOT backward-compatible")
        + f" ({old.id} -> {new.id})"
    )
    return 0 if ok else 1


def _profile_main(args) -> int:
    from pyspark.sql import SparkSession

    from schema_enforcer_spark.infer import profile_for_inference

    if not args.input:
        print("ERROR | --profile requires --input", file=sys.stderr)
        return 2
    builder = SparkSession.builder.appName("schema-enforcer-spark:profile")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    df = spark.read.parquet(args.input)
    prof = profile_for_inference(df, enum_max=args.infer_enum_max)
    print(f"{'Column':<24} {'type':<10} {'rows':>10} {'nulls':>8} {'~distinct':>10}  detail")
    print("-" * 92)
    for c, p in prof.items():
        if p["jtype"] in ("integer", "number") and p["min"] is not None:
            detail = f"min={p['min']} max={p['max']}"
        elif p["jtype"] == "string" and p["format"]:
            detail = f"format={p['format']}"
        elif p["jtype"] == "string" and p["len_min"] is not None:
            detail = f"len {p['len_min']}..{p['len_max']}"
        else:
            detail = ""
        if p["enum_values"] is not None:
            vals = ", ".join(map(repr, p["enum_values"][:6]))
            more = "" if len(p["enum_values"]) <= 6 else f", +{len(p['enum_values']) - 6}"
            detail = (detail + f"  enum[{vals}{more}]").strip()
        print(
            f"{c:<24} {p['jtype'] or '-':<10} {p['n_rows']:>10} {p['n_nulls']:>8} "
            f"{p['approx_distinct']:>10}  {detail}"
        )
    if args.infer_fds:
        from schema_enforcer_spark.infer import infer_fds

        fds = infer_fds(df, max_determinant=2)
        if fds:
            print("\nfunctional dependencies (exact-confirmed, minimal):")
            for det, dep in fds:
                print(f"  ({', '.join(det)}) -> {dep}")
        else:
            print("\nno functional dependencies found")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    if args.diff_manifests:
        return _diff_main(args)
    if args.profile:
        return _profile_main(args)
    if args.infer_manifest:
        return _infer_main(args)
    if not args.manifest:
        print("ERROR | --manifest is required", file=sys.stderr)
        return 2
    if args.list_manifests or args.dump_manifest:
        return _schema_tools(args)
    if args.automap:
        return _automap_main(args)
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import col as F_col
    from pyspark.sql.functions import count as F_count
    from pyspark.sql.functions import coalesce as F_coalesce
    from pyspark.sql.functions import lit as F_lit

    from schema_enforcer_spark.checkpoint import CheckpointManager
    from schema_enforcer_spark.engine import ValidationEngine
    from schema_enforcer_spark.manifest import InvalidManifest, load_manifest

    import os as _os

    # --manifest DIR = the reference's `validate` semantics: EVERY schema
    # runs against every data unit it automaps to (cli.py:75-96 iterates
    # all instances × their matching schemas). Incremental checkpointing,
    # baselines, and the golden-corpus tools are single-manifest concerns.
    multi = _os.path.isdir(args.manifest)
    if multi and (
        args.checkpoint or args.write_baseline or args.baseline or args.selftest or args.generate_invalid
    ):
        print(
            "ERROR | --manifest DIR (multi-manifest automap) cannot be combined "
            "with --checkpoint/--write-baseline/--baseline/--selftest/"
            "--generate-invalid — run those per manifest",
            file=sys.stderr,
        )
        return 2
    try:
        if multi:
            manifests = [load_manifest(p) for p in _manifest_paths(args.manifest)]
            if not manifests:
                print(f"ERROR | no manifests under {args.manifest}", file=sys.stderr)
                return 1
        else:
            manifests = [load_manifest(args.manifest)]
    except InvalidManifest as e:
        # fail before any Spark job, like the reference's InvalidJSONSchema
        # exit (/root/reference/schema_enforcer/cli.py:66-68)
        for err in e.errors:
            print(f"ERROR | invalid manifest | {err}", file=sys.stderr)
        return 1

    if args.strict:
        # the reference's --strict rewrites every schema with
        # additionalProperties: false (validation.py via cli.py:34-41); here
        # the declared column set plays that role, so strict without one
        # would silently check nothing — fail loudly (single manifest) or
        # warn-and-skip (dir mode, where sibling manifests may still apply)
        import dataclasses

        no_columns = [m.id for m in manifests if not m.strict and not m.columns]
        if no_columns and not multi:
            print(
                "ERROR | --strict needs the manifest to declare 'columns' "
                "(the additionalProperties universe)",
                file=sys.stderr,
            )
            return 1
        if len(no_columns) == len(manifests) and all(not m.strict for m in manifests):
            print(
                "ERROR | --strict: no manifest declares 'columns' "
                "(the additionalProperties universe)",
                file=sys.stderr,
            )
            return 1
        for mid in no_columns:
            print(f"WARN | --strict skipped for {mid} (no 'columns' declared)", file=sys.stderr)
        strictened = []
        for m in manifests:
            if m.strict or not m.columns:
                strictened.append(m)
                continue
            # with --inventory the loader injects the 'host' key column —
            # it's part of the engine's plumbing, not an undeclared user var
            cols = (*m.columns, "host") if args.inventory and "host" not in m.columns else m.columns
            strictened.append(dataclasses.replace(m, strict=True, columns=cols))
        manifests = strictened
    manifest = manifests[0]

    builder = SparkSession.builder.appName(f"schema-enforcer-spark:{manifest.id}")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()

    eng_kw = dict(
        key_columns=[c for c in args.key_columns.split(",") if c],
        instance_expr=args.instance_expr,
    )
    if args.selftest or args.generate_invalid:
        from schema_enforcer_spark.engine import ValidationEngine as _VE
        from schema_enforcer_spark.selftest import generate_invalid, test_manifest

        eng = _VE(manifest, **eng_kw)
        if args.generate_invalid:
            written = generate_invalid(spark, eng, args.generate_invalid)
            print(f"wrote {len(written)} golden file(s)")
            return 0
        res = test_manifest(spark, eng, args.selftest)
        for case in res.passed:
            print(f"PASS | {case} [{manifest.id}]")
        for case, reason in res.failed:
            print(f"FAIL | {case} [{manifest.id}] {reason}")
        return 0 if res.ok else 1

    if args.inventory:
        from schema_enforcer_spark.sources.defaults import load_inventory

        df = load_inventory(spark, args.inventory, key="host")
        n_hosts = df.count()
        print(f"Found {n_hosts} hosts in the inventory")
        if args.limit:
            df = df.filter(df["host"] == args.limit)
            if df.count() == 0:
                # a typo'd --limit must not green-light a host that was
                # never checked (the reference ansible --limit errors on an
                # unmatched host pattern)
                print(f"ERROR | --limit {args.limit!r} matches no host in the inventory",
                      file=sys.stderr)
                return 2
        # hosts are the instances: HOST grain, host-keyed paths (reference
        # ansible command prints [HOST] lines, cli.py:227-265)
        if not eng_kw.get("instance_expr"):
            eng_kw["instance_expr"] = "host"
        eng_kw["key_columns"] = ["host"]
        eng_kw["instance_type"] = "HOST"
    elif not args.input:
        print("ERROR | --input is required", file=sys.stderr)
        return 2
    else:
        df = spark.read.parquet(args.input)
    if args.show_checks:
        from schema_enforcer_spark.binding import ManifestRegistry

        reg = ManifestRegistry(manifests)
        bound = reg.automap(df.columns)
        print(f"{'Instance':<40} Schema ID")
        print("-" * 80)
        print(f"{args.inventory or args.input:<40} {[m.id for m in bound]}")
        return 0
    ref_tables = {}
    for spec in args.ref_table:
        name, _, path = spec.partition("=")
        ref_tables[name] = spark.read.parquet(path)

    if args.write_baseline or args.baseline:
        from schema_enforcer_spark.stats import (
            baseline_store_path,
            load_drift_baselines,
            write_drift_baselines,
        )

        if not args.checkpoint:
            print("ERROR | --write-baseline/--baseline require --checkpoint "
                  "(baselines live under the checkpoint dir)", file=sys.stderr)
            return 2
        store = baseline_store_path(args.checkpoint)
        if args.write_baseline:
            written = write_drift_baselines(spark, df, manifest, store)
            print(f"wrote {len(written)} drift baseline(s) to {store}")
            return 0
        eng_kw["drift_baselines"] = load_drift_baselines(spark, store)

    if args.stats_columns and not args.checkpoint:
        print("ERROR | --stats-columns requires --checkpoint (the stats "
              "store lives under the checkpoint dir)", file=sys.stderr)
        return 2

    if args.sample_fraction is not None:
        if not (0.0 < args.sample_fraction <= 1.0):
            print(f"ERROR | --sample-fraction must be in (0, 1], got {args.sample_fraction}",
                  file=sys.stderr)
            return 2
        if args.quarantine:
            # --quarantine's contract is a COMPLETE row-grain split of the
            # input; run on the sampled subset it would silently overwrite
            # the quarantine dirs with a (1-F)-incomplete copy
            print("ERROR | --quarantine cannot be combined with "
                  "--sample-fraction (the quarantine split must cover every "
                  "input row, not an audit sample)", file=sys.stderr)
            return 2
        if args.checkpoint:
            # lineage from a sample would mark partitions PASS that were
            # only fractionally checked — permanently skipping real rows
            print("ERROR | --sample-fraction is an audit mode and cannot be "
                  "combined with --checkpoint", file=sys.stderr)
            return 2
        from schema_enforcer_spark.functions.sampling import split_bucket

        # sample at the GROUP grain (first key column): row-grain sampling
        # would puncture turn_idx sequences and misfire every ordering/
        # contiguity/uniqueness rule on perfectly clean data
        unit = eng_kw["key_columns"][0]
        # coalesce NULL keys to a sentinel group: split_bucket(NULL) is NULL
        # (md5 of NULL), and a NULL comparison filters the row out — rows
        # violating a required rule ON the key column would otherwise be
        # unsampleable even at fraction 1.0
        df = df.filter(
            split_bucket(
                F_coalesce(F_col(unit).cast("string"), F_lit("\x00NULL")),
                args.sample_seed,
            )
            < int(round(args.sample_fraction * 10000))
        )
        print(
            f"sampled validation: fraction={args.sample_fraction} seed={args.sample_seed} "
            f"(deterministic md5 buckets over {unit} groups)"
        )

    def _print_merged_stats() -> None:
        from schema_enforcer_spark.stats import merged_column_stats, stats_store_path

        merged = merged_column_stats(spark, stats_store_path(args.checkpoint)).orderBy("col_name")
        print(f"{'Column':<24} {'~distinct':>10} {'nulls':>10} {'rows':>12} {'parts':>6}  min..max")
        print("-" * 92)
        for r in merged.collect():  # one row per stats column — bounded
            lo = r["min_numeric"] if r["min_numeric"] is not None else r["min_display"]
            hi = r["max_numeric"] if r["max_numeric"] is not None else r["max_display"]
            print(
                f"{r['col_name']:<24} {r['approx_distinct']:>10} {r['n_nulls']:>10} "
                f"{r['n_rows']:>12} {r['n_partitions']:>6}  {lo}..{hi}"
            )

    if multi:
        from schema_enforcer_spark.binding import ManifestRegistry

        bound = ManifestRegistry(manifests).automap(df.columns)
        bound_ids = {b.id for b in bound}
        for m in manifests:
            if m.id not in bound_ids:
                print(f"WARN | manifest {m.id} shares no columns with the input — skipped")
        if not bound:
            print("ERROR | no manifest binds to the input's columns", file=sys.stderr)
            return 2
        engines = [ValidationEngine(m, **eng_kw) for m in bound]
        print(f"validating against {len(bound)} manifest(s): {sorted(bound_ids)}")
    else:
        engines = [ValidationEngine(manifest, **eng_kw)]
    eng = engines[0]

    if args.quarantine:
        # Row-grain quarantine: ONE scan of the full input, the validity
        # flag is a codegen expression (row_fail_count == 0), and
        # partitionBy splits the write — no shuffle, no second pass, no
        # driver data. At 100 TB this is the same cost as a copy of the
        # table. The flag column is 'row_valid' (NOT '_row_valid': Spark's
        # file index skips underscore-prefixed paths, so partition dirs
        # named _row_valid=... would be invisible to spark.read).
        if "row_valid" in df.columns:
            print("ERROR | --quarantine needs the column name 'row_valid' "
                  "but the input already has one", file=sys.stderr)
            return 2
        qroot = args.quarantine.rstrip("/")
        # multi-manifest: a row is quarantined iff it fails ANY bound
        # manifest's row rules — still one codegen expression, one pass
        total_fails = engines[0].row_fail_count(df)
        for e2 in engines[1:]:
            total_fails = total_fails + e2.row_fail_count(df)
        df.withColumn("row_valid", total_fails == F_lit(0)).write.mode(
            "overwrite"
        ).partitionBy("row_valid").parquet(qroot)
        # count via the written files' footers (partition column + count =
        # metadata-only aggregate, no data columns re-read). Partition-dir
        # values read back as STRINGS (partition type inference covers
        # numerics/dates, not booleans) — cast, or the True/False lookups
        # below silently print 0
        q_counts = {
            r["rv"]: r["n"]
            for r in spark.read.parquet(qroot)
            .groupBy(F_col("row_valid").cast("boolean").alias("rv"))
            .agg(F_count("*").alias("n"))
            .collect()
        }
        print(f"quarantine: {q_counts.get(True, 0)} valid row(s) -> {qroot}/row_valid=true")
        print(f"quarantine: {q_counts.get(False, 0)} violating row(s) -> {qroot}/row_valid=false")

    cm = None
    if args.checkpoint:
        cm = CheckpointManager(spark, args.checkpoint)
        # defer_record: lineage is appended only AFTER the --output writes
        # succeed — recording first would mark partitions complete whose
        # violation rows never landed (permanently absent from the output)
        report, n_pending = cm.run(df, eng, ref_tables, defer_record=True)
        if report is None:
            # sound because only PASS verdicts complete a partition: FAILed
            # partitions always re-validate, so nothing-pending ⇒ all PASS
            print(f"ALL PARTITIONS ALREADY VALIDATED (PASS) [{manifest.id}] — nothing pending")
            if args.stats_columns:
                # stats for every partition are already in the store — the
                # merged view costs one read of the sketch rows, zero data
                _print_merged_stats()
            return 0
        print(f"validated {n_pending} pending rows")
    else:
        if len(engines) > 1:
            # ONE scan for every bound manifest's row rules: each engine's
            # violation array rides a single projection and one explode
            # emits all manifests' rows (engine.validate_many) — the
            # per-engine path was M full scans of the input for row-local
            # work. Sinks/verdict logic below operate on the union; verdict
            # rows carry schema_id, so per-manifest results stay separable.
            from schema_enforcer_spark.engine import validate_many

            report = validate_many(engines, df, ref_tables)
        else:
            report = eng.validate(df, ref_tables)

    # the report fans out into several actions below (writes, lineage scan,
    # FAIL-line collect, passes(), counts) — each would otherwise re-run the
    # full pending-subset validation DAG from the scan up
    report.violations.persist()
    report.verdicts.persist()

    # the SINK view of violations: optionally capped per (rule, instance).
    # Verdicts/rule_summary/exit code keep reading the full persisted set —
    # counts stay exact; only what lands on disk is sampled.
    sink_violations = report.violations
    if args.max_violations_per_rule:
        from pyspark.sql.functions import row_number as F_row_number
        from pyspark.sql.window import Window as _Window

        _w = _Window.partitionBy("schema_id", "instance_name").orderBy("absolute_path", "message")
        sink_violations = (
            report.violations.withColumn("_rn", F_row_number().over(_w))
            .filter(F_col("_rn") <= args.max_violations_per_rule)
            .drop("_rn")
        )

    if args.output:
        root = args.output.rstrip("/")
        if args.checkpoint:
            # a resumed run covers only the PENDING subset, and a FAILed
            # partition re-validates on EVERY resume — plain append would
            # re-append its identical rows each retry (double-counting), and
            # dynamic partition overwrite alone leaves stale violations when
            # a partition goes FAIL→(now-empty) PASS. So: REPLACE exactly
            # this run's instance partitions — delete their subdirs (a
            # partition-count-sized driver op via the Hadoop FS API, any
            # filesystem), then append partitioned by instance_name. Dir
            # names use Spark's Hive path escaping — deleting the RAW
            # instance value would silently miss any name with ':'/'/'/'%'
            # etc. and re-append duplicates on every resume.
            insts = [r["instance_name"] for r in report.verdicts.select("instance_name").distinct().collect()]
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path
            fs = hpath(root).getFileSystem(spark._jsc.hadoopConfiguration())
            for sub in ("violations", "verdicts"):
                for inst in insts:
                    fs.delete(hpath(f"{root}/{sub}/instance_name={escape_partition_value(inst)}"), True)
            sink_violations.write.mode("append").partitionBy("instance_name").parquet(f"{root}/violations")
            report.verdicts.write.mode("append").partitionBy("instance_name").parquet(f"{root}/verdicts")
        else:
            sink_violations.write.mode("overwrite").parquet(f"{root}/violations")
            report.verdicts.write.mode("overwrite").parquet(f"{root}/verdicts")

    if cm is not None:
        if not args.output:
            # no output sink: materialize before recording so lineage never
            # claims unfinished work
            report.violations.count()
            report.verdicts.count()
        # lineage row counts come from the PENDING subset this run actually
        # validated — aggregating the full input would re-scan everything
        cm.record(cm.last_pending if cm.last_pending is not None else df, eng, report)

    if args.stats_columns:
        from schema_enforcer_spark.stats import stats_store_path, write_partition_stats

        cols = [c for c in args.stats_columns.split(",") if c]
        missing = [c for c in cols if c not in df.columns]
        if missing:
            print(f"ERROR | --stats-columns not in the input: {missing}", file=sys.stderr)
            return 2
        # sketch only what this run validated; earlier partitions' rows are
        # already in the store — that's the incremental contract
        stats_df = cm.last_pending if (cm is not None and cm.last_pending is not None) else df
        write_partition_stats(
            stats_df, cols, stats_store_path(args.checkpoint), eng._instance_col(stats_df)
        )
        _print_merged_stats()

    # FAIL-line format mirrors ValidationResult.print
    # (/root/reference/schema_enforcer/validation.py:53-91)
    failures = report.violations.orderBy("message").limit(args.show_failures).collect()
    for v in failures:
        # a NULL key column yields a NULL path element (cast preserves it);
        # print it as 'None' (py_repr parity) instead of crashing the join
        prop = ":".join(p if p is not None else "None" for p in (v["absolute_path"] or []))
        if v["instance_type"] == "HOST":
            # reference print_failed HOST form (validation.py:68): no
            # location prefix, just the hostname
            print(f"FAIL | [ERROR] {v['message']} [HOST] {v['instance_name']} [PROPERTY] {prop}")
        else:
            print(f"FAIL | [ERROR] {v['message']} [{v['instance_type']}] {v['instance_location']}/{v['instance_name']} [PROPERTY] {prop}")

    if args.show_pass:
        # reference print_passed (validation.py:82-91): PASS | [TYPE] name
        # [SCHEMA ID] id. Verdicts are partition-grain so the collect is
        # bounded by (#partitions × #schemas), capped like the FAIL lines.
        passed = (
            report.verdicts.filter(F_col("result") == "PASS")
            .orderBy("schema_id", "instance_name")
            .limit(args.show_failures)
            .collect()
        )
        for p in passed:
            # verdicts carry their own grain (TABLE for the synthetic
            # table-grain row, HOST/PARTITION for data rows) — no name
            # matching, so a host literally named 'table' labels correctly
            print(f"PASS | [{p['grain']}] {p['instance_name']} [SCHEMA ID] {p['schema_id']}")

    if args.summary:
        print(f"{'Rule':<60} {'Violations':>10} {'Instances':>10}")
        print("-" * 82)
        for r in report.rule_summary().collect():
            print(f"{r['schema_id']:<60} {r['n_violations']:>10} {r['n_instances']:>10}")

    any_fail = bool(failures) or not report.passes()
    n = report.violations.count() if any_fail else 0
    # release the fan-out caches — a long-lived session (tests, notebooks)
    # calling main() repeatedly must not accumulate persisted DataFrames
    report.violations.unpersist()
    report.verdicts.unpersist()
    report.unpersist()  # also releases validate_many's tagged parent cache
    ids = ", ".join(e.manifest.id for e in engines)
    if any_fail:
        print(f"{n} violation(s) [{ids}]")
        return 1
    print(f"ALL SCHEMA VALIDATION CHECKS PASSED [{ids}]")
    return 0


if __name__ == "__main__":
    # direct `python schema_enforcer_spark/cli.py` puts the package dir (not
    # its parent) on sys.path; under spark-submit --py-files the zip already
    # provides the package
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
