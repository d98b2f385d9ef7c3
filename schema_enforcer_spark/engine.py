"""ValidationEngine — evaluates a compiled manifest over a DataFrame.

Execution shape (SURVEY.md §4.2, all public DataFrame API — no custom
Catalyst rules needed):

1. **Single-pass row-rule projection**: one ``select`` that evaluates every
   row rule at once and emits ``array<struct>`` of violations, then
   ``explode``s the compacted array. N rules, ONE scan, whole-stage codegen.
   This is the distributed analogue of ``iter_errors`` emitting *all*
   errors per document (/root/reference/schema_enforcer/schemas/jsonschema.py:64-70)
   without the reference's per-schema re-walk loop
   (/root/reference/schema_enforcer/instances/file.py:193-199).
2. **Table-grain rules** (uniqueness, referential, ordering, aggregate)
   each compile to a groupBy / join / window plan — shuffles only on their
   keys; referential uses a broadcast-able distinct key set.
3. **Verdicts**: per-instance (partition) PASS/FAIL via one aggregation,
   right-outer against the partition universe so clean partitions still get
   a PASS row (default-PASS semantics, A4 —
   /root/reference/schema_enforcer/schemas/validator.py:39-44).

Violation-row schema mirrors the reference's ValidationResult
(/root/reference/schema_enforcer/validation.py:11-32).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from schema_enforcer_spark.compiler import CompiledRule, compile_row_rule, compile_row_rules, py_repr, _dtype_of
from schema_enforcer_spark.manifest import Manifest, Rule

VIOLATION_COLUMNS = [
    "schema_id",
    "result",
    "instance_name",
    "instance_location",
    "instance_type",
    "absolute_path",
    "failing_value",
    "message",
]

_VIOLATION_SCHEMA_DDL = (
    "schema_id string, result string, instance_name string, instance_location string, "
    "instance_type string, absolute_path array<string>, failing_value string, message string"
)


@dataclass
class ValidationReport:
    violations: DataFrame   # one row per (instance, rule, offending value)
    verdicts: DataFrame     # one row per instance: PASS/FAIL + n_violations
    # the frame actually persisted, when it differs from `violations` —
    # validate_many persists the manifest-tagged union and returns a
    # projection of it; unpersisting the projection would NOT release the
    # parent cache (Dataset.unpersist is per-plan, not per-lineage)
    cached: DataFrame | None = None

    def passes(self) -> bool:
        """Exit-code semantics: any FAIL ⇒ False
        (/root/reference/schema_enforcer/cli.py:104-107)."""
        return self.violations.limit(1).count() == 0

    def unpersist(self) -> None:
        """Release the cached violations (validate() persists them so the
        verdict aggregation doesn't recompute every rule)."""
        for frame in (self.violations, self.cached):
            if frame is None:
                continue
            try:
                frame.unpersist()
            except Exception:  # noqa: BLE001 - not cached / session gone
                pass

    def rule_summary(self) -> DataFrame:
        """Per-rule observability: (schema_id, n_violations, n_instances) —
        which constraints fire and how widely, straight off the persisted
        violation set (no rule re-evaluation)."""
        return (
            self.violations.groupBy("schema_id")
            .agg(
                F.count(F.lit(1)).alias("n_violations"),
                F.countDistinct("instance_name").alias("n_instances"),
            )
            .orderBy(F.col("n_violations").desc(), "schema_id")
        )


def _comparison(op: str, left: Column, right: Column) -> Column:
    # Operator set mirrors JmesPathModelValidation
    # (/root/reference/schema_enforcer/schemas/validator.py:70-86).
    if op == "gt":
        return left > right
    if op == "gte":
        return left >= right
    if op == "eq":
        return left == right
    if op == "lt":
        return left < right
    if op == "lte":
        return left <= right
    if op == "contains":
        return F.array_contains(left, right)
    raise ValueError(f"unknown comparison operator {op!r}")


def _agg_side(spec) -> Column:
    """Compile one side of an aggregate rule to an agg Column.

    Spec forms: a number/literal; or {"fn": count|count_distinct|sum|min|max|avg,
    "column": c, "filter": "<sql bool expr>", "scale": x} — the declarative
    analogue of the reference's compiled-JMESPath aggregates
    (/root/reference/tests/fixtures/test_validators/validators/check_interfaces.py:15-23).
    "scale" multiplies the aggregate, which is what makes RATIO constraints
    (the Deequ completeness / distinctness checks) declarative:
    null-rate <= 2%  ==  left {fn: count, filter: "c IS NULL"} lte
    right {fn: count, scale: 0.02}; both sides still ride ONE agg()."""
    if not isinstance(spec, dict):
        return F.lit(spec)
    fn = spec.get("fn", "count")
    col = F.col(spec["column"]) if spec.get("column") else F.lit(1)
    if flt := spec.get("filter"):
        col = F.when(F.expr(flt), col)
    if fn == "count":
        agg = F.count(col)
    elif fn == "count_distinct":
        agg = F.count_distinct(col)
    elif fn == "sum":
        agg = F.sum(col)
    elif fn == "min":
        agg = F.min(col)
    elif fn == "max":
        agg = F.max(col)
    elif fn == "avg":
        agg = F.avg(col)
    else:
        raise ValueError(f"unknown aggregate fn {fn!r}")
    if (scale := spec.get("scale")) is not None:
        agg = agg * F.lit(scale)
    return agg


class ValidationEngine:
    """Compile once on the driver, run as few Spark jobs as possible.

    Parameters
    ----------
    manifest : compiled rule set (``load_manifest`` output).
    key_columns : columns identifying a row for ``absolute_path``
        (default ``["conv_id", "turn_idx"]`` per input_hint).
    instance_expr : SQL expression string for the instance (partition) an
        offending row belongs to. Defaults to the ``partition_id`` column if
        present, else ``pmod(hash(conv_id), 32)`` — the Parquet-mode stand-in
        for Iceberg ``bucket(N, conv_id)`` partitioning (SURVEY.md §1.3).
    """

    def __init__(
        self,
        manifest: Manifest,
        key_columns: list[str] | None = None,
        instance_expr: str | None = None,
        num_buckets: int = 32,
        drift_baselines: dict[str, dict] | None = None,
        instance_type: str = "PARTITION",
    ):
        self.manifest = manifest
        self.key_columns = key_columns or ["conv_id", "turn_idx"]
        self.instance_expr = instance_expr
        self.num_buckets = num_buckets
        # violation-row instance grain label: "PARTITION" for table inputs,
        # "HOST" for the Ansible-inventory source (reference validation.py
        # prints [HOST] lines for inventory-validated instances)
        self.instance_type = instance_type
        # stored drift baselines (rule id → compute_histogram dict) — the
        # --write-baseline/--baseline lifecycle; inline rule baselines win
        self.drift_baselines = drift_baselines or {}
        # prepared-plan memo for _row_violation_array, keyed by input
        # DataFrame identity (see that method); (df, column) pairs — the df
        # reference pins the id() against reuse after GC
        self._row_arr_memo: dict[int, tuple[DataFrame, Column | None]] = {}
        # prepared-plan memo for violations()/verdicts() construction (see
        # violations() — lazy-plan manifests only, never eager rule kinds)
        self._plan_memo: dict[tuple, tuple] = {}

    # -- helpers -----------------------------------------------------------

    def _instance_col(self, df: DataFrame) -> Column:
        if self.instance_expr:
            return F.expr(self.instance_expr).cast("string")
        if "partition_id" in df.columns:
            return F.col("partition_id").cast("string")
        anchor = self.key_columns[0]
        if anchor in df.columns:
            return F.pmod(F.hash(F.col(anchor)), F.lit(self.num_buckets)).cast("string")
        return F.lit("0")

    def _path(self, df: DataFrame, leaf: str | None) -> Column:
        elems = [F.col(k).cast("string") for k in self.key_columns if k in df.columns]
        if leaf:
            # a dotted path is a struct traversal: one path element per level
            elems.extend(F.lit(p) for p in leaf.split("."))
        # Number→string coercion is required for violation-row parity
        # (coerce_numbers_to_str, /root/reference/schema_enforcer/validation.py:19).
        return F.array(*elems) if elems else F.array().cast("array<string>")

    def _wrap(self, df: DataFrame, schema_id: Column, path: Column, failing_value: Column, message: Column) -> list[Column]:
        return [
            schema_id.alias("schema_id"),
            F.lit("FAIL").alias("result"),
            self._instance_col(df).alias("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            path.alias("absolute_path"),
            failing_value.alias("failing_value"),
            message.alias("message"),
        ]

    # -- row rules ---------------------------------------------------------

    def _compile_conditionals(self, df: DataFrame) -> list[CompiledRule]:
        out = []
        def _branch(df, spec, label):
            """Compile one then/else branch spec → (inner_pred, msg,
            column_name, column)."""
            tc_name = spec["column"]
            tc = F.col(tc_name)
            dtype = _dtype_of(df, tc_name)
            rep = py_repr(tc, dtype)
            if spec.get("required"):
                inner, msg = tc.isNotNull(), F.lit(f"'{tc_name}' is a required property")
            elif spec.get("is_null"):
                inner, msg = tc.isNull(), F.concat(rep, F.lit(f" is not of type 'null'"))
            elif "pattern" in spec:
                inner = tc.isNull() | tc.rlike(spec["pattern"])
                msg = F.concat(rep, F.lit(f" does not match {spec['pattern']!r}"))
            elif "equals" in spec:
                inner = tc.eqNullSafe(F.lit(spec["equals"]))
                msg = F.concat(rep, F.lit(f" is not equal to {spec['equals']!r}"))
            else:
                raise ValueError(f"conditional '{label}' needs required/is_null/pattern/equals: {spec}")
            return inner, msg, tc_name, tc

        for rule in self.manifest.table_rules:
            if rule.kind != "conditional":
                continue
            when, then = rule.params["when"], rule.params["then"]
            wc = F.col(when["column"])
            if "equals" in when:
                cond = wc.eqNullSafe(F.lit(when["equals"]))
            elif "in" in when:
                cond = wc.isin(*when["in"])
            elif when.get("is_null"):
                cond = wc.isNull()
            else:
                raise ValueError(f"conditional 'when' needs equals/in/is_null: {when}")
            inner, msg, tc_name, tc = _branch(df, then, "then")
            # Draft-7 if/then/else: `otherwise` is the else-schema — applies
            # exactly when the `when` condition does NOT hold. message and
            # failing_value reflect whichever branch fired; absolute_path is
            # rule-static (the then-branch column) because the violation
            # projection builds paths at compile time.
            if other := rule.params.get("otherwise"):
                e_inner, e_msg, e_name, e_col = _branch(df, other, "otherwise")
                pred = F.when(cond, inner).otherwise(e_inner)
                msg = F.when(cond, msg).otherwise(e_msg)
                failing = F.when(cond, tc.cast("string")).otherwise(e_col.cast("string"))
                col_name = tc_name if tc_name == e_name else f"{tc_name}|{e_name}"
            else:
                pred = ~cond | inner
                failing = tc.cast("string")
                col_name = tc_name
            if m := rule.get("message"):
                msg = F.lit(m)
            out.append(
                CompiledRule(
                    rule_id=rule.get("id") or f"{self.manifest.id}/conditional/{col_name}",
                    column=tc_name,
                    predicate=pred,
                    message=msg,
                    failing_value=failing,
                )
            )
        return out

    def _items_violation_arrays(self, df: DataFrame) -> list[Column]:
        """Per-element nested validation (P12/P5 items): for each ``items``
        rule, ONE transform() over the array column emits an array of
        violation structs with the element index in absolute_path
        (["dns_servers","0","address"] — reference parity,
        /root/reference/tests/test_jsonschema.py:84-91). Rides the same
        single-pass projection as scalar row rules: no explode-join, no
        second scan, no Python."""
        from schema_enforcer_spark.compiler import _dtype_in, compile_check, has_column_path

        out: list[Column] = []
        for rule in self.manifest.row_rules:
            if rule.kind != "items":
                continue
            col_name = rule.params["column"]
            if not has_column_path(df, col_name):
                continue
            arr_dt = _dtype_of(df, col_name)
            if not isinstance(arr_dt, T.ArrayType):
                raise ValueError(f"items rule column {col_name!r} is {arr_dt.simpleString()}, not an array")
            field = rule.get("field")
            elem_dt = arr_dt.elementType
            target_dt = _dtype_in(elem_dt, field, []) if field else elem_dt
            check = rule.params["check"]
            label = (field or col_name).split(".")[-1]
            rid = rule.get("id") or f"{self.manifest.id}/items/{col_name}" + (f"/{field}" if field else "")
            custom_msg = rule.get("message")
            key_elems = [F.col(k).cast("string") for k in self.key_columns if k in df.columns]

            # Spark HOF lambdas must take exactly the declared arity with no
            # extra/default parameters — capture rule context via a factory
            # closure instead (fresh per loop iteration, so no late binding).
            def make_viol(_field, _check, _label, _rid, _cm, _tdt, _col, _keys, _rule):
                def viol(x, i):
                    elem = x
                    for part in (_field.split(".") if _field else []):
                        elem = elem[part]
                    pred, msg = compile_check(elem, _tdt, _check, _rule.get, _label)
                    if _cm:
                        msg = F.lit(_cm)
                    # 'required' anchors at the element object (jsonschema
                    # names the missing key, the path stops at the index)
                    path_tail = [] if _check in ("required",) else ([F.lit(p) for p in _field.split(".")] if _field else [])
                    path = F.array(*_keys, F.lit(_col), i.cast("string"), *path_tail)
                    return F.when(
                        ~F.coalesce(pred, F.lit(True)),
                        F.struct(
                            F.lit(_rid).alias("schema_id"),
                            path.alias("absolute_path"),
                            elem.cast("string").alias("failing_value"),
                            msg.alias("message"),
                        ),
                    )

                return viol

            viol = make_viol(field, check, label, rid, custom_msg, target_dt, col_name, key_elems, rule)

            # a NULL array must contribute an EMPTY violation array — concat()
            # with NULL would otherwise null out every other rule's violations
            # for the row
            empty = F.array().cast(
                "array<struct<schema_id:string,absolute_path:array<string>,failing_value:string,message:string>>"
            )
            arr = F.array_compact(F.transform(F.col(col_name), viol))
            out.append(F.when(F.col(col_name).isNull(), empty).otherwise(arr))
        return out

    def _prefix_items_violation_arrays(self, df: DataFrame) -> list[Column]:
        """Draft-7 TUPLE items (`items: [s0, s1, ...]` + additionalItems):
        element p checked against checks[p] (absent positions skip — Draft-7
        validates only what exists), and the tail past the prefix either
        rejected wholesale (additional_items: false — jsonschema emits ONE
        aggregate error naming every extra, was/were pluralized) or checked
        per element (additional_items: {check}). All positional checks ride
        one projection over the array column — element_at per position, no
        explode, no shuffle, same single-pass shape as the items rule."""
        from schema_enforcer_spark.compiler import compile_check, has_column_path, py_repr

        _VIOL_T = (
            "array<struct<schema_id:string,absolute_path:array<string>,"
            "failing_value:string,message:string>>"
        )
        out: list[Column] = []
        for rule in self.manifest.row_rules:
            if rule.kind != "prefix_items":
                continue
            col_name = rule.params["column"]
            if not has_column_path(df, col_name):
                continue
            arr_dt = _dtype_of(df, col_name)
            if not isinstance(arr_dt, T.ArrayType):
                raise ValueError(
                    f"prefix_items rule column {col_name!r} is {arr_dt.simpleString()}, not an array"
                )
            elem_dt = arr_dt.elementType
            checks = rule.params["checks"]
            add = rule.get("additional_items")
            rid = rule.get("id") or f"{self.manifest.id}/prefix_items/{col_name}"
            custom_msg = rule.get("message")
            key_elems = [F.col(k).cast("string") for k in self.key_columns if k in df.columns]
            col = F.col(col_name)
            n = len(checks)
            label = col_name.split(".")[-1]

            structs: list[Column] = []
            for p, spec in enumerate(checks):
                elem = F.element_at(col, p + 1)
                pred, msg = compile_check(elem, elem_dt, spec["kind"], spec.get, label)
                if custom_msg:
                    msg = F.lit(custom_msg)
                structs.append(
                    F.when(
                        (F.size(col) > p) & ~F.coalesce(pred, F.lit(True)),
                        F.struct(
                            F.lit(rid).alias("schema_id"),
                            F.array(*key_elems, F.lit(col_name), F.lit(str(p))).alias("absolute_path"),
                            elem.cast("string").alias("failing_value"),
                            msg.alias("message"),
                        ),
                    )
                )

            arrays = [F.array_compact(F.array(*structs))] if structs else []
            if add is False:
                extras = F.slice(col, n + 1, F.greatest(F.size(col) - n, F.lit(0)))
                reprs = F.array_join(
                    F.transform(extras, lambda x: py_repr(x, elem_dt)), ", "
                )
                add_msg = F.concat(
                    F.lit("Additional items are not allowed ("),
                    reprs,
                    F.when(F.size(col) - n == 1, F.lit(" was unexpected)")).otherwise(
                        F.lit(" were unexpected)")
                    ),
                )
                if custom_msg:
                    add_msg = F.lit(custom_msg)
                arrays.append(
                    F.array_compact(
                        F.array(
                            F.when(
                                F.size(col) > n,
                                F.struct(
                                    F.lit(rid).alias("schema_id"),
                                    # jsonschema anchors this error at the
                                    # array itself, not an index
                                    F.array(*key_elems, F.lit(col_name)).alias("absolute_path"),
                                    reprs.alias("failing_value"),
                                    add_msg.alias("message"),
                                ),
                            )
                        )
                    )
                )
            elif isinstance(add, dict):

                def make_tail_viol(_spec, _rid, _cm, _edt, _col, _keys, _n, _label):
                    def viol(x, i):
                        pred, msg = compile_check(x, _edt, _spec["kind"], _spec.get, _label)
                        if _cm:
                            msg = F.lit(_cm)
                        return F.when(
                            (i >= _n) & ~F.coalesce(pred, F.lit(True)),
                            F.struct(
                                F.lit(_rid).alias("schema_id"),
                                F.array(*_keys, F.lit(_col), i.cast("string")).alias("absolute_path"),
                                x.cast("string").alias("failing_value"),
                                msg.alias("message"),
                            ),
                        )

                    return viol

                tail = make_tail_viol(add, rid, custom_msg, elem_dt, col_name, key_elems, n, label)
                arrays.append(F.array_compact(F.transform(col, tail)))

            combined = arrays[0] if len(arrays) == 1 else F.concat(*arrays)
            empty = F.array().cast(_VIOL_T)
            out.append(F.when(col.isNull(), empty).otherwise(combined))
        return out

    def _pattern_properties_violation_arrays(self, df: DataFrame) -> list[Column]:
        """Draft-7 patternProperties over a MAP column (the reference's
        interface-name maps, examples/ansible/schema/schemas/
        interfaces.yml:9-16, validated through jsonschema patternProperties_
        draft3 in _validators.py): ONE transform() over map_entries() emits
        a violation struct per offending entry — entries whose key matches
        ``pattern`` get ``check`` applied to the value (or its ``field``);
        with ``additional_properties: false``, keys matching nothing are
        rejected with jsonschema's exact additionalProperties message. Same
        single-projection, zero-shuffle shape as the items rule."""
        from schema_enforcer_spark.compiler import _dtype_in, compile_check, has_column_path

        out: list[Column] = []
        for rule in self.manifest.row_rules:
            if rule.kind != "pattern_properties":
                continue
            col_name = rule.params["column"]
            if not has_column_path(df, col_name):
                continue
            map_dt = _dtype_of(df, col_name)
            if not isinstance(map_dt, T.MapType):
                raise ValueError(
                    f"pattern_properties rule column {col_name!r} is "
                    f"{map_dt.simpleString()}, not a map"
                )
            pattern = rule.params["pattern"]
            field = rule.get("field")
            check = rule.get("check")
            reject_extras = rule.get("additional_properties") is False
            val_dt = map_dt.valueType
            target_dt = _dtype_in(val_dt, field, []) if field else val_dt
            label = (field or col_name).split(".")[-1]
            rid = rule.get("id") or f"{self.manifest.id}/pattern_properties/{col_name}"
            custom_msg = rule.get("message")
            key_elems = [F.col(k).cast("string") for k in self.key_columns if k in df.columns]

            def make_viol(_field, _check, _label, _rid, _cm, _tdt, _col, _keys, _rule, _pat, _rej):
                def viol(e):
                    matched = e["key"].rlike(_pat)
                    branches = []
                    if _rej:
                        # jsonschema message parity (_validators.py
                        # additionalProperties: "Additional properties are
                        # not allowed ('%s' %s unexpected)")
                        branches.append(
                            (
                                ~matched,
                                F.struct(
                                    F.lit(_rid).alias("schema_id"),
                                    F.array(*_keys, F.lit(_col), e["key"]).alias("absolute_path"),
                                    e["key"].alias("failing_value"),
                                    F.concat(
                                        F.lit("Additional properties are not allowed ('"),
                                        e["key"],
                                        F.lit("' was unexpected)"),
                                    ).alias("message"),
                                ),
                            )
                        )
                    if _check is not None:
                        val = e["value"]
                        for part in (_field.split(".") if _field else []):
                            val = val[part]
                        # the rule's own `pattern` matches KEYS; a `pattern`
                        # value sub-check reads the dedicated value_pattern
                        # param (manifest meta-validation requires it)
                        if _check == "pattern":
                            vp = _rule.params["value_pattern"]
                            getter = lambda k, d=None: vp if k == "pattern" else _rule.get(k, d)  # noqa: E731
                        else:
                            getter = _rule.get
                        pred, msg = compile_check(val, _tdt, _check, getter, _label)
                        if _cm:
                            msg = F.lit(_cm)
                        path_tail = [] if _check in ("required",) else (
                            [F.lit(p) for p in _field.split(".")] if _field else []
                        )
                        branches.append(
                            (
                                matched & ~F.coalesce(pred, F.lit(True)),
                                F.struct(
                                    F.lit(_rid).alias("schema_id"),
                                    F.array(*_keys, F.lit(_col), e["key"], *path_tail).alias("absolute_path"),
                                    val.cast("string").alias("failing_value"),
                                    msg.alias("message"),
                                ),
                            )
                        )
                    expr = F.when(*branches[0])
                    for cond, struct in branches[1:]:
                        expr = expr.when(cond, struct)
                    return expr

                return viol

            viol = make_viol(
                field, check, label, rid, custom_msg, target_dt, col_name,
                key_elems, rule, pattern, reject_extras,
            )
            empty = F.array().cast(
                "array<struct<schema_id:string,absolute_path:array<string>,failing_value:string,message:string>>"
            )
            arr = F.array_compact(F.transform(F.map_entries(F.col(col_name)), viol))
            out.append(F.when(F.col(col_name).isNull(), empty).otherwise(arr))
        return out

    def _property_names_violation_arrays(self, df: DataFrame) -> list[Column]:
        """Draft-7 propertyNames over a MAP column (jsonschema
        _validators.py propertyNames: the sub-schema validates each KEY
        string): one transform() over map_keys() emits a violation per
        offending key, message straight from the compiled sub-check
        ("'ab' is too short" etc.). With pattern_properties and
        strict_columns this completes the object-keyword family;
        min/maxProperties is a `length` rule on the map (F.size counts
        entries)."""
        from schema_enforcer_spark.compiler import compile_check, has_column_path

        out: list[Column] = []
        for rule in self.manifest.row_rules:
            if rule.kind != "property_names":
                continue
            col_name = rule.params["column"]
            if not has_column_path(df, col_name):
                continue
            map_dt = _dtype_of(df, col_name)
            if not isinstance(map_dt, T.MapType):
                raise ValueError(
                    f"property_names rule column {col_name!r} is "
                    f"{map_dt.simpleString()}, not a map"
                )
            check = rule.params["check"]
            rid = rule.get("id") or f"{self.manifest.id}/property_names/{col_name}"
            custom_msg = rule.get("message")
            key_elems = [F.col(k).cast("string") for k in self.key_columns if k in df.columns]

            def make_viol(_check, _rid, _cm, _col, _keys, _rule):
                def viol(k):
                    pred, msg = compile_check(k, T.StringType(), _check, _rule.get, _col)
                    if _cm:
                        msg = F.lit(_cm)
                    return F.when(
                        ~F.coalesce(pred, F.lit(True)),
                        F.struct(
                            F.lit(_rid).alias("schema_id"),
                            F.array(*_keys, F.lit(_col), k).alias("absolute_path"),
                            k.alias("failing_value"),
                            msg.alias("message"),
                        ),
                    )

                return viol

            viol = make_viol(check, rid, custom_msg, col_name, key_elems, rule)
            empty = F.array().cast(
                "array<struct<schema_id:string,absolute_path:array<string>,failing_value:string,message:string>>"
            )
            arr = F.array_compact(F.transform(F.map_keys(F.col(col_name)), viol))
            out.append(F.when(F.col(col_name).isNull(), empty).otherwise(arr))
        return out

    def row_fail_count(self, df: DataFrame) -> Column:
        """Number of row rules the row fails — the streaming-verdict
        building block (windowed sum of this = per-window fail count)."""
        compiled = compile_row_rules(df, self.manifest) + self._compile_conditionals(df)
        flags = [(~F.coalesce(cr.predicate, F.lit(True))).cast("int") for cr in compiled]
        flags.extend(F.size(arr) for arr in self._items_violation_arrays(df))
        flags.extend(F.size(arr) for arr in self._prefix_items_violation_arrays(df))
        flags.extend(F.size(arr) for arr in self._pattern_properties_violation_arrays(df))
        flags.extend(F.size(arr) for arr in self._property_names_violation_arrays(df))
        if not flags:
            return F.lit(0)
        out = flags[0]
        for f_ in flags[1:]:
            out = out + f_
        return out

    def _row_violation_array(self, df: DataFrame) -> Column | None:
        """Every row rule's violations for one row as ONE
        ``array<struct{schema_id, absolute_path, failing_value, message}>``
        column — the single-pass building block shared by
        :meth:`row_violations` (single manifest) and :func:`validate_many`
        (multi-manifest fused scan). None when the manifest has no row
        rules.

        The built Column is memoized per input-DataFrame identity:
        assembling it costs hundreds of driver↔JVM round trips (~0.2-0.3 s
        for a 10-20-rule manifest — measured r7, a third of the whole
        validate() wall time on a warm 2.3M-row input) and depends only on
        the manifest and the input's schema, so re-validating the same
        DataFrame (multiple report consumers, repeated CLI tables, bench
        trials) shouldn't rebuild it. This is plan PREPARATION reuse only —
        the expression is lazy, so every action still computes from the
        input; no data or results are cached. Keyed by id(df) with the df
        pinned in the entry (never by schema alone: compiled pieces may
        hold df-bound attribute references, which don't transfer to a
        different DataFrame of the same shape)."""
        memo_key = id(df)
        hit = self._row_arr_memo.get(memo_key)
        if hit is not None and hit[0] is df:
            return hit[1]
        compiled = compile_row_rules(df, self.manifest) + self._compile_conditionals(df)
        item_arrays = (
            self._items_violation_arrays(df)
            + self._prefix_items_violation_arrays(df)
            + self._pattern_properties_violation_arrays(df)
            + self._property_names_violation_arrays(df)
        )
        if not compiled and not item_arrays:
            combined = None
        else:
            structs = [
                F.when(
                    ~F.coalesce(cr.predicate, F.lit(True)),
                    F.struct(
                        F.lit(cr.rule_id).alias("schema_id"),
                        self._path(df, cr.column).alias("absolute_path"),
                        cr.failing_value.alias("failing_value"),
                        cr.message.alias("message"),
                    ),
                )
                for cr in compiled
            ]
            arrays = ([F.array_compact(F.array(*structs))] if structs else []) + item_arrays
            combined = arrays[0] if len(arrays) == 1 else F.concat(*arrays)
        if len(self._row_arr_memo) >= 8:  # bounded: drop the oldest entry
            self._row_arr_memo.pop(next(iter(self._row_arr_memo)))
        self._row_arr_memo[memo_key] = (df, combined)
        return combined

    def row_violations(self, df: DataFrame) -> DataFrame | None:
        combined = self._row_violation_array(df)
        if combined is None:
            return None
        exploded = (
            df.select(
                self._instance_col(df).alias("instance_name"),
                combined.alias("_v"),
            )
            # explode_OUTER + a post-generate null filter, NOT a plain
            # explode: with explode, InferFiltersFromGenerate injects a
            # `size(_v) > 0` filter that predicate pushdown then sinks
            # BELOW the projection, re-inlining the entire violation-array
            # expression (and every expensive input it references — json
            # parses, array builds) into a second full per-row evaluation
            # (r7: q19's pushed filter rebuilt its array ~20x per row).
            # explode_outer keeps empty arrays (one NULL row each) so no
            # filter is inferred; the null filter runs on the generate
            # OUTPUT — a cheap IsNotNull on a materialized struct — and
            # cannot be pushed below the Generate. Result multiset is
            # identical: _v is never NULL (every branch yields an array),
            # so outer only adds the null rows the filter removes.
            .select("instance_name", F.explode_outer("_v").alias("v"))
            .filter(F.col("v").isNotNull())
        )
        return exploded.select(
            F.col("v.schema_id").alias("schema_id"),
            F.lit("FAIL").alias("result"),
            F.col("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            F.col("v.absolute_path").alias("absolute_path"),
            F.col("v.failing_value").alias("failing_value"),
            F.col("v.message").alias("message"),
        )

    # -- table rules -------------------------------------------------------

    def _unique_violations(self, df: DataFrame, rule: Rule) -> DataFrame:
        # Output contract (shared with the fused-window path so adding or
        # removing an unrelated ordering/contiguous rule never changes a
        # unique rule's violations): ONE row per duplicated key, message
        # "(<key>) appears N times; (<cols>) must be unique". instance_name
        # is min() over the group — F.first() would be nondeterministic when
        # a duplicated key spans instances.
        cols = rule.params["columns"]
        rid = rule.get("id") or f"{self.manifest.id}/unique/{'+'.join(cols)}"
        key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        dups = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_n"), F.min(self._instance_col(df)).alias("instance_name"))
            .filter(F.col("_n") > 1)
        )
        msg = rule.get("message")
        message = (
            F.lit(msg)
            if msg
            else F.concat(
                F.lit("("), key_str, F.lit(f") appears "), F.col("_n").cast("string"),
                F.lit(f" times; ({', '.join(cols)}) must be unique"),
            )
        )
        return dups.select(
            F.lit(rid).alias("schema_id"),
            F.lit("FAIL").alias("result"),
            F.col("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            F.array(*[F.col(c).cast("string") for c in cols]).alias("absolute_path"),
            key_str.alias("failing_value"),
            message.alias("message"),
        )

    def _referential_violations(self, df: DataFrame, rule: Rule, ref_tables: dict[str, DataFrame]) -> DataFrame:
        # CheckPeers-style referential check via left-anti join
        # (/root/reference/tests/fixtures/test_validators/validators/check_peers.py:54-82
        # rebuilt as a distributed anti-join, SURVEY.md §2.3 J4).
        cols = rule.params["columns"]
        ref_name, ref_cols = rule.params["ref_table"], rule.params["ref_columns"]
        if ref_name not in ref_tables:
            raise KeyError(f"referential rule needs ref table {ref_name!r} in ref_tables")
        rid = rule.get("id") or f"{self.manifest.id}/referential/{'+'.join(cols)}"
        # normalize_keys: '-'↔'_' key normalization before the join (F1 —
        # the reference normalizes hostnames both ways before its peer
        # lookup, check_peers.py:44-51); without it referential rules on
        # messy string keys silently miss matches
        if rule.get("normalize_keys", False):
            from schema_enforcer_spark.functions.textops import normalize_key

            def _k(c):  # noqa: E306
                return normalize_key(F.col(c).cast("string"))
        else:
            def _k(c):  # noqa: E306
                return F.col(c)

        ref_keys = ref_tables[ref_name].select(
            *[_k(rc).alias(c) for rc, c in zip(ref_cols, cols)]
        ).dropDuplicates()
        # Distinct fact keys first: anti-join runs on |distinct keys|, not |rows|.
        # NULL foreign keys are not orphans (FK semantics: nullability is the
        # 'required' rule's job; a left-anti join would otherwise report every
        # NULL since NULL never matches). NULLs on the ref side are kept but
        # match nothing — deliberately NOT SQL NOT-IN's "one NULL poisons the
        # whole check" behavior.
        non_null = reduce(lambda a, b: a & b, [F.col(c).isNotNull() for c in cols])
        # min() instance, not dropDuplicates: a key spanning partitions must
        # attribute its violation deterministically (same reasoning as the
        # unique rule's min())
        orphan_keys = (
            df.filter(non_null)
            .groupBy(*[_k(c).alias(c) for c in cols])
            .agg(F.min(self._instance_col(df)).alias("instance_name"))
        )
        orphans = orphan_keys.join(F.broadcast(ref_keys) if rule.get("broadcast", True) else ref_keys, on=cols, how="left_anti")
        key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        msg = rule.get("message")
        message = (
            F.lit(msg)
            if msg
            else F.concat(
                F.lit("'"), key_str, F.lit(f"' is not present in {ref_name}({', '.join(ref_cols)})")
            )
        )
        return orphans.select(
            F.lit(rid).alias("schema_id"),
            F.lit("FAIL").alias("result"),
            F.col("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            F.array(*[F.col(c).cast("string") for c in cols]).alias("absolute_path"),
            key_str.alias("failing_value"),
            message.alias("message"),
        )

    def _equals_table_violations(self, df: DataFrame, rule: Rule, ref_tables: dict[str, DataFrame]) -> DataFrame:
        """The north-star per-row invariant (BASELINE.json input_hint:
        'per-turn text equality under stable turn ordering'): diff the
        input against a reference table on the key columns. Emits three
        violation shapes — a compared column's value differs, an input row
        has no reference counterpart, a reference row has no input
        counterpart. 'Stable turn ordering' is by construction — the
        comparison keys on (conv_id, turn_idx), never on file or partition
        order. No window; no unbounded collect.

        Two physical strategies, picked by ``compare_mode``:

        - ``direct``: ONE full-outer equi-join shuffle on the keys, value
          comparison on the join projection. Right when the compared
          columns are narrow (numerics/timestamps): the hash detour would
          shuffle just as many bytes plus a second scan.
        - ``hash``: two-phase. Pass 1 shuffles only (keys, instance,
          xxhash64 per compared column) through the full-outer join — for
          a transcripts-scale ``text`` column that cuts shuffle bytes
          ~5-20x, which is exactly the cross-executor traffic that breaks
          N→4N scaling — and keeps only missing/mismatched rows (tiny at
          the 1/1000 tamper rates a diff exists to catch), materialized
          via localCheckpoint. Pass 2 fetches the real values for the
          mismatch keys with a broadcast join-back against each table and
          RECOMPARES the actual values, so the emitted violations are
          byte-identical to direct mode (a hash collision can only mask a
          real mismatch, at ~n*2^-64 odds; it can never invent one).
          NOTE: hash mode triggers pass 1 eagerly at plan-build time (the
          mismatch count decides broadcast vs fallback).
        - ``auto`` (default): ``hash`` when any compared column is
          string/binary/nested (wide values), else ``direct``.

        If the mismatch key set exceeds ``max_fetch_keys`` (default 2e6 —
        past any plausible drift, the tables are simply different), hash
        mode abandons the detour and falls back to the direct join."""
        keys = list(rule.params["columns"])
        comp = list(rule.params["compare"])
        ref_name = rule.params["ref_table"]
        if ref_name not in ref_tables:
            raise KeyError(f"equals_table rule needs ref table {ref_name!r} in ref_tables")
        ref = ref_tables[ref_name]
        for c in keys + comp:
            if c not in df.columns:
                raise ValueError(f"equals_table: input lacks column {c!r}")
            if c not in ref.columns:
                raise ValueError(f"equals_table: ref table {ref_name!r} lacks column {c!r}")
            # dtype alignment must hold: a string-vs-double compare column
            # would join/compare through implicit casts and render the ref
            # repr with the wrong quoting — fail loudly instead
            lt, rt = _dtype_of(df, c), _dtype_of(ref, c)
            if lt != rt:
                raise ValueError(
                    f"equals_table: column {c!r} dtype mismatch — input is {lt}, "
                    f"{ref_name} is {rt}; cast the tables to agree before validating"
                )
        rid = rule.get("id") or f"{self.manifest.id}/equals_table/{ref_name}"
        custom_msg = rule.get("message")

        mode = rule.get("compare_mode", "auto")
        if mode == "auto":
            mode = (
                "hash"
                if any(
                    _dtype_of(df, c).simpleString() in ("string", "binary")
                    or _dtype_of(df, c).simpleString().startswith(("array", "struct", "map"))
                    for c in comp
                )
                else "direct"
            )
        if mode == "hash":
            j = self._equals_table_hash_join(df, ref, keys, comp, rule)
        else:
            left = df.select(
                *keys, *comp, self._instance_col(df).alias("_inst"), F.lit(1).alias("_l")
            )
            right = ref.select(
                *keys, *[F.col(c).alias(f"_r_{c}") for c in comp], F.lit(1).alias("_r")
            )
            j = left.join(right, on=keys, how="full_outer")
        return self._equals_table_emit(j, df, ref, keys, comp, ref_name, rid, custom_msg)

    def _equals_table_hash_join(
        self, df: DataFrame, ref: DataFrame, keys: list[str], comp: list[str], rule: Rule
    ) -> DataFrame:
        """Hash-precompare pass for equals_table (see the rule docstring):
        returns a frame with the same columns the direct full-outer join
        produces (keys, compared values, ``_r_*`` twins, ``_inst``,
        ``_l``/``_r`` side markers) but containing ONLY the rows that can
        emit a violation — built by joining 8-byte xxhash64 digests instead
        of the values, then fetching real values for the (tiny) mismatch
        key set via broadcast join-backs. NULL values hash to NULL (not the
        seed constant) so NULL-vs-'' and NULL-vs-present stay distinct."""

        def _h(c: str) -> Column:
            return F.when(F.col(c).isNull(), F.lit(None).cast("bigint")).otherwise(
                F.xxhash64(F.col(c))
            )

        lh = df.select(
            *keys,
            self._instance_col(df).alias("_inst"),
            *[_h(c).alias(f"_h_{c}") for c in comp],
            F.lit(1).alias("_l"),
        )
        rh = ref.select(
            *keys,
            *[_h(c).alias(f"_rh_{c}") for c in comp],
            F.lit(1).alias("_r"),
        )
        pre = lh.join(rh, on=keys, how="full_outer")
        flagged = F.col("_l").isNull() | F.col("_r").isNull()
        for c in comp:
            flagged = flagged | ~F.col(f"_h_{c}").eqNullSafe(F.col(f"_rh_{c}"))
        # materialize the mismatch set once: it feeds the side-missing
        # branch, the fetch-back key list, AND the broadcast-vs-fallback
        # decision — without the checkpoint each consumer would re-run the
        # whole pass-1 join (the derived-table-reuse trap, CLAUDE.md r4)
        max_fetch = int(rule.get("max_fetch_keys", 2_000_000))
        # ZERO extra jobs for the fallback decision AND the fetch range
        # bounds: every separate action is a full scheduler barrier whose
        # wall time is set by the slowest executor (this host's steal
        # bursts amplify exactly these barriers — BENCH/BASELINE.md r6), so
        # the count and min/max ride an Observation on the checkpoint's own
        # materialization job (the same trick the CC loop's convergence
        # probe uses; verified the metrics fire on localCheckpoint). Bounds
        # cover only both-present rows (the fetch set); side-missing rows
        # need no values.
        _bp = F.col("_l").isNotNull() & F.col("_r").isNotNull()
        obs = Observation("equals_hash_stats")
        mis = (
            pre.filter(flagged)
            .observe(
                obs,
                F.count(F.lit(1)).alias("_n"),
                *[F.min(F.when(_bp, F.col(c))).alias(f"lo_{c}") for c in keys],
                *[F.max(F.when(_bp, F.col(c))).alias(f"hi_{c}") for c in keys],
            )
            .localCheckpoint(eager=True)
        )
        _stats = obs.get
        if _stats["_n"] > max_fetch:
            left = df.select(
                *keys, *comp, self._instance_col(df).alias("_inst"), F.lit(1).alias("_l")
            )
            right = ref.select(
                *keys, *[F.col(c).alias(f"_r_{c}") for c in comp], F.lit(1).alias("_r")
            )
            return left.join(right, on=keys, how="full_outer")

        null_comp = [F.lit(None).cast(_dtype_of(df, c)).alias(c) for c in comp]
        null_rcomp = [F.lit(None).cast(_dtype_of(ref, c)).alias(f"_r_{c}") for c in comp]
        # side-missing rows need no values: the message is built from keys
        miss_side = mis.filter(F.col("_l").isNull() | F.col("_r").isNull()).select(
            *keys, *null_comp, *null_rcomp, "_inst", "_l", "_r"
        )
        # both-present hash mismatches: fetch the real values. The key list
        # is DISTINCT so duplicate join keys multiply exactly as the direct
        # full-outer join would (each input row matches each ref row once),
        # and the pair join recompares actual values — equal-value sibling
        # pairs under a duplicated key emit nothing, same as direct mode.
        mk = (
            mis.filter(F.col("_l").isNotNull() & F.col("_r").isNotNull())
            .select(*keys)
            .distinct()
        )
        # Range-prune the fetch-back scans: the broadcast probe alone still
        # DECODES every row's compared columns before discarding 99.9% of
        # them. A min/max bound per key column is implied by membership in
        # mk, rides the fallback-decision aggregate above for free, and —
        # unlike the 10k-literal IN set — is parquet-PUSHABLE, so row
        # groups/pages outside the bounds are skipped before any value
        # decode. Uniformly-spread tampering prunes nothing (bounds span
        # the table), but real corruption clusters (a bad ingest day, one
        # broken partition), and then the fetch-back reads only the
        # affected key range instead of re-scanning 100 TB.
        fetch_filter = None
        for c in keys:
            lo, hi = _stats[f"lo_{c}"], _stats[f"hi_{c}"]
            if lo is None or hi is None:  # all-null key column — no bound
                continue
            cl = F.col(c).between(F.lit(lo), F.lit(hi))
            fetch_filter = cl if fetch_filter is None else (fetch_filter & cl)
        fetch_in = df.select(
            *keys, *comp, self._instance_col(df).alias("_inst")
        )
        fetch_ref = ref.select(*keys, *[F.col(c).alias(f"_r_{c}") for c in comp])
        if fetch_filter is not None:
            fetch_in = fetch_in.filter(fetch_filter)
            fetch_ref = fetch_ref.filter(fetch_filter)
        fetch_in = fetch_in.join(F.broadcast(mk), on=keys, how="inner")
        fetch_ref = fetch_ref.join(F.broadcast(mk), on=keys, how="inner")
        pairs = fetch_in.join(fetch_ref, on=keys, how="inner").select(
            *keys,
            *comp,
            *[f"_r_{c}" for c in comp],
            "_inst",
            F.lit(1).alias("_l"),
            F.lit(1).alias("_r"),
        )
        return miss_side.unionByName(pairs)

    def _equals_table_emit(
        self,
        j: DataFrame,
        df: DataFrame,
        ref: DataFrame,
        keys: list[str],
        comp: list[str],
        ref_name: str,
        rid: str,
        custom_msg: str | None,
    ) -> DataFrame:
        """Shared violation-shaping tail of equals_table: ``j`` carries
        keys, compared values + ``_r_*`` twins, ``_inst`` and the
        ``_l``/``_r`` side markers (from either the direct full-outer join
        or the hash-precompare fetch-back)."""
        from schema_enforcer_spark.compiler import py_repr

        key_cols = [F.col(c).cast("string") for c in keys]
        key_str = F.concat_ws("|", *key_cols)
        _VIOL_T = (
            "array<struct<absolute_path:array<string>,failing_value:string,message:string>>"
        )
        structs: list[Column] = [
            F.when(
                F.col("_r").isNull(),
                F.struct(
                    F.array(*key_cols).alias("absolute_path"),
                    key_str.alias("failing_value"),
                    (F.lit(custom_msg) if custom_msg else F.concat(
                        F.lit("'"), key_str, F.lit(f"' is missing from {ref_name}")
                    )).alias("message"),
                ),
            ),
            F.when(
                F.col("_l").isNull(),
                F.struct(
                    F.array(*key_cols).alias("absolute_path"),
                    key_str.alias("failing_value"),
                    (F.lit(custom_msg) if custom_msg else F.concat(
                        F.lit("'"), key_str, F.lit(f"' is missing from the input (present in {ref_name})")
                    )).alias("message"),
                ),
            ),
        ]
        for c in comp:
            dtype = _dtype_of(df, c)
            lrep = py_repr(F.col(c), dtype)
            # ref dtype equals the input dtype (checked above) — but source
            # the repr from the ref schema so the message stays honest if
            # the check is ever relaxed to compatible casts
            rrep = py_repr(F.col(f"_r_{c}"), _dtype_of(ref, c))
            structs.append(
                F.when(
                    F.col("_l").isNotNull()
                    & F.col("_r").isNotNull()
                    & ~F.col(c).eqNullSafe(F.col(f"_r_{c}")),
                    F.struct(
                        F.array(*key_cols, F.lit(c)).alias("absolute_path"),
                        F.col(c).cast("string").alias("failing_value"),
                        (F.lit(custom_msg) if custom_msg else F.concat(
                            lrep, F.lit(f" does not equal {ref_name}.{c} "), rrep
                        )).alias("message"),
                    ),
                )
            )
        exploded = j.select(
            # a reference-only row has no input instance: attribute it to
            # its key so the verdict grain still isolates the failure
            F.coalesce(F.col("_inst"), key_str).alias("instance_name"),
            F.explode(F.array_compact(F.array(*structs).cast(_VIOL_T))).alias("v"),
        )
        return exploded.select(
            F.lit(rid).alias("schema_id"),
            F.lit("FAIL").alias("result"),
            F.col("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            F.col("v.absolute_path").alias("absolute_path"),
            F.col("v.failing_value").alias("failing_value"),
            F.col("v.message").alias("message"),
        )

    def _cardinality_violations(self, df: DataFrame, rule: Rule, ref_tables: dict[str, DataFrame]) -> DataFrame:
        """Cross-table cardinality constraint (FK multiplicity): every
        non-null key of this table must match between min_count and
        max_count rows of ref_table. The reference validates one document
        at a time and cannot see cross-table multiplicity at all; in Spark
        it is the natural J4 extension — pre-aggregate the ref side on the
        key (map-side combine shrinks it to |distinct keys|), left-join the
        distinct fact keys (co-partitioned shuffle on the key, both sides),
        flag out-of-range counts. Nothing is broadcast or collected: the
        ref count table can be as large as the fact key set."""
        cols = rule.params["columns"]
        ref_name, ref_cols = rule.params["ref_table"], rule.params["ref_columns"]
        lo = rule.get("min_count")
        hi = rule.get("max_count")
        if ref_name not in ref_tables:
            raise KeyError(f"cardinality rule needs ref table {ref_name!r} in ref_tables")
        rid = rule.get("id") or f"{self.manifest.id}/cardinality/{'+'.join(cols)}"
        ref_counts = (
            ref_tables[ref_name]
            .filter(reduce(lambda a, b: a & b, [F.col(rc).isNotNull() for rc in ref_cols]))
            .groupBy(*[F.col(rc).alias(c) for rc, c in zip(ref_cols, cols)])
            .agg(F.count(F.lit(1)).alias("_rc"))
        )
        non_null = reduce(lambda a, b: a & b, [F.col(c).isNotNull() for c in cols])
        keys = (
            df.filter(non_null)
            .groupBy(*cols)
            .agg(F.min(self._instance_col(df)).alias("instance_name"))
        )
        joined = keys.join(ref_counts, on=cols, how="left").withColumn(
            "_rc", F.coalesce(F.col("_rc"), F.lit(0))
        )
        fail = F.lit(False)
        if lo is not None:
            fail = fail | (F.col("_rc") < lo)
        if hi is not None:
            fail = fail | (F.col("_rc") > hi)
        bounds = (
            f"between {lo} and {hi}" if lo is not None and hi is not None
            else (f"at least {lo}" if lo is not None else f"at most {hi}")
        )
        key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        msg = rule.get("message")
        message = (
            F.lit(msg)
            if msg
            else F.concat(
                F.lit("'"), key_str, F.lit(f"' matches "), F.col("_rc").cast("string"),
                F.lit(f" row(s) in {ref_name}({', '.join(ref_cols)}); expected {bounds}"),
            )
        )
        return joined.filter(fail).select(
            F.lit(rid).alias("schema_id"),
            F.lit("FAIL").alias("result"),
            F.col("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            F.array(*[F.col(c).cast("string") for c in cols]).alias("absolute_path"),
            F.col("_rc").cast("string").alias("failing_value"),
            message.alias("message"),
        )

    def _fd_violations(self, df: DataFrame, rule: Rule) -> DataFrame:
        """Functional-dependency constraint (X -> y): every distinct
        determinant tuple over ``columns`` must map to exactly ONE value of
        ``dependent``. NULL counts as a value on both sides (SQL GROUP BY
        semantics: a NULL determinant forms its own group; a NULL dependent
        is one more distinct value). The reference's per-document walker has
        no cross-row visibility, so this table-grain profiling constraint
        (the Deequ/Metanome FD check) exists only here.

        Plan shape (asserted in PLANS.md §26): Spark's two-phase distinct
        aggregation — exchange 1 is keyed (determinant, dependent) and runs
        AFTER a map-side partial dedup, so it shuffles distinct pairs, not
        rows; exchange 2 reduces per determinant over the already-
        deduplicated pairs (bounded by Σ|distinct deps per group|). Every
        per-group statistic (exact distinct dependent count, null flag,
        example min/max pair, stable instance name) rides the same
        aggregate. Output is one row per VIOLATING group, bounded by
        |distinct determinants| — nothing is collected or broadcast, so a
        100 TB fact table costs one map-side-combined shuffle of its
        deduplicated (determinant, dependent) projection."""
        cols = rule.params["columns"]
        dep = rule.params["dependent"]
        # same fail-loud clash check as _outlier_emit: a determinant named
        # like a staging alias would otherwise surface as a confusing
        # duplicate-column AnalysisException deep in the agg (ADVICE r6)
        if clash := {"_nd", "_hn", "_lo", "_hi", "instance_name"} & set(cols):
            raise ValueError(
                f"functional_dependency rule: determinant columns {sorted(clash)} "
                "collide with the FD staging columns — rename them before validating"
            )
        rid = (
            rule.get("id")
            or f"{self.manifest.id}/functional_dependency/{'+'.join(cols)}->{dep}"
        )
        depc = F.col(dep)
        g = df.groupBy(*cols).agg(
            # exact per-group distinct (skips NULLs) + a did-we-see-NULL
            # flag: n_values = _nd + _hn counts NULL as one more value
            F.count_distinct(depc).alias("_nd"),
            F.max(F.when(depc.isNull(), 1).otherwise(0)).alias("_hn"),
            F.min(depc).alias("_lo"),
            F.max(depc).alias("_hi"),
            F.min(self._instance_col(df)).alias("instance_name"),
        )
        n_values = F.col("_nd") + F.col("_hn")
        key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        # example conflicting pair: two non-null values when we have them,
        # else NULL vs the single non-null value (n_values > 1 guarantees
        # one of the two shapes)
        example = F.when(
            F.col("_nd") >= 2,
            F.concat(
                F.lit("'"), F.col("_lo").cast("string"),
                F.lit("' vs '"), F.col("_hi").cast("string"), F.lit("'"),
            ),
        ).otherwise(F.concat(F.lit("NULL vs '"), F.col("_lo").cast("string"), F.lit("'")))
        msg = rule.get("message")
        message = (
            F.lit(msg)
            if msg
            else F.concat(
                F.lit("'"), key_str,
                F.lit("' maps to "), n_values.cast("string"),
                F.lit(f" distinct values of {dep} ("), example,
                F.lit("); expected exactly 1"),
            )
        )
        return g.filter(n_values > 1).select(
            F.lit(rid).alias("schema_id"),
            F.lit("FAIL").alias("result"),
            F.col("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            F.array(*[F.col(c).cast("string") for c in cols]).alias("absolute_path"),
            n_values.cast("string").alias("failing_value"),
            message.alias("message"),
        )

    def _outlier_violations(self, df: DataFrame, rule: Rule) -> DataFrame:
        """Tukey-fence outlier flag (profiling-grade anomaly detection —
        the Deequ anomaly-check analogue; the reference's one-document
        walker cannot see distribution-grain constraints): rows whose
        numeric ``column`` falls outside [q1 - k*IQR, q3 + k*IQR], with
        the quartiles computed from the data itself.

        Scale path: ``approx_percentile`` (default) — a fixed-size
        mergeable sketch, one map-side-combined pass for the bounds.
        ``exact: true`` switches to the exact R-7 interpolated percentile
        (memory grows with |distinct column values|; bit-identical to
        DuckDB's quantile_cont, which is what makes the q27 oracle twin
        possible). Plan: TWO scans by design — a bounds pass and a flag
        pass are inherent to comparing every row against a global
        statistic — glued by a broadcast join of the single bounds row
        (the scalar-subquery shape); nothing is collected driver-side.
        With ``group_by`` the fence is computed PER GROUP (per-segment
        anomaly detection): the bounds side shrinks to |groups| rows via
        one map-side-combined aggregate and joins back on the group key —
        AQE broadcasts it when small, else the join co-partitions both
        sides on the key; still nothing driver-side."""
        bounds = self.outlier_bounds(df, rule)
        return self._outlier_emit(df, rule, bounds)

    def outlier_bounds(self, df: DataFrame, rule: Rule) -> DataFrame:
        """The bounds half of the outlier rule: a frame of (_lo, _hi)
        fences — one row, or |groups| rows with the ``group_by`` columns.
        Public because the streaming twin freezes fences computed here
        from a static reference table (a stream cannot take a global
        quantile)."""
        col = rule.params["column"]
        k = float(rule.get("k", 1.5))
        exact = bool(rule.get("exact", False))
        group = list(rule.get("group_by") or [])
        fn = "percentile" if exact else "approx_percentile"
        q = F.expr(f"{fn}(`{col}`, array(0.25D, 0.75D))")
        iqr = F.col("_q3") - F.col("_q1")
        fences = [
            (F.col("_q1") - F.lit(k) * iqr).alias("_lo"),
            (F.col("_q3") + F.lit(k) * iqr).alias("_hi"),
        ]
        if group:
            return (
                df.groupBy(*group)
                .agg(q.alias("_q"))
                .select(*group, F.col("_q")[0].alias("_q1"), F.col("_q")[1].alias("_q3"))
                .select(*group, *fences)
            )
        return (
            df.agg(q.alias("_q"))
            .select(F.col("_q")[0].alias("_q1"), F.col("_q")[1].alias("_q3"))
            .select(*fences)
        )

    def _outlier_emit(self, df: DataFrame, rule: Rule, bounds: DataFrame) -> DataFrame:
        """The flag half: join *bounds* back (broadcast for the 1-row
        global fence, key join for grouped) and project violation rows."""
        if clash := {"_lo", "_hi"} & set(df.columns):
            raise ValueError(
                f"outlier rule: input columns {sorted(clash)} collide with "
                "the fence staging columns — rename them before validating"
            )
        col = rule.params["column"]
        k = float(rule.get("k", 1.5))
        group = list(rule.get("group_by") or [])
        rid = rule.get("id") or f"{self.manifest.id}/outlier/{col}"
        c = F.col(col)
        if group:
            joined = df.join(bounds, on=group, how="left")
        else:
            joined = df.join(F.broadcast(bounds))  # 1-row build side, no condition
        fail = c.isNotNull() & ((c < F.col("_lo")) | (c > F.col("_hi")))

        def _dec(x: Column) -> Column:
            # engine-portable float rendering: fixed DECIMAL(18,6) scale
            # (raw double→string differs across engines); values past the
            # decimal range fall back to the plain cast instead of an
            # ANSI overflow error
            return F.coalesce(x.try_cast("decimal(18,6)").cast("string"), x.cast("string"))

        msg = rule.get("message")
        message = (
            F.lit(msg)
            if msg
            else F.concat(
                F.lit(f"value "), _dec(c),
                F.lit(f" of {col} is outside the IQR fence ["),
                _dec(F.col("_lo")), F.lit(", "), _dec(F.col("_hi")),
                F.lit(f"] (k={k:g})"),
            )
        )
        return joined.filter(fail).select(
            F.lit(rid).alias("schema_id"),
            F.lit("FAIL").alias("result"),
            self._instance_col(df).alias("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            self._path(df, col).alias("absolute_path"),
            _dec(c).alias("failing_value"),
            message.alias("message"),
        )

    def _rate_limit_violations(self, df: DataFrame, rule: Rule) -> DataFrame:
        """Sliding-window rate constraint (burst detection): within each
        partition_by group, the count of rows in the trailing
        ``window_seconds`` (inclusive of the current row's instant) must
        not exceed max_count. ONE exchange on the partition key — the same
        shuffle shape as the fused ordering/contiguity pass — then a RANGE
        frame count; a trailing event-time window is exactly the state a
        streaming rate limiter keeps, so the rule translates to the
        stateful streaming path unchanged. Window expressions cannot sit in
        a filter, so the count materializes in a projection first."""
        part = list(rule.params["partition_by"])
        order = rule.params["order_by"]
        oc = order if isinstance(order, str) else order[0]
        wsec = int(rule.params["window_seconds"])
        mx = int(rule.params["max_count"])
        rid = rule.get("id") or f"{self.manifest.id}/rate_limit/{'+'.join(part)}"
        w = (
            Window.partitionBy(*part)
            .orderBy(F.col(oc).cast("long"))
            .rangeBetween(-(wsec - 1), 0)
        )
        staged = df.select(
            *[F.col(c) for c in part],
            F.col(oc),
            self._instance_col(df).alias("instance_name"),
            F.count(F.lit(1)).over(w).alias("_c"),
        )
        key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in part])
        msg = rule.get("message")
        message = (
            F.lit(msg)
            if msg
            else F.concat(
                F.lit("'"), key_str, F.lit("' saw "), F.col("_c").cast("string"),
                F.lit(f" rows within {wsec}s; at most {mx} allowed"),
            )
        )
        return staged.filter(F.col("_c") > mx).select(
            F.lit(rid).alias("schema_id"),
            F.lit("FAIL").alias("result"),
            F.col("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            F.array(
                *[F.col(c).cast("string") for c in part], F.col(oc).cast("string")
            ).alias("absolute_path"),
            F.col("_c").cast("string").alias("failing_value"),
            message.alias("message"),
        )

    def _fused_window_violations(self, df: DataFrame, rules: list[Rule]) -> DataFrame:
        """ALL ordering/contiguous/unique/sequence rules that share a
        partition-key prefix evaluate in ONE pass over ONE exchange:

        - ordering → lag, contiguous → row_number, both over
          ``partitionBy(part)``;
        - sequence → lag + row_number over ``partitionBy(part)
          orderBy(order_by)`` (allowed-transition pairs are null-safe
          boolean algebra on the lag — fused in round 3 so a manifest with
          ordering + sequence no longer pays a second exchange);
        - unique(cols) where cols[:-1] == part → duplicate ⇔ the last key
          column equals its ``lag`` under the SAME (part × order) window the
          other rules use, with the group size from a ties frame
          (``rangeBetween(0,0)``) on that window. Zero extra exchanges or
          sorts. (A ``partitionBy(cols)`` count-window would add neither
          exchange nor sort but pays WindowExec per-group buffer setup on
          |table| nearly-unique keys — measured ~7× slower than even the
          standalone groupBy.) Output is normalized to the standalone
          contract: one violation per duplicated key, "appears N times".

        Violations are emitted as an array → explode, the same single-scan
        trick as the row-rule projection."""
        from pyspark.sql.window import Window

        part = rules[0].params["partition_by"] if rules[0].kind != "unique" else list(rules[0].params["columns"][:1])
        for r in rules:
            if r.kind != "unique":
                part = r.params["partition_by"]
                break
        aux: list[Column] = []
        specs = []  # (rule, kind, col_name, aux_name, extra)
        unique_cols_all: list[str] = []
        for i, rule in enumerate(rules):
            if rule.kind == "unique":
                cols = rule.params["columns"]
                unique_cols_all.extend(cols)
                wu = Window.partitionBy(*cols[:-1]).orderBy(F.col(cols[-1]).asc())
                aux.append(F.lag(F.col(cols[-1])).over(wu).alias(f"_dup_{i}"))
                # row_number disambiguates "no previous row" from "previous
                # value is NULL": NULLs sort first, so a duplicated-NULL
                # group's first row has lag=NULL too and eqNullSafe alone
                # would never mark a first-of-group row
                aux.append(F.row_number().over(wu).alias(f"_rn_{i}"))
                # group size via a ties frame (rangeBetween(0,0) counts rows
                # with the SAME order value) — rides the identical window
                # spec, so no extra exchange, sort, or WindowExec group
                aux.append(
                    F.count(F.lit(1))
                    .over(wu.rangeBetween(Window.currentRow, Window.currentRow))
                    .alias(f"_cnt_{i}")
                )
                specs.append((rule, "unique", cols[-1], f"_dup_{i}", cols))
                continue
            col_name = rule.params["column"]
            col = F.col(col_name)
            if rule.kind == "ordering":
                w = Window.partitionBy(*part).orderBy(*rule.params["order_by"])
                aux_name = f"_prev_{i}"
                aux.append(F.lag(col).over(w).alias(aux_name))
                specs.append((rule, "ordering", col_name, aux_name, rule.get("strictly", True)))
            elif rule.kind == "sequence":
                # allowed-transition lag rides the group's exchange like
                # ordering; row_number distinguishes the allowed_start check
                w = Window.partitionBy(*part).orderBy(*rule.params["order_by"])
                aux_name = f"_sprev_{i}"
                aux.append(F.lag(col).over(w).alias(aux_name))
                aux.append(F.row_number().over(w).alias(f"_srn_{i}"))
                specs.append((rule, "sequence", col_name, aux_name, f"_srn_{i}"))
            else:  # contiguous
                w = Window.partitionBy(*part).orderBy(col.asc())
                aux_name = f"_exp_{i}"
                aux.append((F.row_number().over(w) - 1).alias(aux_name))
                specs.append((rule, "contiguous", col_name, aux_name, None))
        needed = list(dict.fromkeys([*part, *[s[2] for s in specs if s[1] != "unique"], *unique_cols_all,
                                     *[k for k in self.key_columns if k in df.columns],
                                     *[o for r in rules if r.kind in ("ordering", "sequence") for o in r.params["order_by"] if o in df.columns]]))
        base = df.select(*needed, self._instance_col(df).alias("instance_name"), *aux)

        structs = []
        for i, (rule, kind, col_name, aux_name, extra) in enumerate(specs):
            if kind == "unique":
                # Same contract as _unique_violations: ONE row per duplicated
                # key (emitted at the group's first occurrence under the
                # window sort) with the identical "appears N times" message,
                # so fusing a unique rule into a window group never changes
                # its output. Note the emitted instance_name is the first
                # occurrence's — identical to the standalone min() whenever
                # the instance derives from the key prefix (the fuse
                # precondition cols[:-1] == partition key makes that the
                # norm).
                cols = extra
                first_of_dup_group = (F.col(f"_cnt_{i}") > 1) & (
                    (F.col(f"_rn_{i}") == 1) | ~F.col(cols[-1]).eqNullSafe(F.col(aux_name))
                )
                key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
                message = rule.get("message")
                msg = (
                    F.lit(message)
                    if message
                    else F.concat(
                        F.lit("("), key_str, F.lit(") appears "), F.col(f"_cnt_{i}").cast("string"),
                        F.lit(f" times; ({', '.join(cols)}) must be unique"),
                    )
                )
                rid = rule.get("id") or f"{self.manifest.id}/unique/{'+'.join(cols)}"
                structs.append(
                    F.when(
                        first_of_dup_group,
                        F.struct(
                            F.lit(rid).alias("schema_id"),
                            F.array(*[F.col(c).cast("string") for c in cols]).alias("absolute_path"),
                            key_str.alias("failing_value"),
                            msg.alias("message"),
                        ),
                    )
                )
                continue
            if kind == "sequence":
                rn_name = extra
                trans = [tuple(t) for t in rule.params["allowed_transitions"]]
                start = rule.get("allowed_start")
                cur, prev = F.col(col_name), F.col(aux_name)
                ok_trans = reduce(
                    lambda a, b: a | b,
                    [prev.eqNullSafe(F.lit(a)) & cur.eqNullSafe(F.lit(b)) for a, b in trans],
                )
                ok_start = (
                    reduce(lambda a, b: a | b, [cur.eqNullSafe(F.lit(s)) for s in start])
                    if start is not None
                    else F.lit(True)
                )
                is_first = F.col(rn_name) == 1
                bad = F.when(is_first, ~ok_start).otherwise(~ok_trans)
                rep = F.coalesce(cur.cast("string"), F.lit("None"))
                prev_rep = F.coalesce(prev.cast("string"), F.lit("None"))
                message = rule.get("message")
                msg = (
                    F.lit(message)
                    if message
                    else F.when(
                        is_first,
                        F.concat(F.lit("'"), rep, F.lit(f"' is not an allowed start value for '{col_name}'")),
                    ).otherwise(
                        F.concat(F.lit("'"), rep, F.lit("' cannot follow '"), prev_rep, F.lit(f"' in '{col_name}'"))
                    )
                )
                rid = rule.get("id") or f"{self.manifest.id}/sequence/{col_name}"
                order = list(rule.params["order_by"])
                structs.append(
                    F.when(
                        bad,
                        F.struct(
                            F.lit(rid).alias("schema_id"),
                            F.array(
                                *[F.col(c).cast("string") for c in part],
                                *[F.col(c).cast("string") for c in order],
                                F.lit(col_name),
                            ).alias("absolute_path"),
                            cur.cast("string").alias("failing_value"),
                            msg.alias("message"),
                        ),
                    )
                )
                continue
            strictly = extra
            col, ref = F.col(col_name), F.col(aux_name)
            if kind == "ordering":
                bad = (col <= ref) if strictly else (col < ref)
                word = "strictly increasing" if strictly else "non-decreasing"
                message = rule.get("message")
                msg = (
                    F.lit(message)
                    if message
                    else F.concat(
                        F.lit(f"'{col_name}' value "), col.cast("string"),
                        F.lit(f" is not {word} (previous "), ref.cast("string"), F.lit(")"),
                    )
                )
                rid = rule.get("id") or f"{self.manifest.id}/ordering/{col_name}"
            else:
                bad = col != ref
                message = rule.get("message")
                msg = (
                    F.lit(message)
                    if message
                    else F.concat(
                        F.lit(f"'{col_name}' value "), col.cast("string"),
                        F.lit(" breaks contiguity (expected "), ref.cast("string"), F.lit(")"),
                    )
                )
                rid = rule.get("id") or f"{self.manifest.id}/contiguous/{col_name}"
            structs.append(
                F.when(
                    F.coalesce(bad, F.lit(False)),
                    F.struct(
                        F.lit(rid).alias("schema_id"),
                        self._path(base, col_name).alias("absolute_path"),
                        col.cast("string").alias("failing_value"),
                        msg.alias("message"),
                    ),
                )
            )
        exploded = base.select(
            "instance_name", F.explode(F.array_compact(F.array(*structs))).alias("v")
        )
        return exploded.select(
            F.col("v.schema_id").alias("schema_id"),
            F.lit("FAIL").alias("result"),
            F.col("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            F.col("v.absolute_path").alias("absolute_path"),
            F.col("v.failing_value").alias("failing_value"),
            F.col("v.message").alias("message"),
        )

    def _salted_group(self, df: DataFrame, rule: Rule, group: list[str], specs: list) -> DataFrame:
        """Two-phase salted aggregation for hot-key skew (north_rule):
        phase 1 partial-aggregates on (group, salt) — a hot conversation's
        rows split across `salt` reducers — phase 2 merges the tiny
        (|groups| × salt) partials. Decomposable fns only; the salt is
        deterministic (hash of key columns), never rand()."""
        salt_n = int(rule.params["salt"])
        salt_cols = [c for c in self.key_columns if c in df.columns and c not in group] or [df.columns[0]]
        salted = df.withColumn("_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt_n))).withColumn(
            "_inst_src", self._instance_col(df)
        )
        partials, finals = [F.min("_inst_src").alias("_inst")], [F.min("_inst").alias("_inst")]
        for alias, spec in specs:
            fn = spec.get("fn", "count") if isinstance(spec, dict) else None
            if fn == "count_distinct":
                raise ValueError("salt is not supported with count_distinct (non-decomposable); use approx via hll instead")
            if fn == "avg":
                # decompose avg = sum/count
                partials.append(_agg_side({**spec, "fn": "sum"}).alias(f"{alias}_s"))
                partials.append(_agg_side({**spec, "fn": "count"}).alias(f"{alias}_c"))
                finals.append((F.sum(f"{alias}_s") / F.sum(f"{alias}_c")).alias(alias))
            else:
                partials.append(_agg_side(spec).alias(alias) if isinstance(spec, dict) else F.first(F.lit(spec)).alias(alias))
                merge = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max, None: F.first}[fn]
                finals.append(merge(alias).alias(alias))
        return salted.groupBy(*group, "_salt").agg(*partials).groupBy(*group).agg(*finals)

    def _aggregate_violations(self, df: DataFrame, rule: Rule) -> DataFrame:
        group = rule.get("group_by", ["conv_id"])
        rid = rule.get("id") or f"{self.manifest.id}/aggregate/{'+'.join(group)}"
        right_spec = rule.params["right"]
        # Both sides compile into ONE agg() — no second scan (SURVEY.md §4.2 #4,
        # rhs-as-expression parity with check_interfaces_ipv4.py:30-38).
        if rule.get("salt"):
            specs = [("_left", rule.params["left"])]
            if isinstance(right_spec, dict):
                specs.append(("_right", right_spec))
            grouped = self._salted_group(df, rule, group, specs)
        else:
            left = _agg_side(rule.params["left"]).alias("_left")
            aggs = [left] if not isinstance(right_spec, dict) else [left, _agg_side(right_spec).alias("_right")]
            # carry the instance through the aggregation so violation rows
            # land on the same instance names the verdict universe uses
            # (recomputing from hash(group[0]) would ignore an explicit
            # partition_id column)
            aggs.append(F.min(self._instance_col(df)).alias("_inst"))
            grouped = df.groupBy(*group).agg(*aggs)
        right = F.col("_right") if isinstance(right_spec, dict) else F.lit(right_spec)
        failing = grouped.filter(~F.coalesce(_comparison(rule.params["operator"], F.col("_left"), right), F.lit(False)))
        msg = rule.get("message")
        # coalesce the interpolated sides: a NULL aggregate (e.g. sum over an
        # empty filter) must not null-propagate through concat and erase the
        # whole diagnostic
        left_str = F.coalesce(F.col("_left").cast("string"), F.lit("NULL"))
        right_str = F.coalesce(right.cast("string"), F.lit("NULL"))
        message = (
            F.lit(msg)
            if msg
            else F.concat(
                F.lit(f"aggregate check failed: left="), left_str,
                F.lit(f" {rule.params['operator']} right="), right_str, F.lit(" is false"),
            )
        )
        return failing.select(
            F.lit(rid).alias("schema_id"),
            F.lit("FAIL").alias("result"),
            F.col("_inst").alias("instance_name"),
            F.lit(self.manifest.table).alias("instance_location"),
            F.lit(self.instance_type).alias("instance_type"),
            F.array(*[F.col(g).cast("string") for g in group]).alias("absolute_path"),
            left_str.alias("failing_value"),
            message.alias("message"),
        )

    def _strict_violations(self, df: DataFrame, rule: Rule | None) -> DataFrame | None:
        # additionalProperties:false — compile-time set diff over the SCHEMA,
        # never the data (parquet/Iceberg schemas are table metadata), at any
        # depth: a rule with `column:` targets a struct column (or
        # array<struct> — the reference injects additionalProperties one
        # level into items too, /root/reference/schema_enforcer/schemas/
        # jsonschema.py:103-134; message parity tests/test_jsonschema.py:98-105).
        declared = set(self.manifest.columns)
        path_prefix: list[str] = []
        actual = set(df.columns) - {"partition_id"}
        if rule is not None and rule.get("column"):
            from schema_enforcer_spark.compiler import _dtype_of

            target = rule.params["column"]
            dt = _dtype_of(df, target)
            if isinstance(dt, T.ArrayType):
                dt = dt.elementType
                path_prefix = [*target.split("."), "items"]
            else:
                path_prefix = target.split(".")
            if not isinstance(dt, T.StructType):
                raise ValueError(f"strict_columns column {target!r} is {dt.simpleString()}, not a struct")
            declared = set(rule.params.get("columns") or ())
            if not declared:
                raise ValueError(
                    f"strict_columns on {target!r} needs declared 'columns' — an empty "
                    "declaration would silently check nothing"
                )
            actual = {f_.name for f_ in dt.fields}
        elif rule is not None and rule.get("columns"):
            declared = set(rule.params["columns"])
        if not declared:
            # strict mode with nothing declared would silently check nothing —
            # the same misconfiguration the struct branch rejects above
            raise ValueError(
                "strict mode needs a declared column set (manifest 'columns' or the "
                "rule's 'columns') — an empty declaration would silently check nothing"
            )
        extras = sorted(actual - declared)
        if not extras:
            return None
        spark = df.sparkSession
        rid = (rule.get("id") if rule else None) or f"{self.manifest.id}/strict_columns"
        rows = [
            (
                rid, "FAIL", "table", self.manifest.table, "TABLE",
                [*path_prefix, c], c, f"Additional properties are not allowed ('{c}' was unexpected)",
            )
            for c in extras
        ]
        return spark.createDataFrame(rows, _VIOLATION_SCHEMA_DDL)

    # -- orchestration -----------------------------------------------------

    # Rule kinds whose violation DataFrames are built EAGERLY (they run
    # Spark jobs during construction: equals_table's hash precompare
    # localCheckpoints digests, drift collects the current histogram) —
    # memoizing their construction would reuse computed DATA across calls,
    # not just a plan, so the prepared-plan memo below must skip them.
    _EAGER_RULE_KINDS = frozenset({"equals_table", "drift"})

    def violations(
        self,
        df: DataFrame,
        ref_tables: dict[str, DataFrame] | None = None,
        include_row_rules: bool = True,
    ) -> DataFrame:
        """Assemble the full violations frame. Construction is memoized per
        (input identity, ref-table identities, include_row_rules) when every
        rule builds lazily — assembling 15+ rule plans costs ~0.3-0.5 s of
        driver↔JVM round trips (measured r7) and repeat consumers (bench
        trials, report + quarantine over one input) shouldn't pay it twice.
        Plan preparation only: actions on the returned frame always
        recompute from the input; manifests with any eager rule kind
        (equals_table, drift) are never memoized."""
        ref_tables = ref_tables or {}
        memo_key = None
        if not any(r.kind in self._EAGER_RULE_KINDS for r in self.manifest.table_rules):
            memo_key = (
                id(df),
                tuple(sorted((k, id(v)) for k, v in ref_tables.items())),
                include_row_rules,
            )
            hit = self._plan_memo.get(memo_key)
            # the pinned refs guard id() reuse after GC, like _row_arr_memo
            if hit is not None and hit[0] is df and all(a is b for a, b in zip(hit[1], ref_tables.values())):
                return hit[2]
        out = self._violations_impl(df, ref_tables, include_row_rules)
        if memo_key is not None:
            if len(self._plan_memo) >= 8:
                self._plan_memo.pop(next(iter(self._plan_memo)))
            self._plan_memo[memo_key] = (df, tuple(ref_tables.values()), out)
        return out

    def _violations_impl(
        self,
        df: DataFrame,
        ref_tables: dict[str, DataFrame],
        include_row_rules: bool,
    ) -> DataFrame:
        parts: list[DataFrame] = []
        # include_row_rules=False: validate_many computes every engine's row
        # rules in ONE fused projection over a single scan; only table-grain
        # rules (their own exchanges anyway) stay per-engine here
        if include_row_rules and (rv := self.row_violations(df)) is not None:
            parts.append(rv)
        strict_rules: list[Rule | None] = [r for r in self.manifest.table_rules if r.kind == "strict_columns"]
        if self.manifest.strict and not strict_rules:
            strict_rules = [None]
        for strict_rule in strict_rules:
            if (sv := self._strict_violations(df, strict_rule)) is not None:
                parts.append(sv)
        # fuse window rules by partition key: one shuffle per key, not per
        # rule; a unique rule whose columns extend a group's partition key
        # rides the same exchange (ClusteredDistribution satisfied) for free
        window_groups: dict[tuple, list[Rule]] = {}
        for rule in self.manifest.table_rules:
            if rule.kind in ("ordering", "contiguous", "sequence"):
                window_groups.setdefault(tuple(rule.params["partition_by"]), []).append(rule)
        fused_uniques = set()
        for rule in self.manifest.table_rules:
            if rule.kind != "unique":
                continue
            cols = tuple(rule.params["columns"])
            for part_key, group in window_groups.items():
                # fuse only when the dup-lag rides the group's exact
                # (partition × sort-by-last-col) window
                if cols[:-1] == part_key:
                    group.append(rule)
                    fused_uniques.add(id(rule))
                    break
        for group in window_groups.values():
            parts.append(self._fused_window_violations(df, group))
        for rule in self.manifest.table_rules:
            if rule.kind == "unique":
                if id(rule) not in fused_uniques:
                    parts.append(self._unique_violations(df, rule))
            elif rule.kind == "referential":
                parts.append(self._referential_violations(df, rule, ref_tables))
            elif rule.kind == "cardinality":
                parts.append(self._cardinality_violations(df, rule, ref_tables))
            elif rule.kind == "functional_dependency":
                parts.append(self._fd_violations(df, rule))
            elif rule.kind == "outlier":
                parts.append(self._outlier_violations(df, rule))
            elif rule.kind == "equals_table":
                parts.append(self._equals_table_violations(df, rule, ref_tables))
            elif rule.kind == "rate_limit":
                parts.append(self._rate_limit_violations(df, rule))
            elif rule.kind in ("ordering", "contiguous", "sequence"):
                pass  # handled by the fused window pass above
            elif rule.kind == "aggregate":
                parts.append(self._aggregate_violations(df, rule))
            elif rule.kind == "drift":
                from schema_enforcer_spark.stats import drift_violations

                parts.append(drift_violations(self, df, rule))
            elif rule.kind in ("conditional", "strict_columns"):
                pass  # conditional rides the row-rule projection; strict is schema-grain
            else:
                # a registered kind with no evaluator would otherwise
                # validate NOTHING and report PASS — fail loudly instead
                # (this exact hole shipped for 'sequence' in round 2)
                raise NotImplementedError(f"table rule kind {rule.kind!r} has no evaluator")
        if not parts:
            return df.sparkSession.createDataFrame([], _VIOLATION_SCHEMA_DDL)
        return reduce(lambda a, b: a.unionByName(b), parts)

    def verdicts(self, df: DataFrame, violations: DataFrame) -> DataFrame:
        # construction-only memo, same contract as violations(): the verdict
        # plan is always lazy, so keying on the exact (df, violations) pair
        # of inputs reuses pure plan assembly and nothing else
        memo_key = ("verdicts", id(df), id(violations))
        hit = self._plan_memo.get(memo_key)
        if hit is not None and hit[0] is df and hit[1] is violations:
            return hit[2]
        out = self._verdicts_impl(df, violations)
        if len(self._plan_memo) >= 8:
            self._plan_memo.pop(next(iter(self._plan_memo)))
        self._plan_memo[memo_key] = (df, violations, out)
        return out

    def _verdicts_impl(self, df: DataFrame, violations: DataFrame) -> DataFrame:
        # The universe is every data partition PLUS any instance name that
        # appears only in violations — table-grain rules (strict_columns,
        # drift) attribute to instance 'table', which no data row carries; a
        # plain left join from the data universe would silently drop those
        # FAILs and report a passing run.
        # `grain` rides along so a real host/partition literally named
        # 'table' (grain HOST/PARTITION) never collides with the synthetic
        # table-grain verdict row (grain TABLE) — table-grain rules
        # (strict_columns, drift) stamp their violations instance_type TABLE
        universe = (
            df.select(self._instance_col(df).alias("instance_name"))
            .dropDuplicates()
            .withColumn("grain", F.lit(self.instance_type))
            .unionByName(
                violations.select(
                    "instance_name", F.col("instance_type").alias("grain")
                ).dropDuplicates()
            )
            .dropDuplicates()
        )
        # a manifest WITH table-grain rules gets a 'table' verdict row even
        # when clean — otherwise a recorded table FAIL could never be
        # superseded by a PASS in checkpoint lineage
        if self.manifest.strict or any(r.kind in ("strict_columns", "drift") for r in self.manifest.table_rules):
            universe = universe.unionByName(
                df.sparkSession.createDataFrame(
                    [("table", "TABLE")], "instance_name string, grain string"
                )
            ).dropDuplicates()
        fails = violations.groupBy(
            "instance_name", F.col("instance_type").alias("grain")
        ).agg(F.count(F.lit(1)).alias("n_violations"))
        return (
            universe.join(fails, ["instance_name", "grain"], "left")
            .select(
                F.lit(self.manifest.id).alias("schema_id"),
                F.col("instance_name"),
                F.col("grain"),
                F.when(F.coalesce(F.col("n_violations"), F.lit(0)) > 0, F.lit("FAIL"))
                .otherwise(F.lit("PASS"))
                .alias("result"),
                F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
            )
        )

    def validate(
        self,
        df: DataFrame,
        ref_tables: dict[str, DataFrame] | None = None,
        cache_violations: bool = True,
    ) -> ValidationReport:
        """Full report. Violations feed BOTH the violations output and the
        verdict aggregation; without persistence Spark would recompute every
        rule for each consumer — persist by default (violation sets are
        tiny relative to input; spill-safe MEMORY_AND_DISK)."""
        violations = self.violations(df, ref_tables)
        if cache_violations:
            from pyspark.storagelevel import StorageLevel

            violations = violations.persist(StorageLevel.MEMORY_AND_DISK)
        return ValidationReport(violations=violations, verdicts=self.verdicts(df, violations))


def _tag_element(inst: Column, mid: str, loc: str, itype: str):
    # PySpark HOF lambdas must be single-arg closures (no default args —
    # CLAUDE.md), so the per-engine constants ride a factory closure
    def _tag(v: Column) -> Column:
        return F.struct(
            v["schema_id"].alias("schema_id"),
            v["absolute_path"].alias("absolute_path"),
            v["failing_value"].alias("failing_value"),
            v["message"].alias("message"),
            inst.alias("instance_name"),
            F.lit(loc).alias("instance_location"),
            F.lit(itype).alias("instance_type"),
            F.lit(mid).alias("_mid"),
        )

    return _tag


def validate_many(
    engines: list[ValidationEngine],
    df: DataFrame,
    ref_tables: dict[str, DataFrame] | None = None,
    cache_violations: bool = True,
) -> ValidationReport:
    """Validate one input against MANY manifests in ONE scan for all row
    rules.

    The per-engine path (``[e.validate(df) for e in engines]``) scans the
    input once per manifest — at 100 TB with M bound manifests that is M
    full-table reads for work that is all row-local. Here every engine
    contributes its combined row-violation array
    (:meth:`ValidationEngine._row_violation_array`) to a SINGLE projection;
    one ``explode`` over the concatenated (manifest-tagged) arrays emits
    every manifest's violation rows from one pass — the same fusion the
    CLI's ``--quarantine`` flag already uses for its validity flag
    (``row_fail_count`` summed across engines). Table-grain rules
    (unique/window/aggregate/referential/drift) keep their own per-engine
    exchanges — they aggregate on different keys, so a shared scan buys
    nothing Spark wouldn't shuffle anyway.

    Verdicts stay per-manifest: the fused violations are persisted once and
    split by the internal ``_mid`` manifest tag (rule ids alone can't
    attribute a violation — a rule may carry a user-supplied id that doesn't
    embed the manifest id). The returned report's ``cached`` handle is the
    tagged parent frame; ``unpersist()`` releases it.

    Reference analogue: one data file is validated against every matching
    schema in a single pass over the file's contents
    (/root/reference/schema_enforcer/instances/file.py:178-201, one
    ``schema.validate`` per matched schema over the same loaded content).
    """
    ref_tables = ref_tables or {}
    if len(engines) == 1:
        return engines[0].validate(df, ref_tables, cache_violations=cache_violations)
    # Construction memo, same contract as ValidationEngine.violations():
    # assembling the fused multi-manifest plan costs ~0.3 s of driver↔JVM
    # round trips; everything below is lazy plan building when no engine
    # carries an eager rule kind, so repeat calls over the same inputs
    # (bench trials, report consumers) reuse the prepared (all_v, verdicts)
    # pair — persist/unpersist still happens per call, actions recompute.
    memo_host = engines[0]._plan_memo if engines else None
    memo_key = None
    if memo_host is not None and not any(
        r.kind in ValidationEngine._EAGER_RULE_KINDS for e in engines for r in e.manifest.table_rules
    ):
        memo_key = (
            "validate_many",
            tuple(id(e) for e in engines),
            id(df),
            tuple(sorted((k, id(v)) for k, v in ref_tables.items())),
        )
        hit = memo_host.get(memo_key)
        if (
            hit is not None
            and hit[0] is df
            and all(a is b for a, b in zip(hit[1], engines))
            and len(hit[1]) == len(engines)
        ):
            all_v, verdicts = hit[2], hit[3]
            if cache_violations:
                from pyspark.storagelevel import StorageLevel

                all_v = all_v.persist(StorageLevel.MEMORY_AND_DISK)
            return ValidationReport(
                violations=all_v.drop("_mid"),
                verdicts=verdicts,
                cached=all_v if cache_violations else None,
            )
    tagged: list[Column] = []
    for e in engines:
        arr = e._row_violation_array(df)
        if arr is not None:
            tagged.append(
                F.transform(
                    arr,
                    _tag_element(
                        e._instance_col(df), e.manifest.id, e.manifest.table, e.instance_type
                    ),
                )
            )
    parts: list[DataFrame] = []
    if tagged:
        combined = tagged[0] if len(tagged) == 1 else F.concat(*tagged)
        parts.append(
            df.select(combined.alias("_v"))
            # explode_outer + null filter, not explode: same
            # InferFiltersFromGenerate duplicate-evaluation defense as
            # row_violations — the inferred size() filter would push below
            # the projection and re-run every manifest's full violation
            # array a second time per row. _v is never NULL, so the result
            # multiset is unchanged.
            .select(F.explode_outer("_v").alias("v"))
            .filter(F.col("v").isNotNull())
            .select(
                F.col("v.schema_id").alias("schema_id"),
                F.lit("FAIL").alias("result"),
                F.col("v.instance_name").alias("instance_name"),
                F.col("v.instance_location").alias("instance_location"),
                F.col("v.instance_type").alias("instance_type"),
                F.col("v.absolute_path").alias("absolute_path"),
                F.col("v.failing_value").alias("failing_value"),
                F.col("v.message").alias("message"),
                F.col("v._mid").alias("_mid"),
            )
        )
    for e in engines:
        # row-rule-only manifests contribute nothing here — skipping them
        # keeps empty-relation unions out of the fused plan
        if not e.manifest.table_rules and not e.manifest.strict:
            continue
        parts.append(
            e.violations(df, ref_tables, include_row_rules=False).withColumn(
                "_mid", F.lit(e.manifest.id)
            )
        )
    if not parts:
        parts.append(
            df.sparkSession.createDataFrame([], _VIOLATION_SCHEMA_DDL).withColumn(
                "_mid", F.lit(None).cast("string")
            )
        )
    all_v = reduce(lambda a, b: a.unionByName(b), parts)
    if cache_violations:
        from pyspark.storagelevel import StorageLevel

        all_v = all_v.persist(StorageLevel.MEMORY_AND_DISK)
    verdicts = reduce(
        lambda a, b: a.unionByName(b),
        [
            e.verdicts(df, all_v.filter(F.col("_mid") == e.manifest.id).drop("_mid"))
            for e in engines
        ],
    )
    if memo_key is not None:
        if len(memo_host) >= 8:
            memo_host.pop(next(iter(memo_host)))
        memo_host[memo_key] = (df, tuple(engines), all_v, verdicts)
    return ValidationReport(
        violations=all_v.drop("_mid"),
        verdicts=verdicts,
        cached=all_v if cache_violations else None,
    )
