"""Format-rule parity (P7): the ten formats from the reference corpus
(/root/reference/tests/conftest.py:9-20), each checked against the real
jsonschema FormatChecker as oracle on both accept and reject cases."""

from __future__ import annotations

import jsonschema
import pytest
from pyspark.sql import functions as F

from schema_enforcer_spark.engine import ValidationEngine
from schema_enforcer_spark.manifest import Manifest, Rule

# (format, valid values, invalid values) — invalid cases include the exact
# reference corpus values (conftest.py:9-20)
CASES = [
    ("ipv4", ["10.1.1.1", "0.0.0.0", "255.255.255.255"], ["10.1.1.300", "1.2.3", "a.b.c.d"]),
    ("ipv6", ["2001:db8::1", "::1", "fe80::1", "2001:0db8:85a3:0000:0000:8a2e:0370:7334"],
     ["2001:00000:3238:DFE1:63:0000:0000:FEFB", "12345::"]),
    ("hostname", ["example.com", "ntc", "a-b.c-d.e"], ["ntc@ntc.com", "-bad.com", "bad-.com"]),
    ("date", ["2021-11-28", "2024-02-29"], ["2021-111-28", "2021-13-01", "20211128"]),
    ("time", ["20:20:33+00:00", "10:00:00Z"], ["20:20:33333+00:00", "25:00:00Z", "23:59:60Z"]),
    ("date-time", ["2021-01-29T20:20:33+00:00", "2021-01-29T20:20:33.1Z"],
     ["January 29th 2021", "2021-01-29", "2021-01-29T99:00:00Z"]),
    ("uri", ["https://example.com/x", "sftp://host/file", "urn:isbn:0451450523"], ["sftp//", "not a uri"]),
    ("email", ["user@networktocode.com", "a@b", "@x.com"], ["networktocode.code.com"]),
    ("json-pointer", ["/a/b/0", "", "/a~0b/~1c"], ["fakejsonptr", "/a~2b"]),
    ("regex", ["^conv-[0-9]+$", "abc", "(a|b)*"], ["["]),
]


def _manifest(fmt: str) -> Manifest:
    return Manifest(id="schemas/fmt", rules=(Rule(kind="format", params={"column": "v", "format": fmt}),))


@pytest.mark.parametrize("fmt,valid,invalid", CASES, ids=[c[0] for c in CASES])
def test_format_rule(spark, fmt, valid, invalid):
    rows = [(i, v, True) for i, v in enumerate(valid)] + [(100 + i, v, False) for i, v in enumerate(invalid)]
    df = spark.createDataFrame([(i, v) for i, v, _ in rows], "id long, v string")
    eng = ValidationEngine(_manifest(fmt), key_columns=["id"])
    flagged = {int(r["absolute_path"][0]) for r in eng.violations(df).collect()}
    expected = {i for i, _, ok in rows if not ok}
    assert flagged == expected, f"{fmt}: flagged={flagged} expected={expected}"
    # message parity with jsonschema for the reference corpus values
    msgs = {r["message"] for r in eng.violations(df).collect()}
    for i, v, ok in rows:
        if not ok:
            assert f"'{v}' is not a '{fmt}'" in msgs


# a value every strict checker must reject; if the LOCAL jsonschema install
# accepts it, that format's checker is running without its format-nongpl
# extra (fqdn/rfc3986-validator/email strictness) and is weaker than the
# reference's — our regexes track the REFERENCE corpus, so skip the oracle
_STRICT_CANARY = {
    "ipv4": "10.1.1.300",
    "ipv6": "2001:00000:3238:DFE1:63:0000:0000:FEFB",
    "hostname": "ntc@ntc.com",
    "date": "2021-111-28",
    "time": "20:20:33333+00:00",
    "date-time": "January 29th 2021",
    "uri": "sftp//",
    "email": "networktocode.code.com",
    "json-pointer": "fakejsonptr",
    "regex": "[",
}


def test_formats_against_jsonschema_oracle(spark):
    checker = jsonschema.Draft7Validator.FORMAT_CHECKER
    for fmt, valid, invalid in CASES:
        if checker.conforms(_STRICT_CANARY[fmt], fmt):
            continue  # local checker is permissive (extras not installed)
        for v in valid:
            assert checker.conforms(v, fmt), f"oracle rejects our valid case {fmt}:{v!r}"
        for v in invalid:
            assert not checker.conforms(v, fmt), f"oracle accepts our invalid case {fmt}:{v!r}"
