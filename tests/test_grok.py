"""Grok syntax compiles to exactly the deployed registry regexes, and
grok-authored patterns parse identically through the real pipeline."""

import re

import pytest

from log_parser_project_spark.grok import (
    GROK_REGISTRY,
    grok_fields,
    grok_pattern,
    grok_to_regex,
)
from log_parser_project_spark.registry import by_class_version


def test_grok_registry_compiles_to_deployed_regexes():
    reg = by_class_version()
    for pclass, ver, grok, route in GROK_REGISTRY:
        deployed = reg[(pclass, ver)]
        assert grok_to_regex(grok) == deployed.regex, (pclass, ver)
        assert grok_fields(grok) == deployed.groups
        assert route == deployed.route


def test_grok_pattern_builds_registry_pattern():
    p = grok_pattern(
        "error", 1,
        r"^ERROR code=%{INT:code} severity=%{DIGIT:severity} msg='%{QUOTEBODY:msg}'$",
        "sink_errors",
        enum_field="severity",
        enum_map={"1": "debug"},
    )
    m = p.compiled().match("ERROR code=42 severity=3 msg='boom'")
    assert m and m.group("code") == "42" and m.group("msg") == "boom"
    assert p.enum_field == "severity"


def test_unnamed_primitive_is_non_capturing():
    rx = grok_to_regex(r"^x=%{INT} y=%{INT:y}$")
    m = re.match(rx, "x=1 y=2")
    assert m.groupdict() == {"y": "2"}


def test_unknown_primitive_raises():
    with pytest.raises(KeyError, match="NOPE"):
        grok_to_regex("%{NOPE:x}")


def test_custom_primitive_extension():
    rx = grok_to_regex("%{HEX:h}", extra={"HEX": "0x[0-9A-F]+"})
    assert re.match(rx, "0xB888").group("h") == "0xB888"


def test_citation_regex_not_expressible_loses_nothing():
    """The citation pattern keeps its hand-written regex (nested
    optional repetition isn't a grok primitive) — grok and regex
    patterns coexist in one registry, which is the point."""
    reg = by_class_version()
    assert ("citation", 1) in reg
    grok_classes = {(c, v) for c, v, _, _ in GROK_REGISTRY}
    assert set(reg) - grok_classes == {("citation", 1)}
