"""Parser unit tests (grammar coverage mirrors the query shapes in the
reference's differential corpus, db/db_test.go:313-1407)."""

from __future__ import annotations

import pytest

from thanos_parquet_gateway_spark.promql import ast as A
from thanos_parquet_gateway_spark.promql.parser import (
    parse,
    parse_duration_ms,
    PromQLSyntaxError,
)


def test_durations():
    assert parse_duration_ms("5m") == 300_000
    assert parse_duration_ms("1h30m") == 5_400_000
    assert parse_duration_ms("1.5h") == 5_400_000
    assert parse_duration_ms("10ms") == 10
    assert parse_duration_ms("2d") == 172_800_000


def test_selector_with_matchers():
    n = parse('http_requests_total{job="api", code!="500", path=~"/v1/.*", m!~"x"}')
    assert isinstance(n, A.VectorSelector)
    assert n.name == "http_requests_total"
    ops = [m.op for m in n.matchers]
    assert ops == ["=", "!=", "=~", "!~"]


def test_nameless_selector_and_empty_error():
    n = parse('{__name__=~"a|b", job="x"}')
    assert isinstance(n, A.VectorSelector) and n.name is None
    with pytest.raises(PromQLSyntaxError):
        parse("{}")


def test_precedence():
    n = parse("1 + 2 * 3 ^ 2")
    assert isinstance(n, A.BinaryExpr) and n.op == "+"
    assert n.rhs.op == "*"
    assert n.rhs.rhs.op == "^"
    # ^ is right-associative
    p = parse("2 ^ 3 ^ 2")
    assert p.op == "^" and isinstance(p.lhs, A.NumberLiteral)
    assert p.rhs.op == "^"


def test_comparison_and_set_precedence():
    n = parse("a + b > c and d")
    assert n.op == "and"
    assert n.lhs.op == ">"
    assert n.lhs.lhs.op == "+"


def test_aggregation_forms():
    for qtext in ["sum by (a, b) (m)", "sum(m) by (a, b)"]:
        n = parse(qtext)
        assert isinstance(n, A.Aggregation)
        assert n.grouping == ["a", "b"] and not n.without
    n = parse("sum without (a) (m)")
    assert n.without
    n = parse("topk(3, m)")
    assert n.op == "topk" and isinstance(n.param, A.NumberLiteral)
    n = parse('count_values("ver", m)')
    assert isinstance(n.param, A.StringLiteral)


def test_matrix_subquery_offset_at():
    n = parse("rate(m[5m] offset 1m)")
    ms = n.args[0]
    assert isinstance(ms, A.MatrixSelector)
    assert ms.range_ms == 300_000 and ms.selector.offset_ms == 60_000
    sq = parse("avg_over_time(m[1h:5m])").args[0]
    assert isinstance(sq, A.Subquery)
    assert sq.range_ms == 3_600_000 and sq.step_ms == 300_000
    at = parse("m @ 100")
    assert at.at_ms == 100_000
    neg = parse("m offset -5m")
    assert neg.offset_ms == -300_000


def test_vector_matching():
    n = parse("a / on(x, y) group_left(z) b")
    vm = n.matching
    assert vm.on and vm.labels == ["x", "y"]
    assert vm.card == "many-to-one" and vm.include == ["z"]
    n = parse("a - ignoring(w) b")
    assert not n.matching.on and n.matching.labels == ["w"]


def test_bool_modifier_and_unary():
    n = parse("m > bool 1")
    assert n.bool_modifier
    n = parse("-m + 2")
    assert n.op == "+" and isinstance(n.lhs, A.UnaryExpr)


def test_number_literals():
    assert parse("0x1f").value == 31.0
    assert parse("1e3").value == 1000.0
    assert parse("Inf").value == float("inf")
    import math
    assert math.isnan(parse("NaN").value)


def test_trailing_garbage_rejected():
    with pytest.raises(PromQLSyntaxError):
        parse("sum(m))")


def test_duration_expressions():
    """Prometheus 3.x duration expressions: + - * / % over durations and
    numbers in range/step positions, parse-time folded."""
    assert parse("foo[1m+30s]").range_ms == 90_000
    assert parse("foo[2*1m]").range_ms == 120_000
    assert parse("foo[1h/2]").range_ms == 1_800_000
    assert parse("foo[1h%7m]").range_ms == 240_000
    assert parse("foo[(30s+30s)*3]").range_ms == 180_000
    assert parse("foo[5m-(-5m)]").range_ms == 600_000
    sq = parse("foo[3*10s:60s/6]")
    assert sq.range_ms == 30_000 and sq.step_ms == 10_000


def test_duration_expression_offsets_need_parens():
    """'offset 5m + 10' must stay (foo offset 5m) + 10; compound offsets
    are parenthesized."""
    n = parse("foo offset 5m + 10")
    assert n.op == "+" and n.lhs.offset_ms == 300_000
    assert parse("foo offset (5m+10s)").offset_ms == 310_000
    assert parse("foo offset -(1m)").offset_ms == -60_000


def test_duration_expression_errors():
    for bad in ["foo[1m-1m]", "foo[0s]", "foo[1m^2]", "foo[1m/0]",
                "foo[1m%0]", "foo[5m:0s]"]:
        with pytest.raises(PromQLSyntaxError):
            parse(bad)


def test_utf8_quoted_names():
    """Prometheus 3 UTF-8 syntax: quoted metric names inside braces and
    quoted label names in matchers and grouping lists."""
    from thanos_parquet_gateway_spark.promql.printer import format_expr
    vs = parse('{"http.requests.total"}')
    assert vs.name == "http.requests.total" and not vs.matchers
    vs = parse('{env="prod", "http.requests.total"}')
    assert vs.name == "http.requests.total"
    assert [(m.label, m.op, m.value) for m in vs.matchers] == [
        ("env", "=", "prod")]
    vs = parse('{"label with spaces"="x"}')
    assert vs.matchers[0].label == "label with spaces"
    agg = parse('sum by ("a.b", c) (up)')
    assert agg.grouping == ["a.b", "c"]
    be = parse('x * on("i.d") group_left("e.l") y')
    assert be.matching.labels == ["i.d"]
    assert be.matching.include == ["e.l"]
    # printer quotes non-classic names, roundtrip-stable
    for q in ['{"a.b", c="d"}', 'sum by ("l.1") (up)',
              '{"l w"="x"}', 'rate({"m.x"}[5m])']:
        s = format_expr(parse(q))
        assert format_expr(parse(s)) == s
    # classic names never gain quotes
    assert format_expr(parse('up{env="p"}')) == 'up{env="p"}'


def test_utf8_quoted_name_errors():
    for bad in ['foo{"bar"}', '{"a", "b"}', '{"a.b", __name__="x"}',
                '{""}', '{"a.b" env="p"}', 'up{a="b" c="d"}']:
        with pytest.raises(PromQLSyntaxError):
            parse(bad)
    # trailing comma stays legal
    assert parse('up{a="b",}').matchers[0].value == "b"
    # empty quoted label names in grouping/matching lists are invalid even
    # under the UTF-8 validation scheme (model.LabelName.IsValid requires
    # non-empty) — upstream rejects these at parse time
    for bad in ['sum by ("") (up)', 'sum without ("") (up)',
                'x * on("") y', 'x * ignoring("") y',
                'x * on(i) group_left("") y']:
        with pytest.raises(PromQLSyntaxError):
            parse(bad)
    # non-empty quoted names in the same positions still parse
    assert parse('sum by ("a") (up)').grouping == ["a"]
