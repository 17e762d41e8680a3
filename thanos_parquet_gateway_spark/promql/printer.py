"""PromQL pretty-printer: AST → canonical query string.

Backs the /api/v1/format_query endpoint (public Prometheus 3 HTTP API;
the reference exposes the same engine surface).  The contract tested here
is ROUNDTRIP STABILITY — ``parse(format(parse(q)))`` is the identical AST
— plus the upstream single-line canonical conventions: one space around
binary operators, ``by``/``without`` clauses before the argument list,
compact duration spelling (90000ms → ``1m30s``), ``+Inf``/``NaN`` float
casing, and minimal precedence-preserving parentheses.  Like upstream
``Pretty``, expressions longer than ``MAX_LINE`` characters split across
indented lines at aggregation/binary nodes.
"""

from __future__ import annotations

import math
import re

from thanos_parquet_gateway_spark.promql import ast as A
from thanos_parquet_gateway_spark.promql.parser import _PREC

MAX_LINE = 100

_UNITS = [("y", 31_536_000_000), ("w", 604_800_000), ("d", 86_400_000),
          ("h", 3_600_000), ("m", 60_000), ("s", 1000), ("ms", 1)]


def format_duration(ms: int) -> str:
    if ms == 0:
        return "0s"
    neg = ms < 0
    ms = abs(ms)
    parts = []
    for unit, size in _UNITS:
        if ms >= size:
            parts.append(f"{ms // size}{unit}")
            ms %= size
    return ("-" if neg else "") + "".join(parts)


def _fmt_float(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _quote(s: str) -> str:
    out = s.replace("\\", "\\\\").replace('"', '\\"') \
           .replace("\n", "\\n").replace("\t", "\\t")
    return f'"{out}"'


# classic (pre-UTF-8) name charsets; anything else prints in the quoted
# Prometheus 3 form ({"a.b"}, by ("l.1")) and reparses through the STR path
_CLASSIC_LABEL = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")
_CLASSIC_METRIC = re.compile(r"[a-zA-Z_:][a-zA-Z0-9_:]*")


def _label_ref(s: str) -> str:
    return s if _CLASSIC_LABEL.fullmatch(s) else _quote(s)


def _label_refs(labels) -> str:
    return ", ".join(_label_ref(l) for l in labels)


def _selector_str(name: str | None, matchers) -> str:
    parts = [f"{_label_ref(m.label)}{m.op}{_quote(m.value)}"
             for m in matchers]
    if name and not _CLASSIC_METRIC.fullmatch(name):
        # UTF-8 metric name: quoted, first inside the braces
        parts.insert(0, _quote(name))
        name = None
    inner = ", ".join(parts)
    return (name or "") + (f"{{{inner}}}" if parts or not name else "")


def _modifiers(offset_ms: int, at_ms: int | None) -> str:
    out = ""
    if at_ms is not None:
        if at_ms == -1:
            out += " @ start()"
        elif at_ms == -2:
            out += " @ end()"
        else:
            out += f" @ {at_ms / 1000:.3f}"
    if offset_ms:
        out += f" offset {format_duration(offset_ms)}"
    return out


def _prec_of(node: A.Node) -> int:
    if isinstance(node, A.BinaryExpr):
        return _PREC[node.op]
    return 99


def _child(node: A.Node, parent_prec: int, right: bool = False) -> str:
    s = format_expr(node)
    p = _prec_of(node)
    # parenthesize a lower-precedence child, or an equal-precedence RIGHT
    # child (left associativity; '^' is right-assoc so its LEFT binds)
    if p < parent_prec or (p == parent_prec and right):
        return f"({s})"
    return s


def format_expr(node: A.Node) -> str:
    if isinstance(node, A.NumberLiteral):
        return _fmt_float(node.value)
    if isinstance(node, A.StringLiteral):
        return _quote(node.value)
    if isinstance(node, A.VectorSelector):
        base = _selector_str(node.name, node.matchers)
        return base + _modifiers(node.offset_ms, node.at_ms)
    if isinstance(node, A.MatrixSelector):
        sel = node.selector
        base = _selector_str(sel.name, sel.matchers)
        return (base + f"[{format_duration(node.range_ms)}]"
                + _modifiers(sel.offset_ms, sel.at_ms))
    if isinstance(node, A.Subquery):
        step = format_duration(node.step_ms) if node.step_ms else ""
        inner = format_expr(node.expr)
        if isinstance(node.expr, A.BinaryExpr):
            inner = f"({inner})"
        return (f"{inner}[{format_duration(node.range_ms)}:{step}]"
                + _modifiers(node.offset_ms, node.at_ms))
    if isinstance(node, A.Call):
        return f"{node.func}({', '.join(format_expr(a) for a in node.args)})"
    if isinstance(node, A.Aggregation):
        clause = ""
        if node.has_grouping:
            kw = "without" if node.without else "by"
            clause = f" {kw} ({_label_refs(node.grouping)})"
        args = ([format_expr(node.param)] if node.param is not None else []) \
            + [format_expr(node.expr)]
        sep = " " if clause else ""
        return f"{node.op}{clause}{sep}({', '.join(args)})"
    if isinstance(node, A.UnaryExpr):
        s = format_expr(node.expr)
        if isinstance(node.expr, A.BinaryExpr):
            s = f"({s})"
        return f"-{s}"
    if isinstance(node, A.BinaryExpr):
        p = _PREC[node.op]
        right_assoc = node.op == "^"
        lhs = _child(node.lhs, p, right=right_assoc)
        rhs = _child(node.rhs, p, right=not right_assoc)
        mods = ""
        if node.bool_modifier:
            mods += " bool"
        vm = node.matching
        if vm.explicit:
            kw = "on" if vm.on else "ignoring"
            mods += f" {kw} ({_label_refs(vm.labels)})"
            if vm.card == "many-to-one":
                mods += (f" group_left ({_label_refs(vm.include)})"
                         if vm.include else " group_left")
            elif vm.card == "one-to-many":
                mods += (f" group_right ({_label_refs(vm.include)})"
                         if vm.include else " group_right")
        return f"{lhs} {node.op}{mods} {rhs}"
    raise TypeError(f"cannot format {type(node).__name__}")


def prettify(node: A.Node, indent: int = 0) -> str:
    """Multi-line form for long expressions (the /api/v1/format_query
    behavior): aggregations and binary operators whose single-line form
    exceeds MAX_LINE split across indented lines; short nodes stay on one
    line."""
    pad = "  " * indent
    one = format_expr(node)
    if len(one) + len(pad) <= MAX_LINE:
        return pad + one
    if isinstance(node, A.Aggregation):
        clause = ""
        if node.has_grouping:
            kw = "without" if node.without else "by"
            clause = f" {kw} ({_label_refs(node.grouping)})"
        parts = ([prettify(node.param, indent + 1)]
                 if node.param is not None else []) \
            + [prettify(node.expr, indent + 1)]
        sep = " " if clause else ""
        return (f"{pad}{node.op}{clause}{sep}(\n" + ",\n".join(parts)
                + f"\n{pad})")
    if isinstance(node, A.BinaryExpr):
        p = _PREC[node.op]
        mods = ""
        if node.bool_modifier:
            mods += " bool"
        vm = node.matching
        if vm.explicit:
            kw = "on" if vm.on else "ignoring"
            mods += f" {kw} ({_label_refs(vm.labels)})"
        lhs = prettify(node.lhs, indent + 1)
        rhs = prettify(node.rhs, indent + 1)
        if _prec_of(node.lhs) <= p:
            lhs = f"{pad}  (\n{prettify(node.lhs, indent + 2)}\n{pad}  )"
        if _prec_of(node.rhs) <= p:
            rhs = f"{pad}  (\n{prettify(node.rhs, indent + 2)}\n{pad}  )"
        return f"{lhs}\n{pad}{node.op}{mods}\n{rhs}"
    if isinstance(node, A.Call):
        parts = [prettify(a, indent + 1) for a in node.args]
        return f"{pad}{node.func}(\n" + ",\n".join(parts) + f"\n{pad})"
    return pad + one


def _at_fields(at_ms: int | None) -> dict:
    """timestamp / startOrEnd split (the upstream AST-JSON convention:
    @ start()/end() surfaces as startOrEnd, a literal @ as timestamp ms)."""
    if at_ms is None:
        return {"timestamp": None, "startOrEnd": None}
    if at_ms == -1:
        return {"timestamp": None, "startOrEnd": "start"}
    if at_ms == -2:
        return {"timestamp": None, "startOrEnd": "end"}
    return {"timestamp": at_ms, "startOrEnd": None}


def ast_to_json(node: A.Node):
    """AST → JSON tree for /api/v1/parse_query (public Prometheus 3
    endpoint; node/field naming follows the upstream translate-AST
    convention: camelCase types, matcher {name, type, value}, durations in
    milliseconds, matrix selectors flattened with their inner selector)."""
    if isinstance(node, A.NumberLiteral):
        return {"type": "numberLiteral", "val": _fmt_float(node.value)}
    if isinstance(node, A.StringLiteral):
        return {"type": "stringLiteral", "val": node.value}
    if isinstance(node, A.VectorSelector):
        return {"type": "vectorSelector", "name": node.name or "",
                "matchers": [{"name": m.label, "type": m.op,
                              "value": m.value} for m in node.matchers],
                "offset": node.offset_ms, **_at_fields(node.at_ms)}
    if isinstance(node, A.MatrixSelector):
        inner = ast_to_json(node.selector)
        return {**inner, "type": "matrixSelector", "range": node.range_ms}
    if isinstance(node, A.Subquery):
        return {"type": "subquery", "expr": ast_to_json(node.expr),
                "range": node.range_ms, "step": node.step_ms,
                "offset": node.offset_ms, **_at_fields(node.at_ms)}
    if isinstance(node, A.Call):
        return {"type": "call", "func": {"name": node.func},
                "args": [ast_to_json(a) for a in node.args]}
    if isinstance(node, A.Aggregation):
        return {"type": "aggregation", "op": node.op,
                "expr": ast_to_json(node.expr),
                "param": (ast_to_json(node.param)
                          if node.param is not None else None),
                "grouping": list(node.grouping), "without": node.without}
    if isinstance(node, A.UnaryExpr):
        return {"type": "unaryExpr", "op": node.op,
                "expr": ast_to_json(node.expr)}
    if isinstance(node, A.BinaryExpr):
        vm = node.matching
        matching = None
        if vm.explicit:
            matching = {"card": vm.card, "labels": list(vm.labels),
                        "on": vm.on, "include": list(vm.include)}
        return {"type": "binaryExpr", "op": node.op,
                "lhs": ast_to_json(node.lhs), "rhs": ast_to_json(node.rhs),
                "matching": matching, "bool": node.bool_modifier}
    raise TypeError(f"cannot serialize {type(node).__name__}")
