"""PromQL abstract syntax tree.

Mirrors the node taxonomy of the upstream PromQL grammar (public spec,
prometheus.io/docs/prometheus/latest/querying/) that the reference serves via
thanos-io/promql-engine (reference cmd/serve.go:201-222).  The reference
proves this surface with its differential tests (db/db_test.go:313-1407);
SURVEY.md §2.C enumerates the operators.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Matcher:
    """Label matcher: =, !=, =~, !~ (reference search/constraint.go:32-67)."""

    label: str
    op: str  # '=', '!=', '=~', '!~'
    value: str


@dataclass
class Node:
    pass


@dataclass
class NumberLiteral(Node):
    value: float


@dataclass
class StringLiteral(Node):
    value: str


@dataclass
class VectorSelector(Node):
    name: str | None
    matchers: list[Matcher] = field(default_factory=list)
    offset_ms: int = 0
    at_ms: int | None = None  # @ modifier; 'start'/'end' resolved at parse use


@dataclass
class MatrixSelector(Node):
    selector: VectorSelector
    range_ms: int = 0


@dataclass
class Subquery(Node):
    expr: Node
    range_ms: int = 0
    step_ms: int = 0  # 0 → eval default resolution
    offset_ms: int = 0
    at_ms: int | None = None


@dataclass
class Call(Node):
    func: str
    args: list[Node] = field(default_factory=list)


@dataclass
class Aggregation(Node):
    op: str  # sum avg min max count group stddev stdvar topk bottomk quantile count_values
    expr: Node
    param: Node | None = None
    grouping: list[str] = field(default_factory=list)
    without: bool = False
    # a bare aggregation with no by/without clause groups everything
    has_grouping: bool = False


@dataclass
class VectorMatching:
    on: bool = False  # True → on(...), False → ignoring(...)
    labels: list[str] = field(default_factory=list)
    card: str = "one-to-one"  # or 'many-to-one' / 'one-to-many' / 'many-to-many'
    include: list[str] = field(default_factory=list)  # group_left/right extra labels
    explicit: bool = False  # True when on()/ignoring() was written


@dataclass
class BinaryExpr(Node):
    op: str
    lhs: Node
    rhs: Node
    bool_modifier: bool = False
    matching: VectorMatching = field(default_factory=VectorMatching)


@dataclass
class UnaryExpr(Node):
    op: str  # '-' (unary '+' is a no-op, dropped at parse)
    expr: Node


COMPARISON_OPS = {"==", "!=", ">", "<", ">=", "<="}
SET_OPS = {"and", "or", "unless"}
ARITHMETIC_OPS = {"+", "-", "*", "/", "%", "^", "atan2"}

AGGREGATION_OPS = {
    "sum", "avg", "min", "max", "count", "group", "stddev", "stdvar",
    "topk", "bottomk", "quantile", "count_values", "limitk", "limit_ratio",
}
# aggregations whose first argument is a parameter
PARAM_AGGREGATIONS = {"topk", "bottomk", "quantile", "count_values",
                      "limitk", "limit_ratio"}
