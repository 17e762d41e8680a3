"""PromQL lexer + Pratt parser → AST.

Grammar follows the public PromQL specification (operator precedence:
or < and/unless < comparison < +- < */%/atan2 < ^ < unary < postfix
[range] / offset / @).  The reference exercises this grammar through its
differential test corpus (reference db/db_test.go:313-1407).
"""

from __future__ import annotations

import math
import re

from thanos_parquet_gateway_spark.promql.ast import (
    Aggregation,
    AGGREGATION_OPS,
    BinaryExpr,
    Call,
    COMPARISON_OPS,
    Matcher,
    MatrixSelector,
    Node,
    NumberLiteral,
    PARAM_AGGREGATIONS,
    StringLiteral,
    Subquery,
    UnaryExpr,
    VectorMatching,
    VectorSelector,
)

_DUR_RE = re.compile(r"(?:\d+(?:\.\d+)?(?:ms|s|m|h|d|w|y))+")
_DUR_PART = re.compile(r"(\d+(?:\.\d+)?)(ms|s|m|h|d|w|y)")
_NUM_RE = re.compile(r"(?:0x[0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)")
_IDENT_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_:]*")

_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
            "d": 86_400_000, "w": 604_800_000, "y": 31_536_000_000}

_OPS = ["=~", "!~", "==", "!=", "<=", ">=", "<", ">", "=", "+", "-", "*",
        "/", "%", "^", "(", ")", "{", "}", "[", "]", ",", ":", "@"]


class PromQLSyntaxError(ValueError):
    pass


class Token:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind = kind  # NUM DUR STR IDENT OP EOF
        self.text = text
        self.pos = pos

    def __repr__(self):  # pragma: no cover
        return f"Token({self.kind},{self.text!r})"


def parse_duration_ms(text: str) -> int:
    total = 0.0
    for num, unit in _DUR_PART.findall(text):
        total += float(num) * _UNIT_MS[unit]
    return int(total)


def lex(q: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c == "#":  # comment to EOL
            while i < n and q[i] != "\n":
                i += 1
            continue
        if c in "'\"`":
            quote = c
            j = i + 1
            buf = []
            while j < n and q[j] != quote:
                if q[j] == "\\" and j + 1 < n:
                    esc = q[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r", "\\": "\\",
                                quote: quote}.get(esc, "\\" + esc))
                    j += 2
                else:
                    buf.append(q[j])
                    j += 1
            if j >= n:
                raise PromQLSyntaxError(f"unterminated string at {i}")
            toks.append(Token("STR", "".join(buf), i))
            i = j + 1
            continue
        m = _DUR_RE.match(q, i)
        if m and not _NUM_RE.fullmatch(m.group(0)):
            # duration only when it actually contains a unit suffix
            nxt = q[m.end():m.end() + 1]
            if not (nxt and (nxt.isalnum() or nxt == "_")):
                toks.append(Token("DUR", m.group(0), i))
                i = m.end()
                continue
        m = _NUM_RE.match(q, i)
        if m and not (c == "." and not q[i + 1:i + 2].isdigit()):
            nxt = q[m.end():m.end() + 1]
            if not (nxt and (nxt.isalpha() or nxt == "_")):
                toks.append(Token("NUM", m.group(0), i))
                i = m.end()
                continue
        m = _IDENT_RE.match(q, i)
        if m:
            toks.append(Token("IDENT", m.group(0), i))
            i = m.end()
            continue
        for op in _OPS:
            if q.startswith(op, i):
                toks.append(Token("OP", op, i))
                i += len(op)
                break
        else:
            raise PromQLSyntaxError(f"unexpected character {c!r} at {i}")
    toks.append(Token("EOF", "", n))
    return toks


# precedence levels (binding powers); higher binds tighter
# lexer keywords (upstream lexer.go key map, matched case-insensitively):
# these can never appear as bare metric names.  start/end are NOT here —
# upstream made them context-dependent (special only after @) so metrics
# named start/end keep working.
_KEYWORDS = frozenset((
    "and", "or", "unless", "atan2", "by", "without", "on", "ignoring",
    "group_left", "group_right", "offset", "bool"))

_PREC = {"or": 1, "and": 2, "unless": 2,
         "==": 3, "!=": 3, "<=": 3, "<": 3, ">=": 3, ">": 3,
         "+": 4, "-": 4,
         "*": 5, "/": 5, "%": 5, "atan2": 5,
         "^": 6}
_RIGHT_ASSOC = {"^"}


class Parser:
    def __init__(self, q: str):
        self.toks = lex(q)
        self.i = 0

    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> Token:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise PromQLSyntaxError(
                f"expected {text or kind}, got {t.text!r} at {t.pos}")
        return t

    # -- expressions ------------------------------------------------------
    def parse_expr(self, min_prec: int = 0) -> Node:
        lhs = self.parse_unary()
        while True:
            t = self.peek()
            # keywords are case-insensitive upstream (lexer.go key lookup
            # via strings.ToLower): AND / Or / UNLESS all lex as operators
            op = (t.text if t.kind == "OP" else
                  t.text.lower() if (t.kind == "IDENT" and t.text.lower() in
                                     ("and", "or", "unless", "atan2"))
                  else None)
            if op not in _PREC or _PREC[op] < min_prec:
                return lhs
            self.next()
            bool_mod = False
            if self.peek().kind == "IDENT" and self.peek().text.lower() == "bool":
                self.next()
                bool_mod = True
                if op not in ("==", "!=", ">", "<", ">=", "<="):
                    raise PromQLSyntaxError(
                        "bool modifier can only be used on comparison operators")
            matching = self._parse_matching()
            if op in ("and", "or", "unless") and matching.card in (
                    "many-to-one", "one-to-many"):
                raise PromQLSyntaxError(
                    "no grouping allowed for set operations")
            nxt_prec = _PREC[op] + (0 if op in _RIGHT_ASSOC else 1)
            rhs = self.parse_expr(nxt_prec)
            if op in ("and", "or", "unless") and not matching.explicit:
                matching.card = "many-to-many"
            lhs = BinaryExpr(op, lhs, rhs, bool_mod, matching)

    def _parse_matching(self) -> VectorMatching:
        vm = VectorMatching()
        t = self.peek()
        if t.kind == "IDENT" and t.text.lower() in ("on", "ignoring"):
            vm.explicit = True
            vm.on = t.text.lower() == "on"
            self.next()
            vm.labels = self._label_list()
            t = self.peek()
            if t.kind == "IDENT" and t.text.lower() in ("group_left",
                                                        "group_right"):
                vm.card = ("many-to-one" if t.text.lower() == "group_left"
                           else "one-to-many")
                self.next()
                if self.peek().kind == "OP" and self.peek().text == "(":
                    vm.include = self._label_list()
        return vm

    def _label_list(self) -> list[str]:
        # label names may be quoted UTF-8 strings (Prometheus 3 syntax:
        # sum by ("label.with.dots") (...)) — the upstream grammar's
        # maybe_label accepts string_identifier alongside identifiers
        self.expect("OP", "(")
        out = []
        while not (self.peek().kind == "OP" and self.peek().text == ")"):
            t = self.next()
            if t.kind not in ("IDENT", "STR"):
                raise PromQLSyntaxError(
                    f"expected label name, got {t.text!r} at {t.pos}")
            if t.kind == "STR" and t.text == "":
                # model.LabelName.IsValid requires non-empty even under the
                # UTF-8 validation scheme — upstream rejects `by ("")`,
                # on(""), group_left("") (mirrors the quoted-metric-name
                # emptiness check in _parse_selector)
                raise PromQLSyntaxError(
                    f"unexpected identifier \"\" at {t.pos}: "
                    "label name cannot be empty")
            out.append(t.text)
            if self.peek().kind == "OP" and self.peek().text == ",":
                self.next()
        self.expect("OP", ")")
        return out

    def parse_unary(self) -> Node:
        t = self.peek()
        if t.kind == "OP" and t.text in ("+", "-"):
            self.next()
            # Prometheus gives unary ops MUL-level precedence
            # ('unary_op expr %prec MUL'): only '^' (prec 6) binds tighter,
            # so '-2^2' = -(2^2) = -4, while '-a*b' still negates just 'a'
            # equivalently.  Parsing the operand at min_prec=6 lets the Pratt
            # loop attach any '^' chain before the negation applies.
            expr = self.parse_expr(6)
            if t.text == "-":
                if isinstance(expr, NumberLiteral):
                    return NumberLiteral(-expr.value)
                return UnaryExpr("-", expr)
            return expr
        return self.parse_postfix()

    # -- duration expressions --------------------------------------------
    # Public PromQL duration-expression feature (Prometheus 3.x,
    # experimental `promql-duration-expr`): arithmetic + - * / % over
    # duration and number literals in range/step positions (delimited by
    # ']'/':') and in parenthesized offsets.  Evaluated at parse time in
    # the seconds domain (numbers are seconds-valued scalars); '^' is
    # rejected because exponentiation has no unit-consistent meaning.

    def _parse_duration_expr(self, min_prec: int = 4) -> float:
        lhs = self._parse_duration_unary()
        while True:
            t = self.peek()
            op = (t.text if t.kind == "OP" and
                  t.text in ("+", "-", "*", "/", "%") else None)
            if op is None or _PREC[op] < min_prec:
                return lhs
            self.next()
            rhs = self._parse_duration_expr(_PREC[op] + 1)
            if op == "+":
                lhs = lhs + rhs
            elif op == "-":
                lhs = lhs - rhs
            elif op == "*":
                lhs = lhs * rhs
            elif op == "/":
                if rhs == 0:
                    raise PromQLSyntaxError("division by zero in duration")
                lhs = lhs / rhs
            else:
                if rhs == 0:
                    raise PromQLSyntaxError("modulo by zero in duration")
                lhs = math.fmod(lhs, rhs)

    def _parse_duration_unary(self) -> float:
        t = self.peek()
        if t.kind == "OP" and t.text in ("+", "-"):
            self.next()
            v = self._parse_duration_unary()
            return -v if t.text == "-" else v
        if t.kind == "OP" and t.text == "(":
            self.next()
            v = self._parse_duration_expr()
            self.expect("OP", ")")
            return v
        t = self.next()
        if t.kind == "DUR":
            return parse_duration_ms(t.text) / 1000.0
        if t.kind == "NUM":
            return (float(int(t.text, 16)) if t.text.startswith("0x")
                    else float(t.text))
        raise PromQLSyntaxError(f"bad duration at {t.pos}")

    def _duration_ms(self, *, positive: bool, what: str) -> int:
        ms = int(round(self._parse_duration_expr() * 1000))
        if positive and ms <= 0:
            raise PromQLSyntaxError(f"{what} must be greater than 0")
        return ms

    def parse_postfix(self) -> Node:
        expr = self.parse_primary()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text == "[":
                self.next()
                rng = self._duration_ms(positive=True, what="range")
                if self.peek().kind == "OP" and self.peek().text == ":":
                    self.next()
                    step = 0
                    if not (self.peek().kind == "OP" and self.peek().text == "]"):
                        step = self._duration_ms(positive=True,
                                                 what="subquery step")
                    self.expect("OP", "]")
                    expr = Subquery(expr, rng, step)
                else:
                    self.expect("OP", "]")
                    if not isinstance(expr, VectorSelector):
                        raise PromQLSyntaxError(
                            "range selector requires a vector selector")
                    expr = MatrixSelector(expr, rng)
            elif t.kind == "IDENT" and t.text.lower() == "offset":
                self.next()
                neg = False
                if self.peek().kind == "OP" and self.peek().text == "-":
                    self.next()
                    neg = True
                if self.peek().kind == "OP" and self.peek().text == "(":
                    # compound offsets need parens: 'foo offset 5m + 10'
                    # must keep parsing as (foo offset 5m) + 10
                    self.next()
                    off = int(round(self._parse_duration_expr() * 1000))
                    self.expect("OP", ")")
                else:
                    ot = self.next()
                    if ot.kind == "DUR":
                        off = parse_duration_ms(ot.text)
                    elif ot.kind == "NUM":
                        off = int(float(ot.text) * 1000)
                    else:
                        raise PromQLSyntaxError(f"bad offset at {ot.pos}")
                if neg:
                    off = -off
                self._apply_offset(expr, off)
            elif t.kind == "OP" and t.text == "@":
                self.next()
                at = self.next()
                if at.kind == "NUM":
                    at_ms = int(float(at.text) * 1000)
                elif at.kind == "IDENT" and at.text.lower() in ("start", "end"):
                    self.expect("OP", "(")
                    self.expect("OP", ")")
                    at_ms = -1 if at.text.lower() == "start" else -2  # sentinels
                else:
                    raise PromQLSyntaxError(f"bad @ modifier at {at.pos}")
                self._apply_at(expr, at_ms)
            else:
                return expr

    def _apply_offset(self, expr: Node, off: int) -> None:
        tgt = expr.selector if isinstance(expr, MatrixSelector) else expr
        if not isinstance(tgt, (VectorSelector, Subquery)):
            raise PromQLSyntaxError("offset only valid on selectors/subqueries")
        if getattr(tgt, "_offset_set", False):
            raise PromQLSyntaxError("offset may not be set multiple times")
        tgt.offset_ms = off
        tgt._offset_set = True

    def _apply_at(self, expr: Node, at_ms: int) -> None:
        tgt = expr.selector if isinstance(expr, MatrixSelector) else expr
        if not isinstance(tgt, (VectorSelector, Subquery)):
            raise PromQLSyntaxError("@ only valid on selectors/subqueries")
        if getattr(tgt, "_at_set", False):
            raise PromQLSyntaxError("@ may not be set multiple times")
        tgt.at_ms = at_ms
        tgt._at_set = True

    def parse_primary(self) -> Node:
        t = self.next()
        if t.kind == "NUM":
            return NumberLiteral(float(int(t.text, 16)) if
                                 t.text.startswith("0x") else float(t.text))
        if t.kind == "STR":
            return StringLiteral(t.text)
        if t.kind == "OP" and t.text == "(":
            e = self.parse_expr()
            self.expect("OP", ")")
            return e
        if t.kind == "OP" and t.text == "{":
            self.i -= 1
            return self._parse_selector(None)
        if t.kind == "IDENT":
            name = t.text
            low = name.lower()
            if low in ("inf", "nan"):
                return NumberLiteral(float(low))
            nxt = self.peek()
            if low in AGGREGATION_OPS and (
                    nxt.kind == "OP" and nxt.text == "(" or
                    (nxt.kind == "IDENT" and
                     nxt.text.lower() in ("by", "without"))):
                return self._parse_aggregation(low)
            # upstream lexes keywords (and aggregator names) regardless of
            # context, so a bare keyword is never a metric name — reject
            # like the upstream parser ({__name__="and"} still selects it)
            if low in _KEYWORDS or low in AGGREGATION_OPS:
                raise PromQLSyntaxError(
                    f"unexpected keyword {name!r} at {t.pos}")
            if nxt.kind == "OP" and nxt.text == "(":
                return self._parse_call(name)
            return self._parse_selector(name)
        raise PromQLSyntaxError(f"unexpected token {t.text!r} at {t.pos}")

    def _parse_aggregation(self, op: str) -> Node:
        grouping: list[str] = []
        without = False
        has_grouping = False
        if (self.peek().kind == "IDENT"
                and self.peek().text.lower() in ("by", "without")):
            without = self.next().text.lower() == "without"
            grouping = self._label_list()
            has_grouping = True
        self.expect("OP", "(")
        args = [self.parse_expr()]
        while self.peek().kind == "OP" and self.peek().text == ",":
            self.next()
            args.append(self.parse_expr())
        self.expect("OP", ")")
        if (self.peek().kind == "IDENT"
                and self.peek().text.lower() in ("by", "without")):
            without = self.next().text.lower() == "without"
            grouping = self._label_list()
            has_grouping = True
        if op in PARAM_AGGREGATIONS:
            if len(args) != 2:
                raise PromQLSyntaxError(f"{op} expects (param, vector)")
            param, expr = args
        else:
            if len(args) != 1:
                raise PromQLSyntaxError(f"{op} expects 1 argument")
            param, expr = None, args[0]
        return Aggregation(op, expr, param, grouping, without, has_grouping)

    def _parse_call(self, func: str) -> Node:
        self.expect("OP", "(")
        args: list[Node] = []
        if not (self.peek().kind == "OP" and self.peek().text == ")"):
            args.append(self.parse_expr())
            while self.peek().kind == "OP" and self.peek().text == ",":
                self.next()
                args.append(self.parse_expr())
        self.expect("OP", ")")
        return Call(func, args)

    def _parse_selector(self, name: str | None) -> VectorSelector:
        matchers: list[Matcher] = []
        quoted_name: str | None = None
        if self.peek().kind == "OP" and self.peek().text == "{":
            self.next()
            while not (self.peek().kind == "OP" and self.peek().text == "}"):
                lbl_tok = self.next()
                if lbl_tok.kind not in ("IDENT", "STR"):
                    raise PromQLSyntaxError(f"bad matcher label at {lbl_tok.pos}")
                nxt = self.peek()
                if (lbl_tok.kind == "STR"
                        and not (nxt.kind == "OP"
                                 and nxt.text in ("=", "!=", "=~", "!~"))):
                    # bare quoted string = UTF-8 metric name (Prometheus 3:
                    # {"http.requests.total", env="prod"}); the upstream
                    # grammar's label_matcher accepts a lone
                    # string_identifier anywhere in the list, at most once
                    if quoted_name is not None or name is not None:
                        raise PromQLSyntaxError(
                            "metric name must not be set twice: "
                            f"{(name or quoted_name)!r} and {lbl_tok.text!r}")
                    quoted_name = lbl_tok.text
                else:
                    op_tok = self.next()
                    if op_tok.text not in ("=", "!=", "=~", "!~"):
                        raise PromQLSyntaxError(f"bad matcher op at {op_tok.pos}")
                    val = self.expect("STR").text
                    matchers.append(Matcher(lbl_tok.text, op_tok.text, val))
                nxt = self.peek()
                if nxt.kind == "OP" and nxt.text == ",":
                    self.next()  # trailing comma before '}' is allowed
                elif not (nxt.kind == "OP" and nxt.text == "}"):
                    raise PromQLSyntaxError(
                        f"expected ',' or '}}' in matchers, got "
                        f"{nxt.text!r} at {nxt.pos}")
            self.expect("OP", "}")
        if quoted_name is not None:
            if quoted_name == "":
                raise PromQLSyntaxError("metric name must not be empty")
            name = quoted_name
        if name is None and not matchers:
            raise PromQLSyntaxError("empty selector")
        if name is not None and any(m.label == "__name__" for m in matchers):
            # upstream parser: "metric name must not be set twice"
            raise PromQLSyntaxError(
                f"metric name must not be set twice: {name!r} and __name__")
        if name is None and all(_matches_empty(m) for m in matchers):
            # upstream parser.go checkAST: a selector whose every matcher
            # accepts the empty string would match every series
            raise PromQLSyntaxError(
                "vector selector must contain at least one non-empty matcher")
        return VectorSelector(name, matchers)


def _matches_empty(m: Matcher) -> bool:
    """Does this matcher accept the empty string (≡ label absent)?
    Mirrors upstream labels.Matcher.Matches("") for the parse-time
    non-empty-matcher validation.  An invalid regex is a parse error, like
    the upstream lexer-stage regex compilation."""
    import re as _re
    if m.op == "=":
        return m.value == ""
    if m.op == "!=":
        return m.value != ""
    try:
        hit = _re.fullmatch(f"(?:{m.value})", "") is not None
    except _re.error as e:
        raise PromQLSyntaxError(f"invalid regex in matcher: {e}") from None
    return hit if m.op == "=~" else not hit


def parse(q: str) -> Node:
    p = Parser(q)
    expr = p.parse_expr()
    if p.peek().kind != "EOF":
        t = p.peek()
        raise PromQLSyntaxError(f"trailing input {t.text!r} at {t.pos}")
    return expr
