"""SQL-subset predicate compiler → ``pyarrow.dataset`` expressions.

The reference applies the YAML ``filter`` string as a SQL WHERE clause on
the warehouse (``validation.sql.j2:104-119``). We have no SQL engine in
the data path, so we compile a typed predicate subset to Arrow dataset
expressions — which also pushes down to Parquet row groups at read time
(``ray.data.read_parquet(..., filter=expr)``).

Supported grammar::

    expr      := or_expr
    or_expr   := and_expr ( OR and_expr )*
    and_expr  := unary ( AND unary )*
    unary     := NOT unary | '(' expr ')' | predicate
    predicate := col op literal
               | col IS [NOT] NULL
               | col [NOT] IN '(' literal (',' literal)* ')'
               | col BETWEEN literal AND literal
               | col [NOT] LIKE 'pattern'
    op        := = | == | != | <> | < | <= | > | >=
    literal   := date_term [ ('+'|'-') INTERVAL number unit ]
    date_term := number | 'string' | TRUE | FALSE | NULL
               | TIMESTAMP 'iso' | DATE 'iso'
               | CURRENT_DATE['()'] | CURRENT_TIMESTAMP['()'] | NOW'()'
               | DATE_SUB '(' date_term ',' number ')'
               | DATE_ADD '(' date_term ',' number ')'
    unit      := DAY[S] | WEEK[S] | HOUR[S] | MINUTE[S] | SECOND[S]

String literals compared against timestamp/date columns are coerced using
the table schema. The original string is preserved verbatim for the DuckDB
oracle side.

Relative-date terms (``current_date() - INTERVAL 7 DAY``,
``date_sub(current_date(), 60)`` — the forms the reference demo's task
filters use, ``demo/demo_config.yml:75-76,344-345,381-383``) are folded
to a concrete literal at PLAN time, mirroring warehouse constant folding.
"Now" is ``datetime.now(UTC)`` unless the ``DATAPACT_NOW`` env var pins
an ISO instant (tests / reproducible runs / the DuckDB oracle side).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>'(?:[^']|'')*')
      | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<op><=|>=|<>|!=|==|=|<|>)
      | (?P<arith>[+-])
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<ident>`[^`]+`|[A-Za-z_][A-Za-z_0-9.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "IS", "NULL", "IN", "BETWEEN", "LIKE",
    "TRUE", "FALSE", "TIMESTAMP", "DATE",
    "CURRENT_DATE", "CURRENT_TIMESTAMP", "NOW", "INTERVAL",
    "DATE_SUB", "DATE_ADD",
}

_INTERVAL_UNITS = {
    "DAY": 86400.0, "DAYS": 86400.0,
    "WEEK": 604800.0, "WEEKS": 604800.0,
    "HOUR": 3600.0, "HOURS": 3600.0,
    "MINUTE": 60.0, "MINUTES": 60.0,
    "SECOND": 1.0, "SECONDS": 1.0,
}


@dataclass
class _Tok:
    kind: str  # string|number|op|arith|lparen|rparen|comma|ident|kw
    value: str
    raw: str = ""  # original spelling (kw tokens: pre-uppercase text)


def _now() -> datetime:
    """Plan-time 'now' (naive UTC, like the fixture timestamps).
    ``DATAPACT_NOW`` (ISO-8601) pins it for reproducible runs and for
    rendering the identical constant into oracle SQL."""
    import os

    pinned = os.environ.get("DATAPACT_NOW")
    if pinned:
        return datetime.fromisoformat(pinned)
    from datetime import timezone

    return datetime.now(timezone.utc).replace(tzinfo=None)


def _shift_lit(lit: Lit, seconds: float) -> Lit:
    """Fold ``date/timestamp literal ± seconds`` into a new literal.
    Whole-day shifts of a DATE stay a DATE (Spark date_sub semantics);
    anything else promotes to timestamp."""
    if not isinstance(lit.value, str) or lit.hint not in ("date", "timestamp"):
        raise ValueError("INTERVAL/date arithmetic needs a DATE/TIMESTAMP operand")
    from datetime import timedelta

    dt = datetime.fromisoformat(lit.value) + timedelta(seconds=seconds)
    if lit.hint == "date" and seconds == int(seconds) and int(seconds) % 86400 == 0:
        return Lit(dt.date().isoformat(), hint="date")
    return Lit(dt.isoformat(), hint="timestamp")


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise ValueError(f"Cannot tokenize filter at: {text[pos:]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        value = m.group(kind)
        if kind == "ident" and value.upper() in _KEYWORDS:
            toks.append(_Tok("kw", value.upper(), raw=value))
        else:
            toks.append(_Tok(kind, value))
    return toks


# ---- AST ----


@dataclass
class Col:
    name: str


@dataclass
class Lit:
    value: object
    hint: str | None = None  # "timestamp" | "date" | None


@dataclass
class Cmp:
    op: str
    col: Col
    lit: Lit


@dataclass
class IsNull:
    col: Col
    negate: bool


@dataclass
class In:
    col: Col
    lits: list[Lit]
    negate: bool


@dataclass
class Between:
    col: Col
    lo: Lit
    hi: Lit


@dataclass
class Like:
    col: Col
    pattern: str
    negate: bool


@dataclass
class Not:
    child: object


@dataclass
class BoolOp:
    op: str  # "and" | "or"
    children: list


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        tok = self.peek()
        if tok is None:
            raise ValueError("Unexpected end of filter expression")
        self.i += 1
        return tok

    def expect_kw(self, kw: str) -> None:
        tok = self.next()
        if tok.kind != "kw" or tok.value != kw:
            raise ValueError(f"Expected {kw}, got {tok.value!r}")

    def parse(self):
        node = self.parse_or()
        if self.peek() is not None:
            raise ValueError(f"Trailing tokens in filter: {self.peek().value!r}")
        return node

    def parse_or(self):
        children = [self.parse_and()]
        while (t := self.peek()) and t.kind == "kw" and t.value == "OR":
            self.next()
            children.append(self.parse_and())
        return children[0] if len(children) == 1 else BoolOp("or", children)

    def parse_and(self):
        children = [self.parse_unary()]
        while (t := self.peek()) and t.kind == "kw" and t.value == "AND":
            self.next()
            children.append(self.parse_unary())
        return children[0] if len(children) == 1 else BoolOp("and", children)

    def parse_unary(self):
        t = self.peek()
        if t and t.kind == "kw" and t.value == "NOT":
            self.next()
            return Not(self.parse_unary())
        if t and t.kind == "lparen":
            self.next()
            node = self.parse_or()
            tok = self.next()
            if tok.kind != "rparen":
                raise ValueError("Expected ')'")
            return node
        return self.parse_predicate()

    _COLUMN_OK_KEYWORDS = frozenset(
        # function-like / literal-prefix keywords are unambiguous in
        # column position (a column named `interval` or `now` is legal in
        # event schemas); structural keywords (AND, NOT, IS, ...) stay
        # reserved. Backtick quoting remains the escape hatch for those.
        {"CURRENT_DATE", "CURRENT_TIMESTAMP", "NOW", "INTERVAL",
         "DATE_SUB", "DATE_ADD", "TIMESTAMP", "DATE"}
    )

    def _ident(self) -> Col:
        tok = self.next()
        if tok.kind == "kw" and tok.value in self._COLUMN_OK_KEYWORDS:
            return Col(tok.raw)  # original spelling — columns are case-sensitive
        if tok.kind != "ident":
            raise ValueError(f"Expected column name, got {tok.value!r}")
        name = tok.value
        if name.startswith("`"):
            name = name[1:-1]
        return Col(name)

    def _literal(self) -> Lit:
        return self._maybe_interval(self._date_term())

    def _date_term(self) -> Lit:
        tok = self.next()
        if tok.kind == "number":
            text = tok.value
            return Lit(float(text) if re.search(r"[.eE]", text) else int(text))
        if tok.kind == "string":
            return Lit(tok.value[1:-1].replace("''", "'"))
        if tok.kind == "kw":
            if tok.value == "NULL":
                return Lit(None)
            if tok.value == "TRUE":
                return Lit(True)
            if tok.value == "FALSE":
                return Lit(False)
            if tok.value in ("TIMESTAMP", "DATE"):
                s = self.next()
                if s.kind != "string":
                    raise ValueError(f"Expected string after {tok.value}")
                return Lit(s.value[1:-1], hint=tok.value.lower())
            if tok.value in ("CURRENT_DATE", "CURRENT_TIMESTAMP", "NOW"):
                self._skip_empty_parens(required=tok.value == "NOW")
                now = _now()
                if tok.value == "CURRENT_DATE":
                    day = now.replace(hour=0, minute=0, second=0, microsecond=0)
                    return Lit(day.isoformat(), hint="date")
                return Lit(now.isoformat(), hint="timestamp")
            if tok.value in ("DATE_SUB", "DATE_ADD"):
                # Spark form: date_sub(d, n_days)
                if self.next().kind != "lparen":
                    raise ValueError(f"Expected '(' after {tok.value}")
                base = self._date_term()
                if self.next().kind != "comma":
                    raise ValueError(f"Expected ',' in {tok.value}(...)")
                days = self._date_term()
                if self.next().kind != "rparen":
                    raise ValueError(f"Expected ')' to close {tok.value}(...)")
                if not isinstance(days.value, int):
                    raise ValueError(f"{tok.value} day count must be an integer")
                sign = -1 if tok.value == "DATE_SUB" else 1
                return _shift_lit(base, sign * days.value * 86400.0)
        raise ValueError(f"Expected literal, got {tok.value!r}")

    def _skip_empty_parens(self, required: bool) -> None:
        t = self.peek()
        if t and t.kind == "lparen":
            self.next()
            if self.next().kind != "rparen":
                raise ValueError("Expected '()'")
        elif required:
            raise ValueError("Expected '()'")

    def _maybe_interval(self, lit: Lit) -> Lit:
        t = self.peek()
        if not (t and t.kind == "arith"):
            return lit
        sign = -1 if t.value == "-" else 1
        self.next()
        self.expect_kw("INTERVAL")
        n = self.next()
        if n.kind != "number":
            raise ValueError("Expected number after INTERVAL")
        unit = self.next()
        key = unit.value.upper() if unit.kind == "ident" else ""
        if key not in _INTERVAL_UNITS:
            raise ValueError(f"Unsupported INTERVAL unit {unit.value!r}")
        seconds = sign * float(n.value) * _INTERVAL_UNITS[key]
        return self._maybe_interval(_shift_lit(lit, seconds))

    def parse_predicate(self):
        col = self._ident()
        tok = self.next()
        negate = False
        if tok.kind == "kw" and tok.value == "NOT":
            negate = True
            tok = self.next()
        if tok.kind == "op":
            return Cmp(tok.value, col, self._literal())
        if tok.kind == "kw" and tok.value == "IS":
            nxt = self.next()
            neg = False
            if nxt.kind == "kw" and nxt.value == "NOT":
                neg = True
                nxt = self.next()
            if nxt.kind != "kw" or nxt.value != "NULL":
                raise ValueError("Expected NULL after IS [NOT]")
            return IsNull(col, neg)
        if tok.kind == "kw" and tok.value == "IN":
            tok = self.next()
            if tok.kind != "lparen":
                raise ValueError("Expected '(' after IN")
            lits = [self._literal()]
            while (t := self.peek()) and t.kind == "comma":
                self.next()
                lits.append(self._literal())
            tok = self.next()
            if tok.kind != "rparen":
                raise ValueError("Expected ')' to close IN list")
            return In(col, lits, negate)
        if tok.kind == "kw" and tok.value == "BETWEEN":
            lo = self._literal()
            self.expect_kw("AND")
            hi = self._literal()
            node = Between(col, lo, hi)
            return Not(node) if negate else node
        if tok.kind == "kw" and tok.value == "LIKE":
            lit = self._literal()
            if not isinstance(lit.value, str):
                raise ValueError("LIKE pattern must be a string literal")
            return Like(col, lit.value, negate)
        raise ValueError(f"Unsupported predicate near {tok.value!r}")


def parse_filter(text: str):
    """Parse a filter string into an AST (raises ValueError on bad input)."""
    return _Parser(_tokenize(text)).parse()


def _coerce(lit: Lit, typ: pa.DataType | None):
    v = lit.value
    if v is None:
        return None
    if lit.hint in ("timestamp", "date") or (
        typ is not None and (pa.types.is_timestamp(typ) or pa.types.is_date(typ))
    ):
        if isinstance(v, str):
            dt = datetime.fromisoformat(v)
            return pa.scalar(dt, type=typ if typ is not None else pa.timestamp("us"))
    if typ is not None:
        try:
            return pa.scalar(v, type=typ)
        except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
            return v
    return v


def compile_to_arrow(node, schema: pa.Schema | None = None):
    """Compile an AST to a ``pyarrow.dataset`` Expression usable both as a
    read_parquet row filter (row-group pushdown) and with ``Table.filter``."""

    def col_type(name: str):
        if schema is not None and name in schema.names:
            return schema.field(name).type
        return None

    def go(n):
        if isinstance(n, BoolOp):
            parts = [go(c) for c in n.children]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if n.op == "and" else (out | p)
            return out
        if isinstance(n, Not):
            return ~go(n.child)
        if isinstance(n, Cmp):
            f = pc.field(n.col.name)
            v = _coerce(n.lit, col_type(n.col.name))
            return {
                "=": f == v, "==": f == v, "!=": f != v, "<>": f != v,
                "<": f < v, "<=": f <= v, ">": f > v, ">=": f >= v,
            }[n.op]
        if isinstance(n, IsNull):
            f = pc.field(n.col.name)
            return ~f.is_null() if n.negate else f.is_null()
        if isinstance(n, In):
            typ = col_type(n.col.name)
            vals = [_coerce(lit, typ) for lit in n.lits]
            scalars = [v.as_py() if isinstance(v, pa.Scalar) else v for v in vals]
            e = pc.field(n.col.name).isin(scalars)
            return ~e if n.negate else e
        if isinstance(n, Between):
            typ = col_type(n.col.name)
            f = pc.field(n.col.name)
            return (f >= _coerce(n.lo, typ)) & (f <= _coerce(n.hi, typ))
        if isinstance(n, Like):
            e = pc.match_like(pc.field(n.col.name), n.pattern)
            return ~e if n.negate else e
        raise TypeError(f"Unknown AST node {n!r}")

    return go(node)


def compile_filter(text: str | None, schema: pa.Schema | None = None):
    """Convenience: parse + compile; None/blank returns None."""
    if text is None or not text.strip():
        return None
    return compile_to_arrow(parse_filter(text), schema)


def referenced_columns(node) -> set[str]:
    """Column names referenced by the predicate (for read pruning)."""
    out: set[str] = set()

    def go(n):
        if isinstance(n, BoolOp):
            for c in n.children:
                go(c)
        elif isinstance(n, Not):
            go(n.child)
        elif isinstance(n, (Cmp, IsNull, In, Between, Like)):
            out.add(n.col.name)

    go(node)
    return out
