"""govaluate-expression → PySpark ``Column`` translator.

The reference's filter stage and ``branch`` transform evaluate
`Knetic/govaluate` v3 boolean expressions per record
(reference: internal/app/app.go:150-164, internal/transform/transform.go:246-308).
This module compiles the same grammar into a single Catalyst ``Column``
expression tree, so filters become codegen-able predicates that Catalyst
can push into the Parquet/JDBC scan — the opposite of the reference's
per-record interpreted evaluation.

Supported surface (the public govaluate v3 grammar, per SURVEY.md §2.4):
  comparators   == != < > <= >=
  logical       && || !
  arithmetic    + - * / % **   (numeric ops in double, govaluate semantics)
  bitwise       & | ^ << >> ~  (int64 semantics)
  ternary       cond ? a : b   and null-coalesce  a ?? b
  regex         =~  !~
  membership    x IN (a, b, c)
  literals      'single' / "double" strings, numbers, true/false
  parameters    bare identifiers (dots allowed) or [bracketed names]

Typing: govaluate converts every number to float64. We reproduce that by
casting both operands of arithmetic and of numeric comparisons to double;
comparisons where either side is a string literal stay string-typed.
Eval errors (type mismatch per record) make the reference *skip* the
record — our null-propagating Columns behave the same under ``filter``
(null predicate ⇒ row dropped).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["translate", "compile_filter", "ExprError"]


class ExprError(ValueError):
    """Raised at plan time for unparseable expressions (mirrors the
    reference's config-validation-time expression pre-compilation,
    internal/config/validation.go:62-66)."""


# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<sq>'(?:\\.|[^'\\])*')
  | (?P<dq>"(?:\\.|[^"\\])*")
  | (?P<brak>\[(?:\\.|[^\]\\])*\])
  | (?P<op>\*\*|<<|>>|<=|>=|==|!=|&&|\|\||=~|!~|\?\?|[-+*/%&|^~<>!?:(),])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str  # 'num' | 'str' | 'ident' | 'op' | 'bool' | 'in' | 'eof'
    value: object
    pos: int


def _tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ExprError(f"unexpected character {src[i]!r} at {i} in {src!r}")
        i = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "num":
            toks.append(Tok("num", float(text), m.start()))
        elif kind in ("sq", "dq"):
            body = text[1:-1]
            # unescape only quote/backslash escapes — backslashes that are
            # part of regex patterns (\S, \d …) must survive verbatim
            body = re.sub(r"\\(['\"\\])", r"\1", body)
            toks.append(Tok("str", body, m.start()))
        elif kind == "brak":
            toks.append(Tok("ident", text[1:-1], m.start()))
        elif kind == "ident":
            low = text.lower()
            if low in ("true", "false"):
                toks.append(Tok("bool", low == "true", m.start()))
            elif low == "in":
                toks.append(Tok("in", "IN", m.start()))
            else:
                toks.append(Tok("ident", text, m.start()))
        else:
            toks.append(Tok("op", text, m.start()))
    toks.append(Tok("eof", None, len(src)))
    return toks


# --------------------------------------------------------------------------
# Parser → Column (Pratt / precedence-climbing)
# --------------------------------------------------------------------------

# value wrapper so we can keep literal type info for typing decisions
@dataclass
class Val:
    col: Column
    lit_kind: str | None = None  # 'num' | 'str' | 'bool' | None (column/expr)
    lit_value: object = None


def _num(v: Val) -> Column:
    """Coerce an operand to double (govaluate float64 arithmetic).
    try_cast keeps the plan ANSI-safe: an unparseable value yields null —
    the reference's eval-error-skips-record behavior under filter."""
    if v.lit_kind == "num":
        return F.lit(float(v.lit_value))
    return v.col.try_cast("double")


def _int(v: Val) -> Column:
    if v.lit_kind == "num":
        return F.lit(int(v.lit_value))
    return v.col.try_cast("long")


class _Parser:
    def __init__(self, toks: list[Tok], src: str, resolver=None):
        self.toks = toks
        self.i = 0
        self.src = src
        self.resolver = resolver  # optional name -> Column (e.g. `inputValue`)

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_op(self, op: str) -> None:
        t = self.next()
        if t.kind != "op" or t.value != op:
            raise ExprError(f"expected {op!r} at {t.pos} in {self.src!r}")

    # precedence levels, low → high
    def parse(self) -> Val:
        v = self.ternary()
        t = self.peek()
        if t.kind != "eof":
            raise ExprError(f"trailing tokens at {t.pos} in {self.src!r}")
        return v

    def ternary(self) -> Val:
        cond = self.coalesce()
        t = self.peek()
        if t.kind == "op" and t.value == "?":
            self.next()
            a = self.ternary()
            self.expect_op(":")
            b = self.ternary()
            return Val(F.when(cond.col, a.col).otherwise(b.col))
        return cond

    def coalesce(self) -> Val:
        left = self.logical_or()
        while self.peek().kind == "op" and self.peek().value == "??":
            self.next()
            right = self.logical_or()
            left = Val(F.coalesce(left.col, right.col))
        return left

    def logical_or(self) -> Val:
        left = self.logical_and()
        while self.peek().kind == "op" and self.peek().value == "||":
            self.next()
            right = self.logical_and()
            left = Val(left.col | right.col)
        return left

    def logical_and(self) -> Val:
        left = self.comparison()
        while self.peek().kind == "op" and self.peek().value == "&&":
            self.next()
            right = self.comparison()
            left = Val(left.col & right.col)
        return left

    _CMP = {"==", "!=", "<", ">", "<=", ">=", "=~", "!~"}

    def comparison(self) -> Val:
        left = self.bitwise()
        while True:
            t = self.peek()
            if t.kind == "in":
                self.next()
                items = self._array()
                left = Val(left.col.isin(*items))
                continue
            if t.kind != "op" or t.value not in self._CMP:
                return left
            op = self.next().value
            right = self.bitwise()
            left = Val(self._cmp(op, left, right))

    @staticmethod
    def _cmp(op: str, lv: Val, rv: Val) -> Column:
        if op in ("=~", "!~"):
            if rv.lit_kind != "str":
                raise ExprError("right side of =~/!~ must be a string literal")
            m = lv.col.rlike(str(rv.lit_value))
            return m if op == "=~" else ~m
        # numeric comparison if either side is a numeric literal (govaluate
        # compares numbers as float64); string-literal side keeps strings.
        if lv.lit_kind == "num" or rv.lit_kind == "num":
            l, r = _num(lv), _num(rv)
        else:
            l, r = lv.col, rv.col
        return {
            "==": l == r, "!=": l != r, "<": l < r,
            ">": l > r, "<=": l <= r, ">=": l >= r,
        }[op]

    def bitwise(self) -> Val:
        left = self.shift()
        while self.peek().kind == "op" and self.peek().value in ("&", "|", "^"):
            op = self.next().value
            right = self.shift()
            l, r = _int(left), _int(right)
            col = {"&": l.bitwiseAND(r), "|": l.bitwiseOR(r), "^": l.bitwiseXOR(r)}[op]
            left = Val(col)
        return left

    def shift(self) -> Val:
        left = self.additive()
        while self.peek().kind == "op" and self.peek().value in ("<<", ">>"):
            op = self.next().value
            right = self.additive()
            if right.lit_kind == "num":  # F.shiftleft needs a Python int
                fn = F.shiftleft if op == "<<" else F.shiftright
                left = Val(fn(_int(left), int(right.lit_value)))
            else:
                p = F.pow(F.lit(2.0), _num(right))
                l = _int(left).cast("double")
                col = (l * p) if op == "<<" else F.floor(F.try_divide(l, p))
                left = Val(col.cast("long"))
        return left

    def additive(self) -> Val:
        left = self.multiplicative()
        while self.peek().kind == "op" and self.peek().value in ("+", "-"):
            op = self.next().value
            right = self.multiplicative()
            if op == "+" and (left.lit_kind == "str" or right.lit_kind == "str"):
                # govaluate '+' on strings concatenates
                left = Val(F.concat(left.col.cast("string"), right.col.cast("string")))
            else:
                l, r = _num(left), _num(right)
                left = Val(l + r if op == "+" else l - r)
        return left

    def multiplicative(self) -> Val:
        left = self.exponent()
        while self.peek().kind == "op" and self.peek().value in ("*", "/", "%"):
            op = self.next().value
            right = self.exponent()
            l, r = _num(left), _num(right)
            # try_* variants keep the plan ANSI-safe: a zero divisor yields
            # null (⇒ record skipped under filter), matching the reference's
            # skip-on-eval-error behavior rather than failing the job.
            col = {"*": l * r, "/": F.try_divide(l, r), "%": F.try_mod(l, r)}[op]
            left = Val(col)
        return left

    def exponent(self) -> Val:
        left = self.unary()
        if self.peek().kind == "op" and self.peek().value == "**":
            self.next()
            right = self.exponent()  # right-assoc
            # NaN (e.g. negative base with fractional exponent) → null:
            # Spark orders NaN above every value, so a raw NaN would make
            # comparisons TRUE where govaluate's Go semantics yield false;
            # null instead drops the row like any other eval error.
            p = F.pow(_num(left), _num(right))
            return Val(F.nanvl(p, F.lit(None).cast("double")))
        return left

    def unary(self) -> Val:
        t = self.peek()
        if t.kind == "op" and t.value in ("-", "!", "~"):
            self.next()
            operand = self.unary()
            if t.value == "-":
                if operand.lit_kind == "num":
                    return Val(F.lit(-float(operand.lit_value)), "num", -float(operand.lit_value))
                return Val(-_num(operand))
            if t.value == "!":
                return Val(~operand.col)
            return Val(_int(operand).bitwiseXOR(F.lit(-1)))  # ~x
        return self.primary()

    def primary(self) -> Val:
        t = self.next()
        if t.kind == "num":
            fv = float(t.value)
            return Val(F.lit(fv), "num", fv)
        if t.kind == "str":
            return Val(F.lit(t.value), "str", t.value)
        if t.kind == "bool":
            return Val(F.lit(t.value), "bool", t.value)
        if t.kind == "ident":
            name = str(t.value)
            if self.resolver is not None:
                resolved = self.resolver(name)
                if resolved is not None:
                    return Val(resolved)
            if "." in name or " " in name or "-" in name:
                return Val(F.col(f"`{name}`"))
            return Val(F.col(name))
        if t.kind == "op" and t.value == "(":
            v = self.ternary()
            self.expect_op(")")
            return v
        raise ExprError(f"unexpected token {t.value!r} at {t.pos} in {self.src!r}")

    def _array(self) -> list[object]:
        """Parse the literal list after IN: (a, b, c)."""
        self.expect_op("(")
        items: list[object] = []
        while True:
            t = self.next()
            if t.kind in ("num", "str", "bool"):
                items.append(t.value)
            else:
                raise ExprError(f"IN list supports literals only (at {t.pos})")
            t = self.next()
            if t.kind == "op" and t.value == ",":
                continue
            if t.kind == "op" and t.value == ")":
                return items
            raise ExprError(f"expected ',' or ')' at {t.pos} in {self.src!r}")


def translate(expression: str, resolver=None) -> Column:
    """Compile a govaluate expression string into a PySpark Column.

    ``resolver(name) -> Column | None`` optionally intercepts identifier
    lookup (used for ``inputValue`` inside branch conditions,
    transform.go:262-270)."""
    if not expression or not expression.strip():
        raise ExprError("empty expression")
    return _Parser(_tokenize(expression), expression, resolver).parse().col


def compile_filter(expression: str) -> Column:
    """Compile a filter expression; rows where it is null (eval error in the
    reference ⇒ record skipped, app.go:156-161) are dropped by ``filter``."""
    return translate(expression)
