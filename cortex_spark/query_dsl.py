"""Query DSL: string → AST → NodeFilter → PySpark Column (SURVEY §2.2 F1/F3).

Re-implements the reference's lexer / recursive-descent parser / compiler
(query/mod.rs:140-297 lexer, 303-576 parser, 584-625 durations, 676-842
compile) with identical grammar and compile-mode restrictions:

    expr   := or ;  or := and ("OR" and)* ;  and := unary ("AND" unary)*
    unary  := "NOT" atom | atom ;  atom := "(" expr ")" | field
    fields := kind:a,b | tags:x,y | agent:w | importance{>,>=,=,<,<=}0.7
              | created_after:7d|ISO | created_before:... | deleted:bool
              | limit:n

Two compile targets:
- compile_filter(ast) → NodeFilter dataclass, reproducing the reference's
  restrictions (OR only within kind/tags, NOT only on deleted,
  importance </<= rejected, > and = approximated as min_importance).
- compile_column(ast) → pyspark Column — strictly MORE expressive (arbitrary
  OR/NOT become `|`/`~`), the Spark-native mode.

`now` is injectable for the relative durations (7d/24h/30m) so query
compilation is reproducible (reference uses Utc::now(), query/mod.rs:612 —
SURVEY §7 hard part 4).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ParseError(ValueError):
    def __init__(self, message: str, position: int) -> None:
        super().__init__(f"Parse error at position {position}: {message}")
        self.position = position


class CompileError(ValueError):
    pass


# --- AST ---------------------------------------------------------------


@dataclass
class Field:
    name: str  # kind|tags|agent|importance|created_after|created_before|deleted|limit
    value: object
    op: str | None = None  # importance only: > >= = < <=


@dataclass
class And:
    left: object
    right: object


@dataclass
class Or:
    left: object
    right: object


@dataclass
class Not:
    inner: object


# --- Lexer (query/mod.rs:140-297) ---------------------------------------

_OPS = {">": ">", ">=": ">=", "=": "=", "<": "<", "<=": "<="}


def _tokenize(s: str) -> list[tuple[str, object, int]]:
    toks: list[tuple[str, object, int]] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        start = i
        if c in ":,()":
            toks.append(({":": "colon", ",": "comma", "(": "lparen", ")": "rparen"}[c], c, start))
            i += 1
        elif c in "><":
            if i + 1 < n and s[i + 1] == "=":
                toks.append(("op", c + "=", start))
                i += 2
            else:
                toks.append(("op", c, start))
                i += 1
        elif c == "=":
            toks.append(("op", "=", start))
            i += 1
        elif c.isdigit() or c == ".":
            j = i
            while j < n and (s[j].isdigit() or s[j] == "."):
                j += 1
            if j < n and (s[j].isalpha() or s[j] == "-"):  # 7d / 24h / ISO date → word
                while j < n and not s[j].isspace() and s[j] not in ",()":
                    j += 1
                toks.append(("word", s[i:j], start))
            else:
                try:
                    toks.append(("number", float(s[i:j]), start))
                except ValueError:
                    raise ParseError(f"Invalid number: {s[i:j]}", start) from None
            i = j
        elif c.isalnum() or c in "_-":
            j = i
            while j < n and (s[j].isalnum() or s[j] in "_-."):
                j += 1
            w = s[i:j]
            if w in ("AND", "OR", "NOT"):
                toks.append((w.lower(), w, start))
            else:
                toks.append(("word", w, start))
            i = j
        else:
            raise ParseError(f"Unexpected character: '{c}'", start)
    return toks


# --- Parser (query/mod.rs:303-576) ---------------------------------------


class _Parser:
    def __init__(self, toks, now: datetime) -> None:
        self.toks = toks
        self.pos = 0
        self.now = now

    def _peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def _advance(self):
        t = self._peek()
        if t is not None:
            self.pos += 1
        return t

    def _expect(self, kind: str):
        t = self._peek()
        if t is None:
            raise ParseError(f"Expected {kind}, found end of input", self._cur())
        if t[0] != kind:
            raise ParseError(f"Expected {kind}, found {t[1]!r}", t[2])
        return self._advance()

    def _cur(self) -> int:
        if self.pos < len(self.toks):
            return self.toks[self.pos][2]
        return (self.toks[-1][2] + 1) if self.toks else 0

    def expr(self):
        left = self.and_()
        while (t := self._peek()) and t[0] == "or":
            self._advance()
            left = Or(left, self.and_())
        return left

    def and_(self):
        left = self.unary()
        while (t := self._peek()) and t[0] == "and":
            self._advance()
            left = And(left, self.unary())
        return left

    def unary(self):
        if (t := self._peek()) and t[0] == "not":
            self._advance()
            return Not(self.atom())
        return self.atom()

    def atom(self):
        if (t := self._peek()) and t[0] == "lparen":
            self._advance()
            e = self.expr()
            self._expect("rparen")
            return e
        return self.field()

    def _comma_values(self) -> list[str]:
        vals = [self._value_word()]
        while (t := self._peek()) and t[0] == "comma":
            self._advance()
            vals.append(self._value_word())
        return vals

    def _value_word(self) -> str:
        t = self._advance()
        if t is None:
            raise ParseError("Expected value, found end of input", self._cur())
        if t[0] == "word":
            return str(t[1])
        if t[0] == "number":
            v = t[1]
            return str(int(v)) if float(v).is_integer() else str(v)
        raise ParseError(f"Expected value, found {t[1]!r}", t[2])

    def field(self):
        t = self._advance()
        if t is None:
            raise ParseError("Expected field name, found end of input", self._cur())
        if t[0] != "word":
            raise ParseError(f"Expected field name, found {t[1]!r}", t[2])
        name = str(t[1])
        if name in ("kind", "tags"):
            self._expect("colon")
            return Field(name, self._comma_values())
        if name == "agent":
            self._expect("colon")
            return Field("agent", self._value_word())
        if name == "importance":
            op_t = self._advance()
            if op_t is None or op_t[0] != "op":
                raise ParseError("Expected comparison operator", op_t[2] if op_t else self._cur())
            num_t = self._advance()
            if num_t is None or num_t[0] != "number":
                raise ParseError("Expected number", num_t[2] if num_t else self._cur())
            return Field("importance", float(num_t[1]), op=str(op_t[1]))
        if name in ("created_after", "created_before"):
            self._expect("colon")
            v = self._value_word()
            return Field(name, _parse_duration_or_date(v, self.now, self._cur()))
        if name == "deleted":
            self._expect("colon")
            v = self._value_word()
            if v not in ("true", "false"):
                raise ParseError(f"Expected true/false for deleted, found '{v}'", self._cur())
            return Field("deleted", v == "true")
        if name == "limit":
            self._expect("colon")
            num_t = self._advance()
            if num_t is None or num_t[0] != "number":
                raise ParseError("Expected number for limit", self._cur())
            return Field("limit", int(num_t[1]))
        raise ParseError(f"Unknown field: '{name}'", t[2])


def _parse_duration_or_date(value: str, now: datetime, pos: int) -> datetime:
    """7d/24h/30m relative, else ISO-8601 (query/mod.rs:584-625)."""
    if len(value) >= 2 and value[-1] in "dhm" and value[:-1].lstrip("-").isdigit():
        n = int(value[:-1])
        delta = {"d": timedelta(days=n), "h": timedelta(hours=n), "m": timedelta(minutes=n)}[value[-1]]
        return now - delta
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
        return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)
    except ValueError:
        raise ParseError(
            f"Invalid duration or date: '{value}'. Use 7d, 24h, 30m, or ISO-8601.", pos
        ) from None


def parse(query: str, now: datetime | None = None):
    """Parse the DSL string into an AST; `now` pins relative durations."""
    query = query.strip()
    if not query:
        raise ParseError("Empty filter expression", 0)
    toks = _tokenize(query)
    if not toks:
        raise ParseError("Empty filter expression", 0)
    p = _Parser(toks, now or datetime.now(timezone.utc))
    ast = p.expr()
    if p.pos < len(p.toks):
        raise ParseError(f"Unexpected token: {p.toks[p.pos][1]!r}", p.toks[p.pos][2])
    return ast


# --- NodeFilter compile target (reference-compat, query/mod.rs:676-842) ---


@dataclass
class NodeFilter:
    """storage/filters.rs:7-21."""

    kinds: list[str] | None = None
    tags: list[str] | None = None
    source_agent: str | None = None
    created_after: datetime | None = None
    created_before: datetime | None = None
    min_importance: float | None = None
    include_deleted: bool = False
    deleted_only: bool = False
    limit: int | None = None
    offset: int = 0


def _collect_kinds(node, out: list[str]) -> bool:
    if isinstance(node, Field) and node.name == "kind":
        out.extend(node.value)
        return True
    if isinstance(node, Or):
        return _collect_kinds(node.left, out) and _collect_kinds(node.right, out)
    return False


def compile_filter(ast, nf: NodeFilter | None = None) -> NodeFilter:
    nf = nf or NodeFilter()
    if isinstance(ast, Field):
        _apply_field(ast, nf)
    elif isinstance(ast, And):
        compile_filter(ast.left, nf)
        compile_filter(ast.right, nf)
    elif isinstance(ast, Or):
        l, r = ast.left, ast.right
        if isinstance(l, Field) and isinstance(r, Field) and l.name == r.name and l.name in ("kind", "tags"):
            _apply_field(Field(l.name, list(l.value) + list(r.value)), nf)
        else:
            kinds: list[str] = []
            if _collect_kinds(ast, kinds):
                _apply_field(Field("kind", kinds), nf)
            else:
                raise CompileError(
                    "OR is only supported between the same field type (e.g. kind:a OR kind:b). "
                    "Complex OR expressions cannot be compiled to a single NodeFilter."
                )
    elif isinstance(ast, Not):
        if isinstance(ast.inner, Field) and ast.inner.name == "deleted":
            _apply_field(Field("deleted", not ast.inner.value), nf)
        else:
            raise CompileError("NOT is only supported for the 'deleted' field.")
    return nf


def _apply_field(f: Field, nf: NodeFilter) -> None:
    if f.name == "kind":
        nf.kinds = (nf.kinds or []) + list(f.value)
    elif f.name == "tags":
        nf.tags = (nf.tags or []) + list(f.value)
    elif f.name == "agent":
        nf.source_agent = f.value
    elif f.name == "importance":
        if f.op in ("<", "<="):
            raise CompileError(
                f"importance{f.op}{f.value} cannot be compiled: NodeFilter only supports "
                "minimum importance (>, >=, =)"
            )
        nf.min_importance = float(f.value)
    elif f.name == "created_after":
        nf.created_after = f.value
    elif f.name == "created_before":
        nf.created_before = f.value
    elif f.name == "deleted":
        if f.value:
            nf.deleted_only = True
            nf.include_deleted = True
        else:
            nf.deleted_only = False
            nf.include_deleted = False
    elif f.name == "limit":
        nf.limit = int(f.value)


# --- Column compile target (Spark-native, full expressiveness) ------------


def _field_column(f: Field) -> Column:
    if f.name == "kind":
        return F.col("kind").isin(list(f.value))
    if f.name == "tags":
        return F.arrays_overlap(
            F.coalesce(F.col("tags"), F.array().cast("array<string>")),
            F.array(*[F.lit(t) for t in f.value]),
        )
    if f.name == "agent":
        return F.col("source_agent") == f.value
    if f.name == "importance":
        ops = {
            ">": F.col("importance") > f.value,
            ">=": F.col("importance") >= f.value,
            "=": F.col("importance") == f.value,
            "<": F.col("importance") < f.value,
            "<=": F.col("importance") <= f.value,
        }
        return ops[f.op]
    if f.name == "created_after":
        return F.col("created_at") > F.lit(_to_naive_utc(f.value))
    if f.name == "created_before":
        return F.col("created_at") < F.lit(_to_naive_utc(f.value))
    if f.name == "deleted":
        return F.col("deleted") == bool(f.value)
    if f.name == "limit":
        return F.lit(True)  # limit handled by apply_query
    raise CompileError(f"Unknown field {f.name}")


def _to_naive_utc(dt):
    """Aware datetimes convert to UTC before dropping tzinfo (created_at is
    stored in UTC); naive values pass through unchanged."""
    from datetime import timezone as _tz

    if dt.tzinfo is not None:
        return dt.astimezone(_tz.utc).replace(tzinfo=None)
    return dt


def compile_column(ast) -> Column:
    if isinstance(ast, Field):
        return _field_column(ast)
    if isinstance(ast, And):
        return compile_column(ast.left) & compile_column(ast.right)
    if isinstance(ast, Or):
        return compile_column(ast.left) | compile_column(ast.right)
    if isinstance(ast, Not):
        return ~compile_column(ast.inner)
    raise CompileError(f"Unknown AST node {ast!r}")


def _extract_limit(ast) -> int | None:
    if isinstance(ast, Field):
        return int(ast.value) if ast.name == "limit" else None
    if isinstance(ast, (And, Or)):
        left = _extract_limit(ast.left)
        return left if left is not None else _extract_limit(ast.right)
    if isinstance(ast, Not):
        return _extract_limit(ast.inner)
    return None


def _mentions_deleted(ast) -> bool:
    """True iff the query filters on the `deleted` FIELD — an AST check,
    not a substring test ('tags:deleted' must not disable the default
    tombstone exclusion)."""
    if isinstance(ast, Field):
        return ast.name == "deleted"
    if isinstance(ast, (And, Or)):
        return _mentions_deleted(ast.left) or _mentions_deleted(ast.right)
    if isinstance(ast, Not):
        return _mentions_deleted(ast.inner)
    return False


def apply_node_filter(nodes: DataFrame, nf: NodeFilter, offset: int | None = None) -> DataFrame:
    """NodeFilter → DataFrame ops (F1, redb_storage.rs:670-734): AND of all
    fields, created_at DESC ordering, offset/limit."""
    df = nodes
    if nf.kinds:
        df = df.filter(F.col("kind").isin(nf.kinds))
    if nf.tags:
        df = df.filter(
            F.arrays_overlap(
                F.coalesce(F.col("tags"), F.array().cast("array<string>")),
                F.array(*[F.lit(t) for t in nf.tags]),
            )
        )
    if nf.source_agent:
        df = df.filter(F.col("source_agent") == nf.source_agent)
    if nf.created_after:
        df = df.filter(F.col("created_at") > F.lit(_to_naive_utc(nf.created_after)))
    if nf.created_before:
        df = df.filter(F.col("created_at") < F.lit(_to_naive_utc(nf.created_before)))
    if nf.min_importance is not None:
        df = df.filter(F.col("importance") >= nf.min_importance)
    if nf.deleted_only:
        df = df.filter(F.col("deleted"))
    elif not nf.include_deleted:
        df = df.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
    df = df.orderBy(F.desc("created_at"), F.asc("node_id"))
    off = offset if offset is not None else nf.offset
    if off:
        df = df.offset(off)
    if nf.limit is not None:
        df = df.limit(nf.limit)
    return df


def query(nodes: DataFrame, dsl: str, now: datetime | None = None, spark_native: bool = True) -> DataFrame:
    """One-call surface: parse + compile + apply.

    spark_native=True uses the Column compiler (arbitrary OR/NOT supported);
    False reproduces the reference's NodeFilter restrictions/errors.
    """
    ast = parse(dsl, now=now)
    if spark_native:
        limit = _extract_limit(ast)
        cond = compile_column(ast)
        # default: exclude deleted unless the query filters the deleted FIELD
        if not _mentions_deleted(ast):
            cond = cond & ~F.coalesce(F.col("deleted"), F.lit(False))
        df = nodes.filter(cond).orderBy(F.desc("created_at"), F.asc("node_id"))
        return df.limit(limit) if limit is not None else df
    return apply_node_filter(nodes, compile_filter(ast))
