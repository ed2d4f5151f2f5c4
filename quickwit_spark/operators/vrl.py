"""VRL source-program compiler: textual VRL → Catalyst Column plans.

The reference embeds the full Vector Remap Language and runs one program
per document (quickwit-indexing/src/actors/vrl_processing.rs:50-96;
docs/configuration/source-config.md "Transform parameters" — behavior
only). transforms.py already covers the declarative step-spec subset;
this module accepts the actual PROGRAM TEXT a reference user has in their
source config —

    .message = downcase(string!(.message))
    user = parse_csv!(.plain_text)
    .age = to_int!(user[2])
    if .status >= 500 { .severity = "error" } else { .severity = "ok" }
    del(.plain_text)

— and compiles it into Column expressions, so the whole program stays in
JVM codegen (zero Python in the row path; one projection per program, not
per statement). Failures from fallible (`!`) calls follow the reference's
transform-error contract: the row gets `_transform_error` set and the
caller routes it to quarantine (doc_processor.rs:311-404 counters), they
do NOT abort the batch.

Supported language (practical VRL subset, public semantics from
https://vector.dev/docs/reference/vrl/):

- statements: `.field = expr`, `local = expr`, `del(.field)`,
  `if cond { ... } else if ... { ... } else { ... }`, `#` comments
- expressions: field paths (`.a`, `.a.b` struct/map reads), locals,
  literals (string with escapes, int, float, true/false, null), arrays
  `[a, b]`, indexing `x[0]` / `x["key"]`, `??` coalesce, `|| && !`,
  comparisons, `+ - * / %` (`+` concatenates when either side is
  string-typed), parentheses
- functions: downcase upcase trim strip_whitespace length contains
  starts_with ends_with split replace slice round floor ceil abs
  string to_string to_int to_float sha2 md5 now exists is_null
  parse_json parse_csv parse_key_value parse_timestamp format_timestamp
  parse_grok (named groups → map, transforms.py pattern library + presets)
  (fallible forms with `!` register error conditions instead of raising)

Deliberate limits (documented, raise at compile time): assignment to
NESTED paths (the doc mapper owns object shaping), `del` inside `if`
(column sets must be branch-independent in a columnar plan), and
parse_csv! handles the unquoted-field common case.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<field>\.[A-Za-z_][\w.]*)
  | (?P<num>\d+\.\d+|\d+)
  | (?P<str>"(?:\\.|[^"\\])*")
  | (?P<name>[A-Za-z_]\w*!?)
  | (?P<op>\?\?|==|!=|<=|>=|&&|\|\||[=<>+\-*/%!(){}\[\],;])
    """,
    re.VERBOSE,
)

_KEYWORDS = {"if", "else", "del", "true", "false", "null"}


@dataclass
class Tok:
    kind: str  # field | num | str | name | op | kw
    text: str
    pos: int


def tokenize(src: str) -> list[Tok]:
    toks, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ValueError(f"VRL: unexpected character {src[i]!r} at offset {i}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        kind, text = m.lastgroup, m.group()
        if kind == "name" and text in _KEYWORDS:
            kind = "kw"
        toks.append(Tok(kind, text, m.start()))
    return toks


# ---------------------------------------------------------------- AST

@dataclass
class Lit:
    value: object


@dataclass
class Field:
    path: str  # without the leading dot


@dataclass
class Local:
    name: str


@dataclass
class Array:
    items: list


@dataclass
class Index:
    base: object
    key: object


@dataclass
class Bin:
    op: str
    left: object
    right: object


@dataclass
class Unary:
    op: str
    operand: object


@dataclass
class Call:
    name: str
    fallible: bool
    args: list


@dataclass
class Assign:
    target: object  # Field or Local
    expr: object


@dataclass
class Del:
    path: str


@dataclass
class If:
    cond: object
    then: list
    orelse: list = field(default_factory=list)


class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks, self.i = toks, 0

    def peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise ValueError("VRL: unexpected end of program")
        self.i += 1
        return t

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise ValueError(f"VRL: expected {text!r}, got {t.text!r} at {t.pos}")
        return t

    # -------- statements

    def program(self) -> list:
        stmts = []
        while self.peek() is not None:
            if self.peek().text == ";":
                self.next()
                continue
            stmts.append(self.stmt())
        return stmts

    def stmt(self):
        t = self.peek()
        if t.kind == "kw" and t.text == "if":
            return self.if_stmt()
        if t.kind == "kw" and t.text == "del":
            self.next()
            self.expect("(")
            f = self.next()
            if f.kind != "field":
                raise ValueError(f"VRL: del() takes a field path, got {f.text!r}")
            self.expect(")")
            return Del(f.text[1:])
        if t.kind == "field":
            self.next()
            self.expect("=")
            return Assign(Field(t.text[1:]), self.expr())
        if t.kind == "name" and not t.text.endswith("!"):
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
            if nxt is not None and nxt.text == "=":
                self.next()
                self.next()
                return Assign(Local(t.text), self.expr())
        raise ValueError(f"VRL: expected a statement at {t.text!r} (offset {t.pos})")

    def if_stmt(self) -> If:
        self.expect("if")
        cond = self.expr()
        then = self.block()
        orelse: list = []
        t = self.peek()
        if t is not None and t.kind == "kw" and t.text == "else":
            self.next()
            nxt = self.peek()
            if nxt is not None and nxt.kind == "kw" and nxt.text == "if":
                orelse = [self.if_stmt()]
            else:
                orelse = self.block()
        return If(cond, then, orelse)

    def block(self) -> list:
        self.expect("{")
        stmts = []
        while self.peek() is not None and self.peek().text != "}":
            if self.peek().text == ";":
                self.next()
                continue
            stmts.append(self.stmt())
        self.expect("}")
        return stmts

    # -------- expressions (precedence climbing)

    def expr(self):
        return self.coalesce()

    def _bin_level(self, sub, ops):
        node = sub()
        while self.peek() is not None and self.peek().text in ops:
            op = self.next().text
            node = Bin(op, node, sub())
        return node

    def coalesce(self):
        return self._bin_level(self.logical_or, ("??",))

    def logical_or(self):
        return self._bin_level(self.logical_and, ("||",))

    def logical_and(self):
        return self._bin_level(self.comparison, ("&&",))

    def comparison(self):
        return self._bin_level(self.additive, ("==", "!=", "<", "<=", ">", ">="))

    def additive(self):
        return self._bin_level(self.multiplicative, ("+", "-"))

    def multiplicative(self):
        return self._bin_level(self.unary, ("*", "/", "%"))

    def unary(self):
        t = self.peek()
        if t is not None and t.text in ("!", "-") and t.kind == "op":
            self.next()
            return Unary(t.text, self.unary())
        return self.postfix()

    def postfix(self):
        node = self.primary()
        while self.peek() is not None and self.peek().text == "[":
            self.next()
            key = self.expr()
            self.expect("]")
            node = Index(node, key)
        return node

    def primary(self):
        t = self.next()
        if t.kind == "num":
            return Lit(float(t.text) if "." in t.text else int(t.text))
        if t.kind == "str":
            return Lit(
                t.text[1:-1]
                .replace(r"\"", '"')
                .replace(r"\n", "\n")
                .replace(r"\t", "\t")
                .replace("\\\\", "\\")
            )
        if t.kind == "kw" and t.text in ("true", "false"):
            return Lit(t.text == "true")
        if t.kind == "kw" and t.text == "null":
            return Lit(None)
        if t.kind == "field":
            return Field(t.text[1:])
        if t.text == "(":
            node = self.expr()
            self.expect(")")
            return node
        if t.text == "[":
            items = []
            while self.peek() is not None and self.peek().text != "]":
                items.append(self.expr())
                if self.peek() is not None and self.peek().text == ",":
                    self.next()
            self.expect("]")
            return Array(items)
        if t.kind == "name":
            fallible = t.text.endswith("!")
            name = t.text.rstrip("!")
            if self.peek() is not None and self.peek().text == "(":
                self.next()
                args = []
                while self.peek() is not None and self.peek().text != ")":
                    args.append(self.expr())
                    if self.peek() is not None and self.peek().text == ",":
                        self.next()
                self.expect(")")
                return Call(name, fallible, args)
            if fallible:
                raise ValueError(f"VRL: `{t.text}` is not a call at {t.pos}")
            return Local(t.text)
        raise ValueError(f"VRL: unexpected token {t.text!r} at {t.pos}")


def parse_vrl(src: str) -> list:
    """Parse a VRL program into its statement AST."""
    return _Parser(tokenize(src)).program()


# ---------------------------------------------------------------- strptime

# VRL timestamps use strptime codes; Spark wants java.time patterns
_STRPTIME = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%3f": "SSS", "%z": "xx",
    "%:z": "xxx", "%b": "MMM", "%B": "MMMM", "%e": "d", "%j": "DDD",
    "%%": "%",
}


def strptime_to_spark(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        for code in ("%:z", "%3f", "%%"):
            if fmt.startswith(code, i):
                out.append(_STRPTIME[code])
                i += len(code)
                break
        else:
            if fmt[i] == "%" and i + 1 < len(fmt):
                code = fmt[i : i + 2]
                if code not in _STRPTIME:
                    raise ValueError(f"VRL: unsupported strptime code {code}")
                out.append(_STRPTIME[code])
                i += 2
            elif fmt[i].isalpha():
                # bare letters are java-pattern letters — quote them
                out.append(f"'{fmt[i]}'")
                i += 1
            else:
                out.append(fmt[i])
                i += 1
    return "".join(out)


# ---------------------------------------------------------------- compiler

@dataclass
class _Typed:
    col: Column
    hint: str | None  # string | number | bool | timestamp | array | map | None


class _Compiler:
    """Compiles statements against a running column environment.

    ``cols`` maps every live output column to its Column expression, so the
    whole program collapses into ONE select (Catalyst sees a single
    projection; common subexpressions are shared, not recomputed per
    statement). ``errs`` accumulates (guard, condition, message) triples
    from fallible calls."""

    def __init__(self, df: DataFrame):
        self.df = df
        self.cols: dict[str, Column] = {c: F.col(c) for c in df.columns}
        self.order: list[str] = list(df.columns)
        self.locals: dict[str, _Typed] = {}
        self.errs: list[tuple[Column | None, Column, str]] = []
        self.guard: Column | None = None  # current if-branch predicate

    # -------- expression compilation

    def compile_expr(self, node) -> _Typed:
        if isinstance(node, Lit):
            hint = (
                "string" if isinstance(node.value, str)
                else "bool" if isinstance(node.value, bool)
                else "number" if isinstance(node.value, (int, float))
                else None
            )
            return _Typed(F.lit(node.value), hint)
        if isinstance(node, Field):
            head = node.path.split(".", 1)[0]
            if head not in self.cols:
                raise ValueError(f"VRL: unknown field `.{node.path}`")
            col = self.cols[head]
            for part in node.path.split(".")[1:]:
                col = col.getItem(part)  # struct field or map key read
            return _Typed(col, None)
        if isinstance(node, Local):
            if node.name not in self.locals:
                raise ValueError(f"VRL: undefined variable `{node.name}`")
            return self.locals[node.name]
        if isinstance(node, Array):
            items = [self.compile_expr(a).col for a in node.items]
            return _Typed(F.array(*items), "array")
        if isinstance(node, Index):
            base = self.compile_expr(node.base)
            key = node.key
            if isinstance(key, Lit):
                return _Typed(base.col.getItem(key.value), None)
            return _Typed(base.col.getItem(self.compile_expr(key).col), None)
        if isinstance(node, Unary):
            v = self.compile_expr(node.operand)
            if node.op == "!":
                return _Typed(~v.col.cast("boolean"), "bool")
            return _Typed(-v.col, v.hint)
        if isinstance(node, Bin):
            return self._bin(node)
        if isinstance(node, Call):
            return self._call(node)
        raise ValueError(f"VRL: cannot compile {node!r}")

    def _bin(self, node: Bin) -> _Typed:
        l, r = self.compile_expr(node.left), self.compile_expr(node.right)
        op = node.op
        if op == "??":
            return _Typed(F.coalesce(l.col, r.col), l.hint or r.hint)
        if op == "||":
            return _Typed(l.col.cast("boolean") | r.col.cast("boolean"), "bool")
        if op == "&&":
            return _Typed(l.col.cast("boolean") & r.col.cast("boolean"), "bool")
        if op == "==":
            return _Typed(l.col == r.col, "bool")
        if op == "!=":
            return _Typed(l.col != r.col, "bool")
        if op == "<":
            return _Typed(l.col < r.col, "bool")
        if op == "<=":
            return _Typed(l.col <= r.col, "bool")
        if op == ">":
            return _Typed(l.col > r.col, "bool")
        if op == ">=":
            return _Typed(l.col >= r.col, "bool")
        if op == "+":
            if "string" in (l.hint, r.hint):  # VRL string concatenation
                return _Typed(F.concat(l.col.cast("string"), r.col.cast("string")), "string")
            return _Typed(l.col + r.col, "number")
        if op == "-":
            return _Typed(l.col - r.col, "number")
        if op == "*":
            return _Typed(l.col * r.col, "number")
        if op == "/":
            return _Typed(l.col / r.col, "number")
        if op == "%":
            return _Typed(l.col % r.col, "number")
        raise ValueError(f"VRL: unknown operator {op}")

    def _register_err(self, src: Column, out: Column, msg: str) -> None:
        cond = src.isNotNull() & out.isNull()
        self.errs.append((self.guard, cond, msg))

    def _call(self, node: Call) -> _Typed:
        args = [self.compile_expr(a) for a in node.args]
        n, name = len(args), node.name

        def arity(k: int) -> None:
            if n != k:
                raise ValueError(f"VRL: {name}() takes {k} argument(s), got {n}")

        if name == "downcase":
            arity(1)
            return _Typed(F.lower(args[0].col.cast("string")), "string")
        if name == "upcase":
            arity(1)
            return _Typed(F.upper(args[0].col.cast("string")), "string")
        if name in ("trim", "strip_whitespace"):
            arity(1)
            return _Typed(F.trim(args[0].col.cast("string")), "string")
        if name == "length":
            arity(1)
            c = args[0].col
            out = F.size(c) if args[0].hint in ("array", "map") else F.length(c.cast("string"))
            return _Typed(out, "number")
        if name == "contains":
            arity(2)
            return _Typed(args[0].col.cast("string").contains(args[1].col), "bool")
        if name == "starts_with":
            arity(2)
            return _Typed(args[0].col.cast("string").startswith(args[1].col), "bool")
        if name == "ends_with":
            arity(2)
            return _Typed(args[0].col.cast("string").endswith(args[1].col), "bool")
        if name == "split":
            arity(2)
            if not isinstance(node.args[1], Lit):
                raise ValueError("VRL: split() separator must be a literal")
            return _Typed(F.split(args[0].col.cast("string"), node.args[1].value), "array")
        if name == "replace":
            arity(3)
            # VRL replace is literal-substring; SQL replace() matches that
            return _Typed(
                F.call_function(
                    "replace", args[0].col.cast("string"), args[1].col, args[2].col
                ),
                "string",
            )
        if name == "slice":
            arity(3)
            # VRL slice(s, start, end) is 0-based end-exclusive
            if not (isinstance(node.args[1], Lit) and isinstance(node.args[2], Lit)):
                raise ValueError("VRL: slice() bounds must be literals")
            start, end = node.args[1].value, node.args[2].value
            return _Typed(
                F.substring(args[0].col.cast("string"), start + 1, end - start), "string"
            )
        if name in ("round", "floor", "ceil", "abs"):
            arity(1)
            fn = {"round": F.round, "floor": F.floor, "ceil": F.ceil, "abs": F.abs}[name]
            return _Typed(fn(args[0].col), "number")
        if name in ("string", "to_string"):
            arity(1)
            return _Typed(args[0].col.cast("string"), "string")
        if name == "to_int":
            arity(1)
            # try_cast: malformed input → null + _transform_error, never an
            # aborted batch (ANSI casts throw; VRL aborts only the event)
            out = args[0].col.try_cast("long")
            if node.fallible:
                self._register_err(args[0].col, out, "to_int! failed")
            return _Typed(out, "number")
        if name == "to_float":
            arity(1)
            out = args[0].col.try_cast("double")
            if node.fallible:
                self._register_err(args[0].col, out, "to_float! failed")
            return _Typed(out, "number")
        if name == "sha2":
            c = args[0].col.cast("string")
            bits = node.args[1].value if n == 2 else 256
            return _Typed(F.sha2(c, bits), "string")
        if name == "md5":
            arity(1)
            return _Typed(F.md5(args[0].col.cast("string")), "string")
        if name == "now":
            arity(0)
            return _Typed(F.current_timestamp(), "timestamp")
        if name == "exists":
            arity(1)
            if not isinstance(node.args[0], Field):
                raise ValueError("VRL: exists() takes a field path")
            head = node.args[0].path.split(".", 1)[0]
            if head not in self.cols:
                return _Typed(F.lit(False), "bool")
            return _Typed(args[0].col.isNotNull(), "bool")
        if name == "is_null":
            arity(1)
            return _Typed(args[0].col.isNull(), "bool")
        if name == "parse_json":
            arity(1)
            src = args[0].col.cast("string")
            out = F.from_json(src, "map<string,string>")
            if node.fallible:
                self._register_err(src, out, "parse_json! failed")
            return _Typed(out, "map")
        if name == "parse_csv":
            arity(1)
            # unquoted-field common case (documented limit)
            return _Typed(F.split(args[0].col.cast("string"), ","), "array")
        if name == "parse_key_value":
            arity(1)
            out = F.map_filter(
                F.call_function("str_to_map", args[0].col.cast("string"), F.lit(" "), F.lit("=")),
                lambda k, v: (k != "") & v.isNotNull(),
            )
            return _Typed(out, "map")
        if name == "parse_grok":
            arity(2)
            # VRL parse_grok!(.line, "%{IP:client} ...") returns an object;
            # the columnar analog is a map<string,string> of the named
            # groups (same pattern library as transforms.py — presets via
            # transforms.GROK_PRESETS work because expand_grok handles both)
            if not isinstance(node.args[1], Lit):
                raise ValueError("VRL: parse_grok() pattern must be a literal")
            from quickwit_spark.operators.transforms import expand_grok

            pattern = expand_grok(node.args[1].value)
            names = re.findall(r"\(\?<(\w+)>", pattern)
            # positional extraction — Java regex rejects '_' in group names
            pattern = re.sub(r"\(\?<\w+>", "(", pattern)
            src = args[0].col.cast("string")
            entries = []
            for i, gname in enumerate(names, start=1):
                extracted = F.regexp_extract(src, pattern, i)
                entries += [F.lit(gname), F.when(extracted == "", None).otherwise(extracted)]
            matched = F.coalesce(src.rlike(pattern), F.lit(False))
            out = F.when(matched, F.create_map(*entries))
            if node.fallible:
                self._register_err(src, out, "parse_grok! failed")
            return _Typed(out, "map")
        if name == "parse_timestamp":
            src = args[0].col.cast("string")
            if n == 2:
                if not isinstance(node.args[1], Lit):
                    raise ValueError("VRL: parse_timestamp() format must be a literal")
                out = F.try_to_timestamp(src, F.lit(strptime_to_spark(node.args[1].value)))
            else:
                out = F.try_to_timestamp(src)
            if node.fallible:
                self._register_err(src, out, "parse_timestamp! failed")
            return _Typed(out, "timestamp")
        if name == "format_timestamp":
            arity(2)
            if not isinstance(node.args[1], Lit):
                raise ValueError("VRL: format_timestamp() format must be a literal")
            return _Typed(
                F.date_format(args[0].col, strptime_to_spark(node.args[1].value)), "string"
            )
        raise ValueError(f"VRL: unknown function `{name}`")

    # -------- statement compilation

    def compile_stmt(self, stmt) -> None:
        if isinstance(stmt, Assign):
            val = self.compile_expr(stmt.expr)
            if isinstance(stmt.target, Local):
                self.locals[stmt.target.name] = val
                return
            path = stmt.target.path
            if "." in path:
                raise ValueError(
                    f"VRL: assignment to nested path `.{path}` is unsupported "
                    "(object shaping belongs to the doc mapper)"
                )
            new = val.col
            if self.guard is not None:
                old = self.cols.get(path, F.lit(None))
                new = F.when(self.guard, new).otherwise(old)
            if path not in self.cols:
                self.order.append(path)
            self.cols[path] = new
            return
        if isinstance(stmt, Del):
            if self.guard is not None:
                raise ValueError(
                    "VRL: del() inside `if` is unsupported (a columnar plan "
                    "needs a branch-independent column set)"
                )
            if stmt.path in self.cols:
                del self.cols[stmt.path]
                self.order.remove(stmt.path)
            return
        if isinstance(stmt, If):
            cond = F.coalesce(
                self.compile_expr(stmt.cond).col.cast("boolean"), F.lit(False)
            )
            outer = self.guard
            self.guard = cond if outer is None else (outer & cond)
            for s in stmt.then:
                self.compile_stmt(s)
            if stmt.orelse:
                self.guard = ~cond if outer is None else (outer & ~cond)
                for s in stmt.orelse:
                    self.compile_stmt(s)
            self.guard = outer
            return
        raise ValueError(f"VRL: cannot compile statement {stmt!r}")

    def finish(self) -> DataFrame:
        err = F.lit(None).cast("string")
        for guard, cond, msg in self.errs:
            fire = cond if guard is None else (guard & cond)
            err = F.coalesce(err, F.when(fire, F.lit(msg)))
        cols = [self.cols[c].alias(c) for c in self.order]
        return self.df.select(*cols, err.alias("_transform_error"))


def apply_vrl(df: DataFrame, program: str) -> DataFrame:
    """Compile + apply a VRL program; adds ``_transform_error`` (null on
    clean rows, first fallible-call failure message otherwise). The whole
    program becomes ONE Catalyst projection."""
    comp = _Compiler(df)
    for stmt in parse_vrl(program):
        comp.compile_stmt(stmt)
    return comp.finish()
