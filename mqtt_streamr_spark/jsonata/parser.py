"""JSONata 1.6 lexer + Pratt parser -> dict-shaped AST.

Original implementation from the public JSONata 1.6 language documentation
(https://docs.jsonata.org). Grammar surface per SURVEY.md §2.6: paths,
wildcards, predicates, constructors, operators, lambdas, binds, blocks,
conditionals, order-by, group-by, function chaining, regex literals.
Features introduced after 1.6 (parent ``%``, ``@``/``#`` binds, ``$type``
etc.) are deliberately not parsed — the reference pins jsonata 1.6.4.

AST nodes are plain dicts: {"type": ..., ...} — stable, picklable (the
interpreter ships inside a pandas UDF), and cheap to pattern-match.
"""

from __future__ import annotations

import re

from mqtt_streamr_spark.jsonata.errors import JsonataError

# --- lexer -------------------------------------------------------------------

_OPERATORS = [
    ":=", "!=", "<=", ">=", "~>", "..", "**",
    ".", "[", "]", "{", "}", "(", ")", ",", ";", ":", "?",
    "+", "-", "*", "/", "%", "=", "<", ">", "^", "&", "|", "!",
]

_KEYWORDS = {"and", "or", "in", "true", "false", "null", "function", "λ"}

_NUM_RE = re.compile(r"(\d+(\.\d+)?([eE][-+]?\d+)?)")
_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_WS_RE = re.compile(r"\s+")

_ESCAPES = {'"': '"', "'": "'", "\\": "\\", "/": "/", "b": "\b",
            "f": "\f", "n": "\n", "r": "\r", "t": "\t"}


class Token:
    __slots__ = ("type", "value", "pos")

    def __init__(self, type_: str, value, pos: int):
        self.type = type_
        self.value = value
        self.pos = pos

    def __repr__(self):  # pragma: no cover
        return f"Token({self.type},{self.value!r})"


def _read_string(src: str, i: int) -> tuple[str, int]:
    quote = src[i]
    i += 1
    out: list[str] = []
    while i < len(src):
        ch = src[i]
        if ch == "\\":
            if i + 1 >= len(src):
                raise JsonataError("unterminated string literal")
            nxt = src[i + 1]
            if nxt == "u":
                try:
                    out.append(chr(int(src[i + 2:i + 6], 16)))
                except ValueError as exc:
                    raise JsonataError(
                        f"invalid \\u escape at {i}"
                    ) from exc
                i += 6
                continue
            if nxt not in _ESCAPES:
                raise JsonataError(f"unsupported escape \\{nxt} at {i}")
            out.append(_ESCAPES[nxt])
            i += 2
            continue
        if ch == quote:
            return "".join(out), i + 1
        out.append(ch)
        i += 1
    raise JsonataError("unterminated string literal")


def tokenize(src: str) -> list[Token]:
    tokens: list[Token] = []
    i = 0
    n = len(src)
    while i < n:
        m = _WS_RE.match(src, i)
        if m:
            i = m.end()
            continue
        ch = src[i]
        if ch == "/" and src.startswith("/*", i):
            end = src.find("*/", i + 2)
            if end < 0:
                raise JsonataError("unterminated comment")
            i = end + 2
            continue
        if ch in "\"'":
            s, i2 = _read_string(src, i)
            tokens.append(Token("string", s, i))
            i = i2
            continue
        if ch == "/" and _regex_position(tokens):
            pat, flags, i2 = _read_regex(src, i)
            tokens.append(Token("regex", (pat, flags), i))
            i = i2
            continue
        if ch == "`":  # quoted field name
            end = src.find("`", i + 1)
            if end < 0:
                raise JsonataError("unterminated quoted name")
            tokens.append(Token("name", src[i + 1:end], i))
            i = end + 1
            continue
        if ch == "$":
            m = _NAME_RE.match(src, i + 1)
            if m:
                tokens.append(Token("variable", m.group(0), i))
                i = m.end()
            elif src.startswith("$$", i):
                tokens.append(Token("variable", "$", i))  # $$ = root
                i += 2
            else:
                tokens.append(Token("variable", "", i))  # bare $ = context
                i += 1
            continue
        if ch.isdigit():
            m = _NUM_RE.match(src, i)
            text = m.group(0)
            tokens.append(
                Token("number", float(text) if _is_floatish(text) else int(text), i)
            )
            i = m.end()
            continue
        m = _NAME_RE.match(src, i)
        if m:
            word = m.group(0)
            if word in _KEYWORDS:
                tokens.append(Token(word, word, i))
            else:
                tokens.append(Token("name", word, i))
            i = m.end()
            continue
        for op in _OPERATORS:
            if src.startswith(op, i):
                tokens.append(Token("operator", op, i))
                i += len(op)
                break
        else:
            raise JsonataError(f"unknown character {ch!r} at {i}")
    tokens.append(Token("end", None, n))
    return tokens


def _is_floatish(text: str) -> bool:
    return "." in text or "e" in text or "E" in text


def _regex_position(tokens: list[Token]) -> bool:
    """'/' starts a regex literal only where a value is expected."""
    if not tokens:
        return True
    last = tokens[-1]
    if last.type in ("number", "string", "name", "variable", "regex"):
        return False
    if last.type == "operator" and last.value in (")", "]", "}"):
        return False
    return True


def _read_regex(src: str, i: int) -> tuple[str, str, int]:
    j = i + 1
    depth_class = False
    while j < len(src):
        ch = src[j]
        if ch == "\\":
            j += 2
            continue
        if ch == "[":
            depth_class = True
        elif ch == "]":
            depth_class = False
        elif ch == "/" and not depth_class:
            pat = src[i + 1:j]
            k = j + 1
            flags = ""
            while k < len(src) and src[k] in "imsx":
                flags += src[k]
                k += 1
            return pat, flags, k
        j += 1
    raise JsonataError("unterminated regex literal")


# --- Pratt parser ------------------------------------------------------------

# binding powers per the JSONata grammar (public docs / language reference)
_BP = {
    ":=": 10, "?": 20, "..": 20, "or": 25, "and": 30,
    "=": 40, "!=": 40, "<": 40, "<=": 40, ">": 40, ">=": 40,
    "in": 40, "~>": 40, "^": 40,
    "&": 50, "+": 50, "-": 50,
    "*": 60, "/": 60, "%": 60,
    "{": 70, ".": 75,
    "[": 80, "(": 80,
}


class Parser:
    def __init__(self, src: str):
        self.src = src  # kept for raw signature scans (`function(...)<...>`)
        self.tokens = tokenize(src)
        self.pos = 0

    @property
    def tok(self) -> Token:
        return self.tokens[self.pos]

    def advance(self, expect: str | None = None) -> Token:
        t = self.tok
        if expect is not None:
            ok = (t.type == "operator" and t.value == expect) or t.type == expect
            if not ok:
                raise JsonataError(
                    f"expected {expect!r}, found {t.type}:{t.value!r} at {t.pos}"
                )
        self.pos += 1
        return t

    def _bp(self, t: Token) -> int:
        if t.type == "operator":
            return _BP.get(t.value, 0)
        if t.type in ("and", "or", "in"):
            return _BP[t.type]
        return 0

    def parse_expr(self, rbp: int = 0):
        t = self.advance()
        left = self.nud(t)
        while self._bp(self.tok) > rbp:
            t = self.advance()
            left = self.led(t, left)
        return left

    # --- prefix ---
    def nud(self, t: Token):
        if t.type == "number":
            return {"type": "number", "value": t.value}
        if t.type == "string":
            return {"type": "string", "value": t.value}
        if t.type == "regex":
            return {"type": "regex", "pattern": t.value[0], "flags": t.value[1]}
        if t.type in ("true", "false"):
            return {"type": "boolean", "value": t.type == "true"}
        if t.type == "null":
            return {"type": "null"}
        if t.type == "name":
            return {"type": "name", "value": t.value}
        if t.type == "variable":
            return {"type": "variable", "value": t.value}
        if t.type in ("function", "λ"):
            return self._parse_lambda()
        if t.type == "operator":
            if t.value == "-":
                return {"type": "unary-", "expr": self.parse_expr(70)}
            if t.value == "*":
                return {"type": "wildcard"}
            if t.value == "**":
                return {"type": "descendants"}
            if t.value == "(":
                exprs = []
                while not self._at(")"):
                    exprs.append(self.parse_expr(0))
                    if self._at(";"):
                        self.advance(";")
                self.advance(")")
                return {"type": "block", "expressions": exprs}
            if t.value == "[":
                items = []
                while not self._at("]"):
                    items.append(self.parse_expr(0))
                    if self._at(","):
                        self.advance(",")
                self.advance("]")
                return {"type": "array", "items": items}
            if t.value == "{":
                return {"type": "object", "pairs": self._parse_pairs()}
            if t.value == "|":
                # transform: |location|update[, deletes]|  (docs: Other
                # operators — "~> |...|...|"; a transform is a VALUE — a
                # single-argument function — usually applied via `~>`)
                pattern = self.parse_expr(0)
                self.advance("|")
                update = self.parse_expr(0)
                deletes = None
                if self._at(","):
                    self.advance(",")
                    deletes = self.parse_expr(0)
                self.advance("|")
                return {"type": "transform", "pattern": pattern,
                        "update": update, "delete": deletes}
            if t.value == "?":
                # partial-application placeholder: only meaningful inside a
                # function call's argument list (docs: Programming —
                # "partial function application"); anywhere else the
                # interpreter rejects it at evaluation time
                return {"type": "placeholder"}
        raise JsonataError(f"unexpected token {t.type}:{t.value!r} at {t.pos}")

    # --- infix/postfix ---
    def led(self, t: Token, left):
        v = t.value if t.type == "operator" else t.type
        if v == ".":
            return {"type": "path", "lhs": left, "rhs": self.parse_expr(75)}
        if v == "[":
            if self._at("]"):  # trailing [] = keep-singleton-array
                self.advance("]")
                return {"type": "keeparray", "expr": left}
            pred = self.parse_expr(0)
            self.advance("]")
            return {"type": "predicate", "expr": left, "cond": pred}
        if v == "(":
            args = []
            while not self._at(")"):
                args.append(self.parse_expr(0))
                if self._at(","):
                    self.advance(",")
            self.advance(")")
            return {"type": "call", "proc": left, "args": args}
        if v == "{":
            return {"type": "groupby", "expr": left, "pairs": self._parse_pairs()}
        if v == "?":
            then = self.parse_expr(0)
            otherwise = None
            if self._at(":"):
                self.advance(":")
                otherwise = self.parse_expr(0)
            return {"type": "condition", "cond": left, "then": then,
                    "else": otherwise}
        if v == ":=":
            if left.get("type") != "variable":
                raise JsonataError("left side of := must be a variable")
            return {"type": "bind", "var": left["value"],
                    "expr": self.parse_expr(_BP[":="] - 1)}  # right-assoc
        if v == "~>":
            return {"type": "apply", "lhs": left, "rhs": self.parse_expr(40)}
        if v == "^":
            self.advance("(")
            terms = []
            while not self._at(")"):
                desc = False
                if self._at("<"):
                    self.advance("<")
                elif self._at(">"):
                    self.advance(">")
                    desc = True
                terms.append({"descending": desc, "expr": self.parse_expr(0)})
                if self._at(","):
                    self.advance(",")
            self.advance(")")
            return {"type": "sort", "expr": left, "terms": terms}
        if v == "..":
            return {"type": "range", "lhs": left, "rhs": self.parse_expr(20)}
        if v in ("and", "or", "in", "=", "!=", "<", "<=", ">", ">=",
                 "+", "-", "*", "/", "%", "&"):
            return {"type": "binary", "op": v, "lhs": left,
                    "rhs": self.parse_expr(_BP[v])}
        raise JsonataError(f"unexpected operator {v!r} at {t.pos}")

    # --- helpers ---
    def _at(self, op: str) -> bool:
        return self.tok.type == "operator" and self.tok.value == op

    def _parse_pairs(self):
        pairs = []
        while not self._at("}"):
            key = self.parse_expr(0)
            self.advance(":")
            val = self.parse_expr(0)
            pairs.append((key, val))
            if self._at(","):
                self.advance(",")
        self.advance("}")
        return pairs

    def _parse_lambda(self):
        self.advance("(")
        params = []
        while not self._at(")"):
            t = self.advance("variable")
            params.append(t.value)
            if self._at(","):
                self.advance(",")
        self.advance(")")
        signature = None
        if self._at("<"):
            signature = self._scan_signature()
        self.advance("{")
        body = self.parse_expr(0)
        self.advance("}")
        node = {"type": "lambda", "params": params, "body": body}
        if signature is not None:
            node["signature"] = signature
        return node

    def _scan_signature(self) -> str:
        """Raw-scan a ``<...>`` function signature from the source.

        Signatures (docs: Programming — "function signatures") are a
        character mini-language (``<s-:n>``, ``<a<n>:n>``) that tokenizes
        as ordinary operator/name soup, so the matching ``>`` is found by
        angle-depth counting over the raw source, then the token cursor is
        advanced past everything inside."""
        start = self.tok.pos  # position of '<'
        depth = 0
        j = start
        src = self.src
        while j < len(src):
            if src[j] == "<":
                depth += 1
            elif src[j] == ">":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            raise JsonataError(f"unterminated function signature at {start}")
        sig = src[start:j + 1]
        while self.tok.type != "end" and self.tok.pos <= j:
            self.pos += 1
        return sig


def parse(src: str):
    p = Parser(src)
    ast = p.parse_expr(0)
    if p.tok.type != "end":
        raise JsonataError(
            f"unexpected trailing input at {p.tok.pos}: {p.tok.value!r}"
        )
    return ast
