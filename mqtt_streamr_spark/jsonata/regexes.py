"""JS-RegExp-fidelity pattern rewriting, shared by both backends.

The reference's regex engine is JS RegExp (jsonata 1.6.4 delegates to
native RegExp; /root/reference/bin/mqtt-streamr.js:158 runs arbitrary
user transforms through it). Our two execution engines differ from it
in documented, class-specific ways:

  class   JS (reference)        Java (compiled path)   Python re (interp)
  \\d \\w  ASCII                 ASCII                  Unicode-aware
  \\s      Unicode whitespace    ASCII-only             Unicode-aware, but
                                                        a DIFFERENT set
                                                        (adds \\x1c-\\x1f,
                                                        \\x85; lacks \\ufeff)
  \\b      ASCII-word boundary   Unicode-word (!)       Unicode-word

This module pins both engines to the JS behavior by STATIC pattern
rewriting (r7 for \\d/\\D/\\w/\\W, r8 for \\s/\\S and \\b/\\B — closing
the two "documented approximation" tails from the r7 audit):

- \\d/\\w family -> explicit ASCII classes (Python only; Java is
  already ASCII for these).
- \\s/\\S -> the explicit ECMAScript WhiteSpace ∪ LineTerminator class
  (BOTH engines: Java is missing the Unicode members, Python matches a
  different Unicode set).
- \\b/\\B -> ASCII-word lookaround groups (BOTH engines: Python's \\b
  is Unicode-word, and Java's \\b is ALSO Unicode-aware even without
  UNICODE_CHARACTER_CLASS — an asymmetry with its ASCII \\w, caught by
  the fidelity corpus). Inside a character class ``\\b`` means
  backspace and is left alone.

Everything is escape- and class-aware: a scanner walks the pattern so
``\\\\d`` (escaped backslash + d) and class-internal occurrences are
handled correctly. Differential coverage:
tests/test_jsonata_compiler.py::test_regex_fidelity_corpus runs every
(pattern x function x input) triple through both engines, including
non-ASCII whitespace and word-char inputs.
"""

from __future__ import annotations

# ECMAScript WhiteSpace + LineTerminator (the JS \s set), as escape
# sequences valid in BOTH Python re and java.util.regex patterns.
JS_WS = (
    r" \t\n\x0B\f\r"
    "\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029"
    "\\u202F\\u205F\\u3000\\uFEFF"
)
ASCII_WORD = "A-Za-z0-9_"

# \b as explicit ASCII-word lookarounds (JS semantics in Python re):
# a position with a word char on exactly one side (string edges count
# as non-word).
_JS_B = (
    rf"(?:(?<![{ASCII_WORD}])(?=[{ASCII_WORD}])"
    rf"|(?<=[{ASCII_WORD}])(?![{ASCII_WORD}]))"
)
_JS_NOT_B = (
    rf"(?:(?<=[{ASCII_WORD}])(?=[{ASCII_WORD}])"
    rf"|(?<![{ASCII_WORD}])(?![{ASCII_WORD}]))"
)

# escape -> (replacement outside a class, replacement inside a class);
# None = leave alone in that position
_PY_REWRITES = {
    "d": ("[0-9]", "0-9"),
    "D": ("[^0-9]", None),
    "w": (f"[{ASCII_WORD}]", ASCII_WORD),
    "W": (f"[^{ASCII_WORD}]", None),
    "s": (f"[{JS_WS}]", JS_WS),
    "S": (f"[^{JS_WS}]", None),
    "b": (_JS_B, None),  # in-class \b is backspace: leave
    "B": (_JS_NOT_B, None),
}
# Java is already ASCII for \d/\w, but its \b is UNICODE-aware even
# without UNICODE_CHARACTER_CLASS (a known java.util.regex asymmetry —
# measured in the fidelity corpus: /\bword\b/ missed 'wordé'), and its
# \s is ASCII-only; both get the JS rewrite.
_JAVA_REWRITES = {
    "s": (f"[{JS_WS}]", JS_WS),
    "S": (f"[^{JS_WS}]", None),
    "b": (_JS_B, None),  # in-class \b is backspace: leave
    "B": (_JS_NOT_B, None),
}


def js_fidelity_rewrite(pattern: str, engine: str) -> str:
    """Rewrite ``pattern`` so ``engine`` ('python' | 'java') matches JS
    RegExp semantics for the divergent escape classes (module
    docstring). Static, total: any pattern comes out syntactically
    valid for its engine if it went in valid."""
    rewrites = _PY_REWRITES if engine == "python" else _JAVA_REWRITES
    out: list[str] = []
    i = 0
    in_class = False
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            n = pattern[i + 1]
            rule = rewrites.get(n)
            if rule is not None:
                rep = rule[1] if in_class else rule[0]
                if rep is not None:
                    out.append(rep)
                    i += 2
                    continue
            out.append(c + n)
            i += 2
            continue
        if c == "[" and not in_class:
            in_class = True
        elif c == "]" and in_class:
            in_class = False
        out.append(c)
        i += 1
    return "".join(out)
