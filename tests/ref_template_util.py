"""Shared helpers for reference-source-derived template tests.

These parse the format-string literals out of the reference Rust
reporters at TEST TIME (no reference code is vendored) so our emitted
reports can be byte-verified against the actual reference templates —
the closest available oracle given no Rust toolchain exists here to
build the reference binary. Used by test_html_reference_template.py,
test_json_reference_template.py and test_stdout_reference_template.py.
"""

import re


def unescape_rust(lit: str) -> str:
    """Unescape a Rust string literal body (the part between quotes)."""
    out = []
    i = 0
    n = len(lit)
    while i < n:
        ch = lit[i]
        if ch == "\\":
            nxt = lit[i + 1]
            if nxt == "n":
                out.append("\n")
                i += 2
            elif nxt == "t":
                out.append("\t")
                i += 2
            elif nxt == "r":
                out.append("\r")
                i += 2
            elif nxt == '"':
                out.append('"')
                i += 2
            elif nxt == "'":
                out.append("'")
                i += 2
            elif nxt == "\\":
                out.append("\\")
                i += 2
            elif nxt == "\n":
                # line continuation: strip the newline + leading whitespace
                i += 2
                while i < n and lit[i] in " \t":
                    i += 1
            else:  # pragma: no cover - no other escapes in the templates
                raise AssertionError(f"unhandled escape \\{nxt}")
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def fn_body(src: str, name: str) -> str:
    """Extract the body of `fn name(...)` by brace matching."""
    m = re.search(rf"fn {name}\b[^{{]*\{{", src)
    assert m, name
    depth = 1
    i = m.end()
    while depth:
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
        i += 1
    return src[m.end() : i - 1]


def _first_literal(body: str, start: int):
    """(unescaped literal, end index) for the first "..." after `start`."""
    i = start
    while body[i] != '"':
        i += 1
    j = i + 1
    while True:
        if body[j] == "\\":
            j += 2
            continue
        if body[j] == '"':
            break
        j += 1
    return unescape_rust(body[i + 1 : j]), j + 1


def write_literals(body: str):
    """First string literal of each write!(...) call, in source order."""
    lits = []
    for m in re.finditer(r"write!\s*\(", body):
        lit, _ = _first_literal(body, m.end())
        lits.append(lit)
    return lits


def fmt_literals(body: str, macros=("write", "writeln", "print", "println")):
    """All format-macro literals in source order, with the newline a
    *ln macro appends applied. -> list of template strings."""
    pat = "|".join(macros)
    out = []
    for m in re.finditer(rf"\b({pat})!\s*\(", body):
        lit, _ = _first_literal(body, m.end())
        if m.group(1).endswith("ln"):
            lit += "\n"
        out.append(lit)
    return out


def split_placeholders(template: str):
    """Split a format template on {} placeholders ({{/}} are literal
    braces) -> list of static pieces; a gap sits between consecutive
    pieces."""
    segs = re.split(r"(?<!\{)\{\}(?!\})", template)
    return [s.replace("{{", "{").replace("}}", "}") for s in segs]


def match_template(out: str, pieces, *, anchor_start=True, anchor_end=True,
                   pos=0):
    """In-order scan of static `pieces` through `out` with wildcard gaps.
    Returns the scan position after the last piece."""
    for idx, piece in enumerate(pieces):
        found = out.find(piece, pos)
        assert found >= 0, f"template piece {idx} missing: {piece[:80]!r}"
        if idx == 0 and anchor_start:
            assert found == pos, (
                f"piece 0 must anchor at {pos}: {piece[:60]!r} vs "
                f"{out[pos:pos + 60]!r}"
            )
        pos = found + len(piece)
    if anchor_end:
        assert pos == len(out), f"trailing bytes after template: {out[pos:]!r}"
    return pos
