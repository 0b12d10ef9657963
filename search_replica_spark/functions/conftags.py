"""Config-tag grammar (C1) — from-scratch Python implementation of the
reference's struct-tag-like DSL (reference: conftags/tags.go:60-114; the
grammar carries the whole table/column config in SQL COMMENTs,
demo/schema.sql:62-84).

Grammar: optionally space-separated ``key:"value"`` pairs; a key is any run
of non-control chars except space/quote/colon; a value is a double-quoted
string with backslash escapes, split on commas into opts. Three or more
spaces between tags — or a ``#`` — start a human-readable comment that is
ignored. Duplicate keys are preserved in order.

Our engine configures itself with a plain dataclass (config.IndexConfig),
but the parser is provided (and tested against the reference's own test
table, conftags/tags_test.go:8-60) so reference-style commented schemas can
be translated mechanically — see operators/doc_assembly.py for the demo
schema's tags applied by hand.
"""

from __future__ import annotations

from dataclasses import dataclass


class TagSyntaxError(ValueError):
    pass


@dataclass
class Tag:
    name: str
    values: list[str]


_SIMPLE_ESCAPES = {
    "a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t",
    "v": "\v", "\\": "\\", '"': '"',
}


def _unquote(qvalue: str) -> str:
    """Go-compatible double-quoted-string unquote (strconv.Unquote semantics,
    reference: conftags/tags.go:99): standard escapes decode to their control
    characters, \\xHH / \\uHHHH / \\UHHHHHHHH / \\NNN (octal) decode to the
    escaped code point/byte, and unknown escapes (including \\' inside double
    quotes, exactly like Go) raise TagSyntaxError. Byte escapes that don't
    form valid UTF-8 are preserved via latin-1 (Go strings tolerate raw
    bytes; Python str can't, this is the closest faithful mapping)."""
    if len(qvalue) < 2 or qvalue[0] != '"' or qvalue[-1] != '"':
        raise TagSyntaxError("value not quoted")
    body = qvalue[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\n":
            raise TagSyntaxError("newline in quoted value")
        if c != "\\":
            out += c.encode("utf-8")
            i += 1
            continue
        if i + 1 >= len(body):
            raise TagSyntaxError("dangling escape")
        e = body[i + 1]
        if e in _SIMPLE_ESCAPES:
            out += _SIMPLE_ESCAPES[e].encode("utf-8")
            i += 2
        elif e == "x":
            h = body[i + 2 : i + 4]
            if len(h) != 2 or any(ch not in "0123456789abcdefABCDEF" for ch in h):
                raise TagSyntaxError(f"invalid hex escape \\x{h}")
            out.append(int(h, 16))
            i += 4
        elif e in ("u", "U"):
            n = 4 if e == "u" else 8
            h = body[i + 2 : i + 2 + n]
            if len(h) != n or any(ch not in "0123456789abcdefABCDEF" for ch in h):
                raise TagSyntaxError(f"invalid unicode escape \\{e}{h}")
            v = int(h, 16)
            if v > 0x10FFFF or 0xD800 <= v <= 0xDFFF:
                raise TagSyntaxError(f"escape \\{e}{h} is not a valid code point")
            out += chr(v).encode("utf-8")
            i += 2 + n
        elif e in "01234567":
            o = body[i + 1 : i + 4]
            if len(o) != 3 or any(ch not in "01234567" for ch in o):
                raise TagSyntaxError(f"invalid octal escape \\{o}")
            v = int(o, 8)
            if v > 255:
                raise TagSyntaxError(f"octal escape \\{o} > 255")
            out.append(v)
            i += 4
        else:
            raise TagSyntaxError(f"unknown escape \\{e}")
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return out.decode("latin-1")


def parse(src: str) -> list[Tag]:
    """Parse a tag string; raises TagSyntaxError on malformed input."""
    tags: list[Tag] = []
    while src:
        # skip leading spaces; ≥3 spaces or '#' starts the ignored comment
        i = 0
        while i < len(src) and src[i] == " ":
            i += 1
        src = src[i:]
        if not src:
            return tags
        if i > 3 or src[0] == "#":
            return tags

        i = 0
        while i < len(src) and src[i] > " " and src[i] not in (":", '"') and src[i] != "\x7f":
            i += 1
        if i == 0 or i + 1 >= len(src) or src[i] != ":" or src[i + 1] != '"':
            raise TagSyntaxError(f"syntax error near {src[:20]!r}")
        name = src[:i]
        src = src[i + 1 :]

        # scan the quoted value (honoring backslash escapes)
        i = 1
        while i < len(src) and src[i] != '"':
            if src[i] == "\\":
                i += 1
            i += 1
        if i >= len(src):
            raise TagSyntaxError("unterminated quoted value")
        qvalue = src[: i + 1]
        src = src[i + 1 :]
        tags.append(Tag(name=name, values=_unquote(qvalue).split(",")))
    return tags


def get(tags: list[Tag], name: str) -> Tag | None:
    """First tag with the given name (reference: Tags.Get)."""
    for t in tags:
        if t.name == name:
            return t
    return None


def filter_tags(tags: list[Tag], name: str) -> list[Tag]:
    """All tags with the given name, in order (reference: Tags.Filter)."""
    return [t for t in tags if t.name == name]
