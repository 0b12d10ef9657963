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


def _unquote(qvalue: str) -> str:
    """Minimal double-quoted-string unquote with backslash escapes."""
    if len(qvalue) < 2 or qvalue[0] != '"' or qvalue[-1] != '"':
        raise TagSyntaxError("value not quoted")
    body = qvalue[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\":
            if i + 1 >= len(body):
                raise TagSyntaxError("dangling escape")
            out.append(body[i + 1])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


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
