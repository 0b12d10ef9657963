"""Table-driven conftag parser tests — the same case table as the
reference's only unit test (conftags/tags_test.go:8-60), plus the demo
schema's real tags (demo/schema.sql:62-84)."""

import pytest

from search_replica_spark.functions.conftags import (
    Tag,
    TagSyntaxError,
    filter_tags,
    get,
    parse,
)

CASES = [
    ("empty", "", False, []),
    ("invalid syntax", "currency is ISO4217 code", True, None),
    ("simple", 'tag:"value"', False, [Tag("tag", ["value"])]),
    (
        "multiple",
        'tag:"value" tag2:"VALUE2"',
        False,
        [Tag("tag", ["value"]), Tag("tag2", ["VALUE2"])],
    ),
    (
        "multiple no space",
        'tag:"value"tag2:"VALUE2"',
        False,
        [Tag("tag", ["value"]), Tag("tag2", ["VALUE2"])],
    ),
    (
        "multiple with same name",
        'tag:"val1"tag:"val2" tag:"val3"',
        False,
        [Tag("tag", ["val1"]), Tag("tag", ["val2"]), Tag("tag", ["val3"])],
    ),
    (
        "multiple with space comment",
        'tag:"value" tag2:"VALUE2"    Some human readable part of comment',
        False,
        [Tag("tag", ["value"]), Tag("tag2", ["VALUE2"])],
    ),
    (
        "multiple no space with comment",
        'tag:"value"tag2:"VALUE2"#HumanReadablePartOfComment',
        False,
        [Tag("tag", ["value"]), Tag("tag2", ["VALUE2"])],
    ),
    (
        "multiple no space with comment tag",
        'tag:"value"tag2:"VALUE2"#tag3:"value3"',
        False,
        [Tag("tag", ["value"]), Tag("tag2", ["VALUE2"])],
    ),
]


@pytest.mark.parametrize("name,src,want_err,want", CASES, ids=[c[0] for c in CASES])
def test_reference_case_table(name, src, want_err, want):
    if want_err:
        with pytest.raises(TagSyntaxError):
            parse(src)
    else:
        assert parse(src) == want


def test_demo_schema_tags():
    # the actual config comments from the reference demo (schema.sql:62-84)
    t = parse('index:"main,all" join:"join,immaparent" inline:"inline_name,inlined_field"')
    assert get(t, "index").values == ["main", "all"]
    assert get(t, "join").values == ["join", "immaparent"]
    assert get(t, "inline").values == ["inline_name", "inlined_field"]

    col = parse('inline:"inline_name,_pk,parent,routing"')
    assert get(col, "inline").values == ["inline_name", "_pk", "parent", "routing"]

    multi = parse('index:",routing" join:"parent"')
    assert get(multi, "index").values == ["", "routing"]
    assert get(multi, "join").values == ["parent"]

    drop = parse('index:"-"')
    assert get(drop, "index").values == ["-"]


def test_values_with_escapes_and_filter():
    t = parse(r'tag:"a\"b,c" tag:"d"')
    assert t[0].values == ['a"b', "c"]
    assert [x.values for x in filter_tags(t, "tag")] == [['a"b', "c"], ["d"]]
    assert get(t, "absent") is None


def test_unterminated_value():
    with pytest.raises(TagSyntaxError):
        parse('tag:"unterminated')


def test_go_compatible_escapes():
    # standard escapes decode to control chars (Go strconv.Unquote semantics)
    assert parse(r'tag:"a\nb"')[0].values == ["a\nb"]
    assert parse(r'tag:"a\tb"')[0].values == ["a\tb"]
    assert parse(r'tag:"\x41é"')[0].values == ["Aé"]
    assert parse(r'tag:"\U0001F600"')[0].values == ["\U0001F600"]
    assert parse(r'tag:"\101"')[0].values == ["A"]  # octal
    # unknown escapes are a syntax error, exactly like Go
    for bad in (r'tag:"\q"', r'tag:"\x4"', r'tag:"\u12"', r'tag:"\8"', r"tag:\"\'\""):
        with pytest.raises(TagSyntaxError):
            parse(bad)


from hypothesis import given, settings
from hypothesis import strategies as st

_plain = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters='\\"'),
    min_size=0, max_size=20,
)


@given(st.lists(st.tuples(
    st.text(alphabet="abcdefgh_", min_size=1, max_size=8), _plain), min_size=0, max_size=6))
@settings(max_examples=100, deadline=None)
def test_parse_roundtrip_property(pairs):
    """Any well-formed tag string parses back to exactly its pairs (values
    without commas/escapes round-trip verbatim; the parser never crashes)."""
    src = " ".join(f'{k}:"{v}"' for k, v in pairs)
    got = parse(src)
    assert [(t.name, t.values) for t in got] == [(k, v.split(",")) for k, v in pairs]
