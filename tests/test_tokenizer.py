import pandas as pd

from search_replica_spark.analysis import tokenize_series, tokenize_text


def test_camel_and_snake_split():
    assert tokenize_text("getFooBar") == ["get", "foo", "bar"]
    assert tokenize_text("snake_case_name") == ["snake", "case", "name"]
    assert tokenize_text("HTTPServer2x") == ["http", "server2x"]
    assert tokenize_text("XMLHttpRequest") == ["xml", "http", "request"]


def test_punct_and_digits():
    assert tokenize_text("foo.bar(baz, qux)") == ["foo", "bar", "baz", "qux"]
    assert tokenize_text("v2 int64 0xff") == ["v2", "int64", "0xff"]
    assert tokenize_text("") == []
    assert tokenize_text(None) == []


def test_series_matches_scalar():
    texts = ["getFooBar baz_qux", "HTTPServer XMLHttp", "", "a1B2c3"]
    s = tokenize_series(pd.Series(texts))
    for got, raw in zip(s, texts):
        assert list(got) == tokenize_text(raw)


def test_series_null_handling():
    s = tokenize_series(pd.Series([None, "Ok"]))
    assert list(s.iloc[0]) == []
    assert list(s.iloc[1]) == ["ok"]
