import pandas as pd

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_pandas, tokenize_py


def test_camel_snake_split():
    assert tokenize_py("getValueFromHTTPServer") == [
        "get", "value", "from", "http", "server",
    ]
    assert tokenize_py("snake_case_name") == ["snake", "case", "name"]
    assert tokenize_py("parseJSON2xml") == ["parse", "json2xml"]
    assert tokenize_py("x") == ["x"]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []


def test_pandas_matches_py():
    texts = [
        "public void getValue() { return this.innerValue; }",
        "def snake_case(x): return x10 + HTTPClient",
        "",
        None,
        "MixedCASEToken camelCase UPPER lower 123abc",
    ]
    vec = tokenize_pandas(pd.Series(texts)).tolist()
    ref = [tokenize_py(t) for t in texts]
    assert vec == ref
