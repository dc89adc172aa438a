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


def test_lang_filter_drops_keywords():
    from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py

    code = "def getValue(self): return self.value"
    plain = tokenize_py(code)
    assert "def" in plain and "self" in plain
    filtered = tokenize_py(code, lang="py", lang_filter=True)
    assert "def" not in filtered and "self" not in filtered and "return" not in filtered
    assert "get" in filtered and "value" in filtered
    # unknown language -> passthrough
    assert tokenize_py(code, lang="cobol", lang_filter=True) == plain


def test_lang_filter_pandas_matches_py():
    import pandas as pd

    from elasticsearch_jdbc_spark.functions.tokenizer import (
        tokenize_pandas,
        tokenize_py,
    )

    texts = pd.Series(["def f(): return 1", "func main() { return }", None])
    langs = pd.Series(["py", "go", "py"])
    got = tokenize_pandas(texts, langs, lang_filter=True).tolist()
    want = [tokenize_py(t, la, True) for t, la in zip(texts, langs)]
    assert got == want


def test_builder_lang_filter_end_to_end(spark, tmp_path):
    from elasticsearch_jdbc_spark.index import IndexBuilder
    import pyarrow.dataset as ds

    df = spark.createDataFrame(
        [("r", "a.py", "c", "py", "def alpha(self): return beta"),
         ("r", "b.go", "c", "go", "func alpha() { return beta }")],
        "repo string, path string, commit string, lang string, content string",
    )
    idx = str(tmp_path / "lf")
    m = IndexBuilder(spark, idx, partitions=2, lang_filter=True).build(df, resume=False)
    assert m["lang_filter"] is True
    terms = set(
        ds.dataset(f"{idx}/terms", format="parquet").to_table(columns=["term"])
        .column("term").to_pylist()
    )
    assert "alpha" in terms and "beta" in terms
    assert "def" not in terms and "func" not in terms and "return" not in terms


def test_analyze_py_offsets_positions():
    """ES _analyze analogue: tokens == tokenize_py, offsets slice the
    original text (modulo lowercase), positions are as-indexed ordinals."""
    from elasticsearch_jdbc_spark.functions import analyze_py, tokenize_py

    text = "getFileBuffer while x += readFile(path_name)"
    out = analyze_py(text)
    assert [e["token"] for e in out] == tokenize_py(text)
    for e in out:
        assert text[e["start_offset"]:e["end_offset"]].lower() == e["token"]
    assert [e["position"] for e in out] == list(range(len(out)))
    # lang_filter drops keywords AND compacts positions (as indexed)
    f = analyze_py(text, lang="rs", lang_filter=True)
    assert "while" not in [e["token"] for e in f]
    assert [e["position"] for e in f] == list(range(len(f)))
    assert analyze_py("") == []
    assert analyze_py("§§ ---") == []
