from .tokenizer import analyze_py, tokenize_pandas, tokenize_py, tokens_udf

__all__ = ["analyze_py", "tokenize_py", "tokenize_pandas", "tokens_udf"]
