from .tokenizer import tokenize_pandas, tokenize_py, tokens_udf

__all__ = ["tokenize_py", "tokenize_pandas", "tokens_udf"]
