from .corpus import CORPUS_SCHEMA, corpus_from_documents, synthetic_corpus

__all__ = ["CORPUS_SCHEMA", "synthetic_corpus", "corpus_from_documents"]
