from .corpus import make_corpus, make_snapshots, corpus_to_rows  # noqa: F401
