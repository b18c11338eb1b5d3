from .corpus import make_corpus, make_page_types, make_snapshots, corpus_to_rows  # noqa: F401
