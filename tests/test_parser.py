"""Span-fold parser tests (P1-P3): title concatenation state machine, nested
wrapping, section exclusion, symbol scrub."""

from list_extractor_spark.core.parser import parse_spans


def _spans(*seq):
    return [(k, t, "", i) for i, (k, t) in enumerate(seq)]


def test_title_concat_levels():
    spans = _spans(
        ("section:0", "Filmography"),
        ("list_item:1", "''A'' (1990)"),
        ("section:1", "TV shows"),
        ("list_item:1", "''B'' (1991)"),
        ("section:2", "Cartoons"),
        ("list_item:1", "''C'' (1992)"),
        ("section:1", "Films"),
        ("list_item:1", "''D'' (1993)"),
    )
    d = parse_spans(spans, "en")
    assert set(d.keys()) == {
        "Filmography",
        "Filmography - TV shows",
        "Filmography - TV shows - Cartoons",
        # level back to 1: concat with header (= previous title's parent)
        "Filmography - TV shows - Films",
    }


def test_nested_items_wrapped_singly():
    spans = _spans(
        ("section:0", "Members"),
        ("list_item:1", "a"),
        ("list_item:2", "n1"),
        ("list_item:2", "n2"),
        ("list_item:1", "b"),
    )
    d = parse_spans(spans, "en")
    # each nested item becomes its own single-element wrapper
    # (reference wikiParser.py:105-109)
    assert d["Members"] == ["a", ["n1"], ["n2"], "b"]


def test_excluded_sections_exact_match():
    spans = _spans(
        ("section:0", "References"),
        ("list_item:1", "cite"),
        ("section:0", "Works"),
        ("list_item:1", "''T''"),
    )
    d = parse_spans(spans, "en")
    assert "References" not in d and "Works" in d


def test_nbsp_scrub_and_media_ignored():
    spans = [
        ("section:0", "Works", "", 0),
        ("media", "caption", "File:X.jpg", 1),
        ("list_item:1", "''A&nbsp;B''", "", 2),
        ("text", "prose", "", 3),
    ]
    d = parse_spans(spans, "en")
    assert d["Works"] == ["''AB''"]


def test_same_title_overwrites():
    spans = _spans(
        ("section:0", "Works"),
        ("list_item:1", "first"),
        ("section:0", "Other"),
        ("list_item:1", "x"),
        ("section:0", "Works"),
        ("list_item:1", "second"),
    )
    d = parse_spans(spans, "en")
    # reference: lists.update per section -> the later section wins
    # (wikiParser.py:58)
    assert d["Works"] == ["second"]


def test_offset_order_respected():
    spans = [
        ("list_item:1", "b", "", 3),
        ("section:0", "Works", "", 0),
        ("list_item:1", "a", "", 1),
    ]
    d = parse_spans(spans, "en")
    assert d["Works"] == ["a", "b"]
