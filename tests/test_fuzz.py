"""Property-based robustness: the extractor primitives and the document
extractor must be total (no crashes) and deterministic over arbitrary text —
at 10^12 documents every weird byte sequence will occur."""

from hypothesis import given, settings, strategies as st

from list_extractor_spark.core import extractors as E
from list_extractor_spark.core.mappers import extract_document

text = st.text(max_size=200)


@settings(max_examples=200, deadline=None)
@given(text)
def test_extractors_total_and_deterministic(s):
    for fn in (
        E.italic_mapper,
        E.reference_mapper,
        E.quote_mapper,
        E.general_mapper,
        E.isbn_mapper,
        E.year_mapper,
        E.month_year_mapper,
        E.bracket_feature_mapper,
        E.list_elem_clean,
    ):
        assert fn(s) == fn(s)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(
                ["section:0", "section:1", "list_item:1", "list_item:2", "text", "media"]
            ),
            st.text(max_size=60),
        ),
        max_size=20,
    ),
    st.sampled_from(["Writer", "Band", "Person", "EducationalInstitution", "Magazine"]),
)
def test_extract_document_total(seq, res_class):
    spans = [(k, t, "", i) for i, (k, t) in enumerate(seq)]
    t1, _ = extract_document("Doc_X", res_class, "en", spans)
    t2, _ = extract_document("Doc_X", res_class, "en", spans)
    assert t1 == t2
    for s, p, o, dt in t1:
        assert isinstance(s, str) and isinstance(p, str) and isinstance(o, str)
