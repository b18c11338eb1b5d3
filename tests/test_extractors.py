"""Port-parity unit tests for the scalar extractor primitives (SURVEY.md §2.5),
including the reference's observable quirks (bug-compatibility list §7.3)."""

from list_extractor_spark.core import extractors as E


def test_italic_basic():
    assert E.italic_mapper("''Neuromancer'' (1984)") == "Neuromancer"


def test_italic_keeps_inner_parens():
    assert (
        E.italic_mapper("''Agrippa (A Book of the Dead)'' (1992)")
        == "Agrippa (A Book of the Dead)"
    )


def test_italic_none():
    assert E.italic_mapper("no italics here") is None


def test_reference_basic():
    assert E.reference_mapper("won the {{Hugo Award}} twice") == "{{Hugo Award}}"


def test_reference_date_discarded():
    # date-bearing reference -> None (reference mapper.py:1672-1676: the retry
    # recurses on the digit string, which can never match)
    assert E.reference_mapper("{{1984 ceremony}} and {{Hugo Award}}") is None


def test_quote_includes_quotes():
    assert E.quote_mapper('sang "Blue Sky" live') == '"Blue Sky"'


def test_quote_date_discarded():
    assert E.quote_mapper('"Live 1999" tour') is None


def test_general_stops_at_punctuation():
    assert E.general_mapper("Alice Stone, novelist") == "Alice Stone"
    assert E.general_mapper("Bob: critic") == "Bob"


def test_general_skips_leading_digits():
    out = E.general_mapper("1999 Solar Road")
    assert "Solar Road" in out and not out.startswith("1")


def test_general_en_dash_excluded_hyphen_kept():
    assert E.general_mapper("Alice – guitar") == "Alice"
    assert E.general_mapper("Alice - guitar") == "Alice - guitar"


def test_list_elem_clean():
    # trailing quote survives: rstrip("'") runs before the final whitespace
    # strip (reference mapper.py:1611-1628 order)
    assert E.list_elem_clean("  '{{Foo [Bar]}}'  ") == "Foo Bar'"
    assert E.list_elem_clean("'{{Foo [Bar]}}'") == "Foo Bar"
    assert E.list_elem_clean("''X''") == "X"


def test_isbn():
    assert E.isbn_mapper("Novel ISBN 0-553-08853-X end") == "0-553-08853-X"
    assert E.isbn_mapper("no code") is None


def test_year_mapper():
    assert E.year_mapper("born 1984, died 2077") == ["1984", "2077"]
    assert E.year_mapper("no dates") is None


def test_month_year_single_month():
    assert E.month_year_mapper("published November 1991") == ["1991^11"]


def test_month_year_plain_period():
    # leading space kept: the reference's period regex starts with \s?
    # inside the match (mapper.py:1317)
    assert E.month_year_mapper("toured 1991–1994") == [[" 1991", "1994"]]
    assert E.month_year_mapper("1991–1994") == [["1991", "1994"]]


def test_month_year_month_period():
    out = E.month_year_mapper("March 2002 – May 2004")
    assert out == [["2002^3", "2004^5"]]


def test_month_year_mixed():
    out = E.month_year_mapper("active 1980–1985 and again 1999")
    assert [" 1980", "1985"] in out and "1999" in out


def test_litgenre_ambiguous_suppressed():
    assert E.litgenre_mapper("Novels", "en") == "Novel"
    # two genres match -> None (reference mapper.py:1389-1395)
    assert E.litgenre_mapper("Novels and short stories", "en") is None


def test_filmpart_and_type_defaults():
    assert E.filmpart_mapper("Filmography", "en") == "starring"
    assert E.filmpart_mapper("Filmography - Director", "en") == "director"
    assert E.filmtype_mapper("Films", "en") == "Film"
    assert E.filmtype_mapper("TV shows", "en") == "TelevisionShow"


def test_award_status():
    assert E.award_status_mapper("Awards won", "en") == "Winner"
    assert E.award_status_mapper("Nominations", "en") == "Nominated"
    assert E.award_status_mapper("honorary degrees", "en") == "HonoraryDegree"
    assert E.award_status_mapper("Recognition", "en") is None


def test_bracket_feature():
    assert E.bracket_feature_mapper("John Doe (cartoonist) 1980") == "cartoonist"
    assert E.bracket_feature_mapper("no brackets") is None


def test_alumni_profession():
    assert E.alumni_profession_mapper("Jane Doe – novelist") == "novelist"
    assert E.alumni_profession_mapper("no profession here") is None


def test_uri_quote_parity():
    # golden-file encodings (William_Gibson ttl: %28 %27 %2C)
    assert E.uri_quote("Agrippa_(A_Book_of_the_Dead)") == "Agrippa_%28A_Book_of_the_Dead%29"
    assert E.uri_quote("All_Tomorrow's_Parties") == "All_Tomorrow%27s_Parties"
    assert E.uri_quote("Red_Star,_Winter_Orbit") == "Red_Star%2C_Winter_Orbit"


def test_sentence_splitter_tail_mint():
    from list_extractor_spark.core.links import NULL_LINKER

    out = E.sentence_splitter("won Prize for Great Work", "for", "en", NULL_LINKER)
    assert out == "Great_Work"


def test_sentence_splitter_no_split():
    from list_extractor_spark.core.links import NULL_LINKER

    assert E.sentence_splitter("nothing to split", "for", "en", NULL_LINKER) is None
