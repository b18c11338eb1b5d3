"""Rule tables — vendored as *data* from the reference's configuration.

The reference keeps its dispatch rules in three places:
  - MAPPING (res_class -> [DOMAIN,...])    reference: settings.json:2-20
  - section keyword dicts                   reference: mapping_rules.py:95-159
  - attribute dicts                         reference: mapping_rules.py:186-278
  - custom mapper configs                   reference: custom_mappers.json:1-46

In this engine they are plain Python dicts, broadcast to executors inside the
pandas-UDF closure (small, static).  The *semantics* of every table are
re-derived from the reference's observable behavior, not its code.
"""

from .tables import (  # noqa: F401
    ALUMNI,
    AWARD_STATUS_TYPE,
    BAND_MEMBERS,
    BIBLIOGRAPHY,
    BIBLIO_GENRE,
    CAREER,
    CONCERT_TOURS,
    CONTRIBUTION_TYPE,
    CONTRIBUTORS,
    CUSTOM_MAPPERS,
    DISCOGRAPHY,
    EXCLUDED_SECTIONS,
    FILMOGRAPHY,
    FILMOGRAPHY_PARTICIPATION,
    FILMOGRAPHY_TYPE,
    HONORS,
    MAPPING,
    OTHER_LITERATURE_DETAILS,
    OTHER_PERSON_DETAILS,
    PERSON_DETAILS,
    PROGRAMS_OFFERED,
    SECTION_DICTS,
    STAFF,
    TRANSLATIONS,
)
