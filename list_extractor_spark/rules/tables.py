"""Static rule tables (data, not code).

Contents mirror the reference configuration so that triple output agrees:
  MAPPING               <- reference settings.json:2-20
  section keyword dicts <- reference mapping_rules.py:95-159
  attribute dicts       <- reference mapping_rules.py:67-72,186-278
  CUSTOM_MAPPERS        <- reference custom_mappers.json:1-46

These are *rule data* consumed by the engine; a user adds a domain/language by
editing these tables (the reference's rulesGenerator.py workflow), no engine
change needed.
"""

# Sections dropped before any mapping (reference mapping_rules.py:67-72,
# applied by utilities.clean_dictionary, utilities.py:156-171).
EXCLUDED_SECTIONS = {
    "de": ["Einzelnachweise", "Weblinks", "Literatur", "Siehe auch"],
    "en": ["External links", "References", "See also", "Further reading"],
    "it": ["Collegamenti esterni", "Bibliografia", "Altri progetti", "Voci correlate"],
    "es": ["Referencias", "Véase también", "Enlaces externos", "Notas"],
}

# res_class -> ordered list of extraction domains (reference settings.json:2-20).
MAPPING = {
    "School": ["ALUMNI", "PROGRAMS_OFFERED", "STAFF"],
    "Writer": ["BIBLIOGRAPHY", "HONORS", "OTHER_PERSON_DETAILS"],
    "Group": ["BAND_MEMBERS"],
    "Band": ["DISCOGRAPHY", "CONCERT_TOURS", "BAND_MEMBERS", "HONORS"],
    "Athlete": ["HONORS"],
    "EducationalInstitution": ["ALUMNI", "PROGRAMS_OFFERED", "STAFF"],
    "CUSTOM_MUSICAL_ARTIST": ["CUSTOM_ARTIST_MAPPER"],
    "Actor": ["FILMOGRAPHY", "DISCOGRAPHY", "HONORS"],
    "Person": [
        "FILMOGRAPHY",
        "DISCOGRAPHY",
        "BIBLIOGRAPHY",
        "HONORS",
        "OTHER_PERSON_DETAILS",
        "CAREER",
        "CONCERT_TOURS",
    ],
    "Magazine": ["CONTRIBUTORS", "OTHER_LITERATURE_DETAILS", "HONORS", "BIBLIOGRAPHY"],
    "PeriodicalLiterature": [
        "CONTRIBUTORS",
        "OTHER_LITERATURE_DETAILS",
        "HONORS",
        "BIBLIOGRAPHY",
    ],
    "MusicGenre": ["MUSIC_GENRE_MAPPER"],
    "MusicalArtist": ["DISCOGRAPHY", "FILMOGRAPHY", "CONCERT_TOURS", "HONORS"],
    "Newspaper": ["CONTRIBUTORS", "OTHER_LITERATURE_DETAILS", "HONORS", "BIBLIOGRAPHY"],
    "CUSTOM_WRITER": ["CUSTOM_BIBLIOGRAPHY_MAPPER"],
    "University": ["ALUMNI", "PROGRAMS_OFFERED", "STAFF"],
    "Politician": ["CAREER"],
}

# ---- Section keyword dicts (reference mapping_rules.py:95-159) ----
# keyword lists are matched against section-title paths with re.IGNORECASE;
# first matching keyword wins per section (reference mapper.py:109-125).

BIBLIOGRAPHY = {
    "en": ["bibliography", "works", "novels", "books", "publications"],
    "it": ["opere", "romanzi", "saggi", "pubblicazioni", "edizioni"],
    "de": ["bibliographie", "werke", "arbeiten", "bücher", "publikationen"],
    "es": ["Obras", "Bibliografía", ""],
}

FILMOGRAPHY = {
    "en": ["filmography", "shows"],
    "it": ["filmografia"],
    "de": ["Filmografie"],
    "es": ["Filmografía", "Televisión"],
}

DISCOGRAPHY = {
    "en": ["discography", "studio", "singles", "soundtrack"],
    "it": ["discografia"],
    "de": ["Diskografie"],
    "es": ["Discografía", "Albumes"],
}

BAND_MEMBERS = {
    "en": ["members", "bands", "personnel", "team"],
    "it": ["Formazione", "Membri", "bande", "personale", "team"],
    "de": ["Bandmitglieder", "Besetzung", "Mitglieder", "Gruppe", "Personal"],
    "es": ["Miembros", "banda", "grupo", "personal"],
}

CONCERT_TOURS = {
    "en": ["Concert", "tours"],
    "it": ["Tournée", "concerto"],
    "de": ["Tourneen", "Konzerte", "Konzert"],
    "es": ["Giras musicales", "Giras"],
}

ALUMNI = {"en": ["alumni", "pupil"]}

STAFF = {
    "en": [
        "professors",
        "Presidents",
        "Faculty",
        "staff",
        "people",
        "Principals",
        "recipients",
    ]
}

PROGRAMS_OFFERED = {
    "en": ["Programs", "Programmes", "Faculties", "Academics", "Courses", "Departments"]
}

HONORS = {
    "en": [
        "Recognition",
        "awards",
        "honors",
        "honours",
        "legacy",
        "titles",
        "accomplishments",
    ]
}

CAREER = {"en": ["works", "work", "career", "expeditions", "tree"]}

OTHER_PERSON_DETAILS = {"en": ["family", "marriages", "restaurants", "memberships"]}

CONTRIBUTORS = {
    "en": [
        "contributors",
        "staff",
        "cover",
        "editors",
        "editor",
        "publisher",
        "publishers",
        "celebrity",
        "celebrities",
        "mastheads",
        "columnist",
        "correspondent",
        "reporter",
        "personalities",
        "personnel",
        "personal",
    ]
}

OTHER_LITERATURE_DETAILS_KEYS = None  # OTHER_LITERATURE_DETAILS doubles as its own
# section dict in the reference dispatch (keys of the attribute dict are searched).

# Name -> keyword dict, used by the dispatcher (reference mapper.py:91-92 uses
# eval(domain); here an explicit registry).
SECTION_DICTS = {
    "BIBLIOGRAPHY": BIBLIOGRAPHY,
    "FILMOGRAPHY": FILMOGRAPHY,
    "DISCOGRAPHY": DISCOGRAPHY,
    "BAND_MEMBERS": BAND_MEMBERS,
    "CONCERT_TOURS": CONCERT_TOURS,
    "ALUMNI": ALUMNI,
    "STAFF": STAFF,
    "PROGRAMS_OFFERED": PROGRAMS_OFFERED,
    "HONORS": HONORS,
    "CAREER": CAREER,
    "OTHER_PERSON_DETAILS": OTHER_PERSON_DETAILS,
    "CONTRIBUTORS": CONTRIBUTORS,
}
# OTHER_LITERATURE_DETAILS doubles as its own section dict: the dispatcher
# searches the *keys* of the attribute dict (reference mapper.py:91-92 resolves
# eval("OTHER_LITERATURE_DETAILS")[lang], a dict, and iterates its keys).
# Registered after its definition below.

# ---- Attribute dicts (reference mapping_rules.py:186-278) ----

BIBLIO_GENRE = {
    "en": {
        "Novels": "Novel",
        "Short stories": "Short_story",
        "Short Fiction": "Short_story",
        "Comics": "Comic",
        "Articles": "Article",
        "Essays": "Essay",
        "Plays": "Play_(theatre)",
        "Anthologies": "Anthology",
        "Non-fiction": "Non-fiction",
        "Comedy": "comedy",
        "other": "other",
        "Nonfiction": "Non-fiction",
        "Poetry": "Poetry",
        "Science fiction": "Science_fiction",
        "Biographies": "Biography",
    },
    "it": {
        "Romanzi": "Novel",
        "Racconti": "Story",
        "Antologie": "Anthology",
        "Non-fiction": "Non-fiction",
        "Audiolibri": "Audiobook",
        "Saggi": "Essay",
        "Poesie": "Poetry",
        "Drammi": "Drama",
        "Altri": "other",
        "audiolibro": "Audiobook",
        "finzione": "Fiction",
        "saggistica": "Non-Fiction",
    },
    "de": {
        "poesie": "Poetry",
        "dramen": "Drama",
        "kurzgedichte": "Poem",
        "kurzgeschichten": "Short_story",
        "Übersetzungen": "translator",
        "erzählungen": "story",
        "romane": "Romance",
        "verfilmungen": "adaptations",
        "dokumentarfilm": "documentary",
        "journal": "journal",
        "gedichte": "poem",
        "märchen": "fairy_tales",
        "bühnenstücke": "Play_(theatre)",
        "essays": "essay",
        "gedichtbände": "poem",
        "aufzeichnungen": "record",
        "hörbücher": "Audiobook",
        "autobiografisches": "Autobiography",
        "briefe": "letter",
    },
    "es": {
        "Novela": "Novel",
        "Antologías": "Anthology",
        "Cuentos": "story",
        "Guiones": "Script",
        "Películas": "Movie",
        "Prosa": "letter",
        "Tragedia": "Tragedy",
        "Comedia": "comedy",
        "Relatos": "story",
        "No ficción": "Non-ficton",
        "ficción": "Ficton",
        "drama": "drama",
        "tragedia": "drama",
        "otros": "other",
    },
}

FILMOGRAPHY_PARTICIPATION = {
    "en": {
        "Actor": "starring",
        "Director": "director",
        "Producer": "producer",
        "Dubbing": "voice",
        "Actress": "starring",
        "screen Writer": "screenWriter",
        "voice": "voice",
    },
    "it": {
        "Attore": "starring",
        "Attrice": "starring",
        "Sceneggiatore": "screenWriter",
        "Sceneggiatrice": "screenwriter",
        "Produttore": "producer",
        "Produttrice": "producer",
        "Doppiatore": "voice",
        "Doppiatrice": "voice",
        "Regista": "director",
        "Montaggio": "editing",
        "Montatore": "editing",
        "Montatrice": "editing",
    },
    "de": {
        "Darsteller": "starring",
        "Spielfilme": "starring",
        "Fernsehserien": "starring",
        "Darstellung": "starring",
        "Kinofilme": "starring",
        "Darstellerin": "starring",
        "Schauspieler": "starring",
        "Synchronsprecher": "voice",
        "Produzent": "producer",
        "Drehbuchautor": "screenWriter",
        "Regisseur": "director",
        "Synchronsprecherin": "voice",
    },
    "es": {
        "actor": "starring",
        "actriz": "starring",
        "productor": "producer",
        "directora": "director",
        "productora": "producer",
        "director": "director",
        "Escritor": "screenWriter",
        "Películas": "starring",
    },
}

OTHER_LITERATURE_DETAILS = {
    "en": {
        "edition": "edition",
        "reprints": "edition",
        "publication": "publisher",
        "Columns": "Article",
        "feature": "features",
        "supplement": "sisterNewspaper",
        "papers": "researchPaper",
        "Characters": "FictionalCharacter",
        "adaptations": "Adaptation",
    }
}

FILMOGRAPHY_TYPE = {
    "en": {
        "TV": "TelevisionShow",
        "Television": "TelevisionShow",
        "Animation": "Cartoon",
        "Anime": "Anime",
        "Videogame": "Videogame",
        "Video game": "Videogame",
    },
    "it": {"Televisione": "TelevisionShow", "TV": "TelevisionShow", "Animazione": "Cartoon"},
    "de": {
        "Fernseh Show": "TelevisionShow",
        "Fernsehen": "TelevisionShow",
        "Trickfilm": "Cartoon",
        "Anime": "Anime",
        "Videogame": "Videospiel",
        "Video game": "Videospiel",
    },
    "es": {
        "Videos musicales": "MusicVideo",
        "Televisión": "TelevisionShow",
        "caricatura": "cartoon",
        "cómica": "cartoon",
        "videojuego": "Videogame",
    },
}

AWARD_STATUS_TYPE = {
    "en": {
        "Wins": "Winner",
        "Won": "Winner",
        "Nominated": "Nominated",
        "Nominations": "Nominated",
        "Nominee": "Nominated",
        "win": "Winner",
        "winner": "winner",
        "honorary": "HonoraryDegree",
    }
}

PERSON_DETAILS = {
    "en": {
        "family": "relative",
        "marriages": "spouse",
        "works": "notableWork",
        "career": "Employer",
        "expeditions": "notableWork",
        "work": "notableWork",
        "restaurants": "owner",
        "tree": "colleague",
        "memberships": "member",
    }
}

TRANSLATIONS = {
    "for": {"en": " for ", "it": " per "},
    "from": {"en": " from "},
}

CONTRIBUTION_TYPE = {
    "en": {
        "covers": "coverArtist",
        "publisher": "Publisher",
        "producer": "Producer",
        "Journalist": "Journalist",
        "celebrity": "coverArtist",
        "mastheads": "Writers",
        "columnist": "Journalist",
        "correspondent": "Journalist",
        "reporter": "Journalist",
        "writer": "writer",
        "celebrities": "coverArtist",
        "president": "president",
        "cartoonist": "artist",
        "director": "director",
        "Satirist": "Journalist",
        "editor": "chiefEditor",
    },
}

SECTION_DICTS["OTHER_LITERATURE_DETAILS"] = OTHER_LITERATURE_DETAILS

# Data-driven custom mapper configs (reference custom_mappers.json:1-46).
CUSTOM_MAPPERS = {
    "CUSTOM_ARTIST_MAPPER": {
        "headers": {"en": ["Discography", "Tours"]},
        "extractors": [1, 2, 3, 4],
        "ontology": {"en": {"tours": "concertTour", "discography": "musicalArtist"}},
        "years": "Yes",
    },
    "CUSTOM_BIBLIOGRAPHY_MAPPER": {
        "headers": {"en": ["bibliography"]},
        "extractors": [1, 2, 3, 4],
        "ontology": {"en": {"Novel": "Novel", "Stories": "ShortStory", "fiction": "Fiction"}},
        "years": "Yes",
    },
    "MUSIC_GENRE_MAPPER": {
        "headers": {"en": ["bands", "artists"]},
        "extractors": [1, 2, 3, 4],
        "ontology": {
            "en": {
                "default": "notableArtist",
                "artist": "notableArtist",
                "band": "notableBand",
                "Subgenre": "SubGenre",
                "division": "SubGenre",
                "festivals": "relatedFestivals",
            }
        },
        "years": "Yes",
    },
}
