"""Rule authoring/validation — the engine's counterpart of the reference's
interactive rulesGenerator.py (menu flow at rulesGenerator.py:36-91; custom
mapper shape enforced at :183-270; MAPPING entries at :125-181).

Rules are data: adding a domain or language means adding dict entries, never
engine code.  These validators enforce the same constraints the reference's
prompts enforce interactively, so rule tables can be reviewed/merged as
config changes.
"""

from __future__ import annotations

from . import tables

VALID_EXTRACTORS = {1, 2, 3, 4}  # italic, reference, quote, general


class RuleError(ValueError):
    pass


def validate_custom_mapper(name: str, config: dict) -> None:
    """Shape check for a custom mapper config (reference rulesGenerator.py
    requires headers/extractors/ontology/years, extractors in 1..4, per-lang
    ontology dicts; 'default' may be 'None' to forbid fallback)."""
    for key in ("headers", "extractors", "ontology", "years"):
        if key not in config:
            raise RuleError(f"{name}: missing required key '{key}'")
    if config["years"] not in ("Yes", "No"):
        raise RuleError(f"{name}: years must be 'Yes' or 'No'")
    bad = set(config["extractors"]) - VALID_EXTRACTORS
    if bad or not config["extractors"]:
        raise RuleError(f"{name}: extractors must be a non-empty subset of 1..4, got {config['extractors']}")
    if not isinstance(config["headers"], dict) or not config["headers"]:
        raise RuleError(f"{name}: headers must be a non-empty lang->keywords dict")
    for lang, kws in config["headers"].items():
        if not isinstance(kws, list) or not all(isinstance(k, str) for k in kws):
            raise RuleError(f"{name}: headers[{lang}] must be a list of strings")
    for lang, onto in config["ontology"].items():
        if not isinstance(onto, dict) or not onto:
            raise RuleError(f"{name}: ontology[{lang}] must be a non-empty dict")
        if lang not in config["headers"]:
            raise RuleError(f"{name}: ontology lang {lang} has no headers entry")


def validate_mapping_entry(res_class: str, domains: list) -> None:
    """A MAPPING entry's domains must resolve to a section dict or a custom
    mapper (the reference sys.exits at dispatch time otherwise, mapper.py:97-101)."""
    for d in domains:
        if d not in tables.SECTION_DICTS and d not in tables.CUSTOM_MAPPERS:
            raise RuleError(
                f"MAPPING[{res_class}]: domain '{d}' is neither a section dict nor a custom mapper"
            )


def register_custom_mapper(name: str, config: dict) -> None:
    """Runtime rule registration (the rulesGenerator 'add custom mapper' flow)."""
    validate_custom_mapper(name, config)
    tables.CUSTOM_MAPPERS[name] = config


def register_mapping(res_class: str, domains: list) -> None:
    validate_mapping_entry(res_class, domains)
    tables.MAPPING[res_class] = list(domains)


def validate_all() -> None:
    """Full static validation of the vendored rule tables."""
    for name, config in tables.CUSTOM_MAPPERS.items():
        validate_custom_mapper(name, config)
    for res_class, domains in tables.MAPPING.items():
        validate_mapping_entry(res_class, domains)
    for lang_dict in (tables.PERSON_DETAILS,):
        for lang, d in lang_dict.items():
            for sect_kw in tables.CAREER.get(lang, []):
                if sect_kw not in d:
                    raise RuleError(
                        f"CAREER keyword '{sect_kw}' ({lang}) lacks a PERSON_DETAILS property"
                    )
