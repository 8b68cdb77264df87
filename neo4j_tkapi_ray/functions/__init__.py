from .textkit import (  # noqa: F401
    collapse_text,
    decode_page_bytes,
    fuzz_ratio,
    full_surname,
    name_similarity,
    normalize_topic,
    parse_xml_datetime,
    safe_int,
    split_dossier_code,
    stable_id,
    to_utc,
)
