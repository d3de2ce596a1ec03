"""Pure-Python TEST ORACLES reproducing the reference's per-row semantics.

These exist only to validate the Spark column expressions in tests — they are
behavioral restatements of /root/reference/modules/helpers.py &
modules/mappings.py, never imported by the engine.
"""

from __future__ import annotations

import html
import re

from psyndex2linkeddata_spark.data.tables import dd_codes


def replace_encodings(text: str) -> str:
    for raw, repl in dd_codes:
        text = text.replace(raw, repl)
    return text


def clean(text: str) -> str:
    return html.unescape(replace_encodings(text))


def get_subfield(s: str | None, name: str) -> str | None:
    # mirrors helpers.py:17-37
    if s is None or s == "":
        return None
    s = re.sub(" {2,}", " ", s.strip())
    sub = None
    if f"|{name}" in s:
        sub = s.split(f"|{name}")[1].strip()
        sub = sub.split("|")[0].strip()
    if sub:
        return clean(sub)
    return None


def get_mainfield(s: str | None) -> str | None:
    # mirrors helpers.py:73-93
    if s is None or s == "":
        return None
    s = re.sub(" {2,}", " ", s.strip())
    field = s.split("|")[0].strip() if "|" in s else s.strip()
    return clean(field) if field else None


def check_for_url_or_doi(original_string: str) -> tuple[str, str]:
    # mirrors helpers.py:180-303
    string = original_string.strip()
    string = re.sub(r"^(.*)(DOI: |DOI |DOI:|doi:|doi |doi:)(.*)$", r"\3", string, flags=re.IGNORECASE).strip()
    string = re.sub(r"^(. )", "", string).strip()
    string = re.sub(r"PsychOpen GOLD", "", string)
    string = re.sub(" {2,}", " ", string)
    string = re.sub(r"(.*\.) ((io)|(org)|(com)|(net)|(de))\b", r"\1\2", string)
    string = re.sub(r"(.*/) ([a-z]|[0-9]|\?)", r"\1\2", string)
    string = re.sub(r"(.*) (/)", r"\1\2", string)
    string = re.sub(" ", "_", string)
    match = re.search(r"10\.\d{4,9}/[-._;()/:A-Z0-9]+", string, re.IGNORECASE)
    if match:
        string = re.sub(r"[. _]*$", "", match.group())
        return string, "doi"
    url_pattern = re.compile(
        r"[(http(s)?):\/\/(www\.)?a-zA-Z0-9@:%._\+~#=]{2,256}\.[a-z]{2,6}\b([-a-zA-Z0-9@:%_\+.~#?&//=]*)",
        re.IGNORECASE,
    )
    if url_pattern.search(string):
        if string.startswith("//"):
            string = "http:" + string
        elif string[0].isalpha() and not string.startswith("http"):
            string = "http://" + string
        return string, "url"
    return original_string.strip(), "unknown"


def split_pages(page_string: str):
    # mirrors instance_sources.py:57-105
    page_start = page_end = extent = article_number = None
    starts_lower = re.search("^[a-z]", page_string)
    if "-" in page_string:
        parts = page_string.split("-", maxsplit=1)
        page_start, page_end = parts[0], parts[1]
    elif page_string.startswith("Insgesamt"):
        try:
            extent = page_string.split(" ")[1]
        except IndexError:
            extent = None
    elif page_string.isdigit():
        extent = page_string
    elif starts_lower or page_string.startswith("No") or page_string.startswith("Art"):
        if starts_lower:
            article_number = page_string
        else:
            try:
                article_number = page_string.split(" ", maxsplit=1)[1]
            except IndexError:
                article_number = None
    return page_start, page_end, extent, article_number


def split_series(series_statement: str):
    # mirrors instance_sources.py:108-126
    if "," in series_statement:
        split_statement = series_statement.split(", ", maxsplit=1)
        if (
            split_statement[-1].startswith("Vol")
            or split_statement[-1].startswith("Band")
            or split_statement[-1].isdigit()
        ):
            return split_statement[0], split_statement[-1].split(" ", maxsplit=1)[-1]
        return series_statement, None
    return series_statement, None
