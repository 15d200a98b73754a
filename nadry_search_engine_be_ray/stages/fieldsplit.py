"""Field extraction for the source-code corpus (analog of operator M1).

The reference extracts TITLE / DESCRIPTION / BODY from HTML
(indexer/DocumentProcessor.java:32-81) with boosts 3.0/1.5/1.0
(InvertedIndex.java:18-32).  For a source-code corpus the analog (our design
choice, flagged in SURVEY.md §2.2 M1) is:

* TITLE   <- the file path (repo-relative), like an HTML <title>
* DESCRIPTION <- the leading comment/docstring block (first run of lines
  whose stripped form starts with a comment marker, max 20 lines)
* BODY    <- the full content

The split is a pure deterministic function shared by the Ray pipeline and the
single-process conformance oracle.
"""

from __future__ import annotations

FIELD_TITLE = 0
FIELD_DESCRIPTION = 1
FIELD_BODY = 2

# InvertedIndex.java:18-32
FIELD_WEIGHTS = {FIELD_TITLE: 3.0, FIELD_DESCRIPTION: 1.5, FIELD_BODY: 1.0}
FIELD_NAMES = {FIELD_TITLE: "TITLE", FIELD_DESCRIPTION: "DESCRIPTION", FIELD_BODY: "BODY"}

_COMMENT_MARKERS = ("#", "//", "/*", "*", "--", '"""', "'''")
_MAX_DESC_LINES = 20


def split_fields(path: str, content: str) -> tuple[str, str, str]:
    """Return (title_text, description_text, body_text)."""
    desc_lines: list[str] = []
    for line in (content or "").split("\n")[:_MAX_DESC_LINES]:
        stripped = line.lstrip()
        if stripped.startswith(_COMMENT_MARKERS):
            desc_lines.append(stripped)
        else:
            break
    return path or "", "\n".join(desc_lines), content or ""
