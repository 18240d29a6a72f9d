"""Documentation extraction from module docstrings.

Reference parity: the reference wraps every module/operation doc in a
``DocumentationMetadataModel`` with a one-line ``description`` (the first
docstring line) and a full ``doc`` body
(``src/kiara/models/documentation.py``, used throughout the info CLI
``src/kiara/interfaces/cli/info/``).  Here the same split is derived from
plain Python docstrings: first non-empty line -> description, the dedented
remainder -> doc.
"""

from __future__ import annotations

import inspect


def extract_doc(obj) -> dict:
    """{'description': first line, 'doc': dedented remainder} from an
    object's docstring; both '' when undocumented."""
    raw = inspect.getdoc(obj) or ""  # getdoc dedents consistently
    if not raw.strip():
        return {"description": "", "doc": ""}
    # first PARAGRAPH (up to the first blank line) is the description — a
    # wrapped first sentence must not be cut mid-line
    head, _, body = raw.strip().partition("\n\n")
    description = " ".join(line.strip() for line in head.splitlines())
    return {"description": description, "doc": body.strip()}
