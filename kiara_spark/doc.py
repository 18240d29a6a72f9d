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


def _field_docs(schemas) -> list[dict]:
    """[{name, type, optional, default, is_constant, doc}] from a module's
    coerced {field: ValueSchema} mapping, declaration order preserved."""
    out = []
    for name, schema in schemas.items():
        out.append({
            "name": name,
            "type": schema.type,
            "optional": bool(schema.optional),
            "default": schema.default,
            "is_constant": bool(schema.is_constant),
            "doc": schema.doc or "",
        })
    return out


def operation_doc(context, operation) -> dict:
    """Structured documentation model for a registered operation — the
    analog of the reference's ``OperationInfo`` / ``DocumentationMetadataModel``
    pages (``src/kiara/models/documentation.py`` +
    ``src/kiara/doc/gen_info_pages.py``): operation identity, docstring
    split, and the TYPED input/output field docs from an instantiated
    module (so constants/defaults overlays are reflected, not just the
    class declaration).  Consumed by ``operation explain``, ``info``, and
    the ``operation -> markdown`` renderer."""
    module = context.module_registry.create_module(
        operation.module_type, operation.module_config)
    d = extract_doc(type(module))
    if operation.doc:
        d["description"] = operation.doc
    ch = module.characteristics
    return {
        "operation_id": operation.operation_id,
        "operation_type": operation.operation_type,
        "module_type": operation.module_type,
        "module_config": dict(operation.module_config),
        "description": d["description"],
        "doc": d["doc"],
        "inputs": _field_docs(module.inputs_schema),
        "outputs": _field_docs(module.outputs_schema),
        "characteristics": {
            "is_idempotent": ch.is_idempotent,
            "is_internal": ch.is_internal,
            "is_source": ch.is_source,
        },
    }
