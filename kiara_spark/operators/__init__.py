"""Built-in operator modules; ``register_all(context)`` wires every family
into a KiaraContext's module/operation registries."""

from __future__ import annotations


def register_all(context) -> None:
    from . import (curation, dedup, events, filesystem, graph, joins,
                   media_codecs, misc, quality, serialization, similarity,
                   sketches, tables, text)
    from ..pipeline import runner as pipeline_runner
    from ..streaming import stateful, windows

    for family in (tables, filesystem, text, dedup, similarity, misc, windows,
                   stateful, joins, serialization, graph, quality, curation,
                   sketches, events, media_codecs, pipeline_runner):
        for cls in getattr(family, "MODULES", []):
            context.module_registry.register(cls)
        context.operation_registry.register_all(getattr(family, "OPERATIONS", []))
